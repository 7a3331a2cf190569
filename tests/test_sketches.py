"""Mergeable-sketch semantics: HLL union over pre-aggregated partitions
must answer the coarser rollup without rescanning, inside the error
envelope, and identically to sketching the raw column directly."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_hll_daily_merge_matches_direct_sketch_and_exact(spark):
    from amazon_kinesis_analytics_streaming_etl_spark.schemas import load_events

    ev = load_events(spark, "/root/testdata/sf0.001")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sketch")
    )
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est")
    )
    direct = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(14))).alias("direct")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact")
    )
    rows = {
        r.event_type: r
        for r in merged.join(direct, "event_type").join(exact, "event_type").collect()
    }
    assert rows
    for r in rows.values():
        # merging partial sketches loses nothing vs sketching the raw rows
        assert r.est == r.direct
        assert abs(r.est - r.exact) <= 0.05 * r.exact


def test_hll_rollup_gate_query(spark):
    from amazon_kinesis_analytics_streaming_etl_spark.plans.catalog import QUERIES

    rows = QUERIES["hll_sketch_rollup"](spark, "/root/testdata/sf0.001").collect()
    assert rows and all(r.merged_est_ok for r in rows)


# --------------------------------------------------------------------------
# Misra-Gries heavy hitters (operators/sketch.py)
# --------------------------------------------------------------------------


def test_mg_partition_bounded_and_no_false_negatives():
    """Pure-python MG step: counters never exceed k, and any key with
    frequency > n/k survives the per-partition summary."""
    import pandas as pd

    from amazon_kinesis_analytics_streaming_etl_spark.operators.sketch import (
        _mg_partition,
    )

    # zipf-ish: key0 x 500, key1 x 300, then 1200 singletons
    keys = ["hot0"] * 500 + ["hot1"] * 300 + [f"cold{i}" for i in range(1200)]
    k = 5  # threshold n/k = 400 -> only hot0 is guaranteed
    batches = [pd.DataFrame({"key": keys[i : i + 97]}) for i in range(0, len(keys), 97)]
    (out,) = list(_mg_partition(iter(batches), k))
    survivors = set(out.loc[out["key"].notna(), "key"])
    assert len(survivors) <= k
    assert "hot0" in survivors
    assert int(out.loc[out["key"].isna(), "part_n"].iloc[0]) == len(keys)


def test_heavy_hitters_exact_on_skewed_data(spark):
    """End-to-end: exact answer on a skewed frame across many partitions,
    matching a plain groupBy-HAVING recomputation."""
    from pyspark.sql import functions as F

    from amazon_kinesis_analytics_streaming_etl_spark.operators.sketch import (
        heavy_hitters,
    )

    # 10_000 rows: id%97 gives ~103 each; ids<3000 remapped to 'heavy'
    df = (
        spark.range(10_000)
        .select(
            F.when(F.col("id") < 3000, F.lit("heavy"))
            .otherwise(F.concat(F.lit("k"), (F.col("id") % 97)))
            .alias("key")
        )
        .repartition(8)
    )
    k = 10  # threshold 1000 -> only 'heavy' (3000) qualifies
    got = {(r.key, r.cnt) for r in heavy_hitters(df, "key", k).collect()}
    n = df.count()
    expect = {
        (r.key, r.cnt)
        for r in df.groupBy("key")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") > n / k)
        .collect()
    }
    assert got == expect == {("heavy", 3000)}


def test_heavy_hitters_leaves_no_cached_summaries(spark):
    from amazon_kinesis_analytics_streaming_etl_spark.operators.sketch import (
        heavy_hitters,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    result = heavy_hitters(docs, "lang", 6)
    result.collect()
    # the merged-summary persist must be released before return; the
    # localCheckpoint of the (<=k-row) result is the only new block.
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert after <= before + 1


def test_heavy_hitters_null_keys_count_into_threshold(spark):
    """Null contract (ADVICE r5): n is count(*) over ALL rows — null keys
    raise the n/k bar even though NULL itself is never reported. Without
    len(pdf)-based totals, the nulls-dropped threshold would wrongly
    admit 'warm' here."""
    from pyspark.sql import functions as F

    from amazon_kinesis_analytics_streaming_etl_spark.operators.sketch import (
        heavy_hitters,
    )

    # 1000 rows: 300 'heavy', 150 'warm', 400 NULL, 150 spread over k50..k99.
    # k=3 -> threshold n/3 = 333.33 with nulls counted (only nothing or
    # 'heavy' under it: 300 < 333 -> EMPTY); nulls-dropped would make the
    # threshold 600/3 = 200 and wrongly report heavy (300) and possibly warm.
    df = (
        spark.range(1000)
        .select(
            F.when(F.col("id") < 300, F.lit("heavy"))
            .when(F.col("id") < 450, F.lit("warm"))
            .when(F.col("id") < 850, F.lit(None).cast("string"))
            .otherwise(F.concat(F.lit("k"), (F.col("id") % 50) + 50))
            .alias("key")
        )
        .repartition(4)
    )
    assert heavy_hitters(df, "key", 3).collect() == []
    # with k=2 nothing qualifies either (500 bar); with k=4 (250 bar)
    # exactly 'heavy' qualifies, counted exactly
    got = {(r.key, r.cnt) for r in heavy_hitters(df, "key", 4).collect()}
    assert got == {("heavy", 300)}
