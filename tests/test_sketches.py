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
