"""Bucketed co-located joins (zero-exchange plan) and salting
(semantics-preserving skew mitigation)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from amazon_kinesis_analytics_streaming_etl_spark.operators.scale import (
    read_table,
    salted_agg,
    salted_join,
    write_bucketed,
)
from tests.conftest import SF_SMOKE


@pytest.fixture()
def skewed_df(spark):
    # 10k rows; key 0 holds ~50% of them (hot), the rest uniform over 100 keys
    return spark.range(10_000).select(
        F.when(F.col("id") % 2 == 0, 0)
        .otherwise(F.pmod(F.col("id"), F.lit(100)))
        .alias("k"),
        (F.col("id") % 7).cast("double").alias("v"),
    )


def test_salted_agg_matches_plain_agg(spark, skewed_df):
    plain = {
        r["k"]: (r["s"], r["c"], r["mn"], r["mx"], r["av"])
        for r in skewed_df.groupBy("k")
        .agg(
            F.sum("v").alias("s"),
            F.count("v").alias("c"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
            F.avg("v").alias("av"),
        )
        .collect()
    }
    salted = {
        r["k"]: (r["sum_v"], r["count_v"], r["min_v"], r["max_v"], r["avg_v"])
        for r in salted_agg(
            skewed_df, "k", {"v": "sum"} | {}, n_salts=8
        ).join(
            salted_agg(skewed_df, "k", {"v": "count"}, n_salts=8), "k"
        ).join(
            salted_agg(skewed_df, "k", {"v": "min"}, n_salts=8), "k"
        ).join(
            salted_agg(skewed_df, "k", {"v": "max"}, n_salts=8), "k"
        ).join(
            salted_agg(skewed_df, "k", {"v": "avg"}, n_salts=8), "k"
        ).collect()
    }
    assert set(plain) == set(salted)
    for k, (s, c, mn, mx, av) in plain.items():
        ss, sc, smn, smx, sav = salted[k]
        assert ss == pytest.approx(s)
        assert sc == c
        assert smn == mn and smx == mx
        assert sav == pytest.approx(av)


def test_salted_join_matches_plain_join(spark, skewed_df):
    dim = spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("name_"), F.col("id")).alias("nm")
    )
    plain = sorted(
        (r["k"], r["v"], r["nm"])
        for r in skewed_df.join(dim, "k").collect()
    )
    salted = sorted(
        (r["k"], r["v"], r["nm"])
        for r in salted_join(skewed_df, dim, "k", n_salts=8).collect()
    )
    assert plain == salted


def test_bucketed_join_has_no_exchange(spark):
    """Both sides bucketed by the join key with equal bucket counts ->
    the sort-merge join reads pre-shuffled buckets: ZERO Exchange nodes."""
    wh = tempfile.mkdtemp(prefix="bucket_wh_")
    try:
        li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        write_bucketed(li, "li_b", "l_orderkey", 8, sort_cols=["l_orderkey"])
        write_bucketed(o, "o_b", "o_orderkey", 8, sort_cols=["o_orderkey"])
        a, b = read_table(spark, "li_b"), read_table(spark, "o_b")
        joined = a.join(
            b.hint("merge"), a.l_orderkey == b.o_orderkey
        ).select("l_orderkey", "o_totalprice", "l_quantity")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # and it's still correct
        expected = li.join(o, li.l_orderkey == o.o_orderkey).count()
        assert joined.count() == expected
    finally:
        for t in ("li_b", "o_b"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(wh, ignore_errors=True)


def test_aqe_splits_skewed_join_partitions(spark):
    """session.py enables AQE skew-join handling; prove it engages: a
    hot-key sort-merge join must show skew-split partitions in the final
    adaptive plan (thresholds lowered to make a test-sized skew count)."""
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        fact = spark.range(200_000).select(
            F.when(F.col("id") % 10 < 8, 7).otherwise(F.col("id") % 1000).alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("data"),
        )
        dim = spark.range(1000).select(
            F.col("id").alias("k"), F.concat(F.lit("dim-"), F.col("id")).alias("nm")
        )
        joined = fact.join(dim, "k")
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert "SortMergeJoin" in final
        assert "skew=true" in final, final[:2000]
    finally:
        for k, v in saved.items():
            conf.set(k, v)


def test_deterministic_sample_stable_across_partitionings(spark):
    from amazon_kinesis_analytics_streaming_etl_spark.operators.scale import (
        deterministic_sample,
    )

    df = spark.range(20_000).select(F.col("id"))
    a = set(r["id"] for r in deterministic_sample(df, "id", 0.2).collect())
    b = set(
        r["id"]
        for r in deterministic_sample(df.repartition(17), "id", 0.2).collect()
    )
    assert a == b  # layout-independent
    assert 0.17 < len(a) / 20_000 < 0.23  # ~fraction
    c = set(r["id"] for r in deterministic_sample(df, "id", 0.2, salt="v2").collect())
    assert c != a  # salt rotates the cohort
    sub = set(r["id"] for r in deterministic_sample(df, "id", 0.1).collect())
    assert sub <= a  # nested fractions -> nested cohorts


def test_range_sorted_layout_enables_file_skipping(spark, tmp_path):
    """write_range_sorted must produce files with pairwise-disjoint
    sort-key ranges (parquet footer min/max), so a narrow range predicate
    overlaps only a sliver of the files; an unsorted write of the same
    rows leaves (nearly) every file overlapping the predicate."""
    import glob

    import pyarrow.parquet as pq

    from amazon_kinesis_analytics_streaming_etl_spark.operators.scale import (
        write_range_sorted,
    )

    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").select(
        "l_orderkey", "l_shipdate", "l_quantity"
    )
    sorted_dir = str(tmp_path / "sorted")
    plain_dir = str(tmp_path / "plain")
    write_range_sorted(li, sorted_dir, "l_shipdate", n_files=8)
    li.repartition(8).write.parquet(plain_dir)

    def ranges(d):
        out = []
        for f in glob.glob(f"{d}/*.parquet"):
            md = pq.read_metadata(f)
            col_idx = md.schema.names.index("l_shipdate")
            los, his = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(col_idx).statistics
                los.append(st.min)
                his.append(st.max)
            out.append((min(los), max(his)))
        return sorted(out)

    rs = ranges(sorted_dir)
    assert len(rs) >= 4
    # disjoint (boundary touch allowed): each file's min >= previous max
    for (lo_a, hi_a), (lo_b, hi_b) in zip(rs, rs[1:]):
        assert lo_b >= hi_a, f"overlapping file ranges: {hi_a} vs {lo_b}"

    # a predicate spanning ~1/8 of the keyspace touches few sorted files
    # but every unsorted one
    lo_all, hi_all = rs[0][0], rs[-1][1]
    span = hi_all - lo_all
    q_lo, q_hi = lo_all + span * 0.4, lo_all + span * 0.5

    def overlapping(d):
        return sum(1 for lo, hi in ranges(d) if not (hi < q_lo or lo > q_hi))

    assert overlapping(sorted_dir) <= 2
    assert overlapping(plain_dir) >= 7

    # and the rows themselves are intact
    assert spark.read.parquet(sorted_dir).count() == li.count()


def test_global_rank_matches_single_partition_window(spark):
    """global_rank (range-partition + local rank + offsets) must equal the
    single-partition-window row_number for every row, including keys that
    straddle range-partition boundaries."""
    from pyspark.sql import Window

    from amazon_kinesis_analytics_streaming_etl_spark.operators.scale import (
        global_rank,
    )

    df = spark.range(5_000).select(
        F.pmod(F.col("id") * 7919, F.lit(1000)).alias("k"), F.col("id")
    )
    got = {
        (r.k, r.id): r.rank
        for r in global_rank(df, ["k", "id"], n_parts=7).collect()
    }
    want = {
        (r.k, r.id): r.rank
        for r in df.withColumn(
            "rank", F.row_number().over(Window.orderBy("k", "id"))
        ).collect()
    }
    assert got == want


def test_salted_join_rejects_right_preserving_hows(spark, skewed_df):
    import pytest as _pt

    dim = spark.range(10).select(F.col("id").alias("k"), F.lit("x").alias("nm"))
    for how in ("right", "full", "full_outer", "right_outer"):
        with _pt.raises(ValueError, match="left-preserving"):
            salted_join(skewed_df, dim, "k", how=how)


def test_zorder_layout_skips_files_on_both_columns(spark, tmp_path):
    """write_zordered files must carry usefully-tight footer min/max on
    BOTH clustered columns: a 10% slice on either column overlaps only
    a fraction of the files (Morton-curve profile: ~N^(1/2) of N tiles
    per one-dim slice, plus boundary straddlers), while a plain
    (random) layout overlaps essentially all of them on both."""
    import glob

    import pyarrow.parquet as pq

    from amazon_kinesis_analytics_streaming_etl_spark.operators.scale import (
        write_zordered,
    )

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    zdir, plain = str(tmp_path / "z"), str(tmp_path / "plain")
    write_zordered(li, zdir, ["l_orderkey", "l_partkey"], n_files=64, bits=8)
    li.repartition(64).write.parquet(plain)

    def ranges(d, col):
        out = []
        for f in glob.glob(f"{d}/*.parquet"):
            md = pq.read_metadata(f)
            ci = md.schema.names.index(col)
            los, his = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                los.append(st.min)
                his.append(st.max)
            out.append((min(los), max(his)))
        return out

    for col in ("l_orderkey", "l_partkey"):
        rz = ranges(zdir, col)
        rp = ranges(plain, col)
        lo_all = min(lo for lo, _ in rz)
        hi_all = max(hi for _, hi in rz)
        span = hi_all - lo_all

        def avg_overlap(rs):
            fracs = []
            for start in (0.2, 0.45, 0.7):  # three 10% slices
                q_lo, q_hi = lo_all + span * start, lo_all + span * (start + 0.1)
                n = sum(1 for lo, hi in rs if not (hi < q_lo or lo > q_hi))
                fracs.append(n / len(rs))
            return sum(fracs) / len(fracs)

        f_z, f_p = avg_overlap(rz), avg_overlap(rp)
        assert f_p >= 0.95, (col, f_p)  # plain: every file spans everything
        assert f_z <= 0.60, (col, f_z)  # z-order: well under half on average

    # row preservation
    assert spark.read.parquet(zdir).count() == li.count()


def test_global_cumsum_property_random_frames(spark):
    """Property: the range-partitioned distributed cumsum equals a pandas
    groupless cumsum under the same total order, for random values, key
    collisions, and partition counts."""
    import pandas as pd
    from hypothesis import given, settings, strategies as st

    from amazon_kinesis_analytics_streaming_etl_spark.operators.scale import (
        global_cumsum,
    )

    @settings(max_examples=12, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 20), st.integers(1, 9)),  # (key, value)
            min_size=1,
            max_size=80,
        ),
        st.integers(2, 6),  # n_parts
    )
    def run(rows, n_parts):
        pdf = pd.DataFrame(rows, columns=["k", "v"]).reset_index()
        df = spark.createDataFrame(pdf)  # index breaks key ties
        got = (
            global_cumsum(
                df, ["k", "index"], "v", cumsum_col="cs", n_parts=n_parts
            )
            .orderBy("k", "index")
            .select("k", "index", "cs")
            .collect()
        )
        ref = pdf.sort_values(["k", "index"]).assign(
            cs=lambda d: d["v"].cumsum()
        )
        assert [(r.k, r["index"], r.cs) for r in got] == list(
            ref[["k", "index", "cs"]].itertuples(index=False, name=None)
        )

    run()


def test_bucketed_cumsum_matches_global_cumsum(spark):
    """Property: the pure-JVM two-level bucketed cumsum (r12) equals
    global_cumsum (and a sequential reference) over random distinct
    numeric domains — negative keys, fractional keys, several bucket
    widths, long and double values, null/NaN values, both frames."""
    import pandas as pd
    from hypothesis import given, settings, strategies as st

    from amazon_kinesis_analytics_streaming_etl_spark.operators.scale import (
        bucketed_cumsum,
    )

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(-3000, 3000),  # distinct-ified key, scaled /7
                st.one_of(st.none(), st.integers(-9, 9)),
            ),
            min_size=1,
            max_size=60,
            unique_by=lambda t: t[0],
        ),
        st.sampled_from([0.5, 1.0, 64.0]),
        st.booleans(),  # exclusive
        st.booleans(),  # double values (with NaN for the null slots)
    )
    def run(rows, width, exclusive, as_double):
        pdf = pd.DataFrame(rows, columns=["k", "v"])
        pdf["k"] = pdf["k"] / 7.0
        if as_double:
            pdf["v"] = [float("nan") if v is None else float(v) for v in pdf["v"]]
        else:
            pdf["v"] = pdf["v"].astype("Int64")
        df = spark.createDataFrame(pdf)
        got = {
            r.k: r.cs
            for r in bucketed_cumsum(
                df, "k", "v", "cs", bucket_width=width, exclusive=exclusive
            ).collect()
        }
        ref, run_sum = {}, 0
        for k, v in sorted(zip(pdf["k"], pdf["v"])):
            contrib = 0 if pd.isna(v) else v
            if exclusive:
                ref[k] = run_sum
                run_sum += contrib
            else:
                run_sum += contrib
                ref[k] = run_sum
        assert set(got) == set(ref)
        for k in ref:
            assert abs(got[k] - ref[k]) < 1e-9, (k, got[k], ref[k], width)

    run()


def test_bucketed_cummax_matches_sequential_reference(spark):
    """Property: the pure-JVM two-level bucketed cummax (r12) equals a
    sequential running max under (lead, tie) order — negative keys,
    several widths, null/NaN values, both frames; the first row's
    exclusive cummax is NULL (empty frame), matching global_cummax."""
    import pandas as pd
    from hypothesis import given, settings, strategies as st

    from amazon_kinesis_analytics_streaming_etl_spark.operators.scale import (
        bucketed_cummax,
    )

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(-500, 500),   # lead key, scaled /7
                st.integers(0, 3),        # tie-breaker
                st.one_of(st.none(), st.integers(-9, 9)),
            ),
            min_size=1,
            max_size=50,
            unique_by=lambda t: (t[0], t[1]),
        ),
        st.sampled_from([0.5, 64.0]),
        st.booleans(),  # exclusive
    )
    def run(rows, width, exclusive):
        pdf = pd.DataFrame(rows, columns=["k", "t", "v"])
        pdf["k"] = pdf["k"] / 7.0
        pdf["v"] = [float("nan") if v is None else float(v) for v in pdf["v"]]
        df = spark.createDataFrame(pdf)
        got = {
            (r.k, r.t): r.cm
            for r in bucketed_cummax(
                df, ["k", "t"], "v", "cm", bucket_width=width,
                exclusive=exclusive,
            ).collect()
        }
        ref, run_max = {}, None
        for k, t, v in sorted(zip(pdf["k"], pdf["t"], pdf["v"])):
            contrib = None if pd.isna(v) else v
            if exclusive:
                ref[(k, t)] = run_max
            if contrib is not None:
                run_max = contrib if run_max is None else max(run_max, contrib)
            if not exclusive:
                ref[(k, t)] = run_max
        assert set(got) == set(ref)
        for key in ref:
            if ref[key] is None:
                assert got[key] is None, (key, got[key])
            else:
                assert got[key] == ref[key], (key, got[key], ref[key], width)

    run()


def test_quantile_bucket_binary_search_matches_searchsorted(spark):
    """_with_bucket_col's O(bits)-per-row binary search must equal the
    definitional bucket id — count of boundaries <= value, capped at
    2^bits - 1 (numpy searchsorted side='right') — including exact
    boundary hits, duplicated boundaries, NaN (top bucket), and NULL
    (bucket 0)."""
    import numpy as np

    from amazon_kinesis_analytics_streaming_etl_spark.operators.scale import (
        _with_bucket_col,
    )

    rng = np.random.default_rng(7)
    vals = np.concatenate(
        [rng.normal(0, 100, 2000), rng.choice([0.0, 1.0], 100), [np.nan] * 3]
    )
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    for bits in (3, 5, 8):
        bounds = sorted(rng.normal(0, 100, (1 << bits) - 1).tolist())
        bounds[1] = bounds[0]  # duplicated boundary (skew)
        got = _with_bucket_col(df, "v", bounds, bits, "b").toPandas()
        exp = np.minimum(
            np.searchsorted(np.array(bounds), got["v"].to_numpy(), side="right"),
            (1 << bits) - 1,
        )
        assert (got["b"].to_numpy() == exp).all(), f"bits={bits}"
    nulls = spark.createDataFrame([(None,), (5.0,)], "v double")
    got = {
        r.v: r.b
        for r in _with_bucket_col(nulls, "v", [1.0, 2.0, 3.0], 2, "b").collect()
    }
    assert got[None] == 0 and got[5.0] == 3


def test_salted_ops_equivalence_property(spark):
    """Hypothesis: for arbitrary key/value multisets (hot keys, NULL
    values, negative keys, duplicate right rows) salted_agg equals the
    plain groupBy and salted_join equals the plain join for every
    left-preserving how — salting must be a pure physical rewrite."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from amazon_kinesis_analytics_streaming_etl_spark.operators.scale import (
        salted_agg,
        salted_join,
    )

    keys = st.integers(min_value=-3, max_value=3)
    vals = st.one_of(st.none(), st.integers(min_value=-100, max_value=100))

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        left=st.lists(st.tuples(keys, vals), min_size=0, max_size=40),
        right=st.lists(st.tuples(keys, vals), min_size=0, max_size=8),
        n_salts=st.sampled_from([1, 3, 16]),
    )
    def run(left, right, n_salts):
        ldf = spark.createDataFrame(left, "k int, v int") if left else (
            spark.createDataFrame([], "k int, v int")
        )
        rdf = spark.createDataFrame(right, "k int, w int") if right else (
            spark.createDataFrame([], "k int, w int")
        )
        got = {
            (r.k, r.sum_v, r.count_v, r.avg_v)
            for r in salted_agg(
                ldf,
                ["k"],
                [("v", "sum"), ("v", "count"), ("v", "avg")],
                n_salts=n_salts,
            )
            .select(
                "k",
                "sum_v",
                "count_v",
                F.round("avg_v", 9).alias("avg_v"),
            )
            .collect()
        }
        want = {
            (r.k, r.sum_v, r.count_v, r.avg_v)
            for r in ldf.groupBy("k")
            .agg(
                F.sum("v").alias("sum_v"),
                F.count("v").alias("count_v"),
                F.round(F.avg("v"), 9).alias("avg_v"),
            )
            .collect()
        }
        assert got == want

        def norm(rows):  # None-safe canonical multiset ordering
            return sorted(
                (tuple(r) for r in rows),
                key=lambda t: tuple((x is None, x) for x in t),
            )

        for how in ("inner", "left", "left_semi", "left_anti"):
            gj = norm(salted_join(ldf, rdf, "k", n_salts=n_salts, how=how).collect())
            wj = norm(ldf.join(rdf, "k", how).collect())
            assert gj == wj, (how, n_salts)

    run()


def test_global_cummax_property_random_frames(spark):
    """Property: distributed running max (inclusive and exclusive)
    equals pandas expanding max under the same total order, including
    null handling (nulls never win) and the first-row-NULL contract of
    the exclusive form."""
    import numpy as np
    import pandas as pd
    from hypothesis import given, settings, strategies as st

    from amazon_kinesis_analytics_streaming_etl_spark.operators.scale import (
        global_cummax,
    )

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(0, 20),
                st.one_of(st.none(), st.integers(-9, 9)),
            ),
            min_size=1,
            max_size=80,
        ),
        st.integers(2, 6),
        st.booleans(),
    )
    def run(rows, n_parts, exclusive):
        pdf = pd.DataFrame(rows, columns=["k", "v"]).reset_index()
        pdf["v"] = pdf["v"].astype("float64")
        df = spark.createDataFrame(pdf)
        got = (
            global_cummax(
                df,
                ["k", "index"],
                "v",
                cummax_col="cm",
                n_parts=n_parts,
                exclusive=exclusive,
            )
            .orderBy("k", "index")
            .select("cm")
            .collect()
        )
        s = pdf.sort_values(["k", "index"])["v"]
        ref = s.expanding().max()
        if exclusive:
            ref = ref.shift(1)
        # all-null prefixes: SQL MAX over an empty/all-null frame is NULL
        for g, r in zip([row.cm for row in got], ref):
            if pd.isna(r):
                assert g is None
            else:
                assert g == r

    run()


def test_skyline_matches_bruteforce_dominance(spark):
    """Property: the sort-filter + global_cummax skyline keeps exactly
    the non-dominated points of the O(n^2) definition, including tied
    duplicates (kept) and same-price/same-size collision rows."""
    import pandas as pd
    from hypothesis import given, settings, strategies as st

    from amazon_kinesis_analytics_streaming_etl_spark.plans.catalog import QUERIES
    import pyspark.sql.functions as F
    from amazon_kinesis_analytics_streaming_etl_spark.operators.scale import (
        global_cummax,
    )

    def engine_skyline(pdf):
        df = spark.createDataFrame(pdf)
        pairs = df.select("price", "size").distinct()
        ranked = global_cummax(
            pairs.withColumn("_neg", -F.col("size").cast("double")),
            ["price", "_neg"],
            "size",
            cummax_col="_pm",
            exclusive=True,
            n_parts=3,
        )
        frontier = ranked.where(
            F.col("_pm").isNull() | (F.col("size").cast("double") > F.col("_pm"))
        ).select("price", "size")
        return sorted(
            (r.id, r.price, r.size)
            for r in df.join(
                F.broadcast(frontier), ["price", "size"], "left_semi"
            ).collect()
        )

    def brute(pdf):
        pts = list(pdf.itertuples(index=False, name=None))
        out = []
        for i, p, s in pts:
            dom = any(
                (q_p <= p and q_s >= s and (q_p < p or q_s > s))
                for _, q_p, q_s in pts
            )
            if not dom:
                out.append((i, p, s))
        return sorted(out)

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 8), st.integers(0, 8)),
            min_size=1,
            max_size=40,
        )
    )
    def run(pts):
        pdf = pd.DataFrame(
            [(i, p, s) for i, (p, s) in enumerate(pts)],
            columns=["id", "price", "size"],
        )
        assert engine_skyline(pdf) == brute(pdf)

    run()


def test_global_cumsum_cummax_nan_matches_fill_identity(spark):
    """r12 single-pass rewrite guard: the JVM per-partition totals must
    treat NaN exactly like the Python prefix pass does (fillna ->
    contribute 0 to a sum, never win a max). A NaN that poisoned the
    offsets side would corrupt every row of every LATER partition while
    leaving partition 0 correct — invisible to small single-partition
    cases, so this pins NaN in EVERY partition of a multi-partition
    frame."""
    import math

    from amazon_kinesis_analytics_streaming_etl_spark.operators.scale import (
        global_cummax,
        global_cumsum,
    )

    rows = []
    vals = [1.0, float("nan"), 2.0, None, float("nan"), 4.0, 8.0, float("nan")]
    for i, v in enumerate(vals):
        rows.append((i, v))
    df = spark.createDataFrame(rows, "i long, v double")

    got = (
        global_cumsum(df, "i", "v", cumsum_col="cs", n_parts=4)
        .orderBy("i")
        .select("cs")
        .collect()
    )
    ref, acc = [], 0.0
    for v in vals:
        acc += 0.0 if (v is None or math.isnan(v)) else v
        ref.append(acc)
    assert [r.cs for r in got] == ref

    gotm = (
        global_cummax(df, "i", "v", cummax_col="cm", n_parts=4)
        .orderBy("i")
        .select("cm")
        .collect()
    )
    refm, cur = [], float("-inf")
    for v in vals:
        if v is not None and not math.isnan(v):
            cur = max(cur, v)
        refm.append(cur)
    assert [r.cm for r in gotm] == refm
