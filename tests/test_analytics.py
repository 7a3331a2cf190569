"""Product-analytics family invariants (plans/analytics.py).

Most analytics queries are verified end-to-end by the driver's DuckDB
oracle gate; these tests pin the mathematical invariants that an oracle
row-hash alone would not explain if they ever broke.
"""

from __future__ import annotations

from amazon_kinesis_analytics_streaming_etl_spark.plans.catalog import QUERIES

from conftest import SF_SMOKE


def test_drift_psi_nonnegative_and_spine_complete(spark):
    rows = QUERIES["drift_psi"](spark, SF_SMOKE).collect()
    # one row per event_type present in the table, no dropped types
    n_types = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("event_type")
        .distinct()
        .count()
    )
    assert len(rows) == n_types
    for r in rows:
        # PSI terms (p-q)*ln(p/q) are individually >= 0, so the sum is too
        assert r.psi >= 0.0
        # both slices must retain mass (Laplace smoothing never zeroes a slice)
        assert r.n_baseline > 0 and r.n_current > 0


def test_drift_psi_deterministic(spark):
    a = [tuple(r) for r in QUERIES["drift_psi"](spark, SF_SMOKE).collect()]
    b = [tuple(r) for r in QUERIES["drift_psi"](spark, SF_SMOKE).collect()]
    assert a == b


def test_ewma_is_a_weighted_mean_of_its_window(spark):
    """EWMA is a normalized weighted mean, so every point must lie within
    [min, max] of its type's hourly series — a weighting bug (unnormalized
    weights, reversed exponents) breaks this immediately."""
    from pyspark.sql import functions as F

    out = QUERIES["ewma_hourly"](spark, SF_SMOKE)
    bounds = out.groupBy("event_type").agg(
        F.min("v").alias("lo"), F.max("v").alias("hi")
    )
    bad = (
        out.join(bounds, "event_type")
        .where((F.col("ewma") < F.col("lo") - 0.001) | (F.col("ewma") > F.col("hi") + 0.001))
        .count()
    )
    assert bad == 0


def test_pattern_match_counts_bounded_by_user_total(spark):
    rows = {r.pattern: r for r in QUERIES["pattern_match_funnel"](spark, SF_SMOKE).collect()}
    assert set(rows) == {"strict_funnel", "signup_then_purchase", "repeated_errors", "bounce"}
    for r in rows.values():
        assert 0 <= r.n_users
        assert 0.0 <= r.pct <= 1.0
    # a strict funnel completion implies the user journey had a view before
    # a purchase, so it can never be counted as a bounce too -- but both
    # are <= the user total independently; the hard invariant is the cap
    n_total = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("user_id").distinct().count()
    )
    assert all(r.n_users <= n_total for r in rows.values())


def test_resample_interpolate_exact_points_match_hourly_avg(spark):
    """Grid slots that coincide with an observed hour must reproduce that
    hour's (rounded) average exactly — lerp with frac=0."""
    from pyspark.sql import functions as F

    out = QUERIES["resample_interpolate"](spark, SF_SMOKE)
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    hourly = ev.groupBy(
        "event_type",
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm").alias("slot"),
    ).agg(F.round(F.avg("value"), 4).alias("v"))
    j = out.where(F.col("is_exact")).join(hourly, ["event_type", "slot"])
    bad = j.where(F.abs(F.col("value_interp") - F.col("v")) > 0.001).count()
    assert j.count() > 0 and bad == 0


def test_rfm_segments_partition_the_user_base(spark):
    from pyspark.sql import functions as F

    out = QUERIES["rfm_segments"](spark, SF_SMOKE)
    rows = out.collect()
    n_users = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("user_id").distinct().count()
    )
    assert sum(r.n_users for r in rows) == n_users
    assert all(1 <= r.r_score <= 5 and 1 <= r.f_score <= 5 for r in rows)
