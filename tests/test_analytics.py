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
