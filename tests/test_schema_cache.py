"""read_sf_parquet: the per-session schema cache must be metadata-only —
cached reads are bit-identical to fresh-inference reads (same resolved
schema, same rows), and the cache never leaks across sessions (it lives on
the session object). Guards the r12 optimization that removed the
per-DataFrame footer/schema-inference cost from every testdata table read."""
from __future__ import annotations

from amazon_kinesis_analytics_streaming_etl_spark.schemas import (
    _SF_SCHEMA_CACHE_ATTR,
    read_sf_parquet,
)
from tests.conftest import SF_SMOKE


def test_cached_read_matches_fresh_inference(spark):
    fresh = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    first = read_sf_parquet(spark, SF_SMOKE, "lineitem")   # populates cache
    cached = read_sf_parquet(spark, SF_SMOKE, "lineitem")  # explicit-schema read
    assert cached.schema == fresh.schema == first.schema
    assert cached.orderBy("l_orderkey", "l_linenumber").collect() == fresh.orderBy(
        "l_orderkey", "l_linenumber"
    ).collect()
    cache = getattr(spark, _SF_SCHEMA_CACHE_ATTR)
    assert f"{SF_SMOKE}/lineitem.parquet" in cache


def test_cache_is_per_path(spark):
    read_sf_parquet(spark, SF_SMOKE, "nation")
    read_sf_parquet(spark, SF_SMOKE, "region")
    cache = getattr(spark, _SF_SCHEMA_CACHE_ATTR)
    assert cache[f"{SF_SMOKE}/nation.parquet"] != cache[f"{SF_SMOKE}/region.parquet"]


def test_cached_read_keeps_pushdown(spark):
    # The explicit-schema read must not change the scan's pushdown behavior.
    read_sf_parquet(spark, SF_SMOKE, "lineitem")  # warm the cache
    df = read_sf_parquet(spark, SF_SMOKE, "lineitem").where("l_orderkey = 1")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "l_orderkey" in plan
