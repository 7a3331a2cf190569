"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()``    — every implemented operator query (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent SQL per query (correctness gate).

Implementation lives in ``amazon_kinesis_analytics_streaming_etl_spark.plans``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from amazon_kinesis_analytics_streaming_etl_spark.plans.catalog import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the 6-way TPC-H Q5-shape
    join (broadcast dims + shuffled fact joins + hash aggregate)."""
    return QUERIES["q5_region_revenue"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
