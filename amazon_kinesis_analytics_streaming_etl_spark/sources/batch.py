"""Batch scans — parquet / JSON-lines / CSV with declared schemas.

Schema-on-read with DECLARED StructTypes (never inference: inference
costs an extra pass at scale and silently drifts types). Parquet is the
engine's at-rest format (columnar, predicate pushdown, partition
pruning); JSON/CSV scans exist for interop with the reference's row
outputs (K2 JSON rows are rescannable) and external feeds.

Scale notes: CSV/JSON scans only push filters partially (no row-group
stats) — convert to parquet at the boundary (``convert_to_parquet``)
before heavy querying; that's one linear pass that buys pushdown +
pruning + column statistics for every downstream query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ..schemas import TESTDATA_SCHEMAS


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_json(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """JSON-lines scan with a declared schema; corrupt rows become null
    fields (PERMISSIVE), mirroring the P2 parse contract."""
    return spark.read.schema(schema).json(path)


def read_csv(
    spark: SparkSession, path: str, schema: StructType, header: bool = True
) -> DataFrame:
    return spark.read.schema(schema).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    df.write.mode("overwrite").option("header", str(header).lower()).csv(path)


def convert_to_parquet(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    """The boundary conversion: land any feed as parquet before heavy
    querying (pushdown/pruning/stats are parquet-only)."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def table_schema(name: str) -> StructType:
    """Declared schema for a TESTDATA table name."""
    return TESTDATA_SCHEMAS[name]
