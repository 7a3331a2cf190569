"""Batch scan/sink roundtrips: JSON-lines and CSV with declared schemas,
plus the parquet boundary conversion with partition pruning."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from amazon_kinesis_analytics_streaming_etl_spark.sources import batch as bio
from tests.conftest import SF_SMOKE


def _orders(spark):
    return spark.read.parquet(f"{SF_SMOKE}/orders.parquet")


def test_json_roundtrip_preserves_rows_and_types(spark, tmp_path):
    src = _orders(spark)
    p = str(tmp_path / "orders_json")
    bio.write_json(src, p)
    back = bio.read_json(spark, p, bio.table_schema("orders"))
    assert back.schema == bio.table_schema("orders")
    assert back.count() == src.count()
    a = src.agg(F.round(F.sum("o_totalprice"), 2)).head()[0]
    b = back.agg(F.round(F.sum("o_totalprice"), 2)).head()[0]
    assert a == b


def test_csv_roundtrip_preserves_rows(spark, tmp_path):
    src = _orders(spark).drop("o_orderdate")  # CSV timestamp codecs vary; scope to scalars
    p = str(tmp_path / "orders_csv")
    bio.write_csv(src, p)
    from pyspark.sql.types import StructType

    schema = StructType([f for f in bio.table_schema("orders").fields if f.name != "o_orderdate"])
    back = bio.read_csv(spark, p, schema)
    assert back.count() == src.count()
    assert back.schema == schema


def test_json_corrupt_rows_become_null_fields(spark, tmp_path):
    p = str(tmp_path / "bad")
    import os

    os.makedirs(p)
    with open(f"{p}/rows.json", "w") as f:
        f.write('{"o_orderkey": 1, "o_custkey": 2, "o_orderstatus": "F", "o_totalprice": 10.0, "o_orderpriority": "1-URGENT"}\n')
        f.write("this is not json\n")
    back = bio.read_json(spark, p, bio.table_schema("orders"))
    rows = back.collect()
    assert len(rows) == 2
    ok = [r for r in rows if r.o_orderkey == 1]
    bad = [r for r in rows if r.o_orderkey is None]
    assert len(ok) == 1 and len(bad) == 1  # P2 contract: corrupt -> nulls, filterable


def test_convert_to_parquet_enables_partition_pruning(spark, tmp_path):
    p = str(tmp_path / "orders_part")
    src = _orders(spark).withColumn("status", F.col("o_orderstatus"))
    bio.convert_to_parquet(src, p, partition_by=["status"])
    assert sorted(
        d.split("=")[1] for d in glob.glob(f"{p}/status=*") for d in [d.split("/")[-1]]
    ) == ["F", "O", "P"]
    pruned = spark.read.parquet(p).where(F.col("status") == "F")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # only one partition directory scanned
    n_f = pruned.count()
    total = spark.read.parquet(p).count()
    assert 0 < n_f < total


def test_load_events_ts_exact_microseconds_vs_duckdb(spark):
    """ns->us conversion must be exact integer division: the double-division
    form ((ts/1000).cast('long')) silently loses 1us on ~1.5% of values
    because int64 nanos exceed 2^53 (ADVICE r1)."""
    import duckdb

    from amazon_kinesis_analytics_streaming_etl_spark.schemas import load_events

    ev = load_events(spark, SF_SMOKE)
    got = {
        r.event_id: r.us
        for r in ev.select(
            "event_id", F.unix_micros(F.col("ts")).alias("us")
        ).collect()
    }
    want = dict(
        duckdb.sql(
            f"SELECT event_id, epoch_us(ts) FROM '{SF_SMOKE}/events.parquet'"
        ).fetchall()
    )
    assert got == want
