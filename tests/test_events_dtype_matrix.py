"""The events.parquet `ts` column has shipped in two layouts (int64
TIMESTAMP(NANOS), then TIMESTAMP(MICROS)); `load_events` must dispatch on
whatever the footer resolves to. The testdata format changed once already —
this matrix pins both paths so it can't break silently a second time."""
from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql.types import TimestampType

from amazon_kinesis_analytics_streaming_etl_spark.schemas import (
    load_events,
    load_events_stream,
)
from tests.conftest import SF_SMOKE

ROWS = [
    (0, dt.datetime(2024, 1, 1, 0, 0, 0, 123456), 7, "click", 1.5, "{}"),
    (1, dt.datetime(2024, 1, 2, 3, 4, 5, 654321), 9, "view", 2.5, "{}"),
]


def _write_events(path: str, unit: str) -> None:
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in ROWS], pa.int64()),
            "ts": pa.array([r[1] for r in ROWS], pa.timestamp(unit)),
            "user_id": pa.array([r[2] for r in ROWS], pa.int64()),
            "event_type": pa.array([r[3] for r in ROWS], pa.string()),
            "value": pa.array([r[4] for r in ROWS], pa.float64()),
            "props": pa.array([r[5] for r in ROWS], pa.string()),
        }
    )
    # store_schema=False keeps DuckDB/Spark reading the physical parquet
    # type instead of round-tripping through the embedded Arrow schema.
    pq.write_table(table, path, store_schema=False)


def _check(spark, sf_dir):
    df = load_events(spark, sf_dir)
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    got = {r.event_id: r.ts for r in df.collect()}
    assert got == {r[0]: r[1] for r in ROWS}


def test_load_events_micros_layout(spark, tmp_path):
    d = str(tmp_path / "us")
    os.makedirs(d)
    _write_events(f"{d}/events.parquet", "us")
    _check(spark, d)


def test_load_events_nanos_layout(spark, tmp_path):
    d = str(tmp_path / "ns")
    os.makedirs(d)
    _write_events(f"{d}/events.parquet", "ns")
    _check(spark, d)


def test_load_events_real_testdata(spark):
    df = load_events(spark, SF_SMOKE)
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    assert df.count() > 0


def test_load_events_stream_matches_batch(spark, tmp_path):
    for unit in ("us", "ns"):
        d = str(tmp_path / f"s_{unit}")
        os.makedirs(d)
        _write_events(f"{d}/events.parquet", unit)
        stream = load_events_stream(spark, d)
        assert stream.isStreaming
        assert stream.schema == load_events(spark, d).schema
