"""Avro interop: spec-pinned binary codec + TripEvent parse/dead-letter
parity with the JSON path (reference TripEvent.avsc:1-93)."""

from __future__ import annotations

import datetime as dt
import struct

import pytest
from pyspark.sql import functions as F

from amazon_kinesis_analytics_streaming_etl_spark.functions import avro_codec
from amazon_kinesis_analytics_streaming_etl_spark.operators.avro_interop import (
    EVENT_AVSC,
    TRIP_EVENT_AVSC,
    avro_roundtrip_events,
    parse_trip_events_avro,
    to_avro_trip_events,
)

from conftest import SF_SMOKE


# --- codec vs hand-computed spec bytes --------------------------------------

def test_codec_matches_hand_encoded_spec_bytes():
    """Pin the wire format against bytes computed by hand from the Avro
    spec (zigzag varints, length-prefixed utf-8, fields in order)."""
    schema = {
        "type": "record",
        "name": "T",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": "string"},
            {"name": "c", "type": "double"},
        ],
    }
    # a=1 -> zigzag 2 -> b'\x02'; b="hi" -> len 2 (b'\x04') + b'hi'
    want = b"\x02" + b"\x04hi" + struct.pack("<d", 2.5)
    assert avro_codec.encode(schema, {"a": 1, "b": "hi", "c": 2.5}) == want
    assert avro_codec.decode(schema, want) == {"a": 1, "b": "hi", "c": 2.5}


def test_codec_zigzag_negative_and_multibyte():
    schema = {"type": "record", "name": "T", "fields": [{"name": "a", "type": "long"}]}
    # -1 -> zigzag 1; 64 -> zigzag 128 -> varint b'\x80\x01'
    assert avro_codec.encode(schema, {"a": -1}) == b"\x01"
    assert avro_codec.encode(schema, {"a": 64}) == b"\x80\x01"
    for v in (0, -2, 63, -64, 2**40, -(2**40), 2**62, -(2**62)):
        assert avro_codec.decode(schema, avro_codec.encode(schema, {"a": v})) == {"a": v}


def test_codec_union_null_branch_and_containers():
    schema = {
        "type": "record",
        "name": "U",
        "fields": [
            {"name": "s", "type": ["null", "string"]},
            {"name": "xs", "type": {"type": "array", "items": "long"}},
            {"name": "m", "type": {"type": "map", "values": "double"}},
        ],
    }
    # null branch = union index 0 only
    enc = avro_codec.encode(schema, {"s": None, "xs": [], "m": {}})
    assert enc == b"\x00" + b"\x00" + b"\x00"  # idx 0, empty array, empty map
    val = {"s": "x", "xs": [1, -2, 3], "m": {"k": 1.5}}
    assert avro_codec.decode(schema, avro_codec.encode(schema, val)) == val


def test_codec_rejects_trailing_garbage_and_truncation():
    schema = {"type": "record", "name": "T", "fields": [{"name": "a", "type": "string"}]}
    good = avro_codec.encode(schema, {"a": "abc"})
    with pytest.raises(ValueError):
        avro_codec.decode(schema, good + b"\x00")
    with pytest.raises(ValueError):
        avro_codec.decode(schema, good[:-1])


# --- Spark round-trip -------------------------------------------------------

def test_events_avro_roundtrip_is_identity(spark):
    from amazon_kinesis_analytics_streaming_etl_spark.schemas import load_events

    ev = load_events(spark, SF_SMOKE)
    back = avro_roundtrip_events(ev)
    orig = {tuple(r) for r in ev.collect()}
    got = {tuple(r) for r in back.collect()}
    assert got == orig  # timestamps micro-exact, props nullable union


def test_trip_events_avro_parse_valid_and_dead_letter(spark):
    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = [
        (1, t0, t0 + dt.timedelta(minutes=9), 2, 3.5, 1, "N", 41, 152, 1,
         10.0, 0.5, 0.5, 2.0, 0.0, 0.3, 13.3, 77, "yellow", "pad"),
    ]
    from amazon_kinesis_analytics_streaming_etl_spark.schemas import TRIP_EVENT_SCHEMA

    events = spark.createDataFrame(rows, TRIP_EVENT_SCHEMA)
    encoded = to_avro_trip_events(events)

    garbage = spark.createDataFrame(
        [(bytearray(b"\xff\xfe not avro"),)], "value binary"
    )
    valid, corrupt = parse_trip_events_avro(encoded.unionByName(garbage))
    out = valid.collect()
    assert len(out) == 1 and corrupt.count() == 1
    r = out[0]
    assert (r.trip_id, r.type, r.pickup_location_id) == (77, "yellow", 41)
    assert r.pickup_datetime == t0  # millis-exact round trip


def test_trip_event_avsc_mirrors_reference_field_order():
    names = [f["name"] for f in TRIP_EVENT_AVSC["fields"]]
    from amazon_kinesis_analytics_streaming_etl_spark.schemas import TRIP_EVENT_SCHEMA

    assert names == [f.name for f in TRIP_EVENT_SCHEMA.fields]
    assert EVENT_AVSC["fields"][1]["type"]["logicalType"] == "timestamp-micros"


def test_pipeline_avro_input_end_to_end(spark, tmp_path):
    """InputEncoding=avro: Avro payload bytes (parquet-carried) stream
    through the full pipeline -- decode, dead-letter split, partitioned
    parquet sink -- matching the reference's native wire format."""
    import glob

    from amazon_kinesis_analytics_streaming_etl_spark.plans.pipeline import Pipeline
    from amazon_kinesis_analytics_streaming_etl_spark.schemas import TRIP_EVENT_SCHEMA

    t0 = dt.datetime(2018, 11, 23, 20, 30, 14)
    rows = [
        (1, t0, t0 + dt.timedelta(minutes=11), 1, 2.3, 1, "N", 5, 2, 1,
         10.5, 0.5, 0.5, 2.0, 0.0, 0.3, 14.0, 1000 + i, "trip", "")
        for i in range(6)
    ]
    events = spark.createDataFrame(rows, TRIP_EVENT_SCHEMA)
    src = str(tmp_path / "src")
    encoded = to_avro_trip_events(events)
    garbage = spark.createDataFrame([(bytearray(b"\x00garbage"),)], "value binary")
    encoded.unionByName(garbage).write.parquet(src)

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    Pipeline.from_config(spark, args=[
        "--InputFilePath", src, "--InputFileFormat", "parquet",
        "--InputEncoding", "avro",
        "--OutputBucket", out, "--ParquetConversion", "true",
        "--CheckpointLocation", ckpt,
    ]).run_available_now()

    dirs = glob.glob(f"{out}/job_start=*/pickup_location=005/year=2018/month=11")
    assert len(dirs) == 1
    df = spark.read.parquet(glob.glob(f"{out}/job_start=*")[0])
    assert df.count() == 6  # garbage record dead-lettered, not written
    assert sorted(r.trip_id for r in df.select("trip_id").collect()) == list(range(1000, 1006))


def test_avro_text_source_rejected(spark):
    from amazon_kinesis_analytics_streaming_etl_spark.config import (
        ConfigError,
        from_args_and_properties,
    )
    from amazon_kinesis_analytics_streaming_etl_spark.sources.streaming import file_source

    cfg = from_args_and_properties(["--InputFilePath", "/tmp/x", "--InputEncoding", "avro"])
    with pytest.raises(ConfigError, match="binary-capable"):
        file_source(spark, cfg)
