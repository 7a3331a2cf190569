"""Avro interop — the reference's native record format, Spark-first.

The reference serializes TripEvent records as Avro
(reference: src/main/avro/TripEvent.avsc:1-93; utils/TripEventSchema.java
registers the timestamp-millis conversion) and ships them over
Kinesis/Kafka. This module gives the engine a symmetric
``from_avro``/``to_avro`` surface:

- **Native path** (real cluster): `pyspark.sql.avro.functions` backed by
  the spark-avro jar — fully JVM-side, whole-stage codegen friendly.
- **Fallback path** (this sandbox — pip pyspark ships no spark-avro jar):
  the spec-faithful pure-Python codec in
  :mod:`..functions.avro_codec` behind Arrow-batched pandas UDFs.
  Timestamp conversion stays JVM-side either way (``unix_millis`` /
  ``timestamp_millis``) so no float/precision drift can creep in.

Malformed payloads decode to an all-null struct and flow to the same
dead-letter split as the JSON path (operators/parse.py) — P2 semantics
are format-independent.
"""

from __future__ import annotations

import json
from functools import lru_cache

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BinaryType,
    DataType,
    LongType,
    StructField,
    StructType,
)

from ..functions import avro_codec
from ..schemas import TRIP_EVENT_SCHEMA

#: Python mirror of reference src/main/avro/TripEvent.avsc:1-93 —
#: field-for-field, timestamps as Avro long + timestamp-millis.
TRIP_EVENT_AVSC: dict = {
    "name": "TripEvent",
    "namespace": "com.amazonaws.samples.kinesisanalytics.flink.streaming.etl.events",
    "type": "record",
    "fields": [
        {"name": "vendor_id", "type": "int"},
        {"name": "pickup_datetime",
         "type": {"type": "long", "logicalType": "timestamp-millis"}},
        {"name": "dropoff_datetime",
         "type": {"type": "long", "logicalType": "timestamp-millis"}},
        {"name": "passenger_count", "type": "int"},
        {"name": "trip_distance", "type": "double"},
        {"name": "ratecode_id", "type": "int"},
        {"name": "store_and_fwd_flag", "type": "string"},
        {"name": "pickup_location_id", "type": "int"},
        {"name": "dropoff_location_id", "type": "int"},
        {"name": "payment_type", "type": "int"},
        {"name": "fare_amount", "type": "double"},
        {"name": "extra", "type": "double"},
        {"name": "mta_tax", "type": "double"},
        {"name": "tip_amount", "type": "double"},
        {"name": "tolls_amount", "type": "double"},
        {"name": "improvement_surcharge", "type": "double"},
        {"name": "total_amount", "type": "double"},
        {"name": "trip_id", "type": "long"},
        {"name": "type", "type": "string"},
        {"name": "padding", "type": "string"},
    ],
}

#: Avro schema for the testdata ``events`` table (exercises the nullable
#: union + timestamp-micros paths the TripEvent schema doesn't).
EVENT_AVSC: dict = {
    "name": "Event",
    "type": "record",
    "fields": [
        {"name": "event_id", "type": "long"},
        {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}},
        {"name": "user_id", "type": "long"},
        {"name": "event_type", "type": "string"},
        {"name": "value", "type": "double"},
        {"name": "props", "type": ["null", "string"]},
    ],
}


def physical_struct(avsc: dict, spark_schema: StructType) -> StructType:
    """The Avro-*physical* Spark struct for ``avsc``: logical timestamp
    fields ride as longs (millis/micros); everything else keeps the
    declared Spark type. Conversion to TimestampType happens JVM-side."""
    fields = []
    logical = _logical_fields(avsc)
    for f in spark_schema.fields:
        fields.append(
            StructField(f.name, LongType() if f.name in logical else f.dataType)
        )
    return StructType(fields)


def _logical_fields(avsc: dict) -> dict[str, str]:
    """field name -> 'timestamp-millis' | 'timestamp-micros'."""
    out = {}
    for f in avsc["fields"]:
        t = f["type"]
        if isinstance(t, dict) and t.get("logicalType", "").startswith("timestamp-"):
            out[f["name"]] = t["logicalType"]
    return out


@lru_cache(maxsize=1)
def native_avro_available(_cache_key: str = "jvm") -> bool:
    """True iff the spark-avro *data source* is actually usable (pip
    pyspark ships the SQL wrapper that raises AVRO_NOT_LOADED at analysis
    time, so probe a real 1-row evaluation, not Class.forName)."""
    try:
        spark = SparkSession.getActiveSession()
        if spark is None:
            return False
        from pyspark.sql.avro.functions import to_avro

        spark.range(1).select(
            to_avro(F.struct(F.lit(1).alias("a")))
        ).collect()
        return True
    except Exception:
        return False


# --- generic column-level from/to avro --------------------------------------

def to_avro_col(struct_col: Column, avsc: dict, physical: StructType) -> Column:
    """Encode a struct column (Avro-physical types: logical timestamps
    already longs) to raw Avro binary."""
    if native_avro_available():
        from pyspark.sql.avro.functions import to_avro

        return to_avro(struct_col, json.dumps(avsc))
    return _to_avro_fallback(avsc, physical)(struct_col)


def from_avro_col(binary_col: Column, avsc: dict, physical: StructType) -> Column:
    """Decode raw Avro binary to the Avro-physical struct. Malformed
    payloads yield an all-null struct (PERMISSIVE, like the JSON path)."""
    if native_avro_available():
        from pyspark.sql.avro.functions import from_avro

        return from_avro(binary_col, json.dumps(avsc), {"mode": "PERMISSIVE"})
    return _from_avro_fallback(avsc, physical)(binary_col)


def _to_avro_fallback(avsc: dict, physical: StructType):
    schema_json = json.dumps(avsc)
    field_names = [f.name for f in physical.fields]

    @pandas_udf(BinaryType())
    def enc(s: pd.DataFrame) -> pd.Series:
        schema = avro_codec.parse_schema(schema_json)
        out = []
        for row in s.itertuples(index=False):
            rec = {k: _py(v) for k, v in zip(field_names, row)}
            out.append(avro_codec.encode(schema, rec))
        return pd.Series(out)

    return enc


def _from_avro_fallback(avsc: dict, physical: StructType):
    schema_json = json.dumps(avsc)
    field_names = [f.name for f in physical.fields]

    @pandas_udf(physical)
    def dec(s: pd.Series) -> pd.DataFrame:
        schema = avro_codec.parse_schema(schema_json)
        rows = []
        for payload in s:
            try:
                rec = avro_codec.decode(schema, payload)
                rows.append([rec.get(n) for n in field_names])
            except Exception:
                rows.append([None] * len(field_names))  # dead-letter row
        return pd.DataFrame(rows, columns=field_names, dtype=object)

    return dec


def _py(v):
    """numpy scalar -> plain Python for the codec's type checks."""
    return v.item() if hasattr(v, "item") else v


# --- TripEvent-specific surface (P1/P2 parity for Avro payloads) ------------

_TRIP_PHYSICAL = physical_struct(TRIP_EVENT_AVSC, TRIP_EVENT_SCHEMA)


def to_avro_trip_events(events: DataFrame) -> DataFrame:
    """Serialize typed trip events to a single binary ``value`` column —
    byte-compatible with what the reference's Avro producer emits."""
    logical = _logical_fields(TRIP_EVENT_AVSC)
    cols = [
        F.unix_millis(F.col(f.name)).alias(f.name)
        if f.name in logical
        else F.col(f.name)
        for f in TRIP_EVENT_SCHEMA.fields
    ]
    packed = F.struct(*cols)
    return events.select(to_avro_col(packed, TRIP_EVENT_AVSC, _TRIP_PHYSICAL).alias("value"))


def parse_trip_events_avro(
    raw: DataFrame, value_col: str = "value"
) -> tuple[DataFrame, DataFrame]:
    """P1+P2 for Avro payloads: decode, split (valid, corrupt_raw),
    convert logical timestamps JVM-side; defaults applied as in the JSON
    path (trip_id->0, padding->'' — TripEventSchema.java:53,74,76)."""
    from .parse import PARSED_COL, _is_valid

    decoded = raw.withColumn(
        PARSED_COL, from_avro_col(F.col(value_col), TRIP_EVENT_AVSC, _TRIP_PHYSICAL)
    )
    valid_flag = _is_valid(F.col(PARSED_COL))
    logical = _logical_fields(TRIP_EVENT_AVSC)
    flat = [
        F.timestamp_millis(F.col(f"{PARSED_COL}.{name}")).alias(name)
        if name in logical
        else F.col(f"{PARSED_COL}.{name}").alias(name)
        for name in [f.name for f in TRIP_EVENT_SCHEMA.fields]
    ]
    valid = (
        decoded.where(valid_flag)
        .select(*flat)
        .withColumn("trip_id", F.coalesce(F.col("trip_id"), F.lit(0).cast("long")))
        .withColumn("padding", F.coalesce(F.col("padding"), F.lit("")))
    )
    corrupt = decoded.where(~valid_flag).select(F.col(value_col).alias("raw_payload"))
    return valid, corrupt


# --- events-table round-trip (oracle-checkable) -----------------------------

def avro_roundtrip_events(events: DataFrame) -> DataFrame:
    """events -> Avro binary -> decoded events, timestamps exact (micros
    long round-trip, JVM conversions). Identity by construction; the
    oracle gate hash-checks it against the untouched table."""
    from ..schemas import TESTDATA_SCHEMAS

    spark_schema = TESTDATA_SCHEMAS["events"]
    physical = physical_struct(EVENT_AVSC, spark_schema)
    packed = F.struct(
        F.col("event_id"),
        F.unix_micros(F.col("ts")).alias("ts"),
        F.col("user_id"),
        F.col("event_type"),
        F.col("value"),
        F.col("props"),
    )
    encoded = events.select(
        to_avro_col(packed, EVENT_AVSC, physical).alias("value")
    )
    dec = from_avro_col(F.col("value"), EVENT_AVSC, physical).alias("e")
    return encoded.select(dec).select(
        F.col("e.event_id").alias("event_id"),
        F.timestamp_micros(F.col("e.ts")).alias("ts"),
        F.col("e.user_id").alias("user_id"),
        F.col("e.event_type").alias("event_type"),
        F.col("e.value").alias("value"),
        F.col("e.props").alias("props"),
    )
