"""P3 — the 18-field output JSON projection.

Reference semantics (utils/TripEventSchema.java:96-162 ``toJson``):

- Emits exactly 18 of the 20 TripEvent fields, in a fixed order;
  **``payment_type`` and ``padding`` are omitted**.
- Timestamps serialized as epoch **millis** (TripEventSchema.java:102-104).
- ``trip_id`` and ``type`` are emitted as quoted strings
  (TripEventSchema.java:132-134); numerics unquoted.

Spark-first realization: ``to_json(struct(<explicit projection>))`` — the
projection list IS the semantics. ``to_json`` keeps struct field order, so
the field order matches the reference byte stream; separators differ
(``{"a":1`` vs ``{"a": 1``) which is JSON-equivalent and pinned as the
engine's canonical form in tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Field order of the reference's toJson (TripEventSchema.java:99-138).
OUTPUT_JSON_FIELDS = [
    "vendor_id",
    "pickup_datetime",
    "dropoff_datetime",
    "passenger_count",
    "trip_distance",
    "ratecode_id",
    "store_and_fwd_flag",
    "pickup_location_id",
    "dropoff_location_id",
    "fare_amount",
    "extra",
    "mta_tax",
    "tip_amount",
    "tolls_amount",
    "improvement_surcharge",
    "total_amount",
    "trip_id",
    "type",
]


def output_json_struct() -> Column:
    """The 18-field struct, reference field order and codecs."""
    cols: list[Column] = []
    for name in OUTPUT_JSON_FIELDS:
        if name in ("pickup_datetime", "dropoff_datetime"):
            cols.append(F.unix_millis(F.col(name)).alias(name))
        elif name in ("trip_id", "type"):
            cols.append(F.col(name).cast("string").alias(name))
        else:
            cols.append(F.col(name))
    return F.struct(*cols)


def trip_event_to_json(df: DataFrame, out_col: str = "value") -> DataFrame:
    """Append the serialized JSON payload column (used by the Kinesis,
    Kafka, S3-row and Elasticsearch sinks — reference StreamingEtl.java:233,
    :258 via TripEventSchema.serialize:44-46)."""
    return df.withColumn(out_col, F.to_json(output_json_struct()))
