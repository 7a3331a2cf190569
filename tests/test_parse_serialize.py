"""P1/P2/P3 parity tests — FIXTURES.md §A edge-case contract.

Reference semantics under test: utils/TripEventSchema.java:49-83 (parse)
and :96-162 (18-field JSON projection).
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from amazon_kinesis_analytics_streaming_etl_spark.operators.parse import (
    parse_trip_events,
    split_corrupt,
)
from amazon_kinesis_analytics_streaming_etl_spark.operators.serialize import (
    OUTPUT_JSON_FIELDS,
    trip_event_to_json,
)


def _raw_df(spark, payloads: list[str]):
    return spark.createDataFrame([(p,) for p in payloads], ["value"])


def test_valid_event_parses(spark, valid_event):
    out = parse_trip_events(_raw_df(spark, [json.dumps(valid_event)])).collect()
    assert len(out) == 1
    row = out[0]
    assert row.vendor_id == 2
    assert row.trip_id == 9000001
    assert row.pickup_datetime.year == 2018 and row.pickup_datetime.month == 11
    assert row.store_and_fwd_flag == "N"


def test_missing_trip_id_defaults_to_zero(spark, valid_event):
    # TripEventSchema.java:74 — asLong(0)
    valid_event.pop("trip_id")
    out = parse_trip_events(_raw_df(spark, [json.dumps(valid_event)])).collect()
    assert len(out) == 1 and out[0].trip_id == 0


def test_missing_padding_defaults_to_empty(spark, valid_event):
    # TripEventSchema.java:53,76
    valid_event.pop("padding")
    out = parse_trip_events(_raw_df(spark, [json.dumps(valid_event)])).collect()
    assert len(out) == 1 and out[0].padding == ""


def test_malformed_records_dropped_and_dead_lettered(spark, valid_event):
    missing_field = dict(valid_event)
    missing_field.pop("vendor_id")  # NPE-drop in reference
    bad_ts = dict(valid_event)
    bad_ts["pickup_datetime"] = "yesterday-ish"  # DateTime ctor throw
    payloads = [
        json.dumps(valid_event),
        "not json at all",
        json.dumps(missing_field),
        json.dumps(bad_ts),
    ]
    valid, corrupt = split_corrupt(_raw_df(spark, payloads))
    assert valid.count() == 1
    dead = {r.raw_payload for r in corrupt.collect()}
    assert len(dead) == 3 and "not json at all" in dead


def test_non_numeric_text_is_corrupt_not_coerced(spark, valid_event):
    # Engine pins strict behavior (FIXTURES.md §A.5): reference's Jackson
    # would coerce "abc" -> 0; we route to the corrupt split.
    valid_event["passenger_count"] = "abc"
    valid, corrupt = split_corrupt(_raw_df(spark, [json.dumps(valid_event)]))
    assert valid.count() == 0 and corrupt.count() == 1


def test_output_json_projection_18_fields_order_and_codecs(spark, valid_event):
    # TripEventSchema.java:96-138: 18 fields, fixed order, epoch millis,
    # quoted trip_id/type, payment_type+padding omitted.
    events = parse_trip_events(_raw_df(spark, [json.dumps(valid_event)]))
    payload = trip_event_to_json(events).select("value").head()[0]
    obj = json.loads(payload)
    assert list(obj.keys()) == OUTPUT_JSON_FIELDS
    assert len(obj) == 18
    assert "payment_type" not in obj and "padding" not in obj
    assert isinstance(obj["pickup_datetime"], int)  # epoch millis
    # 2018-11-23T20:30:14 UTC == 1543005014000 ms
    assert obj["pickup_datetime"] == 1543005014000
    assert obj["trip_id"] == "9000001" and obj["type"] == "trip"
    assert obj["fare_amount"] == 10.5


def test_roundtrip_parse_serialize_parse(spark, valid_event):
    events = parse_trip_events(_raw_df(spark, [json.dumps(valid_event)]))
    reserialized = trip_event_to_json(events).select("value")
    # Timestamps come back as epoch millis (not ISO), so emulate a consumer
    # reading the 18-field stream: all scalar fields survive untouched.
    obj = json.loads(reserialized.head()[0])
    for k in OUTPUT_JSON_FIELDS:
        if k in ("pickup_datetime", "dropoff_datetime", "trip_id", "type"):
            continue
        assert obj[k] == valid_event[k], k


def test_timestamp_grammar_matches_joda_iso(spark, valid_event):
    """The pinned timestampFormat must accept what Joda `new DateTime(text)`
    accepts (fraction, offset, Z) and reject what it rejects
    (space-separated local datetime) — TripEventSchema.java:58-59 drops
    records whose timestamps Joda can't parse."""
    import json

    from amazon_kinesis_analytics_streaming_etl_spark.operators.parse import split_corrupt

    def row(ts):
        e = dict(valid_event)
        e["pickup_datetime"] = ts
        return json.dumps(e)

    accepted = [
        "2018-11-23T20:30:14",
        "2018-11-23T20:30:14.123",
        "2018-11-23T20:30:14+02:00",
        "2018-11-23T20:30:14.123+02:00",
        "2018-11-23T20:30:14Z",
        # Joda accepts 1-9 fraction digits and coarser ISO precision:
        "2018-11-23T20:30:14.1",
        "2018-11-23T20:30:14.1234",
        "2018-11-23T20:30:14.123456789",
        "2018-11-23T20:30",
        "2018-11-23",
    ]
    rejected = ["2018-11-23 20:30:14", "23/11/2018 20:30"]
    df = spark.createDataFrame(
        [(row(ts),) for ts in accepted + rejected], "value string"
    )
    valid, corrupt = split_corrupt(df)
    assert valid.count() == len(accepted)
    assert corrupt.count() == len(rejected)
