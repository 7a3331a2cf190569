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


def test_quoted_numeric_text_coerces_like_jackson(spark, valid_event):
    """FIXTURES.md §A.5: quoted NUMERIC text coerces to the number, like
    Jackson's as*() accessors — so the quoted trip_id that P3 itself
    emits keeps its value when fed back through P1 instead of collapsing
    to the 0 default."""
    valid_event["trip_id"] = "9000001"
    valid_event["vendor_id"] = "2"
    valid_event["fare_amount"] = "10.5"
    out = parse_trip_events(_raw_df(spark, [json.dumps(valid_event)])).collect()
    assert len(out) == 1
    assert out[0].trip_id == 9000001
    assert out[0].vendor_id == 2
    assert out[0].fare_amount == 10.5


def test_unparseable_trip_id_defaults_to_zero_like_jackson(spark, valid_event):
    # Jackson asLong(0) on unparseable text -> default 0, record kept
    # (trip_id is an optional field); required fields stay strict.
    valid_event["trip_id"] = "garbage"
    out = parse_trip_events(_raw_df(spark, [json.dumps(valid_event)])).collect()
    assert len(out) == 1 and out[0].trip_id == 0


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
    # the QUOTED trip_id P3 emits coerces back to its long value when a
    # producer feeds such records into P1 (timestamps are epoch-millis in
    # P3 output — a consumer contract, not the P1 input grammar — so only
    # the scalar fields are round-trippable, same as the reference)
    assert obj["trip_id"] == str(valid_event["trip_id"])


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


# ---------------------------------------------------------------------------
# Property test (VERDICT r6 #6): hypothesis-generated TripEvent JSON with
# randomized field order, missing/null/coerced fields, unicode padding, and
# boundary timestamps, checked against a pure-Python reference decode of
# the pinned semantics (FIXTURES.md §A.5 + the Joda timestamp grammar).
# ---------------------------------------------------------------------------

import datetime as _dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_INT_FIELDS = [
    "vendor_id",
    "passenger_count",
    "ratecode_id",
    "pickup_location_id",
    "dropoff_location_id",
    "payment_type",
]
_DOUBLE_FIELDS = [
    "trip_distance",
    "fare_amount",
    "extra",
    "mta_tax",
    "tip_amount",
    "tolls_amount",
    "improvement_surcharge",
    "total_amount",
]
_SCHEMA_ORDER = [
    "vendor_id", "pickup_datetime", "dropoff_datetime", "passenger_count",
    "trip_distance", "ratecode_id", "store_and_fwd_flag",
    "pickup_location_id", "dropoff_location_id", "payment_type",
    "fare_amount", "extra", "mta_tax", "tip_amount", "tolls_amount",
    "improvement_surcharge", "total_amount", "trip_id", "type", "padding",
]
_MISSING = object()
_CORRUPT = object()

_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=12
)
_i32 = st.one_of(
    st.sampled_from([0, 1, -1, 2147483647, -2147483648]),
    st.integers(-2147483648, 2147483647),
)
_i64 = st.one_of(
    st.sampled_from([0, 1, 2**63 - 1, -(2**63)]),
    st.integers(-(2**63), 2**63 - 1),
)
_dbl = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e12, max_value=1e12
)


def _draw_timestamp(draw):
    """(json_text, expected_epoch_micros | _CORRUPT) for one timestamp."""
    kind = draw(st.sampled_from(["iso", "iso", "iso", "space", "null", "missing"]))
    if kind == "missing":
        return _MISSING, _CORRUPT
    if kind == "null":
        return None, _CORRUPT
    if kind == "space":
        return "2018-11-23 20:30:14", _CORRUPT  # Joda rejects; so do we
    y = draw(st.integers(1900, 2100))
    mo = draw(st.integers(1, 12))
    d = draw(st.integers(1, 28))
    text = f"{y:04d}-{mo:02d}-{d:02d}"
    h = mi = s = micros = 0
    offset_min = 0
    if draw(st.booleans()):  # optional 'T' time
        h, mi = draw(st.integers(0, 23)), draw(st.integers(0, 59))
        text += f"T{h:02d}:{mi:02d}"
        if draw(st.booleans()):  # optional seconds
            s = draw(st.integers(0, 59))
            text += f":{s:02d}"
            ndigits = draw(st.integers(0, 9))
            if ndigits:  # optional fraction, 1-9 digits, micros kept
                frac = "".join(
                    str(draw(st.integers(0, 9))) for _ in range(ndigits)
                )
                text += f".{frac}"
                micros = int(frac[:6].ljust(6, "0"))
        if draw(st.booleans()):  # optional zone offset
            if draw(st.booleans()):
                text += "Z"
            else:
                offset_min = draw(st.integers(-14 * 60, 14 * 60))
                sign = "+" if offset_min >= 0 else "-"
                text += f"{sign}{abs(offset_min) // 60:02d}:{abs(offset_min) % 60:02d}"
    tz = _dt.timezone(_dt.timedelta(minutes=offset_min))
    base = _dt.datetime(y, mo, d, h, mi, s, tzinfo=tz)
    epoch = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
    return text, int((base - epoch).total_seconds()) * 1_000_000 + micros


def _draw_record(draw):
    """(json_line, expected_tuple_or_None). None == corrupt split."""
    rec: dict = {}
    exp: dict = {}

    def put(name, json_val, expected):
        if json_val is not _MISSING:
            rec[name] = json_val
        exp[name] = expected

    for f in _INT_FIELDS:
        kind = draw(st.sampled_from(["num", "num", "quoted", "null", "missing", "text"]))
        if kind == "num":
            v = draw(_i32)
            put(f, v, v)
        elif kind == "quoted":
            v = draw(_i32)
            put(f, str(v), v)  # Jackson asInt coercion
        elif kind == "text":
            put(f, "abc", _CORRUPT)  # pinned stricter-than-Jackson
        else:
            put(f, None if kind == "null" else _MISSING, _CORRUPT)
    for f in _DOUBLE_FIELDS:
        kind = draw(st.sampled_from(["num", "num", "num", "quoted", "int", "missing"]))
        if kind == "missing":
            put(f, _MISSING, _CORRUPT)
        elif kind == "int":
            v = draw(_i32)
            put(f, v, float(v))
        else:
            v = draw(_dbl)
            put(f, str(v) if kind == "quoted" else v, v)
    for f in ("store_and_fwd_flag", "type"):
        kind = draw(st.sampled_from(["text", "text", "text", "null", "missing"]))
        if kind == "text":
            v = draw(_text)
            put(f, v, v)
        else:
            put(f, None if kind == "null" else _MISSING, _CORRUPT)
    kind = draw(st.sampled_from(["num", "quoted", "garbage", "null", "missing"]))
    if kind in ("num", "quoted"):
        v = draw(_i64)
        put("trip_id", str(v) if kind == "quoted" else v, v)
    else:  # unparseable/absent -> Jackson asLong(0) default, record kept
        put("trip_id", None if kind == "null" else (_MISSING if kind == "missing" else "garbage"), 0)
    kind = draw(st.sampled_from(["text", "null", "missing"]))
    v = draw(_text) if kind == "text" else None
    put("padding", _MISSING if kind == "missing" else v, v if v is not None else "")
    for f in ("pickup_datetime", "dropoff_datetime"):
        jv, ev = _draw_timestamp(draw)
        put(f, jv, ev)

    # randomized field order (the reference reads by name; order-free)
    names = [n for n in rec]
    order = draw(st.permutations(names))
    line = json.dumps({n: rec[n] for n in order})
    if any(exp[n] is _CORRUPT for n in _SCHEMA_ORDER):
        return line, None
    return line, tuple(exp[n] for n in _SCHEMA_ORDER)


@given(data=st.data())
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_parse_property_matches_reference_decode(spark, data):
    from pyspark.sql import functions as F

    records = [
        _draw_record(data.draw) for _ in range(data.draw(st.integers(3, 8)))
    ]
    df = _raw_df(spark, [line for line, _ in records])
    valid, corrupt = split_corrupt(df)
    cols = [
        F.unix_micros(F.col(n)).alias(n)
        if n in ("pickup_datetime", "dropoff_datetime")
        else F.col(n)
        for n in _SCHEMA_ORDER
    ]
    got_valid = sorted(
        tuple(r) for r in valid.select(*cols).collect()
    )
    want_valid = sorted(e for _, e in records if e is not None)
    assert got_valid == want_valid
    got_corrupt = sorted(r.raw_payload for r in corrupt.collect())
    want_corrupt = sorted(line for line, e in records if e is None)
    assert got_corrupt == want_corrupt


def test_parse_raw_replaces_preexisting_event_and_temp_columns(spark):
    """withColumn replacement semantics: re-parsing a DataFrame that
    already carries an `event` struct (or a stale `__parse_strings`)
    must REPLACE it, not emit a duplicate column that makes every
    downstream F.col('event') reference ambiguous."""
    from pyspark.sql import functions as F

    from amazon_kinesis_analytics_streaming_etl_spark.operators.parse import (
        parse_trip_events_raw,
        split_corrupt,
    )

    raw = spark.createDataFrame(
        [('{"trip_id": 7, "type": "trip"}',)], "value string"
    ).withColumn("event", F.lit("stale")).withColumn(
        "__parse_strings", F.lit("stale")
    )
    out = parse_trip_events_raw(raw)
    assert out.columns.count("event") == 1
    assert "__parse_strings" not in out.columns
    row = out.select(F.col("event").getField("trip_id").alias("t")).collect()[0]
    assert row.t == 7
    # split_corrupt on the re-parsed frame must not hit an ambiguous ref
    valid, corrupt = split_corrupt(parse_trip_events_raw(out))
    assert valid.count() + corrupt.count() == 1
