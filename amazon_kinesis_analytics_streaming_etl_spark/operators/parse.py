"""P1/P2 — schema-on-read JSON parsing with malformed-record routing.

Reference semantics (utils/TripEventSchema.java:49-83):

- JSON bytes parsed field-by-field with casts; ISO-8601 text timestamps.
- ``trip_id`` missing -> 0 (TripEventSchema.java:74 ``asLong(0)``).
- ``padding`` missing/null -> "" (TripEventSchema.java:53,76).
- Any other missing field or unparseable timestamp -> exception ->
  record logged + dropped (TripEventSchema.java:78-82).

Spark-first realization: one vectorized ``from_json`` projection (JVM-side,
whole-stage codegen) instead of per-record Java. PERMISSIVE mode turns
malformed records into null fields; we split the stream into (valid,
corrupt) DataFrames instead of silently dropping — the corrupt branch is a
first-class dead-letter output (an engine improvement; the valid keep-set is
identical to the reference's).

Coercion pins (FIXTURES.md §A.5):

- Quoted NUMERIC text in a numeric field coerces to the number, exactly
  like Jackson's ``asInt/asLong/asDouble`` on a textual node
  (TripEventSchema.java:57-77 reads every field through those coercing
  accessors). Concretely: the P3 output contract itself emits
  ``trip_id`` as a quoted string (TripEventSchema.java:96-138), so
  records shaped like the engine's own output keep their ids when fed
  back through P1 instead of silently collapsing to the 0 default.
- NON-numeric text in a numeric field stays corrupt (stricter than
  Jackson, which coerces it to 0/0.0) — pinned by tests.

Realized by parsing into an all-string-leaf struct and ``try_cast``-ing
each field to its target type (``try_to_timestamp`` for the two
timestamps, same pinned grammar): string->number casts coerce quoted
numerics, fail to NULL on garbage regardless of ANSI mode, and the whole
projection stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType, TimestampType

from ..schemas import TRIP_EVENT_REQUIRED_FIELDS, TRIP_EVENT_SCHEMA

#: Name of the struct column holding the parsed event.
PARSED_COL = "event"

#: Pinned ISO-8601 timestamp grammar, mirroring what Joda's
#: ``new DateTime(text)`` accepts (TripEventSchema.java:58-59): calendar
#: date, optional 'T' time at minute/second precision, optional fraction
#: (1-9 digits; micros kept, the rest truncated), optional zone offset
#: incl. 'Z'. Pinning it does two things: (1) parity — Spark's fallback
#: parser also accepts space-separated timestamps, which Joda rejects
#: (reference drops such records; so must we); (2) speed — one
#: DateTimeFormatter instead of the multi-format fallback chain is ~25%
#: faster on the JSON hot path. Residual gap vs Joda (still
#: dead-lettered here, accepted there): hour-only times ('T20'),
#: fractional minutes/hours, and week/ordinal dates — none of which the
#: reference's producers emit.
TIMESTAMP_FORMAT = "yyyy-MM-dd['T'HH:mm[:ss[.SSSSSSSSS]]][XXX]"

#: All-string-leaf twin of TRIP_EVENT_SCHEMA: from_json captures every
#: scalar token's text; the typed projection below applies the coercion
#: pins field-by-field.
_STRING_SCHEMA = StructType(
    [StructField(f.name, StringType()) for f in TRIP_EVENT_SCHEMA.fields]
)


def _typed(strings: Column, field: StructField) -> Column:
    c = strings.getField(field.name)
    if isinstance(field.dataType, TimestampType):
        return F.try_to_timestamp(c, F.lit(TIMESTAMP_FORMAT))
    if isinstance(field.dataType, StringType):
        return c
    return c.try_cast(field.dataType)


def parse_trip_events_raw(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Attach a parsed ``event`` struct column to a DataFrame of raw
    JSON payloads (string or binary ``value_col``). Works identically on
    batch and streaming DataFrames.

    Malformed JSON -> null struct (PERMISSIVE); per-field conversion
    failures -> null field (``try_cast`` / ``try_to_timestamp``, never a
    throw even under ANSI). Quoted numerics coerce like Jackson's
    ``as*()`` accessors — so e.g. the quoted ``trip_id`` that P3 emits
    keeps its value instead of collapsing to the 0 default.
    """
    payload = F.col(value_col).cast("string")
    strings = F.from_json(payload, _STRING_SCHEMA, {"mode": "PERMISSIVE"})
    # Plan-shape contract: exactly ONE JsonToStructs per record, however
    # many fields consumers touch and however they filter. Two structural
    # defenses, both load-bearing (measured 5-8x on the all-field path:
    # 6.9s -> 1.2s per 400k rows):
    #
    # 1. The string struct is materialized as its own attribute in a
    #    SEPARATE Project. Referencing the `strings` Column object ~21
    #    times inside one projection embeds ~21 copies of the
    #    JsonToStructs subtree, and nothing downstream recovers the
    #    sharing — JsonToStructs is CodegenFallback (codegen
    #    subexpression elimination skips it) and OptimizeJsonExprs
    #    schema-prunes each GetStructField copy into its OWN
    #    single-field from_json, i.e. ~20 full JSON tokenizations per
    #    record. With the attribute boundary, CollapseProject refuses to
    #    merge (the alias is non-cheap and multiply referenced).
    # 2. The event struct is emitted through `explode(array(event))` — a
    #    one-row-per-row Generate node. Without it, a downstream
    #    validity filter (split_corrupt's ~18 IS NOT NULL conjuncts) is
    #    pushed through BOTH Projects by PushPredicateThroughNonJoin,
    #    which substitutes aliases unconditionally and lands ~18
    #    from_json copies in the Filter condition below the parse.
    #    Predicates on generator output cannot cross a Generate, so the
    #    filter stays above the single parse. explode(array(x)) yields
    #    exactly one row with column x even when x is null, so the
    #    corrupt branch still sees its rows.
    tmp = "__parse_strings"
    # withColumn REPLACEMENT semantics: a pre-existing `event` (re-parse
    # of parsed output) or `__parse_strings` column would otherwise
    # collide with the aliases below and make every F.col reference
    # ambiguous downstream
    keep = [c for c in raw.columns if c not in (PARSED_COL, tmp)]
    with_strings = raw.select(*keep, strings.alias(tmp))
    s = F.col(tmp)
    event = F.when(
        s.isNull(), F.lit(None).cast(TRIP_EVENT_SCHEMA)
    ).otherwise(
        F.struct(
            *[_typed(s, f).alias(f.name) for f in TRIP_EVENT_SCHEMA.fields]
        )
    )
    return with_strings.select(
        *keep, F.explode(F.array(event)).alias(PARSED_COL)
    )


def _is_valid(event: Column) -> Column:
    """A record is valid iff every required field parsed non-null
    (mirrors the reference's NPE-drop for missing fields,
    TripEventSchema.java:57-82)."""
    cond = event.isNotNull()
    for name in TRIP_EVENT_REQUIRED_FIELDS:
        cond = cond & event.getField(name).isNotNull()
    return cond


def split_corrupt(
    raw: DataFrame, value_col: str = "value", materialize: bool = False
) -> tuple[DataFrame, DataFrame]:
    """Parse and split into (valid_events, corrupt_raw).

    ``valid_events`` has the flattened TRIP_EVENT_SCHEMA columns with the
    reference's defaults applied (trip_id->0, padding->""). ``corrupt_raw``
    keeps the original payload for dead-lettering.

    ``materialize=True`` localCheckpoints the PARSED frame (lazily, on
    the first branch's job) so consumers that run separate actions per
    branch tokenize each payload once — the production dead-letter
    topology, where foreachBatch persists the parsed batch before fanning
    out. Leave False inside a single-action plan (e.g. the pipeline,
    which persists at the batch level itself).
    """
    parsed = parse_trip_events_raw(raw, value_col)
    if materialize:
        parsed = parsed.localCheckpoint(eager=False)
    valid_flag = _is_valid(F.col(PARSED_COL))

    valid = (
        parsed.where(valid_flag)
        .select(F.col(PARSED_COL + ".*"))
        .withColumn("trip_id", F.coalesce(F.col("trip_id"), F.lit(0).cast("long")))
        .withColumn("padding", F.coalesce(F.col("padding"), F.lit("")))
    )
    corrupt = parsed.where(~valid_flag).select(
        F.col(value_col).cast("string").alias("raw_payload")
    )
    return valid, corrupt


def parse_trip_events(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """P1+P2 composed: parse, drop malformed, apply defaults — the exact
    observable keep-set of the reference connector deserializer."""
    valid, _ = split_corrupt(raw, value_col)
    return valid
