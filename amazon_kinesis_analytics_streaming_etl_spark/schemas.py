"""Declared schemas — the single source of truth (no inference).

TRIP_EVENT_SCHEMA mirrors the reference's Avro schema
(reference: src/main/avro/TripEvent.avsc:5-92) field-for-field with the
timestamp-millis logical type mapped to Spark TimestampType
(reference: utils/TripEventSchema.java:39-41 registers that conversion).

TESTDATA table schemas mirror /root/repo/FIXTURES.md §B.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --- TripEvent (reference: src/main/avro/TripEvent.avsc:5-92) ---------------

TRIP_EVENT_SCHEMA = StructType(
    [
        StructField("vendor_id", IntegerType()),            # TripEvent.avsc:6-9
        StructField("pickup_datetime", TimestampType()),    # TripEvent.avsc:10-16
        StructField("dropoff_datetime", TimestampType()),   # TripEvent.avsc:17-23
        StructField("passenger_count", IntegerType()),      # TripEvent.avsc:24-27
        StructField("trip_distance", DoubleType()),         # TripEvent.avsc:28-31
        StructField("ratecode_id", IntegerType()),          # TripEvent.avsc:32-35
        StructField("store_and_fwd_flag", StringType()),    # TripEvent.avsc:36-39
        StructField("pickup_location_id", IntegerType()),   # TripEvent.avsc:40-43
        StructField("dropoff_location_id", IntegerType()),  # TripEvent.avsc:44-47
        StructField("payment_type", IntegerType()),         # TripEvent.avsc:48-51
        StructField("fare_amount", DoubleType()),
        StructField("extra", DoubleType()),
        StructField("mta_tax", DoubleType()),
        StructField("tip_amount", DoubleType()),
        StructField("tolls_amount", DoubleType()),
        StructField("improvement_surcharge", DoubleType()),
        StructField("total_amount", DoubleType()),          # TripEvent.avsc:52-79
        StructField("trip_id", LongType()),                 # TripEvent.avsc:80-83
        StructField("type", StringType()),                  # TripEvent.avsc:84-87
        StructField("padding", StringType()),               # TripEvent.avsc:88-91
    ]
)

#: Fields whose absence drops the record in the reference (NPE inside
#: deserialize -> catch-all -> null -> dropped, TripEventSchema.java:57-82).
#: ``trip_id`` defaults to 0 (TripEventSchema.java:74 ``asLong(0)``) and
#: ``padding`` defaults to "" (TripEventSchema.java:53,76), so both are
#: optional.
TRIP_EVENT_REQUIRED_FIELDS = [
    f.name for f in TRIP_EVENT_SCHEMA.fields if f.name not in ("trip_id", "padding")
]

# --- TESTDATA tables (FIXTURES.md §B) ---------------------------------------

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

TESTDATA_SCHEMAS: dict[str, StructType] = {
    "region": StructType(
        [StructField("r_regionkey", IntegerType()), StructField("r_name", StringType())]
    ),
    "nation": StructType(
        [
            StructField("n_nationkey", IntegerType()),
            StructField("n_name", StringType()),
            StructField("n_regionkey", IntegerType()),
        ]
    ),
    "customer": StructType(
        [
            StructField("c_custkey", LongType()),
            StructField("c_name", StringType()),
            StructField("c_nationkey", IntegerType()),
            StructField("c_acctbal", DoubleType()),
            StructField("c_mktsegment", StringType()),
        ]
    ),
    "supplier": StructType(
        [
            StructField("s_suppkey", LongType()),
            StructField("s_name", StringType()),
            StructField("s_nationkey", IntegerType()),
            StructField("s_acctbal", DoubleType()),
        ]
    ),
    "part": StructType(
        [
            StructField("p_partkey", LongType()),
            StructField("p_name", StringType()),
            StructField("p_brand", StringType()),
            StructField("p_type", StringType()),
            StructField("p_size", IntegerType()),
            StructField("p_retailprice", DoubleType()),
        ]
    ),
    "orders": StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_custkey", LongType()),
            StructField("o_orderstatus", StringType()),
            StructField("o_totalprice", DoubleType()),
            StructField("o_orderdate", TimestampType()),
            StructField("o_orderpriority", StringType()),
        ]
    ),
    "lineitem": StructType(
        [
            StructField("l_orderkey", LongType()),
            StructField("l_partkey", LongType()),
            StructField("l_suppkey", LongType()),
            StructField("l_linenumber", IntegerType()),
            StructField("l_quantity", DoubleType()),
            StructField("l_extendedprice", DoubleType()),
            StructField("l_discount", DoubleType()),
            StructField("l_tax", DoubleType()),
            StructField("l_returnflag", StringType()),
            StructField("l_linestatus", StringType()),
            StructField("l_shipdate", TimestampType()),
        ]
    ),
    "events": StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    ),
    "documents": StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
            StructField("n_chars", LongType()),
        ]
    ),
    "embeddings": StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
            StructField("label", IntegerType()),
        ]
    ),
}


#: events.parquet has shipped in two layouts: historically parquet
#: TIMESTAMP(NANOS) (which Spark's vectorized reader rejects — we read it
#: as long via the legacy conf and convert), currently TIMESTAMP(MICROS)
#: which reads natively (as TIMESTAMP_NTZ when isAdjustedToUTC=false).
#: ``load_events`` dispatches on the dtype the footer resolves to, so both
#: layouts load as TimestampType with identical instants; DuckDB reads the
#: same file natively, so the oracle sees the same values (session TZ is
#: UTC, making the NTZ->LTZ cast a wall-clock identity).
EVENTS_RAW_SCHEMA = StructType(
    [
        f if f.name != "ts" else StructField("ts", LongType())
        for f in TESTDATA_SCHEMAS["events"].fields
    ]
)


def _enable_nanos_as_long(spark: SparkSession) -> None:
    # Only set on the legacy-nanos path — globally mutating the session for
    # files that don't need it is what the modern layout avoids.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


# Per-session cache of INFERRED testdata-table schemas, keyed by resolved
# parquet path. Metadata only — no rows, no results: every scan still reads
# the parquet data; only the per-DataFrame footer/schema-inference step
# (a driver-side footer read + py4j schema conversion per spark.read call,
# measured 100-180 ms each on a steal-heavy host, times ~170 table reads
# per bench/sweep process) is skipped after the first read of a path. The
# cached schema is the one inference produced in THIS session, so reads are
# bit-identical to the uncached form by construction (same reader, same
# resolved types — including the NTZ-vs-TZ timestamp flavor the files
# actually carry, which deliberately is NOT the declared TESTDATA_SCHEMAS).
# The cache lives as an attribute ON the session object (it dies with the
# session, and a new session never sees another session's entries), which
# mirrors Spark's own per-session file-listing cache
# (spark.sql.hive.filesourcePartitionFileCacheSize, optimization guide §6):
# testdata dirs are immutable inputs, and a fresh session re-infers once.
_SF_SCHEMA_CACHE_ATTR = "_sf_table_schema_cache"


def read_sf_parquet(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read an immutable testdata table, inferring its schema at most once
    per session (see the cache note above). The ``events`` table must go
    through :func:`load_events` instead — its raw read needs the
    legacy-nanos conf dispatch (:func:`_read_events_raw` layers on top of
    this helper)."""
    cache = getattr(spark, _SF_SCHEMA_CACHE_ATTR, None)
    if cache is None:
        cache = {}
        setattr(spark, _SF_SCHEMA_CACHE_ATTR, cache)
    path = f"{sf_dir}/{name}.parquet"
    sch = cache.get(path)
    if sch is None:
        df = spark.read.parquet(path)
        cache[path] = df.schema
        return df
    return spark.read.schema(sch).parquet(path)


def _events_ts_to_timestamp(raw: DataFrame) -> DataFrame:
    """Normalize whatever dtype ``ts`` resolved to into TimestampType."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampNTZType, TimestampType as _TsT

    dt = raw.schema["ts"].dataType
    if isinstance(dt, LongType):
        # Legacy TIMESTAMP(NANOS)-as-long path. ns -> us MUST be exact
        # integer division: (ts / 1000).cast('long') promotes int64 nanos
        # (~1.7e18 > 2^53) to double first, which loses 1us on ~1.5% of
        # values and silently diverges from the DuckDB oracle.
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(dt, TimestampNTZType):
        # Modern TIMESTAMP(MICROS, isAdjustedToUTC=false) layout. Session
        # TZ is UTC so this cast preserves the wall-clock instant exactly.
        raw = raw.withColumn("ts", F.col("ts").cast(TimestampType()))
    elif not isinstance(dt, _TsT):  # pragma: no cover - future layouts
        raise TypeError(f"events.ts resolved to unsupported dtype {dt}")
    return raw.select([f.name for f in TESTDATA_SCHEMAS["events"].fields])


def _read_events_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-read events.parquet, enabling the legacy nanos conf only if
    the footer actually needs it (TIMESTAMP(NANOS) fails schema inference
    otherwise)."""
    try:
        return read_sf_parquet(spark, sf_dir, "events")
    except Exception:
        _enable_nanos_as_long(spark)
        return read_sf_parquet(spark, sf_dir, "events")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load the events table with ``ts`` as a proper TimestampType,
    whichever parquet timestamp layout the file uses."""
    return _events_ts_to_timestamp(_read_events_raw(spark, sf_dir))


def load_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of load_events: bounded file-source replay of the
    events table (glob path — FileStreamSource requires a dir or glob).

    FileStreamSource needs an explicit schema, so we take it from a batch
    footer read — that way the stream sees the same raw dtype the batch
    dispatch saw, and the same normalization applies."""
    raw_schema = _read_events_raw(spark, sf_dir).schema
    raw = (
        spark.readStream.schema(raw_schema)
        .format("parquet")
        .load(f"{sf_dir}/events.*")
    )
    return _events_ts_to_timestamp(raw)


def load_tables(
    spark: SparkSession, sf_dir: str, register_views: bool = True
) -> dict[str, DataFrame]:
    """Load every TESTDATA parquet table; optionally register temp views.

    Scans are plain ``spark.read.parquet`` so Catalyst keeps predicate
    pushdown / column pruning; do NOT cache here — callers decide.
    """
    out: dict[str, DataFrame] = {}
    for name in TESTDATA_TABLES:
        if name == "events":
            df = load_events(spark, sf_dir)
        else:
            df = read_sf_parquet(spark, sf_dir, name)
        out[name] = df
        if register_views:
            df.createOrReplaceTempView(name)
    return out
