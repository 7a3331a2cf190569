"""S1/S2/S3 — streaming sources behind one config surface.

Reference behavior:

- S1 Kinesis source: stream name / region / initial position params
  (StreamingEtl.java:155-175; params ``InputKinesisStream``,
  ``InputStreamRegion``, ``InputStreamInitalPosition`` — typo kept).
- S2 Kafka source: bootstrap servers + topic, consumer reads committed
  transactions only (StreamingEtl.java:178-188,
  ``isolation.level=read_committed``).
- S3 mutual exclusion: exactly one source or config-time error
  (StreamingEtl.java:87-103).

Engine extensions: a file source (JSON-lines with the raw payload as
``value``) and a rate source for load tests — these make the topology
testable without AWS/Kafka infrastructure; the downstream plan is
identical regardless of source.

All sources yield a streaming DataFrame with a binary/string ``value``
column (the raw JSON payload), matching the wire format the reference
deserializes (TripEventSchema.java:49-51).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StringType, StructField, StructType

from ..config import ConfigError, JobConfig

RAW_VALUE_SCHEMA = StructType([StructField("value", StringType())])


def payload_type(cfg: JobConfig) -> str:
    """Wire type of the ``value`` column: ``string`` for JSON payloads
    (default), ``binary`` when ``InputEncoding=avro`` — the reference's
    native record format (TripEvent.avsc; producers ship Avro bytes)."""
    enc = (cfg.get("InputEncoding", "json") or "json").lower()
    if enc not in ("json", "avro"):
        raise ConfigError(f"InputEncoding must be json or avro, got {enc!r}")
    return "binary" if enc == "avro" else "string"


def _has_kinesis(cfg: JobConfig) -> bool:
    # a live stream name OR a local replay dir both select the kinesis
    # source kind (kinesis_source dispatches between them)
    return cfg.has("InputKinesisStream") or cfg.has("InputKinesisReplayDir")


def _has_kafka(cfg: JobConfig) -> bool:
    # live bootstrap+topic OR a local replay dir both select the kafka
    # source kind (kafka_source dispatches between them)
    return (
        cfg.has("InputKafkaBootstrapServers") and cfg.has("InputKafkaTopic")
    ) or cfg.has("InputKafkaReplayDir")


def _has_file(cfg: JobConfig) -> bool:
    return cfg.has("InputFilePath")


def _has_rate(cfg: JobConfig) -> bool:
    return cfg.has("InputRateRowsPerSecond")


def validate_source_config(cfg: JobConfig) -> str:
    """Exactly-one-source rule (mirrors StreamingEtl.java:87-103, extended
    to the engine's file/rate sources). Returns the chosen source kind."""
    kinds = [
        kind
        for kind, present in (
            ("kinesis", _has_kinesis(cfg)),
            ("kafka", _has_kafka(cfg)),
            ("file", _has_file(cfg)),
            ("rate", _has_rate(cfg)),
        )
        if present
    ]
    if len(kinds) == 0:
        raise ConfigError(
            "Missing input configuration: configure exactly one of "
            "InputKinesisStream, InputKafka{BootstrapServers,Topic}, "
            "InputFilePath, InputRateRowsPerSecond"
        )
    if len(kinds) > 1:
        raise ConfigError(f"Ambiguous input configuration: {kinds} all configured")
    return kinds[0]


def kinesis_source(spark: SparkSession, cfg: JobConfig) -> DataFrame:
    """S1 — Kinesis streaming source (StreamingEtl.java:155-175).

    Stock OSS PySpark ships no Kinesis connector; this wires the options
    for an attached connector jar (e.g. spark-sql-kinesis). Initial
    position default LATEST matches the Flink connector default used by
    the reference (StreamingEtl.java:158).

    The Kinesis *execution model* itself (shards as partitions, per-shard
    sequence offsets, TRIM_HORIZON/LATEST, shard discovery) is implemented
    and tested in-process by sources/kinesis_replay.py — a Python Data
    Source the engine runs end-to-end without AWS; this function remains
    the thin option seam for a live connector jar. Set
    ``InputKinesisReplayDir`` to use the replay source through the same
    config surface.
    """
    replay_dir = cfg.get("InputKinesisReplayDir", None)
    if replay_dir:
        # Replay over a directory of pre-existing shard files implies
        # reading them: default TRIM_HORIZON (the connector-default LATEST
        # would drain zero records under availableNow), consistent with
        # the Kafka replay path's 'earliest' default. A live stream below
        # keeps LATEST, matching the reference's Flink connector default.
        initial = cfg.get("InputStreamInitalPosition", "TRIM_HORIZON")
        from .kinesis_replay import kinesis_replay_stream

        cap = cfg.get("InputMaxRecordsPerBatch", None)
        df = kinesis_replay_stream(
            spark,
            str(replay_dir),
            str(initial).upper(),
            max_records_per_batch=int(cap) if cap else None,
            available_now_snapshot=cfg.get_bool("InputAvailableNowSnapshot"),
        )
        return df.select(F.col("data").cast(payload_type(cfg)).alias("value"))
    initial = cfg.get("InputStreamInitalPosition", "LATEST")
    stream = cfg.get_required("InputKinesisStream")
    region = cfg.get("InputStreamRegion", "us-east-1")
    reader = (
        spark.readStream.format("kinesis")
        .option("streamName", stream)
        .option("region", region)
        .option("initialPosition", str(initial).lower())
    )
    df = reader.load()  # raises if no kinesis connector on the classpath
    # Kinesis connectors expose `data` (binary); normalize to `value`.
    data_col = "data" if "data" in df.columns else "value"
    return df.select(F.col(data_col).cast(payload_type(cfg)).alias("value"))


def kafka_source(spark: SparkSession, cfg: JobConfig) -> DataFrame:
    """S2 — Kafka streaming source with read_committed isolation
    (StreamingEtl.java:178-188).

    The Kafka *execution model* (topic-partitions as the parallelism
    unit, per-partition long offsets, earliest/latest start, partition
    discovery) runs in-process via sources/kafka_replay.py; set
    ``InputKafkaReplayDir`` to use it through this same config surface.
    The live path below needs the spark-sql-kafka jar + a broker.
    """
    replay_dir = cfg.get("InputKafkaReplayDir", None)
    if replay_dir:
        from .kafka_replay import kafka_replay_stream

        start = str(cfg.get("InputKafkaStartingOffsets", "earliest")).lower()
        cap = cfg.get("InputMaxOffsetsPerTrigger", None)
        df = kafka_replay_stream(
            spark,
            str(replay_dir),
            start,
            max_offsets_per_trigger=int(cap) if cap else None,
            available_now_snapshot=cfg.get_bool("InputAvailableNowSnapshot"),
        )
        return df.select(F.col("value").cast(payload_type(cfg)).alias("value"))
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", cfg.get_required("InputKafkaBootstrapServers"))
        .option("subscribe", cfg.get_required("InputKafkaTopic"))
        .option("kafka.isolation.level", "read_committed")
        .option("kafka.group.id", "kaja-streaming-etl-consumer")
        .option("startingOffsets", "latest")
        .load()
        .select(F.col("value").cast(payload_type(cfg)).alias("value"))
    )


def file_source(spark: SparkSession, cfg: JobConfig) -> DataFrame:
    """Engine extension — replay payload files as a stream (the test
    stand-in for Kinesis/Kafka; deterministic micro-batch replay).
    JSON payloads ride the text format; Avro payloads (binary ``value``)
    need a binary-capable container — use ``InputFileFormat=parquet``."""
    path = cfg.get_required("InputFilePath")
    fmt = cfg.get("InputFileFormat", "text")
    vtype = payload_type(cfg)
    if fmt == "text":
        if vtype == "binary":
            raise ConfigError(
                "InputEncoding=avro needs a binary-capable InputFileFormat "
                "(e.g. parquet); text files cannot carry Avro payloads"
            )
        return spark.readStream.format("text").load(path)
    schema = StructType([StructField("value", StringType())]) if vtype == "string" \
        else StructType([StructField("value", BinaryType())])
    return spark.readStream.schema(schema).format(fmt).load(path)


def rate_source(spark: SparkSession, cfg: JobConfig) -> DataFrame:
    """Engine extension — synthetic TripEvent JSON at a fixed rate
    (keep-up/load tests; analog of the reference's replay harness,
    cdk/lib/streaming-etl.ts:241)."""
    rate = int(cfg.get("InputRateRowsPerSecond", "1000"))
    raw = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rate)
        .load()
    )
    return raw.select(synthetic_trip_event_json(F.col("value"), F.col("timestamp")).alias("value"))


def synthetic_trip_event_json(seq, ts):
    """Deterministic synthetic TripEvent JSON payload from a sequence
    number + timestamp (used by rate source and benchmarks)."""
    return F.to_json(
        F.struct(
            (F.pmod(seq, F.lit(2)) + 1).cast("int").alias("vendor_id"),
            F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss").alias("pickup_datetime"),
            F.date_format(ts + F.expr("INTERVAL 11 MINUTES"), "yyyy-MM-dd'T'HH:mm:ss").alias(
                "dropoff_datetime"
            ),
            (F.pmod(seq, F.lit(4)) + 1).cast("int").alias("passenger_count"),
            (F.pmod(seq, F.lit(500)) / 100.0 + 0.5).alias("trip_distance"),
            F.lit(1).alias("ratecode_id"),
            F.when(F.pmod(seq, F.lit(50)) == 0, "Y").otherwise("N").alias("store_and_fwd_flag"),
            (F.pmod(seq, F.lit(265)) + 1).cast("int").alias("pickup_location_id"),
            (F.pmod(seq * 7, F.lit(265)) + 1).cast("int").alias("dropoff_location_id"),
            (F.pmod(seq, F.lit(4)) + 1).cast("int").alias("payment_type"),
            (F.pmod(seq, F.lit(4000)) / 100.0 + 2.5).alias("fare_amount"),
            F.lit(0.5).alias("extra"),
            F.lit(0.5).alias("mta_tax"),
            (F.pmod(seq, F.lit(800)) / 100.0).alias("tip_amount"),
            F.lit(0.0).alias("tolls_amount"),
            F.lit(0.3).alias("improvement_surcharge"),
            (F.pmod(seq, F.lit(4000)) / 100.0 + 3.8).alias("total_amount"),
            seq.cast("long").alias("trip_id"),
            F.lit("trip").alias("type"),
            F.lit("").alias("padding"),
        )
    )


SOURCE_BUILDERS = {
    "kinesis": kinesis_source,
    "kafka": kafka_source,
    "file": file_source,
    "rate": rate_source,
}


def resolve_source(spark: SparkSession, cfg: JobConfig) -> DataFrame:
    """Validate (S3) and build the configured source's raw-value stream."""
    kind = validate_source_config(cfg)
    return SOURCE_BUILDERS[kind](spark, cfg)
