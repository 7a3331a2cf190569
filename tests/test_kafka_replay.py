"""Kafka-model replay source: partition parallelism, long offsets,
earliest/latest, partition discovery, exactly-once resume, and the full
pipeline through the S2 config surface."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F


def _produce(d: str, partition: int, lines: list[str], append: bool = False):
    path = os.path.join(d, f"partition-{partition:05d}.jsonl")
    with open(path, "a" if append else "w") as f:
        for line in lines:
            f.write(line + "\n")


def _drain(spark, topic_dir: str, ckpt: str, out: str, starting: str = "earliest"):
    from amazon_kinesis_analytics_streaming_etl_spark.sources.kafka_replay import (
        kafka_replay_stream,
    )

    df = kafka_replay_stream(spark, topic_dir, starting).select(
        "topic", "partition", "offset", F.col("value").cast("string").alias("payload")
    )
    q = (
        df.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    try:
        return spark.read.parquet(out)
    except Exception:  # zero-row first drain
        return spark.createDataFrame(
            [], "topic string, partition int, offset long, payload string"
        )


def test_batch_read_partitions_and_schema(spark, tmp_path):
    from amazon_kinesis_analytics_streaming_etl_spark.sources.kafka_replay import (
        register_kafka_replay,
    )

    d = str(tmp_path / "trips")
    os.makedirs(d)
    _produce(d, 0, ["a0", "a1"])
    _produce(d, 1, ["b0"])
    register_kafka_replay(spark)
    df = spark.read.format("kafka-replay").option("path", d).load()
    assert df.rdd.getNumPartitions() == 2
    rows = sorted(
        (r.topic, r.partition, r.offset, bytes(r.value).decode()) for r in df.collect()
    )
    assert rows == [
        ("trips", 0, 0, "a0"),
        ("trips", 0, 1, "a1"),
        ("trips", 1, 0, "b0"),
    ]


def test_stream_resume_latest_and_partition_discovery(spark, tmp_path):
    d = str(tmp_path / "topic")
    os.makedirs(d)
    _produce(d, 0, ["r0", "r1"])

    ck_e, out_e = str(tmp_path / "ck_e"), str(tmp_path / "out_e")
    assert _drain(spark, d, ck_e, out_e).count() == 2
    assert _drain(spark, d, ck_e, out_e).count() == 2  # exactly-once rerun

    ck_l, out_l = str(tmp_path / "ck_l"), str(tmp_path / "out_l")
    assert _drain(spark, d, ck_l, out_l, starting="latest").count() == 0

    _produce(d, 0, ["r2"], append=True)
    _produce(d, 1, ["s0"])  # partition expansion
    later = _drain(spark, d, ck_l, out_l, starting="latest")
    got = {(r.partition, r.offset, r.payload) for r in later.collect()}
    assert got == {(0, 2, "r2"), (1, 0, "s0")}


def test_pipeline_from_config_with_kafka_replay(spark, tmp_path, valid_event):
    """C1 config -> S2 kafka-model source -> P1/P2 -> K3/K1, exactly-once,
    through InputKafkaReplayDir."""
    from amazon_kinesis_analytics_streaming_etl_spark.plans.pipeline import Pipeline

    d = str(tmp_path / "topic")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(d)
    _produce(d, 0, [json.dumps(valid_event), "{{{bad"])
    _produce(d, 1, [json.dumps({**valid_event, "trip_id": 21})])

    args = [
        "--InputKafkaReplayDir", d,
        "--OutputBucket", out,
        "--ParquetConversion", "true",
        "--CheckpointLocation", ckpt,
    ]
    Pipeline.from_config(spark, args=args).run_available_now()
    df = spark.read.parquet(f"{out}/job_start=*/pickup_location=*/year=*/month=*")
    assert df.count() == 2
    assert sorted(r.trip_id for r in df.select("trip_id").collect()) == [21, 9000001]

    Pipeline.from_config(spark, args=args).run_available_now()
    assert (
        spark.read.parquet(f"{out}/job_start=*/pickup_location=*/year=*/month=*").count()
        == 2
    )


def test_source_mutual_exclusion_counts_replay_dirs(spark, tmp_path):
    import pytest

    from amazon_kinesis_analytics_streaming_etl_spark.config import (
        from_args_and_properties,
    )
    from amazon_kinesis_analytics_streaming_etl_spark.sources.streaming import (
        ConfigError,
        validate_source_config,
    )

    assert (
        validate_source_config(
            from_args_and_properties(["--InputKafkaReplayDir", "/x"])
        )
        == "kafka"
    )
    assert (
        validate_source_config(
            from_args_and_properties(["--InputKinesisReplayDir", "/x"])
        )
        == "kinesis"
    )
    with pytest.raises(ConfigError):
        validate_source_config(
            from_args_and_properties(
                ["--InputKafkaReplayDir", "/x", "--InputKinesisReplayDir", "/y"]
            )
        )


def test_murmur2_matches_kafka_published_vectors():
    """murmur2_32 reproduces Apache Kafka's own UtilsTest vectors
    (kafka/clients UtilsTest.testMurmur2, signed Java ints shown) — the
    write model routes exactly where a real 16-partition topic would."""
    from amazon_kinesis_analytics_streaming_etl_spark.sources.kafka_replay import (
        murmur2_32,
    )

    vectors = {
        b"21": -973932308,
        b"foobar": -790332482,
        b"a-little-bit-long-string": -985981536,
    }
    for key, signed in vectors.items():
        assert murmur2_32(key) == signed & 0xFFFFFFFF, key


def test_murmur2_batch_matches_scalar():
    """The numpy whole-batch murmur2 (the gates' vectorized routing
    re-derivation) is bit-identical to the scalar reference across the
    published vectors, every length class 0..20, and random bytes."""
    import random

    from amazon_kinesis_analytics_streaming_etl_spark.sources.kafka_replay import (
        murmur2_32,
        murmur2_32_batch,
    )

    rng = random.Random(7)
    keys = [b"21", b"foobar", b"a-little-bit-long-string", b""]
    keys += [bytes(rng.randrange(256) for _ in range(n)) for n in range(21)]
    keys += [str(rng.randrange(10**9)).encode() for _ in range(200)]
    got = murmur2_32_batch(keys)
    assert list(got) == [murmur2_32(k) for k in keys]
    assert list(murmur2_32_batch([])) == []


def test_kafka_write_model_routing_and_append(tmp_path, spark):
    """Producer routes by toPositive(murmur2) % N, appends whole lines,
    and what it wrote reads back identically through the replay source."""
    from amazon_kinesis_analytics_streaming_etl_spark.sources.kafka_replay import (
        KafkaReplayProducer,
        murmur2_32,
        register_kafka_replay,
    )

    prod = KafkaReplayProducer(str(tmp_path), num_partitions=4)
    sent = {}
    for i in range(200):
        p = prod.send("t", f"v-{i}", key=str(i))
        assert p == (murmur2_32(str(i).encode()) & 0x7FFFFFFF) % 4
        sent[f"v-{i}"] = p
    prod.flush()
    # append, not truncate
    prod.send("t", "extra", key="21")
    prod.flush()

    register_kafka_replay(spark)
    back = (
        spark.read.format("kafka-replay")
        .option("path", str(tmp_path / "t"))
        .load()
        .collect()
    )
    assert len(back) == 201
    got = {bytes(r.value).decode(): r.partition for r in back}
    for v, p in sent.items():
        assert got[v] == p
    assert got["extra"] == (murmur2_32(b"21") & 0x7FFFFFFF) % 4

    # keyless records round-robin across partitions
    prod2 = KafkaReplayProducer(str(tmp_path), num_partitions=4)
    ps = {prod2.send("t2", f"x{i}") for i in range(8)}
    assert ps == {0, 1, 2, 3}


def test_kafka_replay_is_a_first_class_spark_sink(spark, tmp_path):
    """K6 as a native Spark sink: keyed rows land on murmur2 partitions,
    commit markers record per-batch rows, batch + streaming write paths
    share the model, and the result replays back identically."""
    import json as _json

    from pyspark.sql import functions as F

    from amazon_kinesis_analytics_streaming_etl_spark.sources.kafka_replay import (
        murmur2_32,
        register_kafka_replay,
    )

    register_kafka_replay(spark)
    out = str(tmp_path / "t")

    src = tmp_path / "src"
    src.mkdir()
    with open(src / "in.txt", "w") as f:
        for i in range(100):
            f.write(f"rec-{i}\n")
    stream = (
        spark.readStream.format("text")
        .load(str(src))
        .select(
            F.col("value"),
            F.regexp_extract("value", r"(\d+)", 1).alias("key"),
        )
    )
    q = (
        stream.writeStream.format("kafka-replay")
        .option("path", out)
        .option("numPartitions", "8")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    back = spark.read.format("kafka-replay").option("path", out).load().collect()
    assert len(back) == 100
    for r in back:
        i = bytes(r.value).decode().split("-")[1]
        assert r.partition == (murmur2_32(i.encode()) & 0x7FFFFFFF) % 8
    marks = list((tmp_path / "t" / "_commits").iterdir())
    assert sum(_json.loads(m.read_text())["rows"] for m in marks) == 100

    # keyless batch write round-robins across partitions
    spark.range(32).select(
        F.concat(F.lit("b-"), F.col("id")).alias("value")
    ).write.format("kafka-replay").option("path", out).option(
        "numPartitions", "8"
    ).mode("append").save()
    back2 = spark.read.format("kafka-replay").option("path", out).load()
    assert back2.count() == 132


def test_starting_offsets_per_partition_json(spark, tmp_path):
    """spark-sql-kafka parity: startingOffsets accepts the per-partition
    JSON form with the connector's -1 (latest) / -2 (earliest) sentinels;
    unlisted partitions start from earliest."""
    import json

    from amazon_kinesis_analytics_streaming_etl_spark.sources.kafka_replay import (
        register_kafka_replay,
    )

    tdir = tmp_path / "t"
    tdir.mkdir()
    for p in range(3):
        with open(tdir / f"partition-{p:05d}.jsonl", "w") as f:
            for i in range(10):
                f.write(f"p{p}-r{i}\n")

    register_kafka_replay(spark)
    offsets = json.dumps({"t": {"0": 4, "1": -1, "2": -2}})
    out = str(tmp_path / "sink")
    q = (
        spark.readStream.format("kafka-replay")
        .option("path", str(tdir))
        .option("startingOffsets", offsets)
        .load()
        .selectExpr("CAST(value AS STRING) AS v", "partition")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r.partition, r.v) for r in spark.read.parquet(out).collect()}
    exp = {(0, f"p0-r{i}") for i in range(4, 10)}  # from offset 4
    exp |= {(2, f"p2-r{i}") for i in range(10)}     # earliest
    # partition 1: latest -> nothing from the pre-existing records
    assert got == exp

    # numeric offsets beyond the log clamp to latest (connector reset rule)
    q2 = (
        spark.readStream.format("kafka-replay")
        .option("path", str(tdir))
        .option("startingOffsets", json.dumps({"t": {"0": 999}}))
        .load()
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()


def test_max_offsets_per_trigger_rate_limits(spark, tmp_path):
    """maxOffsetsPerTrigger (the connector's own option name) paginates
    the backlog under processing-time triggers."""
    import time as _t

    from amazon_kinesis_analytics_streaming_etl_spark.sources.kafka_replay import (
        register_kafka_replay,
    )

    tdir = tmp_path / "t"
    tdir.mkdir()
    with open(tdir / "partition-00000.jsonl", "w") as f:
        for i in range(30):
            f.write(f"r{i}\n")

    register_kafka_replay(spark)
    out = str(tmp_path / "sink")
    q = (
        spark.readStream.format("kafka-replay")
        .option("path", str(tdir))
        .option("maxOffsetsPerTrigger", "10")
        .load()
        .selectExpr("CAST(value AS STRING) AS v")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = _t.time() + 60
        while _t.time() < deadline:
            try:
                if spark.read.parquet(out).count() >= 30:
                    break
            except Exception:
                pass
            _t.sleep(0.5)
        q.processAllAvailable()
    finally:
        q.stop()
    assert spark.read.parquet(out).count() == 30
    batches = [
        p["numInputRows"] for p in q.recentProgress if p.get("numInputRows", 0) > 0
    ]
    assert len(batches) >= 3 and max(batches) <= 10


def test_min_partitions_splits_offset_ranges(spark, tmp_path):
    """minPartitions parity: a 2-partition batch splits into >= the
    requested number of offset-range slices, records and offsets intact."""
    from amazon_kinesis_analytics_streaming_etl_spark.sources.kafka_replay import (
        _KafkaReplayStreamReader,
        register_kafka_replay,
    )

    tdir = tmp_path / "t"
    tdir.mkdir()
    for p in range(2):
        with open(tdir / f"partition-{p:05d}.jsonl", "w") as f:
            for i in range(50):
                f.write(f"p{p}-r{i}\n")

    # unit: the reader's range splitter
    r = _KafkaReplayStreamReader({"path": str(tdir), "minpartitions": "8"})
    start = r.initialOffset()
    end = r.latestOffset()
    slices = r.partitions(start, end)
    assert len(slices) >= 8
    per_part = {}
    for s in slices:
        per_part.setdefault(s.partition, []).append((s.start, s.end))
    for p, rs in per_part.items():
        rs.sort()
        assert rs[0][0] == 0 and rs[-1][1] == 50
        for (a, b), (c, d) in zip(rs, rs[1:]):
            assert b == c  # contiguous, no gap/overlap

    # end-to-end: all records arrive with correct per-partition offsets
    register_kafka_replay(spark)
    out = str(tmp_path / "sink")
    q = (
        spark.readStream.format("kafka-replay")
        .option("path", str(tdir))
        .option("minPartitions", "8")
        .load()
        .selectExpr("CAST(value AS STRING) AS v", "partition", "offset")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 100
    for row in rows:
        p, i = row.v[1], int(row.v.split("r")[1])
        assert row.partition == int(p) and row.offset == i


def test_restart_with_cap_resumes_from_checkpoint(spark, tmp_path):
    """End-to-end ADVICE-r6 regression: drain uncapped, append, restart
    WITH maxOffsetsPerTrigger from the same checkpoint — no spurious
    data-loss failure, exactly the appended delta delivered."""
    import time as _t

    from amazon_kinesis_analytics_streaming_etl_spark.sources.kafka_replay import (
        register_kafka_replay,
    )

    d = str(tmp_path / "topic")
    os.makedirs(d)
    _produce(d, 0, [f"r{i}" for i in range(20)])
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
    assert _drain(spark, d, ckpt, out).count() == 20  # commit offset 20

    _produce(d, 0, ["x0", "x1", "x2", "x3", "x4"], append=True)
    register_kafka_replay(spark)
    q = (
        spark.readStream.format("kafka-replay")
        .option("path", d)
        .option("maxOffsetsPerTrigger", "2")  # capped restart: floor empty
        .load()
        .selectExpr(
            "topic", "partition", "offset", "CAST(value AS STRING) AS payload"
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = _t.time() + 60
        while _t.time() < deadline:
            if q.exception() is not None:
                break
            try:
                if spark.read.parquet(out).count() >= 25:
                    break
            except Exception:
                pass
            _t.sleep(0.5)
        assert q.exception() is None  # pre-fix: spurious data-loss error
    finally:
        q.stop()
    got = spark.read.parquet(out)
    assert got.count() == 25
    assert {"x0", "x1", "x2", "x3", "x4"} <= {r.payload for r in got.collect()}


def test_fail_on_data_loss_semantics(tmp_path):
    """Offsets going backwards (log truncated below a committed position)
    raise by default; failOnDataLoss=false resumes lossily — connector
    parity at the reader-contract level."""
    import pytest

    from amazon_kinesis_analytics_streaming_etl_spark.sources.kafka_replay import (
        _KafkaReplayStreamReader,
    )

    tdir = tmp_path / "t"
    tdir.mkdir()
    fp = tdir / "partition-00000.jsonl"
    with open(fp, "w") as f:
        for i in range(5):  # truncated: fewer than the 8 committed
            f.write(f"r{i}\n")

    r = _KafkaReplayStreamReader({"path": str(tdir)})
    with pytest.raises(RuntimeError, match="data loss"):
        r.partitions({"0": 8}, {"0": 5})  # log really shrank below 8

    r2 = _KafkaReplayStreamReader({"path": str(tdir), "failondataloss": "false"})
    slices = r2.partitions({"0": 8}, {"0": 5})
    assert all(s.path == "" for s in slices)  # vanished range skipped


def test_rate_limit_restart_floor_not_data_loss(tmp_path):
    """ADVICE r6: a fresh driver's first capped latestOffset() can fall
    below the committed start (floor not yet re-seeded). With the log
    intact that is an empty batch that re-seeds the floor, not data
    loss."""
    from amazon_kinesis_analytics_streaming_etl_spark.sources.kafka_replay import (
        _KafkaReplayStreamReader,
    )

    tdir = tmp_path / "t"
    tdir.mkdir()
    with open(tdir / "partition-00000.jsonl", "w") as f:
        for i in range(10):
            f.write(f"r{i}\n")

    r = _KafkaReplayStreamReader(
        {"path": str(tdir), "maxoffsetspertrigger": "1"}
    )
    end = r.latestOffset()
    assert end["0"] == 1
    slices = r.partitions({"0": 8}, end)
    assert all(s.path == "" for s in slices)  # empty batch, no raise
    assert r.latestOffset()["0"] == 9  # floor re-seeded from commit


def test_available_now_snapshot_drains_capped_backfill(spark, tmp_path):
    """Kafka twin of the Kinesis snapshot-drain test: a capped backfill
    under Trigger.AvailableNow drains to the prepare-time snapshot with
    the cap honored as a per-task slice bound (<=cap sub-slices)."""
    from amazon_kinesis_analytics_streaming_etl_spark.sources.kafka_replay import (
        _KafkaReplayStreamReader,
        register_kafka_replay,
    )

    d = str(tmp_path / "topic")
    os.makedirs(d)
    for p in range(2):
        _produce(d, p, [f"p{p}r{i}" for i in range(50)])

    r = _KafkaReplayStreamReader(
        {"path": d, "maxoffsetspertrigger": "10", "availablenowsnapshot": "true"}
    )
    start = r.initialOffset()
    end = r.latestOffset()
    assert all(v == 50 for v in end.values())  # uncapped snapshot
    slices = r.partitions(start, end)
    assert len(slices) == 10
    per_part: dict[int, list[tuple[int, int]]] = {}
    for sl in slices:
        assert sl.end - sl.start <= 10
        per_part.setdefault(sl.partition, []).append((sl.start, sl.end))
    for ranges in per_part.values():
        ranges.sort()
        assert ranges[0][0] == 0 and ranges[-1][1] == 50
        for (_, b), (c, _) in zip(ranges, ranges[1:]):
            assert b == c
    _produce(d, 0, ["late"], append=True)
    assert r.latestOffset()["0"] == 50  # frozen against concurrent appends

    register_kafka_replay(spark)
    out = str(tmp_path / "sink")
    q = (
        spark.readStream.format("kafka-replay")
        .option("path", d)
        .option("maxOffsetsPerTrigger", "10")
        .option("availableNowSnapshot", "true")
        .load()
        .selectExpr("CAST(value AS STRING) AS v", "partition", "offset")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out)
    assert got.count() in (100, 101)  # snapshot (see Kinesis twin note)
    pre = {f"p{p}r{i}" for p in range(2) for i in range(50)}
    assert pre <= {row.v for row in got.collect()}


def test_snapshot_slice_partitioning_property(tmp_path):
    """Kafka twin of the Kinesis slice-tiling property: random partition
    sizes x caps x minPartitions — partitions() must tile [0, count)
    per topic-partition with contiguous <=cap slices, snapshot frozen."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from amazon_kinesis_analytics_streaming_etl_spark.sources.kafka_replay import (
        _KafkaReplayStreamReader,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        sizes=st.lists(st.integers(0, 150), min_size=1, max_size=3),
        cap=st.integers(1, 50),
        minp=st.sampled_from([None, 2, 8]),
    )
    def run(sizes, cap, minp):
        import shutil
        import tempfile

        d = tempfile.mkdtemp(dir=str(tmp_path))
        try:
            for i, n in enumerate(sizes):
                _produce(d, i, [f"p{i}r{j}" for j in range(n)])
            opts = {
                "path": d,
                "maxoffsetspertrigger": str(cap),
                "availablenowsnapshot": "true",
            }
            if minp is not None:
                opts["minpartitions"] = str(minp)
            r = _KafkaReplayStreamReader(opts)
            start = r.initialOffset()
            end = r.latestOffset()
            assert end == {str(i): n for i, n in enumerate(sizes)}
            per = {}
            for sl in r.partitions(start, end):
                if sl.path == "":
                    continue
                assert 0 < sl.end - sl.start <= cap
                per.setdefault(sl.partition, []).append((sl.start, sl.end))
            for i, n in enumerate(sizes):
                got = sorted(per.get(i, []))
                if n == 0:
                    assert got == []
                    continue
                assert got[0][0] == 0 and got[-1][1] == n
                assert all(b == c for (_, b), (c, _) in zip(got, got[1:]))
            _produce(d, 0, ["late"], append=True)
            assert r.latestOffset() == end  # frozen snapshot
        finally:
            shutil.rmtree(d, ignore_errors=True)

    run()
