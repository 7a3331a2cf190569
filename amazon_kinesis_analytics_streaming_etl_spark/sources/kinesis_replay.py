"""S1 twin: a Kinesis-model replay source via the Python Data Source API.

The real Kinesis connector cannot run here (no AWS endpoint, no connector
jar), so S1 was previously option-wiring behind a seam. This module closes
the gap with a first-class Spark 4 ``DataSource`` that implements the
*Kinesis execution model* — shards are the unit of parallelism, offsets
are per-shard sequence numbers, initial position is TRIM_HORIZON or
LATEST — against an append-only local "stream directory":

    <stream_dir>/shardId-000000000000.jsonl
    <stream_dir>/shardId-000000000001.jsonl
    ...

one record payload per line. Appending lines == putting records; adding a
new shard file == resharding (discovered at the next micro-batch, like
the real consumer's shard discovery).

Output schema mirrors the AWS connector's columns
(``data/streamName/partitionKey/sequenceNumber/approximateArrivalTimestamp/
shardId``) so downstream code — ``parse_trip_events`` on ``data``, K3
partitioning, sinks — is byte-for-byte the same pipeline the reference
runs on real Kinesis (StreamingEtl.java:92-100).

Scale notes: ``partitions()`` returns one InputPartition per shard slice,
so executor parallelism == shard count exactly as on Kinesis (16 shards in
the reference's provisioned stream, cdk/lib/streaming-etl.ts:69-71);
offsets are a tiny per-shard dict in the checkpoint log, and replay after
failure re-reads only [start, end) lines per shard — exactly-once into
the engine's idempotent sinks.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

KINESIS_SCHEMA = StructType(
    [
        StructField("data", BinaryType()),
        StructField("streamName", StringType()),
        StructField("partitionKey", StringType()),
        StructField("sequenceNumber", StringType()),
        StructField("approximateArrivalTimestamp", TimestampType()),
        StructField("shardId", StringType()),
    ]
)

_SHARD_PREFIX = "shardId-"


def _shard_files(path: str) -> dict[str, str]:
    """shard_id -> file path, sorted for deterministic ordering."""
    out: dict[str, str] = {}
    if os.path.isdir(path):
        for name in sorted(os.listdir(path)):
            if name.startswith(_SHARD_PREFIX):
                out[name.split(".", 1)[0]] = os.path.join(path, name)
    return out


def _count_lines(fp: str) -> int:
    """Count COMPLETE (newline-terminated) records only. A producer caught
    mid-append leaves an unterminated tail; counting it would emit the
    partial payload and commit its offset — the completed record's tail
    would then never be re-read. Skipping it means the whole record is
    picked up by the next micro-batch instead."""
    n = 0
    with open(fp, "rb") as f:
        for line in f:
            if line.endswith(b"\n"):
                n += 1
    return n


def _read_lines(fp: str, start: int, end: int) -> list[bytes]:
    out = []
    with open(fp, "rb") as f:
        for i, line in enumerate(f):
            if i >= end:
                break
            if not line.endswith(b"\n"):
                break  # unterminated tail: not yet a record (see _count_lines)
            if i >= start:
                out.append(line[:-1])
    return out


#: Rows per emitted Arrow batch: bounds reader-side memory when a resumed
#: slice covers a deep backlog (one availableNow batch can span millions
#: of lines per shard — a single RecordBatch would materialize all of it).
_ARROW_BATCH_ROWS = 65_536


def _rows(stream: str, shard: str, payloads: list[bytes], first_seq: int):
    """Arrow RecordBatches for one shard slice. The per-row tuple path pays
    a Python->Arrow conversion per record (tuple build, string dup, None
    timestamp boxing); building the columns once per chunk keeps the
    reader's per-record cost at C-loop speed — at real stream widths the
    reader must not be the bottleneck the executors wait on."""
    import pyarrow as pa

    # Kinesis sequence numbers are opaque decimal strings that sort by
    # arrival within a shard — a zero-padded line index reproduces that
    # contract deterministically.
    for lo in range(0, len(payloads), _ARROW_BATCH_ROWS):
        chunk = payloads[lo : lo + _ARROW_BATCH_ROWS]
        n = len(chunk)
        first = first_seq + lo
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(chunk, type=pa.binary()),
                pa.array([stream] * n, type=pa.string()),
                pa.array([shard] * n, type=pa.string()),
                pa.array([f"{s:020d}" for s in range(first, first + n)]),
                pa.nulls(n, pa.timestamp("us")),
                pa.array([shard] * n, type=pa.string()),
            ],
            names=[
                "data",
                "streamName",
                "partitionKey",
                "sequenceNumber",
                "approximateArrivalTimestamp",
                "shardId",
            ],
        )


@dataclass
class _ShardSlice(InputPartition):
    shard: str
    path: str
    start: int
    end: int
    stream: str


class _ReplayStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("kinesis-replay requires a 'path' option")
        self.stream = os.path.basename(self.path.rstrip("/"))
        pos = (options.get("initialposition") or "TRIM_HORIZON").upper()
        if pos not in ("TRIM_HORIZON", "LATEST"):
            raise ValueError(f"initialPosition must be TRIM_HORIZON|LATEST, got {pos}")
        self.initial_position = pos

    def initialOffset(self) -> dict:
        if self.initial_position == "TRIM_HORIZON":
            return {s: 0 for s in _shard_files(self.path)}
        return {s: _count_lines(fp) for s, fp in _shard_files(self.path).items()}

    def latestOffset(self) -> dict:
        return {s: _count_lines(fp) for s, fp in _shard_files(self.path).items()}

    def partitions(self, start: dict, end: dict):
        files = _shard_files(self.path)
        out = []
        for shard, hi in end.items():
            lo = start.get(shard, 0)  # shard absent in start == newly
            # discovered (resharding): consume from its trim horizon
            if hi > lo and shard in files:
                out.append(_ShardSlice(shard, files[shard], lo, hi, self.stream))
        return out or [_ShardSlice("shardId-empty", "", 0, 0, self.stream)]

    def read(self, partition: _ShardSlice):
        if partition.end <= partition.start or not partition.path:
            return iter(())
        payloads = _read_lines(partition.path, partition.start, partition.end)
        return _rows(partition.stream, partition.shard, payloads, partition.start)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the checkpoint offset log


class _ReplayBatchReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("kinesis-replay requires a 'path' option")
        self.stream = os.path.basename(self.path.rstrip("/"))

    def partitions(self):
        return [
            _ShardSlice(s, fp, 0, _count_lines(fp), self.stream)
            for s, fp in _shard_files(self.path).items()
        ] or [_ShardSlice("shardId-empty", "", 0, 0, self.stream)]

    def read(self, partition: _ShardSlice):
        if partition.end <= partition.start or not partition.path:
            return iter(())
        payloads = _read_lines(partition.path, partition.start, partition.end)
        return _rows(partition.stream, partition.shard, payloads, partition.start)


class KinesisReplayDataSource(DataSource):
    """``spark.read/readStream.format("kinesis-replay").option("path", dir)``
    with optional ``initialPosition`` (TRIM_HORIZON default, LATEST)."""

    @classmethod
    def name(cls) -> str:
        return "kinesis-replay"

    def schema(self) -> StructType:
        return KINESIS_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _ReplayBatchReader(self.options)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return _ReplayStreamReader(self.options)


def register_kinesis_replay(spark) -> None:
    """Idempotent registration of the replay source."""
    spark.dataSource.register(KinesisReplayDataSource)


def kinesis_replay_stream(spark, stream_dir: str, initial_position: str = "TRIM_HORIZON"):
    """S1-shaped stream: Kinesis-model records from a replay directory.
    ``df["data"]`` feeds ``operators.parse.parse_trip_events`` exactly as
    Kinesis bytes feed the reference's deserializer."""
    register_kinesis_replay(spark)
    return (
        spark.readStream.format("kinesis-replay")
        .option("path", stream_dir)
        .option("initialPosition", initial_position)
        .load()
    )
