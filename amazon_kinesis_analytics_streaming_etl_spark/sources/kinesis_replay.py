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
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
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


def _read_lines(
    fp: str, start: int, end: int, start_byte: int = 0, first_line: int = 0
) -> list[bytes]:
    """Lines [start, end) of ``fp``. ``start_byte``/``first_line`` are an
    optional seek hint (byte position of line index ``first_line``,
    ``first_line <= start``) so a resumed read skips already-consumed
    bytes instead of re-scanning from the top of an ever-growing shard
    file; with the default hint the behavior is a full scan."""
    out = []
    with open(fp, "rb") as f:
        f.seek(start_byte)
        for i, line in enumerate(f, start=first_line):
            if i >= end:
                break
            if not line.endswith(b"\n"):
                break  # unterminated tail: not yet a record (see _count_lines)
            if i >= start:
                out.append(line[:-1])
    return out


class _LineIndex:
    """Driver-side incremental line index for append-only replay files.

    ``count(fp)`` returns the number of COMPLETE lines, reading only the
    bytes appended since the previous call — without this, every
    ``latestOffset`` poll is O(file) on the driver and a long-running
    replay becomes quadratic. It also memoizes line-count -> byte-offset
    at every poll boundary so ``partitions()`` can hand executors a seek
    hint for their slice start (micro-batch slices always start at a
    previous poll's end). A shrunken file (truncated/rewritten out of
    band) resets that file's index and rescans.

    Memory is bounded two ways: ``prune(fp, line)`` (called from the
    reader's ``commit`` with each committed offset) drops every boundary
    strictly below the last one still reachable by a future slice start,
    and ``count`` caps retained boundaries at ``_MAX_MARKS`` per file —
    without both, one ``{lines: byte_pos}`` entry per poll per shard
    accumulates forever in a long-running driver polling every few
    seconds."""

    _MAX_MARKS = 256  # newest boundaries kept per file between commits
    _TAIL_BYTES = 64  # rewrite-detection fingerprint width

    def __init__(self) -> None:
        # fp -> (byte_pos, lines, tail): tail is the last <=_TAIL_BYTES
        # bytes ending at byte_pos, re-verified before every incremental
        # scan — size alone cannot detect a truncate that REGREW past the
        # cached position before the next poll.
        self._state: dict[str, tuple[int, int, bytes]] = {}
        self._marks: dict[str, dict[int, int]] = {}  # fp -> {lines: byte_pos}

    def count(self, fp: str) -> int:
        pos, lines, tail = self._state.get(fp, (0, 0, b""))
        with open(fp, "rb") as f:
            if pos:
                stale = os.fstat(f.fileno()).st_size < pos
                if not stale:
                    f.seek(pos - len(tail))
                    stale = f.read(len(tail)) != tail
                if stale:  # truncated/rewritten out of band: full rescan
                    pos, lines = 0, 0
                    self._marks.pop(fp, None)
            f.seek(pos)
            for line in f:
                if not line.endswith(b"\n"):
                    break  # partial append: picked up whole next poll
                lines += 1
                pos += len(line)
            f.seek(max(0, pos - self._TAIL_BYTES))
            tail = f.read(min(pos, self._TAIL_BYTES))
        self._state[fp] = (pos, lines, tail)
        marks = self._marks.setdefault(fp, {0: 0})
        marks[lines] = pos
        if len(marks) > self._MAX_MARKS:  # keep the newest boundaries
            for ln in sorted(marks)[: len(marks) - self._MAX_MARKS]:
                del marks[ln]
        return lines

    def prune(self, fp: str, committed_line: int) -> None:
        """Drop memoized boundaries no future slice can start below.
        Slice starts are always >= the last committed offset, so only the
        greatest boundary <= committed_line (the seek hint for a slice
        starting exactly there) and everything above it stay useful."""
        marks = self._marks.get(fp)
        if not marks:
            return
        keep_floor = max((ln for ln in marks if ln <= committed_line), default=0)
        for ln in [ln for ln in marks if ln < keep_floor]:
            del marks[ln]

    def seek_hint(self, fp: str, line: int) -> tuple[int, int]:
        """(byte_pos, line_no) of the latest memoized boundary <= line;
        (0, 0) when unknown (fresh driver resuming an old checkpoint)."""
        marks = self._marks.get(fp)
        if not marks:
            return 0, 0
        best = max((ln for ln in marks if ln <= line), default=0)
        return marks.get(best, 0), best


#: Rows per emitted Arrow batch: bounds reader-side memory when a resumed
#: slice covers a deep backlog (one availableNow batch can span millions
#: of lines per shard — a single RecordBatch would materialize all of it).
_ARROW_BATCH_ROWS = 65_536


def _arbitrate_committed_range(
    emitted: dict,
    index,
    key: str,
    file_path: str | None,
    lo: int,
    hi: int,
    fail_on_data_loss: bool,
    entity: str,
) -> int | None:
    """Shared restart-floor / data-loss arbitration for BOTH replay
    twins (ADVICE r6; identical logic previously hand-copied in each
    reader's partitions()). On a fresh driver with a per-trigger cap
    set, the first latestOffset() runs before any commit() re-seeds the
    rate-limit floor, so it can answer min(count, 0 + cap) < the
    committed start — a cap artifact, not data loss. Seed the floor
    from the committed start so the next poll advances from the offset
    log; when hi < lo, distinguish the artifact (file still holds >= lo
    records: read nothing this batch) from real truncation (file shrank
    below lo: raise, or skip lossily under failOnDataLoss=false).

    Returns the effective hi to read to, or None when nothing should be
    read for this key this batch.
    """
    if emitted.get(key, 0) < lo:
        emitted[key] = lo
    if hi < lo:
        avail = index.count(file_path) if file_path is not None else 0
        if avail >= lo:
            return None  # rate-limit artifact: treat as hi == lo
        if fail_on_data_loss:
            raise RuntimeError(
                f"data loss: {entity} offsets went backwards "
                f"({lo} committed, {avail} available) — the log was "
                "truncated below a committed position. Set "
                "failOnDataLoss=false to resume lossily."
            )
        return None  # lossy resume: skip the vanished range
    return hi


def _rows(stream: str, shard: str, payloads: list[bytes], first_seq: int):
    """Arrow RecordBatches for one shard slice. The per-row tuple path pays
    a Python->Arrow conversion per record (tuple build, string dup, None
    timestamp boxing); building the columns once per chunk keeps the
    reader's per-record cost at C-loop speed — at real stream widths the
    reader must not be the bottleneck the executors wait on."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    # Kinesis sequence numbers are opaque decimal strings that sort by
    # arrival within a shard — a zero-padded line index reproduces that
    # contract deterministically. Formatted in C via arrow cast + lpad
    # (r12): the per-record Python f-string was the replay reader's
    # visible per-record cost vs the kafka twin (~7x slower than the
    # vectorized form for the same byte-identical strings).
    for lo in range(0, len(payloads), _ARROW_BATCH_ROWS):
        chunk = payloads[lo : lo + _ARROW_BATCH_ROWS]
        n = len(chunk)
        first = first_seq + lo
        seq = pc.utf8_lpad(
            pc.cast(pa.array(np.arange(first, first + n, dtype=np.int64)), pa.string()),
            width=20,
            padding="0",
        )
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(chunk, type=pa.binary()),
                pa.array([stream] * n, type=pa.string()),
                pa.array([shard] * n, type=pa.string()),
                seq,
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
    # seek hint: byte position of line index `first_line` (<= start); the
    # executor skips already-consumed bytes instead of rescanning the file
    start_byte: int = 0
    first_line: int = 0


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
        # per-trigger rate limit (the maxOffsetsPerTrigger analog; SURVEY
        # §2A X2): each latestOffset poll advances at most N records per
        # shard past the previous poll's answer, so trigger sizing is a
        # knob instead of drain-everything. CAUTION (ADVICE r6): do NOT
        # combine the bare cap with Trigger.AvailableNow — Spark's
        # AvailableNow wrapper (PythonMicroBatchStream implements neither
        # SupportsTriggerAvailableNow nor SupportsAdmissionControl, so it
        # is wrapped by AvailableNowDataStreamWrapper) calls latestOffset()
        # exactly ONCE at prepare time and uses the answer as the fixed
        # drain target, so a capped query drains at most one cap's worth
        # of records and terminates "successfully" with data left behind.
        # For capped BACKFILLS set availableNowSnapshot=true below: the
        # prepare-time poll then answers the UNCAPPED end offsets (frozen,
        # so concurrent appends don't leak into the backfill) and the cap
        # is honored as a per-TASK slice bound instead — partitions()
        # splits each shard range into <=cap-record slices, bounding
        # executor batch memory while the whole backlog drains in the one
        # snapshot batch. Commit granularity is necessarily that single
        # batch (the Python DataSource API gives no pagination hook), so
        # a mid-drain failure restarts the batch — standard Spark
        # semantics, no data loss.
        cap = options.get("maxrecordsperbatch")
        self.max_per_batch = int(cap) if cap else None
        snap = (options.get("availablenowsnapshot") or "false").lower()
        self.snapshot_drain = snap in ("true", "1", "yes")
        self._snapshot: dict[str, int] | None = None
        # shard files are append-only by contract; offsets going backwards
        # mean the file was truncated below a committed position — data
        # loss, raised by default (failOnDataLoss=false resumes lossily)
        fodl = (options.get("failondataloss") or "true").lower()
        self.fail_on_data_loss = fodl not in ("false", "0", "no")
        self._emitted: dict[str, int] = {}
        self._index = _LineIndex()

    def initialOffset(self) -> dict:
        if self.initial_position == "TRIM_HORIZON":
            out = {s: 0 for s in _shard_files(self.path)}
        else:
            out = {
                s: self._index.count(fp)
                for s, fp in _shard_files(self.path).items()
            }
        self._emitted.update(out)
        return out

    def latestOffset(self) -> dict:
        if self.snapshot_drain:
            # availableNow contract: the first (prepare-time) poll freezes
            # the uncapped end offsets; every later poll re-answers the
            # frozen snapshot so concurrent appends and newly-discovered
            # shards stay out of this backfill (they belong to the next
            # run, exactly like a prepare-time snapshot in a JVM source
            # implementing SupportsTriggerAvailableNow).
            if self._snapshot is None:
                self._snapshot = {
                    s: self._index.count(fp)
                    for s, fp in _shard_files(self.path).items()
                }
            self._emitted.update(self._snapshot)
            return dict(self._snapshot)
        out = {}
        for s, fp in _shard_files(self.path).items():
            avail = self._index.count(fp)
            if self.max_per_batch is not None:
                base = self._emitted.get(s, 0)
                avail = min(avail, base + self.max_per_batch)
            out[s] = avail
        self._emitted.update(out)
        return out

    def partitions(self, start: dict, end: dict):
        files = _shard_files(self.path)
        out = []
        for shard, hi in end.items():
            lo = start.get(shard, 0)  # shard absent in start == newly
            # discovered (resharding): consume from its trim horizon
            hi_eff = _arbitrate_committed_range(
                self._emitted, self._index, shard, files.get(shard),
                lo, hi, self.fail_on_data_loss, f"shard {shard}",
            )
            if hi_eff is None:
                continue
            hi = hi_eff
            if hi > lo and shard in files:
                # honor the cap as a per-task slice bound: a snapshot
                # batch spanning a deep backlog splits into <=cap-record
                # slices (contiguous, no gap/overlap) so executor-side
                # batch memory stays bounded no matter how deep the drain
                step = self.max_per_batch or (hi - lo)
                s = lo
                while s < hi:
                    e = min(s + step, hi)
                    byte_pos, line_no = self._index.seek_hint(files[shard], s)
                    out.append(
                        _ShardSlice(
                            shard, files[shard], s, e, self.stream, byte_pos, line_no
                        )
                    )
                    s = e
        return out or [_ShardSlice("shardId-empty", "", 0, 0, self.stream)]

    def read(self, partition: _ShardSlice):
        if partition.end <= partition.start or not partition.path:
            return iter(())
        payloads = _read_lines(
            partition.path,
            partition.start,
            partition.end,
            partition.start_byte,
            partition.first_line,
        )
        return _rows(partition.stream, partition.shard, payloads, partition.start)

    def commit(self, end: dict) -> None:
        # Offsets live in the checkpoint offset log; the only driver
        # state is the line index, whose stale seek boundaries are
        # released here (ADVICE r5: unpruned marks grow without bound on
        # a long-running poll loop). The rate-limit floor also advances
        # to the committed offsets, so a fresh driver resuming a deep
        # checkpoint rate-limits from where the log left off, not from 0.
        files = _shard_files(self.path)
        for shard, line in end.items():
            if self._emitted.get(shard, 0) < line:
                self._emitted[shard] = line
            fp = files.get(shard)
            if fp:
                self._index.prune(fp, line)


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
    """``spark.read/readStream.format("kinesis-replay").option("path", dir)``.

    Read options: ``initialPosition`` (TRIM_HORIZON default | LATEST),
    ``maxRecordsPerBatch`` (per-shard per-trigger cap — the
    maxOffsetsPerTrigger analog; do not combine with
    Trigger.AvailableNow — the snapshot drains one cap's worth only,
    see the stream-reader note), ``failOnDataLoss`` (true default:
    raise when shard offsets go backwards). Write options (the sink
    side, ``writeStream``/``df.write``): ``stream`` (defaults to the
    path's basename), ``numShards`` (16), ``partitionKey`` (fixed-key
    default "0", the reference's; rows may instead carry a
    ``partitionKey`` column)."""

    @classmethod
    def name(cls) -> str:
        return "kinesis-replay"

    def schema(self) -> StructType:
        return KINESIS_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _ReplayBatchReader(self.options)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return _ReplayStreamReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        return _KinesisReplayWriter(self.options)

    def streamWriter(self, schema: StructType, overwrite: bool) -> DataSourceStreamWriter:
        return _KinesisReplayWriter(self.options)


def register_kinesis_replay(spark) -> None:
    """Idempotent registration of the replay source."""
    spark.dataSource.register(KinesisReplayDataSource)


def kinesis_replay_stream(
    spark,
    stream_dir: str,
    initial_position: str = "TRIM_HORIZON",
    max_records_per_batch: int | None = None,
    available_now_snapshot: bool = False,
):
    """S1-shaped stream: Kinesis-model records from a replay directory.
    ``df["data"]`` feeds ``operators.parse.parse_trip_events`` exactly as
    Kinesis bytes feed the reference's deserializer.

    ``max_records_per_batch`` is the per-shard per-trigger rate cap; set
    ``available_now_snapshot`` when draining under Trigger.AvailableNow
    so the capped backfill drains to the prepare-time snapshot (the cap
    becomes a per-task slice bound — see _ReplayStreamReader)."""
    register_kinesis_replay(spark)
    reader = (
        spark.readStream.format("kinesis-replay")
        .option("path", stream_dir)
        .option("initialPosition", initial_position)
    )
    if max_records_per_batch is not None:
        reader = reader.option("maxRecordsPerBatch", str(max_records_per_batch))
    if available_now_snapshot:
        reader = reader.option("availableNowSnapshot", "true")
    return reader.load()


# --------------------------------------------------------------------------
# write side of the same execution model (K5 twin)
# --------------------------------------------------------------------------

class KinesisReplayClient:
    """boto3-shaped client for the replay-dir Kinesis model — the WRITE
    side of the execution model this module reads: ``put_records``
    routes every record by the real Kinesis contract (the 128-bit MD5 of
    its partition key falls into one of ``num_shards`` evenly-split hash
    ranges — what the service does with provisioned shards) and appends
    the payload as one newline-terminated line to that shard's file.

    Plugs straight into ``streaming.sinks.kinesis_put_batch`` via
    ``client_factory`` (same surface the boto3 client exposes), so the
    K5 sink runs its real batching/limit code against the model, and
    whatever it wrote replays back through the read side above —
    an end-to-end S1+K5 loop with no AWS.

    Concurrency: records are grouped per shard and appended under an
    ``fcntl`` exclusive lock per shard file, so parallel executor tasks
    interleave whole batches, never partial lines (same guarantee the
    service gives: a sequenced append per shard).
    """

    _MAX_RECORDS = 500  # PutRecords hard limit, enforced like the service

    def __init__(self, base_dir: str, num_shards: int = 16):
        self.base_dir = base_dir
        self.num_shards = int(num_shards)

    def _shard_for(self, partition_key: str) -> int:
        import hashlib

        h = int.from_bytes(
            hashlib.md5(str(partition_key).encode()).digest(), "big"
        )
        # shard i owns [i * 2^128/N, (i+1) * 2^128/N)
        return (h * self.num_shards) >> 128

    def put_records(self, StreamName: str, Records: list) -> dict:
        import fcntl

        if len(Records) > self._MAX_RECORDS:
            raise ValueError(
                f"PutRecords accepts at most {self._MAX_RECORDS} records"
            )
        stream_dir = os.path.join(self.base_dir, StreamName)
        os.makedirs(stream_dir, exist_ok=True)
        by_shard: dict[int, list[bytes]] = {}
        order: list[int] = []
        for rec in Records:
            data = rec["Data"]
            if isinstance(data, str):
                data = data.encode()
            s = self._shard_for(rec["PartitionKey"])
            by_shard.setdefault(s, []).append(data)
            order.append(s)
        for s, payloads in by_shard.items():
            fp = os.path.join(stream_dir, f"{_SHARD_PREFIX}{s:012d}.jsonl")
            with open(fp, "ab") as f:
                fcntl.flock(f, fcntl.LOCK_EX)
                try:
                    f.write(b"".join(p + b"\n" for p in payloads))
                    f.flush()
                finally:
                    fcntl.flock(f, fcntl.LOCK_UN)
        return {
            "FailedRecordCount": 0,
            "Records": [{"ShardId": f"{_SHARD_PREFIX}{s:012d}"} for s in order],
        }


# --------------------------------------------------------------------------
# first-class Spark sink over the write model (K5 as writeStream format)
# --------------------------------------------------------------------------

@dataclass
class _PutCommit(WriterCommitMessage):
    rows: int = 0
    shards: int = 0


class _KinesisReplayWriter(DataSourceStreamWriter, DataSourceWriter):
    """Executor-side writer: each task routes its rows through
    ``KinesisReplayClient`` (MD5 hash-range routing, flock'd appends) in
    PutRecords-sized batches. Input schema contract: a ``data`` column
    (string or binary payload) and an optional ``partitionKey`` column —
    absent, the reference's fixed key "0" applies
    (StreamingEtl.java:199).

    Delivery semantics match the real Kinesis producer path: appends are
    at-least-once across task retries (a retried task re-puts its rows —
    the service has no cross-call transaction; consumers dedupe on the
    idempotent payload key, K4's recipe). ``commit`` records a per-batch
    marker under ``_commits/`` — the driver-side audit trail of which
    micro-batches fully landed; ``abort`` records the failure the same
    way. Works as BOTH the streaming sink (per-micro-batch commit) and
    the batch writer (single commit)."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("kinesis-replay writer requires a 'path' option")
        self.stream = options.get("stream") or os.path.basename(
            self.path.rstrip("/")
        )
        self.num_shards = int(options.get("numshards") or 16)
        self.fixed_key = options.get("partitionkey") or "0"

    def write(self, iterator):
        client = KinesisReplayClient(
            os.path.dirname(self.path.rstrip("/")) or ".", self.num_shards
        )
        buf, rows, shards = [], 0, set()
        for row in iterator:
            d = row["data"]
            key = (
                str(row["partitionKey"])
                if "partitionKey" in row.__fields__ and row["partitionKey"] is not None
                else self.fixed_key
            )
            buf.append({"Data": d, "PartitionKey": key})
            rows += 1
            if len(buf) == KinesisReplayClient._MAX_RECORDS:
                resp = client.put_records(StreamName=self.stream, Records=buf)
                shards.update(r["ShardId"] for r in resp["Records"])
                buf = []
        if buf:
            resp = client.put_records(StreamName=self.stream, Records=buf)
            shards.update(r["ShardId"] for r in resp["Records"])
        return _PutCommit(rows=rows, shards=len(shards))

    def _mark(self, name: str, messages) -> None:
        d = os.path.join(self.path, "_commits")
        os.makedirs(d, exist_ok=True)
        total = sum(m.rows for m in messages if m is not None)
        with open(os.path.join(d, name), "w") as f:
            f.write(json.dumps({"rows": total}))

    # streaming sink: per-micro-batch commit/abort with batch id
    def commit(self, messages, batchId: int | None = None) -> None:
        self._mark(
            "batch-%d" % batchId if batchId is not None else "batch", messages
        )

    def abort(self, messages, batchId: int | None = None) -> None:
        self._mark(
            "aborted-%d" % batchId if batchId is not None else "aborted", messages
        )
