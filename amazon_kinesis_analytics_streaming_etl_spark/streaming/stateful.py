"""Custom stateful streaming operators via applyInPandasWithState.

The built-in stateful operators (windowed aggs, dropDuplicates,
stream-stream joins) cover the reference's needs; this module is the
escape hatch for semantics they can't express — arbitrary per-key state
machines, run as Arrow-batched Python over Spark's state store (so state
survives checkpoints/restarts like any engine-managed state).

At scale: state is partitioned by key across executors; the Python
function sees one key's rows per call; shuffle = one hash exchange on the
key, identical to a groupBy.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNNING_TOTALS_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_RUNNING_TOTALS_STATE = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def _running_totals_fn(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


TOPK_OUTPUT = StructType(
    [
        StructField("event_type", StringType()),
        StructField("rank", LongType()),
        StructField("event_id", LongType()),
        StructField("value", DoubleType()),
    ]
)

_TOPK_STATE = StructType(
    [
        StructField("ids", ArrayType(LongType())),
        StructField("vals", ArrayType(DoubleType())),
    ]
)


def _topk_fn_factory(k: int):
    def _topk_fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        ids, vals = state.get if state.exists else ([], [])
        pool = list(zip(list(ids), list(vals)))
        for pdf in pdfs:
            pool.extend(zip(pdf["event_id"].tolist(), pdf["value"].tolist()))
        # keep-k merge: (value desc, id asc) — deterministic under replay
        pool.sort(key=lambda p: (-p[1], p[0]))
        pool = pool[:k]
        state.update(([p[0] for p in pool], [p[1] for p in pool]))
        yield pd.DataFrame(
            {
                "event_type": [key[0]] * len(pool),
                "rank": list(range(1, len(pool) + 1)),
                "event_id": [p[0] for p in pool],
                "value": [p[1] for p in pool],
            }
        )

    return _topk_fn


def streaming_topk_per_key(
    stream: DataFrame,
    k: int = 10,
    key_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Incremental top-k under appends (EDBT 2020 'incremental top-k'
    motif, PAPERS.md): per-key state holds only the current top-k (ids +
    values — O(k) state, not the stream); each micro-batch merges new
    rows and re-emits the key's top-k snapshot. Deterministic tie-break
    (value desc, id asc) makes replays idempotent. Batch twin for the
    oracle: window row_number <= k."""
    sel = stream.select(
        stream[key_col].alias("event_type"),
        stream[id_col].alias("event_id"),
        stream[value_col].alias("value"),
    )
    return sel.groupBy("event_type").applyInPandasWithState(
        _topk_fn_factory(k),
        outputStructType=TOPK_OUTPUT,
        stateStructType=_TOPK_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


PERCENTILES_OUTPUT = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n", LongType()),
        StructField("est_p50", DoubleType()),
        StructField("est_p95", DoubleType()),
    ]
)

_TDIGEST_STATE = StructType(
    [
        StructField("means", ArrayType(DoubleType())),
        StructField("weights", ArrayType(DoubleType())),
        StructField("n", LongType()),
    ]
)


_EMPTY_PERCENTILES = pd.DataFrame(
    {"event_type": [], "n": [], "est_p50": [], "est_p95": []}
)


def _tdigest_fn_factory(delta: float, quantiles: tuple):
    def _fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..operators.sketch import _td_compress, _td_quantile

        means, weights, n = state.get if state.exists else ([], [], 0)
        m, w = np.asarray(means, dtype=float), np.asarray(weights, dtype=float)
        for pdf in pdfs:
            vals = pdf["value"].dropna().to_numpy(dtype=float)
            if len(vals):
                # fold the batch in and re-compress: state stays O(delta)
                # no matter how long the stream runs
                m = np.concatenate([m, vals])
                w = np.concatenate([w, np.ones(len(vals))])
                m, w = _td_compress(m, w, delta)
                n += len(vals)
        if n == 0:
            # a key whose values so far are all null has no digest:
            # creating empty state and emitting an n=0/NaN snapshot row
            # would hand consumers ("take the highest-n row per key") a
            # NaN-only result instead of no row
            yield _EMPTY_PERCENTILES
            return
        # plain-float lists: numpy scalars would reach the JVM state-store
        # unpickler as unconstructible ClassDicts
        state.update(([float(x) for x in m], [float(x) for x in w], int(n)))
        ests = [_td_quantile(m, w, q) for q in quantiles]
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n": [int(n)],
                "est_p50": [ests[0]],
                "est_p95": [ests[1]],
            }
        )

    return _fn


def streaming_percentiles_per_key(
    stream: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    delta: float = 200.0,
) -> DataFrame:
    """Per-key running quantile monitor: state = one merging t-digest
    (operators/sketch.py) per key, re-compressed every micro-batch so
    state is O(delta) centroids forever — the streaming twin of
    ``sketch_tdigest_rollup`` and the latency-percentile dashboard shape
    (a per-window exact percentile would buffer every value; percentile
    state must be a mergeable sketch to stream at 100 TB). Each batch
    appends the key's latest (n, est_p50, est_p95) snapshot; consumers
    take the row with the highest n per key (monotone, idempotent)."""
    sel = stream.select(
        stream[key_col].alias("event_type"), stream[value_col].alias("value")
    )
    return sel.groupBy("event_type").applyInPandasWithState(
        _tdigest_fn_factory(delta, (0.50, 0.95)),
        outputStructType=PERCENTILES_OUTPUT,
        stateStructType=_TDIGEST_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


class _RunningTotalsProcessor:
    """StatefulProcessor for the transformWithStateInPandas (state v2)
    twin of running_totals_per_key: typed ValueState in the state store
    (RocksDB-backed) instead of a single tuple row per key. v2 adds
    composite state types (value/list/map), per-key timers, and initial-
    state bootstrap — this processor is the engine's template for them.
    Imported lazily: the base class only exists on Spark >= 4.0."""

    def init(self, handle) -> None:
        self._totals = handle.getValueState("totals", _RUNNING_TOTALS_STATE)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        n, total = self._totals.get() if self._totals.exists() else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._totals.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    def close(self) -> None:
        pass


def state_v2_available() -> bool:
    """transformWithStateInPandas needs the RocksDB state store AND the
    protobuf Python package (its driver-side runner speaks protobuf to
    the JVM). Absent protobuf, the runner crashes at init.

    Environment evidence (re-probed 2026-08-16, round 12): ``import
    google.protobuf`` still raises ``ModuleNotFoundError: No module named
    'google'`` in this container, and package installation is not
    available, so the v2 path stays gated here; the processor above is
    the complete implementation and the gate flips on automatically in
    any environment that ships protobuf."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def running_totals_per_key_v2(
    stream: DataFrame, key_col: str = "user_id", value_col: str = "value"
) -> DataFrame:
    """State-v2 running totals via transformWithStateInPandas. Same
    semantics as running_totals_per_key; requires the RocksDB state store
    provider plus the protobuf package (``state_v2_available()``) — the
    v1 applyInPandasWithState twin is the dependency-free default."""
    if not state_v2_available():
        raise NotImplementedError(
            "transformWithStateInPandas requires the protobuf package "
            "(not present in this environment); use running_totals_per_key."
        )
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    proc_cls = type(
        "RunningTotalsProcessor", (_RunningTotalsProcessor, StatefulProcessor), {}
    )
    sel = stream.select(
        stream[key_col].alias("user_id"), stream[value_col].alias("value")
    )
    return sel.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=proc_cls(),
        outputStructType=RUNNING_TOTALS_OUTPUT,
        outputMode="Append",
        timeMode="None",
    )


def running_totals_per_key(
    stream: DataFrame, key_col: str = "user_id", value_col: str = "value"
) -> DataFrame:
    """Per-key cumulative (count, sum) state machine: each micro-batch
    emits the key's running totals so far. With a single-batch replay the
    output equals a batch groupBy — which is how the oracle checks it —
    and across batches/restarts the state accumulates (pinned in tests).
    """
    sel = stream.select(
        stream[key_col].alias("user_id"), stream[value_col].alias("value")
    )
    return sel.groupBy("user_id").applyInPandasWithState(
        _running_totals_fn,
        outputStructType=RUNNING_TOTALS_OUTPUT,
        stateStructType=_RUNNING_TOTALS_STATE,
        # "append" so any sink (incl. files) accepts the stream; each
        # batch appends the key's latest snapshot row — consumers take the
        # last row per key (idempotent-key pattern again).
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


ANOMALY_OUTPUT = StructType(
    [
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("zscore", DoubleType()),
    ]
)

_ANOMALY_STATE = StructType(
    [
        StructField("n", LongType()),
        StructField("s", DoubleType()),
        StructField("s2", DoubleType()),
    ]
)

_ANOMALY_MIN_N = 30  # prior observations required before scoring
_ANOMALY_Z = 3.0


def _anomaly_fn(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    import numpy as np

    n0, s0, s20 = state.get if state.exists else (0, 0.0, 0.0)
    pdf = pd.concat(list(pdfs), ignore_index=True)
    # deterministic within-batch order: score in event_id order so replay
    # and the batch oracle see the same "prior events" at every row
    pdf = pdf.sort_values("event_id", ignore_index=True)
    v = pdf["value"].to_numpy(dtype=np.float64)
    cs = np.cumsum(v)
    cs2 = np.cumsum(v * v)
    prior_n = n0 + np.arange(len(v), dtype=np.int64)
    prior_s = s0 + cs - v
    prior_s2 = s20 + cs2 - v * v
    with np.errstate(divide="ignore", invalid="ignore"):
        mean = prior_s / prior_n
        var = np.maximum(prior_s2 / prior_n - mean * mean, 0.0)
        std = np.sqrt(var)
        z = (v - mean) / std
    ok = (prior_n >= _ANOMALY_MIN_N) & (std > 1e-12)
    flag = ok & (np.abs(z) > _ANOMALY_Z)
    state.update((int(n0 + len(v)), float(s0 + cs[-1]), float(s20 + cs2[-1])))
    out = pdf.loc[flag, ["event_id", "value"]].copy()
    out["event_type"] = key[0]
    out["zscore"] = z[flag]
    yield out[["event_id", "event_type", "value", "zscore"]]


def streaming_anomaly_flags(
    stream: DataFrame, key_col: str = "event_type"
) -> DataFrame:
    """Per-key streaming anomaly detector: O(1) state per key (count,
    sum, sum of squares — the mergeable moments), each event scored
    against the distribution of STRICTLY PRIOR events of its key; |z| > 3
    after a 30-event warm-up emits a flag row. This is the monitoring
    shape (latency spikes, value outliers) where recomputing a window per
    event would be quadratic — running moments make it one pass.

    Within-batch order is pinned to event_id so replays and the batch
    oracle (window sums over ROWS ... 1 PRECEDING) agree row for row."""
    sel = stream.select(
        stream[key_col].alias("event_type"), "event_id", "value"
    )
    return sel.groupBy("event_type").applyInPandasWithState(
        _anomaly_fn,
        outputStructType=ANOMALY_OUTPUT,
        stateStructType=_ANOMALY_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


CDC_LATEST_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)

_CDC_LATEST_STATE = StructType(
    [
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def _cdc_latest_fn(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    cur_id, cur_type, cur_val = state.get if state.exists else (-1, "", 0.0)
    for pdf in pdfs:
        if not len(pdf):
            continue
        top = pdf.loc[pdf["event_id"].idxmax()]
        if int(top["event_id"]) > cur_id:
            cur_id = int(top["event_id"])
            cur_type = str(top["event_type"])
            cur_val = float(top["value"])
    state.update((cur_id, cur_type, cur_val))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "event_id": [cur_id],
            "event_type": [cur_type],
            "value": [cur_val],
        }
    )


def streaming_cdc_latest(stream: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Streaming upsert view: per key, the state is the SINGLE latest row
    (highest event_id — the change-stream version), re-emitted as a
    snapshot each micro-batch a key appears in. This is the CDC
    materialization pattern (MERGE-into-latest as a stream): state is
    O(1) per key, arrival order never matters because version comparison
    is monotone, and replays are idempotent by construction."""
    sel = stream.select(
        stream[key_col].alias("user_id"), "event_id", "event_type", "value"
    )
    return sel.groupBy("user_id").applyInPandasWithState(
        _cdc_latest_fn,
        outputStructType=CDC_LATEST_OUTPUT,
        stateStructType=_CDC_LATEST_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


TIMEOUT_SESSIONS_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_ms", LongType()),
        StructField("session_end_ms", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_TIMEOUT_SESSIONS_STATE = StructType(
    [
        StructField("start_ms", ArrayType(LongType())),
        StructField("last_ms", ArrayType(LongType())),
        StructField("n", ArrayType(LongType())),
        StructField("total", ArrayType(DoubleType())),
    ]
)


def _timeout_sessions_fn_factory(gap_ms: int):
    def _fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        uid = key[0]

        def _emit(rows):
            return pd.DataFrame(
                {
                    "user_id": [uid] * len(rows),
                    "session_start_ms": [r[0] for r in rows],
                    "session_end_ms": [r[1] for r in rows],
                    "n_events": [r[2] for r in rows],
                    "total_value": [r[3] for r in rows],
                }
            )

        # State holds EVERY pending session, not just the open tail: a
        # session [a, b] stays mergeable until the watermark passes
        # b + gap (a straggler in (b, b + gap] can still extend it, and
        # a bridging straggler can fuse two pending sessions), so
        # closing any session before its deadline diverges from the
        # batch oracle. Found by the round-8 hypothesis interleaving
        # suite (tests/test_timeout_sessions_property.py): the previous
        # open-tail-only state closed out-of-gap stragglers eagerly and
        # missed a later in-gap merge. State is O(pending sessions) per
        # key — bounded by gap/watermark, the same bound Spark's own
        # session_window state keeps in append mode.
        pending: list[list] = (
            [list(t) for t in zip(*state.get)] if state.exists else []
        )

        def _finalize(sessions: list[list]):
            """Split by deadline vs watermark (strict <, ADVICE r7),
            persist survivors, arm the timer at the earliest pending
            deadline, and emit the closed ones."""
            wm_now = state.getCurrentWatermarkMs()
            closed = [s for s in sessions if s[1] + gap_ms < wm_now]
            keep = [s for s in sessions if s[1] + gap_ms >= wm_now]
            if keep:
                state.update(
                    (
                        [s[0] for s in keep],
                        [s[1] for s in keep],
                        [s[2] for s in keep],
                        [s[3] for s in keep],
                    )
                )
                deadline = min(s[1] + gap_ms for s in keep)
                # setTimeoutTimestamp must be strictly beyond the
                # watermark; at exact equality bump 1 ms (the timer
                # still fires at the next watermark advance, matching
                # the strict keep-open contract)
                state.setTimeoutTimestamp(
                    deadline if deadline > wm_now else wm_now + 1
                )
            elif state.exists:
                state.remove()
            return closed

        if state.hasTimedOut:
            # watermark passed the earliest pending deadline with no new
            # events: emit every expired session, re-arm for the rest.
            yield _emit([tuple(s) for s in _finalize(pending)])
            return
        parts = [pdf for pdf in pdfs if len(pdf)]
        rows = pd.concat(parts) if parts else pd.DataFrame()
        if len(rows):
            # null ts cannot be windowed (astype would turn NaT into
            # int64-min and emit a garbage epoch session) — drop, the
            # same rows the declarative session_window twin drops; null
            # value counts the event but adds 0 (sum-ignores-nulls +
            # count(*), the SQL aggregate contract)
            rows = rows[rows["ts"].notna()]
        if len(rows):
            # rows arrive in shuffle order, not time order — interval-
            # merge the pending sessions with the batch's events sorted
            # by start: an in-gap earlier event extends start_ms
            # BACKWARD, a bridging event fuses two pending sessions.
            # O(batch rows log batch rows) per key.
            # normalize to ns first: Arrow can hand back datetime64[us],
            # whose raw int64 view would be off by 1000x
            ts = (
                rows["ts"].astype("datetime64[ns]").astype("int64") // 1_000_000
            ).to_numpy()
            vals = rows["value"].fillna(0.0).to_numpy()
            items = list(pending)
            items.extend([int(t), int(t), 1, float(v)] for t, v in zip(ts, vals))
            items.sort(key=lambda r: (r[0], r[1]))
            merged: list[list] = []
            for it in items:
                if merged and it[0] - merged[-1][1] <= gap_ms:
                    m = merged[-1]
                    m[1] = max(m[1], it[1])
                    m[2] += it[2]
                    m[3] += it[3]
                else:
                    merged.append(it)
            pending = merged
        yield _emit([tuple(s) for s in _finalize(pending)])

    return _fn


def timeout_sessions_per_user(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Custom session windows via EVENT-TIME TIMERS: the state-machine
    form of `session_window` (streaming/windows.py session_window_agg is
    the declarative twin). Sessions close two ways — a same-key event
    arriving past the gap closes the previous session in-data, and the
    event-time timeout (`GroupStateTimeout.EventTimeTimeout` +
    `setTimeoutTimestamp(last + gap)`) closes the open tail once the
    watermark passes it with no successor, including in Spark's final
    no-data micro-batch. This is the template for timer-driven custom
    operators (TTL eviction, SLA timers, delayed emission): state is
    O(1) per open session, emission is append-mode (closed sessions
    only — an open tail past the final watermark is never emitted,
    exactly like the production stream it models).

    Parses ``gap`` via Spark's own interval parser so operator and
    engine agree on the millisecond value.
    """
    from pyspark.sql.functions import expr

    gap_row = (
        stream.sparkSession.range(1)
        .select(
            expr(
                f"unix_millis(timestamp'1970-01-01 00:00:00Z' + interval {gap})"
            )
        )
        .head()
    )
    wm = stream.withWatermark(ts_col, watermark)
    sel = wm.select(
        wm[key_col].alias("user_id"),
        wm[ts_col].alias("ts"),
        wm[value_col].alias("value"),
    )
    return sel.groupBy("user_id").applyInPandasWithState(
        _timeout_sessions_fn_factory(int(gap_row[0])),
        outputStructType=TIMEOUT_SESSIONS_OUTPUT,
        stateStructType=_TIMEOUT_SESSIONS_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
