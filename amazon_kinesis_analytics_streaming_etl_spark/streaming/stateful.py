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

    Environment evidence (checked 2026-08, round 5): ``import
    google.protobuf`` raises ``ModuleNotFoundError: No module named
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
