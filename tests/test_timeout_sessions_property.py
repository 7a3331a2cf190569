"""Hypothesis property suite for the event-time-timer sessionizer
(streaming/stateful.py timeout_sessions_per_user) — round-7 verdict
item #6: random gap/timeout interleavings across micro-batch boundaries
vs a pure-Python batch oracle.

Traces are generated so no row is ever late (watermark delay larger
than the full timestamp spread of the real events), which keeps the
oracle exact: surviving rows = all rows, sessions = per-user interval
merge, closed = every real session (a far-future sentinel pushes the
final watermark past every deadline; its own tail stays open and must
NOT be emitted). The late-drop and exact-boundary cases have their own
dedicated deterministic tests in test_streaming_semantics.py.
"""

from __future__ import annotations

import datetime as dt
import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from amazon_kinesis_analytics_streaming_etl_spark.schemas import TESTDATA_SCHEMAS

T0 = dt.datetime(2024, 1, 1)
GAP_MIN = 30
WM = "240 minutes"  # > the 120-minute event spread: nothing is ever late
SENTINEL_USER = 99


def _oracle(events: list[tuple[int, int]]) -> set[tuple]:
    """events: (user, minute_offset). Returns the closed-session set
    {(user, start_ms, end_ms, n_events, total_value)} with value=1.0 per
    event — per-user sort + interval merge with the strict > gap split,
    every session closed (sentinel-driven final watermark)."""
    per_user: dict[int, list[int]] = {}
    for u, m in events:
        per_user.setdefault(u, []).append(m)
    out = set()
    for u, mins in per_user.items():
        mins.sort()
        start = end = mins[0]
        n = 1
        for m in mins[1:]:
            if m - end <= GAP_MIN:
                end = m
                n += 1
            else:
                out.add((u, _ms(start), _ms(end), n, float(n)))
                start = end = m
                n = 1
        out.add((u, _ms(start), _ms(end), n, float(n)))
    return out


def _ms(minute: int) -> int:
    return int((T0 + dt.timedelta(minutes=minute)).timestamp() * 1000)


@st.composite
def _traces(draw):
    """2-3 users x 3-10 events at random minute offsets in [0, 120],
    dealt into 2-4 micro-batches in random interleaving."""
    n_batches = draw(st.integers(2, 4))
    events = draw(
        st.lists(
            st.tuples(st.integers(1, 3), st.integers(0, 120)),
            min_size=3,
            max_size=10,
        )
    )
    assignment = draw(
        st.lists(
            st.integers(0, n_batches - 1),
            min_size=len(events),
            max_size=len(events),
        )
    )
    batches: list[list[tuple[int, int]]] = [[] for _ in range(n_batches)]
    for ev, b in zip(events, assignment):
        batches[b].append(ev)
    return [b for b in batches if b], events


@settings(
    max_examples=5,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_traces())
def test_random_interleavings_match_batch_oracle(spark, tmp_path_factory, trace):
    """Any interleaving of events across micro-batches yields exactly the
    oracle's closed sessions: in-data closes, timer closes in the final
    no-data batch, backward start-extension by stragglers — and the
    sentinel's open tail is withheld."""
    from amazon_kinesis_analytics_streaming_etl_spark.streaming.stateful import (
        timeout_sessions_per_user,
    )
    from amazon_kinesis_analytics_streaming_etl_spark.streaming.windows import (
        replay_to_memory,
    )

    batches, events = trace
    tmp_path = tmp_path_factory.mktemp("sess_prop")
    p = str(tmp_path / "ev")
    os.makedirs(p)
    eid = 0
    for i, rows in enumerate(batches):
        data = []
        for u, m in rows:
            eid += 1
            data.append((eid, T0 + dt.timedelta(minutes=m), u, "click", 1.0, "{}"))
        spark.createDataFrame(data, TESTDATA_SCHEMAS["events"]).coalesce(
            1
        ).write.mode("overwrite").parquet(f"{p}/part{i}")
    # sentinel batch last: watermark jumps past every real deadline, so
    # every real session must close (timer or in-data) by the final batch
    sentinel_ts = T0 + dt.timedelta(days=10)
    spark.createDataFrame(
        [(9999, sentinel_ts, SENTINEL_USER, "click", 0.0, "{}")],
        TESTDATA_SCHEMAS["events"],
    ).coalesce(1).write.mode("overwrite").parquet(f"{p}/part{len(batches)}")

    plan = timeout_sessions_per_user(
        spark.readStream.schema(TESTDATA_SCHEMAS["events"])
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(p + "/part*"),
        gap=f"{GAP_MIN} minutes",
        watermark=WM,
    )
    out = replay_to_memory(spark, plan, output_mode="append")
    got = {
        (
            r["user_id"],
            r["session_start_ms"],
            r["session_end_ms"],
            r["n_events"],
            r["total_value"],
        )
        for r in out.collect()
    }
    assert got == _oracle(events), f"trace={batches}"
