"""Streaming semantics under deterministic replay: watermark late-data
drop (append mode), session merge, stateful dedup, stream-static join."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from amazon_kinesis_analytics_streaming_etl_spark.schemas import TESTDATA_SCHEMAS
from amazon_kinesis_analytics_streaming_etl_spark.streaming.windows import (
    replay_to_memory,
    session_window_agg,
    streaming_dedup,
    tumbling_window_agg,
)


def _write_events(spark, path, rows):
    df = spark.createDataFrame(rows, TESTDATA_SCHEMAS["events"])
    df.coalesce(1).write.mode("overwrite").parquet(path)


def _stream(spark, path):
    return (
        spark.readStream.schema(TESTDATA_SCHEMAS["events"])
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(path + "/part*")
    )


def _ev(eid, ts, user=1, etype="click", value=1.0):
    return (eid, ts, user, etype, value, "{}")


def test_append_mode_watermark_drops_late_rows(spark, tmp_path):
    """Two availableNow runs over a shared checkpoint: run 2 delivers an
    event 3 hours older than the persisted watermark — it must be dropped
    from the aggregation (production late-data policy), and the watermark
    must survive the restart (X1)."""
    p = str(tmp_path / "ev")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    t0 = dt.datetime(2024, 1, 1, 0, 30)
    os.makedirs(p)

    def run_once():
        plan = tumbling_window_agg(
            _stream(spark, p), ts_col="ts", window_size="1 hour", watermark="1 hour",
            aggs=[F.count("*").alias("n")],
        )
        q = (
            plan.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # Run 1: events at 00:30 and 04:30 -> watermark persists at 03:30;
    # the closed hour-0 window is emitted with n=1.
    df1 = spark.createDataFrame(
        [_ev(1, t0), _ev(2, t0 + dt.timedelta(hours=4))], TESTDATA_SCHEMAS["events"]
    )
    df1.coalesce(1).write.mode("append").parquet(p)
    run_once()
    # Run 2: a late event for hour 0 (< checkpointed watermark) plus an
    # on-time one.
    df2 = spark.createDataFrame(
        [_ev(3, t0 + dt.timedelta(minutes=5)), _ev(4, t0 + dt.timedelta(hours=4, minutes=10))],
        TESTDATA_SCHEMAS["events"],
    )
    df2.coalesce(1).write.mode("append").parquet(p)
    run_once()

    rows = {(r.window_start.hour, r.n) for r in spark.read.parquet(sink).collect()}
    assert (0, 1) in rows  # hour-0 emitted once, without the late event
    assert (0, 2) not in rows


def test_streaming_dedup_suppresses_redelivery(spark, tmp_path):
    p = str(tmp_path / "ev2")
    t0 = dt.datetime(2024, 1, 1, 12, 0)
    rows = [_ev(1, t0), _ev(1, t0), _ev(2, t0 + dt.timedelta(minutes=1))]
    _write_events(spark, p, rows)
    plan = streaming_dedup(_stream(spark, p), key_cols=["event_id"], watermark="1 hour")
    out = replay_to_memory(spark, plan, output_mode="append")
    assert out.count() == 2


def test_session_window_merges_within_gap(spark, tmp_path):
    p = str(tmp_path / "ev3")
    t0 = dt.datetime(2024, 1, 1, 9, 0)
    rows = [
        _ev(1, t0, user=1),
        _ev(2, t0 + dt.timedelta(minutes=5), user=1),   # same session
        _ev(3, t0 + dt.timedelta(minutes=40), user=1),  # new session (>10m gap)
        _ev(4, t0, user=2),
    ]
    _write_events(spark, p, rows)
    plan = session_window_agg(
        _stream(spark, p), ts_col="ts", gap="10 minutes", watermark="1 hour",
        group_cols=["user_id"], aggs=[F.count("*").alias("n")],
    )
    out = replay_to_memory(spark, plan, output_mode="complete")
    sessions = {(r.user_id, r.n) for r in out.collect()}
    assert sessions == {(1, 2), (1, 1), (2, 1)}
    # session end = last event + gap
    first = out.where((F.col("user_id") == 1) & (F.col("n") == 2)).head()
    assert first.window_end == t0 + dt.timedelta(minutes=15)


def test_stream_static_join_broadcasts(spark, tmp_path):
    p = str(tmp_path / "ev4")
    t0 = dt.datetime(2024, 1, 1, 8, 0)
    _write_events(spark, p, [_ev(1, t0, user=3), _ev(2, t0, user=4), _ev(3, t0, user=99)])
    dim = spark.createDataFrame([(3, "SEG_A"), (4, "SEG_B")], ["user_id", "seg"])
    joined = _stream(spark, p).join(F.broadcast(dim), "user_id")
    out = replay_to_memory(spark, joined, output_mode="append")
    assert {(r.user_id, r.seg) for r in out.collect()} == {(3, "SEG_A"), (4, "SEG_B")}


def test_incremental_topk_state_across_batches(spark, tmp_path):
    """Three micro-batches (maxFilesPerTrigger=1): the per-key top-3
    state must merge across batches — the final snapshot holds the global
    top-3 even though its members arrived in different batches, and
    superseded snapshot rows re-rank below k."""
    from amazon_kinesis_analytics_streaming_etl_spark.streaming.stateful import (
        streaming_topk_per_key,
    )

    p = str(tmp_path / "ev")
    t0 = dt.datetime(2024, 1, 1)
    batches = [
        [_ev(1, t0, value=5.0), _ev(2, t0, value=1.0)],
        [_ev(3, t0, value=9.0), _ev(4, t0, value=0.5)],
        [_ev(5, t0, value=7.0), _ev(6, t0, value=6.0)],
    ]
    os.makedirs(p)
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, TESTDATA_SCHEMAS["events"])
        df.coalesce(1).write.mode("overwrite").parquet(f"{p}/part{i}")

    plan = streaming_topk_per_key(
        spark.readStream.schema(TESTDATA_SCHEMAS["events"])
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(p + "/part*"),
        k=3,
    )
    out = replay_to_memory(spark, plan, output_mode="append")
    assert out.count() >= 6  # snapshot per batch, cumulative
    final = {
        (r["rank"], r["event_id"], r["value"])
        for r in out.select("event_id", "value").distinct()
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.col("value").desc(), "event_id")),
        )
        .where(F.col("rank") <= 3)
        .collect()
    }
    assert final == {(1, 3, 9.0), (2, 5, 7.0), (3, 6, 6.0)}


def test_streaming_dedup_same_key_different_event_times(spark, tmp_path):
    """Per-key dedup must suppress a redelivery that carries a DIFFERENT
    event time (ADVICE r1: dropDuplicates(key+ts) let these through)."""
    p = str(tmp_path / "ev_dedup2")
    t0 = dt.datetime(2024, 1, 1, 12, 0)
    rows = [
        _ev(1, t0),
        _ev(1, t0 + dt.timedelta(minutes=5)),  # same key, later event time
        _ev(2, t0 + dt.timedelta(minutes=1)),
    ]
    _write_events(spark, p, rows)
    plan = streaming_dedup(_stream(spark, p), key_cols=["event_id"], watermark="1 hour")
    out = replay_to_memory(spark, plan, output_mode="append")
    assert out.count() == 2


def test_stream_chained_agg_withholds_trailing_partial_day(spark):
    """Append-mode contract of the chained agg: with watermark delay 0,
    every complete day is emitted and the day containing max(ts) is
    withheld (its window end is above the final watermark)."""
    from pyspark.sql import functions as F

    from amazon_kinesis_analytics_streaming_etl_spark.plans.catalog import QUERIES

    sf = "/root/testdata/sf0.001"
    out = QUERIES["stream_chained_agg"](spark, sf)
    ev = spark.read.parquet(f"{sf}/events.parquet")
    mx = ev.agg(F.max("ts")).collect()[0][0]
    days = {r.day_start for r in out.select("day_start").distinct().collect()}
    assert days  # complete days present
    assert mx.strftime("%Y-%m-%d 00:00:00") not in days


def test_stream_left_outer_join_emits_null_rows(spark):
    """The left-outer stream-stream join must emit BOTH matched rows and
    null-extended unmatched clicks (watermark-driven state eviction)."""
    from amazon_kinesis_analytics_streaming_etl_spark.plans.catalog import QUERIES

    out = QUERIES["stream_left_outer_join"](spark, "/root/testdata/sf0.001").collect()
    matched = [r for r in out if r.purchase_ts is not None]
    unmatched = [r for r in out if r.purchase_ts is None]
    assert matched and unmatched
    assert all(r.purchase_value is None for r in unmatched)


def test_stream_anomaly_state_carries_across_batches(spark, tmp_path):
    """The moments state must CONTINUE across micro-batches: replaying the
    events in two batches must flag exactly the same rows as one batch
    (prior-distribution semantics are independent of batch boundaries,
    because within-batch order is pinned to event_id and batches split on
    an event_id boundary)."""
    import shutil

    from pyspark.sql import functions as F

    from amazon_kinesis_analytics_streaming_etl_spark.schemas import load_events
    from amazon_kinesis_analytics_streaming_etl_spark.streaming.stateful import (
        streaming_anomaly_flags,
    )
    from amazon_kinesis_analytics_streaming_etl_spark.streaming.windows import (
        replay_to_memory,
    )
    from tests.conftest import SF_SMOKE

    ev = load_events(spark, SF_SMOKE).orderBy("event_id")
    cut = ev.approxQuantile("event_id", [0.5], 0.0)[0]
    src = tmp_path / "split"
    src.mkdir()
    # two files, ordered halves — the file stream drains them as separate
    # micro-batches (maxFilesPerTrigger=1)
    ev.where(F.col("event_id") <= cut).coalesce(1).write.parquet(
        str(src / "a.parquet")
    )
    ev.where(F.col("event_id") > cut).coalesce(1).write.parquet(
        str(src / "b.parquet")
    )
    schema = ev.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    two_batch = replay_to_memory(
        spark, streaming_anomaly_flags(stream), output_mode="append"
    )
    got = sorted(
        (r.event_id, round(r.zscore, 6)) for r in two_batch.collect()
    )
    one_stream = spark.readStream.schema(schema).parquet(f"{src}/*")
    one_batch = replay_to_memory(
        spark, streaming_anomaly_flags(one_stream), output_mode="append"
    )
    want = sorted(
        (r.event_id, round(r.zscore, 6)) for r in one_batch.collect()
    )
    assert got == want and len(got) > 0
    shutil.rmtree(src, ignore_errors=True)


def test_timeout_sessions_timer_fires_and_tail_stays_open(spark, tmp_path):
    """Event-time-timer sessionizer across real micro-batches
    (maxFilesPerTrigger=1): a session with NO successor event can only be
    emitted by the EventTimeTimeout firing once the watermark passes
    last+gap (here in the final no-data batch), an intra-batch gap closes
    in-data, and the open tail past the final watermark is withheld."""
    from amazon_kinesis_analytics_streaming_etl_spark.streaming.stateful import (
        timeout_sessions_per_user,
    )

    p = str(tmp_path / "ev")
    t0 = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    batches = [
        # user 1: two close events, then silence -> only a timer can close
        # user 3: in-batch gap > 30min -> first session closes in-data
        [
            _ev(1, t0, user=1, value=2.0),
            _ev(2, t0 + 10 * m, user=1, value=3.0),
            _ev(3, t0, user=3, value=1.0),
            _ev(4, t0 + 120 * m, user=3, value=1.0),
        ],
        # user 2 far ahead: advances the watermark to t0+2h50, which is
        # past user 1's t0+40min and user 3's t0+2h30 deadlines but not
        # past user 2's own t0+3h30
        [_ev(5, t0 + 180 * m, user=2, value=4.0)],
    ]
    os.makedirs(p)
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, TESTDATA_SCHEMAS["events"])
        df.coalesce(1).write.mode("overwrite").parquet(f"{p}/part{i}")

    plan = timeout_sessions_per_user(
        spark.readStream.schema(TESTDATA_SCHEMAS["events"])
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(p + "/part*"),
        gap="30 minutes",
        watermark="10 minutes",
    )
    out = replay_to_memory(spark, plan, output_mode="append")
    got = {
        (r["user_id"], r["session_start_ms"], r["session_end_ms"],
         r["n_events"], r["total_value"])
        for r in out.collect()
    }
    ms = lambda d: int(d.timestamp() * 1000)  # noqa: E731
    assert got == {
        (1, ms(t0), ms(t0 + 10 * m), 2, 5.0),  # closed by the timer
        (3, ms(t0), ms(t0), 1, 1.0),  # closed in-data by the 2h gap
        (3, ms(t0 + 120 * m), ms(t0 + 120 * m), 1, 1.0),  # timer again
        # user 2's tail stays open past the final watermark: absent
    }


def test_timeout_sessions_timer_survives_checkpoint_restart(spark, tmp_path):
    """Two availableNow runs over a shared checkpoint: run 1 leaves an
    open session in state (its timer deadline beyond the persisted
    watermark); run 2's only new event belongs to ANOTHER user but
    advances the watermark past that deadline — the restored timer must
    fire and emit the run-1 session from recovered state (X1 for timer
    state, not just aggregates)."""
    from amazon_kinesis_analytics_streaming_etl_spark.streaming.stateful import (
        timeout_sessions_per_user,
    )

    p = str(tmp_path / "ev")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    t0 = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    os.makedirs(p)

    def run_once():
        plan = timeout_sessions_per_user(
            _stream(spark, p), gap="30 minutes", watermark="10 minutes"
        )
        q = (
            plan.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # Run 1: user 1's pair, nothing else -> watermark persists at t0,
    # session stays open in state with its timer at t0+40min.
    spark.createDataFrame(
        [_ev(1, t0, user=1, value=2.0), _ev(2, t0 + 10 * m, user=1, value=3.0)],
        TESTDATA_SCHEMAS["events"],
    ).coalesce(1).write.mode("append").parquet(p)
    run_once()
    before = spark.read.schema(
        "user_id long, session_start_ms long, session_end_ms long, "
        "n_events long, total_value double"
    ).parquet(sink)
    assert before.count() == 0  # nothing closed yet

    # Run 2: user 2 at t0+3h pushes the watermark to t0+2h50 > t0+40min.
    spark.createDataFrame(
        [_ev(3, t0 + 180 * m, user=2, value=4.0)], TESTDATA_SCHEMAS["events"]
    ).coalesce(1).write.mode("append").parquet(p)
    run_once()

    got = {
        (r["user_id"], r["session_start_ms"], r["session_end_ms"],
         r["n_events"], r["total_value"])
        for r in spark.read.parquet(sink).collect()
    }
    ms = lambda d: int(d.timestamp() * 1000)  # noqa: E731
    assert got == {(1, ms(t0), ms(t0 + 10 * m), 2, 5.0)}


def test_timeout_sessions_exact_gap_boundary_stays_merged(spark, tmp_path):
    """Events exactly gap-apart stay in ONE session (close condition is
    strictly greater-than, matching the oracle's `> INTERVAL`), and one
    millisecond past the gap splits."""
    from amazon_kinesis_analytics_streaming_etl_spark.streaming.stateful import (
        timeout_sessions_per_user,
    )

    p = str(tmp_path / "ev")
    t0 = dt.datetime(2024, 1, 1)
    gap = dt.timedelta(minutes=30)
    one_ms = dt.timedelta(milliseconds=1)
    rows = [
        _ev(1, t0, user=1),
        _ev(2, t0 + gap, user=1),            # exactly 30min later: merge
        _ev(3, t0, user=2),
        _ev(4, t0 + gap + one_ms, user=2),   # 30min + 1ms: split
        # sentinel far ahead so every earlier session times out
        _ev(5, t0 + dt.timedelta(days=1), user=99),
    ]
    _write_events(spark, p, rows)
    plan = timeout_sessions_per_user(
        _stream(spark, p), gap="30 minutes", watermark="10 minutes"
    )
    out = replay_to_memory(spark, plan, output_mode="append")
    rows_out = out.collect()
    u1 = [r for r in rows_out if r["user_id"] == 1]
    assert len(u1) == 1 and u1[0]["n_events"] == 2  # merged at the boundary
    u2 = [r for r in rows_out if r["user_id"] == 2]
    assert len(u2) == 2 and all(r["n_events"] == 1 for r in u2)  # split past it


def test_timeout_sessions_cross_batch_straggler_semantics(spark, tmp_path):
    """Cross-batch stragglers vs the OPEN session: an in-gap earlier
    event must extend session_start_ms BACKWARD; an out-of-gap earlier
    event is its own (already provably closed) session — it must never
    silently merge into the open one. Null-ts rows are unwindowable and
    are ignored entirely."""
    from amazon_kinesis_analytics_streaming_etl_spark.streaming.stateful import (
        timeout_sessions_per_user,
    )

    p = str(tmp_path / "ev")
    t0 = dt.datetime(2024, 1, 1, 12, 30)
    m = dt.timedelta(minutes=1)
    os.makedirs(p)
    batches = [
        # open sessions at 12:30 for users 1 and 3
        [_ev(1, t0, user=1, value=1.0), _ev(2, t0, user=3, value=1.0)],
        # stragglers (watermark is 12:30 - 2h = 10:30, both survive):
        # u1 at 11:35 = 55min before the open start -> OWN session;
        # u3 at 12:10 = 20min before start (within 30min gap) -> merge,
        # start extends backward; u3 null-ts row must be ignored
        [
            _ev(3, t0 - 55 * m, user=1, value=2.0),
            _ev(4, t0 - 20 * m, user=3, value=2.0),
            _ev(5, None, user=3, value=99.0),
        ],
        # sentinel far ahead: every earlier session times out
        [_ev(9, t0 + dt.timedelta(days=2), user=99, value=0.0)],
    ]
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, TESTDATA_SCHEMAS["events"])
        df.coalesce(1).write.mode("overwrite").parquet(f"{p}/part{i}")
    plan = timeout_sessions_per_user(
        spark.readStream.schema(TESTDATA_SCHEMAS["events"])
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(p + "/part*"),
        gap="30 minutes",
        watermark="2 hours",
    )
    out = replay_to_memory(spark, plan, output_mode="append")
    ms = lambda d: int(d.timestamp() * 1000)  # noqa: E731
    got = {
        (r["user_id"], r["session_start_ms"], r["session_end_ms"],
         r["n_events"], r["total_value"])
        for r in out.collect()
    }
    assert got == {
        (1, ms(t0 - 55 * m), ms(t0 - 55 * m), 1, 2.0),  # own session
        (1, ms(t0), ms(t0), 1, 1.0),
        (3, ms(t0 - 20 * m), ms(t0), 2, 3.0),  # start extended backward
    }


def test_streaming_percentiles_all_null_key_emits_no_row(spark, tmp_path):
    """A key whose values are all null must produce NO snapshot row (not
    an n=0/NaN row) and no empty state; a sibling key with real values
    still reports."""
    from amazon_kinesis_analytics_streaming_etl_spark.streaming.stateful import (
        streaming_percentiles_per_key,
    )

    p = str(tmp_path / "ev")
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        _ev(1, t0, user=1, value=None, etype="nulls_only"),
        _ev(2, t0, user=2, value=None, etype="nulls_only"),
        _ev(3, t0, user=3, value=5.0, etype="real"),
    ]
    _write_events(spark, p, rows)
    plan = streaming_percentiles_per_key(_stream(spark, p))
    out = replay_to_memory(spark, plan, output_mode="append")
    rows_out = out.collect()
    assert {r["event_type"] for r in rows_out} == {"real"}
    (r,) = [r for r in rows_out if r["event_type"] == "real"]
    assert r["n"] == 1 and r["est_p50"] == 5.0
