"""Streaming operators exposed as oracle-checkable queries.

Each query REALLY runs Structured Streaming: a bounded file-source stream
over the ``events`` parquet (deterministic replay), the streaming
transformation under test, availableNow trigger, memory sink — then the
drained result is returned as a batch DataFrame that a batch SQL oracle
can check. This is the SURVEY.md §5 strategy: streaming semantics
verified by deterministic micro-batch replay.

Output-mode note: windowed aggregations run in ``complete`` mode here so
the final state is fully emitted at end-of-stream (append mode would
withhold windows newer than the watermark — correct for unbounded
production streams, not for a bounded replay compared against a batch
oracle). Production pipelines use append + watermark; state-bounding is
exercised in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import load_events_stream, read_sf_parquet
from ..streaming.windows import (
    replay_to_memory,
    session_window_agg,
    sliding_window_agg,
    streaming_dedup,
    stream_static_join,
    stream_stream_interval_join,
    tumbling_window_agg,
)
from .relational import register


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_events_stream(spark, sf_dir)


_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


@register(
    "stream_tumbling_counts",
    f"""
    SELECT strftime(date_trunc('hour', ts), '{_TS_FMT_DUCK}') AS window_start,
           event_type,
           count(*) AS n,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event_type (streaming
    execution; batch oracle = date_trunc group-by)."""
    plan = tumbling_window_agg(
        _events_stream(spark, sf_dir),
        ts_col="ts",
        window_size="1 hour",
        watermark="1 hour",
        group_cols=["event_type"],
        aggs=[F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value")],
    )
    out = replay_to_memory(spark, plan, output_mode="complete")
    return out.select(
        F.date_format("window_start", _TS_FMT_SPARK).alias("window_start"),
        "event_type",
        "n",
        "sum_value",
    )


@register(
    "stream_sliding_counts",
    f"""
    WITH starts AS (
      SELECT date_trunc('hour', ts)                     AS ws, event_type FROM events
      UNION ALL
      SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR   AS ws, event_type FROM events
    )
    SELECT strftime(ws, '{_TS_FMT_DUCK}') AS window_start, event_type, count(*) AS n
    FROM starts
    GROUP BY 1, 2
    """,
)
def stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (2h size, 1h slide): every event lands in two
    windows; the oracle materializes both window-starts per event."""
    plan = sliding_window_agg(
        _events_stream(spark, sf_dir),
        ts_col="ts",
        window_size="2 hours",
        slide="1 hour",
        watermark="1 hour",
        group_cols=["event_type"],
        aggs=[F.count("*").alias("n")],
    )
    out = replay_to_memory(spark, plan, output_mode="complete")
    return out.select(
        F.date_format("window_start", _TS_FMT_SPARK).alias("window_start"),
        "event_type",
        "n",
    )


@register(
    "stream_session_windows",
    f"""
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
      FROM events
    ), sess AS (
      SELECT user_id, ts,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      FROM ordered
    )
    SELECT user_id,
           strftime(min(ts), '{_TS_FMT_DUCK}')                         AS window_start,
           strftime(max(ts) + INTERVAL 30 MINUTE, '{_TS_FMT_DUCK}')    AS window_end,
           count(*) AS n
    FROM sess
    GROUP BY user_id, sess_id
    """,
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute gap per user (streaming state
    merge). Oracle: classic islands construction with lag + running sum.
    Spark's session end = last event + gap."""
    plan = session_window_agg(
        _events_stream(spark, sf_dir),
        ts_col="ts",
        gap="30 minutes",
        watermark="1 hour",
        group_cols=["user_id"],
        aggs=[F.count("*").alias("n")],
    )
    out = replay_to_memory(spark, plan, output_mode="complete")
    return out.select(
        "user_id",
        F.date_format("window_start", _TS_FMT_SPARK).alias("window_start"),
        F.date_format("window_end", _TS_FMT_SPARK).alias("window_end"),
        "n",
    )


@register(
    "stream_dedup_users",
    """
    SELECT event_type, count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    """,
)
def stream_dedup_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup on (event_type, user_id): first event per
    pair survives; counting survivors per type == batch count-distinct.
    (dropDuplicates state is watermark-bounded in production.)"""
    stream = _events_stream(spark, sf_dir)
    deduped = stream.withWatermark("ts", "100 days").dropDuplicates(
        ["event_type", "user_id"]
    )
    out = replay_to_memory(spark, deduped, output_mode="append")
    return out.groupBy("event_type").agg(F.countDistinct("user_id").alias("n_users"))


@register(
    "stream_stateful_running_totals",
    """
    SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
    FROM events
    GROUP BY user_id
    """,
)
def stream_stateful_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom per-key state machine via applyInPandasWithState (Arrow
    batches over the state store). Single-batch replay => emitted running
    totals equal the batch aggregate; multi-batch accumulation is pinned
    in tests."""
    from ..streaming.stateful import running_totals_per_key

    plan = running_totals_per_key(_events_stream(spark, sf_dir))
    out = replay_to_memory(spark, plan, output_mode="append")
    return out.select(
        "user_id", "n_events", F.round(F.col("total_value"), 2).alias("total_value")
    )


@register(
    "stream_stream_join_conversions",
    f"""
    SELECT c.event_id AS click_id, c.user_id,
           strftime(c.ts, '{_TS_FMT_DUCK}') AS click_ts,
           strftime(p.ts, '{_TS_FMT_DUCK}') AS purchase_ts,
           round(p.value, 2) AS purchase_value
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
)
def stream_stream_join_conversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: purchases within 30 minutes after a
    click, per user — two independent file-source streams, watermark-
    bounded join state, batch range-join oracle."""
    clicks = (
        _events_stream(spark, sf_dir)
        .where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("c_ts")
        )
    )
    purchases = (
        _events_stream(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"), "value")
    )
    joined = stream_stream_interval_join(
        clicks,
        purchases,
        key=F.col("user_id") == F.col("p_user"),
        left_ts="c_ts",
        right_ts="p_ts",
        interval="30 MINUTES",
        watermark="1 hour",
    )
    # shuffle_partitions=2: the interval join keeps TWO state stores per
    # partition per batch; at replay scale the extra partitions are pure
    # bookkeeping (profiled: the query's cost is otherwise dominated by
    # one-time streaming warm-up, not data volume — slicing the input
    # changed nothing, halving state stores did).
    out = replay_to_memory(spark, joined, output_mode="append", shuffle_partitions=2)
    return out.select(
        "click_id",
        "user_id",
        F.date_format("c_ts", _TS_FMT_SPARK).alias("click_ts"),
        F.date_format("p_ts", _TS_FMT_SPARK).alias("purchase_ts"),
        F.round("value", 2).alias("purchase_value"),
    )


@register(
    "stream_incremental_topk",
    """
    SELECT event_type, CAST(rank AS BIGINT) AS rank, event_id,
           round(value, 2) AS value
    FROM (SELECT event_type, event_id, value,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY value DESC, event_id) AS rank
          FROM events)
    WHERE rank <= 10
    """,
)
def stream_incremental_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental top-k as a custom stateful operator: per event_type
    the state holds only the current top-10 (O(k), not the stream);
    every micro-batch merges and re-emits the snapshot. The final
    snapshot per key equals the batch window-rank oracle."""
    from ..streaming.stateful import streaming_topk_per_key

    from pyspark.sql import Window as W

    plan = streaming_topk_per_key(_events_stream(spark, sf_dir), k=10)
    out = replay_to_memory(spark, plan, output_mode="append")
    # A multi-batch replay appends one snapshot per batch. The final
    # top-k == re-ranking the DISTINCT union of all snapshots: any row a
    # later batch displaced is outranked by the displacing rows, which
    # the last snapshot necessarily emitted. (Deterministic, unlike
    # picking "the last" rows from an unordered memory table.)
    rw = W.partitionBy("event_type").orderBy(F.col("value").desc(), "event_id")
    return (
        out.select("event_type", "event_id", "value")
        .distinct()
        .withColumn("rank", F.row_number().over(rw))
        .where(F.col("rank") <= 10)
        .select("event_type", "rank", "event_id", F.round("value", 2).alias("value"))
    )


@register(
    "stream_static_enrich",
    """
    SELECT c_mktsegment, count(*) AS n,
           round(CAST(CAST(sum(value) AS REAL) AS DOUBLE), 2) AS sum_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast join (the streaming twin of
    join_enrich_events): per micro-batch the static dim is broadcast;
    the stream side never shuffles for the join."""
    stream = _events_stream(spark, sf_dir)
    dim = read_sf_parquet(spark, sf_dir, "customer")
    joined = stream_static_join(
        stream, F.broadcast(dim), stream.user_id == dim.c_custkey
    )
    agged = joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        # f32-squash (repo drift-sum convention): ~20k doubles per
        # segment accumulate in different orders across engines; the
        # largest-group stored-double sum in the streaming family.
        F.round(F.sum("value").cast("float").cast("double"), 2).alias("sum_value"),
    )
    return replay_to_memory(spark, agged, output_mode="complete")


@register(
    "stream_chained_agg",
    f"""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h, date_trunc('day', ts) AS d,
             event_type, count(*) AS n
      FROM events GROUP BY 1, 2, 3
    )
    SELECT strftime(d, '{_TS_FMT_DUCK}') AS day_start, event_type,
           CAST(max(n) AS BIGINT) AS max_hourly, CAST(sum(n) AS BIGINT) AS n_day
    FROM hourly
    WHERE d + INTERVAL 1 DAY <= (SELECT max(ts) FROM events)
    GROUP BY 1, 2
    """,
)
def stream_chained_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHAINED stateful aggregations in one streaming query (Spark 3.4+
    multiple-stateful-operator support): tumbling 1-hour counts per
    event_type feed a second windowed aggregation that rolls them up to
    per-day max/sum — the streaming form of a pre-aggregation pyramid
    (hourly tier materialized once, daily tier derived from it without
    rescanning raw events; at 100 TB the raw stream is touched exactly
    once).

    Runs in APPEND mode (unlike the complete-mode single-agg queries):
    hour windows emit downstream only when the watermark passes them, so
    this query also pins watermark PROPAGATION through a stateful
    operator. With a 0-second delay the final no-data batch flushes every
    window except those still above the last watermark = max(ts) — i.e.
    the trailing partial day is withheld, and the oracle mirrors exactly
    that with its `d + 1 day <= max(ts)` predicate."""
    stream = _events_stream(spark, sf_dir)
    hourly = (
        stream.withWatermark("ts", "0 seconds")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    daily = (
        hourly.groupBy(
            F.window(F.window_time("win"), "1 day").alias("dwin"), "event_type"
        )
        .agg(F.max("n").alias("max_hourly"), F.sum("n").cast("long").alias("n_day"))
    )
    out = replay_to_memory(spark, daily, output_mode="append")
    return out.select(
        F.date_format("dwin.start", _TS_FMT_SPARK).alias("day_start"),
        "event_type",
        "max_hourly",
        "n_day",
    )


@register(
    "stream_left_outer_join",
    f"""
    WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
         p AS (SELECT user_id AS p_user, ts AS p_ts, value
               FROM events WHERE event_type = 'purchase'),
         wm AS (SELECT date_trunc('milliseconds', least(
                  (SELECT max(ts) FROM events WHERE event_type = 'click'),
                  (SELECT max(ts) FROM events WHERE event_type = 'purchase')))
                AS w)
    SELECT c.event_id AS click_id, c.user_id,
           strftime(c.ts, '{_TS_FMT_DUCK}') AS click_ts,
           strftime(p_ts, '{_TS_FMT_DUCK}') AS purchase_ts,
           round(value, 2) AS purchase_value
    FROM c LEFT JOIN p
      ON c.user_id = p_user
     AND p_ts >= c.ts AND p_ts <= c.ts + INTERVAL 30 MINUTE
    WHERE p_ts IS NOT NULL
       OR c.ts + INTERVAL 30 MINUTE < (SELECT w FROM wm)
    """,
)
def stream_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every click, matched with
    purchases in the following 30 minutes OR null-extended if none came.
    Outer results cannot emit eagerly — a click's null row is correct
    only once the watermark proves no purchase can still arrive in its
    window, so null rows surface when the watermark passes
    click_ts + 30min and the join state for that row is evicted; clicks
    near the end of the bounded replay stay unresolved in state.

    The oracle carries the engine's EXACT finalization cutoff: each
    side's watermark node sits over its own filtered stream (this is
    also where Catalyst lands if the filter is written after
    withWatermark — predicate pushdown moves it below the event-time
    node), so the query's global watermark is min(max click ts,
    max purchase ts), millisecond-truncated the way event-time
    watermarks are. A click's null row appears iff click_ts + 30min <
    that value — verified empirically: the unmatched click BETWEEN the
    two side maxima is retained in state, not emitted."""
    clicks = (
        _events_stream(spark, sf_dir)
        .where(F.col("event_type") == "click")
        .withWatermark("ts", "0 seconds")
        .select(
            F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("c_ts")
        )
    )
    purchases = (
        _events_stream(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .withWatermark("ts", "0 seconds")
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"), "value")
    )
    cond = (
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTES"))
    )
    joined = clicks.join(purchases, cond, "left_outer")
    out = replay_to_memory(spark, joined, output_mode="append", shuffle_partitions=2)
    return out.select(
        "click_id",
        "user_id",
        F.date_format("c_ts", _TS_FMT_SPARK).alias("click_ts"),
        F.date_format("p_ts", _TS_FMT_SPARK).alias("purchase_ts"),
        F.round("value", 2).alias("purchase_value"),
    )


@register(
    "stream_anomaly_flags",
    """
    WITH w AS (
      SELECT event_id, event_type, value,
             count(*) OVER pw AS pn,
             sum(value) OVER pw AS ps,
             sum(value * value) OVER pw AS ps2
      FROM events
      WINDOW pw AS (PARTITION BY event_type ORDER BY event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), z AS (
      SELECT event_id, event_type, round(value, 2) AS value,
             (value - ps / pn)
               / sqrt(greatest(ps2 / pn - (ps / pn) ** 2, 0)) AS zs,
             sqrt(greatest(ps2 / pn - (ps / pn) ** 2, 0)) AS sd, pn
      FROM w
    )
    SELECT event_id, event_type, value, round(zs + 0.00000001, 3) AS zscore
    FROM z
    WHERE pn >= 30 AND sd > 0.000000000001 AND abs(zs) > 3.0
    ORDER BY event_id
    """,
)
def stream_anomaly_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming anomaly detection as a custom stateful operator
    (streaming/stateful.streaming_anomaly_flags): O(1) mergeable-moments
    state per key, each event z-scored against its key's STRICTLY PRIOR
    distribution (30-event warm-up, |z| > 3 flags). The batch oracle is
    the same math as prior-frame window sums (ROWS ... 1 PRECEDING) in
    event_id order — the order the operator pins within each batch, so
    replay and oracle agree row for row."""
    from ..streaming.stateful import streaming_anomaly_flags

    plan = streaming_anomaly_flags(_events_stream(spark, sf_dir))
    out = replay_to_memory(spark, plan, output_mode="append")
    return out.select(
        "event_id",
        "event_type",
        F.round("value", 2).alias("value"),
        F.round(F.col("zscore") + F.lit(0.00000001), 3).alias("zscore"),
    ).orderBy("event_id")


@register(
    "stream_cdc_latest",
    """
    SELECT user_id, event_id AS version, event_type AS last_type,
           round(value, 2) AS last_value
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY event_id DESC) AS rn
          FROM events)
    WHERE rn = 1 ORDER BY user_id
    """,
)
def stream_cdc_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC upsert view (streaming/stateful.streaming_cdc_latest):
    per user, O(1) state holding only the highest-versioned row
    (event_id as the change version), re-emitted as a snapshot each
    micro-batch — the stream analog of cdc_merge_customers' MERGE-into-
    latest. Monotone version comparison makes arrival order irrelevant
    and replays idempotent. The per-batch snapshots are reduced to the
    final view with max_by on the version (robust to multi-batch
    replays); oracle = argmax per key."""
    from ..streaming.stateful import streaming_cdc_latest

    plan = streaming_cdc_latest(_events_stream(spark, sf_dir))
    out = replay_to_memory(spark, plan, output_mode="append")
    snap = out.groupBy("user_id").agg(
        F.max("event_id").alias("version"),
        F.max_by("event_type", "event_id").alias("last_type"),
        F.round(F.max_by("value", "event_id"), 2).alias("last_value"),
    )
    return snap.orderBy("user_id")


@register(
    "stream_tdigest_percentiles",
    """
    SELECT event_type,
           CAST(count(value) AS BIGINT)         AS n,
           round(quantile_cont(value, 0.50), 4) AS exact_p50,
           round(quantile_cont(value, 0.95), 4) AS exact_p95,
           TRUE AS p50_ok,
           TRUE AS p95_ok
    FROM events
    GROUP BY event_type
    """,
)
def stream_tdigest_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-key quantile monitor (streaming/stateful.py
    streaming_percentiles_per_key): per-event_type t-digest state,
    re-compressed to O(delta) centroids every micro-batch — the
    latency-dashboard shape where exact per-window percentiles would
    buffer the whole stream. Final snapshot per key (highest-n row, n is
    monotone) gated like sketch_tdigest_rollup: digest n crosses engines
    exactly, est p50/p95 land inside the exact [q45,q55]/[q93,q97]
    windows computed batch-side."""
    from ..schemas import load_events
    from ..streaming.stateful import streaming_percentiles_per_key

    plan = streaming_percentiles_per_key(_events_stream(spark, sf_dir))
    out = replay_to_memory(spark, plan, output_mode="append")
    last = out.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max_by("est_p50", "n").alias("est_p50"),
        F.max_by("est_p95", "n").alias("est_p95"),
    )
    # ONE percentile buffer for all six quantiles (array form) instead
    # of six per-group value-multiset buffers — the sketch_tdigest_rollup
    # exact-side optimization (guide §1.2); elements are bit-identical
    # to the scalar calls.
    qs = F.percentile(
        "value",
        F.array(*[F.lit(x) for x in (0.50, 0.95, 0.45, 0.55, 0.93, 0.97)]),
    )
    exact = (
        load_events(spark, sf_dir)
        .groupBy("event_type")
        .agg(qs.alias("_qs"))
        .select(
            "event_type",
            F.round(F.element_at("_qs", 1), 4).alias("exact_p50"),
            F.round(F.element_at("_qs", 2), 4).alias("exact_p95"),
            F.element_at("_qs", 3).alias("_q45"),
            F.element_at("_qs", 4).alias("_q55"),
            F.element_at("_qs", 5).alias("_q93"),
            F.element_at("_qs", 6).alias("_q97"),
        )
    )
    j = last.join(exact, "event_type")
    return j.select(
        "event_type",
        "n",
        "exact_p50",
        "exact_p95",
        (
            (F.col("est_p50") >= F.col("_q45")) & (F.col("est_p50") <= F.col("_q55"))
        ).alias("p50_ok"),
        (
            (F.col("est_p95") >= F.col("_q93")) & (F.col("est_p95") <= F.col("_q97"))
        ).alias("p95_ok"),
    )


@register(
    "stream_timeout_sessions",
    f"""
    WITH ordered AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
      FROM events
    ), sess AS (
      SELECT user_id, ts, value,
             -- event_id tie-break: same-ts peers must order the same way
             -- the new_sess lag did, or a boundary row's peer could land
             -- in the previous session (sessionize_events precedent)
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      FROM ordered
    ), agg AS (
      SELECT user_id, sess_id,
             min(ts) AS s_start, max(ts) AS s_end,
             count(*) AS n_events, round(sum(value), 2) AS total_value
      FROM sess GROUP BY user_id, sess_id
    ), wm AS (SELECT max(ts) - INTERVAL 60 MINUTE AS w FROM events)
    SELECT user_id,
           strftime(s_start, '{_TS_FMT_DUCK}') AS session_start,
           strftime(s_end, '{_TS_FMT_DUCK}') AS session_end,
           n_events, total_value
    FROM agg, wm
    -- ANY session whose deadline has not passed the final watermark is
    -- withheld, not only the user's last: while w <= s_end + gap a
    -- straggler in (s_end, s_end + gap] could still extend it or bridge
    -- it into its successor, so append mode cannot have emitted it.
    -- (Round 8: the operator was fixed to hold ALL pending sessions —
    -- tests/test_timeout_sessions_property.py — and the oracle's old
    -- last-session-only exclusion was the matching approximation.)
    WHERE s_end + INTERVAL 30 MINUTE < w
    """,
)
def stream_timeout_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom session windows via EVENT-TIME TIMERS
    (streaming/stateful.py timeout_sessions_per_user): per-user state
    machine closing sessions either in-data (a successor event past the
    30-minute gap) or by `GroupStateTimeout.EventTimeTimeout` once the
    watermark passes last+gap — the timer fires in Spark's final no-data
    micro-batch of the availableNow replay. Append-mode contract: every
    session whose deadline (end + gap) has not passed the final
    watermark (max ts - 1h delay) is still mutable by stragglers and is
    deliberately NOT emitted — the open tail and any late-ending closed
    candidates alike; the oracle's islands construction excludes exactly
    those sessions (strict `<` fire condition mirrored as `>=`
    keep-open). total_value sums the same doubles in both engines,
    rounded to 2."""
    from ..streaming.stateful import timeout_sessions_per_user

    plan = timeout_sessions_per_user(
        _events_stream(spark, sf_dir), gap="30 minutes", watermark="1 hour"
    )
    out = replay_to_memory(spark, plan, output_mode="append")
    return out.select(
        "user_id",
        F.date_format(
            F.timestamp_millis(F.col("session_start_ms")), _TS_FMT_SPARK
        ).alias("session_start"),
        F.date_format(
            F.timestamp_millis(F.col("session_end_ms")), _TS_FMT_SPARK
        ).alias("session_end"),
        "n_events",
        F.round("total_value", 2).alias("total_value"),
    )


@register(
    "stream_daily_distinct_users",
    f"""
    SELECT strftime(date_trunc('day', ts), '{_TS_FMT_DUCK}') AS day_start,
           event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    WHERE date_trunc('day', ts) + INTERVAL 1 DAY
          <= (SELECT max(ts) FROM events)
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def stream_daily_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed DISTINCT counting in a stream — the DAU panel. Distinct
    aggregates are unsupported in streaming, so the streaming-native
    form is dropDuplicates on (type, user, day) with a watermark (state
    = one tombstone per distinct triple, watermark-evicted) feeding a
    plain tumbling count — two chained stateful operators, exactly-once
    per triple. Append mode: the trailing partial day is withheld and
    the oracle mirrors with its `day + 1 <= max(ts)` predicate (the
    stream_chained_agg precedent)."""
    stream = _events_stream(spark, sf_dir)
    wm = stream.withWatermark("ts", "0 seconds")
    deduped = wm.select(
        "event_type", "user_id", "ts", F.date_trunc("day", "ts").alias("d")
    ).dropDuplicates(["event_type", "user_id", "d"])
    daily = deduped.groupBy(
        F.window("ts", "1 day").alias("dwin"), "event_type"
    ).agg(F.count("*").cast("long").alias("n_users"))
    out = replay_to_memory(spark, daily, output_mode="append")
    return out.select(
        F.date_format("dwin.start", _TS_FMT_SPARK).alias("day_start"),
        "event_type",
        "n_users",
    ).orderBy("day_start", "event_type")


@register(
    "stream_dynamic_gap_sessions",
    f"""
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'purchase' THEN 60 ELSE 30 END AS gm
      FROM events
    ),
    o AS (
      SELECT user_id, ts, event_id, gm,
             max(ts + INTERVAL 1 MINUTE * gm) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS prev_end
      FROM g
    ),
    marked AS (
      SELECT user_id, ts, event_id, gm,
             CASE WHEN prev_end IS NULL OR ts > prev_end THEN 1 ELSE 0 END
               AS new_sess
      FROM o
    ),
    sess AS (
      -- cumsum MUST use the same (ts, event_id) order as prev_end's
      -- window: with ts-only ordering, an equal-ts sibling of a
      -- session-start row can nondeterministically land in the
      -- previous session
      SELECT user_id, ts, gm,
             sum(new_sess) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS sid
      FROM marked
    )
    SELECT user_id,
           strftime(min(ts), '{_TS_FMT_DUCK}') AS window_start,
           strftime(max(ts + INTERVAL 1 MINUTE * gm), '{_TS_FMT_DUCK}')
             AS window_end,
           count(*) AS n
    FROM sess GROUP BY user_id, sid
    """,
)
def stream_dynamic_gap_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC-gap session windows (Spark 3.2+ `session_window` with a
    gap EXPRESSION): purchases extend their session by 60 minutes,
    everything else by 30 — the per-event-engagement session model a
    constant gap can't express. Engine semantics pinned empirically and
    mirrored in the oracle's islands construction: an event at exactly
    the current session end MERGES (inclusive boundary), the session
    end is max(ts_i + gap_i) — a running max over the ordered prefix,
    NOT last_ts + last_gap (a short-gap straggler must not shrink the
    end a purchase already extended). State bounds identical to the
    static-gap session window."""
    stream = _events_stream(spark, sf_dir)
    gap = F.when(
        F.col("event_type") == "purchase", F.lit("60 minutes")
    ).otherwise(F.lit("30 minutes"))
    plan = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
    )
    out = replay_to_memory(spark, plan, output_mode="complete")
    return out.select(
        "user_id",
        F.date_format("w.start", _TS_FMT_SPARK).alias("window_start"),
        F.date_format("w.end", _TS_FMT_SPARK).alias("window_end"),
        "n",
    )


@register(
    "stream_dedup_within_watermark",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded streaming dedup via Spark 3.5+'s
    ``dropDuplicatesWithinWatermark`` — the at-least-once-ingest
    repair: the source is unioned with a +10-minute-shifted duplicate
    of itself (same event_id, the redelivery model), and the operator
    keeps ONE row per event_id among duplicates arriving within the
    1-hour watermark delay, evicting state once the watermark passes —
    bounded state where plain ``dropDuplicates`` would hold every key
    forever. The oracle is the clean per-type aggregate of the
    un-duplicated table (every duplicate is within the delay by
    construction, so exactly the original multiset survives); count and
    value are duplicate-copy-invariant, so which copy survives a tie is
    immaterial.

    Scale shape: dedup state is one tombstone per event_id within the
    watermark horizon (time-bounded, unlike the 100-day dropDuplicates
    in stream_dedup_users which models a bounded replay); the downstream
    per-type rollup is a tiny shuffle."""
    base = _events_stream(spark, sf_dir)
    shifted = _events_stream(spark, sf_dir).withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 10 MINUTES")
    )
    dup_stream = base.unionByName(shifted)
    deduped = dup_stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    out = replay_to_memory(spark, deduped, output_mode="append")
    return (
        out.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# round 9 (late window): streaming geo hotspots (windowed grid-cell counts)
# --------------------------------------------------------------------------

def _geo_cell_sqls() -> tuple[str, str]:
    """(duckdb_sql, spark_sql) for the 0.05-degree grid-cell key over
    md5-derived coordinates — shared text from functions/geo.py so the
    streaming plan and the batch oracle bucket identically."""
    from ..functions import geo

    key = "CAST(event_id AS STRING)"
    cell = geo.cell_expr(geo.lat_expr(key), geo.lon_expr(key), 0.05)
    return cell, geo.spark_expr(cell)


_GEO_CELL_DUCK, _GEO_CELL_SPARK = _geo_cell_sqls()


@register(
    "stream_geo_hotspots",
    f"""
    WITH c AS (
      SELECT strftime(date_trunc('hour', ts), '{_TS_FMT_DUCK}')
               AS window_start,
             {_GEO_CELL_DUCK} AS cell,
             count(*) AS n
      FROM events
      GROUP BY 1, 2
    )
    SELECT window_start, cell, n
    FROM c
    ORDER BY n DESC, window_start, cell
    LIMIT 20
    """,
)
def stream_geo_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming spatial hotspots: tumbling 1-hour event-time windows per
    0.05-degree grid cell — the live pickup-heatmap a taxi dispatch
    dashboard tails. The cell key is the same engine-neutral expression
    the batch geo family uses (functions/geo.py), derived map-side
    BEFORE the windowed aggregation, so streaming state is keyed on
    (window, cell) — bounded by active-city-area x watermark horizon,
    never by raw traffic. Complete-mode replay per module convention;
    production runs append + 1h watermark and state stays bounded.
    Batch oracle: date_trunc group-by over the same derived cells."""
    ev = _events_stream(spark, sf_dir)
    cells = ev.select("ts", F.expr(_GEO_CELL_SPARK).alias("cell"))
    plan = tumbling_window_agg(
        cells,
        ts_col="ts",
        window_size="1 hour",
        watermark="1 hour",
        group_cols=["cell"],
        aggs=[F.count("*").alias("n")],
    )
    out = replay_to_memory(spark, plan, output_mode="complete")
    return (
        out.select(
            F.date_format("window_start", _TS_FMT_SPARK).alias("window_start"),
            "cell",
            "n",
        )
        .orderBy(F.col("n").desc(), "window_start", "cell")
        .limit(20)
    )
