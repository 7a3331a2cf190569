"""Product-analytics query family (round 2): funnel conversion, cohort
retention, time-series gap-fill with forward fill, equi-width histogram,
key-skew profiling, and column profiling.

These are the event-analytics shapes the reference's dashboard story
(CloudWatch throughput/lag panels, cdk/lib/streaming-etl.ts:245-388)
generalizes to once the events land in partitioned Parquet (K1/K3):
every query here runs over the persisted output of the ETL path, each
with a DuckDB oracle twin.

Scale posture (common): each query is one shuffle on its natural key
(user_id / group key); window functions share the shuffle partitioning
with the aggregation that follows; the only cross joins are against
1-row scalar aggregates or bounded spines (whitelisted in
tests/test_plan_invariants.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..schemas import load_events, read_sf_parquet
from .relational import _t, register


#: The ts-family float contract, ONE definition for all nine members
#: (gapfill, resample, ewma, rolling-median, autocorr, cusum, seasonal,
#: MAD-anomaly, forecast-eval): hourly mean squashed through float32 so
#: both engines' summation orders collapse to the same value, then
#: rounded to 4dp. The SQL twin below must stay the literal mirror —
#: editing one without the other reintroduces the sf0.1 gapfill-class
#: boundary mismatch this constant exists to prevent.
_F32_HOURLY_AVG_SQL = "round(CAST(CAST(avg(value) AS REAL) AS DOUBLE), 4)"


def _f32_avg4(col: str = "value"):
    """Engine twin of ``_F32_HOURLY_AVG_SQL``."""
    return F.round(F.avg(col).cast("float").cast("double"), 4)


# --------------------------------------------------------------------------
# funnel conversion (ordered view -> click -> purchase)
# --------------------------------------------------------------------------

@register(
    "funnel_stages",
    """
    WITH e1 AS (
      SELECT user_id, event_id, ts, event_type,
             max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) OVER w AS seen_view
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), e2 AS (
      SELECT *,
             max(CASE WHEN event_type = 'click' AND seen_view = 1 THEN 1 ELSE 0 END)
               OVER w AS seen_cav
      FROM e1
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), a AS (
      SELECT count(DISTINCT user_id) AS u_all,
             count(DISTINCT CASE WHEN event_type = 'view' THEN user_id END) AS u_view,
             count(DISTINCT CASE WHEN event_type = 'click' AND seen_view = 1
                                 THEN user_id END) AS u_click,
             count(DISTINCT CASE WHEN event_type = 'purchase' AND seen_cav = 1
                                 THEN user_id END) AS u_purchase
      FROM e2
    )
    SELECT stage, n_users, round(CAST(n_users AS DOUBLE) / u_all, 6) AS pct
    FROM (
      SELECT u_all, 1 AS step, 'all_users' AS stage, u_all AS n_users FROM a
      UNION ALL SELECT u_all, 2, 'view', u_view FROM a
      UNION ALL SELECT u_all, 3, 'click_after_view', u_click FROM a
      UNION ALL SELECT u_all, 4, 'purchase_after_click', u_purchase FROM a
    ) ORDER BY step
    """,
)
def funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: users who viewed, then clicked AFTER a
    view, then purchased AFTER such a click (strict event-time order,
    (ts, event_id) total order for determinism).

    Plan: cumulative-max window flags share ONE shuffle on user_id (both
    windows use the same partitioning+ordering, Spark reuses the sort);
    the final count-distinct aggregate is a second small shuffle. No
    self-joins — the classic funnel-as-N-joins shape would be N scans
    and N shuffles; the flag form scales linearly at 100 TB."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ev = load_events(spark, sf_dir)
    e1 = ev.withColumn(
        "seen_view",
        F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).over(w),
    )
    e2 = e1.withColumn(
        "seen_cav",
        F.max(
            F.when((F.col("event_type") == "click") & (F.col("seen_view") == 1), 1)
            .otherwise(0)
        ).over(w),
    )
    a = e2.agg(
        F.countDistinct("user_id").alias("u_all"),
        F.countDistinct(
            F.when(F.col("event_type") == "view", F.col("user_id"))
        ).alias("u_view"),
        F.countDistinct(
            F.when(
                (F.col("event_type") == "click") & (F.col("seen_view") == 1),
                F.col("user_id"),
            )
        ).alias("u_click"),
        F.countDistinct(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("seen_cav") == 1),
                F.col("user_id"),
            )
        ).alias("u_purchase"),
    )
    stages = a.select(
        "u_all",
        F.expr(
            "stack(4, 1, 'all_users', u_all, 2, 'view', u_view, "
            "3, 'click_after_view', u_click, 4, 'purchase_after_click', u_purchase) "
            "AS (step, stage, n_users)"
        ),
    )
    return stages.select(
        "stage",
        "n_users",
        F.round(F.col("n_users").cast("double") / F.col("u_all"), 6).alias("pct"),
    ).orderBy("step").drop("step")


# --------------------------------------------------------------------------
# cohort retention (first-seen week x activity-week offset)
# --------------------------------------------------------------------------

@register(
    "cohort_retention",
    """
    WITH x AS (
      SELECT user_id, ts, min(ts) OVER (PARTITION BY user_id) AS first_ts
      FROM events
    ), g AS (
      SELECT strftime(date_trunc('week', first_ts), '%Y-%m-%d') AS cohort_week,
             CAST(date_diff('day', date_trunc('week', first_ts),
                            date_trunc('week', ts)) // 7 AS INT) AS week_offset,
             count(DISTINCT user_id) AS n_users
      FROM x GROUP BY 1, 2
    )
    SELECT cohort_week, week_offset, n_users,
           round(CAST(n_users AS DOUBLE)
                 / first_value(n_users) OVER (PARTITION BY cohort_week
                                              ORDER BY week_offset), 6) AS retention
    FROM g ORDER BY cohort_week, week_offset
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: cohort = ISO week of a user's first
    event; for each later week, the fraction of that cohort still
    active (distinct users), normalized to the cohort's week-0 size.

    Plan: min-over-user window = one shuffle on user_id; the rollup
    groups on (cohort, offset) — a second shuffle whose input is already
    one row per event (no blow-up); the week-0 normalization window runs
    over the AGGREGATED result (rows = cohorts x offsets, tiny at any
    scale)."""
    ev = load_events(spark, sf_dir)
    x = ev.withColumn("first_ts", F.min("ts").over(Window.partitionBy("user_id")))
    cohort = F.date_trunc("week", F.col("first_ts"))
    aweek = F.date_trunc("week", F.col("ts"))
    g = (
        x.select(
            F.date_format(cohort, "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff(aweek, cohort) / 7).cast("int").alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )
    w0 = Window.partitionBy("cohort_week").orderBy("week_offset")
    return g.select(
        "cohort_week",
        "week_offset",
        "n_users",
        F.round(
            F.col("n_users").cast("double") / F.first("n_users").over(w0), 6
        ).alias("retention"),
    ).orderBy("cohort_week", "week_offset")


# --------------------------------------------------------------------------
# hourly gap-fill + forward fill (time-series spine)
# --------------------------------------------------------------------------

@register(
    "gapfill_hourly",
    """
    WITH b AS (
      SELECT event_type, date_trunc('hour', ts) AS h, round(CAST(CAST(avg(value) AS REAL) AS DOUBLE), 4) AS v
      FROM events GROUP BY 1, 2
    ), bounds AS (
      SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
      FROM events
    ), hours AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds
    ), types AS (
      SELECT DISTINCT event_type FROM events
    ), j AS (
      SELECT t.event_type, hh.h, b.v
      FROM types t CROSS JOIN hours hh
      LEFT JOIN b ON b.event_type = t.event_type AND b.h = hh.h
    )
    SELECT event_type, strftime(h, '%Y-%m-%d %H:00') AS hour,
           round(last_value(v IGNORE NULLS)
                 OVER (PARTITION BY event_type ORDER BY h
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
             AS value_ff,
           (v IS NULL) AS gap
    FROM j ORDER BY event_type, h
    """,
)
def gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style gap-fill: a complete hourly spine per event_type
    over the observed range, left-joined to the hourly averages, gaps
    forward-filled with the last observed value (leading gaps stay
    null, faithfully in both engines).

    Plan: the heavy side is ONE hash aggregate over raw events (shuffle
    on (type, hour)); the spine is types x hours — bounded, built from a
    1-row min/max aggregate via `sequence`+`explode` (the crossJoin is
    the whitelisted 1-row-broadcast pattern); the spine-to-agg join and
    forward-fill window both run on aggregated (not raw) cardinality.

    Float determinism (sf0.1 sweep, round 7): both engines squash the
    hourly avg through float32 before the 4-dp round. Double summation
    order differs across engines by ~1 ulp; when the exact mean sits on
    a 4th-decimal boundary (58.47375 did at sf0.1) that ulp decides the
    rounded digit. float32 granularity (~4e-6 at these magnitudes)
    swamps the ulp spread, so both engines round the identical value.
    Applied to the whole hourly-avg family (gapfill/resample/ewma/
    rolling-median), which shares this aggregate."""
    ev = load_events(spark, sf_dir)
    hourly = (
        ev.groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(_f32_avg4().alias("v"))
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("h")
    )
    types = ev.select("event_type").distinct()
    spine = types.crossJoin(hours)
    j = spine.join(hourly, ["event_type", "h"], "left")
    wff = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "event_type",
        F.date_format("h", "yyyy-MM-dd HH:00").alias("hour"),
        F.round(F.last("v", ignorenulls=True).over(wff), 4).alias("value_ff"),
        F.col("v").isNull().alias("gap"),
    ).orderBy("event_type", "hour")


# --------------------------------------------------------------------------
# equi-width histogram
# --------------------------------------------------------------------------

@register(
    "histogram_extendedprice",
    """
    WITH m AS (
      SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi FROM lineitem
    )
    SELECT CAST(least(19, floor((l_extendedprice - lo) * 20.0 / (hi - lo))) AS INT)
             AS bucket,
           round(lo + CAST(least(19, floor((l_extendedprice - lo) * 20.0 / (hi - lo)))
                           AS INT) * (hi - lo) / 20.0, 2) AS lo_edge,
           count(*) AS n,
           round(sum(l_extendedprice), 2) AS total
    FROM lineitem, m
    GROUP BY 1, 2 ORDER BY bucket
    """,
)
def histogram_extendedprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-bucket equi-width histogram of l_extendedprice between the
    observed min and max. The bucket arithmetic is written as the SAME
    IEEE-double expression tree in both engines ((x-lo)*20.0/(hi-lo)),
    so boundary values bucket identically — no engine-specific
    width_bucket builtin.

    Plan: 1-row min/max aggregate broadcast onto the scan (whitelisted
    1-row BNLJ), then a hash aggregate on 20 keys with map-side partial
    aggregation — two passes over the column, zero wide shuffles."""
    li = read_sf_parquet(spark, sf_dir, "lineitem")
    m = li.agg(
        F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi")
    )
    x = F.col("l_extendedprice")
    bucket = F.least(
        F.lit(19).cast("long"),
        F.floor((x - F.col("lo")) * F.lit(20.0) / (F.col("hi") - F.col("lo"))),
    ).cast("int")
    return (
        li.crossJoin(m)
        .select(
            bucket.alias("bucket"),
            F.round(
                F.col("lo")
                + bucket.cast("int") * (F.col("hi") - F.col("lo")) / F.lit(20.0),
                2,
            ).alias("lo_edge"),
            x.alias("p"),
        )
        .groupBy("bucket", "lo_edge")
        .agg(F.count("*").alias("n"), F.round(F.sum("p"), 2).alias("total"))
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# key-skew profile (hot-key diagnostics)
# --------------------------------------------------------------------------

@register(
    "skew_key_profile",
    """
    WITH k AS (
      SELECT user_id, count(*) AS n FROM events GROUP BY user_id
    ), t AS (
      SELECT CAST(sum(n) AS DOUBLE) AS total, CAST(avg(n) AS DOUBLE) AS mean_n
      FROM k
    )
    SELECT user_id, n, round(n / total, 6) AS share, round(n / mean_n, 4) AS x_mean
    FROM k, t ORDER BY n DESC, user_id LIMIT 20
    """,
)
def skew_key_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key diagnostics: the 20 heaviest user_ids with their share of
    all events and their multiple of the mean key weight — the profile
    you run BEFORE choosing a salting factor for a skewed join/agg
    (operators/scale.py salted_agg/salted_join consume exactly this).

    Plan: one hash aggregate on the key (map-side partials absorb the
    skew — hot keys combine locally before the shuffle), a 1-row
    total/mean aggregate broadcast back (whitelisted), and a TakeOrdered
    top-20 — no global sort."""
    ev = load_events(spark, sf_dir)
    k = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    t = k.agg(
        F.sum("n").cast("double").alias("total"),
        F.avg("n").cast("double").alias("mean_n"),
    )
    return (
        k.crossJoin(t)
        .select(
            "user_id",
            "n",
            F.round(F.col("n") / F.col("total"), 6).alias("share"),
            F.round(F.col("n") / F.col("mean_n"), 4).alias("x_mean"),
        )
        .orderBy(F.col("n").desc(), "user_id")
        .limit(20)
    )


# --------------------------------------------------------------------------
# column profiling (data-quality summary)
# --------------------------------------------------------------------------

@register(
    "profile_columns",
    """
    SELECT 'o_custkey' AS col_name,
           count(*) - count(o_custkey) AS n_null,
           count(DISTINCT o_custkey) AS n_distinct,
           round(CAST(min(o_custkey) AS DOUBLE), 2) AS min_num,
           round(CAST(max(o_custkey) AS DOUBLE), 2) AS max_num,
           CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', count(*) - count(o_totalprice),
           count(DISTINCT o_totalprice),
           round(CAST(min(o_totalprice) AS DOUBLE), 2),
           round(CAST(max(o_totalprice) AS DOUBLE), 2),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*) - count(o_orderstatus),
           count(DISTINCT o_orderstatus),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           min(o_orderstatus), max(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*) - count(o_orderpriority),
           count(DISTINCT o_orderpriority),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           min(o_orderpriority), max(o_orderpriority)
    FROM orders
    ORDER BY col_name
    """,
)
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler over orders: null count, distinct count, min/max
    (typed lanes: *_num for numerics, *_str for strings) — the
    data-quality summary a curation pipeline runs on every new drop.

    Plan: ONE scan + one aggregate row computes every stat (Spark
    expands the multi-distinct internally), then a 1-row stack() fans it
    out to one row per column — vs the oracle's 4 scans. At 100 TB the
    exact multi-distinct is the knob to watch: swap count_distinct for
    approx_count_distinct when profiling, the shape is unchanged."""
    o = read_sf_parquet(spark, sf_dir, "orders")
    a = o.agg(
        F.count(F.lit(1)).alias("rows"),
        F.count("o_custkey").alias("c1"),
        F.countDistinct("o_custkey").alias("d1"),
        F.round(F.min("o_custkey").cast("double"), 2).alias("mn1"),
        F.round(F.max("o_custkey").cast("double"), 2).alias("mx1"),
        F.count("o_totalprice").alias("c2"),
        F.countDistinct("o_totalprice").alias("d2"),
        F.round(F.min("o_totalprice").cast("double"), 2).alias("mn2"),
        F.round(F.max("o_totalprice").cast("double"), 2).alias("mx2"),
        F.count("o_orderstatus").alias("c3"),
        F.countDistinct("o_orderstatus").alias("d3"),
        F.min("o_orderstatus").alias("mn3"),
        F.max("o_orderstatus").alias("mx3"),
        F.count("o_orderpriority").alias("c4"),
        F.countDistinct("o_orderpriority").alias("d4"),
        F.min("o_orderpriority").alias("mn4"),
        F.max("o_orderpriority").alias("mx4"),
    )
    null_str = F.lit(None).cast("string")
    null_num = F.lit(None).cast("double")
    rows = [
        ("o_custkey", "c1", "d1", F.col("mn1"), F.col("mx1"), null_str, null_str),
        ("o_totalprice", "c2", "d2", F.col("mn2"), F.col("mx2"), null_str, null_str),
        ("o_orderstatus", "c3", "d3", null_num, null_num, F.col("mn3"), F.col("mx3")),
        ("o_orderpriority", "c4", "d4", null_num, null_num, F.col("mn4"), F.col("mx4")),
    ]
    structs = F.array(
        *[
            F.struct(
                F.lit(name).alias("col_name"),
                (F.col("rows") - F.col(c)).alias("n_null"),
                F.col(d).alias("n_distinct"),
                mn_n.alias("min_num"),
                mx_n.alias("max_num"),
                mn_s.alias("min_str"),
                mx_s.alias("max_str"),
            )
            for name, c, d, mn_n, mx_n, mn_s, mx_s in rows
        ]
    )
    return (
        a.select(F.explode(structs).alias("s"))
        .select("s.*")
        .orderBy("col_name")
    )


# --------------------------------------------------------------------------
# rolling interval-range window features (ML feature engineering)
# --------------------------------------------------------------------------

@register(
    "rolling_window_features",
    """
    WITH e AS (
      SELECT user_id, event_id, event_type,
             date_trunc('second', ts) AS tss, value
      FROM events
    ), f AS (
      SELECT user_id, event_id, event_type,
             count(*)            OVER w AS n_7d,
             round(sum(value) OVER w, 2) AS sum_value_7d,
             round(avg(value) OVER w + 0.000001, 4) AS avg_value_7d
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY tss
                   RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, event_id, n_7d, sum_value_7d, avg_value_7d
    FROM f WHERE event_type = 'purchase' ORDER BY event_id
    """,
)
def rolling_window_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling 7-DAY features (count/sum/avg of activity in the
    trailing week at each event) — the classic time-bounded RANGE frame
    that a training-feature pipeline attaches to every example. A RANGE
    frame differs from a ROWS frame exactly when peers share a
    timestamp, and its width is wall-clock, not row-count. The +1e-6 epsilon before
    rounding the average (both sides) shifts exact .xxxx5 rounding ties
    off the boundary, where the engines' round modes differ (same device
    as agg_approx_quantiles).

    Engine note: the DataFrame API's rangeBetween is numeric-only, so
    the frame orders by epoch SECONDS (ts truncated to seconds on both
    engines first — the frame boundary then falls on identical instants,
    where DuckDB's INTERVAL arithmetic and Spark's seconds arithmetic
    agree). One shuffle on user_id, shared by the window; the purchase
    filter projects the feature rows without a second pass."""
    ev = load_events(spark, sf_dir)
    e = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.date_trunc("second", "ts").cast("long").alias("tse"),
        "value",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("tse")
        .rangeBetween(-7 * 86400, Window.currentRow)
    )
    f = e.select(
        "user_id",
        "event_id",
        "event_type",
        F.count("*").over(w).alias("n_7d"),
        F.round(F.sum("value").over(w), 2).alias("sum_value_7d"),
        F.round(F.avg("value").over(w) + F.lit(0.000001), 4).alias("avg_value_7d"),
    )
    return (
        f.where(F.col("event_type") == "purchase")
        .select("user_id", "event_id", "n_7d", "sum_value_7d", "avg_value_7d")
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# distribution drift (population stability index between time slices)
# --------------------------------------------------------------------------

@register(
    "drift_psi",
    """
    WITH m AS (SELECT min(value) AS lo, max(value) AS hi FROM events),
    b AS (
      SELECT event_type,
             CAST(least(9, floor((value - lo) * 10.0 / (hi - lo))) AS INT) AS bin,
             CASE WHEN ts < TIMESTAMP '2024-01-08' THEN 1 ELSE 0 END AS is_p,
             CASE WHEN ts >= TIMESTAMP '2024-01-22' THEN 1 ELSE 0 END AS is_q
      FROM events, m
      WHERE ts < TIMESTAMP '2024-01-08' OR ts >= TIMESTAMP '2024-01-22'
    ),
    c AS (
      SELECT event_type, bin,
             CAST(sum(is_p) AS DOUBLE) AS p_cnt,
             CAST(sum(is_q) AS DOUBLE) AS q_cnt
      FROM b GROUP BY 1, 2
    ),
    spine AS (
      SELECT DISTINCT event_type, gs.bin
      FROM events, (SELECT unnest(range(0, 10)) AS bin) gs
    ),
    f AS (
      SELECT s.event_type, s.bin,
             COALESCE(c.p_cnt, 0) AS p_cnt, COALESCE(c.q_cnt, 0) AS q_cnt
      FROM spine s LEFT JOIN c ON s.event_type = c.event_type AND s.bin = c.bin
    ),
    t AS (SELECT event_type, sum(p_cnt) AS pt, sum(q_cnt) AS qt FROM f GROUP BY 1)
    SELECT f.event_type,
           round(sum(((f.p_cnt + 0.5) / (t.pt + 5.0) - (f.q_cnt + 0.5) / (t.qt + 5.0))
                     * ln(((f.p_cnt + 0.5) / (t.pt + 5.0))
                          / ((f.q_cnt + 0.5) / (t.qt + 5.0)))), 5) AS psi,
           CAST(sum(f.p_cnt) AS BIGINT) AS n_baseline,
           CAST(sum(f.q_cnt) AS BIGINT) AS n_current
    FROM f JOIN t ON f.event_type = t.event_type
    GROUP BY f.event_type ORDER BY f.event_type
    """,
)
def drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event_type between a baseline week
    (before Jan 8) and a current week (Jan 22 on) — the standard ML-
    monitoring statistic for "has this feature's distribution shifted
    since training". Ten equi-width bins over the global [min,max] with
    the histogram query's engine-identical double expression; a full
    type x bin spine so empty bins contribute their smoothed mass
    ((cnt+0.5)/(tot+5) Laplace smoothing — absent bins must NOT silently
    drop, their p != q whenever slice sizes differ); PSI = sum
    (p-q)*ln(p/q).

    Plan: one scan computes BOTH slices' bin counts (sum(CASE) in a
    single partial-aggregable pass — the expectation-audit trick), a
    1-row min/max broadcast, and a 50-row spine join; everything after
    the first aggregate is driver-trivial but stays declarative."""
    ev = load_events(spark, sf_dir)
    m = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    p_cut, q_cut = "2024-01-08", "2024-01-22"
    x = F.col("value")
    bin_ = F.least(
        F.lit(9).cast("long"),
        F.floor((x - F.col("lo")) * F.lit(10.0) / (F.col("hi") - F.col("lo"))),
    ).cast("int")
    b = (
        ev.where((F.col("ts") < p_cut) | (F.col("ts") >= q_cut))
        .crossJoin(m)
        .select(
            "event_type",
            bin_.alias("bin"),
            F.when(F.col("ts") < p_cut, 1).otherwise(0).alias("is_p"),
            F.when(F.col("ts") >= q_cut, 1).otherwise(0).alias("is_q"),
        )
    )
    c = b.groupBy("event_type", "bin").agg(
        F.sum("is_p").cast("double").alias("p_cnt"),
        F.sum("is_q").cast("double").alias("q_cnt"),
    )
    spine = (
        ev.select("event_type")
        .distinct()
        .select("event_type", F.explode(F.sequence(F.lit(0), F.lit(9))).alias("bin"))
        .select("event_type", F.col("bin").cast("int").alias("bin"))
    )
    # localCheckpoint: the ~|event_type|x10-row spine-filled aggregate
    # feeds a diamond (the per-type totals AND the final join) — without
    # truncation Catalyst re-evaluates the whole subtree per consumer,
    # i.e. TWO full bin-count scans of events plus two min/max passes
    # (r12: 6 parquet scans in the executed plan -> 3, one per pass
    # actually required). The checkpointed side is bounded by
    # |event_types| * 10 bins, never by data size.
    f = (
        spine.join(c, ["event_type", "bin"], "left")
        .select(
            "event_type",
            "bin",
            F.coalesce("p_cnt", F.lit(0.0)).alias("p_cnt"),
            F.coalesce("q_cnt", F.lit(0.0)).alias("q_cnt"),
        )
        .localCheckpoint(eager=False)
    )
    t = f.groupBy("event_type").agg(
        F.sum("p_cnt").alias("pt"), F.sum("q_cnt").alias("qt")
    )
    j = f.join(t, "event_type")
    p = (F.col("p_cnt") + 0.5) / (F.col("pt") + 5.0)
    q = (F.col("q_cnt") + 0.5) / (F.col("qt") + 5.0)
    return (
        j.groupBy("event_type")
        .agg(
            F.round(F.sum((p - q) * F.log(p / q)), 5).alias("psi"),
            F.sum("p_cnt").cast("long").alias("n_baseline"),
            F.sum("q_cnt").cast("long").alias("n_current"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# time-series resampling with linear interpolation
# --------------------------------------------------------------------------

@register(
    "resample_interpolate",
    """
    WITH obs AS (
      SELECT event_type, date_trunc('hour', ts) AS pt, round(CAST(CAST(avg(value) AS REAL) AS DOUBLE), 4) AS v
      FROM events GROUP BY 1, 2
    ), bounds AS (
      SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
      FROM events
    ), grid AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 30 MINUTE)) AS g FROM bounds
    ), types AS (
      SELECT DISTINCT event_type FROM events
    ), u AS (
      SELECT event_type, pt AS ord_ts, 0 AS is_grid, v, pt AS ots FROM obs
      UNION ALL
      SELECT t.event_type, gr.g, 1, NULL, NULL FROM types t CROSS JOIN grid gr
    ), w AS (
      SELECT *,
             last_value(v IGNORE NULLS) OVER wp AS pv,
             last_value(ots IGNORE NULLS) OVER wp AS pts,
             last_value(v IGNORE NULLS) OVER wn AS nv,
             last_value(ots IGNORE NULLS) OVER wn AS nts
      FROM u
      WINDOW
        wp AS (PARTITION BY event_type ORDER BY ord_ts ASC, is_grid ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        wn AS (PARTITION BY event_type ORDER BY ord_ts DESC, is_grid DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, strftime(ord_ts, '%Y-%m-%d %H:%M') AS slot,
           round(CASE
             WHEN pts IS NULL THEN NULL
             WHEN nts IS NULL THEN pv
             ELSE pv + (nv - pv)
                  * (CAST(epoch_us(ord_ts) - epoch_us(pts) AS DOUBLE)
                     / CAST(epoch_us(nts) - epoch_us(pts) AS DOUBLE))
           END + 0.00000001, 4) AS value_interp,
           COALESCE(pts = ord_ts, false) AS is_exact
    FROM w WHERE is_grid = 1
    ORDER BY event_type, slot
    """,
)
def resample_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample each event_type's hourly series onto a 30-minute grid
    with LINEAR interpolation between the surrounding observations —
    the time-series alignment primitive (sensor fusion, feature grids)
    that gap-fill's forward-fill deliberately is not: a grid point
    mid-gap gets the line between its neighbors, not a stale copy.
    Leading points (no observation yet) stay null; trailing points hold
    the last observation flat.

    Plan: the raw scan collapses to an hourly aggregate FIRST, so the
    per-type prev/next windows run on types x hours cardinality, never
    raw events (same posture as gapfill_hourly); the grid is a bounded
    types x slots spine off a 1-row bounds aggregate. prev/next come
    from two frames over ONE union — ascending last-non-null and
    descending last-non-null with tie-order flipped so an observation at
    exactly the grid instant lands in the prev frame, not next — i.e.
    two sorts of the same small partition, zero joins against raw data.
    The lerp runs on exact integer microseconds (unix_micros/epoch_us)
    and 4dp-rounded observation values, so both engines compute
    bit-identical doubles."""
    ev = load_events(spark, sf_dir)
    obs = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("pt")
    ).agg(_f32_avg4().alias("v"))
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 30 minutes"))).alias("g")
    )
    types = ev.select("event_type").distinct()
    u = obs.select(
        "event_type",
        F.col("pt").alias("ord_ts"),
        F.lit(0).alias("is_grid"),
        "v",
        F.col("pt").alias("ots"),
    ).unionByName(
        types.crossJoin(grid).select(
            "event_type",
            F.col("g").alias("ord_ts"),
            F.lit(1).alias("is_grid"),
            F.lit(None).cast("double").alias("v"),
            F.lit(None).cast("timestamp").alias("ots"),
        )
    )
    frame = (Window.unboundedPreceding, Window.currentRow)
    wp = (
        Window.partitionBy("event_type")
        .orderBy(F.col("ord_ts").asc(), F.col("is_grid").asc())
        .rowsBetween(*frame)
    )
    wn = (
        Window.partitionBy("event_type")
        .orderBy(F.col("ord_ts").desc(), F.col("is_grid").desc())
        .rowsBetween(*frame)
    )
    w = u.select(
        "*",
        F.last("v", ignorenulls=True).over(wp).alias("pv"),
        F.last("ots", ignorenulls=True).over(wp).alias("pts"),
        F.last("v", ignorenulls=True).over(wn).alias("nv"),
        F.last("ots", ignorenulls=True).over(wn).alias("nts"),
    )
    frac = (
        (F.unix_micros("ord_ts") - F.unix_micros("pts")).cast("double")
        / (F.unix_micros("nts") - F.unix_micros("pts")).cast("double")
    )
    interp = (
        F.when(F.col("pts").isNull(), F.lit(None).cast("double"))
        .when(F.col("nts").isNull(), F.col("pv"))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
    )
    # +1e-8 before rounding on BOTH sides (the repo's half-tie treatment,
    # advanced.py:155, scaled for 4dp): the engines compute bit-identical
    # lerp doubles but round them through different algorithms (decimal
    # HALF_UP vs scaled float), which disagree exactly on .xxxx5 ties.
    return (
        w.where(F.col("is_grid") == 1)
        .select(
            "event_type",
            F.date_format("ord_ts", "yyyy-MM-dd HH:mm").alias("slot"),
            F.round(interp + F.lit(0.00000001), 4).alias("value_interp"),
            F.coalesce(F.col("pts") == F.col("ord_ts"), F.lit(False)).alias(
                "is_exact"
            ),
        )
        .orderBy("event_type", "slot")
    )


# --------------------------------------------------------------------------
# event-sequence pattern matching (MATCH_RECOGNIZE-style)
# --------------------------------------------------------------------------

_SEQ_CODE = (
    "CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c' "
    "WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's' ELSE 'e' END"
)

# (name, regex) — partial-match semantics in BOTH engines (Spark rlike,
# DuckDB regexp_matches); anchors used where "whole journey" is meant.
_SEQ_PATTERNS = [
    ("strict_funnel", "v[^p]*c[^p]*p"),  # view->click->purchase, no early buy
    ("signup_then_purchase", "s.*p"),
    ("repeated_errors", "ee"),
    ("bounce", "^v[^cp]*$"),  # viewed, never clicked or purchased
]


@register(
    "pattern_match_funnel",
    f"""
    WITH s AS (
      SELECT user_id,
             string_agg({_SEQ_CODE}, '' ORDER BY ts, event_id) AS seq
      FROM events GROUP BY user_id
    ), t AS (SELECT count(*) AS n_total FROM s)
    SELECT pattern, n_users,
           round(CAST(n_users AS DOUBLE) / n_total, 6) AS pct
    FROM (
      {" UNION ALL ".join(
        f"SELECT '{name}' AS pattern, "
        f"CAST(sum(CASE WHEN regexp_matches(seq, '{rx.replace(chr(39), chr(39)*2)}') "
        f"THEN 1 ELSE 0 END) AS BIGINT) AS n_users FROM s"
        for name, rx in _SEQ_PATTERNS
      )}
    ) m CROSS JOIN t
    ORDER BY pattern
    """,
)
def pattern_match_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence detection: each user's journey is
    collapsed to a code string in (ts, event_id) order and matched
    against regex patterns — regex over per-key ordered strings is the
    classic distributed stand-in for SQL row-pattern matching (ordered
    quantified patterns, negations like "no purchase in between"), and
    each pattern is one JVM regexp column, not a self-join chain.

    Plan: ONE groupBy(user_id) builds the journey strings
    (array_sort(collect_list(struct)) -> transform -> array_join, all
    JVM built-ins; state per user is bounded by that user's event
    count); all four patterns then evaluate in the SAME single pass over
    the per-user strings (sum(CASE) columns, unpivoted by stack) with a
    1-row total broadcast — adding a pattern adds a column, never a scan
    or shuffle. Four sequence-dependent patterns that would each need
    self-joins or windows become one aggregate + regex evaluation."""
    ev = load_events(spark, sf_dir)
    code = (
        F.when(F.col("event_type") == "view", "v")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "purchase", "p")
        .when(F.col("event_type") == "signup", "s")
        .otherwise("e")
    )
    seqs = (
        ev.select("user_id", "ts", "event_id", code.alias("c"))
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("ts", "event_id", "c"))),
                    lambda x: x["c"],
                ),
                "",
            ).alias("seq")
        )
    )
    counts = seqs.agg(
        F.count("*").alias("n_total"),
        *[
            F.sum(F.when(F.col("seq").rlike(rx), 1).otherwise(0))
            .cast("long")
            .alias(name)
            for name, rx in _SEQ_PATTERNS
        ],
    )
    stacked = counts.select(
        "n_total",
        F.expr(
            "stack({n}, {args}) as (pattern, n_users)".format(
                n=len(_SEQ_PATTERNS),
                args=", ".join(f"'{name}', {name}" for name, _ in _SEQ_PATTERNS),
            )
        ),
    )
    return stacked.select(
        "pattern",
        "n_users",
        F.round(F.col("n_users").cast("double") / F.col("n_total"), 6).alias("pct"),
    ).orderBy("pattern")


# --------------------------------------------------------------------------
# exponentially weighted moving average (bounded-window EWMA)
# --------------------------------------------------------------------------

_EWMA_ALPHA = 0.9  # per-hour decay
_EWMA_SPAN = 24  # hours of history per point


@register(
    "ewma_hourly",
    f"""
    WITH obs AS (
      SELECT event_type, date_trunc('hour', ts) AS pt, round(CAST(CAST(avg(value) AS REAL) AS DOUBLE), 4) AS v
      FROM events GROUP BY 1, 2
    ), lw AS (
      SELECT event_type, pt, v,
             list(v) OVER (PARTITION BY event_type ORDER BY pt
                           ROWS BETWEEN {_EWMA_SPAN - 1} PRECEDING
                           AND CURRENT ROW) AS lst
      FROM obs
    )
    SELECT event_type, strftime(pt, '%Y-%m-%d %H:00') AS hour, v,
           round(list_sum(list_transform(lst,
                     (x, i) -> x * pow({_EWMA_ALPHA}, len(lst) - i)))
                 / list_sum(list_transform(lst,
                     (x, i) -> pow({_EWMA_ALPHA}, len(lst) - i)))
                 + 0.00000001, 4) AS ewma
    FROM lw ORDER BY event_type, pt
    """,
)
def ewma_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of each type's hourly series
    over a bounded 24-hour window — the trend-smoothing feature
    (monitoring dashboards, ML feature stores) that a plain rolling mean
    under-reacts to. Weight for the point k hours back is alpha^k,
    normalized over the points actually present (series heads use fewer
    points, identically in both engines).

    The textbook recursive EWMA (s_t = a*s_{{t-1}} + (1-a)*v_t) is a
    sequential dependency no engine parallelizes, and its algebraic
    unrolling (a^-t prefix sums) overflows doubles past ~300 steps; the
    bounded-window form is the scale-safe equivalent (alpha^24 ≈ 0.08 —
    older mass is negligible by construction) and is exactly computable
    as a frame aggregate. Plan: hourly aggregate first (the windows run
    on types x hours cardinality), then ONE 24-row frame per row:
    collect_list over the frame + JVM higher-order folds (zip_with /
    aggregate) — no self-join against the series, no Python. The +1e-8
    pre-round epsilon is the repo's half-tie treatment (advanced.py:155).
    """
    ev = load_events(spark, sf_dir)
    obs = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("pt")
    ).agg(_f32_avg4().alias("v"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("pt")
        .rowsBetween(-(_EWMA_SPAN - 1), Window.currentRow)
    )
    lw = obs.select("event_type", "pt", "v", F.collect_list("v").over(w).alias("lst"))
    m = F.size("lst")
    # Spark lambda index is 0-based; weight for 0-based i in an m-list is
    # alpha^(m-1-i) (current row = alpha^0), matching DuckDB's 1-based
    # alpha^(len-i).
    wts = F.transform("lst", lambda x, i: F.pow(F.lit(_EWMA_ALPHA), m - 1 - i))
    num = F.aggregate(
        F.zip_with("lst", wts, lambda v, wt: v * wt),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    den = F.aggregate(wts, F.lit(0.0), lambda acc, x: acc + x)
    return lw.select(
        "event_type",
        F.date_format("pt", "yyyy-MM-dd HH:00").alias("hour"),
        "v",
        F.round(num / den + F.lit(0.00000001), 4).alias("ewma"),
    ).orderBy("event_type", "pt")


# --------------------------------------------------------------------------
# RFM customer segmentation (recency/frequency quintile grid)
# --------------------------------------------------------------------------

@register(
    "rfm_segments",
    """
    WITH gmax AS (SELECT CAST(max(ts) AS DATE) AS gd FROM events),
    u AS (
      SELECT user_id,
             date_diff('day', CAST(max(ts) AS DATE), (SELECT gd FROM gmax))
               AS recency_days,
             count(*) AS freq,
             round(sum(CASE WHEN event_type = 'purchase' THEN value
                            ELSE 0 END), 2) AS money
      FROM events GROUP BY user_id
    ), n AS (SELECT count(*) AS n_total FROM u),
    r AS (
      SELECT u.*,
             row_number() OVER (ORDER BY recency_days, user_id) AS r_rank,
             row_number() OVER (ORDER BY freq, user_id) AS f_rank
      FROM u
    )
    SELECT CAST(5 - ((r_rank - 1) * 5) // n_total AS INT) AS r_score,
           CAST(((f_rank - 1) * 5) // n_total + 1 AS INT) AS f_score,
           count(*) AS n_users,
           round(avg(money) + 0.000001, 2) AS avg_monetary
    FROM r, n GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation heatmap: every user scored 1-5 on Recency (days
    since last event, 5 = most recent) and Frequency (event count, 5 =
    most active) by EXACT quintile rank, then the user base rolled up to
    the 5x5 segment grid with average purchase monetary value — the
    classic marketing/retention segmentation over the engine's event
    output.

    Quintiles come from exact global ranks, and a bare
    ``row_number() OVER (ORDER BY ...)`` collapses 100 TB of users onto
    one task — so ranking uses :func:`operators.scale.global_rank`
    (range-partition + broadcast prefix offsets, one range shuffle per
    metric) with user_id tie-breaks making both metrics' rank total.
    Scores use the same explicit ``((rank-1)*5) // n`` bucketing in both
    engines (ntile's remainder-spreading is engine-idiosyncratic). Plan:
    one groupBy(user) aggregate, two range shuffles on |users| rows, two
    1-row broadcasts (global max date, user count), then a 25-key
    aggregate."""
    from ..operators.scale import global_rank

    ev = load_events(spark, sf_dir)
    gmax = ev.agg(F.to_date(F.max("ts")).alias("gd"))
    u = (
        ev.groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count("*").alias("freq"),
            F.round(
                F.sum(
                    F.when(F.col("event_type") == "purchase", F.col("value"))
                    .otherwise(0.0)
                ),
                2,
            ).alias("money"),
        )
        .crossJoin(gmax)
        .select(
            "user_id",
            F.datediff(F.col("gd"), F.to_date("last_ts")).alias("recency_days"),
            "freq",
            "money",
        )
    )
    n = u.agg(F.count("*").alias("n_total"))
    ranked = global_rank(
        global_rank(u, ["recency_days", "user_id"], "r_rank"),
        ["freq", "user_id"],
        "f_rank",
    )
    r_score = (
        F.lit(5) - F.floor((F.col("r_rank") - 1) * 5 / F.col("n_total"))
    ).cast("int")
    f_score = (
        F.floor((F.col("f_rank") - 1) * 5 / F.col("n_total")) + 1
    ).cast("int")
    return (
        ranked.crossJoin(n)
        .groupBy(r_score.alias("r_score"), f_score.alias("f_score"))
        .agg(
            F.count("*").alias("n_users"),
            F.round(F.avg("money") + F.lit(0.000001), 2).alias("avg_monetary"),
        )
        .orderBy("r_score", "f_score")
    )


# --------------------------------------------------------------------------
# rolling exact median (robust complement of the EWMA)
# --------------------------------------------------------------------------

@register(
    "rolling_median_hourly",
    f"""
    WITH obs AS (
      SELECT event_type, date_trunc('hour', ts) AS pt, round(CAST(CAST(avg(value) AS REAL) AS DOUBLE), 4) AS v
      FROM events GROUP BY 1, 2
    ), lw AS (
      SELECT event_type, pt, v,
             list_sort(list(v) OVER (PARTITION BY event_type ORDER BY pt
                        ROWS BETWEEN {_EWMA_SPAN - 1} PRECEDING
                        AND CURRENT ROW)) AS ls
      FROM obs
    )
    SELECT event_type, strftime(pt, '%Y-%m-%d %H:00') AS hour, v,
           round(CASE WHEN len(ls) % 2 = 1 THEN ls[(len(ls) + 1) // 2]
                      ELSE (ls[len(ls) // 2] + ls[len(ls) // 2 + 1]) / 2.0
                 END + 0.00000001, 4) AS median_24h
    FROM lw ORDER BY event_type, pt
    """,
)
def rolling_median_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling EXACT median over the trailing 24 hourly points per type —
    the robust-trend complement of `ewma_hourly` (a single outlier hour
    moves the EWMA but not the median; dashboards want both). Exact, not
    approx_percentile: the frame is bounded at 24 values, so sorting it
    per row is O(24 log 24) — the cheap regime where sketches only add
    error.

    Plan: identical posture to the EWMA — hourly aggregate first, then a
    24-row frame per row on types x hours cardinality; the sort and
    median pick are JVM array expressions (`array_sort`, `element_at`,
    1-based in BOTH engines). Even-length frames average the middle
    pair with the same explicit formula on both sides."""
    ev = load_events(spark, sf_dir)
    obs = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("pt")
    ).agg(_f32_avg4().alias("v"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("pt")
        .rowsBetween(-(_EWMA_SPAN - 1), Window.currentRow)
    )
    lw = obs.select(
        "event_type",
        "pt",
        "v",
        F.array_sort(F.collect_list("v").over(w)).alias("ls"),
    )
    m = F.size("ls")
    odd = F.element_at("ls", ((m + 1) / 2).cast("int"))
    even = (
        F.element_at("ls", (m / 2).cast("int"))
        + F.element_at("ls", (m / 2 + 1).cast("int"))
    ) / 2.0
    med = F.when(m % 2 == 1, odd).otherwise(even)
    return lw.select(
        "event_type",
        F.date_format("pt", "yyyy-MM-dd HH:00").alias("hour"),
        "v",
        F.round(med + F.lit(0.00000001), 4).alias("median_24h"),
    ).orderBy("event_type", "pt")


# --- graph analytics ---------------------------------------------------------

def _trade_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customer<->supplier trade pairs in the shared even/odd
    node-id space (customer = key*2, supplier = key*2+1) — the edge
    basis every graph query shares; the oracles inline the identical
    `pairs AS (SELECT DISTINCT o_custkey*2 ..., l_suppkey*2+1 ...)`
    CTE. Change the encoding here and in those CTEs together."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )


def _undirected_trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trade pairs as a symmetric directed edge list (both
    directions), the undirected-graph input contract of
    operators/graph.py."""
    pairs = _trade_pairs(spark, sf_dir)
    return pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).union(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )


def _seed_supplier_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier node ids of the BFS/SSSP seed nation (broadcast dim
    filter; _BFS_SEED_NATION is resolved at call time)."""
    su = _t(spark, sf_dir, "supplier")
    na = _t(spark, sf_dir, "nation")
    return su.join(
        F.broadcast(na.where(F.col("n_name") == _BFS_SEED_NATION)),
        su["s_nationkey"] == na["n_nationkey"],
    ).select((F.col("s_suppkey") * 2 + 1).alias("node"))


_PR_ITERS = 3
_PR_DAMP = 0.85


def _pr_oracle() -> str:
    """Unroll the fixed-iteration PageRank recurrence as chained CTEs —
    the SQL twin of operators/graph.py:pagerank (same floor/damping,
    same 1.0 init, same LEFT-JOIN message sum)."""
    steps = []
    for i in range(1, _PR_ITERS + 1):
        steps.append(
            f"""pr{i} AS (
      SELECT n.node, {1 - _PR_DAMP} + {_PR_DAMP} * COALESCE(SUM(p.pr / d.outdeg), 0) AS pr
      FROM nodes n
      LEFT JOIN edges e ON e.dst = n.node
      LEFT JOIN pr{i - 1} p ON p.node = e.src
      LEFT JOIN deg d ON d.src = e.src
      GROUP BY n.node
    )"""
        )
    its = ",\n    ".join(steps)
    return f"""
    WITH pairs AS (
      SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    edges AS (
      SELECT c AS src, s AS dst FROM pairs
      UNION ALL
      SELECT s AS src, c AS dst FROM pairs
    ),
    deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS outdeg FROM edges GROUP BY src),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    pr0 AS (SELECT node, 1.0 AS pr FROM nodes),
    {its}
    SELECT CAST((node - 1) / 2 AS BIGINT) AS s_suppkey,
           ROUND(pr + 0.00000001, 4) AS pagerank
    FROM pr{_PR_ITERS}
    WHERE node % 2 = 1
    ORDER BY pagerank DESC, s_suppkey
    LIMIT 20
    """


@register("graph_pagerank", _pr_oracle())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative PageRank (operators/graph.py) over the customer<->supplier
    trade graph: one undirected edge (as two directed edges) per distinct
    customer/supplier pair that traded, ranks seeded at 1.0, 3 Pregel
    supersteps, top-20 suppliers by final rank. Customers and suppliers
    share one node-id space via even/odd encoding (key*2 / key*2+1) —
    dense bigints, no string keys in the join hot path.

    This is the engine's iterative-algorithm template under oracle
    coverage: per-superstep lineage truncation, edges persisted once and
    reused, message combine as a map-side partial aggregation. The
    fixed-iteration recurrence is unrolled CTE-for-CTE in the DuckDB
    oracle, so every superstep's float math is checked, not just the
    final ordering."""
    from ..operators.graph import pagerank

    edges = _undirected_trade_edges(spark, sf_dir)
    ranks = pagerank(edges, iterations=_PR_ITERS, damping=_PR_DAMP)
    return (
        ranks.where(F.col("node") % 2 == 1)
        .select(
            ((F.col("node") - 1) / 2).cast("long").alias("s_suppkey"),
            # half-tie epsilon: each superstep's message sum is
            # summation-order-dependent across engines, so guard the
            # 4dp rounding like the hourly-avg family does
            F.round(F.col("pagerank") + 0.00000001, 4).alias("pagerank"),
        )
        .orderBy(F.col("pagerank").desc(), "s_suppkey")
        .limit(20)
    )


_COPURCHASE_MAX_DEGREE = 100  # stop-customer prune: degree cap on the fan-out side


def _copurchase_weighted_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier co-purchase pair weights (shared-customer counts) with
    the stop-customer degree prune — the single definition behind
    graph_copurchase_topk and graph_triangle_count's similarity graph
    (both docstrings promise the cap is 'applied identically'; one body
    keeps that true, mirrored by the pairs/kept CTEs both oracles
    inline). Returns (supp_a, supp_b, w) with supp_a < supp_b."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    pairs = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    keep = (
        pairs.groupBy("c")
        .agg(F.count("*").alias("_d"))
        .where(F.col("_d") <= _COPURCHASE_MAX_DEGREE)
        .select("c")
    )
    kept = pairs.join(F.broadcast(keep), "c")
    a = kept.select("c", F.col("s").alias("supp_a"))
    b = kept.select("c", F.col("s").alias("supp_b"))
    return (
        a.join(b, ["c"])
        .where(F.col("supp_a") < F.col("supp_b"))
        .groupBy("supp_a", "supp_b")
        .agg(F.count("*").alias("w"))
    )


@register(
    "graph_copurchase_topk",
    f"""
    WITH pairs AS (
      SELECT DISTINCT o_custkey AS c, l_suppkey AS s
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    kept AS (
      SELECT c, s FROM pairs
      WHERE c IN (SELECT c FROM pairs GROUP BY c
                  HAVING COUNT(*) <= {_COPURCHASE_MAX_DEGREE})
    )
    SELECT a.s AS supp_a, b.s AS supp_b,
           CAST(COUNT(*) AS BIGINT) AS shared_customers
    FROM kept a JOIN kept b ON a.c = b.c AND a.s < b.s
    GROUP BY a.s, b.s
    ORDER BY shared_customers DESC, supp_a, supp_b
    LIMIT 20
    """,
)
def graph_copurchase_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 supplier pairs by shared-customer count — the item-item
    co-occurrence shape (co-citation / 'bought together' recsys
    candidate generation). The quadratic hazard is the per-customer
    fan-out: a customer linked to d suppliers emits d*(d-1)/2 pairs, so
    the hottest customers dominate superlinearly. Mitigation is the
    co-occurrence analog of dedup_ngram_jaccard's stop-shingle prune:
    customers above a degree cap are dropped BEFORE the self-join (they
    connect to everything, so they carry ~no pair-level signal — same
    reasoning as TF-IDF down-weighting ubiquitous terms). The cap makes
    per-customer work O(cap^2) and total work linear in customers; it is
    part of the operator's semantics, applied identically in the oracle.

    Plan: distinct (customer, supplier) pairs -> degree filter via a
    broadcastable keep-list aggregate -> one shuffle self-join on the
    customer key -> pair count. No iteration; the graph family's
    one-shot member next to the iterative pagerank."""
    return (
        _copurchase_weighted_pairs(spark, sf_dir)
        .select(
            "supp_a",
            "supp_b",
            F.col("w").cast("long").alias("shared_customers"),
        )
        .orderBy(F.col("shared_customers").desc(), "supp_a", "supp_b")
        .limit(20)
    )


_TRIANGLE_TOPK_EDGES = 2000  # similarity-graph sparsification: keep K strongest


@register(
    "graph_triangle_count",
    # Every CTE is MATERIALIZED: a DuckDB planner hint (zero semantic
    # change) that stops the optimizer from re-inlining the whole
    # pairs->kept->weighted pipeline into each consumer — un-hinted, the
    # inlined plan goes from ~1.6 s to >5 min at sf0.1 (worse on
    # scrambled copies), which is why the r10 order audit had to exclude
    # this query at sf0.1. Stage-by-stage materialization profiled at
    # <1 s total; hinted oracle verified equal on views and scrambled
    # copies at both SFs.
    f"""
    WITH pairs AS MATERIALIZED (
      SELECT DISTINCT o_custkey AS c, l_suppkey AS s
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    kept AS MATERIALIZED (
      SELECT c, s FROM pairs
      WHERE c IN (SELECT c FROM pairs GROUP BY c
                  HAVING COUNT(*) <= {_COPURCHASE_MAX_DEGREE})
    ),
    weighted AS MATERIALIZED (
      SELECT a.s AS sa, b.s AS sb, COUNT(*) AS w
      FROM kept a JOIN kept b ON a.c = b.c AND a.s < b.s
      GROUP BY a.s, b.s
    ),
    edges AS MATERIALIZED (
      SELECT sa, sb FROM weighted
      ORDER BY w DESC, sa, sb LIMIT {_TRIANGLE_TOPK_EDGES}
    ),
    deg AS MATERIALIZED (
      SELECT n, COUNT(*) AS d FROM (
        SELECT sa AS n FROM edges UNION ALL SELECT sb AS n FROM edges
      ) GROUP BY n
    ),
    o AS MATERIALIZED (
      SELECT CASE WHEN (da.d, e.sa) < (db.d, e.sb) THEN e.sa ELSE e.sb END AS lo,
             CASE WHEN (da.d, e.sa) < (db.d, e.sb) THEN e.sb ELSE e.sa END AS hi
      FROM edges e
      JOIN deg da ON da.n = e.sa
      JOIN deg db ON db.n = e.sb
    ),
    tri AS MATERIALIZED (
      SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
      FROM o e1 JOIN o e2 ON e2.lo = e1.hi
      WHERE EXISTS (SELECT 1 FROM o e3 WHERE e3.lo = e1.lo AND e3.hi = e2.hi)
    )
    SELECT node AS s_suppkey, CAST(COUNT(*) AS BIGINT) AS triangles
    FROM (
      SELECT a AS node FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    )
    GROUP BY node
    ORDER BY triangles DESC, s_suppkey
    LIMIT 15
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 suppliers by triangle participation in the co-purchase
    similarity graph (operators/graph.py:triangle_count — degree-ordered
    orientation, Suri & Vassilvitskii 2011). Triangle density is the
    classic cohesion / community-strength signal (clustering
    coefficient's numerator); on a supplier graph it surfaces tightly
    clustered supplier groups.

    The graph is sparsified BEFORE counting: distinct (customer,
    supplier) trade pairs -> stop-customer degree prune (same cap as
    graph_copurchase_topk) -> pair weights by shared-customer count ->
    keep the K strongest edges via a deterministic exact top-K
    (weight desc, then pair id — TakeOrdered, never a full sort). Fixed
    K bounds triangle work at ANY scale factor: the co-purchase graph
    densifies toward a clique as SF grows (at sf0.01 every supplier
    pair already shares >= 124 customers), and top-K-edge
    sparsification is the standard similarity-graph construction move
    (keep strongest edges, then mine structure). The oracle replays the
    identical pipeline CTE-for-CTE, including the orientation
    comparator, so the triangle enumeration itself is value-checked."""
    from ..operators.graph import triangle_count

    edges = (
        _copurchase_weighted_pairs(spark, sf_dir)
        .orderBy(F.col("w").desc(), "supp_a", "supp_b")
        .limit(_TRIANGLE_TOPK_EDGES)
        .drop("w")
    )
    return (
        triangle_count(edges, "supp_a", "supp_b")
        .select(F.col("node").alias("s_suppkey"), "triangles")
        .orderBy(F.col("triangles").desc(), "s_suppkey")
        .limit(15)
    )


@register(
    "ts_autocorr",
    """
    WITH h AS (
      SELECT event_type, date_trunc('hour', ts) AS ph,
             round(CAST(CAST(avg(value) AS REAL) AS DOUBLE), 4) AS v
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    l AS (
      SELECT event_type, v,
             lag(v, 1)  OVER (PARTITION BY event_type ORDER BY ph) AS v1,
             lag(v, 24) OVER (PARTITION BY event_type ORDER BY ph) AS v24
      FROM h
    )
    SELECT event_type,
           ROUND(corr(v, v1)  + 0.00000001, 4) AS ac_lag1,
           ROUND(corr(v, v24) + 0.00000001, 4) AS ac_lag24,
           CAST(COUNT(*) AS BIGINT) AS n_hours
    FROM l GROUP BY event_type ORDER BY event_type
    """,
)
def ts_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 and lag-24 autocorrelation of each event type's hourly mean
    series — the standard seasonality / persistence diagnostic (a large
    ac_lag24 says "daily cycle"; ac_lag1 says "short-term momentum").
    Composition of primitives the engine already exercises separately:
    time-bucketed pre-aggregation (shuffle ONCE on (type, hour) — the
    window then operates on ~700 rows per series, not raw events), a
    partitioned ordered lag, and the corr co-moment aggregate (single
    pass, mergeable partials). Hourly means are squashed through float32
    and rounded before the lag so both engines correlate identical
    inputs; the correlation itself is rounded through the catalog's
    epsilon convention (summation order differs across engines)."""
    ev = load_events(spark, sf_dir)
    h = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("ph")
    ).agg(
        _f32_avg4().alias("v")
    )
    w1 = Window.partitionBy("event_type").orderBy("ph")
    l = h.select(
        "event_type",
        "v",
        F.lag("v", 1).over(w1).alias("v1"),
        F.lag("v", 24).over(w1).alias("v24"),
    )
    return (
        l.groupBy("event_type")
        .agg(
            F.round(F.corr("v", "v1") + 0.00000001, 4).alias("ac_lag1"),
            F.round(F.corr("v", "v24") + 0.00000001, 4).alias("ac_lag24"),
            F.count("*").cast("long").alias("n_hours"),
        )
        .orderBy("event_type")
    )


@register(
    "ts_changepoint_cusum",
    """
    WITH h AS (
      SELECT event_type, date_trunc('hour', ts) AS ph,
             round(CAST(CAST(avg(value) AS REAL) AS DOUBLE), 4) AS v
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    m AS (
      SELECT event_type, ph, v,
             AVG(v) OVER (PARTITION BY event_type) AS mu
      FROM h
    ),
    c AS (
      SELECT event_type, ph,
             SUM(v - mu) OVER (PARTITION BY event_type ORDER BY ph
                               ROWS UNBOUNDED PRECEDING) AS s
      FROM m
    )
    SELECT event_type, ph AS change_hour, ROUND(ABS(s) + 0.00000001, 4) AS cusum_max
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY ROUND(ABS(s), 6) DESC, ph) AS rn
      FROM c
    )
    WHERE rn = 1 ORDER BY event_type
    """,
)
def ts_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint location per event-type series (Page 1954 /
    the offline mean-shift form): cumulative sum of deviations from the
    series mean, changepoint = the hour where |CUSUM| peaks — for a
    single mean-shift this argmax is the maximum-likelihood split
    point. One shuffle (the hourly pre-aggregation); the mean, the
    running sum, and the argmax are all windows over the SAME
    (event_type, ordered-by-hour) partitioning, so Catalyst plans them
    without re-shuffling between window frames. Hourly means are
    float32-squashed and rounded first so the sequential cumsum sees
    identical inputs in both engines; the argmax comparator rounds to 6
    decimals with an hour-ascending tie-break, making the winning row
    deterministic even where the two engines' partition-mean summation
    order differs in the last bits."""
    ev = load_events(spark, sf_dir)
    h = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("ph")
    ).agg(
        _f32_avg4().alias("v")
    )
    wall = Window.partitionBy("event_type")
    word = (
        Window.partitionBy("event_type")
        .orderBy("ph")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = h.select(
        "event_type",
        "ph",
        F.sum(F.col("v") - F.avg("v").over(wall)).over(word).alias("s"),
    )
    wpick = Window.partitionBy("event_type").orderBy(
        F.round(F.abs("s"), 6).desc(), F.col("ph")
    )
    return (
        c.withColumn("rn", F.row_number().over(wpick))
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("ph").alias("change_hour"),
            F.round(F.abs("s") + 0.00000001, 4).alias("cusum_max"),
        )
        .orderBy("event_type")
    )


@register(
    "ts_trend_ols",
    """
    SELECT event_type,
           ROUND(regr_slope(value, epoch(ts) / 86400.0) + 0.000000001, 6)
             AS slope_per_day,
           ROUND(regr_intercept(value, epoch(ts) / 86400.0) + 0.000000001, 4)
             AS intercept,
           ROUND(regr_r2(value, epoch(ts) / 86400.0) + 0.000000001, 8) AS r2,
           CAST(COUNT(value) AS BIGINT) AS n
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def ts_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series linear trend via the SQL-standard OLS regression
    aggregates (regr_slope / regr_intercept / regr_r2), x = event time
    in fractional days — "is this metric drifting, and how fast?".
    Single-pass mergeable co-moment aggregation (the same partial-
    aggregate shape as corr/covar: each partition accumulates
    (n, sx, sy, sxx, sxy, syy), merge is algebraic), so the whole query
    is one map-side-combined shuffle of 5 rows per partition — no
    window, no sort, scale-free. The regression surface is distinct
    from agg_corr_covar's: slope/intercept give the fitted line (units:
    value per day), r2 its explanatory power."""
    ev = load_events(spark, sf_dir)
    # timestamp->double cast = fractional epoch seconds (matches DuckDB epoch())
    x = F.col("ts").cast("double") / 86400.0
    return (
        ev.select("event_type", F.col("value").alias("y"), x.alias("x"))
        .groupBy("event_type")
        .agg(
            F.round(F.regr_slope("y", "x") + 0.000000001, 6).alias("slope_per_day"),
            F.round(F.regr_intercept("y", "x") + 0.000000001, 4).alias("intercept"),
            F.round(F.regr_r2("y", "x") + 0.000000001, 8).alias("r2"),
            F.count("y").cast("long").alias("n"),
        )
        .orderBy("event_type")
    )


_LPA_ITERS = 3


def _lpa_oracle() -> str:
    """Unrolled SQL twin of operators/graph.py:label_propagation over the
    customer<->supplier trade graph (even/odd node encoding, both edge
    directions): per iteration, count in-neighbor labels per node, adopt
    the most frequent with the min-label tie-break, keep the previous
    label where no in-edges exist."""
    steps = []
    for i in range(1, _LPA_ITERS + 1):
        steps.append(
            f"""cnt{i} AS (
      SELECT e.dst AS node, p.lbl, COUNT(*) AS c
      FROM edges e JOIN lp{i - 1} p ON p.node = e.src
      GROUP BY e.dst, p.lbl
    ),
    pick{i} AS (
      SELECT node, lbl FROM (
        SELECT node, lbl,
               ROW_NUMBER() OVER (PARTITION BY node
                                  ORDER BY c DESC, lbl) AS rn
        FROM cnt{i}
      ) WHERE rn = 1
    ),
    lp{i} AS (
      SELECT prev.node, COALESCE(pick{i}.lbl, prev.lbl) AS lbl
      FROM lp{i - 1} prev LEFT JOIN pick{i} ON pick{i}.node = prev.node
    )"""
        )
    its = ",\n    ".join(steps)
    return f"""
    WITH pairs AS (
      SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    edges AS (
      SELECT c AS src, s AS dst FROM pairs
      UNION ALL
      SELECT s AS src, c AS dst FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    lp0 AS (SELECT node, node AS lbl FROM nodes),
    {its}
    SELECT lbl AS community, CAST(COUNT(*) AS BIGINT) AS size_nodes
    FROM lp{_LPA_ITERS}
    GROUP BY lbl
    ORDER BY size_nodes DESC, community
    LIMIT 15
    """


@register("graph_label_propagation", _lpa_oracle())
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation
    (operators/graph.py:label_propagation — Raghavan et al. 2007 with a
    deterministic min-label tie-break) on the undirected customer<->
    supplier trade graph, 3 supersteps; top-15 communities by size.
    Third member of the iterative-graph family after pagerank (float
    recurrence) and triangle_count (one-shot): LPA exercises the
    argmax-of-counts superstep — join labels onto edges, map-side-
    combined count per (node, label), per-node window argmax on the
    SAME shuffle key — that neither of the others covers. The oracle
    unrolls all three supersteps CTE-for-CTE including the tie-break,
    so the propagation dynamics are value-checked, not just the final
    community sizes."""
    from ..operators.graph import label_propagation

    edges = _undirected_trade_edges(spark, sf_dir)
    labels = label_propagation(edges, iterations=_LPA_ITERS)
    return (
        labels.groupBy(F.col("label").alias("community"))
        .agg(F.count("*").cast("long").alias("size_nodes"))
        .orderBy(F.col("size_nodes").desc(), "community")
        .limit(15)
    )


# --------------------------------------------------------------------------
# 2-D skyline (Pareto frontier)
# --------------------------------------------------------------------------

@register(
    "skyline_pareto",
    """
    SELECT p.p_partkey, p.p_retailprice, p.p_size
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
    ORDER BY p.p_retailprice, p.p_partkey
    """,
)
def skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier (skyline) over part: every part for which no
    other part is both cheaper-or-equal AND larger-or-equal with at
    least one strict improvement — the classic multi-criteria shortlist
    operator (Borzsony et al. 2001, "The Skyline Operator"). Exact
    duplicates in (price, size) are all kept, per the standard
    definition.

    The naive spec is an O(n^2) dominance anti-join (the oracle's NOT
    EXISTS — an independent formulation, which is the point of the
    oracle). The engine instead uses the sort-filter skyline: order
    distinct (price, size) pairs by (price ASC, size DESC); a pair is
    on the frontier iff its size strictly exceeds the running max size
    of all STRICT predecessors (after distinct, an equal-size
    predecessor is strictly cheaper, i.e. dominating — so the <=
    rejection is exact). The running max is
    operators/scale.py:bucketed_cummax — a pure-JVM two-level prefix
    over the bounded price domain, no single-partition window over the
    pairs, no pairwise join — O(n log n) total and
    scale-safe at any frontier size (anti-correlated data degrades the
    OUTPUT, never the plan). Frontier pairs then semi-join back to
    recover every tied part row; the frontier side is broadcast (a
    skyline over independent dims is O(log n) expected — and even
    adversarial frontiers are |distinct pairs| at worst, which AQE
    would demote to a shuffle join).
    """
    from ..operators.scale import bucketed_cummax

    part = _t(spark, sf_dir, "part")
    pairs = part.select("p_retailprice", "p_size").distinct()
    # distinct (price, size) pairs are bounded by the price x size
    # DOMAIN product, and $1-wide price buckets bound the offsets frame
    # by the price range — the pure-JVM running max (r12; was
    # global_cummax's Python pass + checkpoint)
    ranked = bucketed_cummax(
        pairs.withColumn("_neg_size", -F.col("p_size").cast("double")),
        ["p_retailprice", "_neg_size"],
        "p_size",
        cummax_col="_prior_max",
        bucket_width=1.0,
        exclusive=True,
    )
    frontier = ranked.where(
        F.col("_prior_max").isNull()
        | (F.col("p_size").cast("double") > F.col("_prior_max"))
    ).select("p_retailprice", "p_size")
    return (
        part.join(
            F.broadcast(frontier), ["p_retailprice", "p_size"], "left_semi"
        )
        .select("p_partkey", "p_retailprice", "p_size")
        .orderBy("p_retailprice", "p_partkey")
    )


# --------------------------------------------------------------------------
# last-touch attribution
# --------------------------------------------------------------------------

@register(
    "attribution_last_touch",
    """
    WITH attr AS (
      SELECT event_type, value,
             coalesce(last_value(CASE WHEN event_type <> 'purchase'
                                      THEN event_type END IGNORE NULLS)
                        OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      'direct') AS channel
      FROM events
    )
    SELECT channel,
           count(*) AS n_purchases,
           round(CAST(CAST(sum(value) AS REAL) AS DOUBLE) + 0.00000001, 2)
             AS total_value
    FROM attr WHERE event_type = 'purchase'
    GROUP BY channel ORDER BY channel
    """,
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing-style last-touch attribution: each purchase is credited
    to the user's most recent PRIOR non-purchase event type (purchases
    with no prior touch credit 'direct'), then purchase count and value
    roll up per channel.

    Plan: ONE hash shuffle on user_id; the per-user ordered window
    (last non-purchase type over the strict-predecessor frame,
    ignorenulls — the standard SQL idiom for 'latest matching earlier
    row' without a self-join) runs on that partitioning, and the final
    channel rollup is a map-side-combined aggregate over a handful of
    groups. No as-of self-join, no explode. The value sum goes through
    the repo's float32-squash + half-tie epsilon before rounding
    (ewma_hourly precedent) so both engines' summation orders agree.
    """
    ev = load_events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touched = ev.withColumn(
        "channel",
        F.coalesce(
            F.last(
                F.when(F.col("event_type") != "purchase", F.col("event_type")),
                ignorenulls=True,
            ).over(w),
            F.lit("direct"),
        ),
    )
    return (
        touched.where(F.col("event_type") == "purchase")
        .groupBy("channel")
        .agg(
            F.count("*").cast("long").alias("n_purchases"),
            F.round(
                F.sum("value").cast("float").cast("double") + 0.00000001, 2
            ).alias("total_value"),
        )
        .orderBy("channel")
    )


# --------------------------------------------------------------------------
# seasonal decomposition (hour-of-day profile)
# --------------------------------------------------------------------------

_SEAS_HALF = 12  # centered moving-average half-width (25h window)


@register(
    "ts_seasonal_profile",
    f"""
    WITH obs AS (
      SELECT event_type, date_trunc('hour', ts) AS pt,
             round(CAST(CAST(avg(value) AS REAL) AS DOUBLE), 4) AS v
      FROM events GROUP BY 1, 2
    ), tr AS (
      SELECT event_type, pt, v,
             CASE WHEN count(*) OVER w = {2 * _SEAS_HALF + 1}
                  THEN avg(v) OVER w END AS trend
      FROM obs
      WINDOW w AS (PARTITION BY event_type ORDER BY pt
                   ROWS BETWEEN {_SEAS_HALF} PRECEDING AND {_SEAS_HALF} FOLLOWING)
    )
    SELECT event_type, CAST(hour(pt) AS INT) AS hod,
           count(*) AS n_obs,
           round(CAST(CAST(avg(v - trend) AS REAL) AS DOUBLE) + 0.00000001, 4)
             AS seasonal
    FROM tr WHERE trend IS NOT NULL
    GROUP BY event_type, hod
    ORDER BY event_type, hod
    """,
)
def ts_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition, profile form: per
    event type, detrend the hourly series with a centered 25-hour
    moving average (full windows only — the textbook edge rule), then
    average the detrended residuals by hour-of-day. The output is each
    type's diurnal signature (5 types x 24 hours), the feature behind
    seasonality-aware anomaly thresholds and forecast baselines.

    Plan posture matches the ts family (ewma/rolling-median): hourly
    pre-aggregate FIRST so every window runs on types x hours
    cardinality (calendar-bounded, not data-bounded), one shuffle on
    event_type shared by the trend window and the final hour-of-day
    rollup. ROWS (not RANGE) framing on the bucketed series keeps both
    engines' gap semantics identical; the float32 squash + half-tie
    epsilon is the repo's cross-engine float contract.
    """
    ev = load_events(spark, sf_dir)
    obs = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("pt")
    ).agg(_f32_avg4().alias("v"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("pt")
        .rowsBetween(-_SEAS_HALF, _SEAS_HALF)
    )
    tr = obs.withColumn(
        "trend",
        F.when(
            F.count("*").over(w) == 2 * _SEAS_HALF + 1, F.avg("v").over(w)
        ),
    )
    return (
        tr.where(F.col("trend").isNotNull())
        .groupBy("event_type", F.hour("pt").cast("int").alias("hod"))
        .agg(
            F.count("*").cast("long").alias("n_obs"),
            F.round(
                F.avg(F.col("v") - F.col("trend")).cast("float").cast("double")
                + 0.00000001,
                4,
            ).alias("seasonal"),
        )
        .orderBy("event_type", "hod")
    )


# --------------------------------------------------------------------------
# multi-source BFS hop distances
# --------------------------------------------------------------------------

_BFS_HOPS = 4
_BFS_SEED_NATION = "NATION_3"


def _bfs_oracle() -> str:
    """Unroll the level-synchronous BFS as cumulative reach sets r0..rK —
    the SQL twin of operators/graph.py:bfs_hops (r_i = nodes reachable in
    <= i hops; a node's hop = its first appearance = MIN over levels).
    The cumulative-distinct form keeps every CTE bounded by |nodes|,
    unlike a naive recursive path enumeration (degree^K paths)."""
    steps = []
    for i in range(1, _BFS_HOPS + 1):
        steps.append(
            f"""r{i} AS (
      SELECT DISTINCT node FROM (
        SELECT node FROM r{i - 1}
        UNION ALL
        SELECT e.dst AS node FROM edges e JOIN r{i - 1} r ON e.src = r.node))"""
        )
    its = ",\n    ".join(steps)
    levels = "\n        UNION ALL ".join(
        f"SELECT node, {i} AS h FROM r{i}" for i in range(_BFS_HOPS + 1)
    )
    return f"""
    WITH pairs AS (
      SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    edges AS (
      SELECT c AS src, s AS dst FROM pairs
      UNION ALL
      SELECT s AS src, c AS dst FROM pairs
    ),
    r0 AS (
      SELECT DISTINCT s_suppkey * 2 + 1 AS node
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = '{_BFS_SEED_NATION}'
    ),
    {its},
    hops AS (
      SELECT node, MIN(h) AS hop FROM (
        {levels}
      ) GROUP BY node
    )
    SELECT CAST(hop AS BIGINT) AS hop,
           CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS side,
           CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM hops GROUP BY 1, 2 ORDER BY hop, side
    """


@register("graph_shortest_hops", _bfs_oracle())
def graph_shortest_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum hop distance from every NATION_3 supplier over
    the customer<->supplier trade graph (operators/graph.py:bfs_hops),
    summarized as node counts per (hop, side) up to 4 hops — the
    reachability / blast-radius profile ("how far does a supply shock
    propagate in two trade steps?"). Same even/odd shared node-id space
    as graph_pagerank.

    Scale shape: level-synchronous frontier expansion — per round ONE
    hash join of the (shrinking) frontier onto the persisted edge list,
    a distinct, and an anti-join against the visited set; hop labels are
    assigned exactly once so no min() recomputation ever runs. The
    oracle unrolls the same recurrence as cumulative reach CTEs, so
    every level's frontier membership is checked, not just the totals.
    """
    from ..operators.graph import bfs_hops

    edges = _undirected_trade_edges(spark, sf_dir)
    seeds = _seed_supplier_nodes(spark, sf_dir)
    reached = bfs_hops(edges, seeds, _BFS_HOPS)
    return (
        reached.groupBy(
            F.col("hop").cast("long").alias("hop"),
            F.when(F.col("node") % 2 == 0, F.lit("customer"))
            .otherwise(F.lit("supplier"))
            .alias("side"),
        )
        .agg(F.count("*").cast("long").alias("n_nodes"))
        .orderBy("hop", "side")
    )


# --------------------------------------------------------------------------
# Markov event-transition matrix
# --------------------------------------------------------------------------

@register(
    "markov_event_transitions",
    """
    WITH seq AS (
      SELECT event_type AS cur,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS nxt
      FROM events
    )
    SELECT cur, nxt, CAST(count(*) AS BIGINT) AS n,
           round(count(*) / CAST(sum(count(*)) OVER (PARTITION BY cur)
                            AS DOUBLE) + 0.00000001, 6) AS p
    FROM seq WHERE nxt IS NOT NULL
    GROUP BY cur, nxt ORDER BY cur, nxt
    """,
)
def markov_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current event type), the |types|^2
    table behind next-action prediction baselines, session-flow sanity
    checks, and synthetic-sequence generators.

    Plan: ONE hash shuffle on user_id carries the lead() window (the
    per-user successor — no self-join); the pair count is a map-side-
    combined aggregate down to |types|^2 rows, and the row-normalizing
    window runs on that dimension-sized frame (25 rows here — the same
    bound class as mixture_temperature_weights' total). Transition
    probabilities are ratios of exact integer counts, so both engines
    agree to float64 ulps; epsilon + 6dp round is the float contract.
    """
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).where(F.col("nxt").isNotNull())
    counts = seq.groupBy("cur", "nxt").agg(F.count("*").cast("long").alias("n"))
    wr = Window.partitionBy("cur")
    return counts.select(
        "cur",
        "nxt",
        "n",
        F.round(
            F.col("n") / F.sum("n").over(wr).cast("double") + 0.00000001, 6
        ).alias("p"),
    ).orderBy("cur", "nxt")


# --------------------------------------------------------------------------
# robust anomaly scoring (median / MAD)
# --------------------------------------------------------------------------

_MAD_CONSISTENCY = 1.4826  # normal-consistency constant for MAD -> sigma


@register(
    "anomaly_mad_robust",
    f"""
    WITH obs AS (
      SELECT event_type, date_trunc('hour', ts) AS pt,
             round(CAST(CAST(avg(value) AS REAL) AS DOUBLE), 4) AS v
      FROM events GROUP BY 1, 2
    ),
    med AS (SELECT event_type, median(v) AS m FROM obs GROUP BY 1),
    mad AS (
      SELECT o.event_type, median(abs(o.v - med.m)) AS mad
      FROM obs o JOIN med USING (event_type) GROUP BY 1
    )
    SELECT o.event_type, strftime(o.pt, '%Y-%m-%d %H:00') AS hour, o.v,
           round((o.v - med.m) / ({_MAD_CONSISTENCY} * mad.mad)
                 + 0.00000001, 4) AS robust_z
    FROM obs o
    JOIN med USING (event_type)
    JOIN mad USING (event_type)
    WHERE mad.mad > 0
    ORDER BY abs((o.v - med.m) / ({_MAD_CONSISTENCY} * mad.mad)) DESC,
             o.event_type, o.pt
    LIMIT 20
    """,
)
def anomaly_mad_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 hourly anomalies by ROBUST z-score: per event type, score
    each hour's mean value by its distance from the type's median in
    MAD units (median absolute deviation x 1.4826, the normal-
    consistency constant — Hampel's outlier rule). Unlike the
    mean/stddev z-score (stream_anomaly_flags), the estimators here
    have a 50% breakdown point, so the anomalies themselves cannot mask
    the threshold — the standard robust upgrade for alerting baselines.

    Plan: hourly pre-aggregate FIRST (the ts-family rule) so everything
    downstream runs on types x hours cardinality; the two exact medians
    (center, then spread) are per-type aggregates over that bounded
    frame, broadcast back (|types| rows each). Exact median at raw
    100 TB cardinality would be the wrong tool — there the t-digest
    sketch (sketch_tdigest_rollup) substitutes; after the calendar-
    bounded rollup, exact is both correct and cheap. Spark's median()
    and DuckDB's are the same interpolated quantile_cont(0.5).
    """
    ev = load_events(spark, sf_dir)
    obs = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("pt")
    ).agg(_f32_avg4().alias("v"))
    med = obs.groupBy("event_type").agg(F.median("v").alias("m"))
    dev = obs.join(F.broadcast(med), "event_type")
    mad = dev.groupBy("event_type").agg(
        F.median(F.abs(F.col("v") - F.col("m"))).alias("mad")
    )
    z = (F.col("v") - F.col("m")) / (F.lit(_MAD_CONSISTENCY) * F.col("mad"))
    return (
        dev.join(F.broadcast(mad.where(F.col("mad") > 0)), "event_type")
        .select(
            "event_type",
            F.date_format("pt", "yyyy-MM-dd HH:00").alias("hour"),
            "v",
            F.round(z + 0.00000001, 4).alias("robust_z"),
            F.abs(z).alias("_absz"),
            F.col("pt").alias("_pt"),
        )
        .orderBy(F.col("_absz").desc(), "event_type", "_pt")
        .limit(20)
        .drop("_absz", "_pt")
    )


# --------------------------------------------------------------------------
# k-core extraction
# --------------------------------------------------------------------------

_KCORE_K = 5
_KCORE_ROUNDS = 3


def _kcore_oracle() -> str:
    """Unroll the synchronous peels: e_i = edges of the subgraph induced
    by the round-(i-1) survivors, a_i = endpoints with induced degree
    >= k — the SQL twin of operators/graph.py:k_core."""
    steps = []
    # Every CTE is MATERIALIZED (DuckDB planner hint, zero semantic
    # change): un-hinted, DuckDB re-inlines each peel's e_i/a_i into the
    # next round's IN-subqueries — the unrolled pipeline recomputes
    # everything per reference and runs ~11 s at sf0.1 vs ~0.4 s hinted,
    # identical rows (same pathology as graph_triangle_count's).
    for i in range(1, _KCORE_ROUNDS + 1):
        steps.append(
            f"""e{i} AS MATERIALIZED (
      SELECT u, v FROM und
      WHERE u IN (SELECT node FROM a{i - 1})
        AND v IN (SELECT node FROM a{i - 1})
    ),
    a{i} AS MATERIALIZED (
      SELECT node FROM (
        SELECT u AS node FROM e{i} UNION ALL SELECT v AS node FROM e{i}
      ) GROUP BY node HAVING COUNT(*) >= {_KCORE_K}
    )"""
        )
    its = ",\n    ".join(steps)
    return f"""
    WITH pairs AS MATERIALIZED (
      SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    und AS MATERIALIZED (SELECT c AS u, s AS v FROM pairs),
    a0 AS MATERIALIZED (
      SELECT DISTINCT node FROM (
        SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und
      )
    ),
    {its}
    SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS side,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(MIN((node - node % 2) / 2) AS BIGINT) AS min_key,
           CAST(MAX((node - node % 2) / 2) AS BIGINT) AS max_key
    FROM a{_KCORE_ROUNDS} GROUP BY 1 ORDER BY side
    """


@register("graph_kcore_trade", _kcore_oracle())
def graph_kcore_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-core of the customer<->supplier trade graph after 3
    synchronous peeling rounds (operators/graph.py:k_core): the densely
    connected trading core that survives after every thin participant —
    and everyone whose connectivity depended on thin participants — is
    removed. Per side, the survivor count and key range.

    Scale shape: per peel, TWO semi-joins of the persisted canonical
    edge list against the shrinking alive set plus one map-side-combined
    degree count — no windows, no iteration-growing lineage
    (localCheckpoint per round, the module rule). The oracle unrolls the
    identical peels, so each round's survivor set is checked exactly,
    not just the final cardinality.
    """
    from ..operators.graph import k_core

    pairs = _trade_pairs(spark, sf_dir).select(
        F.col("c").alias("src"), F.col("s").alias("dst")
    )
    core = k_core(pairs, k=_KCORE_K, rounds=_KCORE_ROUNDS)
    key = ((F.col("node") - F.col("node") % 2) / 2).cast("long")
    return (
        core.groupBy(
            F.when(F.col("node") % 2 == 0, F.lit("customer"))
            .otherwise(F.lit("supplier"))
            .alias("side")
        )
        .agg(
            F.count("*").cast("long").alias("n_nodes"),
            F.min(key).cast("long").alias("min_key"),
            F.max(key).cast("long").alias("max_key"),
        )
        .orderBy("side")
    )


# --------------------------------------------------------------------------
# equi-depth histogram
# --------------------------------------------------------------------------

_EQUIDEPTH_BUCKETS = 10


@register(
    "histogram_equidepth",
    f"""
    WITH r AS (
      SELECT l_extendedprice AS val,
             row_number() OVER (ORDER BY l_extendedprice, l_orderkey,
                                l_linenumber) AS rnk,
             count(*) OVER () AS n
      FROM lineitem
    )
    SELECT CAST(((rnk - 1) * {_EQUIDEPTH_BUCKETS}) // n AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           round(min(val), 2) AS lo,
           round(max(val), 2) AS hi
    FROM r GROUP BY 1 ORDER BY bucket
    """,
)
def histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-height) histogram of l_extendedprice: 10
    buckets holding (near-)equal row counts, each reporting its value
    range — the optimizer-statistics / feature-binning companion to the
    equi-WIDTH histogram_extendedprice. Depth boundaries come from the
    exact global rank, so bucket populations differ by at most one row
    no matter how skewed the values.

    Scale shape: the rank is operators/scale.py:global_rank — ONE range
    shuffle, narrow per-partition prefix counts, broadcast offsets —
    never a single-partition ORDER BY (the oracle's row_number() over
    one partition is DuckDB's privilege, not the engine's). The total
    count is a 1-row broadcast (whitelisted scalar crossJoin), the
    bucket id is pure integer arithmetic ((rank-1)*B DIV N — exact,
    no float boundary jitter), and the final rollup is a
    map-side-combined aggregate down to B rows.
    """
    from ..operators.scale import global_rank

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("val"), "l_orderkey", "l_linenumber"
    )
    ranked = global_rank(li, ["val", "l_orderkey", "l_linenumber"], rank_col="rnk")
    n = li.agg(F.count("*").alias("n"))
    return (
        ranked.crossJoin(F.broadcast(n))
        .groupBy(
            F.expr(
                f"CAST(((rnk - 1) * {_EQUIDEPTH_BUCKETS}) DIV n AS BIGINT)"
            ).alias("bucket")
        )
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.round(F.min("val"), 2).alias("lo"),
            F.round(F.max("val"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# SCD2-style state-run compression
# --------------------------------------------------------------------------

@register(
    "scd2_state_runs",
    """
    WITH s AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev
      FROM events
    ),
    runs AS (
      SELECT user_id, event_type, event_id, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to
      FROM s WHERE prev IS NULL OR prev <> event_type
    )
    SELECT user_id, event_type,
           strftime(valid_from, '%Y-%m-%d %H:%M:%S') AS valid_from,
           CAST(epoch_ms(valid_to) - epoch_ms(valid_from) AS BIGINT)
             AS duration_ms
    FROM runs WHERE valid_to IS NOT NULL
    ORDER BY duration_ms DESC, user_id, event_id
    LIMIT 20
    """,
)
def scd2_state_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2-style run-length compression of each user's event-type
    stream: collapse consecutive same-type events into one
    [valid_from, valid_to) state interval — the type-2
    slowly-changing-dimension build step (and the RLE that CDC
    pipelines apply before landing history tables) — then surface the
    20 longest-held states. Open (last) intervals are excluded; they
    have no end yet.

    Plan: ONE hash shuffle on user_id serves both windows (the
    change-detection lag and the interval-closing lead run on the same
    partitioning — Catalyst plans a single exchange), the run filter
    drops every non-boundary row before anything wide happens, and the
    global top-20 is a TakeOrdered, not a sort. Duration math is exact
    integer epoch-millis on both engines.
    """
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.lag("event_type").over(w).alias("prev"),
    )
    runs = (
        s.where(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
        .select(
            "user_id",
            "event_type",
            "event_id",
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
        )
    )
    return (
        runs.where(F.col("valid_to").isNotNull())
        .select(
            "user_id",
            "event_type",
            F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias(
                "valid_from"
            ),
            (F.unix_millis("valid_to") - F.unix_millis("valid_from"))
            .cast("long")
            .alias("duration_ms"),
            "event_id",
        )
        .orderBy(F.col("duration_ms").desc(), "user_id", "event_id")
        .limit(20)
        .drop("event_id")
    )


# --------------------------------------------------------------------------
# chi-square independence (type x hour-of-day)
# --------------------------------------------------------------------------

@register(
    "stats_chi2_independence",
    """
    WITH o AS (
      SELECT event_type, CAST(hour(ts) AS INT) AS hod, count(*) AS c
      FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM o),
    rt AS (SELECT event_type, CAST(sum(c) AS DOUBLE) AS r FROM o GROUP BY 1),
    ct AS (SELECT hod, CAST(sum(c) AS DOUBLE) AS col FROM o GROUP BY 1)
    SELECT o.event_type,
           CAST(sum(o.c) AS BIGINT) AS n_events,
           round(CAST(CAST(sum(pow(o.c - rt.r * ct.col / tot.n, 2)
                                / (rt.r * ct.col / tot.n)) AS REAL)
                      AS DOUBLE) + 0.00000001, 4) AS chi2_contrib
    FROM o
    JOIN rt USING (event_type)
    JOIN ct USING (hod)
    CROSS JOIN tot
    GROUP BY 1 ORDER BY 1
    """,
)
def stats_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square contributions for the event_type x hour-of-day
    contingency table: per type, sum over hours of (observed -
    expected)^2 / expected under the independence model — the standard
    'does behavior vary by time of day' test statistic (total chi2 =
    sum of this column; dof = (types-1)*(hours-1)). PSI (drift_psi)
    compares two time slices of one distribution; this tests the joint
    structure itself.

    Scale shape: the contingency table is ONE map-side-combined
    aggregate down to types x 24 cells; the margins are aggregates OF
    that table (not rescans), joined back at dimension size, with the
    grand total a 1-row whitelisted scalar crossJoin. All inputs to the
    float math are exact integer counts; the 24-term sums go through
    the float32 squash + half-tie epsilon contract.
    """
    ev = load_events(spark, sf_dir)
    o = ev.groupBy(
        "event_type", F.hour("ts").cast("int").alias("hod")
    ).agg(F.count("*").alias("c"))
    o = o.localCheckpoint(eager=False)  # margins reuse the cells, not the scan
    tot = o.agg(F.sum("c").cast("double").alias("n"))
    rt = o.groupBy("event_type").agg(F.sum("c").cast("double").alias("r"))
    ct = o.groupBy("hod").agg(F.sum("c").cast("double").alias("col"))
    e = F.col("r") * F.col("col") / F.col("n")
    return (
        o.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "hod")
        .crossJoin(F.broadcast(tot))
        .groupBy("event_type")
        .agg(
            F.sum("c").cast("long").alias("n_events"),
            F.round(
                F.sum(F.pow(F.col("c") - e, 2) / e)
                .cast("float")
                .cast("double")
                + 0.00000001,
                4,
            ).alias("chi2_contrib"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# funnel time-to-convert
# --------------------------------------------------------------------------

@register(
    "funnel_time_to_convert",
    """
    WITH f AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'signup' THEN ts END) AS s,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS p
      FROM events GROUP BY 1
    ),
    d AS (
      SELECT CAST(epoch_ms(p) - epoch_ms(s) AS BIGINT) // 1000 AS dur_s
      FROM f WHERE s IS NOT NULL AND p IS NOT NULL AND p >= s
    )
    SELECT CAST(count(*) AS BIGINT) AS n_converted,
           CAST(floor(quantile_cont(dur_s, 0.5)) AS BIGINT) AS p50_s,
           CAST(floor(quantile_cont(dur_s, 0.9)) AS BIGINT) AS p90_s,
           CAST(max(dur_s) AS BIGINT) AS max_s
    FROM d
    """,
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time from first signup to first purchase, per converting user
    (first-touch pairing; users whose first purchase precedes their
    first signup are non-converters by definition), summarized as
    p50/p90/max seconds — the latency companion to funnel_stages'
    conversion rates.

    Scale shape: ONE hash aggregate collapses the stream to a row per
    user (conditional min-timestamps — no window, no self-join); the
    duration is floored to whole seconds BEFORE the exact percentile,
    so the percentile aggregate's state is bounded by the calendar
    span in seconds (a few million distinct values at any corpus
    size), not by the user count. Percentiles interpolate identically
    (quantile_cont == Spark percentile); epoch math is exact integers.
    """
    ev = load_events(spark, sf_dir)
    f = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "signup", F.col("ts"))
        ).alias("s"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("p"),
    )
    d = f.where(
        F.col("s").isNotNull() & F.col("p").isNotNull() & (F.col("p") >= F.col("s"))
    ).select(
        ((F.unix_millis("p") - F.unix_millis("s")) / 1000)
        .cast("long")
        .alias("dur_s")
    )
    return d.agg(
        F.count("*").cast("long").alias("n_converted"),
        # explicit floor: DuckDB CAST(double AS BIGINT) rounds, Spark
        # truncates — floor() first makes both engines agree on .5 points.
        # One percentile buffer for both quantiles (r12): the array form
        # sorts once; per-element results bit-identical to the scalars.
        F.floor(
            F.percentile("dur_s", F.array(F.lit(0.5), F.lit(0.9)))[0]
        ).cast("long").alias("p50_s"),
        F.floor(
            F.percentile("dur_s", F.array(F.lit(0.5), F.lit(0.9)))[1]
        ).cast("long").alias("p90_s"),
        F.max("dur_s").cast("long").alias("max_s"),
    )


# --------------------------------------------------------------------------
# weighted shortest paths (Bellman-Ford rounds)
# --------------------------------------------------------------------------

_SSSP_ROUNDS = 4


def _sssp_oracle() -> str:
    """Unroll the min-plus relaxation: d_i = MIN(d_{i-1}, min over
    in-edges of d_{i-1}[src] + w) — each CTE bounded by |nodes|, the
    SQL twin of operators/graph.py:bellman_ford."""
    steps = []
    for i in range(1, _SSSP_ROUNDS + 1):
        steps.append(
            f"""d{i} AS (
      SELECT node, MIN(d) AS d FROM (
        SELECT node, d FROM d{i - 1}
        UNION ALL
        SELECT e.dst AS node, p.d + e.w AS d
        FROM edges e JOIN d{i - 1} p ON e.src = p.node
      ) GROUP BY node
    )"""
        )
    its = ",\n    ".join(steps)
    return f"""
    WITH cnt AS (
      SELECT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s,
             CAST(COUNT(*) AS DOUBLE) AS n
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2
    ),
    edges AS (
      SELECT c AS src, s AS dst, 1.0 / n AS w FROM cnt
      UNION ALL
      SELECT s AS src, c AS dst, 1.0 / n AS w FROM cnt
    ),
    d0 AS (
      SELECT DISTINCT s_suppkey * 2 + 1 AS node, 0.0 AS d
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = '{_BFS_SEED_NATION}'
    ),
    {its}
    SELECT CAST((node - 1) / 2 AS BIGINT) AS s_suppkey,
           round(d + 0.00000001, 6) AS dist
    FROM d{_SSSP_ROUNDS}
    WHERE node % 2 = 1 AND d > 0
    ORDER BY d, s_suppkey
    LIMIT 20
    """


@register("graph_sssp_weighted", _sssp_oracle())
def graph_sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted shortest paths from the NATION_3 suppliers over the
    trade graph, edge length = 1/(trade count) so heavily-traded links
    are SHORT — the 20 non-seed suppliers most tightly coupled to the
    seed nation's supply base within 4 relaxation rounds
    (operators/graph.py:bellman_ford). The weighted sibling of
    graph_shortest_hops: hop count answers "reachable?", this answers
    "how strongly coupled?".

    Scale shape: min-plus Pregel — per round one hash join of the
    reached-distance table onto the persisted weighted edge list and a
    map-side-combined MIN per node; the distance table only ever holds
    reached nodes (absent row = infinity). Distances are mins over an
    identical candidate multiset in both engines (same IEEE doubles),
    so no summation-order hazard exists; epsilon + 6dp round guards the
    display rounding only.
    """
    from ..operators.graph import bellman_ford

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    cnt = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .agg(F.count("*").cast("double").alias("n"))
    )
    edges = cnt.select(
        F.col("c").alias("src"), F.col("s").alias("dst"), (1.0 / F.col("n")).alias("w")
    ).union(
        cnt.select(
            F.col("s").alias("src"),
            F.col("c").alias("dst"),
            (1.0 / F.col("n")).alias("w"),
        )
    )
    seeds = _seed_supplier_nodes(spark, sf_dir)
    dist = bellman_ford(edges, seeds, _SSSP_ROUNDS)
    return (
        dist.where((F.col("node") % 2 == 1) & (F.col("dist") > 0))
        .select(
            ((F.col("node") - 1) / 2).cast("long").alias("s_suppkey"),
            F.round(F.col("dist") + 0.00000001, 6).alias("dist"),
            # rank-20 cut on the RAW distance (the oracle's ORDER BY d):
            # rounding first could merge distinct raw values at the
            # boundary and let the engines pick different row sets
            F.col("dist").alias("_raw"),
        )
        .orderBy("_raw", "s_suppkey")
        .limit(20)
        .drop("_raw")
    )


# --------------------------------------------------------------------------
# Gini concentration
# --------------------------------------------------------------------------

@register(
    "stats_gini_spend",
    """
    WITH spend AS (
      SELECT o_custkey, round(sum(o_totalprice), 2) AS v
      FROM orders GROUP BY 1
    ),
    r AS (
      SELECT v, row_number() OVER (ORDER BY v, o_custkey) AS i FROM spend
    )
    SELECT CAST(count(*) AS BIGINT) AS n_customers,
           round(CAST(CAST(sum(v) AS REAL) AS DOUBLE) + 0.00000001, 0)
             AS total_spend,
           round(2.0 * sum(i * v) / (count(*) * sum(v))
                 - (count(*) + 1.0) / count(*) + 0.00000001, 6) AS gini
    FROM r
    """,
)
def stats_gini_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend concentration — the standard
    inequality metric (0 = everyone spends equally, ->1 = one whale),
    via the rank identity G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n over
    ascending-sorted spend. The same statistic reports dataset-skew
    concentration (does 1% of sources contribute 90% of tokens?), which
    is why it sits in the analytics family next to skew_key_profile.

    Scale shape: spend collapses to a row per customer in one hash
    aggregate (per-customer sums rounded to cents so both engines'
    rank order is identical); the rank is the distributed global_rank
    (range shuffle + broadcast offsets — no single-partition window at
    any customer count); the identity needs only THREE scalar
    aggregates over the ranked rows. The final ratio is O(1) with
    ~1e-15 relative summation noise, absorbed by the epsilon + 6dp
    round; total_spend is float32-squashed per the summation contract.
    """
    from ..operators.scale import global_rank

    o = _t(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("v")
    )
    ranked = global_rank(spend, ["v", "o_custkey"], rank_col="i")
    n = F.count("*")
    s = F.sum("v")
    si = F.sum(F.col("i") * F.col("v"))
    return ranked.agg(
        n.cast("long").alias("n_customers"),
        F.round(
            s.cast("float").cast("double") + 0.00000001, 0
        ).alias("total_spend"),
        F.round(
            2.0 * si / (n * s) - (n + 1.0) / n + 0.00000001, 6
        ).alias("gini"),
    )


# --------------------------------------------------------------------------
# forecast baseline evaluation (seasonal-naive + MASE)
# --------------------------------------------------------------------------

@register(
    "ts_forecast_eval",
    """
    WITH obs AS (
      SELECT event_type, date_trunc('hour', ts) AS pt,
             round(CAST(CAST(avg(value) AS REAL) AS DOUBLE), 4) AS v
      FROM events GROUP BY 1, 2
    ),
    w AS (
      SELECT event_type, pt, v,
             lag(v, 24) OVER (PARTITION BY event_type ORDER BY pt) AS snaive,
             lag(v, 1) OVER (PARTITION BY event_type ORDER BY pt) AS naive1
      FROM obs
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_scored,
           round(CAST(CAST(avg(abs(v - snaive)) AS REAL) AS DOUBLE)
                 + 0.00000001, 4) AS mae_snaive,
           round(CAST(CAST(avg(abs(v - naive1)) AS REAL) AS DOUBLE)
                 + 0.00000001, 4) AS mae_naive1,
           round(CAST(CAST(avg(abs(v - snaive)) AS REAL) AS DOUBLE)
                 / CAST(CAST(avg(abs(v - naive1)) AS REAL) AS DOUBLE)
                 + 0.00000001, 4) AS mase
    FROM w WHERE snaive IS NOT NULL AND naive1 IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
)
def ts_forecast_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-baseline scorecard per event type: the seasonal-naive
    predictor (this hour = same hour yesterday, lag 24) scored against
    the naive-1 random walk via MASE (Hyndman & Koehler 2006, the
    scale-free forecast-accuracy standard: MASE < 1 means the seasonal
    baseline beats the naive benchmark — the go/no-go gate before any
    fancier model earns its complexity).

    Plan posture is the ts-family rule: hourly pre-aggregate FIRST, so
    both lag windows and the scoring rollup run on types x hours
    cardinality over ONE event_type shuffle. Rows too early to have
    both references (the first day) are excluded from scoring in both
    engines; MAEs go through the float32 squash + half-tie epsilon.
    """
    ev = load_events(spark, sf_dir)
    obs = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("pt")
    ).agg(_f32_avg4().alias("v"))
    w = Window.partitionBy("event_type").orderBy("pt")
    scored = obs.select(
        "event_type",
        "v",
        F.lag("v", 24).over(w).alias("snaive"),
        F.lag("v", 1).over(w).alias("naive1"),
    ).where(F.col("snaive").isNotNull() & F.col("naive1").isNotNull())
    mae_s = F.avg(F.abs(F.col("v") - F.col("snaive"))).cast("float").cast("double")
    mae_1 = F.avg(F.abs(F.col("v") - F.col("naive1"))).cast("float").cast("double")
    return (
        scored.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_scored"),
            F.round(mae_s + 0.00000001, 4).alias("mae_snaive"),
            F.round(mae_1 + 0.00000001, 4).alias("mae_naive1"),
            F.round(mae_s / mae_1 + 0.00000001, 4).alias("mase"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# behavioral path mining (order-2 sequences)
# --------------------------------------------------------------------------

@register(
    "path_trigrams",
    """
    WITH seq AS (
      SELECT event_type AS a,
             lead(event_type, 1) OVER w AS b,
             lead(event_type, 2) OVER w AS c
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT a, b, c, CAST(count(*) AS BIGINT) AS n
    FROM seq WHERE c IS NOT NULL
    GROUP BY a, b, c
    ORDER BY n DESC, a, b, c
    LIMIT 20
    """,
)
def path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 three-event behavioral paths across all user journeys —
    the order-2 sequence-mining companion to markov_event_transitions
    (order-1): funnels that exist in the data rather than the ones the
    analyst guessed (pattern_match_funnel tests hypotheses; this mines
    them).

    Plan: ONE hash shuffle on user_id carries both lead() offsets (same
    window spec), then a map-side-combined count over at most |types|^3
    groups and a TakeOrdered top-k. Nothing downstream of the window
    scales with the event count.
    """
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("a"),
        F.lead("event_type", 1).over(w).alias("b"),
        F.lead("event_type", 2).over(w).alias("c"),
    ).where(F.col("c").isNotNull())
    return (
        seq.groupBy("a", "b", "c")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.col("n").desc(), "a", "b", "c")
        .limit(20)
    )


# --------------------------------------------------------------------------
# ABC (Pareto) classification
# --------------------------------------------------------------------------

_ABC_CUT_A = 0.8
_ABC_CUT_B = 0.95


@register(
    "abc_classification",
    f"""
    WITH rev AS (
      SELECT l_partkey,
             CAST(round(sum(l_extendedprice * (1 - l_discount)) * 100, 0)
                  AS BIGINT) AS cents
      FROM lineitem GROUP BY 1
    ),
    ranked AS (
      SELECT l_partkey, cents,
             sum(cents) OVER (ORDER BY cents DESC, l_partkey
                              ROWS UNBOUNDED PRECEDING) AS cum,
             sum(cents) OVER () AS total
      FROM rev
    )
    SELECT CASE WHEN cum <= {_ABC_CUT_A} * total THEN 'A'
                WHEN cum <= {_ABC_CUT_B} * total THEN 'B'
                ELSE 'C' END AS abc_class,
           CAST(count(*) AS BIGINT) AS n_parts,
           round(sum(cents) / 100.0 + 0.00000001, 0) AS class_revenue
    FROM ranked GROUP BY 1 ORDER BY abc_class
    """,
)
def abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto analysis of part revenue: rank parts by revenue
    descending, classify by cumulative revenue share (A = the head
    parts covering the first 80%, B = to 95%, C = the long tail) — the
    inventory-management classic, and on a data platform the "which 5%
    of sources are 80% of my tokens" report next to stats_gini_spend
    (Gini scores the inequality; ABC names the members).

    Scale shape: per-part revenue is one hash aggregate, carried as
    EXACT integer cents — cumulative sum, grand total, and the
    boundary comparison (cum <= cutoff * total) are then all exact
    integer/one-multiplication arithmetic, so a part sitting ulps from
    a cutoff can never classify differently across engines (a float
    grand total is order-dependent; an integer one is not). The one
    remaining float seam is UPSTREAM of the integer domain: each
    part's cents derive from round(sum(double)*100), so a part whose
    revenue sum sits within an ulp of a half-cent can round to
    different cents across accumulation orders — stable at every gate
    SF (four-leg audit), observed once as a ±1-cent class-total flip
    on the round-12 synthetic-sf1 layout (10x the parts = 10x the
    boundary trials); the classification machinery itself stayed
    exact (identical n_parts per class). The
    descending cumulative sum is the distributed global_cumsum over
    the negated-cents order — one range shuffle, never a
    single-partition ORDER BY; the grand total is a 1-row whitelisted
    scalar crossJoin and the class rollup is 3 rows.
    """
    from ..operators.scale import global_cumsum

    li = _t(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 100,
            0,
        )
        .cast("long")
        .alias("cents")
    )
    ranked = global_cumsum(
        rev.withColumn("_negcents", -F.col("cents")),
        ["_negcents", "l_partkey"],
        "cents",
        cumsum_col="cum",
    )
    total = rev.agg(F.sum("cents").alias("total"))
    cls = (
        F.when(F.col("cum") <= _ABC_CUT_A * F.col("total"), F.lit("A"))
        .when(F.col("cum") <= _ABC_CUT_B * F.col("total"), F.lit("B"))
        .otherwise(F.lit("C"))
    )
    return (
        ranked.crossJoin(F.broadcast(total))
        .groupBy(cls.alias("abc_class"))
        .agg(
            F.count("*").cast("long").alias("n_parts"),
            F.round(F.sum("cents") / 100.0 + 0.00000001, 0).alias(
                "class_revenue"
            ),
        )
        .orderBy("abc_class")
    )


# --------------------------------------------------------------------------
# SCD2 point-in-time join
# --------------------------------------------------------------------------

@register(
    "scd2_point_in_time_join",
    """
    WITH touches AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev
      FROM events WHERE event_type <> 'purchase'
    ),
    states AS (
      SELECT user_id, event_type AS state, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to
      FROM touches WHERE prev IS NULL OR prev <> event_type
    ),
    joined AS (
      SELECT p.user_id, p.ts,
             coalesce(s.state, 'direct') AS state,
             CAST(epoch_ms(p.ts) - epoch_ms(s.valid_from) AS BIGINT) AS into_ms
      FROM (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
      LEFT JOIN states s
        ON s.user_id = p.user_id
       AND s.valid_from <= p.ts
       AND (s.valid_to IS NULL OR p.ts < s.valid_to)
    )
    SELECT state, CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(floor(avg(into_ms)) AS BIGINT) AS avg_ms_into_state
    FROM joined GROUP BY state ORDER BY state
    """,
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (as-of interval) join of purchases against the
    user's SCD2 state table: build [valid_from, valid_to) intervals
    from the non-purchase event stream (the scd2_state_runs RLE, open
    tail = NULL end), then land each purchase in the interval that
    CONTAINS its timestamp — the dimension-join every warehouse does
    against a type-2 history table ("what plan/state was the customer
    on when the order happened"). Purchases before any touch fall out
    of every interval and credit 'direct'. Semantically this
    cross-checks attribution_last_touch by a completely different plan
    family (interval containment vs running window) while adding the
    time-into-state feature a window can't cheaply give.

    Plan: the state build is one user_id shuffle (two windows on one
    exchange); the PIT join carries the user_id EQUALITY key, so it is
    a plain hash join with the interval containment as a residual
    predicate — never a range-only join — and intervals partition each
    user's timeline, so the join multiplicity is exactly 0-or-1 per
    purchase. avg(into_ms) is an average of exact integers, floored in
    both engines (DuckDB CAST rounds, Spark truncates — floor first).
    """
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    touches = ev.where(F.col("event_type") != "purchase").select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.lag("event_type").over(w).alias("prev"),
    )
    states = (
        touches.where(
            F.col("prev").isNull() | (F.col("prev") != F.col("event_type"))
        )
        .select(
            F.col("user_id").alias("s_user"),
            F.col("event_type").alias("state"),
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(
                Window.partitionBy("user_id").orderBy("ts", "event_id")
            ).alias("valid_to"),
        )
    )
    p = ev.where(F.col("event_type") == "purchase").select("user_id", "ts")
    joined = p.join(
        states,
        (F.col("s_user") == F.col("user_id"))
        & (F.col("valid_from") <= F.col("ts"))
        & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to"))),
        "left",
    ).select(
        F.coalesce(F.col("state"), F.lit("direct")).alias("state"),
        (F.unix_millis("ts") - F.unix_millis("valid_from"))
        .cast("long")
        .alias("into_ms"),
    )
    return (
        joined.groupBy("state")
        .agg(
            F.count("*").cast("long").alias("n_purchases"),
            F.floor(F.avg("into_ms")).cast("long").alias("avg_ms_into_state"),
        )
        .orderBy("state")
    )


# --------------------------------------------------------------------------
# cross-series correlation matrix
# --------------------------------------------------------------------------

@register(
    "ts_cross_correlation",
    f"""
    WITH obs AS (
      SELECT event_type, date_trunc('hour', ts) AS pt,
             {_F32_HOURLY_AVG_SQL} AS v
      FROM events GROUP BY 1, 2
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(count(*) AS BIGINT) AS n_hours,
           round(corr(a.v, b.v) + 0.00000001, 4) AS corr_hourly
    FROM obs a JOIN obs b
      ON a.pt = b.pt AND a.event_type < b.event_type
    GROUP BY 1, 2 ORDER BY type_a, type_b
    """,
)
def ts_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation between every two event types'
    hourly series — the co-movement matrix behind "do errors spike when
    purchases spike" dashboards and lead-lag hypothesis screening
    (ts_autocorr is one series vs its own past; this is series vs
    series at lag 0).

    Plan: the shared hourly pre-aggregate collapses the stream to
    types x hours rows FIRST (the ts-family rule), so the hour-aligned
    self-join and the |types|^2/2 corr aggregates all run on
    calendar-bounded cardinality — one exchange on the hour key, co-
    moment (corr) aggregation map-side combined. Correlation of the
    already-float32-squashed series rounds under the half-tie epsilon.
    """
    ev = load_events(spark, sf_dir)
    obs = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("pt")
    ).agg(_f32_avg4().alias("v"))
    a = obs.select(
        F.col("event_type").alias("type_a"), "pt", F.col("v").alias("va")
    )
    b = obs.select(
        F.col("event_type").alias("type_b"), "pt", F.col("v").alias("vb")
    )
    return (
        a.join(b, "pt")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.count("*").cast("long").alias("n_hours"),
            F.round(F.corr("va", "vb") + 0.00000001, 4).alias("corr_hourly"),
        )
        .orderBy("type_a", "type_b")
    )


# --------------------------------------------------------------------------
# pinball-loss quantile-forecast evaluation
# --------------------------------------------------------------------------

@register(
    "eval_pinball_loss",
    f"""
    WITH obs AS (
      SELECT event_type, date_trunc('hour', ts) AS pt,
             {_F32_HOURLY_AVG_SQL} AS v
      FROM events GROUP BY 1, 2
    ),
    cut AS (
      SELECT (CAST(epoch_ms(min(pt)) AS BIGINT)
              + CAST(epoch_ms(max(pt)) AS BIGINT)) // 2 AS cut_ms
      FROM obs
    ),
    pred AS (
      SELECT event_type,
             quantile_cont(v, 0.5) AS q50, quantile_cont(v, 0.9) AS q90
      FROM obs CROSS JOIN cut
      WHERE CAST(epoch_ms(pt) AS BIGINT) < cut_ms GROUP BY 1
    )
    SELECT o.event_type,
           CAST(count(*) AS BIGINT) AS n_eval,
           round(CAST(CAST(avg(
             CASE WHEN o.v >= p.q50 THEN 0.5 * (o.v - p.q50)
                  ELSE 0.5 * (p.q50 - o.v) END) AS REAL) AS DOUBLE)
             + 0.00000001, 4) AS pinball_q50,
           round(CAST(CAST(avg(
             CASE WHEN o.v >= p.q90 THEN 0.9 * (o.v - p.q90)
                  ELSE 0.1 * (p.q90 - o.v) END) AS REAL) AS DOUBLE)
             + 0.00000001, 4) AS pinball_q90
    FROM obs o
    JOIN pred p USING (event_type)
    CROSS JOIN cut
    WHERE CAST(epoch_ms(o.pt) AS BIGINT) >= cut_ms
    GROUP BY o.event_type ORDER BY o.event_type
    """,
)
def eval_pinball_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-forecast scorecard: calibrate constant q50/q90
    predictors per type on the first calendar half of the hourly
    series, score them on the second half with the pinball (quantile)
    loss — the proper scoring rule for quantile forecasts (Koenker &
    Bassett 1978; what M5-uncertainty and every SLA-percentile model
    is graded on). Complements ts_forecast_eval (MASE scores point
    forecasts; pinball scores quantile bands).

    Plan: hourly pre-aggregate first (shared ts-family contract); the
    calendar split point is a 1-row min/max broadcast compared in
    exact integer epoch-millis; calibration quantiles are per-type
    exact percentiles over the half series (calendar-bounded state);
    scoring is one map-side-combined aggregate. Pinball terms are
    piecewise-linear in already-squashed values; the averages go
    through the float32 squash + half-tie epsilon.
    """
    ev = load_events(spark, sf_dir)
    obs = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("pt")
    ).agg(_f32_avg4().alias("v"))
    cut = obs.agg(
        (
            (F.unix_millis(F.min("pt")) + F.unix_millis(F.max("pt"))) / 2
        )
        .cast("long")
        .alias("cut_ms")
    )
    withcut = obs.crossJoin(F.broadcast(cut))
    pred = (
        withcut.where(F.unix_millis("pt") < F.col("cut_ms"))
        .groupBy("event_type")
        .agg(
            # one buffer for both quantiles (r12): identical aggregate
            # expressions share one sort; bit-identical per element
            F.percentile("v", F.array(F.lit(0.5), F.lit(0.9)))[0].alias("q50"),
            F.percentile("v", F.array(F.lit(0.5), F.lit(0.9)))[1].alias("q90"),
        )
    )
    loss50 = F.when(
        F.col("v") >= F.col("q50"), 0.5 * (F.col("v") - F.col("q50"))
    ).otherwise(0.5 * (F.col("q50") - F.col("v")))
    loss90 = F.when(
        F.col("v") >= F.col("q90"), 0.9 * (F.col("v") - F.col("q90"))
    ).otherwise(0.1 * (F.col("q90") - F.col("v")))
    return (
        withcut.where(F.unix_millis("pt") >= F.col("cut_ms"))
        .join(F.broadcast(pred), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_eval"),
            F.round(
                F.avg(loss50).cast("float").cast("double") + 0.00000001, 4
            ).alias("pinball_q50"),
            F.round(
                F.avg(loss90).cast("float").cast("double") + 0.00000001, 4
            ).alias("pinball_q90"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# round 8: inferential-stats family — the A/B-measurement shapes a product
# pipeline runs over the same events table (Welch t, Mann-Whitney U,
# Kaplan-Meier survival, Theil-Sen robust trend, Benford digit audit)
# --------------------------------------------------------------------------

@register(
    "stats_welch_ttest",
    """
    WITH s AS (
      SELECT
        count(*) FILTER (event_type = 'purchase') AS n1,
        avg(value) FILTER (event_type = 'purchase') AS m1,
        var_samp(value) FILTER (event_type = 'purchase') AS v1,
        count(*) FILTER (event_type = 'click') AS n2,
        avg(value) FILTER (event_type = 'click') AS m2,
        var_samp(value) FILTER (event_type = 'click') AS v2
      FROM events WHERE value IS NOT NULL
    )
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           round(CAST(CAST(m1 - m2 AS REAL) AS DOUBLE) + 0.00000001, 4)
             AS mean_diff,
           round(CAST(CAST((m1 - m2) / sqrt(v1 / n1 + v2 / n2) AS REAL)
                      AS DOUBLE) + 0.00000001, 3) AS t_stat,
           round(CAST(CAST(pow(v1 / n1 + v2 / n2, 2)
                 / (pow(v1 / n1, 2) / (n1 - 1) + pow(v2 / n2, 2) / (n2 - 1))
                 AS REAL) AS DOUBLE) + 0.00000001, 1) AS welch_dof
    FROM s
    """,
)
def stats_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between two event populations
    (purchase vs click values) with the Welch-Satterthwaite dof — the
    default two-sample A/B statistic when variances differ. Thin display
    wrapper over operators/stats.py:welch_ttest (one conditional-
    aggregate pass, no join, no extra shuffle); float32-squash +
    half-tie-epsilon rounding on the way out, same as the chi2 family."""
    from ..operators.stats import welch_ttest

    ev = load_events(spark, sf_dir)
    s = welch_ttest(ev, "value", "event_type", "purchase", "click")
    return s.select(
        "n1",
        "n2",
        F.round(
            F.col("mean_diff").cast("float").cast("double") + 0.00000001, 4
        ).alias("mean_diff"),
        F.round(
            F.col("t_stat").cast("float").cast("double") + 0.00000001, 3
        ).alias("t_stat"),
        F.round(
            F.col("welch_dof").cast("float").cast("double") + 0.00000001, 1
        ).alias("welch_dof"),
    )


@register(
    "stats_mannwhitney_u",
    """
    WITH pooled AS (
      SELECT round(value, 3) AS v,
             count(*) FILTER (event_type = 'purchase') AS c1,
             count(*) FILTER (event_type = 'click') AS c2
      FROM events
      WHERE value IS NOT NULL AND event_type IN ('purchase', 'click')
      GROUP BY 1
    ),
    ranked AS (
      SELECT v, c1, c2,
             sum(c1 + c2) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS below,
             c1 + c2 AS ties
      FROM pooled
    ),
    agg AS (
      SELECT sum(c1) AS n1, sum(c2) AS n2,
             sum(c1 * (COALESCE(below, 0) + (ties + 1) / 2.0)) AS r1,
             sum(pow(ties, 3) - ties) AS tie_corr
      FROM ranked
    )
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           round(CAST(CAST(r1 - n1 * (n1 + 1) / 2.0 AS REAL) AS DOUBLE)
                 + 0.00000001, 1) AS u1,
           round(CAST(CAST(
             (r1 - n1 * (n1 + 1) / 2.0 - n1 * n2 / 2.0)
             / sqrt(n1 * n2 / 12.0 * ((n1 + n2 + 1)
                    - tie_corr / ((n1 + n2) * (n1 + n2 - 1.0))))
             AS REAL) AS DOUBLE) + 0.00000001, 3) AS z_stat
    FROM agg
    """,
)
def stats_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) between purchase and click
    values with midrank tie handling and the tie-corrected normal
    approximation — the nonparametric twin of stats_welch_ttest. Thin
    display wrapper over operators/stats.py:mannwhitney_u: values
    quantize to 3dp and aggregate to the DISTINCT value domain, midranks
    ride global_cumsum (one range shuffle over the value domain, never a
    single-partition rank). The oracle mirrors with a SQL window over
    the same quantized domain."""
    from ..operators.stats import mannwhitney_u

    ev = load_events(spark, sf_dir)
    agg = mannwhitney_u(ev, "value", "event_type", "purchase", "click")
    return agg.select(
        "n1",
        "n2",
        F.round(
            F.col("u1").cast("float").cast("double") + 0.00000001, 1
        ).alias("u1"),
        F.round(
            F.col("z_stat").cast("float").cast("double") + 0.00000001, 3
        ).alias("z_stat"),
    )


@register(
    "survival_kaplan_meier",
    """
    WITH mx AS (SELECT max(ts) AS mts FROM events),
    u AS (
      SELECT user_id,
             date_diff('day', min(ts), max(ts)) AS dur,
             CAST(max(ts) < (SELECT mts FROM mx) - INTERVAL 3 DAY
                  AS INT) AS observed
      FROM events GROUP BY 1
    ),
    n AS (SELECT count(*) AS total FROM u),
    d AS (
      SELECT dur,
             sum(observed) AS d_ev,
             sum(1 - observed) AS c_cen
      FROM u GROUP BY 1
    ),
    r AS (
      SELECT dur, d_ev, c_cen,
             (SELECT total FROM n)
               - COALESCE(sum(d_ev + c_cen) OVER (ORDER BY dur
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk
      FROM d
    ),
    s AS (
      SELECT dur, d_ev, c_cen, n_risk,
             sum(ln(greatest(1.0 - CAST(d_ev AS DOUBLE) / n_risk,
                             0.000000000001)))
               OVER (ORDER BY dur) AS ln_s
      FROM r
    )
    SELECT CAST(dur AS BIGINT) AS dur_days,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d_ev AS BIGINT) AS n_events,
           CAST(c_cen AS BIGINT) AS n_censored,
           round(CAST(CAST(exp(ln_s) AS REAL) AS DOUBLE) + 0.00000001, 4)
             AS survival
    FROM s ORDER BY dur_days
    """,
)
def survival_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival over user lifetimes (first->last event per
    user, in days): a user whose last event predates the corpus end by
    > 3 days churned (observed); later last-events are right-censored.
    Thin display wrapper over operators/stats.py:kaplan_meier — per-user
    lifetimes are ONE user-keyed aggregate; the day table is bounded by
    the observation window, so both running quantities (at-risk counts
    and the log-survival prefix) ride global_cumsum over that bounded
    domain (the Gini/ABC discipline). Corpus max(ts) broadcasts as a
    whitelisted 1-row scalar."""
    from ..operators.stats import kaplan_meier

    ev = load_events(spark, sf_dir)
    mx = ev.agg(F.max("ts").alias("mts"))
    u = (
        ev.groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts"))
        .crossJoin(F.broadcast(mx))
        .select(
            F.datediff(F.col("last_ts"), F.col("first_ts")).alias("dur"),
            (
                F.col("last_ts") < F.col("mts") - F.expr("INTERVAL 3 DAY")
            )
            .cast("int")
            .alias("observed"),
        )
    )
    s = kaplan_meier(u, "dur", "observed")
    return s.select(
        F.col("dur").cast("long").alias("dur_days"),
        "n_risk",
        "n_events",
        "n_censored",
        F.round(
            F.col("survival").cast("float").cast("double") + 0.00000001, 4
        ).alias("survival"),
    ).orderBy("dur_days")


@register(
    "ts_theilsen_slope",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS DOUBLE) AS c
      FROM events GROUP BY 1, 2
    ),
    slopes AS (
      SELECT a.event_type,
             (b.c - a.c) / date_diff('day', a.day, b.day) AS slope
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.day < b.day
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(CAST(CAST(quantile_cont(slope, 0.5) AS REAL) AS DOUBLE)
                 + 0.00000001, 4) AS theilsen_slope
    FROM slopes GROUP BY 1 ORDER BY 1
    """,
)
def ts_theilsen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per event type: the median of all pairwise
    slopes of the daily-count series — the breakdown-resistant
    complement to ts_trend_ols (a single outlier day shifts OLS, not the
    pairwise median; Sen 1968). Thin wrapper over
    operators/stats.py:theilsen_slope with x = integer day index, so the
    O(n^2) pairwise stage runs on the AGGREGATED daily series — C(|days|,
    2) pairs per type at any row count."""
    from ..operators.stats import theilsen_slope

    ev = load_events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").cast("double").alias("c"))
    daily = daily.select(
        "event_type",
        F.datediff("day", F.lit("2024-01-01")).alias("x"),
        F.col("c").alias("y"),
    ).localCheckpoint(eager=False)  # both join sides, one scan
    out = theilsen_slope(daily, "x", "y", by="event_type")
    return out.select(
        "event_type",
        "n_pairs",
        F.round(
            F.col("theilsen_slope").cast("float").cast("double")
            + 0.00000001,
            4,
        ).alias("theilsen_slope"),
    ).orderBy("event_type")


@register(
    "stats_benford_digits",
    """
    WITH d AS (
      SELECT CAST(floor(o_totalprice
               / pow(10, floor(log10(o_totalprice)))) AS INT) AS digit
      FROM orders WHERE o_totalprice > 0
    ),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM d)
    SELECT digit,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(CAST(count(*) / (SELECT total FROM n) AS REAL)
                      AS DOUBLE) + 0.00000001, 4) AS freq,
           round(CAST(CAST(log10(1.0 + 1.0 / digit) AS REAL) AS DOUBLE)
                 + 0.00000001, 4) AS benford_expected,
           round(CAST(CAST(abs(count(*) / (SELECT total FROM n)
                      - log10(1.0 + 1.0 / digit)) AS REAL) AS DOUBLE)
                 + 0.00000001, 4) AS abs_dev
    FROM d GROUP BY 1 ORDER BY 1
    """,
)
def stats_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals: observed
    first-significant-digit frequency vs the log10(1 + 1/d) expectation
    — the classic fabricated-data / corrupted-feed screen, useful as a
    data-quality gate on any monetary column. One map-side-combined
    aggregate to the 9-digit domain plus a whitelisted 1-row total;
    the digit extraction is pure JVM math (floor/log10), no UDF."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    d = o.select(
        F.floor(
            F.col("o_totalprice")
            / F.pow(F.lit(10.0), F.floor(F.log10("o_totalprice")))
        )
        .cast("int")
        .alias("digit")
    )
    d = d.localCheckpoint(eager=False)  # digit rows feed total + groupBy
    n = d.agg(F.count("*").cast("double").alias("total"))
    freq = F.count("*") / F.first("total")
    expected = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return (
        d.crossJoin(F.broadcast(n))
        .groupBy("digit")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(
                freq.cast("float").cast("double") + 0.00000001, 4
            ).alias("freq"),
            # abs_dev derives from the RAW freq/expectation (the oracle
            # mirrors); deriving it from the rounded columns loses the
            # last decimal at round boundaries
            F.round(
                F.abs(freq - expected).cast("float").cast("double")
                + 0.00000001,
                4,
            ).alias("abs_dev"),
        )
        .select(
            "digit",
            "n",
            "freq",
            F.round(
                expected.cast("float").cast("double") + 0.00000001, 4
            ).alias("benford_expected"),
            "abs_dev",
        )
        .orderBy("digit")
    )


@register(
    "stats_weighted_median",
    """
    WITH per_price AS (
      SELECT l_extendedprice AS p, CAST(sum(l_quantity) AS DOUBLE) AS w
      FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT sum(w) AS tw FROM per_price),
    cum AS (
      SELECT p, w, sum(w) OVER (ORDER BY p) AS cw FROM per_price
    )
    SELECT round(min(p), 2) AS weighted_median,
           CAST((SELECT tw FROM tot) AS DOUBLE) AS total_weight,
           CAST((SELECT count(*) FROM per_price) AS BIGINT)
             AS n_distinct_prices
    FROM cum WHERE cw >= (SELECT tw FROM tot) / 2.0
    """,
)
def stats_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted (lower) median: the smallest l_extendedprice at which
    the running l_quantity weight reaches half the total — 'the price a
    typical unit sold at', which the unweighted median misstates when
    quantities skew. Neither engine has a weighted-quantile builtin;
    the oracle states the running-sum semantics, and the Spark side
    computes the SAME crossing point by two-level bucket selection (r12:
    a full global cumsum materializes a running weight for EVERY
    distinct price when only the half-weight crossing is consumed —
    guide §1.2, don't compute things you throw away):

    1. weight per DISTINCT price (one map-side-combined shuffle; exact —
       integral quantities sum exactly in float64).
    2. per-$64-bucket weights + an exclusive prefix over the BUCKET
       frame: bounded by the price DOMAIN (~1.7k buckets over TPC-H's
       ~[900, 105k] span), never by data size, so the one-task window is
       the same dimension-sized class as the offsets windows elsewhere.
    3. the crossing bucket's own prices (cents-quantized ⇒ ≤ 6400
       distinct per bucket at ANY scale) get the only row-level running
       sum, seeded with the bucket prefix — again a domain-bounded
       one-task frame.

    Versus the previous global_cumsum shape this removes the full-domain
    range shuffle, its sort, and a Python prefix pass (measured
    1.4-3.1s -> ~0.7s at sf0.1; the remaining cost is the per-price
    aggregate). Exact, no interpolation: all running weights are sums of
    integral-valued doubles, so the crossing row is bit-deterministic."""
    li = _t(spark, sf_dir, "lineitem")
    per_price = li.groupBy(F.col("l_extendedprice").alias("p")).agg(
        F.sum("l_quantity").cast("double").alias("w")
    )
    per_price = per_price.localCheckpoint(eager=False)  # 3 consumers, 1 agg
    tot = per_price.agg(
        F.sum("w").alias("tw"), F.count("*").cast("long").alias("np")
    )
    bucket = F.floor(F.col("p") / 64.0)
    wb = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    bcum = (
        per_price.groupBy(bucket.alias("b"))
        .agg(F.sum("w").alias("bw"))
        .withColumn("boff", F.coalesce(F.sum("bw").over(wb), F.lit(0.0)))
    )
    # the crossing bucket: first whose inclusive prefix reaches half
    sel = (
        bcum.crossJoin(F.broadcast(tot))
        .where(F.col("boff") + F.col("bw") >= F.col("tw") / 2.0)
        .agg(
            F.min("b").alias("b"),
            F.min_by("boff", "b").alias("boff"),
        )
    )
    wr = Window.orderBy("p").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_price.crossJoin(F.broadcast(sel))
        .where(F.floor(F.col("p") / 64.0) == F.col("b"))
        .crossJoin(F.broadcast(tot))
        .withColumn("cw", F.col("boff") + F.sum("w").over(wr))
        .where(F.col("cw") >= F.col("tw") / 2.0)
        .agg(
            F.round(F.min("p"), 2).alias("weighted_median"),
            F.first("tw").cast("double").alias("total_weight"),
            F.first("np").alias("n_distinct_prices"),
        )
    )


@register(
    "dq_referential_integrity",
    """
    SELECT 'lineitem->orders' AS relation,
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT) AS n_orphans,
           CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_child_rows
    UNION ALL
    SELECT 'orders->customer',
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT),
           CAST((SELECT count(*) FROM orders) AS BIGINT)
    UNION ALL
    SELECT 'customer->nation',
           CAST((SELECT count(*) FROM customer c
                 WHERE NOT EXISTS (SELECT 1 FROM nation n
                                   WHERE n.n_nationkey = c.c_nationkey))
                AS BIGINT),
           CAST((SELECT count(*) FROM customer) AS BIGINT)
    ORDER BY relation
    """,
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit — orphaned-FK counts for the three
    core relationships, the first data-quality gate after any ingest or
    backfill (a nonzero row means a partial load or a deleted parent).
    Each check is ONE pass over the child (r12; the previous anti-join +
    separate total pair scanned every child twice): per-FK counts
    aggregate map-side first, the distinct-key table left-joins the
    parent's key set (hash co-partitioned; nation broadcasts at
    dimension size), and both outputs fall out of one sum — orphans are
    the count mass on keys with no parent. The shuffle carries one row
    per DISTINCT key instead of one per child row. Adding a
    relationship adds one key join, never a rescan of existing ones."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")

    def audit(child, parent, ck, pk, name, bcast=False):
        # .distinct() keeps the anti-join's any-match semantics even if
        # a parent key ever duplicated; on a key-only projection it is
        # one map-combinable aggregate.
        p = parent.distinct()
        if bcast:
            p = F.broadcast(p)
        per_key = child.groupBy(F.col(ck).alias("_k")).agg(
            F.count("*").alias("_cnt")
        )
        return (
            per_key.join(p, per_key["_k"] == p[pk], "left")
            .agg(
                F.sum(F.when(p[pk].isNull(), F.col("_cnt")))
                .cast("long")
                .alias("n_orphans"),
                F.sum("_cnt").cast("long").alias("n_child_rows"),
            )
            .select(
                F.lit(name).alias("relation"),
                F.coalesce(F.col("n_orphans"), F.lit(0).cast("long")).alias(
                    "n_orphans"
                ),
                F.coalesce(F.col("n_child_rows"), F.lit(0).cast("long")).alias(
                    "n_child_rows"
                ),
            )
        )

    return (
        audit(li, o.select("o_orderkey"), "l_orderkey", "o_orderkey",
              "lineitem->orders")
        .unionByName(
            audit(o, c.select("c_custkey"), "o_custkey", "c_custkey",
                  "orders->customer")
        )
        .unionByName(
            audit(c, n.select("n_nationkey"), "c_nationkey", "n_nationkey",
                  "customer->nation", bcast=True)
        )
        .orderBy("relation")
    )


@register(
    "growth_mom_revenue",
    """
    WITH monthly AS (
      SELECT n.n_name AS nation,
             CAST(date_trunc('month', o.o_orderdate) AS DATE) AS month,
             round(sum(o.o_totalprice), 2) AS revenue
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2
    )
    SELECT nation, strftime(month, '%Y-%m') AS month, revenue,
           round(CAST(CAST(
             CASE WHEN lag(revenue) OVER (PARTITION BY nation ORDER BY month)
                       > 0
                  THEN (revenue / lag(revenue) OVER (PARTITION BY nation
                                                     ORDER BY month) - 1.0)
                       * 100.0 END
             AS REAL) AS DOUBLE) + 0.00000001, 2) + 0.0 AS mom_pct
    FROM monthly ORDER BY nation, month
    """,
)
def growth_mom_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth per nation — the standard
    reporting delta: monthly rollup (orders x customer x broadcast
    nation, one aggregate), then lag() on the calendar-bounded
    (nation, month) frame — the window runs on |nations| x |months|
    rows, never raw orders, so the per-partition sort is dimension-sized
    at any scale. First month per nation has NULL growth (no prior)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    monthly = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.trunc("o_orderdate", "month").alias("month"),
        )
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    w = Window.partitionBy("nation").orderBy("month")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "nation",
        F.date_format("month", "yyyy-MM").alias("month"),
        "revenue",
        # + 0.0 on BOTH sides: IEEE -0.0 + 0.0 = +0.0, killing the
        # negative-zero hash split DuckDB's round() can emit for tiny
        # negative growth (caught by the sf0.1 sweep)
        (
            F.round(
                F.when(prev > 0, (F.col("revenue") / prev - 1.0) * 100.0)
                .cast("float")
                .cast("double")
                + 0.00000001,
                2,
            )
            + 0.0
        ).alias("mom_pct"),
    ).orderBy("nation", "month")


@register(
    "eval_conformal_interval",
    f"""
    WITH obs AS (
      SELECT event_type, date_trunc('hour', ts) AS pt,
             {_F32_HOURLY_AVG_SQL} AS v
      FROM events GROUP BY 1, 2
    ),
    cut AS (
      SELECT (CAST(epoch_ms(min(pt)) AS BIGINT)
              + CAST(epoch_ms(max(pt)) AS BIGINT)) // 2 AS cut_ms
      FROM obs
    ),
    cal AS (
      SELECT event_type, v FROM obs CROSS JOIN cut
      WHERE CAST(epoch_ms(pt) AS BIGINT) < cut_ms
    ),
    pred AS (
      SELECT event_type,
             round(CAST(CAST(avg(v) AS REAL) AS DOUBLE), 4) AS mu,
             count(*) AS n_cal
      FROM cal GROUP BY 1
    ),
    resid AS (
      SELECT c.event_type, abs(c.v - p.mu) AS r,
             row_number() OVER (PARTITION BY c.event_type
                                ORDER BY abs(c.v - p.mu), c.v) AS rk,
             p.n_cal
      FROM cal c JOIN pred p USING (event_type)
    ),
    qhat AS (
      SELECT event_type, n_cal, r AS q_hat
      FROM resid
      WHERE rk = least(CAST(ceil((n_cal + 1) * 0.9) AS BIGINT), n_cal)
    )
    SELECT o.event_type,
           CAST(q.n_cal AS BIGINT) AS n_cal,
           CAST(count(*) AS BIGINT) AS n_eval,
           round(CAST(CAST(q.q_hat AS REAL) AS DOUBLE) + 0.00000001, 4)
             AS q_hat,
           round(CAST(CAST(avg(CASE WHEN abs(o.v - p.mu) <= q.q_hat
                                    THEN 1.0 ELSE 0.0 END) AS REAL)
                      AS DOUBLE) + 0.00000001, 4) AS coverage
    FROM obs o
    JOIN pred p USING (event_type)
    JOIN qhat q USING (event_type)
    CROSS JOIN cut
    WHERE CAST(epoch_ms(o.pt) AS BIGINT) >= cut_ms
    GROUP BY 1, 2, q.q_hat ORDER BY 1
    """,
)
def eval_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction interval (Vovk; Lei et al. 2018): the
    first calendar half calibrates — predictor = per-type calibration
    mean, q_hat = the ceil((n+1)*0.9)-th smallest |residual| (the exact
    finite-sample order statistic, NOT an interpolated quantile) — and
    the second half reports empirical coverage of mu +/- q_hat, which
    conformal theory puts at >= 90% in expectation for exchangeable
    data. The distribution-free calibration check a forecast band needs
    before anyone trusts eval_pinball_loss's quantile constants.

    Scale shape: residual ranking is a window PARTITIONED by type over
    hourly pre-aggregates (calendar-bounded rows per type, never raw
    events); everything else is the pinball family's one-scan
    split-aggregate pattern with the 1-row calendar cut broadcast."""
    ev = load_events(spark, sf_dir)
    obs = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("pt")
    ).agg(_f32_avg4().alias("v"))
    obs = obs.localCheckpoint(eager=False)  # cut + cal + eval, one scan
    cut = obs.agg(
        (
            (F.unix_millis(F.min("pt")) + F.unix_millis(F.max("pt"))) / 2
        ).cast("long").alias("cut_ms")
    )
    withcut = obs.crossJoin(F.broadcast(cut))
    cal = withcut.where(F.unix_millis("pt") < F.col("cut_ms"))
    pred = cal.groupBy("event_type").agg(
        F.round(F.avg("v").cast("float").cast("double"), 4).alias("mu"),
        F.count("*").alias("n_cal"),
    )
    resid = cal.join(F.broadcast(pred), "event_type").select(
        "event_type",
        F.abs(F.col("v") - F.col("mu")).alias("r"),
        "v",
        "n_cal",
    )
    w = Window.partitionBy("event_type").orderBy("r", "v")
    k = F.least(
        F.ceil((F.col("n_cal") + 1) * 0.9).cast("long"), F.col("n_cal")
    )
    qhat = (
        resid.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == k)
        .select("event_type", "n_cal", F.col("r").alias("q_hat"))
    )
    return (
        withcut.where(F.unix_millis("pt") >= F.col("cut_ms"))
        .join(F.broadcast(pred.select("event_type", "mu")), "event_type")
        .join(F.broadcast(qhat), "event_type")
        .groupBy("event_type", "n_cal", "q_hat")
        .agg(
            F.count("*").cast("long").alias("n_eval"),
            F.round(
                F.avg(
                    F.when(
                        F.abs(F.col("v") - F.col("mu")) <= F.col("q_hat"),
                        1.0,
                    ).otherwise(0.0)
                )
                .cast("float")
                .cast("double")
                + 0.00000001,
                4,
            ).alias("coverage"),
        )
        .select(
            "event_type",
            F.col("n_cal").cast("long").alias("n_cal"),
            "n_eval",
            F.round(
                F.col("q_hat").cast("float").cast("double") + 0.00000001, 4
            ).alias("q_hat"),
            "coverage",
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# round 9: distributional-testing family — the distribution-shift and
# variance-structure checks run next to the round-8 location tests (KS
# two-sample, Spearman rank correlation, Kruskal-Wallis rank ANOVA,
# Brown-Forsythe variance homogeneity)
# --------------------------------------------------------------------------

@register(
    "stats_ks_two_sample",
    """
    WITH pooled AS (
      SELECT round(value, 3) AS v,
             count(*) FILTER (event_type = 'purchase') AS c1,
             count(*) FILTER (event_type = 'click') AS c2
      FROM events
      WHERE value IS NOT NULL AND event_type IN ('purchase', 'click')
      GROUP BY 1
    ),
    n AS (SELECT sum(c1) AS n1, sum(c2) AS n2 FROM pooled),
    e AS (
      SELECT sum(c1 * 1.0 / n1 - c2 * 1.0 / n2) OVER (
               ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS fdiff
      FROM pooled CROSS JOIN n
    )
    SELECT (SELECT CAST(n1 AS BIGINT) FROM n) AS n1,
           (SELECT CAST(n2 AS BIGINT) FROM n) AS n2,
           round(CAST(CAST(max(abs(fdiff)) AS REAL) AS DOUBLE)
                 + 0.00000001, 6) AS ks_d,
           round(CAST(CAST(max(abs(fdiff))
                 * sqrt((SELECT n1 * n2 * 1.0 / (n1 + n2) FROM n))
                 AS REAL) AS DOUBLE) + 0.00000001, 4) AS ks_stat
    FROM e
    """,
)
def stats_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between the purchase and
    click value distributions — the whole-distribution companion to
    stats_welch_ttest (location) and stats_mannwhitney_u (rank shift):
    detects ANY distributional difference, not just a mean move. Thin
    display wrapper over operators/stats.py:ks_two_sample: values
    quantize to 3dp, per-distinct-value masses aggregate once, and the
    ECDF difference is ONE global_cumsum of the signed mass c1/n1-c2/n2
    (one range shuffle; both ECDFs step at the same pooled points, so no
    second cumsum). The oracle mirrors with a SQL window over the same
    quantized domain."""
    from ..operators.stats import ks_two_sample

    ev = load_events(spark, sf_dir)
    s = ks_two_sample(ev, "value", "event_type", "purchase", "click")
    return s.select(
        "n1",
        "n2",
        F.round(
            F.col("ks_d").cast("float").cast("double") + 0.00000001, 6
        ).alias("ks_d"),
        F.round(
            F.col("ks_stat").cast("float").cast("double") + 0.00000001, 4
        ).alias("ks_stat"),
    )


@register(
    "stats_spearman_corr",
    """
    WITH src AS (
      SELECT round(l_quantity, 2) AS x, round(l_extendedprice, 2) AS y
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    ),
    rx AS (
      SELECT x, coalesce(sum(cnt) OVER (ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             + (cnt + 1) / 2.0 AS rxv
      FROM (SELECT x, count(*) AS cnt FROM src GROUP BY 1)
    ),
    ry AS (
      SELECT y, coalesce(sum(cnt) OVER (ORDER BY y
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             + (cnt + 1) / 2.0 AS ryv
      FROM (SELECT y, count(*) AS cnt FROM src GROUP BY 1)
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           round(CAST(CAST(corr(rxv, ryv) AS REAL) AS DOUBLE)
                 + 0.00000001, 4) AS spearman_rho
    FROM src JOIN rx USING (x) JOIN ry USING (y)
    """,
)
def stats_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation (midrank ties) between order quantity
    and extended price — the monotone-association measure that survives
    the price column's heavy skew where Pearson saturates. Thin display
    wrapper over operators/stats.py:spearman_corr: each variable's
    midranks come from its DISTINCT quantized domain (one hash aggregate
    + one global_cumsum range shuffle per variable, never a rank over
    raw rows), join back to rows by value (domain-sized hash joins), and
    rho is a plain partial-aggregable corr. The oracle mirrors rank
    construction with SQL windows over the same domains."""
    from ..operators.stats import spearman_corr

    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_quantity").isNotNull() & F.col("l_extendedprice").isNotNull()
    )
    s = spearman_corr(li, "l_quantity", "l_extendedprice", quantize=2)
    return s.select(
        "n",
        F.round(
            F.col("spearman_rho").cast("float").cast("double") + 0.00000001, 4
        ).alias("spearman_rho"),
    )


@register(
    "stats_kruskal_wallis",
    """
    WITH src AS (
      SELECT round(value, 3) AS v, event_type AS g
      FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
    ),
    per_vg AS (SELECT v, g, count(*) AS c FROM src GROUP BY 1, 2),
    per_v AS (SELECT v, sum(c) AS ties FROM per_vg GROUP BY 1),
    ranked AS (
      SELECT v, ties,
             coalesce(sum(ties) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             + (ties + 1) / 2.0 AS midrank
      FROM per_v
    ),
    per_g AS (
      SELECT g, sum(c) AS n_g, sum(c * midrank) AS r_g
      FROM per_vg JOIN ranked USING (v) GROUP BY 1
    ),
    tt AS (SELECT sum(ties) AS n_total,
                  sum(pow(ties, 3) - ties) AS tie_corr FROM ranked),
    ag AS (SELECT count(*) AS n_groups,
                  sum(pow(r_g, 2) / n_g) AS rsq FROM per_g)
    SELECT CAST(n_total AS BIGINT) AS n_total,
           CAST(n_groups AS BIGINT) AS n_groups,
           round(CAST(CAST(
             (12.0 / (n_total * (n_total + 1.0)) * rsq - 3.0 * (n_total + 1))
             / (1.0 - tie_corr / (pow(n_total, 3) - n_total))
             AS REAL) AS DOUBLE) + 0.00000001, 4) AS h_stat
    FROM ag CROSS JOIN tt
    """,
)
def stats_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H across ALL five event types at once — the
    k-sample generalization of stats_mannwhitney_u (one omnibus rank
    ANOVA instead of 10 pairwise tests). Thin display wrapper over
    operators/stats.py:kruskal_wallis: midranks ride one global_cumsum
    over the pooled 3dp-quantized value domain; per-(value, group)
    counts hash-join to it by value; H assembles from partial
    aggregates with the standard tie correction. The oracle mirrors the
    islands construction with a SQL window over the same domain."""
    from ..operators.stats import kruskal_wallis

    ev = load_events(spark, sf_dir)
    s = kruskal_wallis(ev, "value", "event_type", quantize=3)
    return s.select(
        "n_total",
        "n_groups",
        F.round(
            F.col("h_stat").cast("float").cast("double") + 0.00000001, 4
        ).alias("h_stat"),
    )


@register(
    "stats_levene_bf",
    """
    WITH src AS (
      SELECT event_type AS g, round(value, 3) AS v
      FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
    ),
    med AS (SELECT g, median(v) AS m FROM src GROUP BY 1),
    z AS (SELECT src.g AS g, abs(v - m) AS z FROM src JOIN med USING (g)),
    per_g AS (
      SELECT g, count(*) AS n_g, avg(z) AS zbar_g,
             var_pop(z) * count(*) AS ssw
      FROM z GROUP BY 1
    ),
    ag AS (
      SELECT sum(n_g) AS n, count(*) AS k,
             sum(zbar_g * n_g) / sum(n_g) AS zbar,
             sum(ssw) AS ss_within,
             sum(n_g * zbar_g * zbar_g) AS sum_n_zbar2
      FROM per_g
    )
    SELECT CAST(n AS BIGINT) AS n_total, CAST(k AS BIGINT) AS n_groups,
           round(CAST(CAST(
             ((n - k) / (k - 1.0)) * (sum_n_zbar2 - n * zbar * zbar)
             / ss_within
             AS REAL) AS DOUBLE) + 0.00000001, 4) AS w_stat,
           CAST(k - 1 AS BIGINT) AS dof1,
           CAST(n - k AS BIGINT) AS dof2
    FROM ag
    """,
)
def stats_levene_bf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe (median-centered Levene) test of variance
    homogeneity across the five event types — the guard check before
    trusting any pooled-variance statistic on this panel, robust to the
    value column's non-normality because deviations center on group
    MEDIANS. Thin display wrapper over operators/stats.py:levene_bf:
    one partial-aggregable percentile pass for the k medians, one
    broadcast join of the k-row median table back onto rows, and W
    assembles from FILTERed aggregates (the within-group sum of squares
    via the var_pop*n identity — no second pass over deviations).
    Values quantize to 3dp so both engines interpolate the same median
    multiset."""
    from ..operators.stats import levene_bf

    ev = load_events(spark, sf_dir).where(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    src = ev.select("event_type", F.round("value", 3).alias("v3"))
    s = levene_bf(src, "v3", "event_type")
    return s.select(
        "n_total",
        "n_groups",
        F.round(
            F.col("w_stat").cast("float").cast("double") + 0.00000001, 4
        ).alias("w_stat"),
        F.col("dof1").cast("long").alias("dof1"),
        F.col("dof2").cast("long").alias("dof2"),
    )


@register(
    "attribution_time_decay",
    """
    WITH touches AS (
      SELECT user_id, ts, event_type FROM events
      WHERE event_type IN ('click', 'view', 'signup')
    ),
    purchases AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase'
    ),
    pairs AS (
      SELECT p.event_id, p.value, t.event_type AS channel,
             exp(-(epoch_ms(p.ts) - epoch_ms(t.ts)) / 1000.0
                 * 0.0000080225546) AS w
      FROM purchases p JOIN touches t
        ON p.user_id = t.user_id
       AND t.ts < p.ts AND t.ts >= p.ts - INTERVAL 7 DAY
    ),
    credited AS (
      SELECT channel,
             value * w / sum(w) OVER (PARTITION BY event_id) AS credit
      FROM pairs
    )
    SELECT channel,
           round(CAST(CAST(sum(credit) AS REAL) AS DOUBLE) + 0.00000001, 2)
             AS credited_value,
           CAST(count(*) AS BIGINT) AS n_touchpoints
    FROM credited GROUP BY channel ORDER BY channel
    """,
)
def attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay multi-touch attribution — the fairer sibling of
    attribution_last_touch: EVERY click/view/signup in the 7 days before
    a purchase shares that purchase's value, weighted exp(-lambda * age)
    with a 1-day half-life (lambda = ln2/86400 per second), normalized
    per purchase so credits sum to the purchase value; channels then
    roll up total credited revenue.

    Plan: purchases x prior touches is a USER-KEYED hash join with the
    [ts-7d, ts) residual (the scd2_point_in_time_join family — never a
    time-only cross join; per-user event counts bound the pair fan-out);
    per-purchase weight normalization is a window ON THE SAME user-keyed
    shuffle (purchase_id is user-local), and the channel rollup is a
    map-side-combined aggregate over 3 groups. The decayed weight is
    pure arithmetic on epoch seconds — deterministic in both engines,
    with the float32-squash + epsilon display contract absorbing
    summation-order ulps."""
    ev = load_events(spark, sf_dir)
    touches = ev.where(
        F.col("event_type").isin("click", "view", "signup")
    ).select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("channel"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    lam = 0.0000080225546  # ln(2) / 86400 s — 1-day half-life
    pairs = purchases.join(
        touches,
        (F.col("user_id") == F.col("t_user"))
        & (F.col("t_ts") < F.col("ts"))
        & (F.col("t_ts") >= F.col("ts") - F.expr("INTERVAL 7 DAYS")),
    ).select(
        "event_id",
        "user_id",
        "value",
        "channel",
        # epoch MILLISECONDS exactly like the oracle's epoch_ms (floor of
        # the fractional-second tail) so the exp() argument is bit-equal
        # in both engines, not merely squash-close
        F.exp(
            -(
                F.floor(F.col("ts").cast("double") * 1000)
                - F.floor(F.col("t_ts").cast("double") * 1000)
            )
            / 1000.0
            * lam
        ).alias("w"),
    )
    wsum = Window.partitionBy("event_id")
    credited = pairs.select(
        "channel",
        (F.col("value") * F.col("w") / F.sum("w").over(wsum)).alias("credit"),
    )
    return (
        credited.groupBy("channel")
        .agg(
            F.round(
                F.sum("credit").cast("float").cast("double") + 0.00000001, 2
            ).alias("credited_value"),
            F.count("*").cast("long").alias("n_touchpoints"),
        )
        .orderBy("channel")
    )


@register(
    "stats_mad_by_type",
    """
    WITH src AS (
      SELECT event_type AS g, round(value, 3) AS v
      FROM events WHERE value IS NOT NULL
    ),
    med AS (SELECT g, count(*) AS n, median(v) AS m FROM src GROUP BY 1)
    SELECT s.g AS event_type,
           CAST(any_value(n) AS BIGINT) AS n,
           round(CAST(CAST(any_value(m) AS REAL) AS DOUBLE)
                 + 0.00000001, 4) AS median_value,
           round(CAST(CAST(median(abs(v - m)) AS REAL) AS DOUBLE)
                 + 0.00000001, 4) AS mad,
           round(CAST(CAST(median(abs(v - m)) * 1.4826 AS REAL) AS DOUBLE)
                 + 0.00000001, 4) AS robust_sigma
    FROM src s JOIN med USING (g)
    GROUP BY s.g ORDER BY event_type
    """,
)
def stats_mad_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type robust location/scale summary — exact median and median
    absolute deviation (x1.4826 for the normal-consistent sigma), the
    outlier-immune replacement for mean/stddev on heavy-tailed value
    columns. Thin display wrapper over
    operators/stats.py:median_abs_deviation (two partial-aggregable
    percentile passes with a k-row broadcast median join between them);
    values quantize to 3dp so both engines interpolate the same
    multiset. anomaly_mad_robust applies the same estimator per HOUR to
    flag rows; this is the per-population summary face."""
    from ..operators.stats import median_abs_deviation

    ev = load_events(spark, sf_dir).where(F.col("value").isNotNull())
    src = ev.select(
        F.col("event_type"), F.round("value", 3).alias("v3")
    )
    s = median_abs_deviation(src, "v3", by="event_type")
    return s.select(
        F.col("event_type"),
        "n",
        F.round(
            F.col("median").cast("float").cast("double") + 0.00000001, 4
        ).alias("median_value"),
        F.round(
            F.col("mad").cast("float").cast("double") + 0.00000001, 4
        ).alias("mad"),
        F.round(
            (F.col("mad") * 1.4826).cast("float").cast("double") + 0.00000001, 4
        ).alias("robust_sigma"),
    ).orderBy("event_type")


def _ppr_oracle() -> str:
    """Unrolled personalized-PageRank recurrence — the SQL twin of
    operators/graph.py:pagerank(seeds=[...]): teleport mass lands only
    on the seed node, ranks init to the seed indicator."""
    steps = []
    for i in range(1, _PR_ITERS + 1):
        steps.append(
            f"""pr{i} AS (
      SELECT n.node,
             CASE WHEN n.node = (SELECT s FROM seed)
                  THEN {1 - _PR_DAMP} ELSE 0.0 END
             + {_PR_DAMP} * COALESCE(SUM(p.pr / d.outdeg), 0) AS pr
      FROM nodes n
      LEFT JOIN edges e ON e.dst = n.node
      LEFT JOIN pr{i - 1} p ON p.node = e.src
      LEFT JOIN deg d ON d.src = e.src
      GROUP BY n.node
    )"""
        )
    its = ",\n    ".join(steps)
    return f"""
    WITH pairs AS (
      SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    seed AS (SELECT min(c) AS s FROM pairs),
    edges AS (
      SELECT c AS src, s AS dst FROM pairs
      UNION ALL
      SELECT s AS src, c AS dst FROM pairs
    ),
    deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS outdeg FROM edges GROUP BY src),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    pr0 AS (
      SELECT node,
             CASE WHEN node = (SELECT s FROM seed) THEN 1.0 ELSE 0.0 END AS pr
      FROM nodes
    ),
    {its}
    SELECT CAST((node - 1) / 2 AS BIGINT) AS s_suppkey,
           ROUND(pr + 0.00000001, 6) AS ppr
    FROM pr{_PR_ITERS}
    WHERE node % 2 = 1 AND pr > 0
    ORDER BY ppr DESC, s_suppkey
    LIMIT 15
    """


@register("graph_personalized_pagerank", _ppr_oracle())
def graph_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank (random walk with restart) from ONE seed
    customer — 'suppliers related to this customer' by graph proximity,
    the recommendation primitive the uniform graph_pagerank cannot
    express (its scores measure global importance, not closeness to a
    query node). Seed = the lowest trading custkey (deterministic across
    SFs); teleport mass lands only on the seed; top-15 suppliers by
    restart-walk score, zero-score nodes excluded (disconnected
    components never receive seed mass, by construction).

    Same Pregel plan as graph_pagerank (edges persisted once, map-side
    message combine, per-superstep localCheckpoint); the seed rides as a
    1-element broadcast literal from a bounded 1-row collect (the seeded
    centroid-list pattern). Oracle unrolls the same recurrence
    CTE-for-CTE, so every superstep's float math is checked."""
    from ..operators.graph import pagerank

    edges = _undirected_trade_edges(spark, sf_dir)
    seed = int(
        edges.where(F.col("src") % 2 == 0).agg(F.min("src")).head()[0]
    )
    ranks = pagerank(
        edges, iterations=_PR_ITERS, damping=_PR_DAMP, seeds=[seed]
    )
    return (
        ranks.where((F.col("node") % 2 == 1) & (F.col("pagerank") > 0))
        .select(
            ((F.col("node") - 1) / 2).cast("long").alias("s_suppkey"),
            F.round(F.col("pagerank") + 0.00000001, 6).alias("ppr"),
        )
        .orderBy(F.col("ppr").desc(), "s_suppkey")
        .limit(15)
    )


# --------------------------------------------------------------------------
# round 9 (late window): Poisson-bootstrap CI for the mean
# --------------------------------------------------------------------------

def _bootstrap_oracle() -> str:
    from ..functions import geo
    from ..operators.stats import poisson_weight_expr

    u = geo.u32_expr("concat(k, '#', CAST(r AS STRING))")
    w = poisson_weight_expr("u")
    return f"""
    WITH base AS (
      SELECT CAST(event_id AS STRING) AS k, value AS v
      FROM events WHERE value IS NOT NULL
    ),
    rep AS (
      SELECT k, v, unnest(generate_series(0, 63)) AS r FROM base
    ),
    uni AS (SELECT v, r, {u} AS u FROM rep),
    wtd AS (SELECT r, {w} * v AS wv, {w} AS w FROM uni),
    m AS (
      SELECT r, CASE WHEN sum(w) > 0 THEN sum(wv) / sum(w) END AS mu
      FROM wtd GROUP BY r
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM base) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_replicates,
           round(CAST(CAST((SELECT avg(v) FROM base) AS REAL) AS DOUBLE)
                 + 0.00000001, 4) AS point_mean,
           round(CAST(CAST(quantile_cont(mu, 0.025) AS REAL) AS DOUBLE)
                 + 0.00000001, 4) AS ci_lo,
           round(CAST(CAST(quantile_cont(mu, 0.975) AS REAL) AS DOUBLE)
                 + 0.00000001, 4) AS ci_hi
    FROM m
    """


@register("stats_bootstrap_ci", _bootstrap_oracle())
def stats_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% bootstrap CI for the mean event value via the Poisson
    bootstrap — 64 replicates, each row contributing a deterministic
    md5-seeded Poisson(1) weight per replicate (operators/stats.py:
    poisson_bootstrap_ci; Chamandy et al. 2012). The distributed-native
    resampler: no with-replacement coordination, one partial-aggregable
    pass, the shuffle carries 64 rows per task; the percentile runs on
    the bounded 64-row replicate frame. Exact-percentile interpolation
    (type 7) matches DuckDB quantile_cont; float32-squash + epsilon
    rounding on the sensitive tail stats, repo stats convention."""
    from ..operators.stats import poisson_bootstrap_ci

    ev = load_events(spark, sf_dir)
    ci = poisson_bootstrap_ci(ev, "value", "event_id", replicates=64)
    sq = lambda c: F.round(  # noqa: E731
        F.col(c).cast("float").cast("double") + 0.00000001, 4
    ).alias(c)
    return ci.select(
        "n_rows", "n_replicates", sq("point_mean"), sq("ci_lo"), sq("ci_hi")
    )


# --------------------------------------------------------------------------
# round 9 (late window): Holt's linear-trend exponential smoothing
# --------------------------------------------------------------------------

_HOLT_A = 0.5  # level smoothing
_HOLT_B = 0.3  # trend smoothing


@register(
    "ts_holt_linear",
    # obs/last are MATERIALIZED (DuckDB planner hint, zero semantic
    # change): un-hinted, the hourly-avg `obs` aggregate is re-inlined
    # into EVERY iteration of the recursive hw join (~13 s at sf0.1 vs
    # ~0.8 s hinted, identical rows). The recursive member itself is
    # unchanged.
    f"""
    WITH RECURSIVE obs AS MATERIALIZED (
      SELECT event_type, date_trunc('hour', ts) AS pt,
             {_F32_HOURLY_AVG_SQL} AS v,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY date_trunc('hour', ts)) AS rn
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    hw AS (
      SELECT o2.event_type, 2 AS t, o2.v AS l, o2.v - o1.v AS b
      FROM obs o1 JOIN obs o2
        ON o1.event_type = o2.event_type AND o1.rn = 1 AND o2.rn = 2
      UNION ALL
      SELECT h.event_type, h.t + 1,
             {_HOLT_A} * o.v + {1 - _HOLT_A} * (h.l + h.b),
             {_HOLT_B} * (({_HOLT_A} * o.v + {1 - _HOLT_A} * (h.l + h.b))
                          - h.l) + {1 - _HOLT_B} * h.b
      FROM hw h JOIN obs o
        ON o.event_type = h.event_type AND o.rn = h.t + 1
    ),
    last AS MATERIALIZED (
      SELECT event_type, t, l, b,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY t DESC) AS rk
      FROM hw
    )
    SELECT event_type, CAST(t AS BIGINT) AS n_hours,
           round(l + 0.00000001, 4) AS level,
           round(b + 0.00000001, 5) AS trend,
           round(l + 1 * b + 0.00000001, 4) AS forecast_1h,
           round(l + 3 * b + 0.00000001, 4) AS forecast_3h
    FROM last WHERE rk = 1
    ORDER BY event_type
    """,
)
def ts_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend exponential smoothing (Holt 1957) over each
    type's hourly series, with h-step-ahead forecasts l + h*b — the
    trend-aware upgrade of ewma_hourly (which has no trend term and
    lags ramps).

    The recurrence (l_t = a*x_t + (1-a)(l+b); b_t = B*(l_t-l)+(1-B)*b)
    is inherently sequential, so it runs as ONE JVM ``aggregate`` fold
    over the per-type hourly array — bounded by the calendar (types x
    hours, ~744 points/month/type), the same bounded-series contract as
    the ewma/seasonal family; the raw 100 TB scan reduces to that array
    via the hourly aggregate first. Inputs are float32-squashed like
    every hourly-series query, and the fold's float ops are sequential
    and identical in both engines, so the oracle (which unrolls the SAME
    recurrence as a recursive CTE, the pagerank precedent) matches
    bit-for-bit before display rounding."""
    ev = load_events(spark, sf_dir)
    obs = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("pt")
    ).agg(_f32_avg4().alias("v"))
    arr = F.transform(
        F.array_sort(F.collect_list(F.struct("pt", "v"))), lambda s: s["v"]
    )
    series = obs.groupBy("event_type").agg(arr.alias("xs"))
    a, bb = _HOLT_A, _HOLT_B
    new_l = f"({a} * x + {1 - a} * (acc.l + acc.b))"
    fold = F.expr(
        "aggregate(slice(xs, 3, size(xs) - 2), "
        "struct(CAST(element_at(xs, 2) AS DOUBLE) AS l, "
        "CAST(element_at(xs, 2) - element_at(xs, 1) AS DOUBLE) AS b), "
        f"(acc, x) -> struct({new_l} AS l, "
        f"({bb} * ({new_l} - acc.l) + {1 - bb} * acc.b) AS b))"
    )
    out = series.where(F.size("xs") >= 2).select(
        "event_type",
        F.size("xs").cast("long").alias("n_hours"),
        fold.alias("hw"),
    )
    l, b = F.col("hw.l"), F.col("hw.b")
    return out.select(
        "event_type",
        "n_hours",
        F.round(l + 0.00000001, 4).alias("level"),
        F.round(b + 0.00000001, 5).alias("trend"),
        F.round(l + 1 * b + 0.00000001, 4).alias("forecast_1h"),
        F.round(l + 3 * b + 0.00000001, 4).alias("forecast_3h"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# round 9 (late window): HITS hubs/authorities over the trade graph
# --------------------------------------------------------------------------

_HITS_ITERS = 2


def _hits_oracle() -> str:
    """Unroll the fixed-iteration HITS recurrence as chained CTEs — the
    SQL twin of operators/graph.py:hits (same init, same L2
    normalization, same LEFT-JOIN zero for message-less nodes)."""
    steps = []
    for i in range(1, _HITS_ITERS + 1):
        h_prev = f"h{i - 1}"
        steps.append(
            f"""ra{i} AS (
      SELECT e.dst, SUM(h.hub) AS s
      FROM edges e JOIN {h_prev} h ON h.node = e.src GROUP BY e.dst
    ),
    a{i} AS (
      SELECT d.node,
             COALESCE(r.s, 0) / (SELECT sqrt(SUM(s * s)) FROM ra{i})
               AS authority
      FROM dsts d LEFT JOIN ra{i} r ON r.dst = d.node
    ),
    rh{i} AS (
      SELECT e.src, SUM(a.authority) AS s
      FROM edges e JOIN a{i} a ON a.node = e.dst GROUP BY e.src
    ),
    h{i} AS (
      SELECT s2.node,
             COALESCE(r.s, 0) / (SELECT sqrt(SUM(s * s)) FROM rh{i}) AS hub
      FROM srcs s2 LEFT JOIN rh{i} r ON r.src = s2.node
    )"""
        )
    its = ",\n    ".join(steps)
    return f"""
    WITH pairs AS (
      SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    edges AS (SELECT c AS src, s AS dst FROM pairs),
    srcs AS (SELECT DISTINCT src AS node FROM edges),
    dsts AS (SELECT DISTINCT dst AS node FROM edges),
    h0 AS (SELECT node, 1.0 AS hub FROM srcs),
    {its}
    SELECT CAST((node - 1) / 2 AS BIGINT) AS s_suppkey,
           ROUND(authority + 0.00000001, 4) AS authority
    FROM a{_HITS_ITERS}
    ORDER BY authority DESC, s_suppkey
    LIMIT 15
    """


@register("graph_hits_trade", _hits_oracle())
def graph_hits_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg 1999) over the DIRECTED customer->supplier trade
    graph: customers are hubs (good buyers point at good suppliers),
    suppliers are authorities; top-15 supplier authorities after 2
    synchronous iterations with per-step L2 normalization. Complements
    graph_pagerank (undirected prestige) with the bipartite
    endorsement-flow view.

    Plan per half-step: edges persisted once, one join + map-side
    combinable groupBy-sum, a 1-row L2-norm aggregate broadcast back,
    lineage truncated per iteration (operators/graph.py:hits). The
    oracle unrolls both iterations CTE-for-CTE, so every half-step's
    float math is checked; the 4dp + epsilon rounding absorbs
    summation-order drift, the pagerank precedent."""
    from ..operators.graph import hits

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    pairs = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    scores = hits(pairs, iterations=_HITS_ITERS)
    return (
        scores.where(F.col("node") % 2 == 1)
        .select(
            ((F.col("node") - 1) / 2).cast("long").alias("s_suppkey"),
            F.round(F.col("authority") + 0.00000001, 4).alias("authority"),
        )
        .orderBy(F.col("authority").desc(), "s_suppkey")
        .limit(15)
    )
