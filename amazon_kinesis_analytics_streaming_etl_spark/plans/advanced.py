"""Advanced relational/scale operators (round 2): bin-blocked batch
range join, CDC snapshot merge, approximate quantiles with a tolerance
gate. Each pairs a scale-safe DataFrame plan with a DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.merge import merge_changes
from ..operators.rangejoin import interval_join
from ..schemas import load_events, read_sf_parquet
from .relational import register


# --------------------------------------------------------------------------
# keyless batch range join (the BNLJ killer)
# --------------------------------------------------------------------------

@register(
    "interval_join_batch",
    """
    SELECT p.event_id AS purchase_id,
           count(*) AS n_clicks,
           round(sum(c.value), 2) AS click_value
    FROM events p JOIN events c
      ON p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.ts >= p.ts - INTERVAL 10 MINUTE AND c.ts <= p.ts
    GROUP BY p.event_id
    ORDER BY p.event_id
    """,
)
def interval_join_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless range join: for every purchase, the clicks by ANY user in
    the preceding 10 minutes. A bare range predicate with no equi-key is
    a BroadcastNestedLoopJoin in Spark — O(P·C); the bin-blocked
    operator (operators/rangejoin.py) makes it a hash join on time bins
    (each purchase touches ≤2 bins). Plan-asserted BNLJ-free in
    tests/test_rangejoin_merge.py."""
    ev = load_events(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("ts").alias("c_ts"), F.col("value").alias("c_value")
    )
    joined = interval_join(
        purchases, clicks, left_ts="p_ts", right_ts="c_ts", lower_s=-600, upper_s=0
    )
    return (
        joined.groupBy("purchase_id")
        .agg(
            F.count("*").alias("n_clicks"),
            F.round(F.sum("c_value"), 2).alias("click_value"),
        )
        .orderBy("purchase_id")
    )


# --------------------------------------------------------------------------
# CDC snapshot merge
# --------------------------------------------------------------------------

@register(
    "cdc_merge_customers",
    """
    WITH changes AS (
      SELECT c_custkey, c_name, c_nationkey, c_acctbal + 100 AS c_acctbal,
             'UPDATED' AS c_mktsegment, 'U' AS op
      FROM customer WHERE c_custkey % 10 = 0 AND c_custkey % 17 <> 0
      UNION ALL
      SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment, 'D'
      FROM customer WHERE c_custkey % 17 = 0
      UNION ALL
      SELECT c_custkey + 1000000, 'new customer', 0, 0.0, 'NEWSEG', 'I'
      FROM customer WHERE c_custkey % 23 = 0
    ), merged AS (
      SELECT s.* FROM customer s
      WHERE NOT EXISTS (SELECT 1 FROM changes ch WHERE ch.c_custkey = s.c_custkey)
      UNION ALL
      SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
      FROM changes WHERE op <> 'D'
    )
    SELECT c_mktsegment, count(*) AS n, round(sum(c_acctbal), 2) AS bal
    FROM merged GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def cdc_merge_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO analog on a plain parquet snapshot: a deterministic
    changeset (updates to keys %10, deletes of keys %17 — delete wins on
    overlap, like a later CDC event — inserts at keys %23 shifted) is
    applied via anti-join + union (operators/merge.py), then rolled up
    per segment so the gate compares a compact result."""
    cust = read_sf_parquet(spark, sf_dir, "customer")
    updates = (
        cust.where((F.col("c_custkey") % 10 == 0) & (F.col("c_custkey") % 17 != 0))
        .withColumn("c_acctbal", F.col("c_acctbal") + 100)
        .withColumn("c_mktsegment", F.lit("UPDATED"))
        .withColumn("op", F.lit("U"))
    )
    deletes = cust.where(F.col("c_custkey") % 17 == 0).withColumn("op", F.lit("D"))
    inserts = cust.where(F.col("c_custkey") % 23 == 0).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.lit("new customer").alias("c_name"),
        F.lit(0).cast("int").alias("c_nationkey"),
        F.lit(0.0).alias("c_acctbal"),
        F.lit("NEWSEG").alias("c_mktsegment"),
        F.lit("I").alias("op"),
    )
    changes = updates.unionByName(deletes).unionByName(inserts)
    merged = merge_changes(cust, changes, key_cols=["c_custkey"])
    return (
        merged.groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"), F.round(F.sum("c_acctbal"), 2).alias("bal"))
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# approximate quantiles with tolerance gate
# --------------------------------------------------------------------------

@register(
    "agg_approx_quantiles",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.25) + 0.000001, 2) AS p25,
           round(quantile_cont(l_extendedprice, 0.50) + 0.000001, 2) AS p50,
           round(quantile_cont(l_extendedprice, 0.75) + 0.000001, 2) AS p75,
           true AS approx_ok
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based quantiles, gated like agg_approx_distinct: the row
    carries the EXACT interpolated quantiles (hash-comparable across
    engines — Spark percentile == DuckDB quantile_cont) plus a boolean
    asserting the KLL/GK approx answer lands within 1% of exact, so the
    sketch's quality is part of the gate without putting its engine-
    specific value in the hash."""
    li = read_sf_parquet(spark, sf_dir, "lineitem")
    exact = F.percentile("l_extendedprice", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    approx = F.percentile_approx(
        "l_extendedprice", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)), F.lit(10000)
    )
    agg = li.groupBy("l_returnflag").agg(
        exact.alias("ex"), approx.alias("ap")
    )
    ok = F.aggregate(
        F.zip_with("ex", "ap", lambda e, a: (F.abs(e - a) <= 0.01 * F.abs(e))),
        F.lit(True),
        lambda acc, x: acc & x,
    )
    # +1e-6 before rounding on BOTH sides: interpolated quantiles of
    # 2-decimal prices land exactly on .xx5 rounding boundaries (e.g.
    # frac=0.5 between two cents), where last-ulp noise flips the cent;
    # the epsilon shifts every such tie off the boundary consistently.
    eps = F.lit(0.000001)
    return agg.select(
        "l_returnflag",
        F.round(F.col("ex")[0] + eps, 2).alias("p25"),
        F.round(F.col("ex")[1] + eps, 2).alias("p50"),
        F.round(F.col("ex")[2] + eps, 2).alias("p75"),
        ok.alias("approx_ok"),
    ).orderBy("l_returnflag")


# --------------------------------------------------------------------------
# grouped-map pandas UDF (applyInPandas)
# --------------------------------------------------------------------------

@register(
    "udf_grouped_map_zscore",
    """
    WITH stats AS (
      SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sd
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           round((e.value - s.mu) / s.sd, 4) AS zscore
    FROM events e JOIN stats s USING (event_type)
    ORDER BY abs((e.value - s.mu) / s.sd) DESC, e.event_id
    LIMIT 50
    """,
)
def udf_grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map pandas UDF (``applyInPandas``): per-event_type
    z-scores computed with pandas inside each group, top-50 outliers —
    the API surface for group-local Python transforms Spark builtins
    can't express (here they can, which is exactly what makes it
    oracle-checkable against the window/join twin). One shuffle on the
    group key; each group is a single Arrow batch."""
    import pandas as pd

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        sd = pdf["value"].std(ddof=1)
        mu = pdf["value"].mean()
        out = pdf[["event_id", "event_type"]].copy()
        out["zscore"] = ((pdf["value"] - mu) / sd).round(4)
        out["absz"] = ((pdf["value"] - mu) / sd).abs()
        return out

    ev = load_events(spark, sf_dir)
    return (
        ev.select("event_id", "event_type", "value")
        .groupBy("event_type")
        .applyInPandas(
            zscore, "event_id long, event_type string, zscore double, absz double"
        )
        .orderBy(F.col("absz").desc(), "event_id")
        .limit(50)
        .drop("absz")
    )


@register(
    "hll_sketch_rollup",
    """
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS merged_est_ok
    FROM events GROUP BY event_type
    """,
)
def hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup — THE pre-aggregation pattern for distinct
    counts at 100 TB: compute one HLL sketch per (event_type, day)
    partition (a single scan of the raw data, partial-aggregable
    map-side), then answer the coarser per-type question by MERGING the
    daily sketches (hll_union_agg over |types| x |days| binary sketches —
    never rescanning raw events). Nightly-materialized daily sketches
    make any date-range distinct-user query a sketch merge instead of a
    raw scan.

    Gate: the merged estimate must land within HLL's error envelope
    (lgConfigK=14 -> ~1% rsd; 5% gate) of the exact per-type distinct,
    which DuckDB recomputes exactly — so the cross-engine hash carries
    real counts, and the sketch path's correctness leaves as a boolean.
    """
    ev = load_events(spark, sf_dir)
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.hll_sketch_agg("user_id", F.lit(14)).alias("sketch"))
    )
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est_users")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_users")
    )
    return exact.join(merged, "event_type").select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("est_users") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("merged_est_ok"),
    )


# --------------------------------------------------------------------------
# distributed heavy hitters (Misra-Gries candidates + exact verify)
# --------------------------------------------------------------------------

@register(
    "heavy_hitters_lang",
    """
    SELECT lang AS key, CAST(count(*) AS BIGINT) AS cnt
    FROM documents
    GROUP BY 1
    HAVING count(*) > (SELECT count(*) FROM documents) / 6.0
    ORDER BY key
    """,
)
def heavy_hitters_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Languages exceeding 1/6 of the corpus ('en' at ~44% and 'zh' at
    ~15-17% straddle the bar; es/de/fr must be excluded — the threshold
    does real work on this column). The engine path is the one-pass
    bounded-memory shape (operators/sketch.py): per-partition
    Misra-Gries summaries via mapInPandas — O(k) memory per task, no
    full-cardinality shuffle — then an exact count restricted to the
    merged candidate set (broadcast semi-join). Output is EXACT, so the
    oracle is a plain HAVING over a group-by; what the sketch buys at
    100 TB is never shuffling the full key domain to answer a <=k-row
    question."""
    from ..operators.sketch import heavy_hitters

    docs = read_sf_parquet(spark, sf_dir, "documents")
    return heavy_hitters(docs, "lang", 6).orderBy("key")


# --------------------------------------------------------------------------
# snapshot reconciliation diff
# --------------------------------------------------------------------------

@register(
    "table_diff_snapshots",
    """
    WITH changes AS (
      SELECT c_custkey, c_name, c_nationkey, c_acctbal + 100 AS c_acctbal,
             'UPDATED' AS c_mktsegment, 'U' AS op
      FROM customer WHERE c_custkey % 10 = 0 AND c_custkey % 17 <> 0
      UNION ALL
      SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment, 'D'
      FROM customer WHERE c_custkey % 17 = 0
      UNION ALL
      SELECT c_custkey + 1000000, 'new customer', 0, 0.0, 'NEWSEG', 'I'
      FROM customer WHERE c_custkey % 23 = 0
    ), new_snap AS (
      SELECT s.c_custkey, s.c_name, s.c_nationkey, s.c_acctbal, s.c_mktsegment
      FROM customer s
      WHERE NOT EXISTS (SELECT 1 FROM changes ch WHERE ch.c_custkey = s.c_custkey)
      UNION ALL
      SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
      FROM changes WHERE op <> 'D'
    )
    SELECT CASE WHEN o.c_custkey IS NULL THEN 'added'
                WHEN n.c_custkey IS NULL THEN 'removed'
                WHEN o.c_name IS DISTINCT FROM n.c_name
                  OR o.c_nationkey IS DISTINCT FROM n.c_nationkey
                  OR o.c_acctbal IS DISTINCT FROM n.c_acctbal
                  OR o.c_mktsegment IS DISTINCT FROM n.c_mktsegment
                THEN 'changed' ELSE 'unchanged' END AS diff_class,
           count(*) AS n
    FROM customer o FULL OUTER JOIN new_snap n ON o.c_custkey = n.c_custkey
    GROUP BY 1 ORDER BY 1
    """,
)
def table_diff_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation: row-level diff of two table versions (the
    base customer snapshot vs the CDC-merged one) classified
    added / removed / changed / unchanged — the audit that validates a
    migration, a CDC pipeline, or a backfill actually produced the
    intended delta and nothing else. Change detection is column-wise
    null-safe inequality, not a rendered-string hash (float formatting
    is engine-idiosyncratic; IS DISTINCT FROM is not).

    Plan: ONE full-outer shuffle join co-partitioned on the key, then a
    4-key rollup — at 100 TB this is the canonical two-snapshot
    reconciliation shape (both sides shuffle once, nothing collects).
    The changeset here keys ~18% of the snapshot (every 10th/17th/23rd
    key), so the merge runs with ``broadcast_changes=False``: a
    proportional changeset must shuffle, not broadcast (the broadcast
    default exists for the common tiny-delta case; at 100 TB an 18%
    key set would blow the driver/executor broadcast budget). AQE still
    plans the anti join fine."""
    from ..operators.merge import merge_changes

    cust = read_sf_parquet(spark, sf_dir, "customer")
    updates = (
        cust.where((F.col("c_custkey") % 10 == 0) & (F.col("c_custkey") % 17 != 0))
        .withColumn("c_acctbal", F.col("c_acctbal") + 100)
        .withColumn("c_mktsegment", F.lit("UPDATED"))
        .withColumn("op", F.lit("U"))
    )
    deletes = cust.where(F.col("c_custkey") % 17 == 0).withColumn("op", F.lit("D"))
    inserts = cust.where(F.col("c_custkey") % 23 == 0).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.lit("new customer").alias("c_name"),
        F.lit(0).cast("int").alias("c_nationkey"),
        F.lit(0.0).alias("c_acctbal"),
        F.lit("NEWSEG").alias("c_mktsegment"),
        F.lit("I").alias("op"),
    )
    new_snap = merge_changes(
        cust,
        updates.unionByName(deletes).unionByName(inserts),
        key_cols=["c_custkey"],
        broadcast_changes=False,
    )
    o, n = cust.alias("o"), new_snap.alias("n")
    j = o.join(n, F.col("o.c_custkey") == F.col("n.c_custkey"), "full_outer")
    changed = (
        ~F.col("o.c_name").eqNullSafe(F.col("n.c_name"))
        | ~F.col("o.c_nationkey").eqNullSafe(F.col("n.c_nationkey"))
        | ~F.col("o.c_acctbal").eqNullSafe(F.col("n.c_acctbal"))
        | ~F.col("o.c_mktsegment").eqNullSafe(F.col("n.c_mktsegment"))
    )
    cls = (
        F.when(F.col("o.c_custkey").isNull(), "added")
        .when(F.col("n.c_custkey").isNull(), "removed")
        .when(changed, "changed")
        .otherwise("unchanged")
    )
    return (
        j.groupBy(cls.alias("diff_class"))
        .agg(F.count("*").alias("n"))
        .orderBy("diff_class")
    )


# --------------------------------------------------------------------------
# theta-sketch set algebra (audience overlap) + count-min point frequency
# --------------------------------------------------------------------------

@register(
    "sketch_theta_audience",
    """
    WITH flags AS (
      SELECT o_custkey,
             bool_or(o_orderstatus = 'F') AS fa,
             bool_or(o_orderstatus = 'O') AS fb
      FROM orders GROUP BY 1
    )
    SELECT CAST(sum(CASE WHEN fa AND fb THEN 1 ELSE 0 END) AS BIGINT)     AS inter_exact,
           CAST(sum(CASE WHEN fa OR fb THEN 1 ELSE 0 END) AS BIGINT)      AS union_exact,
           CAST(sum(CASE WHEN fa AND NOT fb THEN 1 ELSE 0 END) AS BIGINT) AS only_f_exact,
           TRUE AS inter_ok, TRUE AS union_ok, TRUE AS diff_ok
    FROM flags
    """,
)
def sketch_theta_audience(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch SET ALGEBRA over customer audiences — the capability
    tier above the HLL rollup (plans/advanced.py hll_sketch_rollup): HLL
    merges only by union, while Datasketches theta sketches answer
    INTERSECTION and DIFFERENCE cardinalities from the stored sketches
    alone. The 100 TB pattern: keep one tiny theta sketch per audience
    slice (here: customers with 'F' vs 'O' orders — partial overlap,
    1383 of ~1500 shared at sf0.01), and answer any overlap/exclusion
    question sketch-vs-sketch without rescanning raw data — the
    segment-overlap query a full count-distinct would re-shuffle the
    corpus for. One scan builds both sketches (conditional aggs); the
    exact twin (one groupBy + flag rollup) rides the same driver check
    within a 5%-of-UNION envelope. The envelope is relative to the union
    cardinality, not each result: theta set-operation error scales with
    |A∪B|/θ (the retained-sample universe), so a small difference set
    carved from two large sketches can be off by far more than 5% of
    itself while the sketch is behaving exactly to spec (measured at
    sf0.1: union 14981 → θ≈0.27, diff exact 523 vs est 571 — 9.2% of
    the diff, 0.32% of the union; sf0.01 sits below the 4096 nominal
    entries, exact mode, zero error).
    """
    o = read_sf_parquet(spark, sf_dir, "orders")
    sk = o.agg(
        F.theta_sketch_agg(
            F.when(F.col("o_orderstatus") == "F", F.col("o_custkey"))
        ).alias("a"),
        F.theta_sketch_agg(
            F.when(F.col("o_orderstatus") == "O", F.col("o_custkey"))
        ).alias("b"),
    )
    est = sk.select(
        F.theta_sketch_estimate(F.theta_intersection("a", "b")).alias("inter_est"),
        F.theta_sketch_estimate(F.theta_union("a", "b")).alias("union_est"),
        F.theta_sketch_estimate(F.theta_difference("a", "b")).alias("diff_est"),
    )
    flags = o.groupBy("o_custkey").agg(
        F.bool_or(F.col("o_orderstatus") == "F").alias("fa"),
        F.bool_or(F.col("o_orderstatus") == "O").alias("fb"),
    )
    exact = flags.agg(
        F.sum((F.col("fa") & F.col("fb")).cast("long")).alias("inter_exact"),
        F.sum((F.col("fa") | F.col("fb")).cast("long")).alias("union_exact"),
        F.sum((F.col("fa") & ~F.col("fb")).cast("long")).alias("only_f_exact"),
    )

    def ok(e, x):
        # slack is 5% of the UNION for every set expression — the error
        # scale of theta set algebra (see docstring), not 5% of x
        return F.abs(e.cast("double") - x) <= F.greatest(
            F.lit(2.0), 0.05 * F.col("union_exact")
        )

    j = exact.crossJoin(est)  # 1-row x 1-row scalar gate join
    return j.select(
        "inter_exact",
        "union_exact",
        "only_f_exact",
        ok(F.col("inter_est"), F.col("inter_exact")).alias("inter_ok"),
        ok(F.col("union_est"), F.col("union_exact")).alias("union_ok"),
        ok(F.col("diff_est"), F.col("only_f_exact")).alias("diff_ok"),
    )


@register(
    "sketch_cms_freq",
    """
    SELECT CAST(count(*) FILTER (WHERE user_id = 1) AS BIGINT) AS u1_exact,
           CAST(count(*) FILTER (WHERE user_id = 2) AS BIGINT) AS u2_exact,
           CAST(count(*) FILTER (WHERE user_id = 3) AS BIGINT) AS u3_exact,
           TRUE AS bounds_ok
    FROM events
    """,
)
def sketch_cms_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable Count-Min point-frequency tier: one CMS binary per
    event_type (built by the JVM ``count_min_sketch`` aggregate in a
    single scan), merged driver-side through Spark's public
    ``org.apache.spark.util.sketch.CountMinSketch`` — the rollup-store
    pattern again: per-slice sketches persist tiny (width 2/eps ints)
    and any coarser frequency question is answered by merging sketches,
    never rescanning raw events. Completes the sketch family:
    HLL = distinct by union, theta = distinct set algebra,
    Misra-Gries = top keys, CMS = per-key counts.

    Gate: the classic CMS guarantee, est >= exact AND
    est <= exact + eps*N (eps=0.001, confidence 0.99) for three fixed
    user ids, checked against the exact counts computed distributed
    (those counts also cross engines against DuckDB). Driver traffic is
    |event_type| sketch binaries — bounded, like the layout-family
    footer reads."""
    import math

    events = load_events(spark, sf_dir)
    per_type = (
        events.groupBy("event_type")
        .agg(
            F.count_min_sketch(
                "user_id", F.lit(0.001), F.lit(0.99), F.lit(42)
            ).alias("sk"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    jvm_cms = spark._jvm.org.apache.spark.util.sketch.CountMinSketch
    merged, n_total = None, 0
    for r in per_type:
        sk = jvm_cms.readFrom(bytes(r["sk"]))
        n_total += r["n"]
        merged = sk if merged is None else merged.mergeInPlace(sk)
    users = (1, 2, 3)
    ests = {u: int(merged.estimateCount(u)) for u in users} if merged else {}
    slack = int(math.ceil(0.001 * n_total))

    exact = events.agg(
        *[
            F.count(F.when(F.col("user_id") == u, 1))
            .cast("long")
            .alias(f"u{u}_exact")
            for u in users
        ]
    )
    bounds = F.lit(True)
    for u in users:
        e = F.lit(ests.get(u, 0)).cast("long")
        x = F.col(f"u{u}_exact")
        bounds = bounds & (e >= x) & (e <= x + F.lit(slack))
    return exact.select(
        *[f"u{u}_exact" for u in users], bounds.alias("bounds_ok")
    )


@register(
    "sketch_tdigest_rollup",
    """
    SELECT event_type,
           CAST(count(value) AS BIGINT)               AS n,
           round(quantile_cont(value, 0.50), 4)       AS exact_p50,
           round(quantile_cont(value, 0.95), 4)       AS exact_p95,
           TRUE                                       AS p50_ok,
           TRUE                                       AS p95_ok
    FROM events
    GROUP BY event_type
    """,
)
def sketch_tdigest_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable QUANTILE tier (t-digest, Dunning & Ertl) — the sketch
    family's missing classic: store per-(event_type, hour) digests,
    answer any coarser percentile later by merging centroids, never
    rescanning raw events. Spark exposes no re-aggregatable quantile
    binary, so this is operators/sketch.py's own merging digest:
    partials via one narrow mapInPandas scan (O(delta) memory per
    group per batch), hourly -> per-type rollup via one centroid-array
    shuffle.

    Gate: the digest's exact row count crosses engines (sum of centroid
    weights stays integral through every merge), and the estimated
    p50/p95 land inside the exact [q45,q55] / [q93,q97] value windows —
    ±5% RANK slack against a measured ~1e-4 rank error at delta=200, so
    the booleans are deterministic despite merge-order-dependent
    centroid layouts. Exact side computed distributed
    (percentile == quantile_cont, the agg_percentiles parity)."""
    from ..operators.sketch import tdigest_partials, tdigest_rollup

    # Spread the single-file small-SF scan before the Arrow-batched
    # digest build: the parse_dead_letter precedent — the Python pass is
    # this gate's whole cost and would otherwise run single-threaded
    # (measured 1.85s -> ~0.3s at sf0.1 on 32 cores; a real corpus
    # arrives pre-partitioned, so defaultParallelism keeps this
    # cluster-shaped rather than a magic constant). Round-robin, NOT
    # keyed by group: partials exist precisely so raw rows never shuffle
    # by group key; digests merge across batches/partitions regardless.
    events = (
        load_events(spark, sf_dir)
        .repartition(spark.sparkContext.defaultParallelism)
        .withColumn("hour", F.date_format("ts", "yyyy-MM-dd HH"))
    )
    partials = tdigest_partials(
        events, "value", ["event_type", "hour"], delta=200.0
    )
    rolled = tdigest_rollup(partials, ["event_type"], [0.50, 0.95], delta=200.0)
    # ONE percentile buffer for all six quantiles (array form) instead
    # of six independent aggregation buffers, each holding and sorting
    # the full per-group value multiset (guide §1.2 per-task work;
    # measured 0.69s -> 0.31s at sf0.1). Same Percentile aggregate, so
    # each element is bit-identical to the scalar call's result.
    qs = F.percentile(
        "value",
        F.array(*[F.lit(x) for x in (0.50, 0.95, 0.45, 0.55, 0.93, 0.97)]),
    )
    exact = (
        load_events(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.count("value").cast("long").alias("n_exact"),
            qs.alias("_qs"),
        )
        .select(
            "event_type",
            "n_exact",
            F.round(F.element_at("_qs", 1), 4).alias("exact_p50"),
            F.round(F.element_at("_qs", 2), 4).alias("exact_p95"),
            F.element_at("_qs", 3).alias("_q45"),
            F.element_at("_qs", 4).alias("_q55"),
            F.element_at("_qs", 5).alias("_q93"),
            F.element_at("_qs", 6).alias("_q97"),
        )
    )
    j = rolled.join(exact, "event_type")
    return j.select(
        "event_type",
        # n from the DIGEST (not the exact side): proves weight
        # conservation through the rollup, hash-checked vs the oracle
        F.col("n"),
        "exact_p50",
        "exact_p95",
        ((F.col("est_p50") >= F.col("_q45")) & (F.col("est_p50") <= F.col("_q55"))).alias("p50_ok"),
        ((F.col("est_p95") >= F.col("_q93")) & (F.col("est_p95") <= F.col("_q97"))).alias("p95_ok"),
    )


@register(
    "hll_sliding_distinct",
    """
    WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
    trail7 AS (
      SELECT d.day, count(DISTINCT e.user_id) AS exact_users
      FROM days d JOIN events e
        ON CAST(e.ts AS DATE) BETWEEN d.day - INTERVAL 6 DAY AND d.day
      GROUP BY d.day
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(exact_users AS BIGINT) AS exact_users,
           TRUE AS sliding_est_ok
    FROM trail7 ORDER BY day
    """,
)
def hll_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per day from STORED daily HLL
    sketches — the sliding-window form of hll_sketch_rollup and the
    reason mergeable sketches exist: the raw stream is scanned ONCE into
    |days| daily sketches; every trailing window is then a union of <= 7
    binaries on the day-table (|days| x 7 rows), so adding a new day
    costs one sketch + 7 merges, never a 7-day rescan. An exact rolling
    count-distinct cannot be pre-aggregated at all (distinct is not
    mergeable) — at 100 TB it would re-touch a week of raw data per day.

    Gate: each day's sketch-union estimate must land within 5% of the
    exact trailing distinct (the verification twin both engines compute;
    the oracle's exact side is the crossable value)."""
    ev = load_events(spark, sf_dir)
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sketch")
    )
    daily = daily.localCheckpoint(eager=False)  # spine + union reuse
    a, b = daily.select("day").alias("a"), daily.alias("b")
    est = (
        a.join(
            b,
            (F.col("b.day") >= F.date_sub(F.col("a.day"), 6))
            & (F.col("b.day") <= F.col("a.day")),
        )
        .groupBy(F.col("a.day").alias("day"))
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est")
        )
    )
    exact = (
        daily.select("day")
        .join(
            ev.select(F.to_date("ts").alias("eday"), "user_id"),
            (F.col("eday") >= F.date_sub(F.col("day"), 6))
            & (F.col("eday") <= F.col("day")),
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").cast("long").alias("exact_users"))
    )
    return (
        exact.join(est, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "exact_users",
            (
                F.abs(F.col("est") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("sliding_est_ok"),
        )
        .orderBy("day")
    )


@register(
    "dq_sequence_gaps",
    """
    WITH ids AS (SELECT event_id FROM events),
    stats AS (
      SELECT min(event_id) AS lo, max(event_id) AS hi,
             count(*) AS n, count(DISTINCT event_id) AS nd
      FROM ids
    ),
    gap_starts AS (
      SELECT a.event_id + 1 AS gap_start
      FROM ids a LEFT JOIN ids b ON b.event_id = a.event_id + 1
      WHERE b.event_id IS NULL
        AND a.event_id < (SELECT hi FROM stats)
      ORDER BY gap_start LIMIT 10
    )
    SELECT CAST((SELECT lo FROM stats) AS BIGINT) AS min_id,
           CAST((SELECT hi FROM stats) AS BIGINT) AS max_id,
           CAST((SELECT n FROM stats) AS BIGINT) AS n_rows,
           CAST((SELECT hi - lo + 1 - nd FROM stats) AS BIGINT)
             AS n_missing,
           CAST((SELECT n - nd FROM stats) AS BIGINT) AS n_duplicate_ids,
           CAST((SELECT coalesce(min(gap_start), -1) FROM gap_starts)
                AS BIGINT) AS first_gap_start
    """,
)
def dq_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-gap audit on event_id — the missed-delivery / double-
    delivery screen for any monotonically-assigned id column: total
    missing ids in [min, max], duplicate-id count, and the first gap
    start. Gap starts are found WITHOUT a global sort: an id starts a
    gap iff id+1 is absent — one self hash-join on a shifted key
    (co-partitioned, no ordering requirement at any scale); the
    summary aggregates are a single pass. The first-gap probe is a
    sort-limit on the (small) gap-start set, never on raw rows."""
    ev = load_events(spark, sf_dir).select("event_id")
    ev = ev.localCheckpoint(eager=False)  # stats + both join sides
    stats = ev.agg(
        F.min("event_id").alias("lo"),
        F.max("event_id").alias("hi"),
        F.count("*").alias("n"),
        F.countDistinct("event_id").alias("nd"),
    )
    a, b = ev.alias("a"), ev.alias("b")
    gap_starts = (
        a.join(b, F.col("b.event_id") == F.col("a.event_id") + 1, "left_anti")
        .crossJoin(F.broadcast(stats.select("hi")))
        .where(F.col("a.event_id") < F.col("hi"))
        .select((F.col("a.event_id") + 1).alias("gap_start"))
        .orderBy("gap_start")
        .limit(10)
    )
    first_gap = gap_starts.agg(
        F.coalesce(F.min("gap_start"), F.lit(-1)).alias("first_gap_start")
    )
    return stats.crossJoin(F.broadcast(first_gap)).select(
        F.col("lo").cast("long").alias("min_id"),
        F.col("hi").cast("long").alias("max_id"),
        F.col("n").cast("long").alias("n_rows"),
        (F.col("hi") - F.col("lo") + 1 - F.col("nd"))
        .cast("long")
        .alias("n_missing"),
        (F.col("n") - F.col("nd")).cast("long").alias("n_duplicate_ids"),
        F.col("first_gap_start").cast("long").alias("first_gap_start"),
    )


# --------------------------------------------------------------------------
# round 9: governance audits — k-anonymity / l-diversity and freshness lag
# --------------------------------------------------------------------------

_KANON_K = 5


@register(
    "privacy_k_anonymity",
    f"""
    WITH g AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(floor(value / 50.0) AS BIGINT) AS vb,
             count(*) AS sz, count(DISTINCT user_id) AS l_div
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2, 3
    )
    SELECT CAST(count(*) AS BIGINT) AS n_groups,
           CAST(min(sz) AS BIGINT) AS min_group_size,
           CAST(count(*) FILTER (sz < {_KANON_K}) AS BIGINT)
             AS groups_below_k,
           CAST(sum(sz) FILTER (sz < {_KANON_K}) AS BIGINT)
             AS rows_below_k,
           round(CAST(CAST(coalesce(sum(sz) FILTER (sz < {_KANON_K}), 0)
                 * 1.0 / sum(sz) AS REAL) AS DOUBLE) + 0.00000001, 4)
             AS frac_rows_below_k,
           CAST(min(l_div) AS BIGINT) AS min_l_diversity
    FROM g
    """,
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit over a quasi-identifier tuple
    (event_type, event date, value bucket) — the re-identification-risk
    report a training-data compliance pass runs before release: how many
    QI groups are smaller than k=5, what fraction of ROWS sit in them
    (the actual exposure), and the minimum l-diversity (distinct users —
    the sensitive attribute — within any group; l=1 means a group maps
    to one person even when it is k-large).

    Scale shape: one hash aggregate to the QI-group frame (count +
    count-distinct in the same pass), then a 1-row reduction over the
    group table — group cardinality is the product of bounded QI
    domains, never row count. No sort, no join."""
    ev = load_events(spark, sf_dir).where(F.col("value").isNotNull())
    g = ev.groupBy(
        "event_type",
        F.to_date("ts").alias("d"),
        F.floor(F.col("value") / 50.0).cast("long").alias("vb"),
    ).agg(
        F.count("*").alias("sz"),
        F.countDistinct("user_id").alias("l_div"),
    )
    below = F.col("sz") < _KANON_K
    return g.agg(
        F.count("*").cast("long").alias("n_groups"),
        F.min("sz").cast("long").alias("min_group_size"),
        F.count(F.when(below, 1)).cast("long").alias("groups_below_k"),
        F.sum(F.when(below, F.col("sz"))).cast("long").alias("rows_below_k"),
        F.round(
            (
                F.coalesce(F.sum(F.when(below, F.col("sz"))), F.lit(0))
                / F.sum("sz")
            )
            .cast("float")
            .cast("double")
            + 0.00000001,
            4,
        ).alias("frac_rows_below_k"),
        F.min("l_div").cast("long").alias("min_l_diversity"),
    )


@register(
    "dq_freshness_lag",
    """
    WITH mx AS (SELECT max(ts) AS global_max FROM events)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS latest_ts,
           CAST(floor(date_diff('second', max(ts),
                                (SELECT global_max FROM mx)) / 60.0)
                AS BIGINT) AS lag_minutes,
           CAST(date_diff('second', max(ts), (SELECT global_max FROM mx))
                > 1800 AS INT) AS stale
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def dq_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source freshness audit — the staleness panel an ingest
    pipeline alarms on: each event type's latest arrival, its lag in
    whole minutes behind the freshest record anywhere in the corpus,
    and a stale flag at a 30-minute SLA. (Lag is measured against the
    corpus max, not wall clock, so the audit is deterministic and
    replayable.)

    Scale shape: one partial-aggregable scan to the per-type (count,
    max) frame, then the global max is an aggregate OF that k-row frame
    broadcast back — the source is never rescanned. No sort beyond the
    k-row display order."""
    ev = load_events(spark, sf_dir)
    per = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.max("ts").alias("max_ts"),
    )
    per = per.localCheckpoint(eager=False)  # global max reuses the k rows
    mx = per.agg(F.max("max_ts").alias("global_max"))
    # DuckDB date_diff('second') counts BOUNDARY CROSSINGS, i.e.
    # floor(b) - floor(a) on epoch seconds — neither the fractional
    # difference (flips `stale` inside (1800, 1801) s) nor
    # floor(b - a) (off by one when the fractional parts straddle a
    # boundary) is its twin
    lag_s = F.floor(F.col("global_max").cast("double")) - F.floor(
        F.col("max_ts").cast("double")
    )
    return (
        per.crossJoin(F.broadcast(mx))
        .select(
            "event_type",
            "n",
            F.date_format("max_ts", "yyyy-MM-dd HH:mm:ss").alias("latest_ts"),
            F.floor(lag_s / 60.0).cast("long").alias("lag_minutes"),
            (lag_s > 1800).cast("int").alias("stale"),
        )
        .orderBy("event_type")
    )
