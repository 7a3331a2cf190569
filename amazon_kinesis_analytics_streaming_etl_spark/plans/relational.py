"""Relational query surface (SURVEY.md §2B) with DuckDB oracle SQL.

Every query here is a (spark, sf_dir) -> DataFrame callable plus an ANSI
SQL string the DuckDB oracle runs on the same parquet tables. Conventions
that make the hash-compare robust (driver sorts columns by name and
hashes values, order-insensitive):

- every computed column aliased identically in Spark and SQL;
- double aggregates rounded (2-6 dp) on BOTH sides — engines sum floats
  in different orders, rounding removes last-ulp drift;
- timestamps projected as formatted strings (engine-canonical form);
- every LIMIT ordered by a unique tie-break key.

Scale notes are per-query; the common ones: dimension joins broadcast
(Catalyst auto, <10 MB), fact-fact joins shuffle on join keys, aggregates
get map-side partial aggregation, filters/projections push into the
parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        from ..schemas import load_events

        return load_events(spark, sf_dir)
    from ..schemas import read_sf_parquet

    return read_sf_parquet(spark, sf_dir, name)


# --------------------------------------------------------------------------
# TPC-H-style analytics
# --------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                    AS sum_qty,
           round(sum(l_extendedprice), 2)                               AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4)                                    AS avg_qty,
           round(avg(l_extendedprice), 4)                               AS avg_price,
           round(avg(l_discount), 6)                                    AS avg_disc,
           count(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: single-table scan + hash aggregate. Plan: filter
    pushed to parquet scan; partial aggregation map-side; one shuffle on
    the (low-cardinality) group keys."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d')                 AS orderdate,
           o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> join -> agg -> top-k.
    customer (filtered) broadcasts onto orders BEFORE the orderkey
    shuffle, so the exchange carries only the BUILDING-segment order
    slice (~1/|segments|) instead of all date-filtered orders — a
    shuffle-bytes reduction that matters at real scale; at sf0.1 the
    exchange is too small for it to move wall-clock (r12 A/B medians
    0.76 -> 0.77 s, parity within host noise, identical output).
    lineitem joins that slice on orderkey; top-10 is TakeOrdered (no
    global sort shuffle)."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1999-01-01 00:00:00").cast("timestamp")
    )
    o2 = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    return (
        li.join(o2, li.l_orderkey == o2.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_region_revenue",
    """
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join, dimension-chain-first. The selective
    r_name filter reaches lineitem BEFORE any shuffle: region -> nation
    -> supplier collapses to one broadcast ASIA-supplier dim, lineitem
    broadcast-joins it (cutting the fact table to the ASIA-supplier
    slice, ~1/|regions|), and only then do the orderkey/custkey shuffle
    joins run — so the big exchanges carry the filtered slice and orders
    shuffles once, not twice (the previous customer-first order shuffled
    full lineitem AND orders on two different keys; r12 A/B: 1.12 ->
    0.67 s at sf0.1, identical output)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    s_asia = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    j = (
        li.join(F.broadcast(s_asia), li.l_suppkey == s_asia.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
    )
    return (
        j.join(c, (j.o_custkey == c.c_custkey) & (j.s_nationkey == c.c_nationkey))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


# --------------------------------------------------------------------------
# Join family
# --------------------------------------------------------------------------

@register(
    "join_left_anti",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_left_semi",
    """
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


@register(
    "join_full_outer",
    """
    WITH rich AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 5000),
         f_orders AS (SELECT o_custkey, count(*) AS n_f
                      FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey)
    SELECT coalesce(rich.c_custkey, f_orders.o_custkey) AS custkey,
           round(coalesce(rich.c_acctbal, -1.0), 2)     AS acctbal,
           coalesce(f_orders.n_f, 0)                    AS n_f_orders
    FROM rich FULL OUTER JOIN f_orders ON rich.c_custkey = f_orders.o_custkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    rich = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 5000)
        .select("c_custkey", "c_acctbal")
    )
    f_orders = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_f"))
    )
    j = rich.join(f_orders, rich.c_custkey == f_orders.o_custkey, "full_outer")
    return j.select(
        F.coalesce(rich.c_custkey, f_orders.o_custkey).alias("custkey"),
        F.round(F.coalesce(F.col("c_acctbal"), F.lit(-1.0)), 2).alias("acctbal"),
        F.coalesce(F.col("n_f"), F.lit(0)).alias("n_f_orders"),
    )


@register(
    "join_right_outer",
    """
    SELECT c_custkey, c_name, coalesce(oc.n_orders, 0) AS n_orders
    FROM (SELECT o_custkey, count(*) AS n_orders
          FROM orders GROUP BY o_custkey) oc
    RIGHT OUTER JOIN customer ON oc.o_custkey = c_custkey
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer equi-join: every customer kept, order counts null-filled.
    Catalyst rewrites to a left join with sides swapped; the pre-aggregated
    side stays small enough to broadcast at any SF (bounded by custkey
    cardinality after partial aggregation)."""
    oc = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    c = _t(spark, sf_dir, "customer")
    return oc.join(c, oc.o_custkey == c.c_custkey, "right_outer").select(
        "c_custkey",
        "c_name",
        F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
    )


@register(
    "join_cross",
    """
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian product of two bounded dimensions. Plan:
    BroadcastNestedLoopJoin — safe only because both sides are dimension
    tables (|region| x |nation| rows); the engine never crosses facts."""
    r = _t(spark, sf_dir, "region").select("r_name")
    n = _t(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


@register(
    "join_enrich_events",
    """
    SELECT r_name, c_mktsegment, count(*) AS n_events, round(sum(value), 2) AS sum_value
    FROM events
      JOIN customer ON user_id = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, c_mktsegment
    """,
)
def join_enrich_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-enrichment shape in batch: fact x 3 broadcast dims. At 100 TB
    the fact side never shuffles for the join — all three dims broadcast —
    and the only shuffle is the final low-cardinality aggregate."""
    e = _t(spark, sf_dir, "events")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        e.join(F.broadcast(c), e.user_id == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "c_mktsegment")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


# --------------------------------------------------------------------------
# Aggregation family
# --------------------------------------------------------------------------

@register(
    "agg_rollup",
    """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


@register(
    "agg_cube",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity), 2) AS qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
    )


@register(
    "agg_grouping_sets",
    """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@register(
    "agg_count_distinct",
    """
    SELECT l_returnflag,
           count(DISTINCT l_suppkey)  AS n_suppliers,
           count(DISTINCT l_partkey)  AS n_parts,
           count(*)                   AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.count("*").alias("n_rows"),
        )
    )


@register(
    "agg_percentiles",
    """
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.5), 4)  AS p50,
           round(quantile_cont(o_totalprice, 0.95), 4) AS p95
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` == DuckDB
    `quantile_cont`). The 100 TB path is approx_percentile (t-digest,
    no per-group sort buffer) — engine-specific, so the exact form is
    the oracle-checked one."""
    o = _t(spark, sf_dir, "orders")
    # one percentile buffer for both quantiles (r12): the array form
    # sorts each group once; per-element results are bit-identical
    pq = F.percentile("o_totalprice", F.array(F.lit(0.5), F.lit(0.95)))
    return o.groupBy("o_orderstatus").agg(
        F.round(pq[0], 4).alias("p50"),
        F.round(pq[1], 4).alias("p95"),
    )


@register(
    "agg_collect_set",
    """
    SELECT l_returnflag,
           array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
           CAST(len(list(DISTINCT l_linestatus)) AS INT) AS n_statuses
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-set aggregation (collect_set is unordered by contract —
    always sort before comparing/storing). The driver-facing projection is
    array-free (sorted CSV string): the gate's pandas canonicalizer cannot
    sort/hash list cells (r1 harness crash)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.array_join(F.sort_array(F.collect_set("l_linestatus")), ",").alias("statuses"),
        F.size(F.collect_set("l_linestatus")).alias("n_statuses"),
    )


@register(
    "agg_corr_covar",
    """
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6)       AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar,
           round(var_samp(l_discount), 8)                    AS disc_var
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics (corr / covar_samp / var_samp) — single-pass
    decomposable aggregates, map-side partials apply."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("qty_price_covar"),
        F.round(F.var_samp("l_discount"), 8).alias("disc_var"),
    )


@register(
    "scalar_intervals",
    """
    SELECT o_orderkey,
           strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3mo,
           strftime(o_orderdate + INTERVAL 45 DAY, '%Y-%m-%d')  AS plus_45d,
           strftime(last_day(o_orderdate), '%Y-%m-%d')          AS month_end
    FROM orders
    WHERE o_orderstatus = 'P'
    """,
)
def scalar_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar interval arithmetic: month-add (calendar-aware), day-add,
    last-day-of-month."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "P")
    return o.select(
        "o_orderkey",
        F.date_format(F.add_months("o_orderdate", 3), "yyyy-MM-dd").alias("plus_3mo"),
        F.date_format(F.date_add(F.to_date("o_orderdate"), 45), "yyyy-MM-dd").alias(
            "plus_45d"
        ),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
    )


@register(
    "curation_sample",
    """
    SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '19999999'
    GROUP BY lang
    """,
)
def curation_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% corpus sample (md5-prefix threshold — stable
    across runs/engines/partitionings, unlike seeded df.sample) with
    per-language stats; the curation primitive for held-out splits."""
    from ..operators.scale import deterministic_sample

    d = _t(spark, sf_dir, "documents")
    return (
        deterministic_sample(d, "doc_id", 0.1)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


@register(
    "agg_approx_distinct",
    """
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS exact_parts,
           TRUE AS within_5pct
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the 100 TB path for
    distinct counts (no per-key state explosion). The raw HLL estimate is
    engine-specific, so the driver-facing projection emits the exact
    count plus a ``within_5pct`` quality bit; the oracle asserts TRUE, so
    the estimate's accuracy is part of the hash-compared gate."""
    li = _t(spark, sf_dir, "lineitem")
    exact = F.count_distinct("l_partkey")
    approx = F.approx_count_distinct("l_partkey", rsd=0.02)
    return li.groupBy("l_returnflag").agg(
        exact.alias("exact_parts"),
        (F.abs(approx - exact) <= 0.05 * exact).alias("within_5pct"),
    )


@register(
    "agg_having",
    """
    SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS spend
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 15
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("spend"))
        .where(F.col("n_orders") >= 15)
    )


@register(
    "agg_stats",
    """
    SELECT l_returnflag,
           round(min(l_extendedprice), 2)        AS min_price,
           round(max(l_extendedprice), 2)        AS max_price,
           round(avg(l_extendedprice), 4)        AS avg_price,
           round(stddev_samp(l_extendedprice), 4) AS sd_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        )
    )


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------

@register(
    "window_topk_per_group",
    """
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group: one shuffle on the partition key, per-partition
    sort (no global sort). The windowed generalization of K4's keep-one-
    per-key."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            "rn",
        )
    )


@register(
    "window_rank_dense",
    """
    SELECT o_orderkey, o_orderpriority,
           rank()       OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS rnk,
           dense_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS drnk
    FROM orders
    WHERE o_orderstatus = 'F'
    """,
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc())
    return (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
    )


@register(
    "window_running_sum",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
    FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@register(
    "window_lag_lead",
    """
    SELECT o_custkey, o_orderkey,
           round(o_totalprice - lag(o_totalprice) OVER w, 2)  AS delta_prev,
           round(lead(o_totalprice) OVER w - o_totalprice, 2) AS delta_next
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    tp = F.col("o_totalprice")
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(tp - F.lag(tp).over(w), 2).alias("delta_prev"),
        F.round(F.lead(tp).over(w) - tp, 2).alias("delta_next"),
    )


@register(
    "window_rank_family",
    """
    SELECT o_orderkey,
           ntile(4)       OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS prank,
           round(cume_dist()    OVER w, 6) AS cdist,
           first_value(o_orderkey) OVER w AS first_key,
           last_value(o_orderkey)  OVER (PARTITION BY o_orderstatus
                                         ORDER BY o_totalprice, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                                  AND UNBOUNDED FOLLOWING) AS last_key
    FROM orders
    WHERE o_orderstatus = 'P'
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank window functions (ntile / percent_rank /
    cume_dist / first_value / last_value). The unbounded-following frame
    for last_value is explicit — the default frame stops at CURRENT ROW,
    a classic silent-wrong-answer trap in both engines."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "P")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.first("o_orderkey").over(w).alias("first_key"),
        F.last("o_orderkey").over(w_full).alias("last_key"),
    )


@register(
    "topk_global",
    """
    SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: TakeOrderedAndProject — per-partition partial top-k
    merged on the driver; never a full global sort shuffle."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("totalprice"))
    )


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------

@register(
    "set_intersect",
    """
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    y96 = o.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select("o_custkey")
    y97 = o.where(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("o_custkey")
    return y96.intersect(y97)


@register(
    "set_except",
    """
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.subtract(o)  # EXCEPT (distinct) semantics


@register(
    "set_union",
    """
    SELECT DISTINCT c_custkey, 'rich' AS tag FROM customer WHERE c_acctbal > 9000
    UNION
    SELECT DISTINCT c_custkey, 'building' AS tag FROM customer
    WHERE c_mktsegment = 'BUILDING' AND c_custkey < 100
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    rich = c.where(F.col("c_acctbal") > 9000).select(
        "c_custkey", F.lit("rich").alias("tag")
    )
    bld = c.where((F.col("c_mktsegment") == "BUILDING") & (F.col("c_custkey") < 100)).select(
        "c_custkey", F.lit("building").alias("tag")
    )
    return rich.union(bld).distinct()


# --------------------------------------------------------------------------
# Scalar function coverage
# --------------------------------------------------------------------------

@register(
    "scalar_datetime",
    """
    SELECT CAST(year(o_orderdate) AS INT)  AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           count(*) AS n,
           CAST(min(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)) AS BIGINT) AS min_day_off,
           strftime(min(date_trunc('month', o_orderdate)), '%Y-%m-%d') AS month_start
    FROM orders
    GROUP BY 1, 2
    """,
)
def scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mo")
        )
        .agg(
            F.count("*").alias("n"),
            F.min(
                F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date"))
            ).cast("long").alias("min_day_off"),
            F.date_format(F.min(F.date_trunc("month", F.col("o_orderdate"))), "yyyy-MM-dd").alias(
                "month_start"
            ),
        )
    )


@register(
    "scalar_string",
    """
    SELECT p_partkey,
           upper(p_name)                             AS name_upper,
           substring(p_name, 1, 4)                   AS pfx,
           CAST(length(p_name) AS INT)               AS name_len,
           concat(p_brand, '-', p_type)              AS brand_type,
           regexp_replace(p_name, '[aeiou]', '', 'g') AS no_vowels,
           CASE WHEN p_name LIKE '%bolt%' THEN 1 ELSE 0 END AS is_bolt
    FROM part
    """,
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 4).alias("pfx"),
        F.length("p_name").cast("int").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit("-"), F.col("p_type")).alias("brand_type"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("no_vowels"),
        F.when(F.col("p_name").like("%bolt%"), 1).otherwise(0).alias("is_bolt"),
    )


@register(
    "scalar_conditional",
    """
    SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
                WHEN c_acctbal < 3000 THEN 'low'
                WHEN c_acctbal < 7000 THEN 'mid'
                ELSE 'high' END AS tier,
           coalesce(nullif(c_mktsegment, 'MACHINERY'), 'OTHER') AS seg,
           count(*) AS n,
           round(avg(c_acctbal), 4) AS avg_bal
    FROM customer
    GROUP BY 1, 2
    """,
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    tier = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 3000, "low")
        .when(F.col("c_acctbal") < 7000, "mid")
        .otherwise("high")
        .alias("tier")
    )
    seg = F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("OTHER")).alias(
        "seg"
    )
    return c.groupBy(tier, seg).agg(
        F.count("*").alias("n"), F.round(F.avg("c_acctbal"), 4).alias("avg_bal")
    )


@register(
    "scalar_math",
    """
    SELECT l_linestatus,
           round(sum(abs(l_extendedprice - 1000.0)), 2)  AS sum_abs_dev,
           round(avg(sqrt(l_quantity)), 6)               AS avg_sqrt_qty,
           round(avg(ln(l_extendedprice + 1.0)), 6)      AS avg_log_price,
           CAST(sum(CAST(ceil(l_discount * 10) AS BIGINT)) AS BIGINT) AS sum_ceil_disc,
           CAST(sum(CAST(floor(l_tax * 10) AS BIGINT)) AS BIGINT)     AS sum_floor_tax
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(F.sum(F.abs(F.col("l_extendedprice") - 1000.0)), 2).alias("sum_abs_dev"),
        F.round(F.avg(F.sqrt("l_quantity")), 6).alias("avg_sqrt_qty"),
        F.round(F.avg(F.log(F.col("l_extendedprice") + 1.0)), 6).alias("avg_log_price"),
        F.sum(F.ceil(F.col("l_discount") * 10).cast("long")).cast("long").alias("sum_ceil_disc"),
        F.sum(F.floor(F.col("l_tax") * 10).cast("long")).cast("long").alias("sum_floor_tax"),
    )


# --------------------------------------------------------------------------
# Semi-structured
# --------------------------------------------------------------------------

@register(
    "json_extract_props",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
           count(*) AS n,
           CAST(min(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS min_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
    FROM events
    GROUP BY 1
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.groupBy((k % 10).alias("k_bucket"))
        .agg(
            F.count("*").alias("n"),
            F.min(k).cast("int").alias("min_k"),
            F.max(k).cast("int").alias("max_k"),
        )
    )


@register(
    "explode_tokens",
    """
    SELECT token, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT 20
    """,
)
def explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(20)
    )


@register(
    "posexplode_tokens",
    """
    SELECT doc_id, pos, tok
    FROM (SELECT doc_id,
                 unnest(string_split(text, ' ')) AS tok,
                 CAST(generate_subscripts(string_split(text, ' '), 1) AS INT) AS pos
          FROM documents)
    WHERE pos <= 3
    """,
)
def posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode: first three tokens of each document with
    their 1-based positions (generator with ordinality)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok"))
        .withColumn("pos", (F.col("pos") + 1).cast("int"))  # 1-based like SQL
        .where(F.col("pos") <= 3)
        .select("doc_id", "pos", "tok")
    )


@register(
    "sessionize_events",
    """
    WITH ordered AS (
      SELECT user_id, ts, value, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
      FROM events
    ), sess AS (
      SELECT user_id, ts, value,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_idx
      FROM ordered
    )
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           count(*) AS n_events, round(sum(value), 2) AS session_value,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start
    FROM sess
    GROUP BY user_id, session_idx
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands): lag + cumulative-sum of
    gap flags per user, 30-minute gap — the batch twin of
    stream_session_windows, as a reusable aggregation (one window
    shuffle on user_id, reused by both window passes and the final
    grouping)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    gap = F.when(
        F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w) > 1800, 1
    ).otherwise(0)
    sess = e.withColumn("new_sess", gap).withColumn(
        "session_idx", F.sum("new_sess").over(w_run).cast("long")
    )
    return sess.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("session_value"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
    )


@register(
    "filter_predicates",
    """
    SELECT o_orderkey, o_orderstatus, o_orderpriority
    FROM orders
    WHERE o_orderstatus IN ('F', 'P')
      AND o_orderpriority LIKE '1-%'
      AND o_totalprice BETWEEN 50000 AND 200000
      AND o_custkey IS NOT NULL
    """,
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate family: IN / LIKE / BETWEEN / null-test — all pushed to
    the parquet scan (verify PushedFilters in .explain)."""
    o = _t(spark, sf_dir, "orders")
    return o.where(
        F.col("o_orderstatus").isin("F", "P")
        & F.col("o_orderpriority").like("1-%")
        & F.col("o_totalprice").between(50000, 200000)
        & F.col("o_custkey").isNotNull()
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority")


@register(
    "semi_structured_arrays",
    """
    SELECT l_linenumber,
           round(sum(([l_quantity, l_extendedprice])[2]), 2) AS sum_second,
           round(avg(([l_quantity, l_extendedprice])[1]), 4) AS avg_first,
           CAST(max(len([l_quantity, l_extendedprice])) AS INT) AS arr_len
    FROM lineitem
    GROUP BY l_linenumber
    """,
)
def semi_structured_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array constructor + element access + length (1-indexed in both
    engines)."""
    li = _t(spark, sf_dir, "lineitem")
    arr = F.array("l_quantity", "l_extendedprice")
    return li.groupBy("l_linenumber").agg(
        F.round(F.sum(F.element_at(arr, 2)), 2).alias("sum_second"),
        F.round(F.avg(F.element_at(arr, 1)), 4).alias("avg_first"),
        F.max(F.size(arr)).cast("int").alias("arr_len"),
    )


@register(
    "hof_array_ops",
    """
    SELECT l_orderkey,
           round(list_aggregate(list_sort(list(l_quantity)), 'sum'), 2) AS qty_sum,
           round(list_max(list(l_quantity)), 2) AS qty_max,
           CAST(len(list(l_quantity)) AS INT) AS n_items
    FROM lineitem
    GROUP BY l_orderkey
    """,
)
def hof_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order functions over collected arrays: aggregate (fold),
    array_max, size — all JVM lambda expressions, no UDF. collect_list
    is per-group bounded (order lines per order), never a global
    collect."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list("l_quantity")).alias("qs"))
        .select(
            "l_orderkey",
            F.round(
                F.aggregate("qs", F.lit(0.0), lambda acc, x: acc + x), 2
            ).alias("qty_sum"),
            F.round(F.array_max("qs"), 2).alias("qty_max"),
            F.size("qs").alias("n_items"),
        )
    )


@register(
    "unpivot_metrics",
    """
    WITH agg AS (SELECT l_returnflag,
                        round(sum(l_quantity), 2)      AS qty,
                        round(sum(l_extendedprice), 2) AS price
                 FROM lineitem GROUP BY 1)
    SELECT l_returnflag, metric, value
    FROM agg UNPIVOT (value FOR metric IN (qty, price))
    """,
)
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long unpivot (melt) of per-flag aggregates."""
    li = _t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("price"),
    )
    return agg.unpivot(
        ids=["l_returnflag"],
        values=["qty", "price"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@register(
    "map_roundtrip",
    """
    SELECT event_type, count(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def map_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map type coverage: build map<event_type, n> per user-bucket with
    map_from_entries, then explode it back and re-aggregate — the
    roundtrip must equal the plain GROUP BY (the oracle). Exercises map
    construction, explode over maps, and map_keys/values pruning."""
    e = _t(spark, sf_dir, "events")
    per_bucket = (
        e.groupBy((F.col("user_id") % 50).alias("bucket"), "event_type")
        .agg(F.count("*").alias("cnt"))
        .groupBy("bucket")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("event_type", "cnt"))
            ).alias("m")
        )
    )
    return (
        per_bucket.select(F.explode("m").alias("event_type", "cnt"))
        .groupBy("event_type")
        .agg(F.sum("cnt").alias("n"))
    )


_SUBQUERY_SQL = """
    SELECT c_custkey, round(c_acctbal, 2) AS acctbal
    FROM customer c
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
      AND EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
"""


@register("sql_subqueries", _SUBQUERY_SQL)
def sql_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery + correlated EXISTS through the SQL interface —
    the identical SQL text runs on both engines (Catalyst rewrites the
    scalar subquery to a broadcast value and EXISTS to a left-semi join)."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_SUBQUERY_SQL)


@register(
    "set_union_by_name",
    """
    SELECT o_orderkey, count(*) AS n, round(sum(val), 2) AS total FROM (
      SELECT o_orderkey, o_totalprice AS val FROM orders WHERE o_orderstatus = 'F'
      UNION ALL
      SELECT o_orderkey, o_totalprice * 2.0 AS val FROM orders WHERE o_orderstatus = 'O'
    )
    GROUP BY o_orderkey
    """,
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName: columns aligned by NAME, not position (the two inputs
    deliberately have different column orders)."""
    o = _t(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "F").select(
        "o_orderkey", F.col("o_totalprice").alias("val")
    )
    # *2.0, not *0.5: halving 2-decimal prices creates exact half-cent
    # values where Spark (HALF_UP on decimal repr) and DuckDB (C rounding
    # on the raw double) round differently.
    b = o.where(F.col("o_orderstatus") == "O").select(
        (F.col("o_totalprice") * 2.0).alias("val"), "o_orderkey"
    )
    return (
        a.unionByName(b)
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n"), F.round(F.sum("val"), 2).alias("total"))
    )


@register(
    "set_intersect_all",
    """
    SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
    INTERSECT ALL
    SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset intersection (preserves duplicate cardinalities)."""
    li = _t(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_returnflag") == "A").select("l_partkey")
    r = li.where(F.col("l_returnflag") == "R").select("l_partkey")
    return a.intersectAll(r)


@register(
    "set_except_all",
    """
    SELECT l_suppkey FROM lineitem WHERE l_linestatus = 'F'
    EXCEPT ALL
    SELECT l_suppkey FROM lineitem WHERE l_linestatus = 'O'
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_linestatus") == "F").select("l_suppkey")
    b = li.where(F.col("l_linestatus") == "O").select("l_suppkey")
    return a.exceptAll(b)


@register(
    "asof_join_events",
    """
    WITH clicks AS (SELECT event_id, user_id, ts FROM events
                    WHERE event_type = 'click'),
         purchases AS (SELECT user_id, ts, round(max(value), 2) AS p_value
                       FROM events WHERE event_type = 'purchase'
                       GROUP BY user_id, ts)
    SELECT c.event_id, c.user_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS ts,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS p_ts,
           p.p_value
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/asof.py): each click enriched with the
    user's most recent at-or-before purchase. One shuffle on user_id via
    union+window — compare DuckDB's native ASOF JOIN as the oracle.
    Purchases are pre-aggregated per (user, ts) so exact-tie picks are
    deterministic in both engines."""
    from ..operators.asof import asof_join

    e = _t(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), 2).alias("p_value"))
    )
    j = asof_join(clicks, purchases, on="ts", by="user_id", value_cols=["p_value"])
    return j.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.date_format("ts_right", "yyyy-MM-dd HH:mm:ss").alias("p_ts"),
        F.col("p_value_right").alias("p_value"),
    )


@register(
    "salted_agg_events",
    """
    SELECT event_type, round(sum(value), 2) AS sum_value,
           count(value) AS count_value
    FROM events
    GROUP BY event_type
    """,
)
def salted_agg_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a LOW-cardinality (hence skewed
    at scale) key — 5 event types means 5 reducers own everything in a
    plain groupBy; salting spreads each over 16 partials first. The
    oracle is the plain GROUP BY: salting must be invisible in results."""
    from ..operators.scale import salted_agg

    e = _t(spark, sf_dir, "events")
    out = salted_agg(
        e, "event_type", [("value", "sum"), ("value", "count")], n_salts=16
    )
    return out.select(
        "event_type",
        F.round("sum_value", 2).alias("sum_value"),
        "count_value",
    )


@register(
    "time_bucket_rollup",
    """
    SELECT strftime(time_bucket(INTERVAL 15 MINUTE, ts), '%Y-%m-%d %H:%M:%S')
             AS bucket,
           event_type, count(*) AS n, round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def time_bucket_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style time-bucket rollup: 15-minute buckets x type.
    Spark's window() generator is the streaming-compatible twin; in batch
    it's a pure projection (no shuffle beyond the aggregate), and the
    bucket column is a partition-friendly sink key."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "15 minutes").start.alias("bucket_ts"), "event_type"
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format("bucket_ts", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            "event_type",
            "n",
            "sum_value",
        )
    )


_TS_PATTERN = [0.5, 1.0, -0.3, 0.7, 0.1, -1.2, 0.9, 0.2]


def _znorm_sql_literal() -> str:
    from ..operators.timeseries import znormalize

    return "[" + ", ".join(repr(v) for v in znormalize(_TS_PATTERN)) + "]"


@register(
    "ts_similarity_topk",
    f"""
    WITH series AS (
      SELECT user_id,
             list_reverse(list(value ORDER BY ts DESC, event_id DESC)[1:8]) AS s
      FROM events WHERE event_type = 'view'
      GROUP BY user_id HAVING count(*) >= 8
    ), stats AS (
      SELECT user_id, s,
             list_aggregate(s, 'avg') AS mu,
             sqrt(greatest(list_aggregate(list_transform(s, x -> x*x), 'avg')
                           - list_aggregate(s, 'avg') ** 2, 1e-12)) AS sd
      FROM series
    )
    SELECT user_id,
           round(sqrt(list_aggregate(
             list_transform(list_zip(s, {_znorm_sql_literal()}),
               p -> ((p[1] - mu) / sd - p[2]) ** 2), 'sum')), 6) AS dist
    FROM stats
    ORDER BY dist, user_id
    LIMIT 10
    """,
)
def ts_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity search (PAPERS.md EDBT 2019 motif): users
    whose last-8 'view' values best match a query pattern under
    z-normalized euclidean distance — entirely JVM array expressions
    (operators/timeseries.py), one shuffle, TakeOrdered top-k. Both
    engines consume literals generated from the same Python list."""
    from ..operators.timeseries import znorm_series_topk

    e = _t(spark, sf_dir, "events").where(F.col("event_type") == "view")
    return znorm_series_topk(e, _TS_PATTERN, k=10)


@register(
    "agg_pivot",
    """
    SELECT user_id % 10 AS user_bucket,
           count(*) FILTER (WHERE event_type = 'click')    AS click,
           count(*) FILTER (WHERE event_type = 'error')    AS error,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup')   AS signup,
           count(*) FILTER (WHERE event_type = 'view')     AS view
    FROM events
    GROUP BY 1
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy((F.col("user_id") % 10).alias("user_bucket"))
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
        .na.fill(0)
    )


@register(
    "global_rank_sampled",
    """
    SELECT rank, l_orderkey, l_linenumber,
           strftime(l_shipdate, '%Y-%m-%d') AS shipdate
    FROM (SELECT l_orderkey, l_linenumber, l_shipdate,
                 row_number() OVER (ORDER BY l_shipdate, l_orderkey,
                                             l_linenumber) AS rank
          FROM lineitem)
    WHERE rank % 1000 = 0
    """,
)
def global_rank_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed global row_number (operators/scale.py:global_rank):
    range-partition on the order key, rank locally, offset by cumulative
    partition counts — exact total rank with NO single-partition window
    (the oracle's OVER (ORDER BY ...) collapses to one task; this doesn't).
    Every 1000th rank is kept to bound the comparison set while forcing
    the full ranking to be computed."""
    from ..operators.scale import global_rank

    li = _t(spark, sf_dir, "lineitem")
    ranked = global_rank(
        li.select("l_orderkey", "l_linenumber", "l_shipdate"),
        ["l_shipdate", "l_orderkey", "l_linenumber"],
    )
    return ranked.where(F.col("rank") % 1000 == 0).select(
        "rank",
        "l_orderkey",
        "l_linenumber",
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("shipdate"),
    )


# --------------------------------------------------------------------------
# VARIANT semi-structured path (Spark 4 open-variant type)
# --------------------------------------------------------------------------

@register(
    "json_variant_typed",
    """
    WITH v AS (
      SELECT event_type,
             CAST(json_extract_string(
               json_object('t', event_type, 'm',
                           json_object('u', user_id, 'val', value),
                           'raw', json(props)),
               '$.t') AS VARCHAR) AS t,
             CAST(json_extract(
               json_object('t', event_type, 'm',
                           json_object('u', user_id, 'val', value),
                           'raw', json(props)),
               '$.m.val') AS DOUBLE) AS val,
             CAST(json_extract(
               json_object('t', event_type, 'm',
                           json_object('u', user_id, 'val', value),
                           'raw', json(props)),
               '$.raw.k') AS INT) AS k
      FROM events
    )
    SELECT t AS event_type, count(*) AS n,
           round(sum(val), 2) AS sum_val,
           max(k) AS max_k,
           CAST(count(CASE WHEN k >= 50 THEN 1 END) AS BIGINT) AS n_high_k
    FROM v GROUP BY 1 ORDER BY 1
    """,
)
def json_variant_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT ingestion path: nested JSON is parsed ONCE into
    the open variant encoding (`parse_json`), then typed paths are
    extracted with `variant_get` — the schema-on-read shape for
    semi-structured lakes where `from_json` would need a declared schema
    and `get_json_object` re-parses the string per extraction. The
    nested document (a string JSON field inside a composed object)
    round-trips through the variant binary form; extraction, filtering,
    and aggregation all run on variant-decoded typed columns.

    Plan: the parse and all three `variant_get`s sit in the scan's
    project (one parse feeding multiple extractions — the variant win),
    followed by a 5-key hash aggregate with map-side partials; zero
    Python, zero shuffles beyond the final groupBy. The oracle builds
    the same nested document with DuckDB's JSON functions and extracts
    the same typed paths."""
    ev = _t(spark, sf_dir, "events")
    doc = F.to_json(
        F.struct(
            F.col("event_type").alias("t"),
            F.struct(
                F.col("user_id").alias("u"), F.col("value").alias("val")
            ).alias("m"),
            F.from_json("props", "k INT").alias("raw"),
        )
    )
    # The variant binary materializes as its OWN attribute before the
    # extractions: referencing the parse_json Column object three times
    # in one projection would embed three copies of the whole
    # parse_json(to_json(struct(from_json(props)))) chain — CodegenFallback
    # expressions are never deduplicated by codegen subexpression
    # elimination, so each record would be parsed three times.
    # CollapseProject keeps the boundary (non-cheap alias, multiply
    # referenced), so the plan holds exactly ONE parse per record — the
    # variant win the docstring advertises.
    parsed = ev.select(F.parse_json(doc).alias("__variant"))
    v = F.col("__variant")
    ex = parsed.select(
        F.variant_get(v, "$.t", "string").alias("t"),
        F.variant_get(v, "$.m.val", "double").alias("val"),
        F.variant_get(v, "$.raw.k", "int").alias("k"),
    )
    return (
        ex.groupBy(F.col("t").alias("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("val"), 2).alias("sum_val"),
            F.max("k").alias("max_k"),
            F.sum(F.when(F.col("k") >= 50, 1).otherwise(0))
            .cast("long")
            .alias("n_high_k"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# portable mode / argmax-per-group
# --------------------------------------------------------------------------

@register(
    "agg_mode_argmax",
    """
    WITH c AS (
      SELECT o_orderstatus, o_orderpriority, count(*) AS n
      FROM orders GROUP BY 1, 2
    ), r AS (
      SELECT *, row_number() OVER (PARTITION BY o_orderstatus
                                   ORDER BY n DESC, o_orderpriority) AS rn
      FROM c
    )
    SELECT o_orderstatus, o_orderpriority AS mode_priority, n AS n_orders
    FROM r WHERE rn = 1 ORDER BY o_orderstatus
    """,
)
def agg_mode_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical mode per group (most frequent o_orderpriority per
    order status) via the portable argmax idiom: count-then-rank with an
    EXPLICIT tie-break (highest count, then smallest value) — the
    engines' native mode()/F.mode builtins break ties
    engine-idiosyncratically, so the gate pins the decomposed form a
    100 TB pipeline should use anyway.

    Plan: one hash aggregate on (group, value) with map-side partials —
    cardinality collapses to |groups| x |distinct values| BEFORE the
    rank; the row_number window then runs on aggregated rows only. The
    same two-step is the generic argmax-per-key template (top category,
    most-common error, dominant language per source)."""
    o = _t(spark, sf_dir, "orders")
    c = o.groupBy("o_orderstatus", "o_orderpriority").agg(F.count("*").alias("n"))
    from pyspark.sql import Window as W

    w = W.partitionBy("o_orderstatus").orderBy(
        F.col("n").desc(), F.col("o_orderpriority")
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("n").alias("n_orders"),
        )
        .orderBy("o_orderstatus")
    )


# --------------------------------------------------------------------------
# Spark 4 SQL surface: recursive CTE + LATERAL correlated subquery
# --------------------------------------------------------------------------

@register(
    "sql_recursive_spine",
    """
    WITH RECURSIVE months(m, hi) AS (
      SELECT date_trunc('month', min(o_orderdate)),
             date_trunc('month', max(o_orderdate))
      FROM orders
      UNION ALL
      SELECT m + INTERVAL 1 MONTH, hi FROM months WHERE m < hi
    ), agg AS (
      SELECT date_trunc('month', o_orderdate) AS m, count(*) AS n,
             round(sum(o_totalprice), 2) AS total
      FROM orders GROUP BY 1
    )
    SELECT strftime(months.m, '%Y-%m') AS month,
           COALESCE(n, 0) AS n_orders,
           COALESCE(total, 0.0) AS total_price
    FROM months LEFT JOIN agg ON months.m = agg.m
    ORDER BY month
    """,
)
def sql_recursive_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 recursive CTE (WITH RECURSIVE, SPARK-24497): generate the
    complete monthly calendar spine between the first and last order date
    by recursion — the warehouse-canonical recursive use (spines,
    hierarchies, closures) — and left-join monthly order rollups so
    zero-order months surface as explicit rows. Pure SQL on BOTH engines:
    the same statement text runs on Spark and DuckDB.

    Scale: recursion depth = number of months (bounded, ~7 years of
    TPC-H dates ~= 85 iterations, under the default 100-level limit);
    each step is a 1-row increment, the heavy side stays in the ONE hash
    aggregate over orders. The engine keeps `sequence()+explode` spines
    (gapfill/resample) for the hot path; this pins that the declarative
    recursive form works for consumers who write it."""
    for t in ("orders",):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        WITH RECURSIVE months(m, hi) AS (
          SELECT date_trunc('month', min(o_orderdate)),
                 date_trunc('month', max(o_orderdate))
          FROM orders
          UNION ALL
          SELECT m + INTERVAL 1 MONTH, hi FROM months WHERE m < hi
        ), agg AS (
          SELECT date_trunc('month', o_orderdate) AS m, count(*) AS n,
                 round(sum(o_totalprice), 2) AS total
          FROM orders GROUP BY 1
        )
        SELECT date_format(months.m, 'yyyy-MM') AS month,
               COALESCE(n, 0L) AS n_orders,
               COALESCE(total, 0.0D) AS total_price
        FROM months LEFT JOIN agg ON months.m = agg.m
        ORDER BY month
        """
    )


@register(
    "sql_lateral_topk",
    """
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_top_orders,
           round(sum(t.o_totalprice), 2) AS top_order_revenue
    FROM customer c,
         LATERAL (SELECT o_totalprice FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: each customer's top-2 orders by value
    (deterministic o_orderkey tie-break), rolled up per market segment —
    the SQL-standard spelling of top-k-per-key that analysts port from
    warehouses, same statement text on both engines.

    Catalyst decorrelates the LATERAL LIMIT into a partitioned window
    rank (DomainJoin rewrite) — one shuffle on the correlation key, NOT a
    per-customer re-execution; the plan-invariant suite holds it to the
    same no-cartesian bar as every other query. The engine's native
    idiom for this shape stays `window_topk_per_group`; this pins the
    SQL front door."""
    for t in ("customer", "orders"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT c_mktsegment,
               count(*) AS n_top_orders,
               round(sum(t.o_totalprice), 2) AS top_order_revenue
        FROM customer c,
             LATERAL (SELECT o_totalprice FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        GROUP BY c_mktsegment ORDER BY c_mktsegment
        """
    )


# --------------------------------------------------------------------------
# null-safe equality join
# --------------------------------------------------------------------------

@register(
    "join_null_safe",
    """
    WITH e AS (
      SELECT event_id,
             CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) % 10 = 0
                  THEN NULL
                  ELSE CAST(json_extract_string(props, '$.k') AS INT) % 10 END
               AS bucket
      FROM events
    ), d AS (
      SELECT * FROM (VALUES (1, 'one'), (3, 'three'), (NULL, 'missing'))
               AS t(bucket, label)
    )
    SELECT COALESCE(CAST(e.bucket AS VARCHAR), 'NULL') AS bucket,
           d.label, count(*) AS n
    FROM e JOIN d ON e.bucket IS NOT DISTINCT FROM d.bucket
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    MATCH each other instead of dropping — the semantics dimension-join
    pipelines need when "unknown" is itself a dimension member (here:
    events whose extracted bucket is nulled join the explicit 'missing'
    dimension row). A plain equi-join silently loses every NULL-keyed
    row; this query pins the variant that keeps them.

    Plan: the null-safe predicate still hashes (Spark treats <=> as an
    equi-join key with null buckets), so this is a broadcast/hash join,
    not a nested loop — the plan-invariant sweep holds it to the same
    no-BNLJ bar as every equi-join."""
    e = _t(spark, sf_dir, "events").select(
        "event_id",
        F.when(
            F.get_json_object("props", "$.k").cast("int") % 10 == 0, F.lit(None)
        )
        .otherwise(F.get_json_object("props", "$.k").cast("int") % 10)
        .alias("bucket"),
    )
    d = spark.createDataFrame(
        [(1, "one"), (3, "three"), (None, "missing")], "bucket int, label string"
    )
    return (
        e.join(d, e["bucket"].eqNullSafe(d["bucket"]))
        .groupBy(
            F.coalesce(e["bucket"].cast("string"), F.lit("NULL")).alias("bucket"),
            "label",
        )
        .agg(F.count("*").alias("n"))
        .orderBy("bucket", "label")
    )


# --------------------------------------------------------------------------
# salted skew join (driver-gated equivalence)
# --------------------------------------------------------------------------

@register(
    "salted_join_events",
    """
    WITH hot AS (
      SELECT event_id, user_id % 3 AS hot_key, value FROM events
    ), d AS (
      SELECT * FROM (VALUES (0, 'alpha'), (1, 'beta'), (2, 'gamma'))
               AS t(hot_key, segment)
    )
    SELECT segment, count(*) AS n, round(sum(value), 2) AS total
    FROM hot JOIN d USING (hot_key)
    GROUP BY segment ORDER BY segment
    """,
)
def salted_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated join through operators/scale.salted_join: the left
    side is deliberately collapsed onto 3 hot keys (every row hits one of
    3 reducers in a plain shuffle join), the right side is replicated
    16x with salt values, and the join keys on (key, salt) — each hot key
    spreads over 16 reducers. The oracle is the PLAIN join: salting must
    be a pure physical rewrite, invisible in the result (the same
    equivalence the pytest property pins; this entry keeps it in the
    driver's cross-engine gate)."""
    from ..operators.scale import salted_join

    hot = _t(spark, sf_dir, "events").select(
        "event_id", (F.col("user_id") % 3).alias("hot_key"), "value"
    )
    d = spark.createDataFrame(
        [(0, "alpha"), (1, "beta"), (2, "gamma")], "hot_key int, segment string"
    )
    joined = salted_join(hot, d, "hot_key", n_salts=16)
    return (
        joined.groupBy("segment")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .orderBy("segment")
    )


@register(
    "agg_unpivot",
    """
    WITH base AS (SELECT * FROM lineitem WHERE l_orderkey < 64)
    SELECT l_orderkey, l_linenumber, metric, round(val, 2) AS val
    FROM (
      SELECT l_orderkey, l_linenumber, 'quantity' AS metric,
             CAST(l_quantity AS DOUBLE) AS val FROM base
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'extendedprice',
             l_extendedprice FROM base
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM base
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM base
    )
    ORDER BY l_orderkey, l_linenumber, metric
    """,
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt — the inverse of agg_pivot: four numeric lineitem
    measures widen into (metric, val) rows via the native
    ``DataFrame.unpivot`` (Spark's UNPIVOT clause), the standard
    wide-to-long reshape before a per-metric groupBy or a metrics-table
    write. Narrow op: one scan, no shuffle — each input row emits its 4
    melted rows map-side (the oracle mirrors with UNION ALL). The
    l_orderkey < 64 cut keeps the driver-compare bounded; production
    melts the full table and aggregates downstream."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") < 64)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").cast("double").alias("quantity"),
            F.col("l_extendedprice").alias("extendedprice"),
            F.col("l_discount").alias("discount"),
            F.col("l_tax").alias("tax"),
        )
    )
    return (
        li.unpivot(
            ["l_orderkey", "l_linenumber"],
            ["quantity", "extendedprice", "discount", "tax"],
            "metric",
            "val",
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "metric",
            F.round("val", 2).alias("val"),
        )
        .orderBy("l_orderkey", "l_linenumber", "metric")
    )


@register(
    "asof_join_nearest",
    """
    WITH clicks AS (SELECT event_id, user_id, ts FROM events
                    WHERE event_type = 'click'),
         purchases AS (SELECT user_id, ts, round(max(value), 2) AS p_value
                       FROM events WHERE event_type = 'purchase'
                       GROUP BY user_id, ts),
         cand AS (
           SELECT c.event_id, c.user_id, c.ts, p.ts AS p_ts, p.p_value,
                  abs(epoch_ms(c.ts) - epoch_ms(p.ts)) AS dist,
                  row_number() OVER (
                    PARTITION BY c.event_id
                    ORDER BY abs(epoch_ms(c.ts) - epoch_ms(p.ts)), p.ts
                  ) AS rn
           FROM clicks c JOIN purchases p USING (user_id)
           WHERE abs(epoch_ms(c.ts) - epoch_ms(p.ts)) <= 7200000
         )
    SELECT c.event_id, c.user_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS ts,
           strftime(m.p_ts, '%Y-%m-%d %H:%M:%S') AS p_ts,
           m.p_value
    FROM clicks c LEFT JOIN (SELECT * FROM cand WHERE rn = 1) m
      USING (event_id, user_id)
    """,
)
def asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join with tolerance (operators/asof.py
    direction="nearest"): each click enriched with the user's CLOSEST
    purchase within 2 hours, either side; equal distances resolve to the
    backward match (mirrored in the oracle's ORDER BY dist, p.ts — the
    earlier candidate). Same single union+window shuffle as backward:
    nearest evaluates the backward last() and forward first() fills over
    ONE sorted exchange and picks per row; the oracle brute-forces
    candidates per click and keeps rank 1."""
    from ..operators.asof import asof_join

    e = _t(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), 2).alias("p_value"))
    )
    j = asof_join(
        clicks,
        purchases,
        on="ts",
        by="user_id",
        value_cols=["p_value"],
        tolerance_seconds=7200,
        direction="nearest",
    )
    return j.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.date_format("ts_right", "yyyy-MM-dd HH:mm:ss").alias("p_ts"),
        F.col("p_value_right").alias("p_value"),
    )


@register(
    "asof_join_forward",
    """
    WITH clicks AS (SELECT event_id, user_id, ts FROM events
                    WHERE event_type = 'click'),
         purchases AS (SELECT user_id, ts, round(max(value), 2) AS p_value
                       FROM events WHERE event_type = 'purchase'
                       GROUP BY user_id, ts)
    SELECT c.event_id, c.user_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS ts,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS p_ts,
           p.p_value
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts <= p.ts
    """,
)
def asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-direction as-of join (operators/asof.py
    direction="forward"): each click enriched with the user's NEXT
    at-or-after purchase — the "next scheduled event after each
    observation" enrichment. Exercises the round-9 exact-timestamp tie
    fix: a purchase at exactly click.ts must match (>= semantics, pandas
    merge_asof parity), which requires left rows to sort before equal-ts
    right rows inside the single union+window shuffle. Oracle is DuckDB's
    native forward ASOF (``c.ts <= p.ts``), which shares the >= tie
    contract. Purchases are pre-aggregated per (user, ts) so exact-tie
    picks are deterministic in both engines."""
    from ..operators.asof import asof_join

    e = _t(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), 2).alias("p_value"))
    )
    j = asof_join(
        clicks,
        purchases,
        on="ts",
        by="user_id",
        value_cols=["p_value"],
        direction="forward",
    )
    return j.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.date_format("ts_right", "yyyy-MM-dd HH:mm:ss").alias("p_ts"),
        F.col("p_value_right").alias("p_value"),
    )


@register(
    "sql_pipe_syntax",
    """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    WHERE o_orderstatus = 'F' AND year(o_orderdate) = 1999
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL PIPE syntax (`|>`, SPARK-49555): the same filtered
    rollup written as a left-to-right operator chain — FROM |> WHERE |>
    AGGREGATE ... GROUP BY |> ORDER BY — the readability front door for
    multi-stage SQL. Parsed by Spark's own parser into the identical
    logical plan the classic statement produces (the oracle IS that
    classic statement), so the feature costs nothing at any scale:
    pushdown/pruning/codegen all apply unchanged."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        FROM orders
        |> WHERE o_orderstatus = 'F' AND year(o_orderdate) = 1999
        |> AGGREGATE CAST(count(*) AS BIGINT) AS n_orders,
                     round(sum(o_totalprice), 2) AS revenue
           GROUP BY o_orderpriority
        |> ORDER BY o_orderpriority
        |> SELECT o_orderpriority, n_orders, revenue
        """
    )


# --------------------------------------------------------------------------
# round 9 (late window): Spark 4 SQL-surface additions
# --------------------------------------------------------------------------

@register(
    "agg_listagg",
    """
    SELECT r.r_name,
           CAST(count(*) AS BIGINT) AS n_nations,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY r.r_name
    """,
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation — Spark 4.0's ANSI ``listagg(...)
    WITHIN GROUP (ORDER BY ...)`` (SQL:2016 T625), the report-formatting
    aggregate users previously hand-rolled as
    ``array_join(array_sort(collect_list(...)))``. DuckDB twin:
    ``string_agg(expr, sep ORDER BY expr)``. Per-group member lists are
    dimension-bounded (nations per region); at scale the deterministic
    ORDER BY inside the aggregate is what keeps shards mergeable without
    a global sort."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        n.join(r, n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name")
        .agg(
            F.count("*").cast("long").alias("n_nations"),
            F.expr(
                "listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)"
            ).alias("nations"),
        )
        .orderBy("r_name")
    )


@register(
    "scalar_try_arithmetic",
    """
    WITH t AS (
      SELECT l_orderkey, l_extendedprice,
             CAST(l_quantity AS INT) % 3 AS d,
             CASE WHEN l_orderkey % 2 = 1 THEN NULL
                  ELSE 9223372036854775807 END AS big_add,
             (CASE WHEN CAST(l_quantity AS INT) % 3 = 0 THEN NULL
                   ELSE l_extendedprice / (CAST(l_quantity AS INT) % 3)
              END) AS safe_div
      FROM lineitem
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) FILTER (safe_div IS NULL) AS BIGINT)
             AS div_by_zero_rows,
           round(CAST(CAST(sum(safe_div) AS REAL) AS DOUBLE)
                 + 0.00000001, 2) AS sum_safe_div,
           CAST(count(*) FILTER (big_add IS NULL) AS BIGINT)
             AS overflow_rows
    FROM t
    """,
)
def scalar_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic surface — ``try_divide`` (NULL on division
    by zero) and ``try_add`` (NULL on bigint overflow) — the ANSI-mode
    story at scale: under ``spark.sql.ansi.enabled`` a single bad row
    would fail a 100 TB job, and the ``try_`` family is the documented
    per-expression opt-out (errors become NULLs you can count, quarantine
    and audit — the same philosophy as the P2 dead-letter split). The
    oracle states the equivalent CASE semantics explicitly."""
    li = _t(spark, sf_dir, "lineitem")
    t = li.select(
        F.expr("try_divide(l_extendedprice, CAST(l_quantity AS INT) % 3)")
        .alias("safe_div"),
        F.expr(
            "try_add(CASE WHEN l_orderkey % 2 = 1 "
            "THEN 9223372036854775807 ELSE 9223372036854775806 END, 1)"
        ).alias("big_add"),
    )
    return t.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.count(F.when(F.col("safe_div").isNull(), 1))
        .cast("long")
        .alias("div_by_zero_rows"),
        # float32-squash (repo drift-sum convention): Spark's exact
        # DECIMAL sum vs DuckDB's order-dependent double accumulation can
        # straddle a 2dp rounding boundary at large SFs; squashing both
        # to REAL first widens the agreement margin ~1000x.
        F.round(
            F.sum("safe_div").cast("float").cast("double") + 0.00000001, 2
        ).alias("sum_safe_div"),
        F.count(F.when(F.col("big_add").isNull(), 1))
        .cast("long")
        .alias("overflow_rows"),
    )
