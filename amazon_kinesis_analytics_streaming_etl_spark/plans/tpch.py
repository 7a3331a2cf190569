"""TPC-H-shaped analytics suite (q2-q22 adapted to the TESTDATA schema).

The driver's tables are TPC-H-ish but slimmer: no partsupp table, no
l_commitdate / l_receiptdate / l_shipmode, no p_container / p_mfgr, no
c_phone / comments. Each query keeps the REFERENCE SHAPE of its TPC-H
namesake (the join topology, subquery pattern, and aggregation style)
with predicates adapted to the columns that exist; partsupp-dependent
queries derive the part-supplier relation from ``DISTINCT (l_partkey,
l_suppkey)``.

Every query ships with a DuckDB oracle (same rounding/aliasing on both
sides — see plans/relational.py conventions). Scale notes per query
assume the 100 TB layout: lineitem/orders are the big fact tables
(shuffle on join keys, AQE handles skew), everything else broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .relational import _t, register


def _ts(s: str):
    return F.lit(s).cast("timestamp")


# --------------------------------------------------------------------------
# Q2 shape: min-cost supplier per part (partsupp derived from lineitem)
# --------------------------------------------------------------------------

@register(
    "q2_min_cost_supplier",
    """
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
         c AS (SELECT p_partkey, s_suppkey, s_name, s_acctbal, n_name
               FROM part JOIN ps ON p_partkey = l_partkey
                         JOIN supplier ON l_suppkey = s_suppkey
                         JOIN nation ON s_nationkey = n_nationkey
               WHERE p_size = 15 AND p_type = 'SMALL')
    SELECT p_partkey, s_suppkey, s_name, n_name, round(s_acctbal, 2) AS acctbal
    FROM c
    WHERE s_acctbal = (SELECT min(s_acctbal) FROM c c2
                       WHERE c2.p_partkey = c.p_partkey)
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-group argmin via window (one shuffle on
    p_partkey). part/supplier/nation broadcast; the derived part-supplier
    relation is a distinct over two lineitem columns (map-side partial
    distinct, column-pruned scan)."""
    ps = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "SMALL")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    cand = (
        ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .join(F.broadcast(s), ps.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("min_bal", F.min("s_acctbal").over(w))
        .where(F.col("s_acctbal") == F.col("min_bal"))
        .select(
            "p_partkey",
            "s_suppkey",
            "s_name",
            "n_name",
            F.round("s_acctbal", 2).alias("acctbal"),
        )
    )


# --------------------------------------------------------------------------
# Q4: order priority checking (EXISTS with a late-shipment predicate)
# --------------------------------------------------------------------------

@register(
    "q4_order_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: left-semi join replaces the correlated EXISTS (no
    row multiplication, no distinct needed). The quarter filter pushes
    into the orders scan before the shuffle."""
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-07-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1996-10-01 00:00:00"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# --------------------------------------------------------------------------
# Q6: forecast revenue change (pure scan+filter+agg)
# --------------------------------------------------------------------------

@register(
    "q6_forecast_revenue",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: every predicate pushes to the parquet scan (range on
    shipdate/discount/quantity); single partial+final agg, no join. The
    canonical 'is pushdown working' probe."""
    li = _t(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue")
    )


# --------------------------------------------------------------------------
# Q7: volume shipping between two nations
# --------------------------------------------------------------------------

@register(
    "q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(year(l_shipdate) AS INT) AS l_year,
                 l_extendedprice * (1 - l_discount) AS volume
          FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
               JOIN orders   ON o_orderkey = l_orderkey
               JOIN customer ON c_custkey = o_custkey
               JOIN nation n1 ON s_nationkey = n1.n_nationkey
               JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
              OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                               AND TIMESTAMP '1997-12-31 00:00:00')
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: lineitem-orders is the only big shuffle; supplier,
    customer and both nation aliases broadcast. The nation-pair
    disjunction is applied after the broadcasts (cheap, no shuffle)."""
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between(_ts("1996-01-01 00:00:00"), _ts("1997-12-31 00:00:00"))
    )
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        j.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 2).alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q8: national market share
# --------------------------------------------------------------------------

@register(
    "q8_market_share",
    """
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_1' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share
    FROM (SELECT CAST(year(o_orderdate) AS INT) AS o_year,
                 l_extendedprice * (1 - l_discount) AS volume,
                 n2.n_name AS nation
          FROM part JOIN lineitem ON p_partkey = l_partkey
               JOIN supplier ON s_suppkey = l_suppkey
               JOIN orders   ON l_orderkey = o_orderkey
               JOIN customer ON o_custkey = c_custkey
               JOIN nation n1 ON c_nationkey = n1.n_nationkey
               JOIN region    ON n1.n_regionkey = r_regionkey
               JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
            AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                                AND TIMESTAMP '1997-12-31 00:00:00')
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: conditional aggregation for the share ratio. The
    selective part filter broadcasts and prunes lineitem early; the
    customer-side region filter broadcasts through nation."""
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate").between(_ts("1996-01-01 00:00:00"), _ts("1997-12-31 00:00:00"))
    )
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    j = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        j.select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol.alias("volume"),
            "nation",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_1", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
    )


# --------------------------------------------------------------------------
# Q9: product-type profit (supplycost proxied by p_retailprice)
# --------------------------------------------------------------------------

@register(
    "q9_product_profit",
    """
    SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
    FROM (SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
                 l_extendedprice * (1 - l_discount)
                   - 0.1 * p_retailprice * l_quantity AS amount
          FROM part JOIN lineitem ON p_partkey = l_partkey
               JOIN supplier ON s_suppkey = l_suppkey
               JOIN orders   ON o_orderkey = l_orderkey
               JOIN nation   ON s_nationkey = n_nationkey
          WHERE p_name LIKE '%red%')
    GROUP BY nation, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (ps_supplycost proxied as 10% of p_retailprice —
    partsupp does not exist here). LIKE-filtered part broadcasts;
    lineitem-orders shuffles on orderkey."""
    p = _t(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).alias("sum_profit"))
    )


# --------------------------------------------------------------------------
# Q10: returned-item reporting
# --------------------------------------------------------------------------

@register(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           round(c_acctbal, 2) AS acctbal, n_name
    FROM customer JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: quarter + returnflag filters push into the scans; the
    top-20 is TakeOrdered after the aggregate (no global sort)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-10-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-01-01 00:00:00"))
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q11 shape: important stock (share-of-total filter via scalar subquery)
# --------------------------------------------------------------------------

@register(
    "q11_important_stock",
    """
    WITH v AS (SELECT n_name, sum(l_extendedprice * l_quantity) AS val
               FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                    JOIN nation ON s_nationkey = n_nationkey
               GROUP BY n_name)
    SELECT n_name, round(val, 2) AS val
    FROM v
    WHERE val > (SELECT sum(val) * 0.04 FROM v)
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (partsupp value proxied by lineitem volume):
    grouped total filtered against a fraction of the grand total. The
    grand total is a scalar broadcast, not a driver collect."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    v = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("val"))
    )
    total = v.agg((F.sum("val") * 0.04).alias("threshold"))
    return (
        v.crossJoin(F.broadcast(total))
        .where(F.col("val") > F.col("threshold"))
        .select("n_name", F.round("val", 2).alias("val"))
    )


# --------------------------------------------------------------------------
# Q12 shape: shipping delay vs priority (shipmode proxied by linestatus)
# --------------------------------------------------------------------------

@register(
    "q12_priority_class",
    """
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= o_orderdate
      AND l_shipdate <  o_orderdate + INTERVAL 30 DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
)
def q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (l_shipmode proxied by l_linestatus; the
    commit/receipt window proxied by ship-within-30-days-of-order).
    Conditional counts via sum(when)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(
            (F.col("l_shipdate") >= F.col("o_orderdate"))
            & (F.col("l_shipdate") < F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# Q13: customer order-count distribution
# --------------------------------------------------------------------------

@register(
    "q13_customer_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey)
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: two-level aggregation; the outer histogram is a
    near-free second shuffle over the tiny per-customer counts."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# --------------------------------------------------------------------------
# Q14: promotion effect
# --------------------------------------------------------------------------

@register(
    "q14_promo_effect",
    """
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: month filter prunes lineitem before the broadcast join
    with part; single scalar result."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-09-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-10-01 00:00:00"))
    )
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.join(F.broadcast(p), li.l_partkey == p.p_partkey).agg(
        F.round(
            100.0
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
            / F.sum(rev),
            4,
        ).alias("promo_revenue")
    )


# --------------------------------------------------------------------------
# Q15: top supplier by quarterly revenue
# --------------------------------------------------------------------------

@register(
    "q15_top_supplier",
    """
    WITH revenue AS (SELECT l_suppkey AS supplier_no,
                            sum(l_extendedprice * (1 - l_discount)) AS total_revenue
                     FROM lineitem
                     WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                       AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
                     GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, round(total_revenue, 2) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    ORDER BY total_revenue DESC, s_suppkey
    LIMIT 1
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: revenue CTE + argmax. Expressed as top-1 with a key
    tie-break (deterministic) instead of the spec's where-equals-max
    (float-equality across engines is fragile)."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-04-01 00:00:00"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue")
    )
    s = _t(spark, sf_dir, "supplier")
    return (
        s.join(revenue, s.s_suppkey == F.col("supplier_no"))
        .orderBy(F.col("total_revenue").desc(), "s_suppkey")
        .limit(1)
        .select("s_suppkey", "s_name", F.round("total_revenue", 2).alias("total_revenue"))
    )


# --------------------------------------------------------------------------
# Q16 shape: supplier count per part attribute (partsupp from lineitem)
# --------------------------------------------------------------------------

@register(
    "q16_parts_supplier_cnt",
    """
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_parts_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-count of suppliers per part attribute
    triple; NOT-equal + IN-list predicates push to the part scan, part
    broadcasts into lineitem."""
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# Q17: small-quantity-order revenue (correlated avg subquery)
# --------------------------------------------------------------------------

@register(
    "q17_small_qty_revenue",
    """
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3' AND p_size = 10
      AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = part.p_partkey)
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (p_container proxied by p_size): the correlated avg
    subquery decorrelates to a per-part aggregate joined back — one
    extra shuffle on l_partkey instead of a per-row subquery.

    Scale note: the per-partkey average is computed only for partkeys
    surviving the brand/size filter (broadcast semi-join pushed into the
    scan), NOT over all of lineitem — a per-partkey aggregate of the full
    table is |part|-sized (~2B rows at 100 TB) and would OOM as a
    broadcast build side. After the semi-join both broadcasts are bounded
    by the filtered part count (~1/1250 of part)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#3") & (F.col("p_size") == 10)
    )
    avg_qty = (
        li.join(
            F.broadcast(p.select("p_partkey")),
            li.l_partkey == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy(F.col("l_partkey").alias("avg_partkey"))
        .agg((0.2 * F.avg("l_quantity")).alias("qty_threshold"))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(avg_qty), li.l_partkey == F.col("avg_partkey"))
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


# --------------------------------------------------------------------------
# Q18: large-volume customers
# --------------------------------------------------------------------------

@register(
    "q18_large_volume_customer",
    """
    SELECT c_custkey, c_name, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           round(o_totalprice, 2) AS totalprice,
           round(sum(l_quantity), 2) AS total_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY totalprice DESC, o_orderkey
    LIMIT 50
    """,
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: HAVING-filtered semi-join, folded to ONE lineitem pass
    (r12). The query's final ``sum(l_quantity)`` per order IS the
    aggregate the HAVING clause computes — every other grouping column
    (customer, orderdate, totalprice) is functionally dependent on
    o_orderkey through the orders PK — so the old shape's second
    lineitem scan (join back through the broadcast qualifying set and
    re-aggregate) recomputed a value it already had. New shape: one
    per-orderkey aggregate, filter > 150 (a tiny set), broadcast it onto
    orders, then onto customer — lineitem read once, scans 4 -> 3,
    exchanges 2 -> 1. Identical rows proved by the oracle gate (IN
    subquery + re-join form) at sf0.001/0.01/0.1."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 150)
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.round(F.col("sum_qty"), 2).alias("total_qty"),
        )
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            "total_qty",
        )
        .orderBy(F.col("totalprice").desc(), "o_orderkey")
        .limit(50)
    )


# --------------------------------------------------------------------------
# Q19: discounted revenue (disjunctive multi-attribute predicate)
# --------------------------------------------------------------------------

@register(
    "q19_discounted_revenue",
    """
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (p_container clauses proxied by p_size ranges): the
    disjunctive predicate spans both join sides, so it evaluates post-
    join; part still broadcasts."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .where(cond)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


# --------------------------------------------------------------------------
# Q20 shape: suppliers with significant shipments of a part family
# --------------------------------------------------------------------------

@register(
    "q20_part_promotion",
    """
    SELECT s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_1'
      AND s_suppkey IN (SELECT l_suppkey
                        FROM lineitem JOIN part ON p_partkey = l_partkey
                        WHERE p_name LIKE 'red%'
                          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
                        GROUP BY l_suppkey
                        HAVING sum(l_quantity) > 50)
    """,
)
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (partsupp availability proxied by shipped
    quantity): IN-subquery becomes a left-semi join against the
    HAVING-filtered supplier set."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    p = _t(spark, sf_dir, "part").where(F.col("p_name").like("red%"))
    qualified = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 50)
        .select("l_suppkey")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_1")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(qualified, s.s_suppkey == qualified.l_suppkey, "left_semi")
        .select("s_name", "n_name")
    )


# --------------------------------------------------------------------------
# Q21 shape: the sole-late-supplier count
# --------------------------------------------------------------------------

@register(
    "q21_waiting_orders",
    """
    WITH lates AS (SELECT l_orderkey, l_suppkey
                   FROM lineitem JOIN orders ON o_orderkey = l_orderkey
                   WHERE o_orderstatus = 'F'
                     AND l_shipdate > o_orderdate + INTERVAL 90 DAY
                   GROUP BY l_orderkey, l_suppkey),
         supp_cnt AS (SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_supp
                      FROM lineitem GROUP BY l_orderkey),
         late_cnt AS (SELECT l_orderkey, count(*) AS n_late
                      FROM lates GROUP BY l_orderkey)
    SELECT s_name, count(*) AS numwait
    FROM lates JOIN supp_cnt USING (l_orderkey)
               JOIN late_cnt USING (l_orderkey)
               JOIN supplier ON l_suppkey = s_suppkey
    WHERE n_supp >= 2 AND n_late = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (receipt-vs-commit lateness proxied by
    ship-more-than-90-days-after-order): the EXISTS / NOT-EXISTS pair
    decorrelates into ONE lineitem-orders join carrying a ``late`` flag,
    then a two-level aggregation — per (order, supplier) pair fold the
    flag, per order count pairs / late pairs and pick the single late
    supplier. Exactly equivalent to the oracle's lates/supp_cnt/late_cnt
    CTE triple (an order qualifies iff it has >= 2 distinct suppliers
    and exactly 1 distinct late supplier) but scans lineitem ONCE — the
    r12-measured win over the previous distinct+window+second-scan form
    (the n_supp countDistinct re-scanned lineitem; at 100 TB that is a
    second pass over the biggest table). Only orders with o_orderstatus
    = 'F' are ever consumed downstream, so restricting n_supp to the
    joined F-orders is semantics-preserving."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
            ).alias("late"),
        )
    )
    pair = j.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.col("late").cast("int")).alias("is_late")
    )
    per_order = pair.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum("is_late").alias("n_late"),
        F.max(F.when(F.col("is_late") == 1, F.col("l_suppkey"))).alias(
            "late_supp"
        ),
    )
    picked = per_order.where(
        (F.col("n_supp") >= 2) & (F.col("n_late") == 1)
    ).select(F.col("late_supp").alias("l_suppkey"))
    s = _t(spark, sf_dir, "supplier")
    return (
        picked.join(F.broadcast(s), picked.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q22: global sales opportunity (anti-join + scalar-avg threshold)
# --------------------------------------------------------------------------

@register(
    "q22_sales_opportunity",
    """
    SELECT n_name, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderpriority = '1-URGENT')
    GROUP BY n_name
    """,
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (c_phone country codes proxied by nation; never-ordered
    proxied by no-urgent-order, which is non-empty on TESTDATA):
    above-average balance = scalar broadcast threshold, plus a left-anti
    join on the filtered orders."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    threshold = c.where(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(threshold))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )
