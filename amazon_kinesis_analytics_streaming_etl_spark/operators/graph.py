"""Iterative graph analytics over edge DataFrames.

Connected components already live in operators/dedup.py (alternating
large-star/small-star — it serves the dedup clustering contract); this
module holds the general iterative-propagation template, with PageRank
as the first instance. The execution shape is Pregel-on-DataFrames
(GraphX's Pregel without the RDD layer): each superstep is one hash
join (messages = ranks joined onto edges) plus one aggregation
(messages combined per destination), and lineage is truncated every
iteration so the plan doesn't grow with the iteration count.

At 100 TB scale the knobs that matter:

- **Edges are the big side and are touched every iteration** — they are
  persisted once (deserialized columnar in memory, spilling to disk)
  and re-read per superstep; ranks (one row per node) are the small,
  changing side.
- **One partitioning, reused**: edges are hash-partitioned by ``src``
  once up front; every superstep's join shuffles only the rank table
  (|nodes| rows) onto that layout, so per-iteration shuffle volume is
  O(nodes), not O(edges).
- **localCheckpoint per superstep**: iterative plans otherwise nest the
  whole history into one tree — analysis time goes super-linear and the
  DAG UI dies long before the data does. Checkpointing also cuts the
  recovery lineage: a lost partition recomputes one superstep, not all
  of them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    partitions: int | None = None,
) -> DataFrame:
    """PageRank over a directed edge list; returns (node, pagerank).

    Pregel-style formulation (Page et al. 1999; the GraphX default):
    ``pr(v) = (1 - d) + d * sum(pr(u) / outdeg(u))`` over in-neighbors
    u, from ``pr = 1.0``, for a FIXED number of supersteps — fixed
    iterations keep the result deterministic and SQL-expressible (the
    oracle unrolls the same recurrence as chained CTEs), and in practice
    rank orderings stabilize in a handful of rounds. Dangling nodes
    (out-degree 0) keep the (1 - d) floor and leak their mass, same as
    GraphX's ``staticPageRank``; callers needing the stochastic-matrix
    variant should add reverse edges or a sink-redistribution pass.

    Each superstep = join ranks onto edges by ``src`` (messages), then
    ``groupBy(dst).sum`` (combine — Spark's partial aggregation makes
    this a map-side combine before the shuffle), then a left join back
    onto the node set so message-less nodes retain the floor.
    """
    e = edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"))
    if partitions:
        e = e.repartition(partitions, "_src")
    # out-degree folded onto each edge once: per-superstep messages are
    # then a single narrow join + projection over this cached relation.
    deg = e.groupBy("_src").agg(F.count("*").cast("double").alias("_outdeg"))
    weighted = e.join(deg, "_src").persist()
    nodes = (
        e.select(F.col("_src").alias("node"))
        .union(e.select(F.col("_dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    ranks = nodes.withColumn("pr", F.lit(1.0))
    for _ in range(iterations):
        msgs = (
            weighted.join(ranks, weighted["_src"] == ranks["node"])
            .select("_dst", (F.col("pr") / F.col("_outdeg")).alias("_m"))
            .groupBy("_dst")
            .agg(F.sum("_m").alias("_msum"))
        )
        ranks = (
            nodes.join(msgs, nodes["node"] == msgs["_dst"], "left")
            .select(
                "node",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce(F.col("_msum"), F.lit(0.0))
                ).alias("pr"),
            )
            .localCheckpoint()
        )
    weighted.unpersist()
    return ranks.select("node", F.col("pr").alias("pagerank"))
