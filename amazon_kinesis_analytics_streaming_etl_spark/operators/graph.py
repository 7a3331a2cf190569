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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    partitions: int | None = None,
    seeds: list[int] | None = None,
) -> DataFrame:
    """PageRank over a directed edge list; returns (node, pagerank).

    ``seeds``: PERSONALIZED PageRank (random walk with restart, Haveliwala
    2002 / the GraphX ``personalizedPageRank`` contract): the (1 - d)
    teleport mass lands only on the seed nodes instead of uniformly, and
    ranks initialize to the seed indicator — the resulting scores measure
    proximity to the seed set, the recommendation/related-items primitive.
    Seeds ride as a broadcast literal (bounded seed sets by contract);
    everything else — supersteps, message combine, lineage truncation —
    is identical to the uniform walk.

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
    if seeds is not None and not seeds:
        raise ValueError(
            "seeds=[] would zero every rank (no teleport mass anywhere); "
            "pass None for the uniform walk or a non-empty seed list"
        )
    if seeds is None:
        floor = F.lit(1.0 - damping)
        init = F.lit(1.0)
    else:
        is_seed = F.col("node").isin([int(s) for s in seeds])
        floor = F.when(is_seed, F.lit(1.0 - damping)).otherwise(F.lit(0.0))
        init = F.when(is_seed, F.lit(1.0)).otherwise(F.lit(0.0))
    ranks = nodes.withColumn("pr", init)
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
                    floor
                    + F.lit(damping) * F.coalesce(F.col("_msum"), F.lit(0.0))
                ).alias("pr"),
            )
            .localCheckpoint()
        )
    weighted.unpersist()
    return ranks.select("node", F.col("pr").alias("pagerank"))


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007; GraphX's
    LabelPropagation shape) over a DIRECTED edge list — pass reversed
    edges too for undirected semantics. Returns (node, label).

    Every node starts labeled with its own id. Each superstep, every
    node adopts the most frequent label among its in-neighbors, ties
    broken by the SMALLEST label; nodes with no in-edges keep their
    current label. The min-label tie-break makes the synchronous update
    fully deterministic (the usual LPA rand-tie-break is not), which is
    what lets a SQL oracle unroll the recurrence iteration-for-iteration.

    Superstep = one join (labels onto edges by source), one count
    aggregation per (dst, label) — map-side combined — and one
    per-node argmax window. The window does add a second exchange after
    the aggregation's, but Spark 4 plans it behind a PARTIAL
    WindowGroupLimit (rank-limit pushdown): each upstream partition is
    pruned to its top-1 row per node before the exchange, so the argmax
    shuffle carries at most one row per (node, partition) — verified in
    the physical plan, see test_plan_invariants. Lineage is truncated
    every superstep (the pagerank rule)."""
    e = edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst")).persist()
    nodes = (
        e.select(F.col("_src").alias("node"))
        .union(e.select(F.col("_dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    labels = nodes.withColumn("lbl", F.col("node"))
    w = Window.partitionBy("_dst").orderBy(F.col("c").desc(), F.col("lbl"))
    for _ in range(iterations):
        picked = (
            e.join(labels, e["_src"] == labels["node"])
            .groupBy("_dst", "lbl")
            .agg(F.count("*").alias("c"))
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(F.col("_dst").alias("node"), F.col("lbl").alias("_new"))
        )
        labels = (
            labels.join(picked, "node", "left")
            .select("node", F.coalesce("_new", "lbl").alias("lbl"))
            .localCheckpoint()
        )
    e.unpersist()
    return labels.select("node", F.col("lbl").alias("label"))


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
) -> DataFrame:
    """Multi-source BFS: minimum hop distance from any seed, bounded by
    ``max_hops``; returns (node, hop) for every reached node (seeds are
    hop 0, isolated seeds included). Directed semantics — pass reversed
    edges too for undirected graphs.

    Level-synchronous frontier expansion (the Pregel/GraphX shortest-
    paths shape specialized to unit weights): each round joins the
    CURRENT frontier onto the edge list, dedups the neighbor set, and
    anti-joins the visited set so a node's hop is assigned exactly once
    — the min() is structural, never recomputed. Per-round shuffle
    volume is O(frontier ⋈ edges output + |visited|), and the frontier
    only shrinks once the graph saturates; the edge list is persisted
    once and reused (the module's iterative-plan rules: persist the big
    static side, localCheckpoint the small changing side every round).
    An empty frontier short-circuits the loop driver-side — one cheap
    isEmpty() action per round, the standard BFS termination test.
    """
    e = edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst")).persist()
    visited = (
        seeds.select(F.col(node).alias("node"))
        .distinct()
        .withColumn("hop", F.lit(0))
        .localCheckpoint()
    )
    frontier = visited.select("node")
    for h in range(1, max_hops + 1):
        if frontier.isEmpty():
            break
        nxt = (
            e.join(frontier, e["_src"] == frontier["node"])
            .select(F.col("_dst").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .withColumn("hop", F.lit(h))
            .localCheckpoint()
        )
        visited = visited.union(nxt).localCheckpoint()
        frontier = nxt.select("node")
    e.unpersist()
    return visited


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node triangle counts; returns (node, triangles) for nodes in
    AT LEAST ONE triangle — triangle-free nodes are omitted, not
    reported as 0 (left-join the node set and coalesce to 0 for the
    GraphX-style dense contract, e.g. clustering coefficients).

    Degree-ordered orientation (the standard distributed formulation —
    Suri & Vassilvitskii 2011 "Counting Triangles and the Curse of the
    Last Reducer"; same shape GraphX's TriangleCount uses): canonicalize
    the undirected edge set, then orient every edge from its lower
    endpoint to its higher endpoint under the total order (degree, id).
    Each triangle then appears EXACTLY once as a directed path a->b->c
    with a closing edge a->c, so counting is two joins: oriented ⋈
    oriented on the middle node (wedges), then a semi-join against the
    oriented edge set to keep closed wedges.

    Why orientation matters at scale: without it, a hub of degree d
    emits O(d^2) wedges — the "curse of the last reducer". Orienting by
    degree bounds every node's OUT-degree by O(sqrt(m)) (a node of
    degree > sqrt(2m) cannot have that many higher-degree neighbors), so
    per-node wedge fan-out is O(m) total instead of O(sum d^2), and the
    skewed-hub partition disappears. Both joins are plain hash
    equi-joins on a single key (the wedge join keys on the middle node;
    the closure check keys on the (a, c) pair), so Catalyst shuffles
    each side once and AQE handles any residual skew.
    """
    e = edges.select(F.col(src).alias("_u"), F.col(dst).alias("_v"))
    # Materialize the canonical edge set once: it (and the orientation
    # derived from it) is referenced by BOTH sides of the wedge join and
    # by the closure semi-join, and without truncation each reference
    # re-executes the caller's whole upstream (here: the co-purchase
    # self-join + top-K) — the iterative-plan rule from pagerank applies
    # to diamond-shaped reuse too.
    und = (
        e.select(F.least("_u", "_v").alias("_u"), F.greatest("_u", "_v").alias("_v"))
        .where(F.col("_u") != F.col("_v"))
        .distinct()
        .localCheckpoint()
    )
    deg = (
        und.select(F.col("_u").alias("n"))
        .union(und.select(F.col("_v").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    du = deg.select(F.col("n").alias("_u"), F.col("d").alias("_du"))
    dv = deg.select(F.col("n").alias("_v"), F.col("d").alias("_dv"))
    fwd = (F.col("_du") < F.col("_dv")) | (
        (F.col("_du") == F.col("_dv")) & (F.col("_u") < F.col("_v"))
    )
    oriented = (
        und.join(du, "_u")
        .join(dv, "_v")
        .select(
            F.when(fwd, F.col("_u")).otherwise(F.col("_v")).alias("lo"),
            F.when(fwd, F.col("_v")).otherwise(F.col("_u")).alias("hi"),
        )
        .localCheckpoint()
    )
    # wedges a->b->c, closed by an oriented a->c edge: each triangle once.
    e1 = oriented.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    e2 = oriented.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    closing = oriented.select(F.col("lo").alias("a"), F.col("hi").alias("c"))
    tri = e1.join(e2, "b").join(closing, ["a", "c"], "left_semi")
    members = (
        tri.select(F.col("a").alias("node"))
        .union(tri.select(F.col("b").alias("node")))
        .union(tri.select(F.col("c").alias("node")))
    )
    return members.groupBy("node").agg(F.count("*").cast("long").alias("triangles"))


def k_core(
    edges: DataFrame,
    k: int,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-round k-core peeling over an undirected graph (edge
    direction and duplicates are canonicalized away); returns the
    surviving (node) set after ``rounds`` synchronous peels.

    Each round removes every node whose degree in the CURRENT induced
    subgraph is below k — the classic cohesion filter (Seidman 1983)
    behind spam-subgraph pruning and community-core extraction. A peel
    can cascade (removing a node lowers its neighbors' degrees), so the
    true k-core is the fixpoint; a FIXED round count keeps the operator
    deterministic and SQL-expressible (the oracle unrolls the same
    peels), the same contract as pagerank/label_propagation's fixed
    supersteps. Rounds are cheap: each is two semi-joins of the
    persisted canonical edge list against the (shrinking) alive set,
    one endpoint explode, and one map-side-combined degree count —
    per-round shuffle volume is O(alive edges), never more than the
    first round's.
    """
    e = edges.select(F.col(src).alias("_u"), F.col(dst).alias("_v"))
    und = (
        e.select(F.least("_u", "_v").alias("_u"), F.greatest("_u", "_v").alias("_v"))
        .where(F.col("_u") != F.col("_v"))
        .distinct()
        .localCheckpoint()
    )
    alive = (
        und.select(F.col("_u").alias("node"))
        .union(und.select(F.col("_v").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    for _ in range(rounds):
        au = alive.select(F.col("node").alias("_u"))
        av = alive.select(F.col("node").alias("_v"))
        e_alive = und.join(au, "_u", "left_semi").join(av, "_v", "left_semi")
        alive = (
            e_alive.select(F.col("_u").alias("node"))
            .union(e_alive.select(F.col("_v").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("_d"))
            .where(F.col("_d") >= k)
            .select("node")
            .localCheckpoint()
        )
    return alive


def bellman_ford(
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    node: str = "node",
) -> DataFrame:
    """Fixed-round single/multi-source shortest paths over a weighted
    directed edge list (Bellman-Ford relaxation; non-negative weights
    assumed by callers wanting true shortest paths within ``rounds``
    hops); returns (node, dist) for every node reached within
    ``rounds`` relaxations — the weighted sibling of :func:`bfs_hops`.

    Each superstep is the min-plus analog of pagerank's sum step: join
    current distances onto the edge list (messages = dist + w), union
    with the incumbent distances, and take MIN per node — Spark's
    partial aggregation makes the min a map-side combine, so per-round
    shuffle volume is O(|dist| + messages), bounded by |nodes| +
    |edges-from-reached|. Unreached nodes carry an implicit infinity
    (absent row), so the distance table only ever holds reached nodes.
    Fixed rounds keep it deterministic and oracle-unrollable: after R
    rounds the result is exact for all nodes whose shortest path uses
    <= R edges (Bellman-Ford's invariant). Lineage is truncated every
    round (the module rule).
    """
    e = edges.select(
        F.col(src).alias("_src"), F.col(dst).alias("_dst"), F.col(weight).alias("_w")
    ).persist()
    dist = (
        seeds.select(F.col(node).alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0.0))
        .localCheckpoint()
    )
    for _ in range(rounds):
        msgs = (
            e.join(dist, e["_src"] == dist["node"])
            .select(
                F.col("_dst").alias("node"),
                (F.col("dist") + F.col("_w")).alias("dist"),
            )
        )
        dist = (
            dist.union(msgs)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint()
        )
    e.unpersist()
    return dist


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 2,
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999, the "authoritative
    sources" algorithm) over a DIRECTED edge list; returns one row per
    node appearing on either side: (node, hub, authority) — nodes with
    no out-edges carry hub 0.0, no in-edges authority 0.0.

    Per iteration (the textbook synchronous update):
      auth(v) = sum of hub(u) over in-neighbors, then L2-normalize;
      hub(u)  = sum of auth(v) over out-neighbors, then L2-normalize.
    Fixed iterations keep it deterministic and SQL-expressible (the
    oracle unrolls the same recurrence CTE-for-CTE, the pagerank
    precedent). Each half-step is one join + map-side-combinable
    groupBy-sum; the L2 norm is a 1-row aggregate broadcast back — no
    driver loop over data, lineage truncated per iteration the same way
    pagerank does."""
    if iterations < 1:
        raise ValueError(
            "hits() needs iterations >= 1 (0 would return unnormalized "
            "init scores and no authority side)"
        )
    e = edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst")).persist()
    srcs = e.select(F.col("_src").alias("node")).distinct()
    dsts = e.select(F.col("_dst").alias("node")).distinct()
    hubs = srcs.withColumn("hub", F.lit(1.0)).localCheckpoint()
    auths = None
    for _ in range(iterations):
        raw_a = (
            e.join(hubs, e["_src"] == hubs["node"])
            .groupBy("_dst")
            .agg(F.sum("hub").alias("_s"))
        )
        a_norm = raw_a.agg(F.sqrt(F.sum(F.pow("_s", 2))).alias("_n"))
        auths = (
            dsts.join(raw_a, dsts["node"] == raw_a["_dst"], "left")
            .crossJoin(F.broadcast(a_norm))
            .select(
                "node",
                (F.coalesce(F.col("_s"), F.lit(0.0)) / F.col("_n")).alias(
                    "authority"
                ),
            )
            .localCheckpoint()
        )
        raw_h = (
            e.join(auths, e["_dst"] == auths["node"])
            .groupBy("_src")
            .agg(F.sum("authority").alias("_s"))
        )
        h_norm = raw_h.agg(F.sqrt(F.sum(F.pow("_s", 2))).alias("_n"))
        hubs = (
            srcs.join(raw_h, srcs["node"] == raw_h["_src"], "left")
            .crossJoin(F.broadcast(h_norm))
            .select(
                "node",
                (F.coalesce(F.col("_s"), F.lit(0.0)) / F.col("_n")).alias("hub"),
            )
            .localCheckpoint()
        )
    e.unpersist()
    # hubs covers exactly the src side, auths the dst side (both already
    # localCheckpointed) — a full-outer join assembles srcs UNION dsts
    # without re-executing the caller's edge pipeline
    return hubs.join(auths, "node", "full_outer").select(
        "node",
        F.coalesce("hub", F.lit(0.0)).alias("hub"),
        F.coalesce("authority", F.lit(0.0)).alias("authority"),
    )
