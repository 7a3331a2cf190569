"""PageRank (operators/graph.py) and bloom prefilter (operators/scale.py):
reference-value checks against pure-Python/numpy recurrences, plus the
bloom guarantees (zero false negatives, bounded false positives)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from amazon_kinesis_analytics_streaming_etl_spark.operators.graph import (
    label_propagation,
    pagerank,
    triangle_count,
)
from amazon_kinesis_analytics_streaming_etl_spark.operators.scale import (
    bloom_build,
    bloom_prefilter,
)


def _pr_reference(edge_list, iterations=3, damping=0.85):
    """Same Pregel recurrence, dict-based: the test oracle."""
    nodes = sorted({u for e in edge_list for u in e})
    out = {}
    for u, _ in edge_list:
        out[u] = out.get(u, 0) + 1
    pr = {n: 1.0 for n in nodes}
    for _ in range(iterations):
        msgs = {n: 0.0 for n in nodes}
        for u, v in edge_list:
            msgs[v] += pr[u] / out[u]
        pr = {n: (1 - damping) + damping * msgs[n] for n in nodes}
    return pr


def test_pagerank_matches_reference_recurrence(spark):
    # star (1 -> 2,3,4) + chain (2 -> 3 -> 4) + back-edge (4 -> 1):
    # mixes fan-out, chains, and a cycle in one small graph
    edge_list = [(1, 2), (1, 3), (1, 4), (2, 3), (3, 4), (4, 1)]
    edges = spark.createDataFrame(edge_list, ["src", "dst"])
    got = {
        r["node"]: r["pagerank"]
        for r in pagerank(edges, iterations=4).collect()
    }
    want = _pr_reference(edge_list, iterations=4)
    assert set(got) == set(want)
    for n in want:
        assert got[n] == pytest.approx(want[n], abs=1e-12)


def test_pagerank_dangling_node_keeps_floor(spark):
    # 2 has no out-edges: it receives from 1 but contributes nothing
    edges = spark.createDataFrame([(1, 2)], ["src", "dst"])
    got = {r["node"]: r["pagerank"] for r in pagerank(edges, iterations=2).collect()}
    # node 1: no in-edges -> floor after iter 1, stays
    assert got[1] == pytest.approx(0.15)
    # node 2: floor + d * pr(1)/1 with pr(1)=0.15 after the first step
    assert got[2] == pytest.approx(0.15 + 0.85 * 0.15)


def test_pagerank_partitions_arg_preserves_result(spark):
    edge_list = [(i, (i * 7) % 50) for i in range(200) if i != (i * 7) % 50]
    edges = spark.createDataFrame(edge_list, ["src", "dst"])
    base = {r["node"]: r["pagerank"] for r in pagerank(edges).collect()}
    repart = {
        r["node"]: r["pagerank"] for r in pagerank(edges, partitions=5).collect()
    }
    assert set(base) == set(repart)
    for n in base:
        assert base[n] == pytest.approx(repart[n], rel=1e-12)


def _local_bloom(keys, num_bits, num_hashes, spark):
    """Driver-side twin of the distributed build: derive positions with
    the SAME JVM expressions (one small collect), set bits in numpy."""
    from amazon_kinesis_analytics_streaming_etl_spark.operators.scale import (
        _bloom_positions,
    )

    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    rows = df.select(
        F.explode(_bloom_positions(F.col("k"), num_bits, num_hashes)).alias("p")
    ).collect()
    bm = np.zeros((num_bits + 63) // 64, dtype=np.uint64)
    for r in rows:
        bm[r["p"] >> 6] |= np.uint64(1) << np.uint64(r["p"] & 63)
    return bm


def test_bloom_build_matches_local_bitmap(spark):
    keys = list(range(0, 5000, 3))
    df = spark.createDataFrame([(k,) for k in keys], ["k"]).repartition(7)
    num_bits = 1 << 14
    got = bloom_build(df, "k", num_bits, num_hashes=5)
    want = _local_bloom(keys, num_bits, 5, spark)
    assert np.array_equal(got, want)


@pytest.mark.parametrize("path", ["inline_jvm", "arrow_numpy"])
def test_bloom_prefilter_no_false_negatives_and_bounded_fp(
    spark, path, monkeypatch
):
    """Both probe paths (r12: inline literal-array bit_get for small
    bitmaps; broadcast + Arrow numpy for large) honor the one-sided
    guarantee and the design fp bound — and agree row-for-row."""
    from amazon_kinesis_analytics_streaming_etl_spark.operators import scale

    if path == "arrow_numpy":
        monkeypatch.setattr(scale, "_BLOOM_INLINE_MAX_WORDS", 0)
    member = set(range(0, 20_000, 4))  # 5k members
    keys = spark.createDataFrame([(k,) for k in sorted(member)], ["k"])
    num_bits = ((10 * len(member) + 63) // 64) * 64
    bm = bloom_build(keys, "k", num_bits)

    probe = spark.range(20_000).select(F.col("id").alias("k"))
    passed = {r["k"] for r in bloom_prefilter(probe, "k", bm, num_bits).collect()}
    assert member <= passed  # one-sided guarantee: every member survives
    fp = len(passed - member)
    non_members = 20_000 - len(member)
    # design fpp ~0.8% at m/n=10, k=7; assert under 3x that
    assert fp / non_members < 0.025
    # the two paths must test identical positions: same pass-through set
    monkeypatch.setattr(
        scale, "_BLOOM_INLINE_MAX_WORDS", 0 if path == "inline_jvm" else 4096
    )
    other = {r["k"] for r in bloom_prefilter(probe, "k", bm, num_bits).collect()}
    assert passed == other


def test_bloom_prefilter_inline_handles_all_zero_words(spark):
    """An empty key set builds an all-zero bitmap whose word literals
    are small ints — the inline path must still type them as longs
    (bit_get on an array<int> rejects positions >= 32) and drop every
    probe row."""
    keys = spark.createDataFrame([], "k long")
    bm = bloom_build(keys, "k", 1024)
    probe = spark.range(500).select(F.col("id").alias("k"))
    assert bloom_prefilter(probe, "k", bm, 1024).count() == 0


def test_pagerank_property_random_graphs(spark):
    """Hypothesis: on arbitrary small digraphs (self-loops, parallel
    edges collapsed by the caller or not, isolated cycles, dangling
    sinks) the distributed PageRank equals the dict-based reference
    recurrence to float precision for 1-4 iterations."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    node = st.integers(min_value=0, max_value=12)

    @settings(
        max_examples=8, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        edges=st.lists(
            st.tuples(node, node), min_size=1, max_size=40, unique=True
        ),
        iters=st.integers(min_value=1, max_value=4),
    )
    def run(edges, iters):
        # the operator contract is a deduped edge list; self-loops are
        # legal (a node citing itself) and exercise u==v paths
        df = spark.createDataFrame(edges, ["src", "dst"])
        got = {
            r["node"]: r["pagerank"]
            for r in pagerank(df, iterations=iters).collect()
        }
        want = _pr_reference(edges, iterations=iters)
        assert set(got) == set(want)
        for n in want:
            assert got[n] == pytest.approx(want[n], abs=1e-9)

    run()


def test_bloom_property_no_false_negatives(spark):
    """Hypothesis: for arbitrary member sets and bitmap sizes (including
    adversarially tiny bitmaps where everything collides) every member
    passes the prefilter — the one-sided guarantee can never break, only
    the FP rate may degrade."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=8, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        members=st.lists(
            st.integers(min_value=-(1 << 40), max_value=1 << 40),
            min_size=1, max_size=50, unique=True,
        ),
        num_bits=st.sampled_from([64, 128, 4096]),
        num_hashes=st.integers(min_value=1, max_value=8),
    )
    def run(members, num_bits, num_hashes):
        keys = spark.createDataFrame([(k,) for k in members], "k long")
        bm = bloom_build(keys, "k", num_bits, num_hashes)
        out = {
            r["k"]
            for r in bloom_prefilter(keys, "k", bm, num_bits, num_hashes).collect()
        }
        assert out == set(members)

    run()


# --- triangle counting -------------------------------------------------------


def _tri_reference(edge_list):
    """Brute-force per-node triangle counts over the canonical undirected
    edge set: check every node triple — the O(n^3) test oracle."""
    und = {tuple(sorted(e)) for e in edge_list if e[0] != e[1]}
    nodes = sorted({u for e in und for u in e})
    counts = {}
    for i, a in enumerate(nodes):
        for j in range(i + 1, len(nodes)):
            for k in range(j + 1, len(nodes)):
                b, c = nodes[j], nodes[k]
                if (
                    (a, b) in und
                    and tuple(sorted((b, c))) in und
                    and (a, c) in und
                ):
                    for n in (a, b, c):
                        counts[n] = counts.get(n, 0) + 1
    return counts


def test_triangle_count_known_graph(spark):
    # K4 on {1,2,3,4} (every node in C(3,2)=3 triangles) plus a pendant
    # edge 4-5 (in none) and a disconnected 2-path 6-7-8 (no triangle)
    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (4, 5), (6, 7), (7, 8),
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["triangles"] for r in triangle_count(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_count_direction_and_duplicates_irrelevant(spark):
    # same triangle expressed with mixed directions and repeated edges:
    # canonicalization must collapse them to ONE triangle
    edges = [(1, 2), (2, 1), (3, 2), (1, 3), (3, 1), (1, 1)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["triangles"] for r in triangle_count(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangle_count_property_random_graphs(spark):
    """Hypothesis: on arbitrary small graphs (self-loops, both edge
    directions, hubs, disconnected pieces) the oriented-wedge count
    equals the brute-force triple enumeration per node."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    node = st.integers(min_value=0, max_value=10)

    @settings(
        max_examples=8, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        edges=st.lists(
            st.tuples(node, node), min_size=1, max_size=35, unique=True
        )
    )
    def run(edges):
        df = spark.createDataFrame(edges, ["src", "dst"])
        got = {r["node"]: r["triangles"] for r in triangle_count(df).collect()}
        assert got == _tri_reference(edges)

    run()


# --- label propagation -------------------------------------------------------


def _lpa_reference(edge_list, iterations):
    """Dict-based synchronous LPA with min-label tie-break: the oracle."""
    nodes = sorted({u for e in edge_list for u in e})
    lbl = {n: n for n in nodes}
    for _ in range(iterations):
        new = {}
        for n in nodes:
            counts = {}
            for u, v in edge_list:
                if v == n:
                    counts[lbl[u]] = counts.get(lbl[u], 0) + 1
            if counts:
                new[n] = min(
                    counts, key=lambda c: (-counts[c], c)
                )
            else:
                new[n] = lbl[n]
        lbl = new
    return lbl


def test_lpa_two_cliques_converge_to_two_communities(spark):
    # two triangles bridged by one edge: each triangle's min id wins its side
    tri1 = [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 1)]
    tri2 = [(4, 5), (5, 4), (5, 6), (6, 5), (4, 6), (6, 4)]
    bridge = [(3, 4), (4, 3)]
    edges = spark.createDataFrame(tri1 + tri2 + bridge, ["src", "dst"])
    got = {
        r["node"]: r["label"]
        for r in label_propagation(edges, iterations=4).collect()
    }
    assert got == _lpa_reference(tri1 + tri2 + bridge, 4)


def test_lpa_isolated_source_keeps_own_label(spark):
    # 9 -> 1 only: node 9 has no in-edges, must keep label 9 forever
    edges = spark.createDataFrame([(9, 1)], ["src", "dst"])
    got = {
        r["node"]: r["label"]
        for r in label_propagation(edges, iterations=3).collect()
    }
    assert got[9] == 9
    assert got[1] == 9


def test_lpa_property_random_digraphs(spark):
    """Hypothesis: on arbitrary small digraphs the distributed
    synchronous LPA equals the dict-based recurrence exactly (labels are
    integers — no float tolerance needed)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    node = st.integers(min_value=0, max_value=10)

    @settings(
        max_examples=8, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        edges=st.lists(
            st.tuples(node, node), min_size=1, max_size=30, unique=True
        ),
        iters=st.integers(min_value=1, max_value=3),
    )
    def run(edges, iters):
        df = spark.createDataFrame(edges, ["src", "dst"])
        got = {
            r["node"]: r["label"]
            for r in label_propagation(df, iterations=iters).collect()
        }
        assert got == _lpa_reference(edges, iters)

    run()


# --- multi-source BFS ----------------------------------------------------


def _bfs_reference(edge_list, seeds, max_hops):
    """Level-synchronous BFS over a directed edge list: the dict oracle."""
    adj = {}
    for u, v in edge_list:
        adj.setdefault(u, set()).add(v)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for h in range(1, max_hops + 1):
        nxt = set()
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = h
                    nxt.add(v)
        frontier = nxt
        if not frontier:
            break
    return dist


def test_bfs_hops_known_graph(spark):
    from amazon_kinesis_analytics_streaming_etl_spark.operators.graph import bfs_hops

    # chain 1->2->3->4, shortcut 1->3, unreachable component 8->9,
    # isolated seed 7 (hop 0, no edges)
    edges = [(1, 2), (2, 3), (3, 4), (1, 3), (8, 9)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    seeds = spark.createDataFrame([(1,), (7,)], ["node"])
    got = {r["node"]: r["hop"] for r in bfs_hops(df, seeds, max_hops=5).collect()}
    assert got == {1: 0, 7: 0, 2: 1, 3: 1, 4: 2}


def test_bfs_hops_max_hops_truncates(spark):
    from amazon_kinesis_analytics_streaming_etl_spark.operators.graph import bfs_hops

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], ["src", "dst"]
    )
    seeds = spark.createDataFrame([(0,)], ["node"])
    got = {r["node"]: r["hop"] for r in bfs_hops(edges, seeds, max_hops=2).collect()}
    assert got == {0: 0, 1: 1, 2: 2}


def test_bfs_hops_property_random_digraphs(spark):
    """Hypothesis: on arbitrary small digraphs (cycles, self-loops,
    unreachable pieces, multiple seeds) the frontier-expansion BFS equals
    the dict-based level BFS exactly."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from amazon_kinesis_analytics_streaming_etl_spark.operators.graph import bfs_hops

    node = st.integers(min_value=0, max_value=10)

    @settings(
        max_examples=8, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        edges=st.lists(
            st.tuples(node, node), min_size=1, max_size=30, unique=True
        ),
        seeds=st.lists(node, min_size=1, max_size=3, unique=True),
        hops=st.integers(min_value=0, max_value=4),
    )
    def run(edges, seeds, hops):
        df = spark.createDataFrame(edges, ["src", "dst"])
        sdf = spark.createDataFrame([(s,) for s in seeds], ["node"])
        got = {r["node"]: r["hop"] for r in bfs_hops(df, sdf, hops).collect()}
        assert got == _bfs_reference(edges, seeds, hops)

    run()


# --- k-core peeling --------------------------------------------------------


def _kcore_reference(edge_list, k, rounds):
    """Dict-based synchronous peeling: the oracle."""
    und = {tuple(sorted(e)) for e in edge_list if e[0] != e[1]}
    alive = {u for e in und for u in e}
    for _ in range(rounds):
        deg = {}
        for u, v in und:
            if u in alive and v in alive:
                deg[u] = deg.get(u, 0) + 1
                deg[v] = deg.get(v, 0) + 1
        alive = {n for n, d in deg.items() if d >= k}
    return alive


def test_kcore_known_graph(spark):
    from amazon_kinesis_analytics_streaming_etl_spark.operators.graph import k_core

    # K4 {1..4} is a 3-core; 5 hangs off 4 (degree 1); 6-7-8 path (max
    # degree 2). k=3 must peel everything but the K4 — and the pendant's
    # removal must not cascade into it.
    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (4, 5), (6, 7), (7, 8),
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"] for r in k_core(df, k=3, rounds=3).collect()}
    assert got == {1, 2, 3, 4}


def test_kcore_cascade_needs_multiple_rounds(spark):
    from amazon_kinesis_analytics_streaming_etl_spark.operators.graph import k_core

    # chain 1-2-3-4: k=2 peels the endpoints round 1, which drops the
    # middle nodes to degree 1 -> round 2 empties the graph
    edges = [(1, 2), (2, 3), (3, 4)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    after1 = {r["node"] for r in k_core(df, k=2, rounds=1).collect()}
    after2 = {r["node"] for r in k_core(df, k=2, rounds=2).collect()}
    assert after1 == {2, 3}
    assert after2 == set()


def test_kcore_property_random_graphs(spark):
    """Hypothesis: arbitrary small graphs, any k/rounds — the
    distributed peel equals the dict-based recurrence exactly."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from amazon_kinesis_analytics_streaming_etl_spark.operators.graph import k_core

    node = st.integers(min_value=0, max_value=10)

    @settings(
        max_examples=8, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        edges=st.lists(
            st.tuples(node, node), min_size=1, max_size=30, unique=True
        ),
        k=st.integers(min_value=1, max_value=4),
        rounds=st.integers(min_value=1, max_value=3),
    )
    def run(edges, k, rounds):
        df = spark.createDataFrame(edges, ["src", "dst"])
        got = {r["node"] for r in k_core(df, k=k, rounds=rounds).collect()}
        assert got == _kcore_reference(edges, k, rounds)

    run()


# --- weighted shortest paths (Bellman-Ford rounds) --------------------------


def _bf_reference(edge_list, seeds, rounds):
    """Dict-based min-plus relaxation: the oracle. edge_list holds
    (src, dst, w) triples."""
    dist = {s: 0.0 for s in seeds}
    for _ in range(rounds):
        new = dict(dist)
        for u, v, w in edge_list:
            if u in dist:
                cand = dist[u] + w
                if v not in new or cand < new[v]:
                    new[v] = cand
        dist = new
    return dist


def test_bellman_ford_known_graph(spark):
    from amazon_kinesis_analytics_streaming_etl_spark.operators.graph import (
        bellman_ford,
    )

    # 1->2 (5.0) vs 1->3->2 (1.0+1.0): the indirect path must win; 4 is
    # unreachable; seed itself stays at 0.
    edges = [(1, 2, 5.0), (1, 3, 1.0), (3, 2, 1.0), (4, 5, 1.0)]
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    seeds = spark.createDataFrame([(1,)], ["node"])
    got = {r["node"]: r["dist"] for r in bellman_ford(df, seeds, rounds=3).collect()}
    assert got == {1: 0.0, 3: 1.0, 2: 2.0}


def test_bellman_ford_round_bound_is_edge_count(spark):
    from amazon_kinesis_analytics_streaming_etl_spark.operators.graph import (
        bellman_ford,
    )

    # chain of weight-1 edges: after R rounds only paths of <= R edges
    # are final (the Bellman-Ford invariant)
    edges = [(i, i + 1, 1.0) for i in range(5)]
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    seeds = spark.createDataFrame([(0,)], ["node"])
    got = {r["node"]: r["dist"] for r in bellman_ford(df, seeds, rounds=2).collect()}
    assert got == {0: 0.0, 1: 1.0, 2: 2.0}


def test_bellman_ford_property_random_weighted_digraphs(spark):
    """Hypothesis: arbitrary small weighted digraphs (parallel paths,
    cycles, multiple seeds, integer weights for exact float equality) —
    the distributed relaxation equals the dict recurrence exactly."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from amazon_kinesis_analytics_streaming_etl_spark.operators.graph import (
        bellman_ford,
    )

    node = st.integers(min_value=0, max_value=8)

    @settings(
        max_examples=8, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        edges=st.lists(
            st.tuples(
                node, node, st.integers(min_value=0, max_value=9)
            ),
            min_size=1, max_size=25,
            unique_by=lambda e: (e[0], e[1]),
        ),
        seeds=st.lists(node, min_size=1, max_size=2, unique=True),
        rounds=st.integers(min_value=1, max_value=4),
    )
    def run(edges, seeds, rounds):
        triples = [(u, v, float(w)) for u, v, w in edges]
        df = spark.createDataFrame(triples, ["src", "dst", "w"])
        sdf = spark.createDataFrame([(s,) for s in seeds], ["node"])
        got = {
            r["node"]: r["dist"]
            for r in bellman_ford(df, sdf, rounds).collect()
        }
        assert got == _bf_reference(triples, seeds, rounds)

    run()


def test_personalized_pagerank_seed_locality(spark):
    """seeds=: teleport mass lands only on the seed and ranks init to
    the seed indicator — pinned against the pure-Python recurrence on a
    path graph + a disconnected pair; the disconnected component must
    score exactly zero (it never receives seed mass), while the uniform
    walk reaches every node."""
    from amazon_kinesis_analytics_streaming_etl_spark.operators.graph import (
        pagerank,
    )

    pairs = [(1, 2), (2, 3), (3, 4), (10, 11)]
    edge_list = pairs + [(b, a) for a, b in pairs]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    ppr = {
        r["node"]: r["pagerank"]
        for r in pagerank(edges, iterations=4, seeds=[1]).collect()
    }

    # pure-Python twin of the seeded recurrence
    damping, seed = 0.85, 1
    nodes = sorted({n for e in edge_list for n in e})
    out = {n: 0 for n in nodes}
    for u, _ in edge_list:
        out[u] += 1
    pr = {n: (1.0 if n == seed else 0.0) for n in nodes}
    for _ in range(4):
        msgs = {n: 0.0 for n in nodes}
        for u, v in edge_list:
            msgs[v] += pr[u] / out[u]
        pr = {
            n: ((1 - damping) if n == seed else 0.0) + damping * msgs[n]
            for n in nodes
        }
    assert set(ppr) == set(pr)
    for n in pr:
        assert ppr[n] == pytest.approx(pr[n], abs=1e-12)
    assert ppr[10] == 0.0 and ppr[11] == 0.0  # unreachable from the seed
    uni = {
        r["node"]: r["pagerank"]
        for r in pagerank(edges, iterations=4).collect()
    }
    assert uni[10] > 0.0  # uniform teleport reaches every node


def test_hits_matches_hand_computed_two_iterations(spark):
    """3-edge bipartite graph, 2 iterations, hand-computed closed form:
    a1 = 5/sqrt(34), a2 = 3/sqrt(34); hubs keep unit L2 norm."""
    import math

    from amazon_kinesis_analytics_streaming_etl_spark.operators.graph import hits

    edges = spark.createDataFrame(
        [(10, 1), (10, 2), (20, 1)], "src long, dst long"
    )
    rows = {r["node"]: r for r in hits(edges, iterations=2).collect()}
    assert abs(rows[1]["authority"] - 5 / math.sqrt(34)) < 1e-12
    assert abs(rows[2]["authority"] - 3 / math.sqrt(34)) < 1e-12
    # hub scores L2-normalized; authority side too
    h2 = sum(rows[n]["hub"] ** 2 for n in (10, 20))
    a2 = sum(rows[n]["authority"] ** 2 for n in (1, 2))
    assert abs(h2 - 1.0) < 1e-12 and abs(a2 - 1.0) < 1e-12
    # sources have no in-edges -> authority 0; sinks no out-edges -> hub 0
    assert rows[10]["authority"] == 0.0 and rows[1]["hub"] == 0.0


def test_hits_rejects_zero_iterations(spark):
    import pytest as _pytest

    from amazon_kinesis_analytics_streaming_etl_spark.operators.graph import hits

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with _pytest.raises(ValueError, match="iterations"):
        hits(edges, iterations=0)
