"""Ground-truth tests for the LLM-pipeline operators: exact Jaccard vs a
pure-Python reference, MinHash-LSH recall, SimHash sensitivity, embedding
similarity vs numpy, LSH-ANN sanity."""

from __future__ import annotations

import itertools
import random

import pytest

from pyspark.sql import functions as F

from amazon_kinesis_analytics_streaming_etl_spark.operators.dedup import (
    dedup_keep_first,
    exact_dedup,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
)
from amazon_kinesis_analytics_streaming_etl_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk,
)

WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu xi".split()


def _mk_docs(n=60, seed=7, dup_every=5):
    rng = random.Random(seed)
    docs = []
    for i in range(n):
        if i % dup_every == 0 and i > 0:
            base = docs[i - 1][1].split()
            # perturb one token -> high-jaccard near-dup
            j = rng.randrange(len(base))
            base = base[:j] + [rng.choice(WORDS)] + base[j + 1 :]
            docs.append((i, " ".join(base)))
        else:
            docs.append((i, " ".join(rng.choice(WORDS) for _ in range(30))))
    return docs


def _py_jaccard_pairs(docs, k=3, threshold=0.5):
    def shingles(t):
        toks = t.lower().split()
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    sh = {i: shingles(t) for i, t in docs}
    out = {}
    for (a, sa), (b, sb) in itertools.combinations(sh.items(), 2):
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if j >= threshold:
            out[(min(a, b), max(a, b))] = round(j, 6)
    return out


def test_ngram_jaccard_matches_python_reference(spark):
    docs = _mk_docs()
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(df, threshold=0.5).collect()
    }
    want = _py_jaccard_pairs(docs, threshold=0.5)
    assert set(got) == set(want)
    for pair, j in want.items():
        assert got[pair] == pytest.approx(j, abs=1e-6)


def test_minhash_lsh_recall_on_near_dups(spark):
    docs = _mk_docs(n=80)
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    truth = _py_jaccard_pairs(docs, threshold=0.7)
    assert truth, "fixture should contain high-similarity pairs"
    got = {
        (r.id_a, r.id_b)
        for r in minhash_near_dup_pairs(df, threshold=0.5).collect()
    }
    # Every verified pair must truly exceed the threshold (no false
    # positives — the verify stage recomputes exact jaccard)...
    exact_05 = set(_py_jaccard_pairs(docs, threshold=0.5))
    assert got <= exact_05
    # ...and LSH with 16 bands x 4 rows catches essentially all j>=0.7 pairs.
    recall = len(got & set(truth)) / len(truth)
    assert recall >= 0.9


def test_simhash_flags_minor_edits_not_random_docs(spark):
    # Wide vocabulary so unrelated docs share few tokens (simhash works on
    # token sets; a tiny vocab makes every doc's set identical).
    vocab = [f"w{i}" for i in range(1000)]
    rng = random.Random(3)
    base = [rng.choice(vocab) for _ in range(80)]
    edited = list(base)
    edited[10] = "edited"
    other = [rng.choice(vocab) for _ in range(80)]
    df = spark.createDataFrame(
        [(0, " ".join(base)), (1, " ".join(edited)), (2, " ".join(other))],
        ["doc_id", "text"],
    )
    pairs = {(r.id_a, r.id_b): r.hamming for r in simhash_near_dup_pairs(df, max_hamming=10).collect()}
    assert (0, 1) in pairs  # single-token edit stays within radius
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_exact_dedup_keeps_lowest_id(spark):
    df = spark.createDataFrame(
        [(5, "Same  Text"), (2, "same text"), (9, "other text")],
        ["doc_id", "text"],
    )
    rows = {r.keep_id: r.dup_count for r in exact_dedup(df).collect()}
    # normalization: lowercase + whitespace collapse -> 2 and 5 are dups
    assert rows == {2: 2, 9: 1}


def test_dedup_keep_first_window(spark):
    df = spark.createDataFrame(
        [("k1", 3, "c"), ("k1", 1, "a"), ("k2", 2, "b")], ["k", "seq", "v"]
    )
    out = {(r.k, r.seq) for r in dedup_keep_first(df, ["k"], "seq").collect()}
    assert out == {("k1", 1), ("k2", 2)}


def test_brute_force_topk_matches_numpy(spark):
    import numpy as np

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = emb.collect()
    q = [float(x) for x in rows[0].embedding]
    got = brute_force_topk(emb, q, k=5).collect()

    M = np.array([[float(x) for x in r.embedding] for r in rows])
    qv = np.array(q)
    cos = (M @ qv) / (np.linalg.norm(M, axis=1) * np.linalg.norm(qv))
    order = sorted(
        range(len(rows)), key=lambda i: (-round(float(cos[i]), 6), rows[i].vec_id)
    )[:5]
    want = [rows[i].vec_id for i in order]
    assert [r.vec_id for r in got] == want
    for r, i in zip(got, order):
        assert r.cos_sim == pytest.approx(float(cos[i]), abs=1e-5)


def test_lsh_topk_is_subset_of_bucket_and_finds_self(spark):
    from amazon_kinesis_analytics_streaming_etl_spark.plans.llm import LSH_PLANES

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = [float(x) for x in emb.where(F.col("vec_id") == 0).head().embedding]
    got = lsh_topk(emb, q, LSH_PLANES, k=10, probe_hamming=1).collect()
    assert got, "probe buckets must not be empty"
    # the query vector itself lives in the probed bucket set -> rank 1
    assert got[0].vec_id == 0 and got[0].cos_sim == pytest.approx(1.0, abs=1e-6)
    # approximate results are a subset of the exact ranking's value range
    exact = brute_force_topk(emb, q, k=500).collect()
    exact_scores = {r.vec_id: r.cos_sim for r in exact}
    for r in got:
        assert r.cos_sim == pytest.approx(exact_scores[r.vec_id], abs=1e-6)


def test_dup_clusters_connected_components(spark):
    """Chain 1-2-3, triangle 10-11-12 (with redundant edge), pair 20-21:
    every node labeled with its component's min id; diameter-3 chain
    proves multi-round propagation."""
    from amazon_kinesis_analytics_streaming_etl_spark.operators.dedup import (
        dup_clusters,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "id_a long, id_b long",
    )
    got = {r["doc_id"]: r["cluster_id"] for r in dup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


# --- storage hygiene --------------------------------------------------------


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


@pytest.mark.parametrize(
    "op",
    ["ngram", "minhash", "simhash", "embedding_multitable"],
)
def test_pair_operators_release_cached_intermediates(spark, op):
    """The pair operators persist signature/shingle tables internally; the
    storage contract (_checkpoint_released) is that after the call returns
    only the materialized result itself may remain cached — intermediates
    are unpersisted deterministically, not left to session teardown."""
    docs = spark.createDataFrame(_mk_docs(30), ["doc_id", "text"])
    before = _n_persistent(spark)
    if op == "ngram":
        res = ngram_jaccard_pairs(docs, threshold=0.5)
    elif op == "minhash":
        res = minhash_near_dup_pairs(docs, threshold=0.5)
    elif op == "simhash":
        res = simhash_near_dup_pairs(docs, max_hamming=10)
    else:
        from amazon_kinesis_analytics_streaming_etl_spark.functions.vectors import (
            lsh_tables,
        )
        from amazon_kinesis_analytics_streaming_etl_spark.operators.dedup import (
            embedding_near_dup_pairs_multitable,
        )

        rng = random.Random(3)
        rows = [(i, [rng.gauss(0.0, 1.0) for _ in range(16)]) for i in range(40)]
        emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
        res = embedding_near_dup_pairs_multitable(
            emb, lsh_tables(16, 4, 8), threshold=0.9
        )
    res.collect()
    after = _n_persistent(spark)
    # <=1 new entry: the localCheckpoint of the result itself (freed by
    # ContextCleaner when `res` is dropped); intermediates are gone.
    assert after - before <= 1
