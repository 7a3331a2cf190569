"""applyInPandasWithState accumulation across micro-batches; IVF-ANN
recall; sign-bit-blocked embedding dedup."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from pyspark.sql import functions as F

from amazon_kinesis_analytics_streaming_etl_spark.schemas import TESTDATA_SCHEMAS
from amazon_kinesis_analytics_streaming_etl_spark.streaming.stateful import (
    running_totals_per_key,
)
from amazon_kinesis_analytics_streaming_etl_spark.streaming.windows import (
    replay_to_memory,
)


def _ev(eid, ts, user, value):
    return (eid, ts, user, "click", value, "{}")


def test_stateful_running_totals_accumulate_across_batches(spark, tmp_path):
    """Two availableNow runs over one checkpoint: state (per-key count and
    sum) must carry over the restart — the applyInPandasWithState state
    store behaves like any engine-managed state."""
    p = str(tmp_path / "ev")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(p)
    t0 = dt.datetime(2024, 1, 1, 10, 0)

    def run_once():
        stream = (
            spark.readStream.schema(TESTDATA_SCHEMAS["events"])
            .format("parquet")
            .load(p + "/part*")
        )
        q = (
            running_totals_per_key(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    df1 = spark.createDataFrame(
        [_ev(1, t0, 7, 1.5), _ev(2, t0, 7, 2.5), _ev(3, t0, 8, 1.0)],
        TESTDATA_SCHEMAS["events"],
    )
    df1.coalesce(1).write.mode("append").parquet(p)
    run_once()
    df2 = spark.createDataFrame([_ev(4, t0, 7, 4.0)], TESTDATA_SCHEMAS["events"])
    df2.coalesce(1).write.mode("append").parquet(p)
    run_once()

    out = spark.read.parquet(sink).collect()
    latest = {}
    for r in out:
        latest[r.user_id] = max(
            latest.get(r.user_id, (0, 0.0)), (r.n_events, r.total_value)
        )
    assert latest[7] == (3, 8.0)  # 2 events batch1 + 1 event batch2
    assert latest[8] == (1, 1.0)


def test_ivf_topk_recall_vs_brute_force(spark):
    from amazon_kinesis_analytics_streaming_etl_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = [float(x) for x in emb.where(F.col("vec_id") == 0).head().embedding]
    exact = [r.vec_id for r in brute_force_topk(emb, q, k=10).collect()]
    approx = ivf_topk(emb, q, k=10, nlist=16, nprobe=8).collect()
    assert approx[0].vec_id == 0  # self-retrieval through its own list
    got = [r.vec_id for r in approx]
    # probing half the lists must recover a meaningful share of the true top-10
    assert len(set(got) & set(exact)) >= 3
    # every reported score is the exact cosine (verified against brute force)
    exact_all = {r.vec_id: r.cos_sim for r in brute_force_topk(emb, q, k=500).collect()}
    for r in approx:
        assert r.cos_sim == pytest.approx(exact_all[r.vec_id], abs=1e-6)


def test_embedding_lsh_blocking_collides_identical_vectors(spark):
    from amazon_kinesis_analytics_streaming_etl_spark.functions.vectors import sign_bits
    from amazon_kinesis_analytics_streaming_etl_spark.operators.dedup import (
        embedding_near_dup_pairs,
    )
    from amazon_kinesis_analytics_streaming_etl_spark.plans.llm import LSH_PLANES

    base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(50)
    # plant an exact duplicate of vec_id 0 with a new id
    dup = base.where(F.col("vec_id") == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"
    )
    df = base.unionByName(dup).withColumn(
        "_bucket", sign_bits(F.col("embedding"), LSH_PLANES)
    )
    pairs = embedding_near_dup_pairs(df, block_col="_bucket", threshold=0.99).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(0, 100000)}
    assert pairs[0].cos_sim == pytest.approx(1.0, abs=1e-6)


def test_state_v2_gated_or_matches_v1(spark):
    """transformWithStateInPandas (state v2): runs and matches the v1
    operator where protobuf is available; otherwise raises the documented
    NotImplementedError (this container lacks protobuf)."""
    import pytest

    from amazon_kinesis_analytics_streaming_etl_spark.schemas import load_events_stream
    from amazon_kinesis_analytics_streaming_etl_spark.streaming.stateful import (
        running_totals_per_key_v2,
        state_v2_available,
    )
    from amazon_kinesis_analytics_streaming_etl_spark.streaming.windows import (
        replay_to_memory,
    )
    from tests.conftest import SF_SMOKE

    stream = load_events_stream(spark, SF_SMOKE)
    if not state_v2_available():
        with pytest.raises(NotImplementedError):
            running_totals_per_key_v2(stream)
        return
    out = replay_to_memory(
        spark, running_totals_per_key_v2(stream), output_mode="append"
    )
    batch = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    assert out.count() == batch.select("user_id").distinct().count()


def test_embedding_near_dup_unblocked_call_auto_blocks(spark):
    """block_col=None must NOT silently run an all-pairs self-join: an
    axis-sign LSH bucket is derived automatically (r1 verdict foot-gun).
    Identical vectors share every sign bit, so true dups still pair."""
    from amazon_kinesis_analytics_streaming_etl_spark.operators.dedup import (
        embedding_near_dup_pairs,
    )

    base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(40)
    dup = base.where(F.col("vec_id") == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"
    )
    df = base.unionByName(dup)

    auto = {(r.id_a, r.id_b) for r in
            embedding_near_dup_pairs(df, threshold=0.99).collect()}
    assert auto == {(0, 100000)}

    # explicit opt-in is the only way to get the quadratic form; the
    # auto-blocked result is a subset of it
    allp = {(r.id_a, r.id_b) for r in
            embedding_near_dup_pairs(df, threshold=0.99, allow_all_pairs=True).collect()}
    assert auto <= allp


def _planted_near_dup_corpus(spark, n_base=120, n_dups=40, dim=64, noise=0.25):
    """Deterministic corpus: random unit-ish vectors plus noisy copies of
    the first n_dups (cos(base, copy) ~ 0.97 at noise=0.25) — the regime
    embedding dedup actually targets."""
    import random

    rng = random.Random(7)
    rows = []
    base_vecs = []
    for i in range(n_base):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        base_vecs.append(v)
        rows.append((i, [float(x) for x in v]))
    for j in range(n_dups):
        v = [x + rng.gauss(0.0, noise) for x in base_vecs[j]]
        rows.append((10000 + j, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_multitable_lsh_pairs_amplify_recall_over_single_table(spark):
    """L-tables banding must recover nearly all planted near-dup pairs
    where a single 8-bit exact-signature block structurally cannot
    (per-table collision p^8 ~ 0.3 at cos 0.97's angle ~ 14deg... measured
    here, not assumed): the assertion pins multi >= 0.9 recall AND
    multi > single, the amplification actually doing work."""
    from amazon_kinesis_analytics_streaming_etl_spark.functions.vectors import (
        lsh_tables,
        sign_bits,
    )
    from amazon_kinesis_analytics_streaming_etl_spark.operators.dedup import (
        embedding_near_dup_pairs,
        embedding_near_dup_pairs_multitable,
    )

    df = _planted_near_dup_corpus(spark)
    truth = {(j, 10000 + j) for j in range(40)}

    tables = lsh_tables(dim=64, n_tables=8, n_bits=8, seed=11)
    multi = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs_multitable(
            df, tables, threshold=0.9
        ).collect()
    }
    single_block = sign_bits(F.col("embedding"), tables[0])
    single = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(
            df.withColumn("_b", single_block), block_col="_b", threshold=0.9
        ).collect()
    }
    # precision 1.0 by construction (exact verify) — no false pairs
    assert multi <= truth | {(a, b) for a in range(120) for b in range(120)}
    multi_recall = len(multi & truth) / len(truth)
    single_recall = len(single & truth) / len(truth)
    assert multi_recall >= 0.9, (multi_recall, single_recall)
    assert multi_recall > single_recall, (multi_recall, single_recall)


def test_multitable_lsh_topk_beats_single_table(spark):
    """Top-k through L tables must recover the planted near-dup of the
    query vector and strictly more of the exact top-10 than one table."""
    from amazon_kinesis_analytics_streaming_etl_spark.functions.vectors import lsh_tables
    from amazon_kinesis_analytics_streaming_etl_spark.operators.similarity import (
        brute_force_topk,
        lsh_topk,
        lsh_topk_multitable,
    )

    df = _planted_near_dup_corpus(spark)
    q = [float(x) for x in df.where(F.col("vec_id") == 0).head().embedding]
    exact = [r.vec_id for r in brute_force_topk(df, q, k=10).collect()]
    tables = lsh_tables(dim=64, n_tables=8, n_bits=8, seed=11)
    multi = [
        r.vec_id
        for r in lsh_topk_multitable(df, q, tables, k=10, probe_hamming=1).collect()
    ]
    single = [
        r.vec_id for r in lsh_topk(df, q, tables[0], k=10, probe_hamming=1).collect()
    ]
    assert 0 in multi and 10000 in multi  # self + its planted near-dup
    assert len(set(multi) & set(exact)) >= len(set(single) & set(exact))
    assert len(set(multi) & set(exact)) >= 2


def test_ivf_trained_centroids_deterministic_and_reduce_distortion(spark):
    """Lloyd's-trained centroids must (a) be bit-deterministic across
    runs (no RNG in the loop), (b) improve the objective Lloyd's actually
    optimizes — mean assignment similarity (cosine to the assigned
    centroid) — vs the first-nlist-ids init, and (c) keep query recall
    usable (self + a floor of the exact top-10). Query-specific recall at
    fixed nprobe can wobble +-1 on a tiny corpus, so the objective, not
    per-query recall, is the training assertion."""
    from amazon_kinesis_analytics_streaming_etl_spark.functions.vectors import cosine
    from amazon_kinesis_analytics_streaming_etl_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        ivf_train_centroids,
    )

    df = _planted_near_dup_corpus(spark)
    q = [float(x) for x in df.where(F.col("vec_id") == 0).head().embedding]
    exact = {r.vec_id for r in brute_force_topk(df, q, k=10).collect()}

    c1 = ivf_train_centroids(df, nlist=8, iters=2)
    c2 = ivf_train_centroids(df, nlist=8, iters=2)
    assert c1 == c2  # deterministic: no RNG anywhere in the loop

    def mean_assign_sim(centroids):
        cent_arr = F.array(
            *[F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
        )
        sims = F.transform(cent_arr, lambda c: cosine(F.col("embedding"), c))
        return df.select(F.array_max(sims).alias("s")).agg(F.avg("s")).head()[0]

    init = [
        [float(x) for x in r[0]]
        for r in df.orderBy("vec_id").limit(8).select("embedding").collect()
    ]
    assert mean_assign_sim(c1) > mean_assign_sim(init)

    trained = {
        r.vec_id
        for r in ivf_topk(df, q, k=10, nlist=8, nprobe=2, centroids=c1).collect()
    }
    assert 0 in trained  # self-retrieval survives training
    assert len(trained & exact) >= 4  # recall floor at nprobe=1/4 of lists


def test_gate_sample_mod_slices_exact_twin(spark, monkeypatch):
    """SPARK_GRAFT_GATE_SAMPLE_MOD=m runs the approx-gates' exact twin on
    the deterministic md5 doc-slice: the gate stays green (minhash recall
    is 1.0, so any slice of exact pairs is still fully covered), the
    schema is identical to full-verification mode, and the sampled
    exact-pair count is a subset of the full count."""
    from amazon_kinesis_analytics_streaming_etl_spark.plans.catalog import QUERIES

    sf = "/root/testdata/sf0.001"
    fn = QUERIES["dedup_minhash_lsh"]

    monkeypatch.delenv("SPARK_GRAFT_GATE_SAMPLE_MOD", raising=False)
    full = fn(spark, sf).collect()[0].asDict()
    monkeypatch.setenv("SPARK_GRAFT_GATE_SAMPLE_MOD", "4")
    sampled = fn(spark, sf).collect()[0].asDict()

    assert set(full) == set(sampled)
    assert full["recall_ok"] and full["lsh_subset_of_exact"]
    assert sampled["recall_ok"] and sampled["lsh_subset_of_exact"]
    assert 0 <= sampled["exact_pairs"] <= full["exact_pairs"]


def test_stateful_running_totals_on_rocksdb_state_store(spark, tmp_path):
    """Same stateful op, RocksDB state store provider — the production
    100 TB state backend (state lives off-heap/on-disk per task,
    incremental snapshots into the checkpoint; the HDFS-backed default
    holds the whole store in executor memory). Conf is set per-query via
    the session and restored after; state accumulates across a restart
    exactly as on the default provider."""
    provider = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    p = str(tmp_path / "ev")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(p)
    t0 = dt.datetime(2024, 1, 1, 10, 0)
    try:
        spark.conf.set(key, provider)

        def run_once():
            stream = (
                spark.readStream.schema(TESTDATA_SCHEMAS["events"])
                .format("parquet")
                .load(p + "/part*")
            )
            q = (
                running_totals_per_key(stream)
                .writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        spark.createDataFrame(
            [_ev(1, t0, 7, 1.5), _ev(2, t0, 7, 2.5), _ev(3, t0, 8, 1.0)],
            TESTDATA_SCHEMAS["events"],
        ).coalesce(1).write.mode("append").parquet(p)
        run_once()
        spark.createDataFrame(
            [_ev(4, t0, 7, 4.0)], TESTDATA_SCHEMAS["events"]
        ).coalesce(1).write.mode("append").parquet(p)
        run_once()

        out = spark.read.parquet(sink).collect()
        latest = {}
        for r in out:
            latest[r.user_id] = max(
                latest.get(r.user_id, (0, 0.0)), (r.n_events, r.total_value)
            )
        assert latest[7] == (3, 8.0)
        assert latest[8] == (1, 1.0)
        # the checkpoint really used RocksDB (per-operator state dirs
        # contain RocksDB snapshot artifacts, not the delta/snapshot
        # files of the HDFS-backed provider)
        state_root = os.path.join(ckpt, "state")
        names = []
        for dirpath, _d, files in os.walk(state_root):
            names += files
        assert any(n.endswith((".zip", ".changelog")) for n in names), names
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def test_ann_recall_eval_matches_numpy_reference(spark):
    """ann_recall_eval's recall@k / nDCG@k must equal a from-scratch
    numpy computation of the same definitions: exact ranking by
    (rounded cosine desc, id asc) excluding self; LSH candidacy =
    signature Hamming distance <= probe_hamming; approx ranking among
    candidates only; binary relevance = membership in the exact top-k;
    IDCG = sum 1/log2(r+1)."""
    import math

    import numpy as np

    from amazon_kinesis_analytics_streaming_etl_spark.operators.similarity import (
        ann_recall_eval,
    )

    rng = np.random.default_rng(3)
    n, dim, k, nbits = 120, 16, 5, 6
    M = rng.normal(size=(n, dim))
    planes = rng.normal(size=(nbits, dim))
    df = spark.createDataFrame(
        [(i, [float(x) for x in M[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    got = {
        r.qid: (r.recall_at_k, r.ndcg_at_k, r.n_candidates, r.exact_topk_id_sum)
        for r in ann_recall_eval(
            df,
            [[float(x) for x in p] for p in planes],
            k=k,
            query_pred=(F.col("vec_id") % 10) == 0,
            probe_hamming=1,
        ).collect()
    }

    # numpy reference over the float32-roundtripped vectors (the table
    # stores array<float>)
    Mf = M.astype(np.float32).astype(np.float64)
    nrm = np.linalg.norm(Mf, axis=1)
    C = (Mf @ Mf.T) / np.outer(nrm, nrm)
    Cr = np.sign(C) * np.floor(np.abs(C) * 1e6 + 0.5) / 1e6
    sigs = ((Mf @ planes.astype(np.float32).astype(np.float64).T) >= 0) @ (
        1 << np.arange(nbits)
    )
    idcg = sum(1.0 / math.log2(r + 1) for r in range(1, k + 1))
    for q in range(0, n, 10):
        order = sorted(
            (i for i in range(n) if i != q), key=lambda i: (-Cr[q, i], i)
        )
        exact = set(order[:k])
        cand = [
            i
            for i in order
            if bin(int(sigs[q]) ^ int(sigs[i])).count("1") <= 1
        ]
        approx = cand[:k]
        recall = len(exact & set(approx)) / k
        ndcg = (
            sum(
                1.0 / math.log2(r + 2)
                for r, i in enumerate(approx)
                if i in exact
            )
            / idcg
        )
        g_recall, g_ndcg, g_cands, g_idsum = got[q]
        assert abs(g_recall - recall) < 1e-9, (q, g_recall, recall)
        assert abs(g_ndcg - ndcg) < 1e-9, (q, g_ndcg, ndcg)
        assert g_cands == len(cand), (q, g_cands, len(cand))
        assert g_idsum == sum(exact), (q, g_idsum, sum(exact))


def test_streaming_tdigest_state_accumulates_and_stays_bounded(spark, tmp_path):
    """Two availableNow runs over one checkpoint: the per-key digest
    carries across the restart (final n covers both batches; estimated
    median reflects the UNION of values, which batch-2-only state could
    not produce), state round-trips through the JVM state store
    (plain-float contract), and estimates stay within 2% rank error of
    the exact union."""
    import numpy as np

    from amazon_kinesis_analytics_streaming_etl_spark.streaming.stateful import (
        streaming_percentiles_per_key,
    )

    p = str(tmp_path / "ev")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(p)
    t0 = dt.datetime(2024, 1, 1, 10, 0)
    rng = np.random.default_rng(3)

    def run_once():
        stream = (
            spark.readStream.schema(TESTDATA_SCHEMAS["events"])
            .format("parquet")
            .load(p + "/part*")
        )
        q = (
            streaming_percentiles_per_key(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # batch 1: low values; batch 2: high values — the union's median sits
    # between the two batch medians, so state loss is detectable
    vals1 = rng.uniform(0.0, 10.0, 400)
    vals2 = rng.uniform(90.0, 100.0, 400)
    df1 = spark.createDataFrame(
        [_ev(i, t0, 7, float(v)) for i, v in enumerate(vals1)],
        TESTDATA_SCHEMAS["events"],
    )
    df1.coalesce(1).write.mode("append").parquet(p)
    run_once()
    df2 = spark.createDataFrame(
        [_ev(1000 + i, t0, 7, float(v)) for i, v in enumerate(vals2)],
        TESTDATA_SCHEMAS["events"],
    )
    df2.coalesce(1).write.mode("append").parquet(p)
    run_once()

    rows = spark.read.parquet(sink).collect()
    final = max((r for r in rows if r.event_type == "click"), key=lambda r: r.n)
    union = np.concatenate([vals1, vals2])
    assert final.n == len(union)
    for est, q in ((final.est_p50, 0.5), (final.est_p95, 0.95)):
        rank = float((union < est).mean())
        assert abs(rank - q) < 0.02, (q, rank, est)
