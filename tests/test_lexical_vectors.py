"""Ground-truth tests for the lexical-retrieval and vector-storage
families: the Spark results are recomputed with plain Python/numpy on
the same (small) inputs — independent of the DuckDB oracle gate, same
pattern as the MinHash-recall and as-of-property tests.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pytest

from tests.conftest import SF_SMOKE

K1, B = 1.2, 0.75
TERMS = ("spark", "vector", "merge")


def _tokens(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


@pytest.fixture(scope="module")
def docs_pd(spark):
    return (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .toPandas()
    )


def test_bm25_matches_pure_python(spark, docs_pd):
    from amazon_kinesis_analytics_streaming_etl_spark.plans.lexical import (
        bm25_retrieval,
    )

    toks = {r.doc_id: _tokens(r.text) for r in docs_pd.itertuples()}
    n = len(toks)
    dls = {d: float(len(t)) for d, t in toks.items()}
    avgdl = sum(dls.values()) / n
    dfs = {q: sum(1 for t in toks.values() if q in t) for q in TERMS}

    def score(d):
        s = 0.0
        for q in TERMS:
            tf = float(toks[d].count(q))
            if tf == 0:
                continue
            idf = math.log((n - dfs[q] + 0.5) / (dfs[q] + 0.5) + 1)
            s += idf * tf * (K1 + 1) / (tf + K1 * (1 - B + B * dls[d] / avgdl))
        return round(s, 6)

    expected = sorted(
        ((score(d), d) for d in toks), key=lambda x: (-x[0], x[1])
    )[:10]
    got = [
        (r.bm25, r.doc_id)
        for r in bm25_retrieval(spark, SF_SMOKE).collect()
    ]
    assert got == [(s, d) for s, d in expected]


def test_tfidf_top_keywords_matches_pure_python(spark, docs_pd):
    from amazon_kinesis_analytics_streaming_etl_spark.plans.lexical import (
        tfidf_top_keywords,
    )

    toks = {r.doc_id: _tokens(r.text) for r in docs_pd.itertuples()}
    n = float(len(toks))
    dfs: dict[str, int] = {}
    for t in toks.values():
        for tok in set(t):
            dfs[tok] = dfs.get(tok, 0) + 1
    expected = {}
    for d, t in toks.items():
        scores = {}
        for tok in set(t):
            scores[tok] = round(t.count(tok) * math.log(n / dfs[tok]), 6)
        top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        expected[d] = top
    out = tfidf_top_keywords(spark, SF_SMOKE).collect()
    got: dict[int, list] = {}
    for r in out:
        got.setdefault(r.doc_id, []).append((r.keyword, r.score))
    assert got == expected


def test_udtf_chunks_cover_every_token(spark):
    from amazon_kinesis_analytics_streaming_etl_spark.plans.lexical import (
        udtf_chunk_documents,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").toPandas()
    out = udtf_chunk_documents(spark, SF_SMOKE).toPandas()
    # rebuilding each doc from its ordered chunks gives back the text
    rebuilt = (
        out.sort_values(["doc_id", "chunk_idx"])
        .groupby("doc_id")["chunk"]
        .apply(" ".join)
    )
    for r in docs.itertuples():
        assert rebuilt[r.doc_id] == r.text
    assert (out.n_tokens <= 25).all() and (out.n_tokens >= 1).all()
    # every chunk except a doc's last is exactly full
    last = out.groupby("doc_id")["chunk_idx"].transform("max")
    assert (out.loc[out.chunk_idx < last, "n_tokens"] == 25).all()


def test_int8_quantization_matches_numpy(spark):
    from amazon_kinesis_analytics_streaming_etl_spark.plans.vectors import (
        embedding_quantize_int8,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").toPandas()
    out = embedding_quantize_int8(spark, SF_SMOKE).toPandas().set_index("vec_id")
    for r in emb.itertuples():
        x = np.asarray(r.embedding, dtype=np.float64)
        scale = max(np.abs(x).max(), 1e-12) / 127.0
        q = np.clip(np.floor(x / scale + 0.5), -127.0, 127.0)
        err = np.abs(x - q * scale)
        row = out.loc[r.vec_id]
        assert row["scale"] == pytest.approx(scale, abs=1.5e-6)
        assert row["mean_abs_err"] == pytest.approx(err.mean(), abs=1.5e-6)
        assert row["max_abs_err"] == pytest.approx(err.max(), abs=1.5e-6)
        # int8 quantization must stay within half a quantization step
        # (+5e-7 slack: the reported err is rounded to 6 dp, which can
        # push a value sitting at the bound just past scale/2)
        assert row["max_abs_err"] <= scale / 2 + 5.1e-7


def test_centroid_cohesion_matches_numpy(spark):
    from amazon_kinesis_analytics_streaming_etl_spark.plans.vectors import (
        centroid_cohesion,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").toPandas()
    out = centroid_cohesion(spark, SF_SMOKE).toPandas().set_index("label")
    for label, grp in emb.groupby("label"):
        m = np.vstack([np.asarray(v, dtype=np.float64) for v in grp.embedding])
        c = m.mean(axis=0)
        cos = (m @ c) / (np.linalg.norm(m, axis=1) * np.linalg.norm(c))
        row = out.loc[label]
        assert row["n_vectors"] == len(grp)
        assert row["avg_cosine"] == pytest.approx(cos.mean(), abs=1.5e-5)
        assert row["min_cosine"] == pytest.approx(cos.min(), abs=1.5e-5)


def test_embedding_matryoshka_pairs_and_drift(spark):
    from amazon_kinesis_analytics_streaming_etl_spark.plans.catalog import QUERIES

    rows = QUERIES["embedding_matryoshka"](spark, "/root/testdata/sf0.001").collect()
    assert rows  # deterministic (vec_id, vec_id+N/2) pairing is non-empty
    for r in rows:
        assert -1.0001 <= r.cos_full <= 1.0001
        assert -1.0001 <= r.cos_trunc16 <= 1.0001
        assert abs(r.drift - abs(r.cos_full - r.cos_trunc16)) < 2e-6


def test_embedding_spectrum_matches_direct_numpy_covariance(spark):
    """Full recompute: covariance, trace, Frobenius norm, and the
    participation-ratio effective rank from the collected vectors must
    match the distributed Gram-partials path exactly; effective rank is
    bounded by (0, d]."""
    import numpy as np

    from amazon_kinesis_analytics_streaming_etl_spark.plans.vectors import (
        embedding_spectrum,
    )
    from conftest import SF_SMOKE

    row = embedding_spectrum(spark, SF_SMOKE).collect()[0]
    X = np.stack(
        [
            np.array(r.embedding, dtype=np.float64)
            for r in spark.read.parquet(
                f"{SF_SMOKE}/embeddings.parquet"
            ).collect()
        ]
    )
    C = np.cov(X, rowvar=False, bias=True)
    trace = float(np.trace(C))
    frob2 = float((C * C).sum())
    assert row.n == len(X)
    assert row.trace == round(float(np.float32(trace)) + 1e-8, 4)
    assert row.effective_rank == round(
        float(np.float32(trace * trace / frob2)) + 1e-8, 2
    )
    assert 0 < row.effective_rank <= X.shape[1]
    assert row.eig_identities_ok
