"""Lexical retrieval / keyword ops over the documents corpus (round 2):
TF-IDF keyword extraction, BM25 ranked retrieval, and UDTF-based
document chunking — the lexical complement to the embedding-based
similarity family (operators/similarity.py).

Tokenization contract shared with the DuckDB oracles: lowercase, split
on ``[^a-z0-9]+``, drop empties — written as the SAME regex in both
engines so token arrays are byte-identical.

Scale posture: BM25 never explodes tokens (per-term counts are narrow
array ops; corpus stats are a 1-row broadcast); TF-IDF explodes once
into a (doc, token) aggregate and joins the doc-frequency table on the
token key (broadcastable at real-world vocabulary sizes); the UDTF runs
one Arrow-batched generator pass, shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..schemas import read_sf_parquet
from .relational import register

_TOKEN_SPLIT = "[^a-z0-9]+"

# BM25 free parameters (the standard Robertson defaults).
_K1 = 1.2
_B = 0.75
_BM25_TERMS = ("spark", "vector", "merge")


def _tokens(text_col):
    """Shared Spark-side tokenizer: identical semantics to the oracle's
    ``regexp_split_to_array(lower(text), '[^a-z0-9]+')`` + empty filter."""
    return F.filter(
        F.split(F.lower(text_col), _TOKEN_SPLIT), lambda t: F.length(t) > 0
    )


# --------------------------------------------------------------------------
# TF-IDF top keywords per document
# --------------------------------------------------------------------------

@register(
    "tfidf_top_keywords",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                t -> len(t) > 0)) AS tok
      FROM documents
    ), tf AS (
      SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2
    ), df AS (
      SELECT tok, count(*) AS df FROM tf GROUP BY 1
    ), n AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.tok,
             round(tf.tf * ln(n_docs / df.df), 6) AS score
      FROM tf JOIN df USING (tok), n
    )
    SELECT doc_id, tok AS keyword, score, CAST(rn AS INT) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                       ORDER BY score DESC, tok) AS rn
          FROM scored)
    WHERE rn <= 3 ORDER BY doc_id, rn
    """,
)
def tfidf_top_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF keywords per document (idf = ln(N/df)).

    Ranking happens on the ROUNDED score (6 dp) with the token as the
    tie-break — last-ulp ln() differences between engines cannot flip
    ranks. Plan: one explode into a (doc, token) hash aggregate, a
    token-keyed doc-frequency aggregate off that, a join on token (the
    df table is vocabulary-sized — broadcastable in practice), and a
    per-doc top-3 window. No all-pairs anything; everything keys on
    doc_id or token."""
    docs = read_sf_parquet(spark, sf_dir, "documents")
    n_docs = docs.agg(F.count("*").cast("double").alias("n_docs"))
    tf = (
        docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("tok").agg(F.count("*").alias("df"))
    scored = (
        tf.join(df, "tok")
        .crossJoin(n_docs)
        .select(
            "doc_id",
            "tok",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "tok")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 3)
        .select("doc_id", F.col("tok").alias("keyword"), "score", "rank")
        .orderBy("doc_id", "rank")
    )


# --------------------------------------------------------------------------
# BM25 ranked retrieval (fixed query terms)
# --------------------------------------------------------------------------

def _bm25_oracle() -> str:
    tf_cols = ",\n             ".join(
        f"CAST(len(list_filter(toks, x -> x = '{t}')) AS DOUBLE) AS tf{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    df_cols = ",\n             ".join(
        f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df{i}"
        for i in range(len(_BM25_TERMS))
    )
    score_terms = "\n             + ".join(
        f"CASE WHEN tf{i} > 0 THEN ln((n_docs - df{i} + 0.5) / (df{i} + 0.5) + 1)"
        f" * tf{i} * ({_K1} + 1)"
        f" / (tf{i} + {_K1} * (1 - {_B} + {_B} * dl / avgdl)) ELSE 0 END"
        for i in range(len(_BM25_TERMS))
    )
    return f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> len(x) > 0) AS toks
      FROM documents
    ), d AS (
      SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
             {tf_cols}
      FROM t
    ), s AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_docs, CAST(avg(dl) AS DOUBLE) AS avgdl,
             {df_cols}
      FROM d
    )
    SELECT doc_id, round({score_terms}, 6) AS bm25
    FROM d, s
    ORDER BY bm25 DESC, doc_id LIMIT 10
    """


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-corpus (doc_id, bm25) scores for the fixed query — the
    single-pass + scalar-broadcast plan ``bm25_retrieval`` documents;
    shared with the hybrid RRF fusion below."""
    # NB: a 2-arg lambda in F.filter means (element, index) — capture the
    # term via a closure factory, not a default arg.
    def _eq(term: str):
        return lambda x: x == F.lit(term)

    docs = read_sf_parquet(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.size(_tokens(F.col("text"))).cast("double").alias("dl"),
        *[
            F.size(F.filter(_tokens(F.col("text")), _eq(t)))
            .cast("double")
            .alias(f"tf{i}")
            for i, t in enumerate(_BM25_TERMS)
        ],
    )
    s = d.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0))
            .cast("double")
            .alias(f"df{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    score = None
    for i in range(len(_BM25_TERMS)):
        tf, dfi = F.col(f"tf{i}"), F.col(f"df{i}")
        idf = F.log((F.col("n_docs") - dfi + 0.5) / (dfi + 0.5) + 1)
        term = F.when(
            tf > 0,
            idf
            * tf
            * (_K1 + 1)
            / (tf + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl"))),
        ).otherwise(0.0)
        score = term if score is None else score + term
    return d.crossJoin(s).select("doc_id", F.round(score, 6).alias("bm25"))


@register("bm25_retrieval", _bm25_oracle())
def bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 documents for the fixed query {spark, vector, merge}
    (k1=1.2, b=0.75, idf = ln((N-df+0.5)/(df+0.5)+1)).

    Plan: NO token explode — per-term frequencies are narrow
    ``size(filter(tokens, ...))`` array ops inside the scan's codegen
    stage; corpus stats (N, avgdl, per-term df) are ONE 1-row aggregate
    broadcast back; the final top-10 is a TakeOrdered. At 100 TB this is
    a single pass over the corpus plus a scalar broadcast — the shape
    an inverted index would only beat at much lower selectivity."""
    return (
        _bm25_scored(spark, sf_dir)
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(10)
    )


# --------------------------------------------------------------------------
# UDTF document chunking (training-window preparation)
# --------------------------------------------------------------------------

_CHUNK = 25  # tokens per training chunk


@register(
    "udtf_chunk_documents",
    f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), c AS (
      SELECT doc_id, CAST(i AS INT) AS chunk_idx,
             toks[(i * {_CHUNK} + 1):((i + 1) * {_CHUNK})] AS chunk_toks
      FROM t, LATERAL (
        SELECT unnest(generate_series(
                 0, CAST(ceil(len(toks) / {_CHUNK}.0) AS BIGINT) - 1)) AS i
      ) gs
    )
    SELECT doc_id, chunk_idx,
           CAST(len(chunk_toks) AS INT) AS n_tokens,
           array_to_string(chunk_toks, ' ') AS chunk
    FROM c ORDER BY doc_id, chunk_idx
    """,
)
def udtf_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 user-defined table function) slicing each
    document into fixed 25-token training chunks — the
    context-window-preparation step of an LLM data pipeline, and the
    catalog's UDTF API-surface probe (scalar/grouped-agg/grouped-map
    pandas UDFs are covered elsewhere; this is the table-function lane).

    Expressible natively with sequence+explode+slice — which is exactly
    what makes it oracle-checkable. Plan: one generator pass per row,
    no shuffle; the lateral join stays inside the scan stage."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, chunk_idx int, n_tokens int, chunk string")
    class ChunkDoc:
        def eval(self, doc_id, text):
            toks = text.split(" ")
            for i in range(0, (len(toks) + _CHUNK - 1) // _CHUNK):
                part = toks[i * _CHUNK : (i + 1) * _CHUNK]
                yield doc_id, i, len(part), " ".join(part)

    spark.udtf.register("chunk_doc", ChunkDoc)
    read_sf_parquet(spark, sf_dir, "documents").createOrReplaceTempView(
        "_lex_docs"
    )
    return spark.sql(
        "SELECT c.doc_id, c.chunk_idx, c.n_tokens, c.chunk "
        "FROM _lex_docs d, LATERAL chunk_doc(d.doc_id, d.text) c "
        "ORDER BY c.doc_id, c.chunk_idx"
    )


# --------------------------------------------------------------------------
# hybrid retrieval: BM25 (+) embedding cosine via reciprocal-rank fusion
# --------------------------------------------------------------------------

_RRF_K = 60  # the standard RRF damping constant (Cormack et al. 2009)


def _rrf_oracle() -> str:
    # the BM25 CTE chain is _bm25_oracle() minus its final SELECT
    base = _bm25_oracle()
    cte = base[: base.rindex("SELECT doc_id")]
    return f"""{cte}
    , lex AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY round({_rrf_score_sql()}, 4) DESC,
                                doc_id) AS r_lex
      FROM d, s
    ), sem AS (
      SELECT b.vec_id AS doc_id,
             ROW_NUMBER() OVER (
               ORDER BY round(list_cosine_similarity(
                 CAST(q.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])
               ), 4) DESC, b.vec_id) AS r_sem
      FROM embeddings b,
           (SELECT embedding FROM embeddings WHERE vec_id = 0) q
    )
    SELECT lex.doc_id,
           CAST(lex.r_lex AS BIGINT) AS rank_lex,
           CAST(sem.r_sem AS BIGINT) AS rank_sem,
           round(1.0 / ({_RRF_K} + lex.r_lex) + 1.0 / ({_RRF_K} + sem.r_sem), 9)
             AS rrf
    FROM lex JOIN sem USING (doc_id)
    ORDER BY rrf DESC, doc_id LIMIT 10
    """


def _rrf_score_sql() -> str:
    """The BM25 score expression exactly as _bm25_oracle builds it."""
    return "\n             + ".join(
        f"CASE WHEN tf{i} > 0 THEN ln((n_docs - df{i} + 0.5) / (df{i} + 0.5) + 1)"
        f" * tf{i} * ({_K1} + 1)"
        f" / (tf{i} + {_K1} * (1 - {_B} + {_B} * dl / avgdl)) ELSE 0 END"
        for i in range(len(_BM25_TERMS))
    )


@register("hybrid_rrf_retrieval", _rrf_oracle())
def hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-signal retrieval fused by reciprocal ranks: every document is
    ranked by BM25 for the fixed lexical query AND by embedding cosine
    to the fixed query vector, then fused as
    rrf = 1/(60+r_lex) + 1/(60+r_sem) (Cormack et al. 2009 — the
    training-data curation workhorse: near-dup candidate generation and
    decontamination retrieval both want lexical AND semantic evidence,
    and RRF needs no score calibration between the two).

    Scale shape: each signal is the single-pass plan its own operator
    uses (BM25: narrow per-term array ops + 1-row stats broadcast;
    cosine: narrow scan vs a literal query vector), and both GLOBAL
    rankings run through ``operators/scale.global_rank`` — range
    partition + per-partition prefix counts + broadcast offsets — never
    a single-partition ORDER BY window. The fusion join keys on doc_id
    (co-partitioned shuffle), top-10 by TakeOrdered. Rank inputs are
    rounded to 4 dp so the orderings (and hence the integer ranks) are
    engine-portable; ties break by id."""
    from ..functions.vectors import cosine_to_query
    from ..operators.scale import global_rank

    lex = _bm25_scored(spark, sf_dir).select(
        "doc_id", (-F.round(F.col("bm25"), 4)).alias("_neg_lex")
    )
    lex_r = global_rank(lex, ["_neg_lex", "doc_id"], rank_col="rank_lex").drop(
        "_neg_lex"
    )

    emb = read_sf_parquet(spark, sf_dir, "embeddings")
    qvec = [
        float(x)
        for x in emb.where(F.col("vec_id") == 0).select("embedding").head()[0]
    ]
    sem = emb.select(
        F.col("vec_id").alias("doc_id"),
        (-F.round(cosine_to_query("embedding", qvec), 4)).alias("_neg_sem"),
    )
    sem_r = global_rank(sem, ["_neg_sem", "doc_id"], rank_col="rank_sem").drop(
        "_neg_sem"
    )

    fused = lex_r.join(sem_r, "doc_id").select(
        "doc_id",
        F.col("rank_lex").cast("long"),
        F.col("rank_sem").cast("long"),
        F.round(
            1.0 / (_RRF_K + F.col("rank_lex"))
            + 1.0 / (_RRF_K + F.col("rank_sem")),
            9,
        ).alias("rrf"),
    )
    return fused.orderBy(F.col("rrf").desc(), "doc_id").limit(10)
