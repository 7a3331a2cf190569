"""Corpus-curation queries: the cleanup stages of a training-data
pipeline that sit between raw ingestion and dedup — n-gram statistics,
repetition (boilerplate) scoring, benchmark decontamination, rule-based
quality filtering with reason codes, PII scrubbing, and embedding
hygiene stats. All JVM-side expressions (split/transform/zip_with/
regexp_replace) with DuckDB SQL oracle twins; no Python in any hot path.

Scale notes: every query is a scan + narrow per-row array math followed
by one hash aggregation; the only join (decontamination) broadcasts the
benchmark n-gram set — benchmark suites are small by construction, so
the corpus side never shuffles.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type hints must resolve

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import lower_tokens, word_shingles
from ..schemas import read_sf_parquet
from .relational import register


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_sf_parquet(spark, sf_dir, "documents")


def _docs_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents with the raw rows spread to defaultParallelism before
    any per-row array math (the operators/dedup.py `_shingled`
    rationale): the small-SF corpus is one parquet split, so heavy
    tokenize/shingle expressions otherwise run single-threaded. The
    exchange carries raw text bytes only (the expressions compute above
    it); at real scale a corpus arrives pre-partitioned and this is a
    no-op in spirit. Used by the queries whose per-row expression work
    measurably dominates (text_repetition 1.31s -> 0.38s, text_langid
    0.93s -> 0.54s at sf0.1/32 cores); the sub-half-second scans skip
    it — the exchange costs more than it parallelizes there."""
    return _docs(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism
    )


# Tokenization twins (Spark lower_tokens <-> DuckDB); the string itself
# lives next to lower_tokens in functions/text.py so the pair can't drift.
from ..functions.text import LOWER_TOKENS_SQL_TWIN as _T  # noqa: E402
# DuckDB bigram list over the token list
_BIGRAMS = f"list_transform(range(1, len({_T})), i -> {_T}[i] || ' ' || {_T}[i+1])"


def word_bigrams(toks: Column) -> Column:
    """Adjacent-word bigram strings from a token array (JVM zip_with —
    one pass, no explode, no re-tokenization)."""
    n = F.size(toks)
    return F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )


def repetition_ratio(toks: Column) -> Column:
    """Gopher-style repetition signal: fraction of bigrams that are
    duplicates (1 - distinct/total); 0.0 for docs under 2 tokens."""
    bi = word_bigrams(toks)
    total = F.size(bi)
    return F.when(
        total > 0,
        F.lit(1.0) - F.size(F.array_distinct(bi)).cast("double") / total.cast("double"),
    ).otherwise(F.lit(0.0))


# --------------------------------------------------------------------------
# corpus n-gram statistics
# --------------------------------------------------------------------------

@register(
    "text_top_ngrams",
    f"""
    SELECT bigram, count(*) AS n
    FROM (SELECT unnest({_BIGRAMS}) AS bigram FROM documents)
    GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT 20
    """,
)
def text_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 bigrams. One narrow pass derives bigrams per
    row, then a single hash aggregation; top-k via TakeOrdered (no
    global sort shuffle). Ties broken by bigram text for determinism."""
    docs = _docs(spark, sf_dir)
    return (
        docs.select(F.explode(word_bigrams(lower_tokens("text"))).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(20)
    )


# --------------------------------------------------------------------------
# repetition / boilerplate scoring
# --------------------------------------------------------------------------

@register(
    "text_repetition",
    f"""
    SELECT doc_id,
           len({_BIGRAMS}) AS n_bigrams,
           round(CASE WHEN len({_BIGRAMS}) > 0
                 THEN 1.0 - len(list_distinct({_BIGRAMS}))::DOUBLE / len({_BIGRAMS})
                 ELSE 0.0 END, 6) AS rep_ratio
    FROM documents
    ORDER BY rep_ratio DESC, doc_id
    LIMIT 15
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 most-repetitive documents by duplicate-bigram fraction —
    the boilerplate/low-information signal used to drop template pages
    from training corpora. Pure array math per row; the spread exchange
    carries raw text only, then zero shuffles before the final top-k."""
    docs = _docs_spread(spark, sf_dir)
    toks = lower_tokens("text")
    bi = word_bigrams(toks)
    return (
        docs.select(
            "doc_id",
            F.size(bi).alias("n_bigrams"),
            F.round(repetition_ratio(toks), 6).alias("rep_ratio"),
        )
        .orderBy(F.col("rep_ratio").desc(), "doc_id")
        .limit(15)
    )


# --------------------------------------------------------------------------
# benchmark decontamination
# --------------------------------------------------------------------------

_GRAM4 = (
    f"list_transform(range(1, len({_T}) - 2), i -> "
    f"{_T}[i] || ' ' || {_T}[i+1] || ' ' || {_T}[i+2] || ' ' || {_T}[i+3])"
)


@register(
    "decontam_overlap",
    f"""
    WITH grams AS (
      SELECT doc_id, unnest(list_distinct({_GRAM4})) AS ng FROM documents
    ),
    bench AS (SELECT DISTINCT ng FROM grams WHERE doc_id % 97 = 0)
    SELECT g.doc_id, count(DISTINCT g.ng) AS n_shared
    FROM grams g JOIN bench b USING (ng)
    WHERE g.doc_id % 97 <> 0
    GROUP BY g.doc_id
    ORDER BY g.doc_id
    """,
)
def decontam_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any
    4-gram with a held-out benchmark slice (here: doc_id % 97 == 0 —
    the stand-in for an eval set), with the shared-gram count.
    (Production decontamination uses 8-13-grams; the synthetic corpus's
    tiny vocabulary makes 4 the scale-equivalent choice here.)

    Scale shape: the benchmark n-gram set is broadcast (eval suites are
    tiny next to a 100 TB corpus), so the corpus side is one scan +
    narrow shingle derivation + broadcast semi-join-style match — no
    corpus shuffle until the per-doc count aggregation. The 4-gram
    derivation runs twice (bench build + corpus side), so the raw-text
    spread pays double here."""
    grams = _docs_spread(spark, sf_dir).select(
        "doc_id", F.explode(word_shingles(F.col("text"), 4)).alias("ng")
    )
    bench = grams.where(F.col("doc_id") % 97 == 0).select("ng").distinct()
    return (
        grams.where(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(bench), "ng")
        .groupBy("doc_id")
        .agg(F.count_distinct("ng").alias("n_shared"))
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# rule-based quality filter with reason codes
# --------------------------------------------------------------------------

_REASON = f"""
    CASE WHEN lang <> 'en' THEN 'lang'
         WHEN len({_T}) < 30 THEN 'too_short'
         WHEN len({_BIGRAMS}) > 0
              AND 1.0 - len(list_distinct({_BIGRAMS}))::DOUBLE / len({_BIGRAMS}) > 0.05
              THEN 'repetitive'
         ELSE 'kept' END
"""


@register(
    "curation_filter_reasons",
    f"""
    SELECT source, {_REASON} AS reason, count(*) AS n
    FROM documents
    GROUP BY source, reason
    ORDER BY source, reason
    """,
)
def curation_filter_reasons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-match-wins filter chain with reason codes (the audit trail
    a curation pipeline keeps): non-English -> 'lang', under 30 tokens
    -> 'too_short', duplicate-bigram fraction > 5% -> 'repetitive',
    else 'kept'; counted per source. One scan, one aggregation."""
    docs = _docs(spark, sf_dir)
    toks = lower_tokens("text")
    reason = (
        F.when(F.col("lang") != "en", F.lit("lang"))
        .when(F.size(toks) < 30, F.lit("too_short"))
        .when(repetition_ratio(toks) > 0.05, F.lit("repetitive"))
        .otherwise(F.lit("kept"))
    )
    return (
        docs.select("source", reason.alias("reason"))
        .groupBy("source", "reason")
        .agg(F.count("*").alias("n"))
        .orderBy("source", "reason")
    )


# --------------------------------------------------------------------------
# PII scrubbing
# --------------------------------------------------------------------------

#: No lookarounds — identical semantics in Java regex (Spark) and RE2
#: (DuckDB oracle).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9()\- ]{7,}[0-9]"


def redact_pii(text: Column | str) -> Column:
    """Replace emails then phone-shaped digit runs with placeholder
    tokens — the standard scrub pass before training-data release."""
    t = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(
        F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )


@register(
    "text_pii_scrub",
    f"""
    WITH scrubbed AS (
      SELECT source,
             regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
               '\\+?[0-9][0-9()\\- ]{{7,}}[0-9]', '<PHONE>', 'g') AS s,
             text
      FROM documents)
    SELECT source,
           count(*) AS docs,
           CAST(sum(CASE WHEN s <> text THEN 1 ELSE 0 END) AS BIGINT) AS docs_redacted,
           CAST(sum(length(text) - length(s)) AS BIGINT) AS chars_delta
    FROM scrubbed GROUP BY source ORDER BY source
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub audit per source: docs touched and net char delta.
    (The synthetic corpus contains no PII, so this is exercised with
    real vectors in tests/test_curation.py; the query still pins the
    regex dialect parity between engines.)"""
    docs = _docs(spark, sf_dir)
    s = redact_pii("text")
    return (
        docs.select(
            "source",
            (s != F.col("text")).cast("int").alias("hit"),
            (F.length("text") - F.length(s)).alias("delta"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("docs"),
            F.sum("hit").alias("docs_redacted"),
            F.sum("delta").alias("chars_delta"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# embedding hygiene
# --------------------------------------------------------------------------

@register(
    "embedding_norm_stats",
    """
    SELECT label,
           count(*) AS n,
           round(CAST(CAST(avg(sqrt(list_aggregate(
             list_transform(embedding, x -> x::DOUBLE * x::DOUBLE), 'sum')))
             AS REAL) AS DOUBLE), 4) AS avg_l2,
           round(min(sqrt(list_aggregate(
             list_transform(embedding, x -> x::DOUBLE * x::DOUBLE), 'sum'))), 4)
             AS min_l2,
           round(max(sqrt(list_aggregate(
             list_transform(embedding, x -> x::DOUBLE * x::DOUBLE), 'sum'))), 4)
             AS max_l2
    FROM embeddings GROUP BY label ORDER BY label
    """,
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-column hygiene: per-label L2-norm stats (count/avg/min/
    max) — the sanity check before cosine ops assume unit-ish norms.
    F.aggregate over the array keeps it JVM-side and shuffle-free until
    the per-label rollup."""
    emb = read_sf_parquet(spark, sf_dir, "embeddings")
    sq = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = F.sqrt(sq)
    return (
        emb.select("label", norm.alias("l2"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n"),
            # f32-squash (repo drift-avg convention): cross-engine
            # accumulation order differs; min/max/per-row norms are
            # order-identical folds and need no squash.
            F.round(F.avg("l2").cast("float").cast("double"), 4).alias("avg_l2"),
            F.round(F.min("l2"), 4).alias("min_l2"),
            F.round(F.max("l2"), 4).alias("max_l2"),
        )
        .orderBy("label")
    )


# --------------------------------------------------------------------------
# bigram language-model quality score (LM-filter shape)
# --------------------------------------------------------------------------

_LM_K = 0.5  # add-k smoothing


@register(
    "text_lm_bigram_score",
    f"""
    WITH t AS (
      SELECT doc_id, {_T} AS toks FROM documents WHERE len({_T}) >= 2
    ), b AS (
      SELECT doc_id, u.bg AS bg
      FROM t, UNNEST(list_transform(range(1, len(toks)),
                                    i -> toks[i] || ' ' || toks[i + 1])) u(bg)
    ), bc AS (
      SELECT bg, count(*) AS cb FROM b GROUP BY bg
    ), uc AS (
      SELECT string_split(bg, ' ')[1] AS w1, count(*) AS cu FROM b GROUP BY 1
    ), v AS (
      SELECT count(DISTINCT tok) AS vn
      FROM (SELECT unnest(toks) AS tok FROM t)
    ), s AS (
      SELECT doc_id, ln((cb + {_LM_K}) / (cu + {_LM_K} * vn)) AS logp
      FROM b JOIN bc USING (bg)
           JOIN uc ON string_split(b.bg, ' ')[1] = uc.w1, v
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(logp) + 0.00000001, 4) AS avg_logp
    FROM s GROUP BY doc_id ORDER BY doc_id
    """,
)
def text_lm_bigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram language-model score per document (mean
    add-k-smoothed log P(w2|w1)) — the LM-filter stage of a curation
    pipeline (CCNet-style: low average log-probability marks gibberish,
    boilerplate, or wrong-domain text for down-weighting). The model IS
    the corpus: bigram and preceding-token counts come from the same
    explode, so scoring is self-contained and deterministic.

    Plan: ONE bigram explode feeds both count tables (hash aggregates
    with map-side partials) and the scoring join; scoring shuffles keyed
    on the bigram/preceding-token — the vocabulary lives in the
    cluster, never the driver, and nothing is broadcast except the
    1-row vocab size (the LM-as-broadcast-dict design caps at driver
    memory; this one scales with executors). Per-doc rollup is the
    final keyed aggregate."""
    t = (
        _docs(spark, sf_dir)
        .select("doc_id", lower_tokens(F.col("text")).alias("toks"))
        .where(F.size("toks") >= 2)
    )
    b = t.select("doc_id", F.explode(word_bigrams(F.col("toks"))).alias("bg"))
    bc = b.groupBy("bg").agg(F.count("*").alias("cb"))
    uc = (
        b.select(F.split("bg", " ").getItem(0).alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").alias("cu"))
    )
    v = t.select(F.explode("toks").alias("tok")).agg(
        F.countDistinct("tok").alias("vn")
    )
    s = (
        b.join(bc, "bg")
        .withColumn("w1", F.split("bg", " ").getItem(0))
        .join(uc, "w1")
        .crossJoin(v)
        .select(
            "doc_id",
            F.log(
                (F.col("cb") + F.lit(_LM_K))
                / (F.col("cu") + F.lit(_LM_K) * F.col("vn"))
            ).alias("logp"),
        )
    )
    return (
        s.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.round(F.avg("logp") + F.lit(0.00000001), 4).alias("avg_logp"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# per-source document cap (domain balancing)
# --------------------------------------------------------------------------

@register(
    "curation_cap_per_key",
    """
    SELECT source, doc_id, n_chars, CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT source, doc_id, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents
    ) WHERE rn <= 5
    ORDER BY source, rn
    """,
)
def curation_cap_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap: keep at most 5 docs per source, best
    first (longest, doc_id tie-break) — the 'no single domain may
    dominate the mixture' guard every crawl-scale corpus applies before
    training (RefinedWeb/C4 cap the per-registered-domain share the
    same way).

    Plan: ONE hash shuffle on source; row_number runs on that
    partitioning and the filter collapses each group to <=5 rows before
    anything else happens — output is |sources| x 5 regardless of
    corpus size. A hot source (skewed domain) bounds a single task at
    that source's row count; for web-scale skew the two-phase variant
    (per-partition local top-5 via the same window on a salted key,
    then re-cap) drops in without changing the contract.
    """
    docs = _docs(spark, sf_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(F.col("n_chars").desc(), "doc_id")
    return (
        docs.select(
            "source",
            "doc_id",
            "n_chars",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .where(F.col("rn") <= 5)
        .orderBy("source", "rn")
    )


# --------------------------------------------------------------------------
# character-entropy quality signal
# --------------------------------------------------------------------------

@register(
    "text_char_entropy",
    """
    SELECT doc_id, n_chars, round(ent + 0.00000001, 6) AS char_entropy
    FROM (
      SELECT doc_id, entropy(c) AS ent
      FROM (SELECT doc_id, unnest(string_split(text, '')) AS c
            FROM documents WHERE text IS NOT NULL)
      GROUP BY doc_id
    ) JOIN documents USING (doc_id)
    ORDER BY char_entropy, doc_id
    LIMIT 20
    """,
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-20 documents by character-level Shannon entropy (log2) —
    the cheap gibberish/repetition detector (low entropy = repeated
    chars/template noise, near-uniform = encoding garbage) used as a
    quality gate alongside the token-level signals.

    Engine note: there is no JVM builtin for a per-row histogram
    entropy, and the declarative alternative (explode one row PER
    CHARACTER, then groupBy(doc, char)) shuffles corpus-bytes rows —
    linear work made wide. This is the documented pandas-UDF exception:
    one Arrow-batched scalar UDF computes the whole histogram in numpy
    per document (np.unique over the char array), zero shuffles before
    the final top-k. DuckDB's entropy() aggregate (log2-based) is the
    oracle twin over the exploded form — same number, independent
    plan. Entropy is a pure function of integer counts, so both
    engines agree to float64 ulps; the half-tie epsilon + 6dp round is
    the repo's float contract.
    """
    import numpy as np

    @F.pandas_udf("double")
    def _ent(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts))
        for i, t in enumerate(texts):
            if not t:
                continue
            _, counts = np.unique(np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32), return_counts=True)
            p = counts / counts.sum()
            out[i] = float(-(p * np.log2(p)).sum())
        return pd.Series(out)

    docs = _docs(spark, sf_dir)
    return (
        # NULL text is "no document", not "entropy 0": the oracle's
        # unnest drops such rows, and a 0.0 would win the bottom-20
        docs.where(F.col("text").isNotNull())
        .select(
            "doc_id",
            "n_chars",
            F.round(_ent(F.col("text")) + F.lit(0.00000001), 6).alias(
                "char_entropy"
            ),
        )
        .orderBy("char_entropy", "doc_id")
        .limit(20)
    )


# --------------------------------------------------------------------------
# PMI collocations
# --------------------------------------------------------------------------

_PMI_MIN_COUNT = 5  # collocation support floor (Church & Hanks' sparse guard)


@register(
    "text_pmi_collocations",
    f"""
    WITH toks AS (SELECT unnest({_T}) AS w FROM documents),
    uni AS (SELECT w, count(*) AS cw FROM toks GROUP BY w),
    nu AS (SELECT CAST(sum(cw) AS DOUBLE) AS n FROM uni),
    bi AS (
      SELECT bigram, count(*) AS cb
      FROM (SELECT unnest({_BIGRAMS}) AS bigram FROM documents)
      GROUP BY bigram HAVING count(*) >= {_PMI_MIN_COUNT}
    ),
    nb AS (SELECT CAST(sum(cb) AS DOUBLE) AS n FROM (
      SELECT count(*) AS cb
      FROM (SELECT unnest({_BIGRAMS}) AS bigram FROM documents)
      GROUP BY bigram
    ))
    SELECT string_split(bigram, ' ')[1] AS w1,
           string_split(bigram, ' ')[2] AS w2,
           CAST(cb AS BIGINT) AS n_pair,
           round(log2((cb / nb.n) /
                      ((u1.cw / nu.n) * (u2.cw / nu.n))) + 0.00000001, 4)
             AS pmi
    FROM bi
    JOIN uni u1 ON u1.w = string_split(bigram, ' ')[1]
    JOIN uni u2 ON u2.w = string_split(bigram, ' ')[2]
    CROSS JOIN nb CROSS JOIN nu
    ORDER BY pmi DESC, w1, w2
    LIMIT 20
    """,
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 collocations by pointwise mutual information (Church &
    Hanks 1990): bigrams whose observed corpus frequency most exceeds
    the independence expectation of their parts, with a min-count floor
    of 5 so rare accidental pairs can't dominate (PMI's
    classic sparse-data failure mode). This is the phrase-mining /
    tokenizer-merge-candidate signal of the text family.

    Plan: two narrow corpus scans (one exploding tokens, one exploding
    bigrams — each tokenizes once, the shared contract; a scan is the
    cheap part at 100 TB, the explode-shuffles are what must stay
    map-side-combined); unigram and bigram counts are map-side-combined
    hash aggregates; the bigram->unigram
    probability lookups are two equi-joins on the word key
    (vocab-sized, Zipf-skewed toward unique shingles — AQE handles the
    residual; at web scale the min-count floor prunes the bigram side
    by ~10x before either join). The corpus totals are 1-row scalar
    aggregates broadcast via the whitelisted crossJoin pattern. PMI is
    a log of exact-integer-count ratios — float64-stable across
    engines; epsilon + 4dp round is the float contract.
    """
    docs = _docs(spark, sf_dir)
    toks = lower_tokens("text")
    uni = (
        docs.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cw"))
    )
    nu = uni.agg(F.sum("cw").cast("double").alias("nu"))
    bi_all = docs.select(F.explode(word_bigrams(toks)).alias("bg")).groupBy(
        "bg"
    ).agg(F.count("*").alias("cb"))
    nb = bi_all.agg(F.sum("cb").cast("double").alias("nb"))
    bi = bi_all.where(F.col("cb") >= _PMI_MIN_COUNT).select(
        F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("w1"),
        F.split_part(F.col("bg"), F.lit(" "), F.lit(2)).alias("w2"),
        F.col("cb"),
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("cw").alias("cw1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("cw").alias("cw2"))
    pmi = F.log2(
        (F.col("cb") / F.col("nb"))
        / ((F.col("cw1") / F.col("nu")) * (F.col("cw2") / F.col("nu")))
    )
    return (
        bi.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(nu))
        .select(
            "w1",
            "w2",
            F.col("cb").cast("long").alias("n_pair"),
            F.round(pmi + 0.00000001, 4).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(20)
    )


@register(
    "text_normalize_dedup",
    """
    WITH norm AS (
      SELECT doc_id,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS ntext
      FROM documents
    )
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT md5(text)) AS BIGINT) AS distinct_raw,
           CAST(count(DISTINCT md5(ntext)) AS BIGINT) AS distinct_norm,
           CAST(count(DISTINCT md5(text)) - count(DISTINCT md5(ntext))
                AS BIGINT) AS collapsed_by_norm
    FROM documents JOIN norm USING (doc_id)
    """,
)
def text_normalize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-aware exact dedup — the canonicalization step that
    runs BEFORE fingerprinting in every curation pipeline: lowercase +
    whitespace collapse + trim, then count how many raw-distinct docs
    collapse into shared canonical forms (case/spacing mirrors that raw
    md5 dedup misses, cheaper than any near-dup pass). One scan, two
    count-distinct aggregates over md5 fingerprints — partial-aggregable,
    no self-join; the normalized fingerprint is the key the exact-dedup
    stage (`dedup_exact`) would shuffle on at 100 TB. Regex kept to the
    POSIX-compatible subset both engines tokenize identically."""
    d = _docs(spark, sf_dir)
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    return d.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.countDistinct(F.md5("text")).cast("long").alias("distinct_raw"),
        F.countDistinct(F.md5(norm)).cast("long").alias("distinct_norm"),
        (
            F.countDistinct(F.md5("text")) - F.countDistinct(F.md5(norm))
        ).cast("long").alias("collapsed_by_norm"),
    )


# --------------------------------------------------------------------------
# round 9: Zipf-law fit — the corpus-health power-law diagnostic
# --------------------------------------------------------------------------

@register(
    "text_zipf_fit",
    f"""
    WITH tf AS (
      SELECT term, count(*) AS n
      FROM (SELECT unnest({_T}) AS term FROM documents)
      WHERE term <> ''
      GROUP BY term
    ),
    top AS (
      SELECT term, n,
             row_number() OVER (ORDER BY n DESC, term) AS rnk
      FROM tf
      ORDER BY n DESC, term
      LIMIT 200
    )
    SELECT CAST(count(*) AS BIGINT) AS n_terms,
           (SELECT term FROM top WHERE rnk = 1) AS top_term,
           round(CAST(CAST(regr_slope(ln(n), ln(rnk)) AS REAL) AS DOUBLE)
                 + 0.00000001, 4) AS zipf_slope,
           round(CAST(CAST(regr_r2(ln(n), ln(rnk)) AS REAL) AS DOUBLE)
                 + 0.00000001, 4) AS zipf_r2
    FROM top
    """,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit over the corpus term-frequency head: OLS slope and
    r^2 of ln(freq) vs ln(rank) for the top-200 terms — natural text
    fits a power law with slope near -1; a synthetic/templated or
    boilerplate-heavy corpus bends the head (slope far from -1, low
    r^2). The corpus-health diagnostic a curation pass runs next to
    language-ID and repetition scoring.

    Scale shape: one explode + hash aggregate to the term-frequency
    table; the head is TakeOrdered top-200 (no global sort shuffle);
    rank assignment and the regression run on the bounded 200-row frame
    (the single-partition window is 200 rows by construction). Ties
    break by term text so both engines pick the same head."""
    docs = _docs(spark, sf_dir)
    tf = (
        docs.select(F.explode(lower_tokens("text")).alias("term"))
        .where(F.col("term") != "")
        .groupBy("term")
        .agg(F.count("*").alias("n"))
    )
    from pyspark.sql import Window

    top = tf.orderBy(F.col("n").desc(), "term").limit(200)
    w = Window.orderBy(F.col("n").desc(), "term")  # bounded: 200 rows post-limit
    ranked = top.select(
        "term", "n", F.row_number().over(w).alias("rnk")
    )
    return ranked.agg(
        F.count("*").cast("long").alias("n_terms"),
        F.max(F.when(F.col("rnk") == 1, F.col("term"))).alias("top_term"),
        F.round(
            F.expr("regr_slope(ln(n), ln(rnk))").cast("float").cast("double")
            + 0.00000001,
            4,
        ).alias("zipf_slope"),
        F.round(
            F.expr("regr_r2(ln(n), ln(rnk))").cast("float").cast("double")
            + 0.00000001,
            4,
        ).alias("zipf_r2"),
    )


@register(
    "text_readability",
    f"""
    WITH scored AS (
      SELECT doc_id,
             len({_T}) AS n_words,
             greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
               AS n_sentences,
             len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syllables
      FROM documents
    )
    SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
           CAST(n_sentences AS BIGINT) AS n_sentences,
           round(CAST(CAST(
             206.835 - 1.015 * (n_words * 1.0 / n_sentences)
                     - 84.6 * (n_syllables * 1.0 / n_words)
             AS REAL) AS DOUBLE) + 0.00000001, 3) AS flesch
    FROM scored
    WHERE n_words > 0
    ORDER BY flesch ASC, doc_id
    LIMIT 15
    """,
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease scoring with the standard vowel-group
    syllable approximation — the readability signal quality-filter
    stacks (C4/Gopher descendants) use to drop machine-generated or
    degenerate text; reports the 15 hardest documents (lowest score,
    doc_id ties deterministic). Sentences floor at 1 (fragments without
    terminal punctuation are one sentence); vowel-group counting is the
    classic hyphenation-free syllable proxy, identical regex in both
    engines (verified: Java and RE2 agree on '[aeiouy]+' group counts).

    Scale shape: one narrow per-row projection (tokenizer size +
    two regexp_count calls, all JVM codegen), then TakeOrdered top-15 —
    no shuffle beyond the bounded top-k, no UDF."""
    docs = _docs(spark, sf_dir)
    n_words = F.size(lower_tokens("text"))
    n_sent = F.greatest(F.expr("regexp_count(text, '[.!?]+')"), F.lit(1))
    n_syll = F.expr("regexp_count(lower(text), '[aeiouy]+')")
    scored = docs.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        n_sent.cast("long").alias("n_sentences"),
        n_syll.alias("n_syllables"),
    ).where(F.col("n_words") > 0)
    flesch = (
        F.lit(206.835)
        - 1.015 * (F.col("n_words") / F.col("n_sentences"))
        - 84.6 * (F.col("n_syllables") / F.col("n_words"))
    )
    return (
        scored.select(
            "doc_id",
            "n_words",
            "n_sentences",
            F.round(
                flesch.cast("float").cast("double") + 0.00000001, 3
            ).alias("flesch"),
        )
        .orderBy("flesch", "doc_id")
        .limit(15)
    )


# --------------------------------------------------------------------------
# round 9 (late window): tokenizer fertility by language
# --------------------------------------------------------------------------

_BPE_SQL = r"len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))"


@register(
    "text_token_fertility",
    f"""
    WITH d AS (
      SELECT lang,
             {_BPE_SQL} AS n_bpe,
             len({_T}) AS n_words
      FROM documents
      WHERE trim(text) <> ''
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(CAST(n_bpe AS DOUBLE) / n_words) + 0.00000001, 4)
             AS avg_fertility,
           round(CAST(sum(n_bpe) AS DOUBLE) / sum(n_words) + 0.00000001, 4)
             AS corpus_fertility,
           CAST(sum(n_bpe) AS BIGINT) AS total_bpe_tokens
    FROM d
    GROUP BY lang
    ORDER BY lang
    """,
)
def text_token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language — BPE-ish pre-tokens per
    whitespace word, the standard multilingual-tokenizer efficiency
    metric (a language whose fertility is far above the corpus mean pays
    proportionally more sequence length per word, which skews compute
    budgets and length-based quality filters). Both the per-doc average
    and the token-weighted corpus ratio, per language.

    Plan: one scan, two regex counts per row in codegen, one hash
    aggregate on the 5-value lang key — partial-aggregable, no shuffle
    of raw text. The BPE twin regex is the shared Java/RE2-safe subset
    (functions/text.py:BPE_SPLIT_PATTERN)."""
    from ..functions.text import bpe_token_count, token_count

    d = _docs(spark, sf_dir).where(F.trim(F.col("text")) != "")
    n_bpe = bpe_token_count(F.col("text"))
    n_words = token_count(F.col("text"))
    return (
        d.select("lang", n_bpe.alias("n_bpe"), n_words.alias("n_words"))
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.round(
                F.avg(F.col("n_bpe").cast("double") / F.col("n_words"))
                + 0.00000001,
                4,
            ).alias("avg_fertility"),
            F.round(
                F.sum("n_bpe").cast("double") / F.sum("n_words") + 0.00000001,
                4,
            ).alias("corpus_fertility"),
            F.sum("n_bpe").cast("long").alias("total_bpe_tokens"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# round 9 (late window): vocabulary coverage / OOV rate per source
# --------------------------------------------------------------------------

_VOCAB_K = 1000


@register(
    "text_vocab_coverage",
    f"""
    WITH tf AS (
      SELECT term, count(*) AS n
      FROM (SELECT unnest({_T}) AS term FROM documents)
      WHERE term <> ''
      GROUP BY term
    ),
    vocab AS (
      SELECT term FROM tf ORDER BY n DESC, term LIMIT {_VOCAB_K}
    ),
    toks AS (
      SELECT source, term
      FROM (SELECT source, unnest({_T}) AS term FROM documents)
      WHERE term <> ''
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(*) FILTER (v.term IS NOT NULL) AS BIGINT)
             AS in_vocab,
           round(1.0 - count(*) FILTER (v.term IS NOT NULL)
                 * 1.0 / count(*) + 0.00000001, 6) AS oov_rate
    FROM toks t LEFT JOIN vocab v ON t.term = v.term
    GROUP BY source
    ORDER BY source
    """,
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage: what fraction of each source's token
    occurrences a top-1000 corpus vocabulary covers — the OOV-rate audit
    that decides tokenizer vocab size and flags domain-shifted sources
    (high OOV = the vocab was trained on someone else's distribution).

    Plan: term frequencies are one explode + hash aggregate; the vocab
    head is TakeOrdered top-1000 (ties to term text, both engines);
    coverage is the token stream LEFT-joined against the BROADCAST vocab
    (1000 rows regardless of corpus size) into a per-source conditional
    aggregate — at 100 TB the only data-sized pass is the scan, twice
    (tf and coverage), both map-side-combinable."""
    docs = _docs(spark, sf_dir)
    toks = (
        docs.select("source", F.explode(lower_tokens("text")).alias("term"))
        .where(F.col("term") != "")
    )
    tf = toks.groupBy("term").agg(F.count("*").alias("n"))
    vocab = (
        tf.orderBy(F.col("n").desc(), "term")
        .limit(_VOCAB_K)
        .select("term", F.lit(1).alias("_v"))
    )
    hit = F.count(F.when(F.col("_v").isNotNull(), 1))
    return (
        toks.join(F.broadcast(vocab), "term", "left")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            hit.cast("long").alias("in_vocab"),
            F.round(
                1.0 - hit * 1.0 / F.count("*") + 0.00000001, 6
            ).alias("oov_rate"),
        )
        .orderBy("source")
    )
