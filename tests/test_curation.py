"""Ground-truth tests for the curation operators (plans/curation.py).

The synthetic corpus has no PII and a tiny vocabulary, so the oracle
queries alone under-exercise some paths; these tests pin behavior on
hand-built vectors: PII redaction on real email/phone shapes, bigram
derivation and repetition math on known strings, decontamination on a
constructed overlap, and the filter chain's first-match-wins ordering.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amazon_kinesis_analytics_streaming_etl_spark.functions.text import lower_tokens
from amazon_kinesis_analytics_streaming_etl_spark.plans import curation as cu


def _one(spark, text):
    return spark.createDataFrame([(text,)], "text string")


def test_redact_pii_emails_and_phones(spark):
    cases = {
        "mail me at alice.smith+x@example.co.uk today":
            "mail me at <EMAIL> today",
        "call +1 (555) 123-4567 now": "call <PHONE> now",
        "two: a@b.io and c.d@e-f.org": "two: <EMAIL> and <EMAIL>",
        "digits 12345 stay; 123 45 678 90 goes": "digits 12345 stay; <PHONE> goes",
        "clean text stays clean": "clean text stays clean",
    }
    df = spark.createDataFrame([(t,) for t in cases], "text string")
    got = {r["text"]: r["s"] for r in df.select("text", cu.redact_pii("text").alias("s")).collect()}
    for src, want in cases.items():
        assert got[src] == want, f"{src!r} -> {got[src]!r}, want {want!r}"


def test_word_bigrams_and_repetition(spark):
    df = _one(spark, "a b a b a")
    row = df.select(
        cu.word_bigrams(lower_tokens("text")).alias("bi"),
        cu.repetition_ratio(lower_tokens("text")).alias("rep"),
    ).collect()[0]
    assert row["bi"] == ["a b", "b a", "a b", "b a"]
    assert row["rep"] == pytest.approx(0.5)  # 2 distinct of 4

    short = _one(spark, "solo")
    assert short.select(cu.repetition_ratio(lower_tokens("text")).alias("r")).collect()[0]["r"] == 0.0


def test_filter_reasons_first_match_wins(spark):
    rows = [
        (1, "fr", "src", "the " * 40),            # lang fires before length
        (2, "en", "src", "short text"),            # too_short
        (3, "en", "src", "a b " * 40),             # 80 tokens, all-dup bigrams -> repetitive
        (4, "en", "src", " ".join(f"w{i}" for i in range(40))),  # kept
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, source string, text string")
    toks = lower_tokens("text")
    reason = (
        F.when(F.col("lang") != "en", F.lit("lang"))
        .when(F.size(toks) < 30, F.lit("too_short"))
        .when(cu.repetition_ratio(toks) > 0.05, F.lit("repetitive"))
        .otherwise(F.lit("kept"))
    )
    got = {r["doc_id"]: r["reason"] for r in df.select("doc_id", reason.alias("reason")).collect()}
    assert got == {1: "lang", 2: "too_short", 3: "repetitive", 4: "kept"}


def test_decontam_flags_constructed_overlap(spark, tmp_path):
    # doc 97*0=0 is "benchmark"; doc 5 copies one of its 4-grams, doc 6 is clean
    rows = [
        (0, "alpha beta gamma delta epsilon", "en", "s", 30),
        (5, "x y alpha beta gamma delta z", "en", "s", 28),
        (6, "p q r s t u v w", "en", "s", 15),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    sf = str(tmp_path)
    df.write.parquet(f"{sf}/documents.parquet")
    got = cu.decontam_overlap(spark, sf).collect()
    # doc 5 shares exactly one 4-gram: "alpha beta gamma delta"
    assert [(r["doc_id"], r["n_shared"]) for r in got] == [(5, 1)]


def test_top_ngrams_deterministic_ties(spark, tmp_path):
    rows = [(0, "b b b a a a", "en", "s", 11), (1, "c c c", "en", "s", 5)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    sf = str(tmp_path)
    df.write.parquet(f"{sf}/documents.parquet")
    got = [(r["bigram"], r["n"]) for r in cu.text_top_ngrams(spark, sf).collect()]
    # counts: "b b"x2, "a a"x2, "b a"x1, "c c"x2 -> ties broken by text
    assert got == [("a a", 2), ("b b", 2), ("c c", 2), ("b a", 1)]


def test_char_entropy_known_strings(spark):
    """Entropy math on hand vectors: single repeated char -> 0 bits,
    uniform 2 chars -> 1 bit, uniform 4 chars -> 2 bits; ranking is
    ascending so the degenerate doc leads."""
    import math

    df = spark.createDataFrame(
        [
            (1, "aaaaaaaa", "en", "s", 8),
            (2, "abababab", "en", "s", 8),
            (3, "abcdabcd", "en", "s", 8),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        from amazon_kinesis_analytics_streaming_etl_spark.plans.catalog import QUERIES

        rows = QUERIES["text_char_entropy"](spark, d).collect()
    got = {r.doc_id: r.char_entropy for r in rows}
    assert math.isclose(got[1], 0.0, abs_tol=1e-6)
    assert math.isclose(got[2], 1.0, rel_tol=1e-6)
    assert math.isclose(got[3], 2.0, rel_tol=1e-6)
    assert [r.doc_id for r in rows] == [1, 2, 3]


def test_cap_per_key_bounds_and_ordering(spark):
    """No source exceeds the cap, ranks are 1..k dense per source, and
    the kept docs are each source's longest (n_chars non-increasing in
    rank)."""
    from amazon_kinesis_analytics_streaming_etl_spark.plans.catalog import QUERIES
    from tests.conftest import SF_SMOKE

    rows = QUERIES["curation_cap_per_key"](spark, SF_SMOKE).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r.rn)
        assert [r.rn for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 5
        chars = [r.n_chars for r in rs]
        assert chars == sorted(chars, reverse=True)


def test_pmi_collocations_match_pure_python_reference(spark):
    """Full recompute: tokenize the smoke corpus in pure Python with the
    same whitespace contract, count unigrams/bigrams, apply the min-count
    floor and the PMI formula — the engine's top-20 must match exactly
    (pair identity, count, and rounded PMI)."""
    import collections
    import math
    import re

    from conftest import SF_SMOKE

    rows = cu.text_pmi_collocations(spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("text").collect()
    uni = collections.Counter()
    bi = collections.Counter()
    for d in docs:
        toks = re.split(r"\s+", d.text.strip().lower()) if d.text.strip() else [""]
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    nu = sum(uni.values())
    nb = sum(bi.values())
    scored = [
        (
            round(
                math.log2((c / nb) / ((uni[w1] / nu) * (uni[w2] / nu))) + 1e-8, 4
            ),
            w1,
            w2,
            c,
        )
        for (w1, w2), c in bi.items()
        if c >= 5
    ]
    scored.sort(key=lambda t: (-t[0], t[1], t[2]))
    want = [(w1, w2, c, pmi) for pmi, w1, w2, c in scored[:20]]
    got = [(r.w1, r.w2, r.n_pair, r.pmi) for r in rows]
    assert got == want
