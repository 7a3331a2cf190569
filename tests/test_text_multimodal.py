"""Text-function edge cases + multimodal plumbing determinism."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from amazon_kinesis_analytics_streaming_etl_spark.functions.text import (
    bpe_token_count,
    detect_language,
    fingerprint_md5,
    punct_ratio,
    shingle_hashes,
    token_count,
    word_shingles,
)
from amazon_kinesis_analytics_streaming_etl_spark.operators.multimodal import (
    decode_media,
    extract_features,
    frame_sample_plan,
    synthetic_media,
    FEATURE_DIM,
)


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], ["text"]).select(col.alias("v")).head().v


def test_token_count_edges(spark):
    assert _one(spark, "", token_count("text")) == 0
    assert _one(spark, "   ", token_count("text")) == 0
    assert _one(spark, "one", token_count("text")) == 1
    assert _one(spark, "a  b\t c", token_count("text")) == 3


def test_bpe_token_count(spark):
    # words, digit runs, punctuation singles
    assert _one(spark, "hello world42, ok!", bpe_token_count("text")) == 6


def test_punct_ratio(spark):
    assert _one(spark, "", punct_ratio("text")) == 0.0
    assert _one(spark, "abcd", punct_ratio("text")) == 0.0
    assert _one(spark, "a!b!", punct_ratio("text")) == pytest.approx(0.5)


def test_detect_language_stopword_heuristic(spark):
    assert _one(spark, "the cat is in the house and it is warm", detect_language("text")) == "en"
    assert _one(spark, "el gato es de la casa y es un animal", detect_language("text")) == "es"
    assert _one(spark, "le chat est pour la maison et une souris", detect_language("text")) == "fr"
    assert _one(spark, "der hund und die katze in das haus von berlin", detect_language("text")) == "de"
    assert _one(spark, "zzz qqq xxx", detect_language("text")) == "und"


def test_fingerprint_normalization(spark):
    a = _one(spark, "Hello   World", fingerprint_md5("text"))
    b = _one(spark, "hello world", fingerprint_md5("text"))
    c = _one(spark, "hello worlds", fingerprint_md5("text"))
    assert a == b != c


def test_shingle_hashes_matches_string_shingles_cardinality(spark):
    df = spark.createDataFrame(
        [("a b c d e a b c d e",), ("x y",), ("",)], ["text"]
    )
    out = df.select(
        F.size(shingle_hashes("text", 3)).alias("nh"),
        F.size(word_shingles("text", 3)).alias("ns"),
    ).collect()
    for r in out:
        assert r.nh == r.ns  # distinct triple counts agree (hash vs string)
    # 10 tokens -> 8 shingle windows, 5 distinct ("a b c d e" repeats)
    assert [r.nh for r in out] == [5, 0, 0]


def test_decode_media_deterministic_across_partitioning(spark):
    media = synthetic_media(spark, n=32)
    once = {r.media_id: r.content_digest for r in decode_media(media).collect()}
    again = {
        r.media_id: r.content_digest
        for r in decode_media(media.repartition(7)).collect()
    }
    assert once == again and len(once) == 32


def test_extract_features_shape_and_range(spark):
    feats = extract_features(synthetic_media(spark, n=8)).collect()
    assert len(feats) == 8
    for r in feats:
        assert len(r.features) == FEATURE_DIM
        assert all(0.0 <= x <= 1.0 for x in r.features)


def test_frame_sample_plan_counts(spark):
    media = synthetic_media(spark, n=4)
    frames = frame_sample_plan(media, every_ms=1000)
    counts = {r.media_id: r.n for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()}
    durations = {r.media_id: r.meta.duration_ms for r in media.collect()}
    for mid, n in counts.items():
        expected = max((max(durations[mid] - 1, 0)) // 1000 + 1, 1)
        assert n == expected


def test_resize_media_caps_longest_side(spark):
    from amazon_kinesis_analytics_streaming_etl_spark.operators.multimodal import (
        decode_media,
        resize_media,
        synthetic_media,
    )

    media = synthetic_media(spark, n=24)
    orig = {r["media_id"]: (r["width"], r["height"]) for r in decode_media(media).collect()}
    rows = resize_media(media, max_dim=64).collect()
    assert len(rows) == 24
    for r in rows:
        w, h = r["width"], r["height"]
        assert max(w, h) <= 64 and min(w, h) >= 1
        ow, oh = orig[r["media_id"]]
        if max(ow, oh) <= 64:
            assert (w, h) == (ow, oh)  # no upscaling
        else:  # documented contract: floor-scale both sides by cap/longest
            scale = 64 / max(ow, oh)
            assert (w, h) == (max(1, int(ow * scale)), max(1, int(oh * scale)))
        assert r["payload"] is not None


def _ref_winnow(text, k, w):
    import hashlib

    toks = text.strip().lower().split() if text.strip() else []
    h = [
        hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest()
        for i in range(len(toks) - k + 1)
    ]
    if not h:
        return set()
    if len(h) < w:
        return {min(h)}
    return {min(h[i : i + w]) for i in range(len(h) - w + 1)}


def test_winnow_fingerprints_matches_reference_all_window_shapes(spark):
    """Value sets equal a pure-Python winnow across k/w combos including
    non-power-of-two windows (the sparse-table offset combine), w=1
    (every span), short docs (<w spans -> single min), and empty docs."""
    import random

    from amazon_kinesis_analytics_streaming_etl_spark.functions.text import (
        winnow_fingerprints,
    )

    rng = random.Random(7)
    vocab = [f"w{j}" for j in range(15)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30))))
        for i in range(40)
    ]
    docs += [(100, ""), (101, "a b"), (102, "one two three four five")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for k, w in ((3, 4), (2, 5), (4, 1), (2, 8)):
        got = {
            r.doc_id: set(r.fp)
            for r in df.select(
                "doc_id", winnow_fingerprints("text", k, w).alias("fp")
            ).collect()
        }
        for i, t in docs:
            assert got[i] == _ref_winnow(t, k, w), (k, w, i)


def test_winnow_no_miss_guarantee_on_shared_substring(spark):
    """Schleimer 2003 theorem: two documents sharing a substring of
    >= k + w - 1 tokens share at least one fingerprint — checked with a
    planted 12-token run inside otherwise-disjoint documents (k=4, w=4:
    guarantee threshold is 7 tokens)."""
    from amazon_kinesis_analytics_streaming_etl_spark.functions.text import (
        winnow_fingerprints,
    )

    shared = "the quick brown fox jumps over the lazy sleeping dog tonight again"
    a = "alpha beta gamma " + shared + " delta epsilon"
    b = "uno dos tres cuatro " + shared + " cinco"
    c = "completely different words with no overlap at all whatsoever here"
    df = spark.createDataFrame(
        [(0, a), (1, b), (2, c)], "doc_id long, text string"
    )
    got = {
        r.doc_id: set(r.fp)
        for r in df.select(
            "doc_id", winnow_fingerprints("text", 4, 4).alias("fp")
        ).collect()
    }
    assert got[0] & got[1], "shared 12-token run must share a fingerprint"
    assert not (got[0] & got[2]) and not (got[1] & got[2])


def test_ahash_banding_has_exact_recall_at_threshold(spark):
    """Banded candidate generation must find EVERY pair with hamming <= 7
    (8 bands x 8 bits, pigeonhole) — compare against brute force over
    all signature pairs."""
    from pyspark.sql import functions as F

    from amazon_kinesis_analytics_streaming_etl_spark.operators.multimodal import (
        ahash_signatures,
        synthetic_media_pairs,
    )
    from amazon_kinesis_analytics_streaming_etl_spark.plans.llm import (
        multimodal_ahash_dedup,
    )

    sigs = ahash_signatures(synthetic_media_pairs(spark, 32)).collect()
    brute = []
    for x in sigs:
        for y in sigs:
            if x["media_id"] < y["media_id"]:
                h = bin((x["sig"] ^ y["sig"]) & (2**64 - 1)).count("1")
                if h <= 7:
                    brute.append((x["media_id"], y["media_id"], h))

    banded = ahash_signatures(synthetic_media_pairs(spark, 32)).select(
        "media_id", "sig", F.posexplode("bands").alias("pos", "band")
    )
    a, b = banded.alias("a"), banded.alias("b")
    got = (
        a.join(
            b,
            (F.col("a.pos") == F.col("b.pos"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("ia"),
            F.col("b.media_id").alias("ib"),
            F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig")))
            .cast("int")
            .alias("h"),
        )
        .where(F.col("h") <= 7)
        .distinct()
        .collect()
    )
    assert sorted((r["ia"], r["ib"], r["h"]) for r in got) == sorted(brute)
    # the fixture guarantees near-dups exist: variant pairs (2g, 2g+1)
    assert len(brute) >= 16
    variant_pairs = sum(1 for ia, ib, _ in brute if ib == ia + 1 and ia % 2 == 0)
    assert variant_pairs >= 16

    out = multimodal_ahash_dedup(spark, "unused").collect()
    assert len(out) == 20
    assert all(r["hamming"] <= 7 for r in out)


def test_ahash_skips_null_payloads(spark):
    from pyspark.sql import functions as F

    from amazon_kinesis_analytics_streaming_etl_spark.operators.multimodal import (
        ahash_signatures,
        synthetic_media_pairs,
    )

    media = synthetic_media_pairs(spark, 4).withColumn(
        "payload",
        F.when(F.col("media_id") % 2 == 0, F.col("payload")),
    )
    got = ahash_signatures(media).collect()
    assert sorted(r["media_id"] for r in got) == [0, 2, 4, 6]
