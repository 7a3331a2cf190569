"""Tests for the training-data preparation family: the distributed
global cumsum primitive (vs the naive single-partition window), packing
layout invariants, and the expectation audit's bookkeeping.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from amazon_kinesis_analytics_streaming_etl_spark.operators.scale import (
    global_cumsum,
)
from tests.conftest import SF_SMOKE


@pytest.mark.parametrize("exclusive", [False, True])
def test_global_cumsum_matches_single_partition_window(spark, exclusive):
    df = (
        spark.range(2000)
        .select(
            F.col("id"),
            (F.xxhash64("id") % 97).cast("long").alias("v"),
        )
        .repartition(16)  # scramble physical order first
    )
    frame_end = -1 if exclusive else 0
    expected = df.withColumn(
        "cumsum",
        F.coalesce(
            F.sum("v").over(
                Window.orderBy("id").rowsBetween(
                    Window.unboundedPreceding, frame_end
                )
            ),
            F.lit(0),
        ),
    )
    got = global_cumsum(df, "id", "v", n_parts=8, exclusive=exclusive)
    exp = {r.id: r.cumsum for r in expected.collect()}
    act = {r.id: r.cumsum for r in got.collect()}
    assert act == exp


def test_pack_sequences_layout_invariants(spark):
    from amazon_kinesis_analytics_streaming_etl_spark.plans.prep import (
        _CAP,
        pack_sequences,
    )

    rows = pack_sequences(spark, SF_SMOKE).collect()
    assert rows, "documents table is non-empty"
    # offsets are contiguous: each doc starts where the previous ended
    offset = 0
    for r in rows:
        assert r.start_offset == offset
        assert r.n_tokens >= 1
        assert r.pack_id == r.start_offset // _CAP
        end_pack = (r.start_offset + r.n_tokens - 1) // _CAP
        assert r.spans_packs == end_pack - r.pack_id + 1
        offset += r.n_tokens
    # the layout is dense: total packs cover exactly the token count
    assert rows[-1].start_offset + rows[-1].n_tokens == offset


def test_quality_expectations_bookkeeping(spark):
    from amazon_kinesis_analytics_streaming_etl_spark.plans.prep import (
        _RULES,
        quality_expectations,
    )

    out = quality_expectations(spark, SF_SMOKE).collect()
    assert [r.rule for r in out] == sorted(name for name, _ in _RULES)
    n = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").count()
    for r in out:
        assert 0 <= r.n_violations <= n
        assert r.violation_rate == pytest.approx(r.n_violations / n, abs=5e-7)


def test_dedup_incremental_excludes_corpus_fingerprints(spark):
    from amazon_kinesis_analytics_streaming_etl_spark.functions.text import (
        fingerprint_md5,
    )
    from amazon_kinesis_analytics_streaming_etl_spark.plans.prep import (
        dedup_incremental,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", fingerprint_md5(F.col("text")).alias("fp")
    )
    corpus_fps = {
        r.fp for r in docs.where(F.col("doc_id") % 2 == 0).collect()
    }
    out = dedup_incremental(spark, SF_SMOKE).collect()
    fresh_fps = [r.fingerprint for r in out]
    assert len(fresh_fps) == len(set(fresh_fps)), "one row per fingerprint"
    assert not (set(fresh_fps) & corpus_fps), "nothing already in the corpus"
    # every surviving doc_id is odd (from the incoming shard)
    assert all(r.doc_id % 2 == 1 for r in out)


def test_sample_weighted_topn_deterministic_and_weighted(spark):
    """The E-S sample is (a) byte-stable across invocations, (b) biased
    toward high-weight (long) documents vs the corpus average."""
    from amazon_kinesis_analytics_streaming_etl_spark.plans.catalog import QUERIES

    sf = "/root/testdata/sf0.001"
    a = [tuple(r) for r in QUERIES["sample_weighted_topn"](spark, sf).collect()]
    b = [tuple(r) for r in QUERIES["sample_weighted_topn"](spark, sf).collect()]
    assert a == b and len(a) == 50
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    corpus_avg = docs.agg({"n_chars": "avg"}).collect()[0][0]
    sample_avg = sum(r[2] for r in a) / len(a)
    assert sample_avg > corpus_avg


def test_train_test_split_is_leak_free(spark):
    """After the scrub, no clean-test fingerprint may appear in train."""
    from pyspark.sql import functions as F

    from amazon_kinesis_analytics_streaming_etl_spark.functions.text import (
        fingerprint_md5,
    )
    from amazon_kinesis_analytics_streaming_etl_spark.plans.catalog import QUERIES

    sf = "/root/testdata/sf0.001"
    out = {r.split: r for r in QUERIES["train_test_split_leakfree"](spark, sf).collect()}
    assert set(out) == {"train", "test"}
    assert out["train"].n_clean == out["train"].n_docs
    assert out["test"].n_clean <= out["test"].n_docs
    # independent recomputation of the invariant
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        / F.lit(4294967296.0)
    )
    fp = docs.select(
        "doc_id",
        fingerprint_md5(F.col("text")).alias("fp"),
        (u < 0.8).alias("is_train"),
    )
    train = fp.where("is_train").select("fp").distinct()
    test_clean = fp.where(~F.col("is_train")).join(train, "fp", "left_anti")
    assert test_clean.count() == out["test"].n_clean


def test_train_test_split_fully_leaked_keeps_zero_clean_row(spark, tmp_path):
    """The r12 single-aggregate rewrite must keep the fully-leaked edge
    the old join shape was patched for: when every test text also exists
    in train, the test row survives with n_clean=0 (not a dropped row),
    and null-text docs keep the JOIN's null semantics (a null
    fingerprint never matches train, so those test docs stay clean)."""
    from pyspark.sql import functions as F

    from amazon_kinesis_analytics_streaming_etl_spark.plans.catalog import QUERIES

    # One shared text for ids 0..199 guarantees both splits hold it;
    # a few null texts ride along to pin the null-fingerprint path.
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 196, F.lit("identical corpus text")).alias("text"),
    )
    d = str(tmp_path / "leak")
    docs.write.parquet(f"{d}/documents.parquet")
    out = {r.split: r for r in QUERIES["train_test_split_leakfree"](spark, d).collect()}
    assert set(out) == {"train", "test"}
    assert out["train"].n_clean == out["train"].n_docs
    # every non-null-text test doc leaks; null-text test docs stay clean
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        / F.lit(4294967296.0)
    )
    flags = docs.select((u < 0.8).alias("is_train"), F.col("text").isNull().alias("no_text"))
    n_test_null = flags.where(~F.col("is_train") & F.col("no_text")).count()
    n_test = flags.where(~F.col("is_train")).count()
    assert out["test"].n_docs == n_test
    assert out["test"].n_clean == n_test_null


def test_sample_stratified_quota_and_determinism(spark):
    from amazon_kinesis_analytics_streaming_etl_spark.plans.catalog import QUERIES
    from amazon_kinesis_analytics_streaming_etl_spark.plans.prep import _STRAT_N

    out = QUERIES["sample_stratified"](spark, SF_SMOKE)
    rows = [tuple(r) for r in out.collect()]
    per_source: dict[str, int] = {}
    for source, rn, _doc, _n in rows:
        per_source[source] = per_source.get(source, 0) + 1
        assert 1 <= rn <= _STRAT_N
    assert all(n <= _STRAT_N for n in per_source.values())
    # rn is dense per stratum: quota k means ranks exactly 1..k
    assert rows == [tuple(r) for r in out.collect()]


def test_mv_incremental_refresh_merge_equals_cold_rebuild(spark):
    """The mergeable-partials invariant, independent of the DuckDB oracle:
    base-partials + delta-partials merged must equal one aggregate over
    all events, column for column."""
    from amazon_kinesis_analytics_streaming_etl_spark.plans.catalog import QUERIES
    from amazon_kinesis_analytics_streaming_etl_spark.schemas import load_events

    merged = {
        (r.event_type, r.day): r
        for r in QUERIES["mv_incremental_refresh"](spark, SF_SMOKE).collect()
    }
    ev = load_events(spark, SF_SMOKE)
    mean = F.sum("value") / F.count("*")
    var = F.greatest(
        F.sum(F.col("value") * F.col("value")) / F.count("*") - mean * mean,
        F.lit(0.0),
    )
    direct = {
        (r.event_type, r.day): r
        for r in ev.groupBy(
            "event_type",
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.round(mean, 2).alias("avg_value"),
            F.round(F.min("value"), 6).alias("min_value"),
            F.round(F.max("value"), 6).alias("max_value"),
            F.round(F.sqrt(var), 2).alias("stddev_pop"),
        )
        .collect()
    }
    assert set(merged) == set(direct)
    for k, m in merged.items():
        d = direct[k]
        assert m.n_events == d.n_events
        for col in ("sum_value", "avg_value", "min_value", "max_value", "stddev_pop"):
            assert abs(getattr(m, col) - getattr(d, col)) <= 0.011, (k, col)


def test_mixture_temperature_weights_contract(spark):
    """Weights form a distribution, temperature alpha<1 compresses the
    mixture (max weight <= max raw share, min weight >= min raw share),
    and the doc budget conserves corpus size to within rounding."""
    from amazon_kinesis_analytics_streaming_etl_spark.plans.catalog import QUERIES

    rows = QUERIES["mixture_temperature_weights"](spark, SF_SMOKE).collect()
    total_docs = sum(r.n_docs for r in rows)
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-4
    assert max(r.weight for r in rows) <= max(r.raw_share for r in rows) + 1e-9
    assert min(r.weight for r in rows) >= min(r.raw_share for r in rows) - 1e-9
    assert abs(sum(r.target_docs for r in rows) - total_docs) <= len(rows)
    # ordering by share is preserved: smoothing rescales, never reranks
    by_share = sorted(rows, key=lambda r: (r.raw_share, r.source))
    by_weight = sorted(rows, key=lambda r: (r.weight, r.source))
    assert [r.source for r in by_share] == [r.source for r in by_weight]


def test_eval_auc_roc_matches_pure_python_midrank_auc(spark):
    """Full recompute: collect (score, y), midrank AUC in pure Python —
    the Mann-Whitney identity with tie handling must match exactly; and
    flipping the labels must give 1 - AUC (the metric's defining
    symmetry)."""
    from amazon_kinesis_analytics_streaming_etl_spark.plans.prep import eval_auc_roc

    from conftest import SF_SMOKE

    row = eval_auc_roc(spark, SF_SMOKE).collect()[0]
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").collect()
    pairs = [
        (round(float(r.embedding[0]) + 0.0, 6), 1 if r.label == 3 else 0)
        for r in emb
    ]
    pairs.sort()
    # midranks: positions are 1-based; equal scores share the mean rank
    ranks = {}
    i = 0
    while i < len(pairs):
        j = i
        while j < len(pairs) and pairs[j][0] == pairs[i][0]:
            j += 1
        mid = (i + 1 + j) / 2.0
        ranks[pairs[i][0]] = mid
        i = j
    n_pos = sum(y for _, y in pairs)
    n_neg = len(pairs) - n_pos
    r_pos = sum(ranks[s] for s, y in pairs if y == 1)
    want = (r_pos - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)
    assert row.n_pos == n_pos and row.n_neg == n_neg
    assert row.auc == round(want + 1e-8, 6)


def test_calibration_bins_partition_population_and_bound_rates(spark):
    """Bins cover the whole scored set, bin ids are 0..9, pos_rate is a
    probability, and mean scores ascend with the bin id (equal-width
    bins over an ascending variable)."""
    from amazon_kinesis_analytics_streaming_etl_spark.plans.prep import (
        eval_calibration_bins,
    )

    from conftest import SF_SMOKE

    rows = eval_calibration_bins(spark, SF_SMOKE).collect()
    n_total = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").count()
    assert sum(r.n for r in rows) == n_total
    assert all(0 <= r.bin <= 9 for r in rows)
    assert all(0.0 <= r.pos_rate <= 1.0 for r in rows)
    means = [r.avg_score for r in sorted(rows, key=lambda r: r.bin)]
    assert means == sorted(means)


def test_dsir_weights_favor_target_lang(spark):
    """DSIR importance weights must score target-domain ('en') docs above
    off-target docs on average — the defining property of the score. The
    synthetic corpus shares most unigrams across langs, so the
    separation lives in the PER-TOKEN weight (raw sums are dominated by
    length, as in the paper's fixed-length formulation)."""
    from amazon_kinesis_analytics_streaming_etl_spark.plans.prep import (
        dsir_doc_weights,
        prep_dsir_weights,
    )

    top = prep_dsir_weights(spark, SF_SMOKE).collect()
    assert len(top) == 20
    ws = [(r["log_weight"], r["doc_id"]) for r in top]
    assert ws == sorted(ws, key=lambda t: (-t[0], t[1]))

    per = dsir_doc_weights(spark, SF_SMOKE).collect()
    def mean_pt(pred):
        xs = [r["log_weight"] / r["n_tokens"] for r in per if pred(r)]
        return sum(xs) / len(xs)

    assert mean_pt(lambda r: r["lang"] == "en") > mean_pt(
        lambda r: r["lang"] != "en"
    )


def test_quantile_normalize_target_is_cross_source_mean(spark):
    """norm_value at each decile must equal the mean of raw_mean across
    the sources present in that decile, and be monotone in decile."""
    from amazon_kinesis_analytics_streaming_etl_spark.plans.prep import (
        prep_quantile_normalize,
    )

    rows = prep_quantile_normalize(spark, SF_SMOKE).collect()
    by_dec: dict[int, list] = {}
    for r in rows:
        by_dec.setdefault(r["decile"], []).append(r)
    for dec, cell in by_dec.items():
        target = cell[0]["norm_value"]
        assert all(abs(c["norm_value"] - target) < 1e-9 for c in cell)
        mean_raw = sum(c["raw_mean"] for c in cell) / len(cell)
        # norm_value was rounded from the unrounded raw means; comparing
        # against the mean of ROUNDED raw means can differ by the
        # rounding quantum, no more
        assert abs(target - mean_raw) < 1e-3
    # normalized targets increase with decile (longer docs per decile)
    targets = [by_dec[d][0]["norm_value"] for d in sorted(by_dec)]
    assert targets == sorted(targets)
