"""Catalog-wide physical-plan invariants.

Every batch query's executed plan is checked for the accidents that
don't show up in small-SF correctness runs but kill a 100 TB run:
CartesianProduct, and BroadcastNestedLoopJoin outside the whitelisted
scalar-threshold crossJoins (1-row broadcast sides, intentional).
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE

# crossJoin against a 1-row aggregate (scalar threshold broadcast) is the
# intended plan: a BroadcastNestedLoopJoin whose build side is one row.
# join_cross is the explicit dimension-x-dimension cartesian (both sides
# bounded dimension tables; |region| x |nation|).
SCALAR_THRESHOLD_QUERIES = {
    "q11_important_stock",
    "q22_sales_opportunity",
    "join_cross",
    # analytics family: crossJoin against 1-row scalar aggregates
    # (min/max bounds, totals) or a bounded types x hours spine.
    "gapfill_hourly",
    "histogram_extendedprice",
    "histogram_equidepth",
    "eval_calibration_bins",
    "stats_chi2_independence",
    # ABC: 1-row exact-cents grand-total broadcast into the class rollup.
    "abc_classification",
    # pinball: 1-row calendar-split-point broadcast into both halves.
    "eval_pinball_loss",
    "skew_key_profile",
    "drift_psi",
    "resample_interpolate",
    "pattern_match_funnel",
    "rfm_segments",
    # lexical family: 1-row corpus-stats broadcasts (N, avgdl, df).
    "tfidf_top_keywords",
    "bm25_retrieval",
    # curation: 1-row vocab-size broadcast into the LM scoring join.
    "text_lm_bigram_score",
    # PMI: 1-row corpus-total (N_uni, N_bi) broadcasts into the scoring join.
    "text_pmi_collocations",
    # etl: valid x corrupt 1-row summary aggregates (dead-letter split).
    "parse_dead_letter",
    # freshness audit: 1-row global-max broadcast into the k-row frame.
    "dq_freshness_lag",
    # round-9 rank stats: 1-row (n1,n2)/(N,tie_corr) broadcasts into the
    # domain-sized rank frames.
    "stats_ks_two_sample",
    "stats_kruskal_wallis",
    # round-9 late window: 1-row scalar broadcasts — the mean-density
    # gate (dbscan), the (tot_r, tot_t) corpus totals (DSIR), and the
    # point-estimate x CI crossJoin (bootstrap).
    "geo_dbscan_cells",
    "prep_dsir_weights",
    "stats_bootstrap_ci",
    # bloom prefilter gate: crossJoins of 1-row count aggregates
    # (prefiltered-join x exact-join x pass-rate summaries).
    "join_bloom_prefilter",
    # ANN eval: the bounded ~2% query panel broadcasts into the QxN
    # ground-truth scoring pass (linear in N per query by design).
    "ann_quality_eval",
    # sketches: exact-twin x estimate 1-row scalar gate joins.
    "sketch_theta_audience",
    # approx-vs-exact gate queries: crossJoins of 1-row summary aggregates
    # (exact-pair count x recall/subset booleans).
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_topk_lsh",
    "sim_topk_ivf",
    "sim_topk_ivf_trained",
    "dedup_embedding_lsh",
    "dedup_embedding_multitable",
    "sim_topk_pq",
    "sim_topk_ivfpq",
    "dedup_semantic",
    "sim_topk_lsh_multitable",
    # round-8 stats family: 1-row scalar broadcasts (digit total, user
    # total + corpus max(ts), winsorize quantile pair).
    "stats_benford_digits",
    "survival_kaplan_meier",
    "prep_winsorize_stats",
    # weighted median: 1-row total-weight broadcast; RI audit: 1-row
    # per-relation orphan x total count joins.
    "stats_weighted_median",
    "dq_referential_integrity",
    # curation funnel: 1-row stage-count crossJoins (funnel audit row).
    "pipeline_curation_e2e",
    # sliding HLL: day-spine range joins whose build side is the
    # |days|-row day table (calendar-bounded); sequence gaps: 1-row
    # stats/first-gap broadcasts.
    "hll_sliding_distinct",
    "dq_sequence_gaps",
    # conformal eval: 1-row calendar-cut broadcast (pinball family).
    "eval_conformal_interval",
    # target encoding: 1-row global-mean broadcast into the
    # |categories| x |folds| encoding frame.
    "prep_target_encoding",
    # hard-negative mining: non-equi (label !=) join whose BUILD side is
    # the bounded ~2% anchor panel broadcast — the same bounded-panel
    # contract as ann_quality_eval.
    "sim_hard_negatives",
}

def _batch_queries():
    from amazon_kinesis_analytics_streaming_etl_spark.plans.catalog import QUERIES

    return {
        name: fn
        for name, fn in QUERIES.items()
        if not name.startswith("stream_") and not name.startswith("multimodal_")
    }


def test_filters_reach_the_parquet_scan(spark):
    """q6 is the canonical pushdown probe: shipdate/discount/quantity
    range predicates must appear as PushedFilters on the lineitem scan,
    and the scan must read only the 4 referenced columns."""
    qs = _batch_queries()
    df = qs["q6_forecast_revenue"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed: {pushed}"
    read_schema = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    assert set(
        c.split(":")[0]
        for c in read_schema.split("<", 1)[1].rsplit(">", 1)[0].split(",")
    ) == {"l_shipdate", "l_discount", "l_quantity", "l_extendedprice"}


def test_q17_avg_subquery_broadcast_is_bounded_by_part_filter(spark):
    """The per-partkey avg must be semi-joined to the brand/size-filtered
    part set BEFORE being broadcast: a broadcast of an avg over ALL of
    lineitem's partkeys is |part|-sized and OOMs at 100x scale. The
    executed plan must show the LeftSemi pushdown feeding the aggregate."""
    qs = _batch_queries()
    df = qs["q17_small_qty_revenue"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan, f"avg subquery not bounded by part filter\n{plan}"


@pytest.mark.parametrize("name", sorted(_batch_queries()))
def test_no_cartesian_or_accidental_bnlj(spark, name):
    fn = _batch_queries()[name]
    df = fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product\n{plan}"
    if name not in SCALAR_THRESHOLD_QUERIES:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: non-equi broadcast join (add to whitelist only if the "
            f"build side is provably tiny)\n{plan}"
        )


def test_runtime_bloom_filter_prunes_shuffle_join_probe_side(spark):
    """Catalyst's runtime bloom-filter injection (InjectRuntimeFilter) is
    the 100 TB lever for selective-dimension shuffle joins: the filtered
    build side publishes a bloom filter that the probe side's scan applies
    BEFORE the shuffle, so most of the big side never crosses the wire.
    This pins that the engine's session config leaves the feature usable:
    with thresholds floored (the sf0.001 build side is otherwise below the
    creation threshold) a selective orders⋈lineitem shuffle join must
    carry a might_contain probe on the lineitem side."""
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        # creationSideThreshold is an UPPER bound on the build side (the
        # filter is worth creating only if the build side is small);
        # applicationSideScanSizeThreshold is a LOWER bound on the probe
        # side (pruning must be worth it). Floor the probe bound so the
        # sf0.001 lineitem qualifies.
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force shuffle join
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        from pyspark.sql import functions as F

        j = li.join(
            orders.where(F.col("o_orderpriority") == "1-URGENT"),
            li.l_orderkey == orders.o_orderkey,
        ).groupBy("o_orderpriority").count()
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan or "bloom_filter" in plan, (
            f"no runtime bloom filter injected:\n{plan}"
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_json_parse_evaluates_once_per_record(spark):
    """CodegenFallback JSON parsers (JsonToStructs, VariantExpressionEval)
    are never deduplicated by codegen subexpression elimination, and
    OptimizeJsonExprs/pushdown can multiply an inlined reference into one
    full tokenization per consumer — a silent O(n_fields) slowdown on the
    hottest paths (the r7 parse regression: ~38 from_json per record).
    Pin the single-parse plan contract for every JSON-parsing entry
    point: at most ONE from_json occurrence per source JSON column in
    the optimized plan."""
    from pyspark.sql import functions as F

    from amazon_kinesis_analytics_streaming_etl_spark.operators.parse import (
        parse_trip_events,
        split_corrupt,
    )

    raw = spark.createDataFrame([("{}",)], "value string")
    for label, df in (
        ("parse_trip_events", parse_trip_events(raw)),
        ("split_corrupt.valid", split_corrupt(raw)[0]),
        ("split_corrupt.corrupt", split_corrupt(raw)[1]),
    ):
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        n = plan.count("from_json")
        assert n <= 1, f"{label}: {n} from_json in plan (must be 1)"

    qs = _batch_queries()
    plan = (
        qs["json_variant_typed"](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # one from_json (the nested props field) and one variant parse
    assert plan.count("from_json") <= 1, plan


def test_lpa_argmax_window_is_rank_limit_pruned(spark):
    """The LPA superstep's per-node argmax window must plan behind a
    PARTIAL WindowGroupLimit (Spark 4 rank-limit pushdown): each
    upstream partition is pruned to its top-1 row per node BEFORE the
    window exchange, so the argmax shuffle carries at most one row per
    (node, partition) instead of one per (node, label). The operator
    docstring (operators/graph.py:label_propagation) cites this test."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    e = spark.createDataFrame([(1, 2), (2, 3)], ["_src", "_dst"])
    labels = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], ["node", "lbl"])
    w = Window.partitionBy("_dst").orderBy(F.col("c").desc(), F.col("lbl"))
    picked = (
        e.join(labels, e["_src"] == labels["node"])
        .groupBy("_dst", "lbl")
        .agg(F.count("*").alias("c"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
    )
    plan = picked._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan and "Partial" in plan, (
        f"argmax window not rank-limit pruned:\n{plan}"
    )
