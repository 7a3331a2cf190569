"""Aggregated query catalog: importing this module registers every query
family into one (QUERIES, ORACLES) pair — the driver contract surface.

Iteration order is DELIBERATE: the driver walks ``queries()`` in order
under a ~50-query budget, so the catalog front-loads (a) a small TPC-H
canary that must stay green every round, then (b) every query whose
latest driver signal is stale — never checked by any round's window, or
FAIL/no_oracle on its last check — so fixes actually get re-verified.
Everything else (exhaustively green in earlier rounds, code unchanged)
follows in the round-1..3 family order. Within a tier, registration
order is preserved.
"""

from __future__ import annotations

from . import advanced as _advanced  # noqa: F401  (registration side effects)
from . import analytics as _analytics  # noqa: F401
from . import curation as _curation  # noqa: F401
from . import etl as _etl  # noqa: F401
from . import layout as _layout  # noqa: F401
from . import lexical as _lexical  # noqa: F401
from . import llm as _llm  # noqa: F401
from . import prep as _prep  # noqa: F401
from . import streaming_queries as _sq  # noqa: F401
from . import tpch as _tpch  # noqa: F401
from . import vectors as _vectors  # noqa: F401
from .relational import ORACLES, QUERIES

# Tier 0: always-on canary — cheap, high-signal TPC-H shapes.
_CANARY = ["q1_pricing_summary", "q5_region_revenue", "q9_product_profit"]

# Tier 1 rotates by signal AGE each round. Round-6 window (CORRECTNESS_r06,
# 50 entries) covered the canary + the 11 round-6 additions + the 36
# round-1-stale names, leaving the 33 round-3 signals as the oldest.
# Round 7 priority (highest first): (a) the 31 queries NEW this round —
# they have no driver signal at all, which outranks any staleness;
# (b) every existing query whose CODE changed this round — the
# parse-transiting ETL family (P1 quoted-numeric coercion rework + the
# single-tokenization plan fix), the murmur2-vectorized Kafka roundtrip,
# the six sf0.1-sweep fixes (hourly-avg float32 squash, theta
# union-relative gate, -0.0 normalization), and the late plan/perf fixes
# (variant single-parse, O(bits) Z-order bucketing, numpy exact-cosine
# twin); (c) the oldest (round-3) signals in age order. Round 7 added 31
# queries, so tier (c) — the TPC-H q3..sim_topk_bruteforce block — falls
# past the ~50 budget this round; every name in it stays listed here so
# it leads the r8 window (all are r3-green on unchanged code, the
# lowest-risk tier to defer).
_STALE_R7 = [
    # code changed in round 7 — re-prove the fixes
    "ts_forecast_eval",  # new: seasonal-naive vs naive-1 MASE scorecard
    "path_trigrams",  # new: order-2 behavioral sequence mining
    "abc_classification",  # new: Pareto ABC classes in exact cents
    "stats_gini_spend",  # new: Gini concentration via global_rank identity
    "graph_sssp_weighted",  # new: Bellman-Ford weighted shortest paths
    "eval_calibration_bins",  # new: reliability-diagram bins
    "stats_chi2_independence",  # new: type x hour-of-day chi-square
    "funnel_time_to_convert",  # new: signup->purchase latency percentiles
    "histogram_equidepth",  # new: global-rank equal-height histogram
    "scd2_state_runs",  # new: SCD2 run-length state intervals
    "graph_kcore_trade",  # new: fixed-round k-core peeling
    "eval_auc_roc",  # new: distributed midrank Mann-Whitney AUC
    "graph_shortest_hops",  # new: multi-source BFS hop distances
    "markov_event_transitions",  # new: first-order transition matrix
    "anomaly_mad_robust",  # new: median/MAD robust z-score anomalies
    "text_pmi_collocations",  # new: PMI phrase mining
    "skyline_pareto",  # new: sort-filter 2-D skyline via global_cummax
    "attribution_last_touch",  # new: last-touch channel attribution
    "ts_seasonal_profile",  # new: additive seasonal decomposition profile
    "curation_cap_per_key",  # new: per-source document cap
    "text_char_entropy",  # new: char-entropy quality gate (pandas UDF)
    "mixture_temperature_weights",  # new: p^alpha mixture budgets
    "graph_triangle_count",  # new: degree-ordered oriented triangle counting
    "graph_label_propagation",  # new: deterministic synchronous LPA communities
    "dedup_containment",  # new: asymmetric shingle containment (doc-inside-doc)
    "ts_autocorr",  # new: lag-1/lag-24 autocorrelation diagnostic
    "ts_changepoint_cusum",  # new: CUSUM mean-shift changepoint
    "ts_trend_ols",  # new: regr_slope/intercept/r2 OLS trend
    "graph_pagerank",  # new: iterative PageRank (Pregel-on-DataFrames)
    "graph_copurchase_topk",  # new: co-occurrence pairs, stop-customer prune
    "stream_timeout_sessions",  # new: event-time-timer custom sessionizer
    "io_schema_evolution",  # new: mergeSchema add-a-column migration read
    "join_bloom_prefilter",  # new: bloom prefilter before the join shuffle
    "dedup_clusters_scale",  # new: alternating-star CC scale path
    "dedup_span_coverage",  # new: exact-substring dup metric (Lee 2021)
    "sketch_tdigest_rollup",  # new: mergeable quantile tier
    "sim_topk_ivfpq",  # new: IVF-PQ composite ANN
    "stream_tdigest_percentiles",  # new: streaming quantile monitor
    "text_winnow_fingerprints",  # new: MOSS winnowing overlap audit
    "dedup_clusters",
    "dedup_embedding",
    "sim_topk_pairs_per_label",
    "ann_quality_eval",
    "json_variant_typed",
    "layout_zorder_stats",
    "dedup_embedding_lsh",
    "dedup_embedding_multitable",
    "parse_dead_letter",
    "serialize_projection_contract",
    "pipeline_fanout_replay",
    "kinesis_sink_roundtrip",
    "kafka_sink_roundtrip",
    "es_upsert_idempotent",
    "file_sink_partition_layout",
    "file_sink_json_rows",
    "gapfill_hourly",
    "resample_interpolate",
    "ewma_hourly",
    "rolling_median_hourly",
    "embedding_dim_stats",
    "sketch_theta_audience",
    # oldest driver signal (round 3) — the complete set
    "q3_shipping_priority",
    "q8_market_share",
    "q10_returned_items",
    "q11_important_stock",
    "q12_priority_class",
    "q13_customer_distribution",
    "q14_promo_effect",
    "q15_top_supplier",
    "q16_parts_supplier_cnt",
    "q17_small_qty_revenue",
    "q18_large_volume_customer",
    "q19_discounted_revenue",
    "q20_part_promotion",
    "q21_waiting_orders",
    "q22_sales_opportunity",
    "cdc_merge_customers",
    "agg_approx_quantiles",
    "histogram_extendedprice",
    "profile_columns",
    "text_top_ngrams",
    "text_repetition",
    "decontam_overlap",
    "curation_filter_reasons",
    "embedding_norm_stats",
    "tfidf_top_keywords",
    "bm25_retrieval",
    "udtf_chunk_documents",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_levenshtein",
    "sim_topk_bruteforce",
]

# Family priority by defining module for the already-green tail.
_FAMILY_PRIORITY = {
    "tpch": 3,
    "etl": 4,
    "llm": 4,
    "curation": 4,
    "advanced": 4,
    "analytics": 4,
    "lexical": 4,
    "prep": 4,
    "vectors": 4,
    "streaming_queries": 5,
    "relational": 6,
}


def _reorder() -> None:
    names = list(QUERIES)
    unknown = (set(_CANARY) | set(_STALE_R7)) - set(names)
    if unknown:  # a typo here silently strands a query past the window
        raise ValueError(f"catalog priority lists name unknown queries: {unknown}")
    original_pos = {n: i for i, n in enumerate(names)}
    canary_pos = {n: i for i, n in enumerate(_CANARY)}
    stale_pos = {n: i for i, n in enumerate(_STALE_R7)}

    def key(name: str) -> tuple[int, int]:
        if name in canary_pos:
            return (0, canary_pos[name])
        if name in stale_pos:
            return (1, stale_pos[name])
        module = QUERIES[name].__module__.rsplit(".", 1)[-1]
        return (_FAMILY_PRIORITY.get(module, 9), original_pos[name])

    ordered = sorted(names, key=key)
    items = [(n, QUERIES[n]) for n in ordered]
    QUERIES.clear()
    QUERIES.update(items)


_reorder()

__all__ = ["QUERIES", "ORACLES"]
