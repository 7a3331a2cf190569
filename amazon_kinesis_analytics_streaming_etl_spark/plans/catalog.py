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
from . import geo as _geo  # noqa: F401
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

# Tier 1 rotates by signal AGE each round, with one override: queries
# whose CODE changed this round outrank everything — a stale green on
# old code is safer than no green on new code. Order inside _STALE_R9:
# (A) code changed or NEW in round 9 (front of list; grows as the
# round progresses), (B) the queries whose latest driver signal is
# round 3 — the oldest in the catalog (q3/q8 got r8 signals, the rest
# did not), (C) round-4 signals as window spill. The driver window is
# ~50 queries: canary + A + B + the head of C fit. Everything that was
# r8-tier-A/B is now freshly green in CORRECTNESS_r08 and drops to the
# family-ordered tail.
_STALE_R9 = [
    # ---- tier A: code CHANGED or NEW in round 9 — re-proved first.
    # NEW in round 9 (late window): geospatial family
    "geo_haversine_speed",
    "geo_grid_hotspots",
    "geo_geohash_hotspots",
    "geo_zone_cell_join",
    "geo_nearest_poi",
    "stats_bootstrap_ci",
    "prep_dsir_weights",
    "prep_quantile_normalize",
    "ts_holt_linear",
    "multimodal_ahash_dedup",
    "stream_geo_hotspots",
    "text_token_fertility",
    "graph_hits_trade",
    "sim_mmr_rerank",
    "geo_dbscan_cells",
    "text_vocab_coverage",
    "agg_listagg",
    "scalar_try_arithmetic",
    "geo_od_flows",
    # asof.py order flip (forward tie fix) touches all three directions;
    # asof_join_forward is the new driver gate for the fixed path
    "asof_join_forward",
    "asof_join_nearest",
    "asof_join_events",
    # parse gate: repartition + materialize=True through split_corrupt
    "parse_dead_letter",
    # md5 fold bounds now first-hex-digit comparisons (equal quarters)
    "prep_target_encoding",
    # oracle cumsum window tiebreak (ts, event_id)
    "stream_dynamic_gap_sessions",
    # NEW in round 9: distributional-testing family
    "stats_ks_two_sample",
    "stats_spearman_corr",
    "stats_kruskal_wallis",
    "stats_levene_bf",
    # NEW in round 9: governance audits + time-bounded streaming dedup
    "privacy_k_anonymity",
    "dq_freshness_lag",
    "stream_dedup_within_watermark",
    # NEW in round 9: attribution / corpus-health / drift monitors
    "attribution_time_decay",
    "text_zipf_fit",
    "embedding_drift_shift",
    "stats_mad_by_type",
    "graph_personalized_pagerank",
    "text_readability",
    # ---- tier B: latest driver signal is round 3 (oldest in catalog).
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
    "dedup_levenshtein",
    "sim_topk_bruteforce",
    "dedup_clusters",
    "dedup_embedding",
    # ---- tier C: round-4 signals — window spill.
    "sim_topk_pairs_per_label",
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "interval_join_batch",
    "udf_grouped_map_zscore",
    "funnel_stages",
    "cohort_retention",
    "skew_key_profile",
    "text_pii_scrub",
    "sim_topk_lsh",
    "sim_topk_ivf",
    "text_stats",
    "text_langid",
    "text_fingerprint",
    "text_quality",
    "udf_pandas_normalize",
    "udf_pandas_grouped_agg",
    "multimodal_decode",
    "multimodal_resize",
    "multimodal_features_topk",
    "avro_roundtrip_events",
    "pack_sequences",
    "quality_expectations",
    "dedup_incremental",
    "mixture_sample_sources",
    "dedup_keep_best",
    "embedding_quantize_int8",
    "centroid_cohesion",
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
    unknown = (set(_CANARY) | set(_STALE_R9)) - set(names)
    if unknown:  # a typo here silently strands a query past the window
        raise ValueError(f"catalog priority lists name unknown queries: {unknown}")
    original_pos = {n: i for i, n in enumerate(names)}
    canary_pos = {n: i for i, n in enumerate(_CANARY)}
    stale_pos = {n: i for i, n in enumerate(_STALE_R9)}

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
