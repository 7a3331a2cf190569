"""Aggregated query catalog: importing this module registers every query
family into one (QUERIES, ORACLES) pair — the driver contract surface.

Iteration order is DELIBERATE: the driver walks ``queries()`` in order
under a ~50-query budget. Round 10 freezes the catalog and devotes the
ENTIRE window to the queries with the OLDEST driver signal (round 3/4)
— see the _STALE_R10 comment. In ordinary rounds the catalog
front-loads (a) a small TPC-H canary, then (b) changed-code and
stale-signal queries; everything exhaustively green on unchanged code
follows in family order. Within a tier, registration order is
preserved.
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

# Round 10 FREEZES the catalog (no new queries) and rotates the ENTIRE
# 50-query driver window to the 64 queries whose latest driver signal
# is round 3/4 (the round-9 verdict's #1 ask). The usual 3-query TPC-H
# canary is suspended this round: its engine-wide-breakage role is
# served by the eight TPC-H queries inside the stale set itself
# (q2/q4/q6/q7/q19-q22); it resumes at the head of the post-window
# tail. The two queries whose code changed this round (the low-ADVICE
# compare-convention hardenings: scalar_try_arithmetic's float32-squash
# and sim_mmr_rerank's half-away-from-zero quantization) carry fresh r9
# driver greens and are re-proved by the committed full-catalog local
# sweeps; they sit at positions 65-66 so any window overrun reaches
# them first.
_CANARY = ["q1_pricing_summary", "q5_region_revenue", "q9_product_profit"]

# The 64 stale queries, mechanically ordered by (latest-signal round,
# name) — tools/rotate_catalog.py output against CORRECTNESS_r01..r09.
# The 50-query window covers all 21 round-3 signals + the first 29
# round-4 signals; the 14 that spill (tail below, from
# stream_stateful_running_totals on) lead _STALE_R11.
_STALE_R10 = [
    # ---- changed-code tier is EMPTY this round by design (see above).
    # ---- latest driver signal round 3 (six rounds old) — all 21.
    "agg_approx_quantiles",
    "bm25_retrieval",
    "cdc_merge_customers",
    "curation_filter_reasons",
    "decontam_overlap",
    "dedup_clusters",
    "dedup_embedding",
    "dedup_exact",
    "dedup_levenshtein",
    "embedding_norm_stats",
    "histogram_extendedprice",
    "profile_columns",
    "q19_discounted_revenue",
    "q20_part_promotion",
    "q21_waiting_orders",
    "q22_sales_opportunity",
    "sim_topk_bruteforce",
    "text_repetition",
    "text_top_ngrams",
    "tfidf_top_keywords",
    "udtf_chunk_documents",
    # ---- latest driver signal round 4 — all 43, same mechanical order.
    "agg_approx_distinct",
    "agg_collect_set",
    "agg_pivot",
    "avro_roundtrip_events",
    "centroid_cohesion",
    "cohort_retention",
    "dedup_incremental",
    "dedup_keep_best",
    "embedding_quantize_int8",
    "funnel_stages",
    "global_rank_sampled",
    "interval_join_batch",
    "mixture_sample_sources",
    "multimodal_decode",
    "multimodal_features_topk",
    "multimodal_resize",
    "pack_sequences",
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "quality_expectations",
    "sim_topk_ivf",
    "sim_topk_lsh",
    "sim_topk_pairs_per_label",
    "skew_key_profile",
    "stream_dedup_users",
    "stream_incremental_topk",
    "stream_session_windows",
    # ---- window boundary (~position 50) falls here; the tail spills.
    "stream_sliding_counts",
    "stream_static_enrich",
    "stream_stateful_running_totals",
    "stream_stream_join_conversions",
    "stream_tumbling_counts",
    "text_fingerprint",
    "text_langid",
    "text_pii_scrub",
    "text_quality",
    "text_stats",
    "ts_similarity_topk",
    "udf_grouped_map_zscore",
    "udf_pandas_grouped_agg",
    "udf_pandas_normalize",
    # ---- positions 65-66: round-10 changed-code queries (r9-green,
    # re-proved in the committed local sweeps; first to benefit from
    # any window overrun).
    "scalar_try_arithmetic",
    "sim_mmr_rerank",
    # ---- positions 67-68: touched late in round 10 by the t-digest
    # build-path vectorization (boundary-parity property-tested,
    # oracle-checked at sf0.01, covered by the final local sweeps).
    "sketch_tdigest_rollup",
    "stream_tdigest_percentiles",
    # ---- position 69: float32-squash applied after
    # tools/oracle_order_audit.py caught a live input-order rounding
    # seam (re-proved PASS at sf0.01 and sf0.1, stable under scramble).
    "mv_incremental_refresh",
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
    unknown = (set(_CANARY) | set(_STALE_R10)) - set(names)
    if unknown:  # a typo here silently strands a query past the window
        raise ValueError(f"catalog priority lists name unknown queries: {unknown}")
    original_pos = {n: i for i, n in enumerate(names)}
    canary_pos = {n: i for i, n in enumerate(_CANARY)}
    stale_pos = {n: i for i, n in enumerate(_STALE_R10)}

    # Round 10: stale tier OUTRANKS the canary so the full 50-query
    # window lands on the 64 oldest signals (canary resumes right
    # after the changed-code slots).
    def key(name: str) -> tuple[int, int]:
        if name in stale_pos:
            return (0, stale_pos[name])
        if name in canary_pos:
            return (1, canary_pos[name])
        module = QUERIES[name].__module__.rsplit(".", 1)[-1]
        return (_FAMILY_PRIORITY.get(module, 9), original_pos[name])

    ordered = sorted(names, key=key)
    items = [(n, QUERIES[n]) for n in ordered]
    QUERIES.clear()
    QUERIES.update(items)


_reorder()

__all__ = ["QUERIES", "ORACLES"]
