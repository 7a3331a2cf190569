"""Aggregated query catalog: importing this module registers every query
family into one (QUERIES, ORACLES) pair — the driver contract surface.

Iteration order is DELIBERATE: the driver walks ``queries()`` in order
under a ~50-query budget. Round 11 keeps the catalog frozen and
restores the changed-code-FIRST tier rule: the changed-oracle and
round-10-changed queries lead the window, then the round-4-signal
stragglers, then the
oldest round-5 signals — see the _STALE_R11 comment. In ordinary
rounds the catalog front-loads (a) a small TPC-H canary, then (b)
changed-code and stale-signal queries; everything exhaustively green
on unchanged code follows in family order. Within a tier, registration
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

# Round 11 keeps the catalog FROZEN (no new queries) and restores the
# changed-code-FIRST tier rule the round-10 freeze inverted (the r10
# verdict's #1 ask): the six oracles hinted MATERIALIZED this round
# (graph_triangle_count + the five other DuckDB re-inlining fixes)
# plus the six queries whose code or oracle changed in round 10 lead
# the window so every one of them gets a post-change driver green,
# then the 14 round-4-signal stragglers that spilled past the r10
# window, then the oldest round-5 signals fill the remaining 25 slots. The TPC-H canary stays suspended for one more round (the
# window is exactly full at 50); it resumes at the head of the
# post-window tail, followed by the round-5 spill, so any window
# overrun reaches the engine-wide canary and the next-oldest signals
# first.
_CANARY = ["q1_pricing_summary", "q5_region_revenue", "q9_product_profit"]

# Round-11 window: exactly 50 queries, three tiers, mechanically
# derived from tools/rotate_catalog.py over CORRECTNESS_r01..r10.
_STALE_R11 = [
    # ---- tier (a), positions 1-12: changed-code/changed-oracle queries
    # with no post-change driver green. Positions 1-6 changed THIS round
    # (DuckDB MATERIALIZED CTE hints — planner-only, verified
    # row-identical and preland-gated at both SFs — fixing the
    # re-inlining pathology that made these oracles minutes-slow at
    # sf0.1); positions 7-12 are the six round-10-changed queries the
    # r10 freeze placed at overrun positions 65-69, restored per the
    # tier rule. stream_static_enrich is ALSO a round-4-signal
    # straggler; it is listed once, here, in its higher tier.
    "graph_triangle_count",
    "dedup_clusters",
    "dedup_clusters_scale",
    "dedup_keep_best",
    "graph_kcore_trade",
    "ts_holt_linear",
    "scalar_try_arithmetic",
    "sim_mmr_rerank",
    "sketch_tdigest_rollup",
    "stream_tdigest_percentiles",
    "mv_incremental_refresh",
    "stream_static_enrich",
    # ---- tier (b), positions 13-25: the 13 remaining round-4-signal
    # stragglers that spilled past the round-10 window.
    "stream_sliding_counts",
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
    # ---- tier (c), positions 26-50: the 25 oldest round-5 signals
    # (rotate_catalog.py age order; mv_incremental_refresh already sits
    # in tier (a)). The 16 round-5 greens that do not fit (displaced by
    # the six changed-oracle promotions: join_right_outer .. agg_cube
    # and filter_predicates, plus the original json_variant_typed ..
    # layout_bucketed_join spill) lead the post-canary tail below and
    # head _STALE_R12.
    "hll_sketch_rollup",
    "heavy_hitters_lang",
    "table_diff_snapshots",
    "rolling_window_features",
    "drift_psi",
    "pattern_match_funnel",
    "rfm_segments",
    "text_lm_bigram_score",
    "dedup_ngram_prefix",
    "sim_topk_lsh_multitable",
    "sim_topk_ivf_trained",
    "sim_topk_pq",
    "dedup_semantic",
    "multimodal_frame_sample",
    "sample_weighted_topn",
    "train_test_split_leakfree",
    "sample_stratified",
    "embedding_matryoshka",
    "stream_chained_agg",
    "stream_left_outer_join",
    "stream_anomaly_flags",
    "stream_cdc_latest",
    "join_left_anti",
    "join_left_semi",
    "join_full_outer",
]

# Post-window overrun order: canary first (engine-wide breakage
# signal), then the round-5 greens that did not fit the window —
# the head of _STALE_R12.
_NEXT_OLDEST = [
    "join_right_outer",
    "join_cross",
    "join_enrich_events",
    "agg_rollup",
    "agg_cube",
    "filter_predicates",
    "json_variant_typed",
    "agg_mode_argmax",
    "sql_recursive_spine",
    "sql_lateral_topk",
    "join_null_safe",
    "salted_join_events",
    "layout_zorder_stats",
    "layout_compact_stats",
    "io_format_roundtrip",
    "layout_bucketed_join",
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
    listed = set(_CANARY) | set(_STALE_R11) | set(_NEXT_OLDEST)
    unknown = listed - set(names)
    if unknown:  # a typo here silently strands a query past the window
        raise ValueError(f"catalog priority lists name unknown queries: {unknown}")
    original_pos = {n: i for i, n in enumerate(names)}
    canary_pos = {n: i for i, n in enumerate(_CANARY)}
    stale_pos = {n: i for i, n in enumerate(_STALE_R11)}
    next_pos = {n: i for i, n in enumerate(_NEXT_OLDEST)}

    # Round 11: changed-code + stale window (tier 0, exactly 50), then
    # the resumed canary, then the round-5 spill, then family order.
    def key(name: str) -> tuple[int, int]:
        if name in stale_pos:
            return (0, stale_pos[name])
        if name in canary_pos:
            return (1, canary_pos[name])
        if name in next_pos:
            return (2, next_pos[name])
        module = QUERIES[name].__module__.rsplit(".", 1)[-1]
        return (_FAMILY_PRIORITY.get(module, 9), original_pos[name])

    ordered = sorted(names, key=key)
    items = [(n, QUERIES[n]) for n in ordered]
    QUERIES.clear()
    QUERIES.update(items)


_reorder()

__all__ = ["QUERIES", "ORACLES"]
