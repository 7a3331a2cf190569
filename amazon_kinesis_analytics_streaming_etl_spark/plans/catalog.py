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
from . import lexical as _lexical  # noqa: F401
from . import llm as _llm  # noqa: F401
from . import prep as _prep  # noqa: F401
from . import streaming_queries as _sq  # noqa: F401
from . import tpch as _tpch  # noqa: F401
from . import vectors as _vectors  # noqa: F401
from .relational import ORACLES, QUERIES

# Tier 0: always-on canary — cheap, high-signal TPC-H shapes.
_CANARY = ["q1_pricing_summary", "q5_region_revenue", "q9_product_profit"]

# Tier 1: stale on the latest driver signal as of round 3 —
# never window-checked in r1-r3, or FAIL/no_oracle on last check
# (VERDICT.md round 3, "Next round: do this" #3). Keep this list in sync
# with the newest CORRECTNESS_r*.json when rotating between rounds.
_STALE_R4 = [
    # latest-FAIL r3 (events dtype regression, fixed this round)
    "interval_join_batch",
    "udf_grouped_map_zscore",
    "funnel_stages",
    "cohort_retention",
    "gapfill_hourly",
    "skew_key_profile",
    "text_pii_scrub",
    # no_oracle / stale-FAIL since r1-r2
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_topk_lsh",
    "agg_collect_set",
    "agg_approx_distinct",
    # never checked by any round's 50-query window
    "sim_topk_ivf",
    "dedup_embedding_lsh",
    "sim_topk_pairs_per_label",
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
    "embedding_quantize_int8",
    "centroid_cohesion",
    "stream_tumbling_counts",
    "stream_sliding_counts",
    "stream_session_windows",
    "stream_dedup_users",
    "stream_stateful_running_totals",
    "stream_stream_join_conversions",
    "stream_incremental_topk",
    "stream_static_enrich",
    "ts_similarity_topk",
    "agg_pivot",
    "global_rank_sampled",
    # new in round 4 — never checked yet
    "mixture_sample_sources",
    "dedup_keep_best",
]

# Family priority by defining module for the already-green tail.
_FAMILY_PRIORITY = {
    "tpch": 3,
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
    unknown = (set(_CANARY) | set(_STALE_R4)) - set(names)
    if unknown:  # a typo here silently strands a query past the window
        raise ValueError(f"catalog priority lists name unknown queries: {unknown}")
    original_pos = {n: i for i, n in enumerate(names)}
    canary_pos = {n: i for i, n in enumerate(_CANARY)}
    stale_pos = {n: i for i, n in enumerate(_STALE_R4)}

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
