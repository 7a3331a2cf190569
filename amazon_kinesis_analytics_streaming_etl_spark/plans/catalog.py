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

# Tier 1 rotates by signal AGE each round. Round-5 window (CORRECTNESS_r05,
# 50 entries) covered the canary + all 38 round-5 additions + the first 9
# r1-stale names (filter_predicates..agg_cube). Round 6 therefore
# front-loads: (a) queries NEW this round (never driver-checked), then
# (b) the 36 remaining queries whose only driver green is round 1
# (agg_grouping_sets..curation_sample — the judge's r5 full sweep
# re-proved them, but the driver artifact should too). Everything past
# the window falls through to family order (tpch first — its last driver
# check was r2/r3 except the canary).
_STALE_R6 = [
    # new in round 6 — never checked yet
    "parse_dead_letter",
    "pipeline_fanout_replay",
    "sketch_theta_audience",
    "sketch_cms_freq",
    "kinesis_sink_roundtrip",
    "es_upsert_idempotent",
    "file_sink_partition_layout",
    "serialize_projection_contract",
    "file_sink_json_rows",
    "kafka_sink_roundtrip",
    "hybrid_rrf_retrieval",
    # oldest driver signal (round 1), staleness rotation
    "agg_grouping_sets",
    "agg_having",
    "agg_count_distinct",
    "agg_percentiles",
    "agg_stats",
    "agg_corr_covar",
    "window_rank_family",
    "window_rank_dense",
    "window_lag_lead",
    "window_running_sum",
    "window_topk_per_group",
    "topk_global",
    "set_union",
    "set_union_by_name",
    "set_intersect",
    "set_intersect_all",
    "set_except",
    "set_except_all",
    "scalar_math",
    "scalar_string",
    "scalar_datetime",
    "scalar_conditional",
    "scalar_intervals",
    "json_extract_props",
    "semi_structured_arrays",
    "explode_tokens",
    "posexplode_tokens",
    "hof_array_ops",
    "map_roundtrip",
    "unpivot_metrics",
    "sql_subqueries",
    "asof_join_events",
    "time_bucket_rollup",
    "sessionize_events",
    "salted_agg_events",
    "curation_sample",
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
    unknown = (set(_CANARY) | set(_STALE_R6)) - set(names)
    if unknown:  # a typo here silently strands a query past the window
        raise ValueError(f"catalog priority lists name unknown queries: {unknown}")
    original_pos = {n: i for i, n in enumerate(names)}
    canary_pos = {n: i for i, n in enumerate(_CANARY)}
    stale_pos = {n: i for i, n in enumerate(_STALE_R6)}

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
