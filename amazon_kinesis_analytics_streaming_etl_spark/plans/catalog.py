"""Aggregated query catalog: importing this module registers every query
family into one (QUERIES, ORACLES) pair — the driver contract surface.

Iteration order is DELIBERATE: the driver walks ``queries()`` in order
under a budget, so the catalog front-loads the highest-value families
(TPC-H shapes, then the LLM-data operators, then the streaming replays)
and leaves the fine-grained relational queries — cheapest and already
exhaustively driver-verified in round 1 — for last. Within a family,
registration order is preserved.
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

# Family priority by defining module (lower = earlier in queries()).
_FAMILY_PRIORITY = {
    "tpch": 1,
    "llm": 2,
    "curation": 2,
    "advanced": 2,
    "analytics": 2,
    "lexical": 2,
    "prep": 2,
    "vectors": 2,
    "streaming_queries": 3,
    "relational": 4,
}

# relational.py hosts three TPC-H shapes — rank them with the tpch family.
_FLAGSHIPS = {"q1_pricing_summary", "q3_shipping_priority", "q5_region_revenue"}


def _reorder() -> None:
    names = list(QUERIES)
    original_pos = {n: i for i, n in enumerate(names)}

    def key(name: str) -> tuple[int, int]:
        if name in _FLAGSHIPS:
            return (0, original_pos[name])
        module = QUERIES[name].__module__.rsplit(".", 1)[-1]
        return (_FAMILY_PRIORITY.get(module, 9), original_pos[name])

    ordered = sorted(names, key=key)
    items = [(n, QUERIES[n]) for n in ordered]
    QUERIES.clear()
    QUERIES.update(items)


_reorder()

__all__ = ["QUERIES", "ORACLES"]
