"""Aggregated query catalog: importing this module registers every query
family into one (QUERIES, ORACLES) pair — the driver contract surface."""

from __future__ import annotations

from . import llm as _llm  # noqa: F401  (registration side effects)
from . import streaming_queries as _sq  # noqa: F401
from . import tpch as _tpch  # noqa: F401
from .relational import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
