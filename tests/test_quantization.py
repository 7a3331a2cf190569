"""Pin the micro-unit quantizer convention used for cross-engine greedy
decisions (sim_mmr_rerank, plans/llm.py): integer quantization must be
HALF-AWAY-FROM-ZERO to match DuckDB round() and Spark F.round (both
HALF_UP), because np.rint is half-to-even and diverges on exact .5
ties — a divergent tie can flip a greedy selection and cascade.

The formula under test mirrors plans/llm.py::sim_mmr_rerank's _q6
(sign-aware floor(|x|*1e6 + 0.5)); duckdb is executed directly as the
ground truth for round(x*1e6).
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


def q6(x):
    x = np.asarray(x, dtype=np.float64)
    return (np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5)).astype(np.int64)


# Exact .5 micro-unit ties: representable-in-binary cases where the
# half-to-even/half-away split is visible (x*1e6 lands exactly on .5).
_TIES = [1.5e-6, 2.5e-6, -1.5e-6, -2.5e-6, 0.0000035, -0.0000125]


def test_half_away_on_exact_ties_matches_duckdb():
    import duckdb

    got = q6(_TIES)
    want = [
        duckdb.sql(f"SELECT CAST(round({x!r} * 1000000) AS BIGINT)").fetchone()[0]
        for x in _TIES
    ]
    assert got.tolist() == want


def test_rint_would_diverge_on_ties():
    # Documents WHY the sign-aware floor formula exists: np.rint
    # (half-to-even) disagrees with SQL round on half of the exact ties.
    rint = np.rint(np.array(_TIES) * 1e6).astype(np.int64)
    assert rint.tolist() != q6(_TIES).tolist()


@settings(max_examples=300, deadline=None)
@given(st.floats(min_value=-1.0, max_value=1.0, allow_nan=False))
def test_q6_matches_duckdb_round_on_cosine_domain(x):
    import duckdb

    want = duckdb.sql(
        f"SELECT CAST(round(CAST({x!r} AS DOUBLE) * 1000000) AS BIGINT)"
    ).fetchone()[0]
    assert int(q6([x])[0]) == want


def test_q6_formula_is_in_sync_with_llm_source():
    # Guard against the test silently testing a stale copy: the exact
    # formula string must still appear in plans/llm.py.
    import os

    src_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "amazon_kinesis_analytics_streaming_etl_spark",
        "plans",
        "llm.py",
    )
    with open(src_path) as f:
        src = f.read()
    assert "np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5)" in src
