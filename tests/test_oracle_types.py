"""Machine-enforced sweep over every registered oracle's output types.

DuckDB widens uncast integer aggregates (sum/product over INTEGER) to
HUGEINT, while the Spark side emits BIGINT — a type-level hash mismatch
that has bitten twice (text_pii_scrub r3, pack_sequences r2). This sweep
DESCRIBEs every oracle (plans without executing, so it is cheap and
covers all of them) and rejects HUGEINT/INT128 columns: the repo
convention is an explicit CAST(... AS BIGINT) in the oracle SQL wherever
an integer aggregate reaches the result surface.
"""

from __future__ import annotations

import duckdb
import pytest

SF = "/root/testdata/sf0.001"

# The canonical table list lives in tools/check_correctness.py (r11
# ADVICE: one definition, imported everywhere, so adding a table cannot
# desync the gates from each other or from this sweep).
import os as _os
import sys as _sys

_TOOLS = _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))), "tools")
if _TOOLS not in _sys.path:
    _sys.path.insert(0, _TOOLS)
from check_correctness import TABLES  # noqa: E402


@pytest.fixture(scope="module")
def oracle_catalog():
    import os
    import sys

    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    sys.path.insert(0, ".")
    from amazon_kinesis_analytics_streaming_etl_spark.plans.catalog import ORACLES

    return ORACLES


def test_no_hugeint_in_any_oracle_schema(oracle_catalog):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    offenders = {}
    for name, sql in oracle_catalog.items():
        rows = con.sql(f"DESCRIBE {sql}").fetchall()
        bad = [
            (col, dtype)
            for col, dtype, *_ in rows
            if "HUGEINT" in dtype.upper() or "INT128" in dtype.upper()
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracle SQL with uncast integer aggregates (DuckDB HUGEINT vs "
        f"Spark BIGINT hash mismatch): {offenders}"
    )
