"""t1-style smoke of the driver contract + full oracle sweep at sf0.001
(the same comparison the driver runs at sf0.01, kept at smoke scale so the
suite stays fast)."""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def contract():
    import __spark_entry__ as mod

    return mod


def test_entry_returns_rows(spark, contract):
    df = contract.entry(spark)
    assert df.count() >= 1
    assert df.columns == ["n_name", "revenue"]


def test_every_query_has_callable_and_oracle_keys_align(contract):
    qs, oracles = contract.queries(), contract.oracle_sql()
    assert len(qs) >= 40
    assert set(oracles) <= set(qs)
    # every registered query is oracle-checkable: the approximate ops
    # (minhash/simhash/lsh/ivf) gate themselves against exact twins and
    # the multimodal fake codec is reproduced in SQL (md5 arithmetic)
    assert set(qs) - set(oracles) == set()


def test_all_oracle_queries_match_duckdb_at_smoke_scale(spark, contract):
    from tools.check_correctness import canon_rows

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    failures = []
    qs, oracles = contract.queries(), contract.oracle_sql()
    for name, sql in oracles.items():
        sdf = qs[name](spark, SF_SMOKE)
        scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
        rel = con.sql(sql)
        dcols, drows = [d[0] for d in rel.description], rel.fetchall()
        if sorted(scols) != sorted(dcols):
            failures.append(f"{name}: cols {sorted(scols)} != {sorted(dcols)}")
        elif canon_rows(scols, srows) != canon_rows(dcols, drows):
            failures.append(f"{name}: value mismatch ({len(srows)} vs {len(drows)} rows)")
    assert not failures, failures
