"""Local mirror of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and, where an oracle exists, the
same-named ``oracle_sql()`` on DuckDB over the same parquet tables;
compares row count, column names (sorted), and an order-insensitive
canonical value multiset. Usage:

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

# Explicit script-derived paths (not '.'): the tool must import
# __spark_entry__ (repo root) and stay importable as a sibling module
# regardless of the caller's cwd (r11 ADVICE — mirrors
# oracle_order_audit.py's fix; preland.py's cwd=_ROOT masked this).
_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

# THE canonical table list for every gate tool (r11 ADVICE: this was
# hard-coded in three tools; a table added to one could silently desync
# the Spark-layout leg from the correctness gate). scramble_layout.py
# and oracle_order_audit.py import it from here.
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon_cell(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ").replace("+00:00", "")
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon_cell(r[i]) for i in order) for r in rows)


def main():
    import duckdb

    from amazon_kinesis_analytics_streaming_etl_spark.session import get_spark
    from __spark_entry__ import oracle_sql, queries

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        # tables may be a single file (the generated testdata) or a
        # directory of part-files (e.g. a scrambled/repartitioned copy
        # for layout-independence runs); duckdb needs a glob for dirs
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

    qs, oracles = queries(), oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: SPARK ERROR {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows ({dt:.1f}s) [no oracle]")
            n_rowsonly += 1
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = [d[0] for d in rel.description]
            drows = rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: ORACLE ERROR {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duckdb={sorted(dcols)}")
        if not problems:
            sc, dc = canon_rows(scols, srows), canon_rows(dcols, drows)
            if sc != dc:
                diff = [(a, b) for a, b in zip(sc, dc) if a != b][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(srows)} rows ({dt:.1f}s)")
            n_pass += 1
    unknown = only - set(qs)
    if unknown:  # a typo'd name must not pass the gate vacuously
        print(f"FAIL  unknown query name(s): {sorted(unknown)}")
        n_fail += len(unknown)
    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
