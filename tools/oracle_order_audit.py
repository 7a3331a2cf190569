"""Empirical input-order-sensitivity audit of every oracle.

The two round-10 ADVICE findings (sum_safe_div, the MMR quantizer) were
order-/rounding-seam bugs found by hand review. This tool mechanizes
the detection: every ``oracle_sql()`` runs three times in DuckDB — once
over the normal parquet views, then over two materialized copies of the
tables whose ROW ORDER is scrambled with different seeds — and any
query whose canonical (row-sorted, 9dp-rounded) output differs between
runs has an input-order-dependent accumulation seam: exactly the class
where DuckDB's double accumulation can drift from Spark's at larger
SFs and straddle the output rounding boundary.

A flagged query is not necessarily WRONG today (the sweeps prove both
engines agree on this data) — it names the oracles whose agreement
depends on accumulation order, i.e. the ones the float32-squash /
coarser-rounding conventions exist for. Usage:

    python tools/oracle_order_audit.py [sf_dir] [query ...]

Prefix a query with ``!`` to exclude it instead. (Round 11 removed the
last standing exclusion: graph_triangle_count's oracle CTEs are now
MATERIALIZED-hinted, so its DuckDB plan no longer goes quadratic on
scrambled copies and the full catalog audits at sf0.1 too.)

Exit status: nonzero on any ERR, and on any SENSITIVE finding unless
``--sensitive-ok`` is passed — this tool is a standing pre-land gate
for new or changed oracles, so order sensitivity must fail CI.
"""

from __future__ import annotations

import os
import sys
import time

# Explicit paths (not '.'): the tool must import both check_correctness
# (sibling in tools/) and __spark_entry__ (repo root) regardless of the
# caller's cwd or embedding (r10 ADVICE: '.'-relative breaks module use).
_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

# TABLES shared with the correctness gate (r11 ADVICE: one canonical
# list so adding a table cannot desync the audit legs from the gate).
from check_correctness import TABLES, canon_rows  # noqa: E402


def _connect(sf_dir: str, seed: float | None, threads: int | None = None):
    import duckdb

    con = duckdb.connect()
    if threads is not None:
        # a different thread count changes DuckDB's parallel partial-sum
        # merge order even on identical row order — a seam source the
        # scrambles alone cannot reach
        con.execute(f"PRAGMA threads={threads}")
    if seed is None:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
    else:
        # Materialized scrambled copies: same multiset of rows, a
        # different physical order per seed. setseed makes the shuffle
        # reproducible so a flagged query can be re-run and debugged.
        con.execute(f"SELECT setseed({seed})")
        for t in TABLES:
            con.execute(
                f"CREATE TABLE {t} AS "
                f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet') "
                f"ORDER BY random()"
            )
    return con


def first_diff(base, variants):
    """First differing (base, variant) canonical-row pair across the
    variant runs. zip_longest + a next() default: a pure row-COUNT
    difference has no differing aligned pair, which made the original
    bare next()/zip raise StopIteration and kill the whole audit
    (r10 ADVICE)."""
    from itertools import zip_longest

    return next(
        (
            (a, b)
            for rows in variants
            for a, b in zip_longest(base, rows, fillvalue="<missing row>")
            if a != b
        ),
        ("<no aligned diff>", "<no aligned diff>"),
    )


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = {a for a in argv[1:] if not a.startswith("!")}
    exclude = {a[1:] for a in argv[1:] if a.startswith("!")}

    from __spark_entry__ import oracle_sql

    oracles = oracle_sql()
    cons = [
        ("baseline", _connect(sf_dir, None)),
        ("scramble_a", _connect(sf_dir, 0.17)),
        ("scramble_b", _connect(sf_dir, 0.83)),
        ("single_thread", _connect(sf_dir, None, threads=1)),
    ]
    n_stable = n_sensitive = n_err = 0
    for name, sql in oracles.items():
        if (only and name not in only) or name in exclude:
            continue
        t0 = time.time()
        outs = []
        err = None
        for label, con in cons:
            try:
                rel = con.sql(sql)
                cols = [d[0] for d in rel.description]
                outs.append((label, canon_rows(cols, rel.fetchall())))
            except Exception as e:  # pragma: no cover - surfaced to stdout
                err = f"{label}: {type(e).__name__}: {e}"
                break
        dt = time.time() - t0
        if err:
            print(f"ERR       {name}: {err}")
            n_err += 1
            continue
        base = outs[0][1]
        diffs = [lbl for lbl, rows in outs[1:] if rows != base]
        if diffs:
            first = first_diff(base, [r for lbl, r in outs[1:] if r != base])
            print(
                f"SENSITIVE {name}: differs under {','.join(diffs)} "
                f"({dt:.1f}s) first diff: {first}"
            )
            n_sensitive += 1
        else:
            print(f"stable    {name} ({dt:.1f}s)")
            n_stable += 1
    # A typo'd name must not pass the gate vacuously — positional names
    # AND '!'-prefixed exclusions (r11 ADVICE: a typo'd exclusion used
    # to silently exclude nothing while the gate still exited 0).
    unknown = (only | exclude) - set(oracles)
    if unknown:
        print(f"ERR       unknown query name(s): {sorted(unknown)}")
        n_err += len(unknown)
    print(f"\n{n_stable} stable, {n_sensitive} order-sensitive, {n_err} error")
    # Sensitive findings are audit FAILURES for scripted/CI use (r10
    # ADVICE): a standing gate must not exit 0 over an order-sensitive
    # oracle. --sensitive-ok downgrades them for exploratory runs.
    if n_err:
        return 1
    if n_sensitive and "--sensitive-ok" not in sys.argv:
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
