"""Materialize a synthetic larger-SF testdata layout by unioning N
key-shifted replicas of an existing SF dir (r11 verdict #2: the
float32-squash precision ceiling had never been probed above sf0.1 —
/root/testdata is read-only, so saturation evidence needs a synthetic
build).

Every id/key column (PKs and the FKs that reference them) shifts by
``replica_index * STRIDE`` so replicas stay join-consistent and unique
keys stay unique, while every GROUPING attribute (event_type, lang,
source, ts calendar buckets, names, measures) is left untouched — each
aggregation group therefore accumulates N× the mass, which is exactly
the double-accumulation saturation the squash/rounding conventions
guard against. Replica 0 is the identity, so the source data is a
subset of the output.

    python tools/make_sf_replica.py /root/testdata/sf0.1 /tmp/sf1_replica 10
    python tools/check_correctness.py /tmp/sf1_replica <query ...>
    python tools/oracle_order_audit.py /tmp/sf1_replica <query ...>

Tables are written as SINGLE parquet files via DuckDB COPY so every
gate tool (plain ``read_parquet`` and Spark alike) reads them directly.
"""

from __future__ import annotations

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from check_correctness import TABLES  # noqa: E402

# Larger than any key at the SFs this runs on (sf0.1 max key ~1.5e6)
# and even, so id-parity-derived cohorts (e.g. embedding_drift_shift's
# vec_id % 2) split replicas the same way they split the source.
STRIDE = 100_000_000

# id/key columns to shift per table; everything else passes through.
SHIFT_COLS = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey", "n_regionkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    src, dst = sys.argv[1], sys.argv[2]
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    import duckdb

    con = duckdb.connect()
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        cols = [
            d[0]
            for d in con.sql(
                f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
            ).fetchall()
        ]
        shift = set(SHIFT_COLS[t])
        unknown = shift - set(cols)
        if unknown:
            raise SystemExit(f"{t}: shift columns not in schema: {unknown}")
        proj = ", ".join(
            f"({c} + r.i * {STRIDE})::BIGINT AS {c}" if c in shift else c
            for c in cols
        )
        con.execute(
            f"COPY (SELECT {proj} "
            f"FROM read_parquet('{src}/{t}.parquet'), range({copies}) r(i)) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
        print(f"replicated {t}: {n} rows ({copies} copies)", flush=True)
    print(f"done: {dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
