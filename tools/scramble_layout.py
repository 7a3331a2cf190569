"""Materialize a row-scrambled, multi-file COPY of a testdata SF dir —
the Spark-side leg of the standing order audit (SURVEY.md §5).

The DuckDB scrambles in tools/oracle_order_audit.py cannot exercise
SPARK's accumulation order. This script rewrites every table
``orderBy(rand(seed))`` into a MULTI-FILE directory (so Spark's scan
order, partition count, and partial-aggregation merge order all change
vs the single-file originals), preserving each table's exact schema.
Then the full gate runs against the copy:

    python tools/scramble_layout.py /root/testdata/sf0.01 /tmp/sf001_scrambled
    python tools/check_correctness.py /tmp/sf001_scrambled

check_correctness.py reads directory tables directly (it globs
``{table}.parquet/*.parquet`` when the path is a directory). A catalog
where both sweeps agree 276/276 has no query whose answer depends on
row order, file order, or partition count of its inputs — the
layout-independence a 1000-executor scan needs, machine-checked.
"""

from __future__ import annotations

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

# TABLES shared with the correctness gate (r11 ADVICE: one canonical
# list so adding a table cannot desync this layout leg from the gate).
from check_correctness import TABLES  # noqa: E402

_SEED = 41  # r10's layout-leg seed, kept for comparability
_FILES = 7  # deliberately != the 32 shuffle partitions and != 1


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    src, dst = sys.argv[1], sys.argv[2]
    from pyspark.sql import functions as F

    from amazon_kinesis_analytics_streaming_etl_spark.session import get_spark

    spark = get_spark("scramble-layout")
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        # parquet-level read (NOT schemas.load_*): the copy must carry the
        # source files' exact physical schema so gated dtype dispatch
        # (e.g. events.ts nanos-vs-micros) sees the same inputs.
        df = spark.read.parquet(f"{src}/{t}.parquet")
        (
            df.orderBy(F.rand(seed=_SEED))
            .repartition(_FILES)
            .write.mode("overwrite")
            .parquet(f"{dst}/{t}.parquet")
        )
        n_files = len(
            [f for f in os.listdir(f"{dst}/{t}.parquet") if f.endswith(".parquet")]
        )
        print(f"scrambled {t}: {df.count()} rows -> {n_files} files", flush=True)
    print(f"done: {dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
