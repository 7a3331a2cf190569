"""Mergeable frequency sketches: distributed heavy hitters.

The reference has no aggregation at all (SURVEY.md §2A bottom); this is
north-star "Sketches" surface alongside the HLL distinct-count rollup
(plans/advanced.py): one-pass, bounded-memory frequent-items detection
that still returns EXACT answers.

Misra-Gries at 100 TB
---------------------
A plain ``groupBy(key).count()`` shuffles every distinct key; when the
question is only "which keys exceed phi = 1/k of the stream" that is
wasted movement — the answer has at most ``k-1`` rows. The classic
two-phase shape used here:

1. **Per-partition Misra-Gries summaries** (``mapInPandas``): each task
   streams its Arrow batches through at most ``k`` counters (the
   decrement step evicts all keys when a new key arrives and the table
   is full). Memory is O(k) per task regardless of partition size or
   distinct-key count — THE property a value_counts()-style local
   aggregate lacks.
2. **Candidate merge + exact verify**: summaries are tiny (≤ k rows per
   partition) so the merged candidate set is bounded by k × partitions;
   a second scan counts ONLY candidate keys (broadcast semi-filter — no
   full-key shuffle) and keeps those with true count > n/k.

Guarantee (why no heavy hitter is missed): per-partition MG undercounts
any key by at most n_p/k; summing summaries across partitions
undercounts by at most Σ n_p/k = n/k. A key with true count > n/k
therefore has a positive merged estimate, i.e. it appears among the
candidates, and the exact pass then reports its true count. False
positives are impossible by construction (exact verification).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_partition(batches: Iterator[pd.DataFrame], k: int) -> Iterator[pd.DataFrame]:
    """Stream one partition's batches through a k-counter Misra-Gries
    table; emit the surviving (key, lower-bound count) rows plus one
    sentinel row (key=None) carrying the partition's total row count."""
    counters: dict = {}
    total = 0
    for pdf in batches:
        # total counts EVERY row, null keys included — value_counts drops
        # nulls, so accumulating total from it would silently shrink the
        # n/k threshold relative to the count(*)-based contract whenever
        # the key column contains NULLs.
        total += len(pdf)
        # value_counts per Arrow batch is safe (batch-bounded), then the
        # batch's counts fold into the bounded MG table.
        for key, cnt in pdf.iloc[:, 0].value_counts().items():
            if key in counters:
                counters[key] += int(cnt)
            elif len(counters) < k:
                counters[key] = int(cnt)
            else:
                # decrement-all by the incoming weight, capped at the
                # smallest counter (weighted MG step, Berinde et al.)
                dec = min(int(cnt), min(counters.values()))
                counters = {
                    ky: c - dec for ky, c in counters.items() if c - dec > 0
                }
                rem = int(cnt) - dec
                if rem > 0 and len(counters) < k:
                    counters[key] = rem
    out = pd.DataFrame(
        {
            "key": list(counters.keys()) + [None],
            "est": list(counters.values()) + [0],
            "part_n": [0] * len(counters) + [total],
        }
    )
    yield out


def heavy_hitters(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Exact keys with frequency > n/k via Misra-Gries candidates + an
    exact verification pass. Returns (key, cnt) with true counts.

    Null contract: ``n`` is count(*) over ALL rows (null keys included),
    matching a SQL ``HAVING count(*) > (SELECT count(*) FROM t)/k``
    threshold; NULL itself is never reported as a heavy hitter (SQL
    GROUP BY would report it — callers needing that should coalesce the
    key to a sentinel first).

    Plan shape: scan #1 is narrow (mapInPandas, no shuffle) and reduces
    to ≤ k rows/partition; the summary union aggregates on the driver-
    side-sized candidate table; scan #2 filters to candidate keys
    (broadcast isin-style semi-join) before a hash aggregate whose
    distinct-key domain is ≤ k × partitions. No full-cardinality shuffle
    anywhere."""
    keyed = df.select(F.col(key_col).cast("string").alias("key"))
    summaries = keyed.mapInPandas(
        lambda it: _mg_partition(it, k),
        schema="key string, est bigint, part_n bigint",
    )
    # Tiny by construction (≤ (k+1) rows × partitions): merge summaries,
    # split into the candidate key set and the global count n. The only
    # driver-side value is n (one row); candidates stay a DataFrame and
    # reach scan #2 as a broadcast semi-join, never an IN-literal list.
    merged = summaries.groupBy("key").agg(
        F.sum("est").alias("est"), F.sum("part_n").alias("pn")
    )
    merged = merged.persist()
    try:
        n = int(merged.agg(F.sum("pn")).collect()[0][0])
        candidates = merged.where(
            F.col("key").isNotNull() & (F.col("est") > 0)
        ).select("key")
        exact = (
            keyed.join(F.broadcast(candidates), "key", "left_semi")
            .groupBy("key")
            .agg(F.count("*").alias("cnt"))
            .where(F.col("cnt") > F.lit(n / k))
        )
        # Materialize eagerly so unpersisting the summary table is safe.
        return exact.localCheckpoint(eager=True)
    finally:
        merged.unpersist()
