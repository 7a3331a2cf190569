"""Driver-checkable LAYOUT queries: Z-order clustering and small-file
compaction produce value as file layout, not rows — previously pytest-only
(VERDICT r4 §missing #8). These queries make the layout itself
hash-comparable: each writes a small table to a scratch dir, inspects the
parquet footers/file listing driver-side (bounded: tens of files), and
returns ONE deterministic summary row whose only engine-specific
quantities leave as robust threshold booleans — the same discipline as the
approx-gate queries (plans/llm.py). The row count crosses engines for
real (DuckDB counts the same source table), so the oracle check is not
all-literal.
"""

from __future__ import annotations

import math
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StructField,
    StructType,
)

from ..schemas import read_sf_parquet
from .relational import register


def _parquet_footer_stats(files: list[str], cols: list[str]) -> list[dict]:
    """Per-file (min, max, rows) for ``cols`` from parquet footers via
    pyarrow — driver-side over a BOUNDED file list (the layout operators
    cap output files), never reading data pages."""
    import pyarrow.parquet as pq

    out = []
    for fp in files:
        md = pq.ParquetFile(fp.removeprefix("file:")).metadata
        mins: dict[str, float] = {}
        maxs: dict[str, float] = {}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    s = col.statistics
                    mins[name] = min(mins.get(name, s.min), s.min)
                    maxs[name] = max(maxs.get(name, s.max), s.max)
        out.append({"rows": md.num_rows, "mins": mins, "maxs": maxs})
    return out


_ZORDER_SCHEMA = StructType(
    [
        StructField("rows", LongType(), False),
        StructField("n_files_ok", BooleanType(), False),
        StructField("rows_preserved", BooleanType(), False),
        StructField("all_cols_clustered", BooleanType(), False),
    ]
)


@register(
    "layout_zorder_stats",
    """
    SELECT CAST(count(*) AS BIGINT) AS rows,
           TRUE AS n_files_ok,
           TRUE AS rows_preserved,
           TRUE AS all_cols_clustered
    FROM lineitem
    """,
)
def layout_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) rewrite of lineitem on (l_extendedprice,
    l_quantity) — operators/scale.py write_zordered — summarized from the
    parquet FOOTERS it produced: row preservation, the file budget, and
    per-column clustering quality. Clustering leaves as a threshold
    boolean: for every clustered column the mean per-file min/max span
    must be < 0.5x the global span (true Z-order on 2 cols x 32 files
    yields ~N^(-1/2) ~= 0.18x; an unclustered write yields ~1.0x — wide
    deterministic margin either side). The rows column is the real
    cross-engine check (DuckDB counts the same source table)."""
    from ..operators.scale import write_zordered

    cols = ["l_extendedprice", "l_quantity"]
    n_files = 32
    df = read_sf_parquet(spark, sf_dir, "lineitem").select(
        "l_orderkey", *cols
    )
    src_rows = df.count()
    dest = tempfile.mkdtemp(prefix="layout_zorder_")
    try:
        write_zordered(df, dest, cols, n_files=n_files, bits=8)
        written = spark.read.parquet(dest)
        files = written.inputFiles()
        stats = _parquet_footer_stats(files, cols)
        out_rows = sum(s["rows"] for s in stats)
        clustered = True
        for c in cols:
            gmin = min(s["mins"][c] for s in stats)
            gmax = max(s["maxs"][c] for s in stats)
            spans = [s["maxs"][c] - s["mins"][c] for s in stats]
            mean_span = sum(spans) / len(spans)
            clustered = clustered and (
                mean_span < 0.5 * (float(gmax) - float(gmin))
            )
        row = (
            int(src_rows),
            len(files) == n_files,
            out_rows == src_rows,
            bool(clustered),
        )
    finally:
        shutil.rmtree(dest, ignore_errors=True)
    return spark.createDataFrame([row], _ZORDER_SCHEMA)


_COMPACT_SCHEMA = StructType(
    [
        StructField("rows", LongType(), False),
        StructField("files_reduced_4x", BooleanType(), False),
        StructField("rows_preserved", BooleanType(), False),
        StructField("partitioning_kept", BooleanType(), False),
    ]
)


@register(
    "layout_compact_stats",
    """
    SELECT CAST(count(*) AS BIGINT) AS rows,
           TRUE AS files_reduced_4x,
           TRUE AS rows_preserved,
           TRUE AS partitioning_kept
    FROM events
    """,
)
def layout_compact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction (operators/maintenance.py
    compact_partitioned) over a deliberately fragmented copy of events
    (8 files per event_type partition — a streaming sink's day-after
    state in miniature). Summary: >=4x file-count reduction (target-sized
    output vs micro-batch fragments), row preservation, and the Hive
    partition layout surviving the rewrite. rows crosses engines via the
    DuckDB count of the same source table."""
    from ..operators.maintenance import compact_partitioned
    from ..schemas import load_events

    ev = load_events(spark, sf_dir)
    src_rows = ev.count()
    frag = tempfile.mkdtemp(prefix="layout_frag_")
    dest = tempfile.mkdtemp(prefix="layout_compact_")
    try:
        # fragment: 8 writer tasks per partition dir
        (
            ev.repartition(8)
            .write.mode("overwrite")
            .partitionBy("event_type")
            .parquet(frag)
        )
        res = compact_partitioned(
            spark, frag, ["event_type"], dest, target_file_bytes=256 * 1024 * 1024
        )
        back = spark.read.parquet(dest)
        out_rows = back.count()
        kept = sorted(
            r.event_type for r in back.select("event_type").distinct().collect()
        ) == sorted(r.event_type for r in ev.select("event_type").distinct().collect())
        row = (
            int(src_rows),
            res["files_after"] * 4 <= res["files_before"],
            out_rows == src_rows,
            bool(kept),
        )
    finally:
        shutil.rmtree(frag, ignore_errors=True)
        shutil.rmtree(dest, ignore_errors=True)
    return spark.createDataFrame([row], _COMPACT_SCHEMA)


@register(
    "io_format_roundtrip",
    """
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
)
def io_format_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch source-format coverage (SURVEY §2B scans row): nation writes
    to CSV (quoted header), JSON lines, and ORC, reads back through each
    format's scan with an explicit schema, and returns only the rows ALL
    THREE roundtrips agree on (3-way unionByName, group on every column,
    keep count==3). Any format that drops, duplicates, or corrupts a
    value changes the returned row set, so the oracle's plain
    ``SELECT * FROM nation`` hash-checks every cell through every codec.
    The result is localCheckpointed before the scratch dirs are removed
    (bounded: |nation| = 25 rows at every SF)."""
    nation = read_sf_parquet(spark, sf_dir, "nation")
    cols = nation.columns
    root = tempfile.mkdtemp(prefix="io_roundtrip_")
    try:
        nation.write.mode("overwrite").option("header", "true").csv(f"{root}/csv")
        nation.write.mode("overwrite").json(f"{root}/json")
        nation.write.mode("overwrite").orc(f"{root}/orc")
        schema = nation.schema
        csv_df = (
            spark.read.schema(schema).option("header", "true").csv(f"{root}/csv")
        )
        json_df = spark.read.schema(schema).json(f"{root}/json")
        orc_df = spark.read.orc(f"{root}/orc")
        agreed = (
            csv_df.unionByName(json_df)
            .unionByName(orc_df)
            .groupBy(*cols)
            .agg(F.count("*").alias("_n"))
            .where(F.col("_n") == 3)
            .select(*cols)
        )
        return agreed.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_BUCKETED_SCHEMA = StructType(
    [
        StructField("rows", LongType(), False),
        StructField("shuffle_free_join", BooleanType(), False),
        StructField("bucket_pruned_scan", BooleanType(), False),
    ]
)


@register(
    "layout_bucketed_join",
    """
    SELECT CAST(count(*) AS BIGINT) AS rows,
           TRUE AS shuffle_free_join,
           TRUE AS bucket_pruned_scan
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_quantity > 25
    """,
)
def layout_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketing as a layout contract, driver-gated: lineitem and orders
    are persisted bucketed (8 buckets, same key) via
    operators/scale.write_bucketed, then sort-merge-joined — the plan
    must contain ZERO Exchange nodes (both sides read pre-shuffled
    buckets; at 100 TB this deletes the two largest shuffles of every
    recurring fact-fact join). A point-lookup on the bucket key must
    additionally scan 1 of 8 buckets (SelectedBucketsCount pruning).
    The rows column is the filtered join's real count, checked against
    DuckDB's count over the same source parquet — so the layout claim
    rides on a genuinely cross-engine result."""
    from ..operators.scale import read_table, write_bucketed

    li = read_sf_parquet(spark, sf_dir, "lineitem")
    o = read_sf_parquet(spark, sf_dir, "orders")
    t_li, t_o = "layout_bj_li", "layout_bj_o"
    try:
        write_bucketed(
            li.select("l_orderkey", "l_quantity"),
            t_li,
            "l_orderkey",
            8,
            sort_cols=["l_orderkey"],
        )
        write_bucketed(
            o.select("o_orderkey"), t_o, "o_orderkey", 8, sort_cols=["o_orderkey"]
        )
        a, b = read_table(spark, t_li), read_table(spark, t_o)
        joined = a.where(F.col("l_quantity") > 25).join(
            b.hint("merge"), a.l_orderkey == b.o_orderkey
        )
        join_plan = joined._jdf.queryExecution().executedPlan().toString()
        n = joined.count()
        # a bare point lookup saves no Exchange, so the planner's
        # auto-bucketed-scan turns bucketing off ("Bucketed: false
        # (disabled by query planner)") and with it the pruning; force the
        # bucketed scan to surface SelectedBucketsCount for the lookup
        auto_key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
        saved_auto = spark.conf.get(auto_key)
        try:
            spark.conf.set(auto_key, "false")
            lookup = a.where(F.col("l_orderkey") == 1)
            lookup_plan = lookup._jdf.queryExecution().executedPlan().toString()
            lookup.count()
        finally:
            spark.conf.set(auto_key, saved_auto)
        row = (
            int(n),
            "Exchange" not in join_plan,
            "SelectedBucketsCount: 1 out of 8" in lookup_plan,
        )
    finally:
        for t in (t_li, t_o):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
    return spark.createDataFrame([row], _BUCKETED_SCHEMA)


@register(
    "join_bloom_prefilter",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           TRUE AS no_false_negatives,
           TRUE AS fp_bound_ok
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT' AND year(o_orderdate) = 1994
    """,
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered selective join (operators/scale.py bloom_build /
    bloom_prefilter): urgent-1994 order keys build a ~10-bits/key bloom
    bitmap via a bounded groupBy(word).bit_or aggregation; the lineitem
    probe side is pre-filtered through the broadcast bitmap BEFORE the
    join shuffle, and the exact join then removes false positives.

    Gates, all computed in-plan and deterministic (xxhash64 positions):
    the prefiltered join reproduces the plain join exactly (zero false
    negatives — bloom's one-sided guarantee), and the bloom pass-through
    count stays inside 3x the DESIGN false-positive rate over the
    non-matching rows, with fpp derived from the actual (k, n, m) as
    (1 - exp(-k*n/m))**k rather than a hard-coded constant (ADVICE r7) —
    ~0.8% at m/n=10, k=7, so the bound is ~2.5%, tightening
    automatically when the m >= 1024 floor makes the filter sparser."""
    from ..operators.scale import bloom_build, bloom_prefilter

    o = read_sf_parquet(spark, sf_dir, "orders")
    # localCheckpoint both diamond-reused intermediates (the
    # triangle_count rule): keys feeds four consumers (count,
    # bloom_build, both joins) and the Arrow-UDF bloom probe is the
    # gate's most expensive stage — without truncation each consumer
    # re-scans and re-hashes its whole upstream
    keys = (
        o.where(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.year("o_orderdate") == 1994)
        )
        .select("o_orderkey")
        .localCheckpoint(eager=False)
    )
    n = keys.count()
    num_bits = max(1024, ((10 * n + 63) // 64) * 64)
    bitmap = bloom_build(keys, "o_orderkey", num_bits)
    # design fpp for k=7 hashes at the ACTUAL fill ratio (n may be far
    # below m/10 when the 1024-bit floor engaged)
    fp_design = (1.0 - math.exp(-7.0 * n / num_bits)) ** 7

    li = read_sf_parquet(spark, sf_dir, "lineitem")
    pre = bloom_prefilter(li, "l_orderkey", bitmap, num_bits).localCheckpoint(
        eager=False
    )
    # One pass over each side (r12; was two aggregates over pre + two
    # lineitem scans): a LEFT join against the key set lets a single
    # aggregate produce both the matched stats (n_items/revenue over
    # rows with a key hit — identical to the old inner-join aggregate)
    # and the unconditioned count (_bloom_pass / _total).
    matched = F.col("o_orderkey").isNotNull()
    res = (
        pre.join(keys, pre["l_orderkey"] == keys["o_orderkey"], "left")
        .agg(
            F.count(F.when(matched, 1)).cast("long").alias("n_items"),
            F.round(
                F.sum(
                    F.when(
                        matched,
                        F.col("l_extendedprice") * (1 - F.col("l_discount")),
                    )
                ),
                2,
            ).alias("revenue"),
            F.count("*").alias("_bloom_pass"),
        )
    )
    exact = li.join(keys, li["l_orderkey"] == keys["o_orderkey"], "left").agg(
        F.count(F.when(matched, 1)).alias("_exact_n"),
        F.count("*").alias("_total"),
    )
    return res.crossJoin(exact).select(
        "n_items",
        "revenue",
        (F.col("n_items") == F.col("_exact_n")).alias("no_false_negatives"),
        (
            F.col("_bloom_pass")
            <= F.col("_exact_n")
            + F.lit(3.0 * fp_design) * (F.col("_total") - F.col("_exact_n"))
        ).alias("fp_bound_ok"),
    )


@register(
    "io_schema_evolution",
    """
    SELECT n_nationkey, n_name,
           CASE WHEN n_nationkey < 13 THEN NULL
                ELSE CAST(n_nationkey * 10 AS BIGINT) END AS priority
    FROM nation
    """,
)
def io_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read (the add-a-column migration every long-lived
    table hits): an old batch written WITHOUT ``priority`` and a new
    batch WITH it live in one directory; ``mergeSchema=true`` reconciles
    the footers into the union schema and old rows surface the new
    column as NULL. The oracle recomputes the NULL/value split from the
    same key cutoff. At scale, mergeSchema is a read-time footer
    reconciliation (one pass over file footers at planning) — the
    alternative, rewriting history to backfill a column, is a full-table
    write; this query pins that the cheap path gives the right answer.
    Result is localCheckpointed before the scratch dir is removed
    (bounded: |nation| = 25 rows at every SF)."""
    nation = read_sf_parquet(spark, sf_dir, "nation")
    root = tempfile.mkdtemp(prefix="io_evolve_")
    try:
        old = nation.where(F.col("n_nationkey") < 13).select(
            "n_nationkey", "n_name"
        )
        new = nation.where(F.col("n_nationkey") >= 13).select(
            "n_nationkey",
            "n_name",
            (F.col("n_nationkey") * 10).cast("long").alias("priority"),
        )
        old.write.mode("append").parquet(f"{root}/t")
        new.write.mode("append").parquet(f"{root}/t")
        merged = spark.read.option("mergeSchema", "true").parquet(f"{root}/t")
        return merged.select(
            "n_nationkey", "n_name", "priority"
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
