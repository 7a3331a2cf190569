"""Table maintenance: small-file compaction for streaming sink output.

A continuously-running partitioned file sink (K1/K3) emits one-or-more
files per partition dir per micro-batch — after a day at 60 s triggers
that is ~1,440 files per dir, and at 100 TB the NameNode/S3-listing and
per-file open costs dominate scans. Compaction rewrites each partition
to ~target-sized files. The reference has no equivalent (its S3 output
just accumulates); this is standard lakehouse hygiene the engine needs
to be operable at scale.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def compact_partitioned(
    spark: SparkSession,
    path: str,
    partition_cols: list[str],
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Rewrite a Hive-partitioned parquet dataset with ~target-sized files.

    Sizing: total bytes / target gives the global file budget; a
    repartition on the partition columns (plus a within-partition
    splitter when a single partition exceeds the target several times
    over) yields one writer task per output file. Writes to ``out_path``
    (never in-place: Spark can't overwrite a path it is reading; swap
    via atomic rename/pointer-flip after the write).

    Returns {files_before, files_after, bytes}.
    """
    df = spark.read.parquet(path)
    # size the job from the filesystem, not a guess
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
    summary = fs.getContentSummary(jvm_path)
    total_bytes = summary.getLength()
    files_before = len(_iter_remote(fs, jvm_path))

    n_files = max(1, math.ceil(total_bytes / target_file_bytes))
    dest = out_path

    # split oversized partitions: a deterministic bucket column spreads a
    # partition's rows over ceil(partition_share) writers
    splits = max(1, math.ceil(n_files / max(1, df.select(*partition_cols).distinct().count())))
    compacted = df.withColumn(
        "_split", F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(splits))
    ).repartition(*[F.col(c) for c in partition_cols], F.col("_split")).drop("_split")

    (
        compacted.write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(dest)
    )
    files_after = len(_iter_remote(fs, spark._jvm.org.apache.hadoop.fs.Path(dest)))
    return {
        "files_before": files_before,
        "files_after": files_after,
        "bytes": total_bytes,
    }


def _iter_remote(fs, jvm_path) -> list:
    """List parquet data files under a path via the Hadoop FS API."""
    out = []
    it = fs.listFiles(jvm_path, True)
    while it.hasNext():
        status = it.next()
        name = status.getPath().getName()
        if name.endswith(".parquet") and not name.startswith(("_", ".")):
            out.append(status.getPath().toString())
    return out
