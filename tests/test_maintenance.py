"""Small-file compaction: fewer files, identical data."""

from __future__ import annotations

import glob
import shutil
import tempfile

from pyspark.sql import functions as F

from amazon_kinesis_analytics_streaming_etl_spark.operators.maintenance import (
    compact_partitioned,
)


def test_compact_partitioned(spark):
    src = tempfile.mkdtemp(prefix="frag_")
    dst = tempfile.mkdtemp(prefix="compacted_") + "/out"
    try:
        # simulate 6 micro-batches appending into 3 partition dirs
        for batch in range(6):
            (
                spark.range(batch * 100, (batch + 1) * 100)
                .select(
                    F.col("id"),
                    (F.col("id") % 3).cast("string").alias("part"),
                    F.rand(seed=batch).alias("v"),
                )
                .repartition(4)  # 4 writers x 3 dirs per batch => many files
                .write.mode("append")
                .partitionBy("part")
                .parquet(src)
            )
        before_rows = spark.read.parquet(src).count()
        stats = compact_partitioned(spark, src, ["part"], out_path=dst)
        assert stats["files_before"] > 12
        assert stats["files_after"] <= 3  # one file per partition at this size
        assert stats["files_after"] < stats["files_before"]
        after = spark.read.parquet(dst)
        assert after.count() == before_rows == 600
        assert len(glob.glob(dst + "/part=*/*.parquet")) == stats["files_after"]
        # values survive: checksum both sides
        a = spark.read.parquet(src).agg(F.sum("id"), F.round(F.sum("v"), 6)).collect()[0]
        b = after.agg(F.sum("id"), F.round(F.sum("v"), 6)).collect()[0]
        assert tuple(a) == tuple(b)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(dst.rsplit("/", 1)[0], ignore_errors=True)
