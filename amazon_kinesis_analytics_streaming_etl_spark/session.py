"""SparkSession factory.

Centralizes the configuration that matters at 100 TB scale:

- AQE on (runtime coalescing, skew-join splitting, dynamic join selection).
- Shuffle partitions sized from the environment (local test default 32;
  on a real cluster set ``spark.sql.shuffle.partitions`` ~ 2-3x total cores
  or rely on AQE coalescing from a high initial value).
- UTC session timezone so timestamp semantics are stable across engines
  (the DuckDB oracle compares naive timestamps).
- Arrow enabled for the pandas-UDF paths (vectorized Python transfer).
- Broadcast threshold left at default (10 MB) — dimension tables (region,
  nation, customer, supplier, part at test SFs) broadcast automatically;
  large fact-fact joins shuffle on their keys.

The reference's analog is the Flink environment setup + KDA parallelism
config (reference: cdk/lib/streaming-etl.ts:134-151, parallelism 2); Spark's
equivalent dials are executor count x cores and shuffle partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "streaming-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``).
    On a real cluster, pass ``master=None`` with a pre-configured
    spark-submit environment; every setting here is also safe there.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.streaming.schemaInference", "false")
        # Local testing convenience; harmless under spark-submit on a cluster
        # (driver memory there comes from the submit conf).
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
