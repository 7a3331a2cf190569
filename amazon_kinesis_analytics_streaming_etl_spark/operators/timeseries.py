"""Time-series similarity search over keyed event streams.

Motif: find the keys whose recent value sequence best matches a query
pattern under z-normalized euclidean distance — the standard similarity
measure in streaming time-series search (cf. "Time Series Similarity
Search for Streaming Data in Distributed Systems", EDBT 2019; PAPERS.md).

Spark-first: the entire pipeline is JVM expressions — window row_number
for the recent-L slice, sort_array(collect_list(struct)) for an
order-guaranteed series (collect_list alone has NO ordering contract),
higher-order aggregate/zip_with for mean/std/distance. No UDF, one
shuffle on the key, top-k via TakeOrdered. At 100 TB the per-key state
is L doubles — collect_list is bounded by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import array_double_lit


def znormalize(values: list[float]) -> list[float]:
    """Driver-side z-normalization for the (small, constant) query
    pattern; population std, floored for constant series."""
    n = len(values)
    mu = sum(values) / n
    var = sum((v - mu) ** 2 for v in values) / n
    sd = max(var, 1e-12) ** 0.5
    return [(v - mu) / sd for v in values]


def znorm_series_topk(
    df: DataFrame,
    query: list[float],
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    k: int = 10,
    normalize_query: bool = True,
) -> DataFrame:
    """Top-k keys by z-normalized euclidean distance between each key's
    most recent ``len(query)`` values (time-ascending) and ``query``.

    Keys with fewer than ``len(query)`` events are excluded (no partial
    windows). Returns (key, dist) with dist rounded to 6dp, ordered by
    (dist, key) for determinism.
    """
    L = len(query)
    q = znormalize(query) if normalize_query else list(query)

    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).desc(), F.col(tiebreak_col).desc()
    )
    recent = (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= L)
        .select(key_col, ts_col, tiebreak_col, value_col)
    )
    # sort_array on (ts, tiebreak, value) structs -> time-ascending series
    series = (
        recent.groupBy(key_col)
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(ts_col, tiebreak_col, value_col))
                ),
                lambda s: s.getField(value_col),
            ).alias("s")
        )
        .where(F.size("s") == L)
    )

    s = F.col("s")
    mu = F.aggregate(s, F.lit(0.0), lambda a, x: a + x) / F.lit(float(L))
    msq = F.aggregate(s, F.lit(0.0), lambda a, x: a + x * x) / F.lit(float(L))
    stats = series.select(
        key_col,
        "s",
        mu.alias("_mu"),
        F.sqrt(F.greatest(msq - mu * mu, F.lit(1e-12))).alias("_sd"),
    )
    qlit = array_double_lit([float(v) for v in q])
    diff_sq = F.zip_with(
        s,
        qlit,
        lambda x, qv: ((x - F.col("_mu")) / F.col("_sd") - qv)
        * ((x - F.col("_mu")) / F.col("_sd") - qv),
    )
    dist = F.sqrt(F.aggregate(diff_sq, F.lit(0.0), lambda a, x: a + x))
    return (
        stats.select(key_col, F.round(dist, 6).alias("dist"))
        .orderBy("dist", key_col)
        .limit(k)
    )
