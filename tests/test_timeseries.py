"""znorm_series_topk vs a numpy reference on synthetic keyed series."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from amazon_kinesis_analytics_streaming_etl_spark.operators.timeseries import (
    znorm_series_topk,
    znormalize,
)


def _znorm(a):
    mu, sd = a.mean(), max(a.var(), 1e-12) ** 0.5
    return (a - mu) / sd


def test_znorm_topk_matches_numpy(spark):
    rng = np.random.RandomState(7)
    rows = []
    eid = 0
    for user in range(30):
        for t in range(12):  # 12 events per user
            rows.append((eid, user, t * 60, float(rng.randn())))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, value double"
    ).withColumn("ts", F.timestamp_seconds("ts"))
    query = [0.3, -1.0, 0.5, 2.0, -0.2, 0.0, 1.1, -0.6]

    got = [(r["user_id"], r["dist"]) for r in znorm_series_topk(df, query, k=5).collect()]

    qz = np.array(znormalize(query))
    by_user = {}
    for _, user, t, v in rows:
        by_user.setdefault(user, []).append((t, v))
    dists = []
    for user, series in by_user.items():
        last8 = np.array([v for _, v in sorted(series)[-8:]])
        d = float(np.sqrt(((_znorm(last8) - qz) ** 2).sum()))
        dists.append((user, round(d, 6)))
    expected = sorted(dists, key=lambda x: (x[1], x[0]))[:5]
    assert got == expected


def test_znorm_topk_excludes_short_series(spark):
    df = spark.createDataFrame(
        [(i, 1, i * 60, float(i)) for i in range(5)],  # only 5 events
        "event_id long, user_id long, ts long, value double",
    ).withColumn("ts", F.timestamp_seconds("ts"))
    assert znorm_series_topk(df, [1.0] * 8, k=5).count() == 0
