"""znorm_series_topk vs a numpy reference on synthetic keyed series."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

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


def test_holt_linear_recovers_exact_trend(spark):
    """On a noiseless linear series x_t = 10 + 2t, Holt's recurrences are
    exact: level tracks the last point and trend equals the slope."""
    from pyspark.sql import functions as F

    n = 40
    xs = [10.0 + 2.0 * t for t in range(n)]
    df = spark.createDataFrame([(xs,)], "xs array<double>")
    a, bb = 0.5, 0.3
    new_l = f"({a} * x + {1 - a} * (acc.l + acc.b))"
    fold = F.expr(
        "aggregate(slice(xs, 3, size(xs) - 2), "
        "struct(CAST(element_at(xs, 2) AS DOUBLE) AS l, "
        "CAST(element_at(xs, 2) - element_at(xs, 1) AS DOUBLE) AS b), "
        f"(acc, x) -> struct({new_l} AS l, "
        f"({bb} * ({new_l} - acc.l) + {1 - bb} * acc.b) AS b))"
    )
    r = df.select(fold.alias("hw")).collect()[0]["hw"]
    assert abs(r["l"] - xs[-1]) < 1e-9
    assert abs(r["b"] - 2.0) < 1e-9


def test_holt_linear_catalog_shape(spark):
    from amazon_kinesis_analytics_streaming_etl_spark.plans.analytics import (
        ts_holt_linear,
    )

    rows = ts_holt_linear(spark, SF_SMOKE).collect()
    assert [r["event_type"] for r in rows] == sorted(r["event_type"] for r in rows)
    for r in rows:
        assert r["n_hours"] >= 2
        # one-step forecast = level + trend (display-rounded algebra)
        assert abs(r["forecast_1h"] - (r["level"] + r["trend"])) < 2e-4
