"""Property test: asof_join == pandas.merge_asof on random keyed series."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from amazon_kinesis_analytics_streaming_etl_spark.operators.asof import asof_join

_EPOCH = dt.datetime(2024, 1, 1)


def _frames(draw):
    keys = ["a", "b"]
    n_left = draw(st.integers(1, 12))
    n_right = draw(st.integers(0, 12))
    left = [
        (
            i,
            draw(st.sampled_from(keys)),
            _EPOCH + dt.timedelta(seconds=draw(st.integers(0, 3600))),
        )
        for i in range(n_left)
    ]
    # distinct (key, ts) on the right: exact-tie picks are undefined otherwise
    right_keys = draw(
        st.sets(
            st.tuples(st.sampled_from(keys), st.integers(0, 3600)),
            min_size=0,
            max_size=n_right,
        )
    )
    right = [
        (k, _EPOCH + dt.timedelta(seconds=s), float(s))
        for k, s in sorted(right_keys)
    ]
    return left, right


@given(data=st.data())
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
def test_asof_matches_pandas_merge_asof(spark, data):
    left_rows, right_rows = _frames(data.draw)
    left = spark.createDataFrame(left_rows, "id int, k string, ts timestamp")
    right = spark.createDataFrame(right_rows, "k string, ts timestamp, v double")

    got = {
        r["id"]: (r["ts_right"], r["v_right"])
        for r in asof_join(left, right, on="ts", by="k").collect()
    }

    lpd = pd.DataFrame(left_rows, columns=["id", "k", "ts"]).sort_values("ts")
    rpd = pd.DataFrame(right_rows, columns=["k", "ts", "v"]).sort_values("ts")
    if rpd.empty:
        expected = lpd.assign(ts_r=pd.NaT, v=float("nan"))
    else:
        expected = pd.merge_asof(
            lpd,
            rpd.rename(columns={"ts": "ts_r"}),
            left_on="ts",
            right_on="ts_r",
            by="k",
            direction="backward",
        )
    for row in expected.itertuples():
        g_ts, g_v = got[row.id]
        e_ts = None if pd.isna(row.ts_r) else row.ts_r.to_pydatetime()
        e_v = None if pd.isna(row.v) else row.v
        assert g_ts == e_ts, f"id={row.id}: {g_ts} != {e_ts}"
        assert g_v == e_v, f"id={row.id}: {g_v} != {e_v}"
