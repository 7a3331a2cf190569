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


@given(data=st.data(), direction=st.sampled_from(["forward", "nearest"]))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
def test_asof_directions_match_pandas(spark, data, direction):
    """forward and nearest directions vs pandas.merge_asof on random
    keyed series (pandas nearest also resolves equal-distance ties
    backward, so the contracts line up exactly)."""
    left_rows, right_rows = _frames(data.draw)
    left = spark.createDataFrame(left_rows, "id int, k string, ts timestamp")
    right = spark.createDataFrame(right_rows, "k string, ts timestamp, v double")

    got = {
        r["id"]: (r["ts_right"], r["v_right"])
        for r in asof_join(
            left, right, on="ts", by="k", direction=direction
        ).collect()
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
            direction=direction,
        )
    for row in expected.itertuples():
        g_ts, g_v = got[row.id]
        e_ts = None if pd.isna(row.ts_r) else row.ts_r.to_pydatetime()
        e_v = None if pd.isna(row.v) else row.v
        assert g_ts == e_ts, f"{direction} id={row.id}: {g_ts} != {e_ts}"
        assert g_v == e_v, f"{direction} id={row.id}: {g_v} != {e_v}"


def test_asof_tolerance_applies_per_direction(spark):
    """Nearest-with-tolerance contract: the in-tolerance nearest side is
    picked; both-out nulls. (A nearer-but-out / farther-but-in split is
    impossible under one symmetric tolerance — dist_nearest <= dist_other
    — so filter-first and pick-then-filter agree; the operator implements
    filter-first, pandas' documented form.)"""
    left = spark.createDataFrame(
        [(1, "a", dt.datetime(2024, 1, 1, 12, 0, 0))],
        "id int, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("a", dt.datetime(2024, 1, 1, 11, 59, 0), 1.0),  # 60s back
            ("a", dt.datetime(2024, 1, 1, 12, 0, 30), 2.0),  # 30s fwd
        ],
        "k string, ts timestamp, v double",
    )
    pick = lambda tol: asof_join(  # noqa: E731
        left, right, on="ts", by="k", direction="nearest",
        tolerance_seconds=tol,
    ).head()["v_right"]
    assert pick(45) == 2.0  # forward nearest and within tolerance
    assert pick(90) == 2.0  # both in -> still the nearer (forward)
    assert pick(20) is None  # both out -> nulled


def _frames_ties(draw):
    """Tie-forcing variant of _frames: timestamps from a 0-20 s domain so
    exact left/right collisions occur in nearly every example (the round-8
    forward-direction tie bug slipped past the 0-3600 s domain above)."""
    keys = ["a", "b"]
    n_left = draw(st.integers(1, 12))
    left = [
        (
            i,
            draw(st.sampled_from(keys)),
            _EPOCH + dt.timedelta(seconds=draw(st.integers(0, 20))),
        )
        for i in range(n_left)
    ]
    right_keys = draw(
        st.sets(
            st.tuples(st.sampled_from(keys), st.integers(0, 20)),
            min_size=0,
            max_size=12,
        )
    )
    right = [
        (k, _EPOCH + dt.timedelta(seconds=s), float(s))
        for k, s in sorted(right_keys)
    ]
    # guarantee at least one exact collision when both sides are non-empty
    if left and right:
        k0, ts0, _ = right[0]
        left.append((len(left), k0, ts0))
    return left, right


@given(
    data=st.data(),
    direction=st.sampled_from(["backward", "forward", "nearest"]),
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
def test_asof_equal_timestamp_ties_match_pandas(spark, data, direction):
    """All three directions vs pandas.merge_asof on a tie-dense domain,
    with an injected guaranteed exact left/right collision."""
    left_rows, right_rows = _frames_ties(data.draw)
    left = spark.createDataFrame(left_rows, "id int, k string, ts timestamp")
    right = spark.createDataFrame(right_rows, "k string, ts timestamp, v double")

    got = {
        r["id"]: (r["ts_right"], r["v_right"])
        for r in asof_join(
            left, right, on="ts", by="k", direction=direction
        ).collect()
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
            direction=direction,
        )
    for row in expected.itertuples():
        g_ts, g_v = got[row.id]
        e_ts = None if pd.isna(row.ts_r) else row.ts_r.to_pydatetime()
        e_v = None if pd.isna(row.v) else row.v
        assert g_ts == e_ts, f"{direction} id={row.id}: {g_ts} != {e_ts}"
        assert g_v == e_v, f"{direction} id={row.id}: {g_v} != {e_v}"
