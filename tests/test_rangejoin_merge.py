"""Ground truth + plan shape for the bin-blocked interval join
(operators/rangejoin.py) and the CDC snapshot merge (operators/merge.py).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from amazon_kinesis_analytics_streaming_etl_spark.operators.merge import merge_changes
from amazon_kinesis_analytics_streaming_etl_spark.operators.rangejoin import interval_join


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(seconds=s)


def test_interval_join_matches_naive_range_join(spark):
    # 50 left x 80 right with varied offsets; compare against the naive
    # (nested-loop) range join Spark produces for the bare predicate
    left = spark.createDataFrame(
        [(i, _ts(i * 37 % 500)) for i in range(50)], "lid long, lts timestamp"
    )
    right = spark.createDataFrame(
        [(j, _ts(j * 23 % 500)) for j in range(80)], "rid long, rts timestamp"
    )
    got = (
        interval_join(left, right, "lts", "rts", lower_s=-60, upper_s=30)
        .select("lid", "rid")
        .collect()
    )
    want = (
        left.join(
            right,
            (F.col("rts") >= F.col("lts") - F.expr("INTERVAL 60 SECONDS"))
            & (F.col("rts") <= F.col("lts") + F.expr("INTERVAL 30 SECONDS")),
        )
        .select("lid", "rid")
        .collect()
    )
    assert sorted((r.lid, r.rid) for r in got) == sorted((r.lid, r.rid) for r in want)
    assert len(want) > 100  # the window actually matches plenty


def test_interval_join_subsecond_boundaries(spark):
    # rows exactly at / just outside the bounds, with fractional seconds
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    left = spark.createDataFrame([(1, base)], "lid long, lts timestamp")
    right = spark.createDataFrame(
        [
            (10, base + dt.timedelta(seconds=30)),             # on upper bound
            (11, base + dt.timedelta(seconds=30, microseconds=1)),  # just out
            (12, base - dt.timedelta(seconds=60)),             # on lower bound
            (13, base - dt.timedelta(seconds=60, microseconds=1)),  # just out
            (14, base + dt.timedelta(seconds=29, microseconds=999999)),  # in
        ],
        "rid long, rts timestamp",
    )
    got = sorted(
        r.rid
        for r in interval_join(left, right, "lts", "rts", -60, 30).collect()
    )
    assert got == [10, 12, 14]


def test_interval_join_no_nested_loop(spark):
    left = spark.createDataFrame([(1, _ts(0))], "lid long, lts timestamp")
    right = spark.createDataFrame([(2, _ts(10))], "rid long, rts timestamp")
    plan = (
        interval_join(left, right, "lts", "rts", -60, 30)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    # the bare predicate, for contrast, IS a nested loop
    naive = left.join(
        right,
        (F.col("rts") >= F.col("lts") - F.expr("INTERVAL 60 SECONDS"))
        & (F.col("rts") <= F.col("lts") + F.expr("INTERVAL 30 SECONDS")),
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoopJoin" in naive or "CartesianProduct" in naive


def test_interval_join_with_keys(spark):
    left = spark.createDataFrame(
        [(1, "a", _ts(0)), (2, "b", _ts(0))], "lid long, k string, lts timestamp"
    )
    right = spark.createDataFrame(
        [(10, "a", _ts(5)), (11, "b", _ts(500))], "rid long, rk string, rts timestamp"
    )
    got = interval_join(
        left, right, "lts", "rts", 0, 60,
        keys=[(F.col("k"), F.col("rk"))],
    ).select("lid", "rid").collect()
    assert [(r.lid, r.rid) for r in got] == [(1, 10)]  # rid 11 out of range


def test_interval_join_rejects_empty_interval(spark):
    df = spark.createDataFrame([(1, _ts(0))], "lid long, lts timestamp")
    with pytest.raises(ValueError, match="empty interval"):
        interval_join(df, df, "lts", "lts", 10, 5)


# --------------------------------------------------------------------------


def _snap(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, v string, bal double"
    )


def test_merge_upsert_delete_insert(spark):
    changes = spark.createDataFrame(
        [
            (2, "b2", 25.0, "U"),   # update
            (3, None, 0.0, "D"),    # delete
            (9, "new", 1.0, "I"),   # insert
        ],
        "k long, v string, bal double, op string",
    )
    got = sorted(
        (r.k, r.v, r.bal)
        for r in merge_changes(_snap(spark), changes, key_cols=["k"]).collect()
    )
    assert got == [(1, "a", 10.0), (2, "b2", 25.0), (9, "new", 1.0)]


def test_merge_latest_change_wins_with_seq(spark):
    changes = spark.createDataFrame(
        [
            (2, "first", 0.0, "U", 1),
            (2, "last", 99.0, "U", 7),   # max seq wins
            (1, None, 0.0, "D", 3),
            (1, "revived", 5.0, "I", 4),  # later than the delete
        ],
        "k long, v string, bal double, op string, seq long",
    )
    got = sorted(
        (r.k, r.v, r.bal)
        for r in merge_changes(
            _snap(spark), changes, key_cols=["k"], seq_col="seq"
        ).collect()
    )
    assert got == [(1, "revived", 5.0), (2, "last", 99.0), (3, "c", 30.0)]


def test_merge_broadcasts_changed_keys(spark):
    changes = spark.createDataFrame([(2, "x", 0.0, "U")], "k long, v string, bal double, op string")
    plan = (
        merge_changes(_snap(spark), changes, key_cols=["k"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


# --------------------------------------------------------------------------
# property: interval_join == naive O(n*m) reference on random inputs
# --------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_EPOCH = dt.datetime(2024, 1, 1)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_interval_join_property(spark, data):
    lower = data.draw(st.integers(-120, 60))
    upper = data.draw(st.integers(lower, lower + 180))

    def ts_list(n):
        return [
            _EPOCH
            + dt.timedelta(
                seconds=data.draw(st.integers(0, 900)),
                microseconds=data.draw(st.sampled_from([0, 1, 499999, 999999])),
            )
            for _ in range(n)
        ]

    lts = ts_list(data.draw(st.integers(1, 10)))
    rts = ts_list(data.draw(st.integers(0, 10)))
    left = spark.createDataFrame(
        [(i, t) for i, t in enumerate(lts)], "lid long, lts timestamp"
    )
    right = spark.createDataFrame(
        [(j, t) for j, t in enumerate(rts)], "rid long, rts timestamp"
    ) if rts else spark.createDataFrame([], "rid long, rts timestamp")

    got = sorted(
        (r.lid, r.rid)
        for r in interval_join(left, right, "lts", "rts", lower, upper).collect()
    )
    lo_us, hi_us = lower * 1_000_000, upper * 1_000_000
    want = sorted(
        (i, j)
        for i, lt in enumerate(lts)
        for j, rt in enumerate(rts)
        if lo_us <= (rt - lt) / dt.timedelta(microseconds=1) <= hi_us
    )
    assert got == want


def test_merge_changes_property_random_changesets(spark):
    """Property: merge_changes equals a sequential dict replay of the
    changeset (latest seq per key wins; D deletes, I/U upsert) for random
    snapshots and random op streams, both broadcast and shuffle paths."""
    import pandas as pd
    from hypothesis import given, settings, strategies as st

    from amazon_kinesis_analytics_streaming_etl_spark.operators.merge import (
        merge_changes,
    )

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(st.tuples(st.integers(0, 15), st.integers(0, 99)),
                 min_size=0, max_size=25, unique_by=lambda t: t[0]),
        st.lists(st.tuples(st.integers(0, 15),
                           st.sampled_from(["I", "U", "D"]),
                           st.integers(0, 99)),
                 min_size=1, max_size=25),
        st.booleans(),
    )
    def run(snap_rows, ops, broadcast):
        snap_pdf = pd.DataFrame(snap_rows or [(999, 0)], columns=["k", "val"])
        if not snap_rows:
            snap_pdf = snap_pdf.iloc[0:0]
        # changeset: seq = position; latest per key wins
        ch_rows = [(k, v, op, i) for i, (k, op, v) in enumerate(ops)]
        # sequential reference replay
        state = dict(snap_pdf.itertuples(index=False, name=None))
        latest = {}
        for k, v, op, seq in ch_rows:
            latest[k] = (v, op, seq)
        for k, (v, op, _seq) in latest.items():
            if op == "D":
                state.pop(k, None)
            else:
                state[k] = v

        snap = spark.createDataFrame(
            snap_pdf if len(snap_pdf) else [(0, 0)], ["k", "val"]
        )
        if not len(snap_pdf):
            snap = snap.where("k < 0")
        changes = spark.createDataFrame(ch_rows, ["k", "val", "op", "seq"])
        got = merge_changes(
            snap, changes, key_cols=["k"], seq_col="seq",
            broadcast_changes=broadcast,
        ).collect()
        assert {(r.k, r.val) for r in got} == set(state.items())

    run()
