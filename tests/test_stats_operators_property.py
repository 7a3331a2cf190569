"""Property tests: operators/stats.py vs pure-Python references on
random frames — the algebra of each statistic, independent of the
catalog queries' fixed inputs."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SET = dict(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _py_midranks(vals):
    """value -> midrank over the pooled sorted multiset."""
    s = sorted(vals)
    out = {}
    i = 0
    while i < len(s):
        j = i
        while j < len(s) and s[j] == s[i]:
            j += 1
        out[s[i]] = (i + 1 + j) / 2.0  # average of ranks i+1..j
        i = j
    return out


@settings(**_SET)
@given(
    a=st.lists(st.integers(0, 20), min_size=2, max_size=30),
    b=st.lists(st.integers(0, 20), min_size=2, max_size=30),
)
def test_mannwhitney_matches_reference(spark, a, b):
    from amazon_kinesis_analytics_streaming_etl_spark.operators.stats import (
        mannwhitney_u,
    )

    rows = [(float(x), "A") for x in a] + [(float(x), "B") for x in b]
    df = spark.createDataFrame(rows, "v double, g string")
    got = mannwhitney_u(df, "v", "g", "A", "B", quantize=None).head()

    ranks = _py_midranks([float(x) for x in a + b])
    r1 = sum(ranks[float(x)] for x in a)
    n1, n2 = len(a), len(b)
    u1 = r1 - n1 * (n1 + 1) / 2.0
    assert got.n1 == n1 and got.n2 == n2
    assert abs(got.r1 - r1) < 1e-6
    assert abs(got.u1 - u1) < 1e-6
    # U1 + U2 = n1*n2 identity via the complement group
    got2 = mannwhitney_u(df, "v", "g", "B", "A", quantize=None).head()
    assert abs(got.u1 + got2.u1 - n1 * n2) < 1e-6


@settings(**_SET)
@given(
    a=st.lists(
        st.floats(0, 100, allow_nan=False, width=32), min_size=3, max_size=25
    ),
    b=st.lists(
        st.floats(0, 100, allow_nan=False, width=32), min_size=3, max_size=25
    ),
)
def test_welch_matches_reference(spark, a, b):
    from amazon_kinesis_analytics_streaming_etl_spark.operators.stats import (
        welch_ttest,
    )
    from statistics import mean, variance

    # degenerate zero-variance pairs make t undefined; skip those draws
    if variance(a) == 0 or variance(b) == 0:
        return
    rows = [(float(x), "A") for x in a] + [(float(x), "B") for x in b]
    df = spark.createDataFrame(rows, "v double, g string")
    got = welch_ttest(df, "v", "g", "A", "B").head()
    m1, m2, v1, v2 = mean(a), mean(b), variance(a), variance(b)
    n1, n2 = len(a), len(b)
    se2 = v1 / n1 + v2 / n2
    t = (m1 - m2) / math.sqrt(se2)
    dof = se2**2 / ((v1 / n1) ** 2 / (n1 - 1) + (v2 / n2) ** 2 / (n2 - 1))
    assert got.n1 == n1 and got.n2 == n2
    assert abs(got.t_stat - t) < 1e-6 * max(1.0, abs(t))
    assert abs(got.welch_dof - dof) < 1e-6 * max(1.0, dof)


def _py_kaplan_meier(pairs):
    """pairs: (dur, observed). Returns {dur: survival} KM curve."""
    from collections import Counter

    ev = Counter()
    drop = Counter()
    for d, o in pairs:
        drop[d] += 1
        if o:
            ev[d] += 1
    total = len(pairs)
    out = {}
    s = 1.0
    at_risk = total
    for d in sorted(drop):
        if ev[d] and at_risk:
            s *= max(1.0 - ev[d] / at_risk, 1e-12)
        out[d] = s
        at_risk -= drop[d]
    return out


@settings(**_SET)
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 1)),
        min_size=1,
        max_size=40,
    )
)
def test_kaplan_meier_matches_reference(spark, pairs):
    from amazon_kinesis_analytics_streaming_etl_spark.operators.stats import (
        kaplan_meier,
    )

    df = spark.createDataFrame(
        [(int(d), int(o)) for d, o in pairs], "dur int, observed int"
    )
    got = {r.dur: r for r in kaplan_meier(df, "dur", "observed").collect()}
    ref = _py_kaplan_meier(pairs)
    assert set(got) == set(ref)
    at_risk = len(pairs)
    from collections import Counter

    drop = Counter(d for d, _ in pairs)
    for d in sorted(ref):
        assert got[d].n_risk == at_risk
        assert abs(got[d].survival - ref[d]) < 1e-9
        at_risk -= drop[d]


@settings(**_SET)
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 30), st.integers(-50, 50)),
        min_size=2,
        max_size=20,
        unique_by=lambda p: p[0],
    )
)
def test_theilsen_matches_reference(spark, pts):
    from amazon_kinesis_analytics_streaming_etl_spark.operators.stats import (
        theilsen_slope,
    )

    df = spark.createDataFrame(
        [("g", int(x), float(y)) for x, y in pts], "k string, x int, y double"
    )
    got = theilsen_slope(df, "x", "y", by="k").head()
    slopes = sorted(
        (y2 - y1) / (x2 - x1)
        for i, (x1, y1) in enumerate(pts)
        for (x2, y2) in pts[i + 1 :]
        if x2 != x1
    ) or None
    # normalize pair order: strategy list isn't sorted by x
    slopes = sorted(
        (b[1] - a[1]) / (b[0] - a[0])
        for a in pts
        for b in pts
        if b[0] > a[0]
    )
    n = len(slopes)
    ref = (
        slopes[n // 2]
        if n % 2
        else 0.5 * (slopes[n // 2 - 1] + slopes[n // 2])
    )
    assert got.n_pairs == n
    assert abs(got.theilsen_slope - ref) < 1e-9
