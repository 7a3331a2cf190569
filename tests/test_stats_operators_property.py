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


@settings(**_SET)
@given(
    a=st.lists(st.integers(0, 15), min_size=2, max_size=25),
    b=st.lists(st.integers(0, 15), min_size=2, max_size=25),
)
def test_ks_two_sample_matches_reference(spark, a, b):
    from amazon_kinesis_analytics_streaming_etl_spark.operators.stats import (
        ks_two_sample,
    )

    rows = [(float(x), "A") for x in a] + [(float(x), "B") for x in b]
    df = spark.createDataFrame(rows, "v double, g string")
    got = ks_two_sample(df, "v", "g", "A", "B", quantize=None).head()

    n1, n2 = len(a), len(b)
    pts = sorted(set(a) | set(b))
    d = max(
        abs(
            sum(1 for x in a if x <= p) / n1
            - sum(1 for x in b if x <= p) / n2
        )
        for p in pts
    )
    assert got.n1 == n1 and got.n2 == n2
    assert abs(got.ks_d - d) < 1e-9
    assert abs(got.ks_stat - d * math.sqrt(n1 * n2 / (n1 + n2))) < 1e-9


@settings(**_SET)
@given(
    xy=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=3,
        max_size=30,
    ),
)
def test_spearman_matches_reference(spark, xy):
    from amazon_kinesis_analytics_streaming_etl_spark.operators.stats import (
        spearman_corr,
    )

    xs = [float(x) for x, _ in xy]
    ys = [float(y) for _, y in xy]
    # constant columns make rho undefined (zero rank variance)
    if len(set(xs)) == 1 or len(set(ys)) == 1:
        return
    df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
    got = spearman_corr(df, "x", "y", quantize=None).head()

    rx_map, ry_map = _py_midranks(xs), _py_midranks(ys)
    rx = [rx_map[v] for v in xs]
    ry = [ry_map[v] for v in ys]
    n = len(xs)
    mx, my = sum(rx) / n, sum(ry) / n
    cov = sum((p - mx) * (q - my) for p, q in zip(rx, ry))
    sx = math.sqrt(sum((p - mx) ** 2 for p in rx))
    sy = math.sqrt(sum((q - my) ** 2 for q in ry))
    assert got.n == n
    if sx == 0 or sy == 0:
        assert got.spearman_rho is None
    else:
        assert abs(got.spearman_rho - cov / (sx * sy)) < 1e-9


@settings(**_SET)
@given(
    groups=st.lists(
        st.lists(st.integers(0, 10), min_size=2, max_size=15),
        min_size=2,
        max_size=4,
    ),
)
def test_kruskal_wallis_matches_reference(spark, groups):
    from amazon_kinesis_analytics_streaming_etl_spark.operators.stats import (
        kruskal_wallis,
    )

    rows = [
        (float(x), f"g{i}") for i, grp in enumerate(groups) for x in grp
    ]
    df = spark.createDataFrame(rows, "v double, g string")
    got = kruskal_wallis(df, "v", "g", quantize=None).head()

    pooled = [float(x) for grp in groups for x in grp]
    ranks = _py_midranks(pooled)
    n = len(pooled)
    rsq = sum(
        sum(ranks[float(x)] for x in grp) ** 2 / len(grp) for grp in groups
    )
    h = 12.0 / (n * (n + 1)) * rsq - 3.0 * (n + 1)
    # tie correction
    from collections import Counter

    tc = sum(t**3 - t for t in Counter(pooled).values())
    corr = 1.0 - tc / (n**3 - n)
    assert got.n_total == n and got.n_groups == len(groups)
    if corr == 0:
        assert got.h_stat is None
    else:
        assert abs(got.h_stat - h / corr) < 1e-9


@settings(**_SET)
@given(
    vals=st.lists(
        st.floats(-50, 50, allow_nan=False, width=32), min_size=1, max_size=30
    ),
)
def test_mad_matches_reference(spark, vals):
    from amazon_kinesis_analytics_streaming_etl_spark.operators.stats import (
        median_abs_deviation,
    )

    def py_median(xs):
        s = sorted(xs)
        m = len(s) // 2
        return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2.0

    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    got = median_abs_deviation(df, "v").head()
    med = py_median(vals)
    mad = py_median([abs(v - med) for v in vals])
    assert got.n == len(vals)
    assert abs(got.median - med) < 1e-6
    assert abs(got.mad - mad) < 1e-6


def test_mad_grouped(spark):
    from amazon_kinesis_analytics_streaming_etl_spark.operators.stats import (
        median_abs_deviation,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 100.0), ("b", 5.0), ("b", 5.0)],
        "g string, v double",
    )
    rows = {r["g"]: r for r in median_abs_deviation(df, "v", by="g").collect()}
    assert rows["a"]["median"] == 2.0 and rows["a"]["mad"] == 1.0
    assert rows["b"]["median"] == 5.0 and rows["b"]["mad"] == 0.0


@settings(**_SET)
@given(
    groups=st.lists(
        st.lists(
            st.floats(0, 40, allow_nan=False, width=32),
            min_size=3,
            max_size=15,
        ),
        min_size=2,
        max_size=4,
    ),
)
def test_levene_bf_matches_reference(spark, groups):
    from amazon_kinesis_analytics_streaming_etl_spark.operators.stats import (
        levene_bf,
    )

    def py_median(xs):
        s = sorted(xs)
        m = len(s) // 2
        return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2.0

    rows = [(float(x), f"g{i}") for i, grp in enumerate(groups) for x in grp]
    df = spark.createDataFrame(rows, "v double, g string")
    got = levene_bf(df, "v", "g").head()

    zs = [
        [abs(x - py_median(grp)) for x in grp] for grp in groups
    ]
    n = sum(len(g) for g in groups)
    k = len(groups)
    zbar_g = [sum(g) / len(g) for g in zs]
    zbar = sum(sum(g) for g in zs) / n
    ss_b = sum(len(g) * (m - zbar) ** 2 for g, m in zip(zs, zbar_g))
    ss_w = sum(sum((x - m) ** 2 for x in g) for g, m in zip(zs, zbar_g))
    assert got.n_total == n and got.n_groups == k
    assert got.dof1 == k - 1 and got.dof2 == n - k
    if ss_w == 0:
        assert got.w_stat is None
    else:
        w = ((n - k) / (k - 1)) * ss_b / ss_w
        assert abs(got.w_stat - w) < 1e-6 * max(1.0, abs(w))


@settings(**_SET)
@given(
    ga=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)),
        min_size=3,
        max_size=20,
    ),
    gb=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)),
        min_size=3,
        max_size=20,
    ),
)
def test_spearman_grouped_ranks_within_groups(spark, ga, gb):
    """by= ranks WITHIN each group (standard grouped Spearman): each
    group's rho equals the ungrouped operator run on that group's rows
    alone, and equals the pure-Python midrank Pearson."""
    from amazon_kinesis_analytics_streaming_etl_spark.operators.stats import (
        spearman_corr,
    )

    rows = [("a", float(x), float(y)) for x, y in ga] + [
        ("b", float(x), float(y)) for x, y in gb
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {
        r["g"]: (r["n"], r["spearman_rho"])
        for r in spearman_corr(df, "x", "y", by="g", quantize=None).collect()
    }
    for gname, pairs in (("a", ga), ("b", gb)):
        xs = [float(x) for x, _ in pairs]
        ys = [float(y) for _, y in pairs]
        rx_map, ry_map = _py_midranks(xs), _py_midranks(ys)
        rx = [rx_map[v] for v in xs]
        ry = [ry_map[v] for v in ys]
        n = len(xs)
        mx, my = sum(rx) / n, sum(ry) / n
        cov = sum((p - mx) * (q - my) for p, q in zip(rx, ry))
        sx = math.sqrt(sum((p - mx) ** 2 for p in rx))
        sy = math.sqrt(sum((q - my) ** 2 for q in ry))
        gn, grho = got[gname]
        assert gn == n
        if sx == 0 or sy == 0:
            assert grho is None
        else:
            assert abs(grho - cov / (sx * sy)) < 1e-9
        # parity with the ungrouped operator on the single group
        solo = spearman_corr(
            df.where(df.g == gname), "x", "y", quantize=None
        ).head()
        if grho is None:
            assert solo.spearman_rho is None
        else:
            assert abs(solo.spearman_rho - grho) < 1e-9


def _py_poisson_w(key: str, r: int) -> int:
    import hashlib

    from amazon_kinesis_analytics_streaming_etl_spark.operators.stats import (
        _POISSON1_CDF,
    )

    u = int(hashlib.md5(f"{key}#{r}".encode()).hexdigest()[:8], 16) / 4294967296.0
    for k, c in enumerate(_POISSON1_CDF):
        if u < c:
            return k
    return 7


@settings(**_SET)
@given(vals=st.lists(st.floats(1.0, 100.0).map(lambda v: round(v, 2)),
                     min_size=5, max_size=40))
def test_poisson_bootstrap_matches_reference(spark, vals):
    """The operator's replicate means and percentile CI must equal a
    pure-Python replay of the same md5 inverse-CDF weights (type-7
    percentile interpolation, like numpy default)."""
    from amazon_kinesis_analytics_streaming_etl_spark.operators.stats import (
        poisson_bootstrap_ci,
    )

    R = 16
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k long, v double")
    got = poisson_bootstrap_ci(df, "v", "k", replicates=R).collect()[0]

    mus = []
    for r in range(R):
        sw = swv = 0.0
        for i, v in rows:
            w = _py_poisson_w(str(i), r)
            sw += w
            swv += w * v
        # an all-zero-weight replicate yields a NULL mean, which both
        # engines' percentile ignores — mirror that here
        if sw:
            mus.append(swv / sw)
    s = sorted(mus)

    def pctl(q):
        pos = (len(s) - 1) * q
        lo, frac = int(pos), pos - int(pos)
        return s[lo] if frac == 0 else s[lo] + frac * (s[lo + 1] - s[lo])

    assert got["n_rows"] == len(vals)
    assert got["n_replicates"] == R
    assert math.isclose(got["point_mean"], sum(vals) / len(vals), rel_tol=1e-9)
    assert math.isclose(got["ci_lo"], pctl(0.025), rel_tol=1e-9)
    assert math.isclose(got["ci_hi"], pctl(0.975), rel_tol=1e-9)


@settings(**_SET)
@given(xs=st.lists(st.floats(-50.0, 50.0).map(lambda v: round(v, 3)),
                   min_size=2, max_size=60))
def test_holt_fold_matches_python_recurrence(spark, xs):
    """The JVM aggregate() fold must replay Holt's recurrences exactly
    (same IEEE op order as a sequential Python loop)."""
    from pyspark.sql import functions as F

    a, bb = 0.5, 0.3
    df = spark.createDataFrame([(xs,)], "xs array<double>")
    new_l = f"({a} * x + {1 - a} * (acc.l + acc.b))"
    fold = F.expr(
        "aggregate(slice(xs, 3, size(xs) - 2), "
        "struct(CAST(element_at(xs, 2) AS DOUBLE) AS l, "
        "CAST(element_at(xs, 2) - element_at(xs, 1) AS DOUBLE) AS b), "
        f"(acc, x) -> struct({new_l} AS l, "
        f"({bb} * ({new_l} - acc.l) + {1 - bb} * acc.b) AS b))"
    )
    got = df.select(fold.alias("hw")).collect()[0]["hw"]

    l, b = xs[1], xs[1] - xs[0]
    for x in xs[2:]:
        nl = a * x + (1 - a) * (l + b)
        b = bb * (nl - l) + (1 - bb) * b
        l = nl
    assert got["l"] == l and got["b"] == b  # bit-exact, not approx
