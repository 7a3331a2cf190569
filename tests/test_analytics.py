"""Product-analytics family invariants (plans/analytics.py).

Most analytics queries are verified end-to-end by the driver's DuckDB
oracle gate; these tests pin the mathematical invariants that an oracle
row-hash alone would not explain if they ever broke.
"""

from __future__ import annotations

from amazon_kinesis_analytics_streaming_etl_spark.plans.catalog import QUERIES

from conftest import SF_SMOKE


def test_drift_psi_nonnegative_and_spine_complete(spark):
    rows = QUERIES["drift_psi"](spark, SF_SMOKE).collect()
    # one row per event_type present in the table, no dropped types
    n_types = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("event_type")
        .distinct()
        .count()
    )
    assert len(rows) == n_types
    for r in rows:
        # PSI terms (p-q)*ln(p/q) are individually >= 0, so the sum is too
        assert r.psi >= 0.0
        # both slices must retain mass (Laplace smoothing never zeroes a slice)
        assert r.n_baseline > 0 and r.n_current > 0


def test_drift_psi_deterministic(spark):
    a = [tuple(r) for r in QUERIES["drift_psi"](spark, SF_SMOKE).collect()]
    b = [tuple(r) for r in QUERIES["drift_psi"](spark, SF_SMOKE).collect()]
    assert a == b


def test_ewma_is_a_weighted_mean_of_its_window(spark):
    """EWMA is a normalized weighted mean, so every point must lie within
    [min, max] of its type's hourly series — a weighting bug (unnormalized
    weights, reversed exponents) breaks this immediately."""
    from pyspark.sql import functions as F

    out = QUERIES["ewma_hourly"](spark, SF_SMOKE)
    bounds = out.groupBy("event_type").agg(
        F.min("v").alias("lo"), F.max("v").alias("hi")
    )
    bad = (
        out.join(bounds, "event_type")
        .where((F.col("ewma") < F.col("lo") - 0.001) | (F.col("ewma") > F.col("hi") + 0.001))
        .count()
    )
    assert bad == 0


def test_pattern_match_counts_bounded_by_user_total(spark):
    rows = {r.pattern: r for r in QUERIES["pattern_match_funnel"](spark, SF_SMOKE).collect()}
    assert set(rows) == {"strict_funnel", "signup_then_purchase", "repeated_errors", "bounce"}
    for r in rows.values():
        assert 0 <= r.n_users
        assert 0.0 <= r.pct <= 1.0
    # a strict funnel completion implies the user journey had a view before
    # a purchase, so it can never be counted as a bounce too -- but both
    # are <= the user total independently; the hard invariant is the cap
    n_total = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("user_id").distinct().count()
    )
    assert all(r.n_users <= n_total for r in rows.values())


def test_resample_interpolate_exact_points_match_hourly_avg(spark):
    """Grid slots that coincide with an observed hour must reproduce that
    hour's (rounded) average exactly — lerp with frac=0."""
    from pyspark.sql import functions as F

    out = QUERIES["resample_interpolate"](spark, SF_SMOKE)
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    hourly = ev.groupBy(
        "event_type",
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm").alias("slot"),
    ).agg(F.round(F.avg("value"), 4).alias("v"))
    j = out.where(F.col("is_exact")).join(hourly, ["event_type", "slot"])
    bad = j.where(F.abs(F.col("value_interp") - F.col("v")) > 0.001).count()
    assert j.count() > 0 and bad == 0


def test_rfm_segments_partition_the_user_base(spark):
    from pyspark.sql import functions as F

    out = QUERIES["rfm_segments"](spark, SF_SMOKE)
    rows = out.collect()
    n_users = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("user_id").distinct().count()
    )
    assert sum(r.n_users for r in rows) == n_users
    assert all(1 <= r.r_score <= 5 and 1 <= r.f_score <= 5 for r in rows)


def test_attribution_purchases_partition_and_direct_has_no_prior_touch(spark):
    """Every purchase is attributed to exactly one channel (counts
    partition the purchase set), and a hand-built user history lands on
    the expected channels: last prior non-purchase wins, no-history ->
    'direct', later purchases re-attribute to the newest touch."""
    rows = QUERIES["attribution_last_touch"](spark, SF_SMOKE).collect()
    total = sum(r.n_purchases for r in rows)
    purchases = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .where("event_type = 'purchase'")
        .count()
    )
    assert total == purchases
    assert all(r.channel != "purchase" for r in rows)

    import datetime as dt
    import pandas as pd

    t0 = dt.datetime(2024, 1, 1)
    ev = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5, 6],
            "ts": [t0 + dt.timedelta(minutes=m) for m in range(6)],
            "user_id": [1, 1, 1, 1, 2, 3],
            "event_type": [
                "view", "click", "purchase", "purchase",  # u1: click, click
                "purchase",                               # u2: direct
                "view",                                   # u3: no purchase
            ],
            "value": [0.0, 0.0, 10.0, 5.0, 2.0, 0.0],
            "props": ["{}"] * 6,
        }
    )
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        ev.to_parquet(os.path.join(d, "events.parquet"))
        got = {
            r.channel: (r.n_purchases, r.total_value)
            for r in QUERIES["attribution_last_touch"](spark, d).collect()
        }
    assert got == {"click": (2, 15.0), "direct": (1, 2.0)}


def test_seasonal_profile_recovers_synthetic_diurnal_signal(spark):
    """On a constructed series value = 100 + sin-free diurnal bump at
    hour 12, the 25h centered MA removes the level and the profile
    isolates the bump: seasonal(hod=12) ~ bump * 23/24 above the other
    hours' ~ -bump/24."""
    import datetime as dt
    import pandas as pd

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    i = 0
    for day in range(7):
        for hod in range(24):
            ts = t0 + dt.timedelta(days=day, hours=hod)
            v = 100.0 + (24.0 if hod == 12 else 0.0)
            rows.append((i, ts, 1, "view", v, "{}"))
            i += 1
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        pdf.to_parquet(os.path.join(d, "events.parquet"))
        prof = {
            r.hod: r.seasonal
            for r in QUERIES["ts_seasonal_profile"](spark, d).collect()
        }
    # a 25h centered window always covers one noon bump (trend 100+24/25),
    # except at exact midnights where it covers two (trend 100+48/25)
    assert abs(prof[12] - (24.0 - 24.0 / 25.0)) < 0.05
    assert abs(prof[0] - (-48.0 / 25.0)) < 0.05
    for h in set(prof) - {0, 12}:
        assert abs(prof[h] - (-24.0 / 25.0)) < 0.05


def test_skyline_output_is_mutually_nondominated_and_dominates_rest(spark):
    rows = QUERIES["skyline_pareto"](spark, SF_SMOKE).collect()
    assert rows, "frontier cannot be empty on non-empty part"
    pts = [(r.p_retailprice, r.p_size) for r in rows]
    for i, (p, s) in enumerate(pts):
        for j, (q, t) in enumerate(pts):
            if i != j:
                assert not (q <= p and t >= s and (q < p or t > s))
    # every non-frontier part is dominated by some frontier point
    part = spark.read.parquet(f"{SF_SMOKE}/part.parquet").collect()
    frontier = set(pts)
    for r in part:
        if (r.p_retailprice, r.p_size) in frontier:
            continue
        assert any(
            q <= r.p_retailprice
            and t >= r.p_size
            and (q < r.p_retailprice or t > r.p_size)
            for q, t in pts
        )


def test_graph_shortest_hops_bipartite_structure(spark):
    """The trade graph is bipartite (customer<->supplier), all seeds are
    suppliers: supplier rows must sit at even hops, customer rows at odd
    hops, hop 0 must equal the seed-nation supplier count, and counts
    are positive."""
    rows = QUERIES["graph_shortest_hops"](spark, SF_SMOKE).collect()
    assert rows, "seed nation has suppliers at every SF"
    for r in rows:
        assert r.n_nodes > 0
        if r.side == "supplier":
            assert r.hop % 2 == 0
        else:
            assert r.hop % 2 == 1
    from pyspark.sql import functions as F

    su = spark.read.parquet(f"{SF_SMOKE}/supplier.parquet")
    na = spark.read.parquet(f"{SF_SMOKE}/nation.parquet").where(
        F.col("n_name") == "NATION_3"
    )
    n_seeds = su.join(na, su.s_nationkey == na.n_nationkey).count()
    hop0 = {(r.hop, r.side): r.n_nodes for r in rows}.get((0, "supplier"), 0)
    assert hop0 == n_seeds


def test_markov_transitions_rows_normalize_and_cover_all_pairs(spark):
    """Each current-state row of the transition matrix sums to ~1, and
    the total transition count equals (events - users): every user with
    k events contributes exactly k-1 transitions."""
    import collections

    rows = QUERIES["markov_event_transitions"](spark, SF_SMOKE).collect()
    by_cur = collections.defaultdict(float)
    for r in rows:
        assert 0.0 < r.p <= 1.0
        by_cur[r.cur] += r.p
    for cur, s in by_cur.items():
        assert abs(s - 1.0) < 1e-4, (cur, s)
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r.n for r in rows) == n_events - n_users


def test_anomaly_mad_robust_ordering_and_hand_check(spark):
    """Output is |z|-descending, and the top row's score reproduces from
    a pandas recompute of the same hourly median/MAD pipeline."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    out = QUERIES["anomaly_mad_robust"](spark, SF_SMOKE).collect()
    assert len(out) == 20
    zs = [abs(r.robust_z) for r in out]
    assert zs == sorted(zs, reverse=True)

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    hourly = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("pt"))
        .agg(F.round(F.avg("value").cast("float").cast("double"), 4).alias("v"))
        .toPandas()
    )
    top = out[0]
    g = hourly[hourly.event_type == top.event_type]
    m = g.v.median()
    mad = (g.v - m).abs().median()
    v = g[g.pt.dt.strftime("%Y-%m-%d %H:00") == top.hour].v.iloc[0]
    want = (v - m) / (1.4826 * mad)
    assert np.isclose(top.robust_z, round(want + 1e-8, 4), atol=1e-3)


def test_histogram_equidepth_buckets_are_balanced_and_ordered(spark):
    """Equal-depth contract: bucket populations differ by at most 1,
    cover the full table, and value ranges are non-overlapping and
    ascending."""
    rows = QUERIES["histogram_equidepth"](spark, SF_SMOKE).collect()
    n_total = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").count()
    assert sum(r.n_rows for r in rows) == n_total
    sizes = [r.n_rows for r in rows]
    assert max(sizes) - min(sizes) <= 1
    for a, b in zip(rows, rows[1:]):
        assert a.lo <= a.hi
        # adjacent buckets may share a boundary value (ties split by key)
        assert a.hi <= b.lo + 0.01


def test_scd2_state_runs_reproduce_from_pandas_rle(spark):
    """Full recompute: run-length encode each user's event stream in
    pandas, close intervals with the next run's start, take the same
    top-20 — must match exactly."""
    import pandas as pd

    rows = QUERIES["scd2_state_runs"](spark, SF_SMOKE).collect()
    ev = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("user_id", "event_type", "ts", "event_id")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    out = []
    for uid, g in ev.groupby("user_id"):
        g = g.reset_index(drop=True)
        starts = [0] + [
            i
            for i in range(1, len(g))
            if g.event_type[i] != g.event_type[i - 1]
        ]
        for a, b in zip(starts, starts[1:]):
            # floor each endpoint to ms (unix_millis/epoch_ms semantics),
            # then subtract — flooring the difference is off by one when
            # the sub-millisecond parts straddle a boundary
            dur = int(
                g.ts[b].value // 1_000_000 - g.ts[a].value // 1_000_000
            )
            out.append(
                (
                    int(uid),
                    g.event_type[a],
                    g.ts[a].strftime("%Y-%m-%d %H:%M:%S"),
                    dur,
                    int(g.event_id[a]),
                )
            )
    out.sort(key=lambda t: (-t[3], t[0], t[4]))
    want = [t[:4] for t in out[:20]]
    got = [(r.user_id, r.event_type, r.valid_from, r.duration_ms) for r in rows]
    assert got == want


def test_chi2_contributions_match_scipy_style_recompute(spark):
    """Full recompute of the contingency math in pure Python from the
    raw table: observed counts, independence-model expectations, per-type
    contribution sums (float32-squashed like the engine)."""
    import collections

    import numpy as np

    rows = {r.event_type: r for r in QUERIES["stats_chi2_independence"](spark, SF_SMOKE).collect()}
    ev = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("event_type", "ts")
        .collect()
    )
    obs = collections.Counter((r.event_type, r.ts.hour) for r in ev)
    n = sum(obs.values())
    row_t = collections.Counter()
    col_t = collections.Counter()
    for (t, h), c in obs.items():
        row_t[t] += c
        col_t[h] += c
    for t in row_t:
        # engine sums only over OBSERVED cells (the contingency table has
        # no zero rows) -- recompute must match that definition
        contrib_obs_only = sum(
            (c - row_t[t] * col_t[h] / n) ** 2 / (row_t[t] * col_t[h] / n)
            for (tt, h), c in obs.items()
            if tt == t
        )
        want = round(float(np.float32(contrib_obs_only)) + 1e-8, 4)
        assert rows[t].chi2_contrib == want
        assert rows[t].n_events == row_t[t]


def test_funnel_time_to_convert_reproduces_from_pandas(spark):
    """Recompute first-signup -> first-purchase latencies in pandas and
    check count and exact interpolated percentiles (floored to match)."""
    import numpy as np

    row = QUERIES["funnel_time_to_convert"](spark, SF_SMOKE).collect()[0]
    ev = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("user_id", "event_type", "ts")
        .toPandas()
    )
    s = ev[ev.event_type == "signup"].groupby("user_id").ts.min()
    p = ev[ev.event_type == "purchase"].groupby("user_id").ts.min()
    both = s.to_frame("s").join(p.to_frame("p"), how="inner")
    both = both[both.p >= both.s]
    dur = (
        (both.p.astype("int64") // 1_000_000 - both.s.astype("int64") // 1_000_000)
        // 1000
    ).to_numpy()
    assert row.n_converted == len(dur)
    assert row.p50_s == int(np.floor(np.percentile(dur, 50, method="linear")))
    assert row.p90_s == int(np.floor(np.percentile(dur, 90, method="linear")))
    assert row.max_s == int(dur.max())


def test_gini_matches_pure_python_identity_and_bounds(spark):
    """Recompute the rank identity in pure Python from per-customer
    spend; Gini must match to 6dp and sit in [0, 1)."""
    row = QUERIES["stats_gini_spend"](spark, SF_SMOKE).collect()[0]
    spend = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .groupBy("o_custkey")
        .sum("o_totalprice")
        .collect()
    )
    vals = sorted(
        (round(r["sum(o_totalprice)"], 2), r.o_custkey) for r in spend
    )
    n = len(vals)
    s = sum(v for v, _ in vals)
    si = sum(i * v for i, (v, _) in enumerate(vals, start=1))
    want = round(2.0 * si / (n * s) - (n + 1.0) / n + 1e-8, 6)
    assert row.n_customers == n
    assert abs(row.gini - want) <= 1e-6
    assert 0.0 <= row.gini < 1.0


def test_forecast_eval_mase_is_the_mae_ratio_and_naive1_selfcheck(spark):
    """MASE must equal mae_snaive/mae_naive1 (to the rounding contract),
    and a pandas recompute of the naive-1 MAE from the hourly series
    must agree — pinning the lag alignment."""
    import numpy as np
    from pyspark.sql import functions as F

    rows = {r.event_type: r for r in QUERIES["ts_forecast_eval"](spark, SF_SMOKE).collect()}
    hourly = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("pt"))
        .agg(F.round(F.avg("value").cast("float").cast("double"), 4).alias("v"))
        .toPandas()
        .sort_values(["event_type", "pt"])
    )
    for t, r in rows.items():
        # mase is computed from the UNROUNDED MAEs, so compare loosely
        # against the ratio of the rounded ones
        assert abs(r.mase - r.mae_snaive / r.mae_naive1) < 2e-3
        g = hourly[hourly.event_type == t].reset_index(drop=True)
        v = g.v.to_numpy()
        # score only rows with BOTH references, same as the query
        sn = np.abs(v[24:] - v[:-24])
        n1 = np.abs(v[24:] - v[23:-1])
        assert r.n_scored == len(v) - 24
        assert abs(r.mae_naive1 - round(float(np.float32(n1.mean())) + 1e-8, 4)) < 1e-3
        assert abs(r.mae_snaive - round(float(np.float32(sn.mean())) + 1e-8, 4)) < 1e-3


def test_path_trigrams_counts_match_pandas_recompute(spark):
    """Full recompute: per-user ordered trigram counts in pandas, same
    top-20 with the same tie-breaks."""
    import collections

    rows = QUERIES["path_trigrams"](spark, SF_SMOKE).collect()
    ev = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("user_id", "event_type", "ts", "event_id")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    c = collections.Counter()
    for _, g in ev.groupby("user_id"):
        t = g.event_type.tolist()
        c.update(zip(t, t[1:], t[2:]))
    want = sorted(((-n, a, b, cc) for (a, b, cc), n in c.items()))[:20]
    got = [(-r.n, r.a, r.b, r.c) for r in rows]
    assert got == want


def test_abc_classes_partition_parts_and_respect_cutoffs(spark):
    """A/B/C partition the part set; cumulative shares respect the
    80/95 cutoffs (A's share <= 0.8 < A+B's... within one part's
    revenue granularity); revenue is conserved."""
    rows = {r.abc_class: r for r in QUERIES["abc_classification"](spark, SF_SMOKE).collect()}
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    n_parts = li.select("l_partkey").distinct().count()
    assert sum(r.n_parts for r in rows.values()) == n_parts
    total = sum(r.class_revenue for r in rows.values())
    a = rows["A"].class_revenue / total
    ab = (rows["A"].class_revenue + rows["B"].class_revenue) / total
    # the class containing the cutoff crossing extends past it by at
    # most one part, so shares bracket the cutoffs from below
    assert a <= 0.8 + 0.05 and ab <= 0.95 + 0.05
    assert a > 0.5  # the head really is a head


def test_ts_family_shares_one_float_contract():
    """Every ts-family member's oracle must contain the literal SQL twin
    of _f32_avg4 — the single float32-squash definition. A member whose
    oracle drifts from the constant reintroduces the sf0.1 gapfill-class
    half-boundary mismatch one query at a time."""
    from amazon_kinesis_analytics_streaming_etl_spark.plans.analytics import (
        _F32_HOURLY_AVG_SQL,
    )
    from amazon_kinesis_analytics_streaming_etl_spark.plans.catalog import ORACLES

    family = [
        "gapfill_hourly", "resample_interpolate", "ewma_hourly",
        "rolling_median_hourly", "ts_autocorr", "ts_changepoint_cusum",
        "ts_seasonal_profile", "anomaly_mad_robust", "ts_forecast_eval",
    ]
    for q in family:
        assert _F32_HOURLY_AVG_SQL in ORACLES[q], q


def test_pit_join_agrees_with_last_touch_attribution(spark):
    """Two independent plan families, one semantic: the interval
    containment PIT join and the running-window last-touch attribution
    must credit identical per-channel purchase counts. (On same-ts
    purchase/touch ties the two formulations could legitimately differ
    — the shipped data has no (user_id, ts) ties, so equality is exact.)"""
    pit = {
        r.state: r.n_purchases
        for r in QUERIES["scd2_point_in_time_join"](spark, SF_SMOKE).collect()
    }
    att = {
        r.channel: r.n_purchases
        for r in QUERIES["attribution_last_touch"](spark, SF_SMOKE).collect()
    }
    assert pit == att


def test_cross_correlation_matches_pandas_and_is_symmetric_complete(spark):
    """All C(types,2) pairs present, each corr matching a pandas
    recompute over the aligned hourly series to 4dp."""
    import numpy as np
    from pyspark.sql import functions as F

    rows = {
        (r.type_a, r.type_b): r
        for r in QUERIES["ts_cross_correlation"](spark, SF_SMOKE).collect()
    }
    hourly = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("pt"))
        .agg(F.round(F.avg("value").cast("float").cast("double"), 4).alias("v"))
        .toPandas()
    )
    types = sorted(hourly.event_type.unique())
    assert len(rows) == len(types) * (len(types) - 1) // 2
    wide = hourly.pivot(index="pt", columns="event_type", values="v")
    for (a, b), r in rows.items():
        pair = wide[[a, b]].dropna()
        assert r.n_hours == len(pair)
        want = round(float(np.corrcoef(pair[a], pair[b])[0, 1]) + 1e-8, 4)
        assert abs(r.corr_hourly - want) < 2e-4


def test_pinball_loss_is_nonnegative_and_q90_penalizes_under(spark):
    """Pinball losses are nonnegative by definition; and the q90
    predictor, sitting above the q50 one, must yield q90 loss <= its
    own q50-loss-at-q90-target equivalent — checked via a direct pandas
    recompute of both losses."""
    import numpy as np
    from pyspark.sql import functions as F

    rows = {r.event_type: r for r in QUERIES["eval_pinball_loss"](spark, SF_SMOKE).collect()}
    hourly = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("pt"))
        .agg(F.round(F.avg("value").cast("float").cast("double"), 4).alias("v"))
        .toPandas()
    )
    cut = (
        hourly.pt.min().value // 1_000_000 + hourly.pt.max().value // 1_000_000
    ) // 2
    for t, r in rows.items():
        g = hourly[hourly.event_type == t]
        ms = g.pt.astype("int64") // 1_000_000
        cal = g[ms < cut].v.to_numpy()
        ev = g[ms >= cut].v.to_numpy()
        q50 = np.percentile(cal, 50, method="linear")
        q90 = np.percentile(cal, 90, method="linear")
        p50 = np.mean(np.where(ev >= q50, 0.5 * (ev - q50), 0.5 * (q50 - ev)))
        p90 = np.mean(np.where(ev >= q90, 0.9 * (ev - q90), 0.1 * (q90 - ev)))
        assert r.n_eval == len(ev)
        assert r.pinball_q50 >= 0 and r.pinball_q90 >= 0
        assert abs(r.pinball_q50 - round(float(np.float32(p50)) + 1e-8, 4)) < 2e-4
        assert abs(r.pinball_q90 - round(float(np.float32(p90)) + 1e-8, 4)) < 2e-4
