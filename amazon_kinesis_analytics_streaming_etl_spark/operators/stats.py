"""Reusable inferential-statistics operators (round 8): Welch's t,
Mann-Whitney U, Kaplan-Meier survival, Theil-Sen slope — the library
faces of the `stats_*` / `survival_*` / `ts_theilsen_*` catalog queries,
usable on any DataFrame.

Scale discipline shared by all four:
- statistics assemble from partial-aggregable scans (FILTERed
  aggregates, per-distinct-value counts) — never a sort of raw rows;
- every running quantity rides :func:`operators.scale.bucketed_cumsum`
  (pure-JVM two-level prefix over the bounded quantized domain; r12 —
  was global_cumsum's Python pass), never a bare full-domain
  ``Window.orderBy``;
- pairwise stages (Theil-Sen) run on calendar/domain-bounded
  aggregates, never raw rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .scale import bucketed_cumsum


def welch_ttest(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Welch's unequal-variance two-sample t-test of ``group_a`` vs
    ``group_b``: one row ``(n1, n2, mean_diff, t_stat, welch_dof)``
    (raw doubles, no display rounding — callers round). One
    conditional-aggregate pass; Welch-Satterthwaite dof."""
    v = F.col(value_col)
    a = F.col(group_col) == group_a
    b = F.col(group_col) == group_b
    s = df.where(v.isNotNull()).agg(
        F.count(F.when(a, 1)).alias("n1"),
        F.avg(F.when(a, v)).alias("m1"),
        F.var_samp(F.when(a, v)).alias("v1"),
        F.count(F.when(b, 1)).alias("n2"),
        F.avg(F.when(b, v)).alias("m2"),
        F.var_samp(F.when(b, v)).alias("v2"),
    )
    se2 = F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")
    dof = F.pow(se2, 2) / (
        F.pow(F.col("v1") / F.col("n1"), 2) / (F.col("n1") - 1)
        + F.pow(F.col("v2") / F.col("n2"), 2) / (F.col("n2") - 1)
    )
    return s.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        (F.col("m1") - F.col("m2")).alias("mean_diff"),
        ((F.col("m1") - F.col("m2")) / F.sqrt(se2)).alias("t_stat"),
        dof.alias("welch_dof"),
    )


def mannwhitney_u(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    quantize: int | None = 3,
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) of ``group_a`` vs ``group_b``
    with midrank ties and the tie-corrected normal approximation: one
    row ``(n1, n2, r1, u1, z_stat)`` (raw doubles).

    ``quantize`` rounds values first so the aggregated rank domain is
    bounded by quantization, not row count (None = exact values).
    Midranks come from the exclusive running count over the DISTINCT
    value domain (bucketed_cumsum — pure-JVM two-level prefix over the
    bounded value domain; r12, was global_cumsum's Python pass)."""
    v = F.round(F.col(value_col), quantize) if quantize is not None else F.col(value_col)
    src = df.where(
        F.col(value_col).isNotNull()
        & F.col(group_col).isin(group_a, group_b)
    )
    pooled = src.groupBy(v.alias("v")).agg(
        F.count(F.when(F.col(group_col) == group_a, 1)).alias("c1"),
        F.count(F.when(F.col(group_col) == group_b, 1)).alias("c2"),
    )
    pooled = pooled.withColumn("ties", F.col("c1") + F.col("c2"))
    ranked = bucketed_cumsum(pooled, "v", "ties", "below", exclusive=True)
    agg = ranked.agg(
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        F.sum(
            F.col("c1") * (F.col("below") + (F.col("ties") + 1) / 2.0)
        ).alias("r1"),
        F.sum(F.pow(F.col("ties"), 3) - F.col("ties")).alias("tie_corr"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    u1 = F.col("r1") - n1 * (n1 + 1) / 2.0
    sigma = F.sqrt(
        n1 * n2 / 12.0
        * ((n1 + n2 + 1) - F.col("tie_corr") / ((n1 + n2) * (n1 + n2 - 1.0)))
    )
    return agg.select(
        n1.cast("long").alias("n1"),
        n2.cast("long").alias("n2"),
        F.col("r1").alias("r1"),
        u1.alias("u1"),
        # degenerate pool (every value tied) drives the tie-corrected
        # sigma to exactly 0 — z is undefined there, NULL not a raise
        F.when(sigma > 0, (u1 - n1 * n2 / 2.0) / sigma).alias("z_stat"),
    )


def kaplan_meier(
    durations: DataFrame,
    duration_col: str = "dur",
    observed_col: str = "observed",
) -> DataFrame:
    """Kaplan-Meier estimator over per-subject ``(duration, observed)``
    rows (observed=1 event, 0 right-censored): one row per distinct
    duration — ``(dur, n_risk, n_events, n_censored, survival)``, raw
    doubles. S(t) = prod over event times <= t of (1 - d_i/n_i) via the
    running log-sum; both running quantities ride bucketed_cumsum over
    the duration domain (bounded by the observation window; r12 — the
    pure-JVM two-level prefix replaced global_cumsum's two Python
    passes, and dropping the localCheckpoint lets the distinct-duration
    aggregate's exchange be reused between the total subquery and the
    cumsum side instead of forcing separate jobs)."""
    d = durations.groupBy(F.col(duration_col).alias("dur")).agg(
        F.sum(F.col(observed_col)).alias("d_ev"),
        F.sum(1 - F.col(observed_col)).alias("c_cen"),
    )
    d = d.withColumn("dropped", F.col("d_ev") + F.col("c_cen"))
    n = d.agg(F.sum("dropped").alias("total"))
    r = bucketed_cumsum(
        d, "dur", "dropped", "below", bucket_width=64.0, exclusive=True
    )
    r = r.crossJoin(F.broadcast(n)).withColumn(
        "n_risk", F.col("total") - F.col("below")
    )
    r = r.withColumn(
        "ln_term",
        F.log(
            F.greatest(
                F.lit(1.0) - F.col("d_ev").cast("double") / F.col("n_risk"),
                F.lit(1e-12),
            )
        ),
    )
    s = bucketed_cumsum(r, "dur", "ln_term", "ln_s", bucket_width=64.0)
    return s.select(
        F.col("dur"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d_ev").cast("long").alias("n_events"),
        F.col("c_cen").cast("long").alias("n_censored"),
        F.exp(F.col("ln_s")).alias("survival"),
    )


def theilsen_slope(
    series: DataFrame,
    x_col: str,
    y_col: str,
    by: str | list[str] | None = None,
) -> DataFrame:
    """Theil-Sen estimator per group: the median of pairwise slopes
    (y2-y1)/(x2-x1) over x1 < x2 — ``(…by, n_pairs, theilsen_slope)``,
    raw doubles, exact interpolated median.

    CALLER CONTRACT: ``series`` must already be aggregated to a bounded
    per-group point count (e.g. daily rollups) — the pairwise stage is
    O(points^2) per group by construction (Sen 1968)."""
    by = [by] if isinstance(by, str) else list(by or [])
    a, b = series.alias("a"), series.alias("b")
    cond = F.col(f"a.{x_col}") < F.col(f"b.{x_col}")
    for k in by:
        cond = (F.col(f"a.{k}") == F.col(f"b.{k}")) & cond
    dx = F.col(f"b.{x_col}") - F.col(f"a.{x_col}")
    slope: Column = (F.col(f"b.{y_col}") - F.col(f"a.{y_col}")) / dx
    pairs = a.join(b, cond).select(
        *[F.col(f"a.{k}").alias(k) for k in by], slope.alias("slope")
    )
    grouped = pairs.groupBy(*by) if by else pairs.groupBy()
    return grouped.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.expr("percentile(slope, 0.5)").alias("theilsen_slope"),
    )


def ks_two_sample(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    quantize: int | None = 3,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test of ``group_a`` vs ``group_b``:
    one row ``(n1, n2, ks_d, ks_stat)`` (raw doubles) where ``ks_d`` is
    the sup-norm ECDF distance max_v |F1(v) - F2(v)| and ``ks_stat`` the
    asymptotic scale sqrt(n1*n2/(n1+n2)) * D (compare to the
    Kolmogorov distribution for a p-value).

    Scale shape: values quantize (bounding the aggregated domain like
    :func:`mannwhitney_u`), per-distinct-value counts are one hash
    aggregate, and F1-F2 at every distinct value is ONE
    :func:`bucketed_cumsum` of the signed per-value mass c1/n1 - c2/n2 —
    the ECDF difference needs no second cumsum because both ECDFs step
    at the same pooled points. Never a sort of raw rows."""
    v = (
        F.round(F.col(value_col), quantize)
        if quantize is not None
        else F.col(value_col)
    )
    src = df.where(
        F.col(value_col).isNotNull() & F.col(group_col).isin(group_a, group_b)
    )
    pooled = src.groupBy(v.alias("v")).agg(
        F.count(F.when(F.col(group_col) == group_a, 1)).alias("c1"),
        F.count(F.when(F.col(group_col) == group_b, 1)).alias("c2"),
    )
    # No localCheckpoint: with the pure-JVM cumsum below, the pooled
    # aggregate's exchange is REUSED between the totals subquery and the
    # ECDF side (a checkpoint would split the plan into separate jobs
    # and force a second events scan — r12).
    n = pooled.agg(
        F.sum("c1").cast("long").alias("n1"), F.sum("c2").cast("long").alias("n2")
    )
    diff = pooled.crossJoin(F.broadcast(n)).select(
        "v",
        "n1",
        "n2",
        (
            F.col("c1").cast("double") / F.col("n1")
            - F.col("c2").cast("double") / F.col("n2")
        ).alias("dmass"),
    )
    ecdf = bucketed_cumsum(diff, "v", "dmass", "fdiff")
    out = ecdf.agg(
        F.first("n1").alias("n1"),
        F.first("n2").alias("n2"),
        F.max(F.abs(F.col("fdiff"))).alias("ks_d"),
    )
    return out.select(
        "n1",
        "n2",
        F.col("ks_d"),
        (
            F.col("ks_d")
            * F.sqrt(
                F.col("n1").cast("double")
                * F.col("n2")
                / (F.col("n1") + F.col("n2"))
            )
        ).alias("ks_stat"),
    )


def spearman_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
    by: str | list[str] | None = None,
    quantize: int | None = 3,
) -> DataFrame:
    """Spearman rank correlation (midrank ties) per group:
    ``(…by, n, spearman_rho)`` — Pearson correlation of the two
    variables' midranks, the standard tie-aware definition.

    Scale shape: each variable's midranks come from its DISTINCT
    (quantized) value domain — one hash aggregate, then an exclusive
    running count over that domain-sized frame (a single
    :func:`bucketed_cumsum` two-level prefix when ungrouped; a
    group-partitioned window over the per-group domain when ``by`` is
    given — per-group ranks are the standard grouped-Spearman
    semantics, and the window frame is bounded by the quantized domain,
    never raw rows) — and join back to rows by (group, value) hash
    keys. ``corr`` is then a plain partial aggregate."""
    from pyspark.sql import Window

    by = [by] if isinstance(by, str) else list(by or [])

    def q(c: str) -> Column:
        return F.round(F.col(c), quantize) if quantize is not None else F.col(c)

    src = df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull()).select(
        *by, q(x_col).alias("_x"), q(y_col).alias("_y")
    )

    def ranks(col: str, out: str) -> DataFrame:
        dom = src.groupBy(*by, F.col(col).alias("_v")).agg(
            F.count("*").alias("_t")
        )
        if by:
            w = (
                Window.partitionBy(*by)
                .orderBy("_v")
                .rowsBetween(Window.unboundedPreceding, -1)
            )
            r = dom.withColumn(
                "_below", F.coalesce(F.sum("_t").over(w), F.lit(0))
            )
        else:
            # quantized numeric domain -> pure-JVM two-level prefix
            # (r12; $64 buckets bound the offsets frame by the value
            # domain / 64 while 2-3dp quantization bounds rows/bucket)
            r = bucketed_cumsum(
                dom, "_v", "_t", "_below", bucket_width=64.0, exclusive=True
            )
        return r.select(
            *by,
            F.col("_v").alias(col),
            (F.col("_below") + (F.col("_t") + 1) / 2.0).alias(out),
        )

    withranks = src.join(ranks("_x", "_rx"), [*by, "_x"]).join(
        ranks("_y", "_ry"), [*by, "_y"]
    )
    grouped = withranks.groupBy(*by) if by else withranks.groupBy()
    # rho assembled from covar/stddev partials instead of F.corr: corr's
    # internal ck/(sqrt(xMk)*sqrt(yMk)) raises DIVIDE_BY_ZERO under ANSI
    # when either rank column is constant — here a zero/NULL stddev
    # yields NULL rho (undefined correlation), never a throw
    agg = grouped.agg(
        F.count("*").cast("long").alias("n"),
        F.covar_samp("_rx", "_ry").alias("_cov"),
        F.stddev_samp("_rx").alias("_sx"),
        F.stddev_samp("_ry").alias("_sy"),
    )
    rho = F.when(
        (F.col("_sx") > 0) & (F.col("_sy") > 0),
        F.col("_cov") / (F.col("_sx") * F.col("_sy")),
    )
    return agg.select(*by, "n", rho.alias("spearman_rho"))


def kruskal_wallis(
    df: DataFrame,
    value_col: str,
    group_col: str,
    quantize: int | None = 3,
) -> DataFrame:
    """Kruskal-Wallis H (one-way rank ANOVA over k groups) with midrank
    ties and tie correction: one row ``(n_total, n_groups, h_stat)``
    (raw doubles) — the k-sample generalization of
    :func:`mannwhitney_u`. H = (12/(N(N+1))) * sum_g R_g^2/n_g - 3(N+1),
    divided by 1 - sum(t^3 - t)/(N^3 - N).

    Scale shape: midranks ride ONE bucketed_cumsum over the pooled
    distinct-value domain; per-(value, group) counts join to it by value
    (domain-sized hash join); the rest is partial aggregates."""
    v = (
        F.round(F.col(value_col), quantize)
        if quantize is not None
        else F.col(value_col)
    )
    src = df.where(F.col(value_col).isNotNull() & F.col(group_col).isNotNull())
    per_vg = src.groupBy(v.alias("v"), F.col(group_col).alias("g")).agg(
        F.count("*").alias("c")
    )
    per_v = per_vg.groupBy("v").agg(F.sum("c").alias("ties"))
    ranked = bucketed_cumsum(per_v, "v", "ties", "below", exclusive=True)
    ranked = ranked.withColumn(
        "midrank", F.col("below") + (F.col("ties") + 1) / 2.0
    )
    joined = per_vg.join(ranked.select("v", "midrank"), "v")
    per_g = joined.groupBy("g").agg(
        F.sum("c").alias("n_g"), F.sum(F.col("c") * F.col("midrank")).alias("r_g")
    )
    ties_tot = ranked.agg(
        F.sum("ties").alias("n_total"),
        F.sum(F.pow(F.col("ties"), 3) - F.col("ties")).alias("tie_corr"),
    )
    agg = per_g.agg(
        F.count("*").cast("long").alias("n_groups"),
        F.sum(F.pow(F.col("r_g"), 2) / F.col("n_g")).alias("rsq_over_n"),
    ).crossJoin(F.broadcast(ties_tot))
    n = F.col("n_total").cast("double")
    h_raw = 12.0 / (n * (n + 1)) * F.col("rsq_over_n") - 3.0 * (n + 1)
    corr = 1.0 - F.col("tie_corr") / (F.pow(n, 3) - n)
    return agg.select(
        F.col("n_total").cast("long").alias("n_total"),
        "n_groups",
        # degenerate pool (every value tied) -> correction 0 -> NULL
        F.when(corr > 0, h_raw / corr).alias("h_stat"),
    )


def median_abs_deviation(
    df: DataFrame,
    value_col: str,
    by: str | list[str] | None = None,
) -> DataFrame:
    """Per-group median absolute deviation around the group median:
    ``(…by, n, median, mad)`` with exact interpolated medians (the
    robust scale estimate; multiply mad by 1.4826 for the normal-
    consistent sigma).

    Scale shape: two exact-percentile aggregate passes (Spark's
    ``percentile`` is a partial-aggregable sketch over the group, no
    global sort) joined by the group key; the deviation pass joins the
    domain-sized median table back by key (broadcast when small)."""
    by = [by] if isinstance(by, str) else list(by or [])
    src = df.where(F.col(value_col).isNotNull()).select(
        *by, F.col(value_col).alias("_v")
    )
    g1 = src.groupBy(*by) if by else src.groupBy()
    med = g1.agg(
        F.count("*").cast("long").alias("n"),
        F.expr("percentile(_v, 0.5)").alias("median"),
    )
    dev = src.join(F.broadcast(med), by) if by else src.crossJoin(F.broadcast(med))
    dev = dev.select(*by, "n", "median", F.abs(F.col("_v") - F.col("median")).alias("_d"))
    g2 = dev.groupBy(*by, "n", "median")
    return g2.agg(F.expr("percentile(_d, 0.5)").alias("mad"))


def levene_bf(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """Brown-Forsythe test of variance homogeneity across k groups
    (Levene's test with the MEDIAN center — robust to non-normality):
    one row ``(n_total, n_groups, w_stat, dof1, dof2)`` (raw doubles),
    W = ((N-k)/(k-1)) * sum_g n_g (zbar_g - zbar)^2
      / sum_g sum_i (z_gi - zbar_g)^2,  z_gi = |x_gi - median_g|.

    Scale shape: group medians are one partial-aggregable percentile
    pass; deviations join the (k-row, broadcast) median table back by
    key; the W pieces are plain FILTERed aggregates — two scans, no
    sort of raw rows."""
    src = df.where(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("_g"), F.col(value_col).alias("_v")
    )
    med = src.groupBy("_g").agg(F.expr("percentile(_v, 0.5)").alias("_med"))
    z = src.join(F.broadcast(med), "_g").select(
        "_g", F.abs(F.col("_v") - F.col("_med")).alias("_z")
    )
    per_g = z.groupBy("_g").agg(
        F.count("*").alias("n_g"),
        F.avg("_z").alias("zbar_g"),
        # sum of squared within-group deviations via the variance identity
        (F.var_pop("_z") * F.count("*")).alias("ss_within_g"),
    )
    agg = per_g.agg(
        F.sum("n_g").alias("n_total"),
        F.count("*").alias("k"),
        (F.sum(F.col("zbar_g") * F.col("n_g")) / F.sum("n_g")).alias("zbar"),
        F.sum("ss_within_g").alias("ss_within"),
        F.sum(F.col("n_g") * F.pow(F.col("zbar_g"), 2)).alias("sum_n_zbar2"),
    )
    n = F.col("n_total").cast("double")
    k = F.col("k").cast("double")
    # sum n_g (zbar_g - zbar)^2 = sum n_g zbar_g^2 - N zbar^2
    ss_between = F.col("sum_n_zbar2") - n * F.pow(F.col("zbar"), 2)
    w = ((n - k) / (k - 1.0)) * ss_between / F.col("ss_within")
    return agg.select(
        F.col("n_total").cast("long").alias("n_total"),
        F.col("k").cast("long").alias("n_groups"),
        # all-identical z within every group -> 0/0, NULL not a raise
        F.when(F.col("ss_within") > 0, w).alias("w_stat"),
        (k - 1.0).alias("dof1"),
        (n - k).alias("dof2"),
    )


# --------------------------------------------------------------------------
# round 9: Poisson bootstrap — the distributed resampling scheme
# --------------------------------------------------------------------------

#: Cumulative Poisson(1) probabilities P(X <= k), k = 0..6; a weight of 7
#: absorbs the 8e-5 tail. Written once here and interpolated as full-
#: precision literals into BOTH engines' CASE ladder, so the inverse-CDF
#: draw is bit-identical.
_POISSON1_CDF = [
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
]


def poisson_weight_expr(u_sql: str) -> str:
    """Engine-neutral CASE ladder mapping a uniform ``u_sql`` in [0,1) to
    a Poisson(1) draw by inverse CDF. Deterministic (the uniform comes
    from an md5 of the row key + replicate id), so resampling is
    reproducible and oracle-replayable — the same design rule as the
    mixture sampler (plans/prep.py)."""
    whens = " ".join(
        f"WHEN {u_sql} < {c!r} THEN {k}" for k, c in enumerate(_POISSON1_CDF)
    )
    return f"(CASE {whens} ELSE 7 END)"


def poisson_bootstrap_ci(
    df: DataFrame,
    value_col: str,
    key_col: str,
    replicates: int = 64,
    alpha: float = 0.05,
) -> DataFrame:
    """Bootstrap CI for the mean of ``value_col`` via the POISSON
    bootstrap (Chamandy et al. 2012, "Estimating Uncertainty for
    Massive Data Streams"): instead of resampling n rows with
    replacement (which needs global coordination), each row contributes
    an independent Poisson(1) weight per replicate — the multinomial
    resample's limit for large n — so every replicate statistic
    assembles from ONE partial-aggregable pass.

    Plan shape: explode ``replicates`` ids per row (map-side flatMap, no
    raw-row shuffle), weight via the deterministic inverse-CDF ladder,
    partial-aggregate (sum w*v, sum w) per replicate — the shuffle moves
    only ``replicates`` rows per task — then an exact percentile over
    the ``replicates`` replicate means (a bounded 64-row reduce). At
    100 TB the cost is the scan times replicates' worth of md5s, all in
    whole-stage codegen; nothing driver-side.

    Returns one row: (n_rows, n_replicates, point_mean, ci_lo, ci_hi) —
    raw doubles, callers round."""
    from ..functions import geo

    v = F.col(value_col)
    base = df.where(v.isNotNull()).select(
        F.col(key_col).cast("string").alias("k"), v.alias("v")
    )
    rep = base.select(
        "k", "v", F.explode(F.sequence(F.lit(0), F.lit(replicates - 1))).alias("r")
    )
    # the md5-uniform recipe is the ONE shared definition (functions/
    # geo.py) the oracle also interpolates — never hand-duplicated.
    # Project u ONCE, then ladder over the column: interpolating u into
    # the CASE text would recompute the md5 in every WHEN arm (up to 7x
    # per row-replicate), and a combined w*v / w select would double it
    # again — the two-step projection keeps exactly one md5 per draw.
    u = geo.spark_expr(geo.u32_expr("concat(k, '#', CAST(r AS STRING))"))
    w = F.expr(poisson_weight_expr("u"))
    # an all-zero-weight replicate (P = 0.368^n, real at tiny n) must be
    # NULL in BOTH engines: Spark's 0.0/0 is NULL but DuckDB's is NaN,
    # which quantile_cont sorts as the LARGEST value — the explicit
    # sum(w) > 0 guard (mirrored in the oracle) removes the divergence
    means = (
        rep.withColumn("u", F.expr(u))
        .withColumn("w", w)
        .select("r", (F.col("w") * F.col("v")).alias("wv"), "w")
        .groupBy("r")
        .agg(
            F.when(F.sum("w") > 0, F.sum("wv") / F.sum("w")).alias("mu")
        )
    )
    lo, hi = alpha / 2, 1 - alpha / 2
    ci = means.agg(
        F.count("*").cast("long").alias("n_replicates"),
        F.expr(f"percentile(mu, {lo!r})").alias("ci_lo"),
        F.expr(f"percentile(mu, {hi!r})").alias("ci_hi"),
    )
    point = base.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.avg("v").alias("point_mean"),
    )
    return point.crossJoin(ci).select(
        "n_rows", "n_replicates", "point_mean", "ci_lo", "ci_hi"
    )
