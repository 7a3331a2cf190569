"""Reusable inferential-statistics operators (round 8): Welch's t,
Mann-Whitney U, Kaplan-Meier survival, Theil-Sen slope — the library
faces of the `stats_*` / `survival_*` / `ts_theilsen_*` catalog queries,
usable on any DataFrame.

Scale discipline shared by all four:
- statistics assemble from partial-aggregable scans (FILTERed
  aggregates, per-distinct-value counts) — never a sort of raw rows;
- every running quantity rides :func:`operators.scale.global_cumsum`
  (one range shuffle, broadcast offsets), never a bare
  ``Window.orderBy``;
- pairwise stages (Theil-Sen) run on calendar/domain-bounded
  aggregates, never raw rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .scale import global_cumsum


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
    value domain (global_cumsum — one range shuffle)."""
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
    ranked = global_cumsum(pooled, "v", "ties", "below", exclusive=True)
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
    running log-sum; both running quantities ride global_cumsum over
    the duration domain (bounded by the observation window)."""
    d = durations.groupBy(F.col(duration_col).alias("dur")).agg(
        F.sum(F.col(observed_col)).alias("d_ev"),
        F.sum(1 - F.col(observed_col)).alias("c_cen"),
    )
    d = d.withColumn("dropped", F.col("d_ev") + F.col("c_cen"))
    d = d.localCheckpoint(eager=False)  # total + both cumsums, one pass
    n = d.agg(F.sum("dropped").alias("total"))
    r = global_cumsum(d, "dur", "dropped", "below", exclusive=True)
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
    s = global_cumsum(r, "dur", "ln_term", "ln_s")
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
