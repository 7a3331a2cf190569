"""As-of join: for each left row, the most recent right row at-or-before
its timestamp (per key) — the canonical time-series enrichment operator
(pandas merge_asof / DuckDB ASOF JOIN), which Spark has no builtin for.

Spark-first implementation: tag both sides, UNION them, and run one
``last(..., ignorenulls)`` window over (key, time) — a single shuffle on
the join key, linear in |left| + |right|. This beats the naive
range-join formulation (left x right per key, then argmax) which is
quadratic per key and un-broadcastable at scale.

Ties: a right row at exactly left.ts matches (>= semantics); the union
sorts right rows before left rows at equal timestamps to guarantee it.
Right-side duplicates at the same (key, ts) must be pre-aggregated by the
caller for deterministic output (any engine's as-of pick among exact-tie
rows is arbitrary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str,
    value_cols: list[str] | None = None,
    tolerance_seconds: float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row: columns of the latest right row with
    ``right.on <= left.on`` within the same ``by`` key group.

    ``value_cols``: right columns to carry (default: all except on/by).
    ``tolerance_seconds``: if set, matches older than the tolerance are
    nulled out (pandas merge_asof semantics).
    Unmatched left rows keep NULL right columns (left-join semantics).
    """
    by = [by] if isinstance(by, str) else list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in set(by) | {on}]
    carried = [f"{c}{suffix}" for c in value_cols]
    on_right = f"{on}{suffix}"

    left_cols = left.columns
    l_tagged = left.select(
        *left_cols,
        F.lit(None).cast(right.schema[on].dataType).alias(on_right),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(cc)
            for c, cc in zip(value_cols, carried)
        ],
        F.lit(1).alias(_SIDE),
    )
    key_cols = set(by) | {on}
    r_tagged = right.select(
        *[
            (
                F.col(c) if c in key_cols else F.lit(None).cast(left.schema[c].dataType)
            ).alias(c)
            for c in left_cols
        ],
        F.col(on).alias(on_right),
        *[F.col(c).alias(cc) for c, cc in zip(value_cols, carried)],
        F.lit(0).alias(_SIDE),
    )

    # right rows sort before left rows at equal timestamps => ">=" ties match
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tagged.unionByName(r_tagged).select(
        "*",
        *[
            F.last(c, ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in [on_right, *carried]
        ],
    )
    out = filled.where(F.col(_SIDE) == 1).select(
        *left_cols,
        *[F.col(f"__f_{c}").alias(c) for c in [on_right, *carried]],
    )
    if tolerance_seconds is not None:
        in_tol = (
            F.col(on).cast("double") - F.col(on_right).cast("double")
        ) <= F.lit(float(tolerance_seconds))
        out = out.select(
            *left_cols,
            *[
                F.when(in_tol, F.col(c)).alias(c)
                for c in [on_right, *carried]
            ],
        )
    return out
