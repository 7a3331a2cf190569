"""As-of join: for each left row, the matching right row per key under
backward (at-or-before, default), forward (at-or-after), or nearest
semantics — the canonical time-series enrichment operator (pandas
merge_asof / DuckDB ASOF JOIN), which Spark has no builtin for.

Spark-first implementation: tag both sides, UNION them, and run one
``last(..., ignorenulls)`` window over (key, time) — a single shuffle on
the join key, linear in |left| + |right|. This beats the naive
range-join formulation (left x right per key, then argmax) which is
quadratic per key and un-broadcastable at scale.

Ties: a right row at exactly left.ts matches in every direction; the
union's in-partition sort places equal-ts right rows on whichever side of
the left row the active fill frame can see (before for backward/nearest,
after for pure forward).
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
    direction: str = "backward",
) -> DataFrame:
    """For each left row: columns of the matching right row within the
    same ``by`` key group, where the match is (pandas merge_asof parity):

    - ``direction="backward"`` (default): latest right with
      ``right.on <= left.on``;
    - ``direction="forward"``: earliest right with
      ``right.on >= left.on``;
    - ``direction="nearest"``: whichever of the two is closer in time,
      ties (equal distance) resolved to the BACKWARD match — a pure
      function of the data, so both engines and every rerun agree.

    ``value_cols``: right columns to carry (default: all except on/by).
    ``tolerance_seconds``: if set, matches farther than the tolerance
    are nulled out (pandas merge_asof semantics, applied per direction).
    Unmatched left rows keep NULL right columns (left-join semantics).

    All three directions cost the same single shuffle: one union of the
    tagged sides, one window partitioning on ``by`` — nearest evaluates
    the backward ``last`` and forward ``first`` fills over the SAME
    sorted exchange (two frames, one sort), then picks per row.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction}")
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

    # Tie handling at equal timestamps (">=" / "<=" both match a zero-
    # distance right row):
    #  - backward & nearest: right rows (side 0) sort BEFORE left rows, so
    #    the backward fill [unboundedPreceding, currentRow] sees them; for
    #    nearest that suffices — a zero-distance backward match always wins
    #    (ties resolve backward by contract), so the forward fill missing
    #    the equal-ts row can never change the pick.
    #  - pure forward: the ONLY fill is [currentRow, unboundedFollowing],
    #    so left rows must sort BEFORE equal-ts right rows or the zero-
    #    distance match falls outside the frame (pandas merge_asof parity
    #    bug otherwise: left@10 vs right@{10,20} must return right@10).
    side_order = (
        F.col(_SIDE).desc() if direction == "forward" else F.col(_SIDE).asc()
    )
    order = [F.col(on).asc(), side_order]
    part = Window.partitionBy(*by).orderBy(*order)
    w_back = part.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_fwd = part.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    fill_cols = [on_right, *carried]
    fills = []
    if direction in ("backward", "nearest"):
        fills += [
            F.last(c, ignorenulls=True).over(w_back).alias(f"__b_{c}")
            for c in fill_cols
        ]
    if direction in ("forward", "nearest"):
        fills += [
            F.first(c, ignorenulls=True).over(w_fwd).alias(f"__f_{c}")
            for c in fill_cols
        ]
    filled = l_tagged.unionByName(r_tagged).select("*", *fills)

    def _within(prefix: str) -> "F.Column":
        if tolerance_seconds is None:
            return F.lit(True)
        dist = F.abs(
            F.col(on).cast("double")
            - F.col(f"{prefix}{on_right}").cast("double")
        )
        return dist <= F.lit(float(tolerance_seconds))

    rows = filled.where(F.col(_SIDE) == 1)
    if direction == "backward":
        picked = [(F.col(f"__b_{c}")).alias(c) for c in fill_cols]
        guard = _within("__b_")
    elif direction == "forward":
        picked = [(F.col(f"__f_{c}")).alias(c) for c in fill_cols]
        guard = _within("__f_")
    else:
        # pandas parity: tolerance filters the candidate set before the
        # nearest pick. (With one symmetric tolerance this is provably
        # equivalent to pick-then-filter — the nearest side's distance
        # is <= the other's, so it can never be out while the other is
        # in — but filter-first is the contract pandas documents and
        # stays correct if per-direction tolerances ever diverge.)
        b_dist = F.abs(
            F.col(on).cast("double") - F.col(f"__b_{on_right}").cast("double")
        )
        f_dist = F.abs(
            F.col(on).cast("double") - F.col(f"__f_{on_right}").cast("double")
        )
        valid_b = F.col(f"__b_{on_right}").isNotNull() & _within("__b_")
        valid_f = F.col(f"__f_{on_right}").isNotNull() & _within("__f_")
        use_back = valid_b & (~valid_f | (b_dist <= f_dist))
        picked = [
            F.when(use_back, F.col(f"__b_{c}"))
            .when(valid_f, F.col(f"__f_{c}"))
            .alias(c)
            for c in fill_cols
        ]
        guard = use_back | valid_f
    out = rows.select(*left_cols, *picked, guard.alias("__in_tol"))
    return out.select(
        *left_cols,
        *[
            F.when(F.col("__in_tol"), F.col(c)).alias(c)
            for c in fill_cols
        ],
    )
