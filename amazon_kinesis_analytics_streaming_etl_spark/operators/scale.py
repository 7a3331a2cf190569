"""Scale operators: bucketing (co-located joins) and salting (skew).

These are the two knobs SURVEY.md §2B's scale posture calls for beyond
what AQE gives automatically:

- **Bucketing** pre-shuffles a table ONCE at write time. Two tables
  bucketed by the same key with the same bucket count join with ZERO
  exchange at read time — at 100 TB this turns every recurring fact-fact
  join on the bucket key into a shuffle-free sort-merge. This is the
  durable version of the reference's ``keyBy`` placement
  (StreamingEtl.java:110): the partitioning lives in the table layout
  instead of each job's runtime.

- **Salting** splits a hot key across ``n_salts`` sub-keys so one
  reducer doesn't receive the whole key's data. AQE's skew-join handles
  most cases at runtime (enabled in session.py); explicit salting is for
  the cases AQE can't re-plan: skewed *aggregations* (two-phase
  partial/final) and skewed joins against a replicable right side.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type hints must resolve

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectors import array_double_lit

# --- bucketing --------------------------------------------------------------


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table.

    Bucket count is a layout contract: pick once per subject area (both
    sides of a recurring join must match) and size so a bucket's share of
    the largest table fits an executor (~128-512 MB/bucket at rest).
    Sorting within buckets additionally removes the Sort from sort-merge
    joins and enables min/max skipping on the sort key.
    """
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a (bucketed) table; joins/aggs on the bucket key skip their
    Exchange when both sides share bucketing."""
    return spark.table(table)


# --- deterministic sampling -------------------------------------------------


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Reproducible ~``fraction`` sample keyed on ``key_col``: keep rows
    whose md5(key) 8-hex-digit prefix falls under the fraction threshold.

    Unlike ``df.sample`` (seeded per-partition-layout, so results change
    when partitioning changes) this is a pure row-level predicate —
    stable across runs, engines, cluster sizes, and re-partitioning,
    which is what training-data curation needs (the same doc is in or
    out forever; ``salt`` rotates the cohort). Pushdown-friendly: it's
    just a filter on a scalar expression.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    threshold = format(int(fraction * 0xFFFFFFFF), "08x")
    prefix = F.substring(
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt))), 1, 8
    )
    return df.where(prefix < F.lit(threshold))


# --- salting ----------------------------------------------------------------

_DECOMPOSABLE = {"sum", "count", "min", "max"}


def salted_agg(
    df: DataFrame,
    keys: list[str] | str,
    aggs: dict[str, str] | list[tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    ``aggs``: (column, fn) pairs — a dict column->fn, or a list of pairs
    when one column needs several fns — with fn in {sum,count,min,max,
    avg}. Phase 1 groups by (keys, salt) — the hot key's rows spread over
    ``n_salts`` partial groups; phase 2 merges partials by key alone
    (tiny input). avg decomposes to sum+count and is reassembled exactly.

    The salt is ``pmod(hash(all columns), n_salts)`` — deterministic (no
    rand(): replays/retries stay stable) and uniform within a hot key.
    Output column names are ``{fn}_{col}`` (avg_x from sum_x/count_x).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    pairs = list(aggs.items()) if isinstance(aggs, dict) else list(aggs)
    for _, fn in pairs:
        if fn not in _DECOMPOSABLE | {"avg"}:
            raise ValueError(f"non-decomposable agg: {fn}")

    salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts)).alias("_salt")

    partial_exprs, final_exprs, post = [], [], []
    for col, fn in pairs:
        if fn == "avg":
            partial_exprs += [
                F.sum(col).alias(f"_ps_{col}"),
                F.count(col).alias(f"_pc_{col}"),
            ]
            final_exprs += [
                F.sum(f"_ps_{col}").alias(f"_s_{col}"),
                F.sum(f"_pc_{col}").alias(f"_c_{col}"),
            ]
            post.append((F.col(f"_s_{col}") / F.col(f"_c_{col}")).alias(f"avg_{col}"))
        elif fn == "count":
            partial_exprs.append(F.count(col).alias(f"_p_{fn}_{col}"))
            final_exprs.append(F.sum(f"_p_{fn}_{col}").alias(f"count_{col}"))
        else:
            partial_exprs.append(getattr(F, fn)(col).alias(f"_p_{fn}_{col}"))
            final_exprs.append(getattr(F, fn)(f"_p_{fn}_{col}").alias(f"{fn}_{col}"))

    partial = df.select(*df.columns, salt).groupBy(*keys, "_salt").agg(*partial_exprs)
    final = partial.groupBy(*keys).agg(*final_exprs)
    keep = [c for c in final.columns if not c.startswith(("_s_", "_c_"))]
    return final.select(*keep, *post) if post else final


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str | list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where the LEFT side has hot keys and the RIGHT side is
    small enough to replicate ``n_salts``-fold (but perhaps not small
    enough, or not chosen by the planner, to broadcast).

    Left rows get a deterministic salt in [0, n_salts); the right side is
    exploded once per salt value; joining on (key, salt) spreads each hot
    key over n_salts reducers. Semantically identical to the plain join
    for left-preserving joins only: because the right side is replicated,
    ``right``/``full`` would emit n_salts null-extended copies of every
    unmatched right row, so those hows are rejected.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports left-preserving joins {sorted(allowed)}; "
            f"got how={how!r} (the replicated right side would duplicate "
            "unmatched right rows)"
        )
    on = [on] if isinstance(on, str) else list(on)
    salt_l = F.pmod(F.hash(*[F.col(c) for c in skewed.columns]), F.lit(n_salts))
    left = skewed.withColumn("_salt", salt_l)
    right = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return left.join(right, on + ["_salt"], how).drop("_salt")


# --- sorted layout (min/max data skipping) ----------------------------------

def write_range_sorted(
    df: DataFrame,
    path: str,
    sort_cols: str | list[str],
    n_files: int = 32,
) -> None:
    """Rewrite a dataset range-partitioned + sorted on ``sort_cols`` so
    every output file covers a disjoint key range.

    The scale play: parquet footers carry per-column min/max; a range
    predicate on the sort key then skips whole files/row-groups at scan
    time (Spark's vectorized reader prunes row groups from footer stats,
    and any engine reading the same files gets the benefit). On an
    unsorted layout every file spans the full key range and nothing can
    be skipped. ``repartitionByRange`` samples split points — one shuffle,
    no driver collect; ``sortWithinPartitions`` keeps row groups locally
    ordered so intra-file skipping works too.
    """
    cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
    (
        df.repartitionByRange(n_files, *[F.col(c) for c in cols])
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(path)
    )


# --- distributed global rank ------------------------------------------------

def global_rank(
    df: DataFrame,
    order_cols: str | list[str],
    rank_col: str = "rank",
    n_parts: int = 32,
) -> DataFrame:
    """Global ``row_number() OVER (ORDER BY ...)`` without the
    single-partition window.

    A bare ``Window.orderBy`` collapses the whole dataset onto ONE task —
    the canonical 100 TB failure. Rank = inclusive running count, so this
    delegates to :func:`global_cumsum` over a constant-1 column: ONE
    range shuffle (reused by the offsets side), narrow local prefix
    counts, broadcast offsets. Ranks are exact and total provided
    ``order_cols`` ends in a tie-breaking unique key (same requirement a
    deterministic SQL row_number has).
    """
    out = global_cumsum(
        df.withColumn("_one", F.lit(1)),
        order_cols,
        "_one",
        cumsum_col=rank_col,
        n_parts=n_parts,
    )
    return out.drop("_one")


def global_cumsum(
    df: DataFrame,
    order_cols: str | list[str],
    value_col: str,
    cumsum_col: str = "cumsum",
    n_parts: int = 32,
    exclusive: bool = False,
) -> DataFrame:
    """Global ``SUM(value) OVER (ORDER BY ...)`` without the
    single-partition window — the running-offset primitive behind
    global row_number, sequence packing, and byte-offset assignment.

    Plan shape (exactly ONE full-data shuffle, ONE Python pass):

    1. ``repartitionByRange`` on the order key (sampled split points) +
       ``sortWithinPartitions`` — the only wide op.
    2. Local prefix sums via ONE ``mapInPandas`` (vectorized
       ``np.cumsum`` per Arrow batch, running carry across batches),
       materialized ONCE via a lazy ``localCheckpoint``. A
       ``Window.partitionBy(spark_partition_id())`` would instead force
       a SECOND full-data hash exchange — Catalyst can't know the pid
       column is aligned with the range partitioning — and, being
       nondeterministic, ``spark_partition_id()`` also disables exchange
       reuse (measured: 4 full-data exchanges for the window form vs 1
       here). The pid comes from ``TaskContext`` inside the UDF; the
       checkpoint pins it, so the offsets side and the output side see
       the SAME partition assignment (two physical instances of a range
       exchange each re-sample their own split points — exchange reuse
       is not guaranteed to deduplicate them, observed not to here).
       Storage cost ≈ dataset size in executor memory/disk, the same
       order as the shuffle itself.
    3. Per-partition totals as a plain JVM aggregate over the
       checkpointed prefix output — ``sum(value) GROUP BY _pid`` is the
       partition total, so no second Python pass is needed (r12
       optimization: the previous shape re-crossed the JVM↔Python
       boundary with a dedicated ``_totals`` pass over the same rows;
       guide §4 — eliminate boundary crossings). Predecessor offsets
       via an ``n_parts``-row single-partition window → broadcast-
       joined back on pid.

    Exact and total provided ``order_cols`` ends in a unique
    tie-breaking key. ``exclusive=True`` gives the sum-of-strict-
    predecessors form (ROWS UNBOUNDED PRECEDING .. 1 PRECEDING,
    coalesced to 0 for the first row). Nulls in ``value_col`` contribute
    0, matching ``coalesce(sum(v) OVER ..., 0)``. Integral value columns
    produce a ``long`` cumsum; everything else ``double``.
    """
    import numpy as np
    from pyspark import TaskContext
    from pyspark.sql import types as T

    cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    integral = isinstance(
        df.schema[value_col].dataType,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
    )
    np_dtype = np.int64 if integral else np.float64
    sum_type = T.LongType() if integral else T.DoubleType()

    part = df.repartitionByRange(n_parts, *[F.col(c) for c in cols]).sortWithinPartitions(
        *cols
    )

    local_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("_pid", T.IntegerType()), T.StructField("_lsum", sum_type)]
    )

    def _values(pdf):
        # null contributes 0; integral stays in int64 end-to-end (a
        # float64 detour would silently round sums past 2^53)
        return pdf[value_col].fillna(0).to_numpy(dtype=np_dtype)

    def _prefix(batches):
        pid = TaskContext.get().partitionId()
        carry = np_dtype(0)
        for pdf in batches:
            v = _values(pdf)
            csum = np.cumsum(v)
            lsum = (csum - v) if exclusive else csum
            out = pdf.copy()
            out["_pid"] = np.int32(pid)
            out["_lsum"] = carry + lsum
            if len(v):
                carry = carry + np_dtype(csum[-1])
            yield out

    local = part.mapInPandas(_prefix, schema=local_schema).localCheckpoint(
        eager=False
    )

    # n_parts rows total — the single-partition window here is over a
    # dimension-sized frame, not the data. The offsets side reads the
    # same checkpointed rows the output side joins; no second shuffle,
    # sort, or Python pass. SUM skips nulls — and NaN is masked to null
    # — matching _prefix's fillna(0) contribution of 0 for both.
    tot_v = F.col(value_col)
    if not integral:
        tot_v = F.when(~F.isnan(tot_v.cast("double")), tot_v)
    offsets = (
        local.groupBy("_pid")
        .agg(F.sum(tot_v).cast(sum_type).alias("_n"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_n").over(
                    Window.orderBy("_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).cast(sum_type),
        )
        .select("_pid", "_offset")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(cumsum_col, (F.col("_lsum") + F.col("_offset")).cast(sum_type))
        .drop("_pid", "_lsum", "_offset")
    )


def bucketed_cumsum(
    df: DataFrame,
    order_cols: str | list[str],
    value_col: str,
    cumsum_col: str = "cumsum",
    bucket_width: float = 1.0,
    exclusive: bool = False,
) -> DataFrame:
    """``SUM(value) OVER (ORDER BY order_col)`` for DOMAIN-BOUNDED numeric
    order keys — the pure-JVM twin of :func:`global_cumsum` (r12, the
    ``stats_weighted_median`` two-level bucket selection generalized).

    Two-level decomposition, no Python pass, no checkpoint:

    1. ``_bkt = floor(order_col / bucket_width)`` — per-bucket running
       sums via one window ``partitionBy(_bkt) ORDER BY order_col``
       (parallel across buckets; one hash shuffle of the input).
    2. Bucket totals (a map-side-combined aggregate whose exchange
       carries one row per bucket) -> exclusive prefix over the bucket
       frame via a single-partition window whose row count is bounded by
       ``domain_range / bucket_width``, NOT by data size -> broadcast
       join back.

    Versus :func:`global_cumsum` this removes the JVM<->Python boundary
    (guide §4.1: prefer built-ins), the ``localCheckpoint``
    materialization, and — because no checkpoint splits the plan — lets
    Catalyst reuse the upstream aggregate's exchange between the cumsum
    and any sibling consumer (measured: one ``events`` scan instead of
    two in the rank-statistics queries). Use it when the order domain is
    bounded (quantized metrics, calendar buckets, price/duration
    domains); keep :func:`global_cumsum` for DATA-sized order domains
    (doc ids, byte offsets) where the bucket frame would not be bounded.

    Same contract as :func:`global_cumsum`: the ``order_cols``
    combination must be unique per row (a single domain column after a
    distinct-value aggregate, or a numeric lead column plus tie-breaking
    keys — the bucket derives from the FIRST column, which must be
    numeric); null ``value_col`` contributes 0 (JVM SUM skips nulls;
    NaN is masked to null to match the Python form's ``fillna(0)``);
    integral value columns produce a ``long`` cumsum, everything else
    ``double``. ``exclusive=True`` gives the strict-predecessor form (0
    for the first row, matching ``coalesce(sum ... 1 PRECEDING, 0)``).
    """
    from pyspark.sql import types as T

    cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    integral = isinstance(
        df.schema[value_col].dataType,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
    )
    sum_type = T.LongType() if integral else T.DoubleType()

    val = F.col(value_col)
    if not integral:
        val = F.when(~F.isnan(val.cast("double")), val)

    d = df.withColumn(
        "_bkt", F.floor(F.col(cols[0]) / F.lit(float(bucket_width)))
    )
    wb = Window.partitionBy("_bkt").orderBy(*cols)
    frame = wb.rowsBetween(Window.unboundedPreceding, -1 if exclusive else 0)
    offsets = (
        d.groupBy("_bkt")
        .agg(F.sum(val).cast(sum_type).alias("_bt"))
        .withColumn(
            "_boff",
            F.coalesce(
                F.sum("_bt").over(
                    Window.orderBy("_bkt").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).cast(sum_type),
        )
        .select("_bkt", "_boff")
    )
    return (
        d.join(F.broadcast(offsets), "_bkt")
        .withColumn(
            cumsum_col,
            (
                F.col("_boff") + F.coalesce(F.sum(val).over(frame), F.lit(0))
            ).cast(sum_type),
        )
        .drop("_bkt", "_boff")
    )


def bucketed_cummax(
    df: DataFrame,
    order_cols: str | list[str],
    value_col: str,
    cummax_col: str = "cummax",
    bucket_width: float = 1.0,
    exclusive: bool = False,
) -> DataFrame:
    """``MAX(value) OVER (ORDER BY ...)`` for DOMAIN-BOUNDED numeric
    lead order keys — the running-extreme sibling of
    :func:`bucketed_cumsum` (r12), with max's algebra substituted for
    sum's: the cross-bucket combine is ``greatest`` (null-skipping, so
    an empty predecessor frame or all-null bucket contributes nothing)
    and the identity is NULL instead of 0 — the first global row's
    exclusive cummax is NULL, matching :func:`global_cummax` and the
    SQL frame's value for an empty frame. Values carry as double
    (exact for integrals below 2^53); nulls in ``value_col`` are
    ignored and NaN is masked to null (JVM MAX would otherwise elect
    NaN). Same boundedness contract as :func:`bucketed_cumsum`: the
    FIRST order column must be numeric with a domain-bounded
    ``range / bucket_width`` bucket frame.
    """
    cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)

    val = F.col(value_col).cast("double")
    val = F.when(~F.isnan(val), val)

    d = df.withColumn(
        "_bkt", F.floor(F.col(cols[0]) / F.lit(float(bucket_width)))
    )
    wb = Window.partitionBy("_bkt").orderBy(*cols)
    frame = wb.rowsBetween(Window.unboundedPreceding, -1 if exclusive else 0)
    offsets = (
        d.groupBy("_bkt")
        .agg(F.max(val).alias("_bm"))
        .withColumn(
            "_boff",
            F.max("_bm").over(
                Window.orderBy("_bkt").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
        )
        .select("_bkt", "_boff")
    )
    return (
        d.join(F.broadcast(offsets), "_bkt")
        .withColumn(cummax_col, F.greatest(F.col("_boff"), F.max(val).over(frame)))
        .drop("_bkt", "_boff")
    )


def global_cummax(
    df: DataFrame,
    order_cols: str | list[str],
    value_col: str,
    cummax_col: str = "cummax",
    n_parts: int = 32,
    exclusive: bool = False,
) -> DataFrame:
    """Global ``MAX(value) OVER (ORDER BY ...)`` without the
    single-partition window — the running-extreme sibling of
    :func:`global_cumsum` (record-high series, 2-D skyline dominance).

    Identical plan shape to :func:`global_cumsum` (one range shuffle,
    ONE ``np.maximum.accumulate`` Python pass whose output is
    checkpointed once; per-partition maxes as a JVM ``max GROUP BY
    _pid`` over that same checkpointed output — no second Python pass,
    the r12 single-pass rewrite — then an ``n_parts``-row predecessor
    window -> broadcast back), with max's algebra substituted for
    sum's: the cross-partition combine is ``greatest`` instead of ``+``
    and the identity is -inf instead of 0. ``exclusive=True`` gives the
    strict-predecessor form; the first global row has NO predecessor, so
    its exclusive cummax is NULL (the SQL frame's value for an empty
    frame), not -inf. Values are carried as double — exact for
    integrals below 2^53; nulls in ``value_col`` are ignored (never the
    max), matching SQL MAX.
    """
    import numpy as np
    from pyspark import TaskContext
    from pyspark.sql import types as T

    cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)

    part = df.repartitionByRange(n_parts, *[F.col(c) for c in cols]).sortWithinPartitions(
        *cols
    )

    local_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("_pid", T.IntegerType()), T.StructField("_lmax", T.DoubleType())]
    )

    def _values(pdf):
        # nulls must never win a max: map them to -inf
        return pdf[value_col].astype("float64").fillna(-np.inf).to_numpy()

    def _prefix(batches):
        pid = TaskContext.get().partitionId()
        carry = -np.inf
        for pdf in batches:
            v = _values(pdf)
            cmax = np.maximum.accumulate(v)
            if exclusive and len(v):
                # len guard: on a 0-row batch the concatenate would emit
                # a 1-row [-inf] that can't be assigned to the frame
                lmax = np.concatenate(([-np.inf], cmax[:-1]))
            else:
                lmax = cmax
            out = pdf.copy()
            out["_pid"] = np.int32(pid)
            out["_lmax"] = np.maximum(carry, lmax)
            if len(v):
                carry = max(carry, cmax[-1])
            yield out

    local = part.mapInPandas(_prefix, schema=local_schema).localCheckpoint(
        eager=False
    )

    # n_parts rows — dimension-sized predecessor window, same bound as
    # global_cumsum's offsets side. The per-partition total max comes
    # from a JVM aggregate over the checkpointed prefix output (MAX
    # skips nulls — and NaN is masked to null, matching _values'
    # fillna(-inf), where JVM max would otherwise elect NaN — so an
    # all-null partition yields NULL = the -inf identity after the
    # coalesce below, same as the old Python ``_totals`` pass's -inf).
    tot_v = F.col(value_col).cast("double")
    offsets = (
        local.groupBy("_pid")
        .agg(F.max(F.when(~F.isnan(tot_v), tot_v)).alias("_m"))
        .withColumn(
            "_offset",
            F.max("_m").over(
                Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
            ),
        )
        .select("_pid", F.coalesce("_offset", F.lit(float("-inf"))).alias("_offset"))
    )
    out = local.join(F.broadcast(offsets), "_pid").withColumn(
        cummax_col, F.greatest(F.col("_lmax"), F.col("_offset"))
    )
    # -inf means "empty frame" (first row, exclusive) -> SQL NULL
    out = out.withColumn(
        cummax_col,
        F.when(F.col(cummax_col) == F.lit(float("-inf")), F.lit(None).cast("double"))
        .otherwise(F.col(cummax_col)),
    )
    return out.drop("_pid", "_lmax", "_offset")


# --- z-order layout ---------------------------------------------------------

def _with_bucket_col(
    df: DataFrame,
    col_name: str,
    boundaries: list[float],
    bits: int,
    out_col: str,
) -> DataFrame:
    """Append ``out_col`` = bucket id in [0, 2^bits) for ``col_name``
    against sorted quantile ``boundaries`` — the count of boundaries
    <= value — in O(bits) work per row.

    Phrased as a ``bits``-level binary search over the literal boundary
    array, each level its OWN projection (small ``lo``/``hi`` state
    columns). Per-row cost is log2 in the bucket count; the obvious
    alternatives are both 2^bits per row and fall over at the
    documented bits=8 default: an ``F.aggregate`` fold is interpreted
    per element (higher-order functions never enter codegen), and a
    flat 255-comparison sum compiles past the JVM's 8KB JIT method
    limit so the generated code runs in the bytecode interpreter
    (measured: 22s vs 0.5s per 600k rows x 2 columns). The level
    state lands in separate projections because inlining level k into
    level k+1 doubles the expression per level — CollapseProject keeps
    them apart on its own (each alias is non-cheap and referenced more
    than once), and codegen fuses the whole ladder into one stage of
    small JIT-able methods.

    NULL/NaN values: a NULL comparison keeps ``lo`` unchanged, so NULLs
    land in bucket 0 (same as the previous fold's ``when`` semantics);
    NaN compares greater than everything and lands in the top bucket.
    Duplicate boundaries (heavy skew) leave some bucket ids unreachable
    — harmless for clustering, identical to the fold.
    """
    arr = array_double_lit([float(b) for b in boundaries])  # one literal node
    v = F.col(col_name).cast("double")
    n = len(boundaries)  # 2^bits - 1; answer (the count) lies in [0, n]
    lo_c, hi_c = f"__{out_col}_lo", f"__{out_col}_hi"
    df = df.select("*", F.lit(0).alias(lo_c), F.lit(n).alias(hi_c))
    for _ in range(bits):
        lo, hi = F.col(lo_c), F.col(hi_c)
        mid = ((lo + hi + F.lit(1)) / F.lit(2)).cast("int")
        # boundaries[mid-1] <= v  (F.get is 0-based, null-safe out of
        # bounds); mid >= 1 guards the lo == hi == 0 fixed point
        ge = (mid >= F.lit(1)) & (F.get(arr, mid - F.lit(1)) <= v)
        df = df.select(
            "*",
            F.when(ge, mid).otherwise(lo).alias(lo_c + "_n"),
            F.when(ge, hi).otherwise(mid - F.lit(1)).alias(hi_c + "_n"),
        ).drop(lo_c, hi_c)
        df = df.withColumnRenamed(lo_c + "_n", lo_c).withColumnRenamed(
            hi_c + "_n", hi_c
        )
    return (
        df.withColumn(out_col, F.least(F.col(lo_c), F.lit((1 << bits) - 1)))
        .drop(lo_c, hi_c)
    )


def zorder_value(bucket_cols, bits: int):
    """Interleave the bits of per-column bucket ids into one Morton
    (Z-order) key — pure integer expressions, whole-stage-codegen."""
    ncols = len(bucket_cols)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(bucket_cols):
            bit = F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * ncols + j))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 32,
    bits: int = 8,
    quantile_error: float = 0.001,
) -> None:
    """Rewrite a dataset clustered on the Z-order (Morton) interleave of
    ``cols`` — multi-dimensional file skipping.

    ``write_range_sorted`` gives perfect footer-stat skipping on ONE
    column and none on the others; Z-order trades a little of that for
    locality on EVERY listed column: each output file covers a compact
    hyper-rectangle-ish region, so a narrow predicate on ANY of the
    columns overlaps only ~N^((d-1)/d) of N files instead of all of
    them. This is the standard lakehouse OPTIMIZE ZORDER BY pattern,
    done with plain Spark:

    1. Per column, quantile-bucket values into 2^bits ranks
       (``approxQuantile`` — one pass, a 2^bits-sized array to the
       driver; rank-based, so skew cannot collapse buckets).
    2. Interleave bucket bits into a Morton key (integer expressions).
    3. ``repartitionByRange`` + sort on the key; parquet footers then
       carry tight per-file min/max on every clustered column.

    Columns must be numeric (cast-able to double for bucketing).
    """
    nb = 1 << bits
    probs = [i / nb for i in range(1, nb)]
    # one scan for every column's boundaries (the multi-column overload),
    # not one scan per column
    all_bounds = df.approxQuantile(cols, probs, quantile_error)
    # Bucket ids land as their own attributes (O(bits)-per-row binary
    # search, see _with_bucket_col) before the Morton interleave:
    # zorder_value references every bucket once per bit, and an
    # attribute reference is free where an inlined bucket expression
    # would be copied bits x ncols times. The interleave itself is then
    # 16 integer bit-ops over two int columns.
    tmp_cols = [f"__zbucket_{i}" for i in range(len(cols))]
    staged = df
    for c, bounds, t in zip(cols, all_bounds, tmp_cols):
        staged = _with_bucket_col(staged, c, bounds, bits, t)
    z = zorder_value([F.col(t) for t in tmp_cols], bits)
    (
        staged.withColumn("_z", z)
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z", *tmp_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


# --- bloom prefilter ---------------------------------------------------------

#: xxhash64 salt for the second bloom hash (Kirsch-Mitzenmacher double
#: hashing: position_i = h1 + i*h2 mod m needs two independent hashes).
_BLOOM_SALT = 0x9E3779B9


def _bloom_positions(key: Column, num_bits: int, num_hashes: int) -> Column:
    """Array of ``num_hashes`` bit positions for ``key`` — pure JVM
    expressions, so build and probe sides derive identical positions
    with no Python in the per-row path. Both hashes are folded into
    small non-negative ranges FIRST (h1 mod m, h2 mod 2^31) so the
    affine combination stays far from long overflow — ANSI mode (the
    Spark 4 default) makes wraparound an error, not a wrap."""
    h1, h2 = _bloom_h1_h2(key, num_bits)
    return F.array(
        *[F.pmod(h1 + F.lit(i) * h2, F.lit(num_bits)) for i in range(num_hashes)]
    )


def bloom_build(
    keys: DataFrame, key_col: str, num_bits: int, num_hashes: int = 7
):
    """Build a bloom bitmap (numpy uint64 words) from a key column.

    Distributed build with a BOUNDED driver transfer: per-key positions
    explode JVM-side, then ``groupBy(word_index).agg(bit_or)`` collapses
    them into at most ``num_bits/64`` sparse words — the collect is
    O(bitmap), never O(keys). Spark's partial aggregation ORs word
    updates map-side, so the shuffle carries at most one row per
    (partition, word).

    Sizing: ~10 bits/key gives ~1% false positives with 7 hashes
    (m/n = 9.6, k = 0.693*m/n). The bitmap is the same object you'd
    broadcast for a broadcast-hash-join, at ~1/50th the bytes/key — the
    regime where bloom prefiltering wins is a build side too big to
    broadcast as a hash relation but whose bitmap still fits (100M keys
    = 120 MB at 1% fpp).
    """
    import numpy as np

    words = (
        keys.select(
            F.explode(
                _bloom_positions(F.col(key_col), num_bits, num_hashes)
            ).alias("_pos")
        )
        .select(
            F.shiftright("_pos", 6).alias("_word"),
            F.expr("shiftleft(1L, int(_pos % 64))").alias("_bit"),
        )
        .groupBy("_word")
        .agg(F.bit_or("_bit").alias("_bits"))
        .collect()
    )
    bitmap = np.zeros((num_bits + 63) // 64, dtype=np.uint64)
    for r in words:
        bitmap[r["_word"]] = np.uint64(r["_bits"] & 0xFFFFFFFFFFFFFFFF)
    return bitmap


# Bitmaps at or under this many 64-bit words (256 Kbit = 32 KB) inline
# into the probe plan as a literal word array and the membership test
# runs entirely in codegen; larger bitmaps broadcast out-of-band and
# probe through the Arrow-batched numpy path. Tests force the Arrow
# path by monkeypatching this to 0.
_BLOOM_INLINE_MAX_WORDS = 4096


def _bloom_h1_h2(key: Column, num_bits: int) -> tuple[Column, Column]:
    """The double-hashing pair behind :func:`_bloom_positions` —
    ``pos_i = (h1 + i*h2) mod num_bits`` reconstructs every position
    from just these two values (h1 < num_bits, h2 <= 2^31, so the
    affine combination stays far from long overflow)."""
    h1 = F.pmod(F.xxhash64(key), F.lit(num_bits))
    h2 = F.pmod(F.xxhash64(key, F.lit(_BLOOM_SALT)), F.lit(0x7FFFFFFF)) + 1
    return h1, h2


def bloom_prefilter(
    probe: DataFrame,
    key_col: str,
    bitmap,
    num_bits: int,
    num_hashes: int = 7,
) -> DataFrame:
    """Drop probe rows whose key is definitely not in the built set.

    No false negatives (every true match survives); false positives pass
    through and must be eliminated by the exact join that follows — the
    bloom's job is to shrink the probe side BEFORE its shuffle, which at
    100 TB is the difference between shuffling the full fact table and
    shuffling the ~matching slice. This is the explicit, composable form
    of what Spark's runtime row-group filtering injects for selective
    broadcast joins; being explicit, it also covers shuffle joins and
    multi-stage pipelines where the optimizer can't see the key set.

    Two probe paths, picked by bitmap size (r12):

    - **Inline JVM** (<= ``_BLOOM_INLINE_MAX_WORDS`` words): the word
      array embeds in the plan as a literal and each of the
      ``num_hashes`` bit tests is a codegen ``bit_get(element_at(...))``
      — no Python worker, no broadcast, no Arrow transfer at all. Small
      filters (dimension-slice key sets) live here.
    - **Arrow-batched numpy** (larger): the bitmap broadcasts once and
      the pandas UDF receives only the two double-hashing values per
      row (16 bytes, not a ``num_hashes``-element position array — the
      positions re-derive vectorized in numpy with the same int64
      affine arithmetic), then gathers + bit-tests whole batches.

    Both paths test the exact same positions as the build
    (``pos_i = (h1 + i*h2) mod num_bits``), so the one-sided guarantee
    is unchanged.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    h1c, h2c = _bloom_h1_h2(F.col(key_col), num_bits)
    words = np.ascontiguousarray(bitmap)

    if len(words) <= _BLOOM_INLINE_MAX_WORDS:
        # explicit long literals: a small word value would otherwise make
        # an array<int>, shrinking bit_get's legal position range to 32.
        # Built as ONE parsed SQL expression (r12 driver-side construction
        # cost, vectors.array_double_lit precedent): the per-word F.lit
        # loop cost ~3 py4j round-trips per word — ~12k at the inline cap.
        # CAST(string AS BIGINT) round-trips every int64 exactly,
        # including Long.MIN_VALUE, which a bare negative literal would
        # lex as DECIMAL.
        arr = F.expr(
            "ARRAY("
            + ",".join(
                f"CAST('{int(w)}' AS BIGINT)" for w in words.view(np.int64)
            )
            + ")"
        )
        pred = F.lit(True)
        for i in range(num_hashes):
            pos = F.pmod(h1c + F.lit(i) * h2c, F.lit(num_bits))
            word = F.element_at(arr, (F.shiftright(pos, 6) + 1).cast("int"))
            pred = pred & (
                F.bit_get(word, F.pmod(pos, F.lit(64)).cast("int")) == 1
            )
        return probe.where(pred)

    spark = probe.sparkSession
    bc = spark.sparkContext.broadcast(words)

    @pandas_udf("boolean")
    def _might_contain(h1: pd.Series, h2: pd.Series) -> pd.Series:
        if not len(h1):
            return pd.Series([], dtype=bool)
        bits = bc.value
        a = h1.to_numpy(dtype=np.int64)
        b = h2.to_numpy(dtype=np.int64)
        hit = np.ones(len(a), dtype=bool)
        for i in range(num_hashes):
            pos = (a + i * b) % num_bits  # same int64 affine as the JVM
            hit &= (
                (bits[pos >> 6] >> (pos & 63).astype(np.uint64))
                & np.uint64(1)
            ).astype(bool)
        return pd.Series(hit)

    return probe.where(_might_contain(h1c, h2c))
