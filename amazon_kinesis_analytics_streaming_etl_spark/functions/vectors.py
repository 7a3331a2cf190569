"""Vector math over ``array<float>`` columns — pure JVM expressions.

Built on ``zip_with`` / ``aggregate`` higher-order functions: JVM-side
(no Python serialization), but note HOFs are evaluated INTERPRETED per
element — lambda expressions never enter whole-stage codegen. That
constant is fine for per-ROW linear work (norms, quantization, per-doc
scoring: one O(dim) pass per row, dwarfed by scan I/O), and wrong for
per-PAIR hot loops — quadratic verification twins go through a numpy
gram matrix on a bounded collect (plans/llm._exact_cos_pairs), and any
production pair path is LSH/bucket-bounded before cosine runs. At
100 TB these expressions scale linearly per-row with no shuffle;
shuffles only appear in the surrounding join/topk.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two equal-length numeric arrays (JVM-side)."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    """L2 norm."""
    a = F.col(a) if isinstance(a, str) else a
    sq = F.aggregate(
        a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    return F.sqrt(sq)


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL-safe on zero-norm vectors (returns NULL)."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return cosine_from_norms(a, b, norm(a), norm(b))


def cosine_from_norms(
    a: Column, b: Column, nrm_a: Column, nrm_b: Column
) -> Column:
    """``cosine`` with the two L2 norms supplied by the caller — for
    pair self-joins that precompute ``norm`` per ROW before the join
    (bit-identical to :func:`cosine`: same fold expressions, same float
    order, just evaluated once per row instead of once per pair). The
    zero-norm -> NULL contract lives HERE so the per-pair and
    norms-precomputed forms cannot drift."""
    denom = nrm_a * nrm_b
    return F.when(denom != 0.0, dot(a, b) / denom)


def l2sq(a: Column | str, b: Column | str) -> Column:
    """Squared L2 distance between two equal-length numeric arrays.

    Product-quantization codebook training/assignment runs on squared
    distances (argmin is monotone in the square, so the sqrt is never
    needed) — keeps the expression one zip_with + one aggregate."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    diffs = F.zip_with(
        a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def _double_sql(x: float) -> str:
    """SQL text that lexes to EXACTLY this IEEE-754 double. ``repr`` emits
    the shortest decimal string that round-trips in Python, and Spark's
    lexer hands exponent-form numeric literals to Java ``Double.valueOf``,
    which returns the nearest double — the same value. An ``E0`` marker is
    appended when ``repr`` has no exponent so the literal lexes as DOUBLE
    (bare decimals like ``1.5`` lex as DECIMAL in Spark SQL)."""
    import math

    v = float(x)
    if not math.isfinite(v):
        raise ValueError(f"non-finite plane component: {x!r}")
    s = repr(v)
    return s if ("e" in s or "E" in s) else s + "E0"


def _array_double_sql(vals: list[float]) -> str:
    """An ``array<double>`` literal as SQL text (bit-exact components)."""
    return "ARRAY(" + ",".join(_double_sql(v) for v in vals) + ")"


def _dot_sql(a_sql: str, b_sql: str) -> str:
    """SQL-text twin of :func:`dot` — same zip_with+aggregate fold, same
    per-element cast order, so the float result is bit-identical."""
    return (
        f"aggregate(zip_with({a_sql}, {b_sql}, (x, y) -> "
        "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), "
        "(acc, x) -> acc + x)"
    )


def _norm_sql(a_sql: str) -> str:
    """SQL-text twin of :func:`norm` (same fold order)."""
    return (
        f"SQRT(aggregate({a_sql}, CAST(0 AS DOUBLE), (acc, x) -> "
        "acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    )


def _nested_array_double_sql(vals) -> str:
    if isinstance(vals, (list, tuple)):
        return (
            "ARRAY(" + ",".join(_nested_array_double_sql(v) for v in vals) + ")"
        )
    return _double_sql(vals)


def array_double_lit(vals: list) -> Column:
    """A (possibly nested) ``array<double>`` literal built as ONE parsed
    SQL expression. ``F.lit(list)`` expands to ``array(lit, lit, ...)``
    element-by-element over py4j — a 1,024-element nested codebook costs
    thousands of driver round-trips per use (r12: the IVF/PQ family spent
    2-3 s per query CONSTRUCTION in those conversions). The parsed
    ``ARRAY(...)`` text constant-folds to the same CreateArray-of-Literals
    tree with bit-identical components (:func:`_double_sql`). Empty (sub)
    arrays fall back to ``F.lit`` — SQL ``ARRAY()`` types as
    array<string>, not the array<double> the Column form infers."""

    def _has_empty(v) -> bool:
        return isinstance(v, (list, tuple)) and (
            len(v) == 0 or any(_has_empty(x) for x in v)
        )

    if _has_empty(vals):
        return F.lit(vals)
    return F.expr(_nested_array_double_sql(vals))


def cosine_to_query(vec_col: str, query_vec: list[float]) -> Column:
    """``cosine(F.col(vec_col), F.lit(query_vec))`` as ONE parsed SQL
    expression (one py4j round-trip instead of ~25 — r12 driver-side
    construction cost; see :func:`_sign_bits_sql`). Bit-identical to the
    Column-API form: same dot/norm folds in the same float order, same
    duplicated-denominator CASE shape, same zero-norm -> NULL contract
    (pinned by tests/test_vectors_sql_form.py)."""
    a = f"`{vec_col}`"
    b = _array_double_sql(query_vec)
    denom = f"({_norm_sql(a)} * {_norm_sql(b)})"
    return F.expr(
        f"CASE WHEN {denom} != CAST(0 AS DOUBLE) "
        f"THEN {_dot_sql(a, b)} / {denom} END"
    )


def _sign_bits_sql(col_name: str, planes: list[list[float]]) -> str:
    """The :func:`sign_bits` expression as ONE SQL string — same Catalyst
    tree as the Column-API form after constant folding (each plane is an
    array literal; the per-plane dot is the same zip_with+aggregate fold
    in the same float order; the bit packing is the same left-associated
    long-add chain), built in one py4j round-trip instead of ~12 per
    plane (r12: driver-side construction cost — the suite spent more
    wall-clock in py4j socket round-trips than in executors; guide §1.2
    applied to the DRIVER's per-query work). Bit-equality of the two
    forms is pinned by tests/test_vectors_sql_form.py."""
    col = f"`{col_name}`"
    terms = ["CAST(0 AS BIGINT)"]
    for i, plane in enumerate(planes):
        d = _dot_sql(col, _array_double_sql(plane))
        bit = f"(CASE WHEN {d} >= 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        terms.append(f"({bit} * CAST({int(2 ** i)} AS BIGINT))")
    return " + ".join(terms)


def sign_bits(a: Column | str, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH signature: one sign bit per plane, packed as a
    long. ``planes`` is a small deterministic list (seeded off-line), so the
    signature is reproducible and computable fully JVM-side.

    Scale path for ANN: group vectors by signature bucket; compare only
    within buckets (and neighboring probes) instead of all pairs.

    Given a column NAME, the whole signature is built as one parsed SQL
    expression (one py4j round-trip — see :func:`_sign_bits_sql`); given
    an arbitrary ``Column``, the equivalent expression is assembled
    through the Column API. Both forms produce bit-identical signatures
    (same dot-fold order, same integer packing).
    """
    if isinstance(a, str):
        return F.expr(_sign_bits_sql(a, planes))
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        # one array-literal node per plane (not dim lit nodes — plan size)
        arr = F.lit([float(x) for x in plane])
        d = dot(a, arr)
        bit = F.when(d >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = sig + (bit * F.lit(int(2**i)).cast("long"))
    return sig


def lsh_tables(dim: int, n_tables: int, n_bits: int, seed: int = 42) -> list[list[list[float]]]:
    """``n_tables`` independent sets of ``n_bits`` random hyperplanes.

    Multi-table LSH is the recall knob single-table signatures lack: a
    pair collides if it shares a full signature in ANY table, so recall
    is 1-(1-p^b)^L instead of p^b (p = 1 - angle/pi). At low similarity
    thresholds a single table's recall collapses (p^8 ~= 2% at cos 0.3);
    more tables buy recall linearly in scan cost while candidate
    verification stays bounded per bucket."""
    import random

    rng = random.Random(seed)
    return [
        [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_bits)]
        for _ in range(n_tables)
    ]


def sign_bits_tables(
    a: Column | str, tables: list[list[list[float]]]
) -> Column:
    """Array of per-table sign-bit signatures (one long per table) —
    computed in a single JVM projection pass; downstream ops explode the
    array with its table index so buckets from different tables never
    collide with each other."""
    if isinstance(a, str):
        return F.expr(
            "ARRAY("
            + ",".join(_sign_bits_sql(a, planes) for planes in tables)
            + ")"
        )
    return F.array(*[sign_bits(a, planes) for planes in tables])
