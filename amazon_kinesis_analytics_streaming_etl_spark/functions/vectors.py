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


def sign_bits(a: Column | str, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH signature: one sign bit per plane, packed as a
    long. ``planes`` is a small deterministic list (seeded off-line), so the
    signature is reproducible and computable fully JVM-side.

    Scale path for ANN: group vectors by signature bucket; compare only
    within buckets (and neighboring probes) instead of all pairs.
    """
    a = F.col(a) if isinstance(a, str) else a
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
    a = F.col(a) if isinstance(a, str) else a
    return F.array(*[sign_bits(a, planes) for planes in tables])
