"""Deduplication operators for large-scale document corpora.

Five families, all partition-parallel with no driver-side collects and no
cartesian joins — the 100 TB posture is: per-row signatures (JVM
expressions), then *blocked* self-joins where block = equal signature/band
hash, so the shuffle is keyed by short hashes and skew is bounded by band
width:

- exact        : groupBy(md5(normalized_text)) keep-first
- ngram_jaccard: inverted shingle index join -> exact Jaccard on candidates
- minhash_lsh  : k seeded min-hashes -> banded signatures -> bucket join
                 -> exact Jaccard verify
- simhash      : 64-bit sign-aggregated token-hash signature; near-dup =
                 equal signature (or small Hamming distance via band split)
- embedding    : cosine similarity within LSH/label blocks

The generalization anchor in the reference is the idempotent keyed upsert
(doc id = trip_id, StreamingEtl.java:250-258): dedup-by-key. Everything
else is north-star surface (BASELINE.json LLM-data-pipeline operators).
"""

from __future__ import annotations

import pandas as pd  # module scope: pandas_udf type hints must resolve
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import fingerprint_md5, shingle_hashes
from ..functions.vectors import array_double_lit, cosine


def _checkpoint_released(result: DataFrame, cached: list[DataFrame]) -> DataFrame:
    """Materialize ``result`` eagerly (localCheckpoint), then unpersist the
    cached intermediates — the storage contract for every pair operator
    here: after the call returns, the only executor storage held is the
    (threshold-filtered, small) result itself, whose checkpoint blocks are
    ContextCleaner-freed when the caller drops the DataFrame. Lineage is
    truncated too, so downstream iterative consumers (``dup_clusters``)
    never replan the LSH joins."""
    try:
        return result.localCheckpoint(eager=True)
    finally:
        for c in cached:
            c.unpersist()


# --- exact dedup ------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id document per exact (normalized) text fingerprint.

    One hash-aggregate shuffle keyed by md5 — the minimal-shuffle exact
    dedup. At scale: map-side partial aggregation applies; fingerprints are
    uniform so no skew.
    """
    fp = fingerprint_md5(F.col(text_col)).alias("fingerprint")
    return (
        df.select(fp, F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("dup_count"))
    )


def dedup_keep_first(df: DataFrame, key_cols: list[str], order_col: str) -> DataFrame:
    """Generic keep-first dedup: row_number()=1 per key ordered by
    ``order_col`` (the windowed generalization of K4's idempotent doc id)."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


# --- n-gram Jaccard near-dup ------------------------------------------------
#
# Materialization note (scale-critical): Catalyst inlines generator
# children, so `explode(<heavy array expr>)` recomputes the WHOLE array
# per OUTPUT row — O(shingles^2) per document. Every shingle pipeline
# therefore materializes the per-doc hashed-shingle array (persist) before
# exploding or self-joining; at cluster scale this is a cached/checkpointed
# signature table, the standard shape for corpus dedup.

def _shingled(df: DataFrame, text_col: str, id_col: str, k: int) -> DataFrame:
    """Per-doc distinct word-k-shingle hash arrays: (_id, _h, _n).

    Shingles are 8-byte xxhash64 values, not strings — cheaper to store,
    shuffle and intersect; collision probability is ~n^2/2^64 (negligible
    at any realistic corpus size per partition-block).
    MATERIALIZED (persist) — see module note. Callers must unpersist the
    returned DataFrame once their result is materialized (the public pair
    operators do this via ``_checkpoint_released``).

    The RAW (id, text) rows are spread to defaultParallelism BEFORE the
    shingle projection (parse_dead_letter precedent): a small-SF corpus
    arrives as one parquet split, so without the spread the zip_with +
    xxhash shingle chain — the dedup family's single most expensive
    map stage — runs single-threaded, and the one-partition cache then
    serializes every downstream map stage too (signature UDF, banding
    explode, inverted-index explode). The exchange carries only the raw
    text bytes; the arrays are computed ABOVE it (an earlier attempt
    that repartitioned the computed arrays shuffled ~10x the bytes and
    measured as a net loss). At real scale a corpus arrives
    pre-partitioned and this is a no-op in spirit; all derived values
    (hashes, counts, int-ratio Jaccard) are partitioning-independent.
    """
    return (
        df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
        .repartition(df.sparkSession.sparkContext.defaultParallelism)
        .select("_id", shingle_hashes(F.col("_t"), k).alias("_h"))
        .withColumn("_n", F.size("_h"))
        .persist()
    )


def _intersection_counts(sh, pair_pred, group_cols) -> DataFrame:
    """Shared inverted-index intersection scaffold for the set-overlap
    pair operators (Jaccard and containment): explode the materialized
    shingle-hash arrays into (doc, size, hash) postings, self-join on
    the hash under ``pair_pred`` (the pair-identity condition plus the
    operator's semantics-preserving size prune — the ONLY parts that
    legitimately differ), and count co-occurrences per projected pair.
    ``group_cols`` maps output names to a/b-side columns. Cost is driven
    by shingle co-occurrence, never |docs|^2; shuffles are keyed by the
    shingle hash then the pair key."""
    inv = sh.select("_id", "_n", F.explode("_h").alias("_shash"))
    a, b = inv.alias("a"), inv.alias("b")
    return (
        a.join(b, (F.col("a._shash") == F.col("b._shash")) & pair_pred)
        .groupBy(*[c.alias(n) for n, c in group_cols.items()])
        .agg(F.count("*").alias("inter"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    eager: bool = True,
) -> DataFrame:
    """All document pairs with word-k-shingle Jaccard >= threshold.

    Plan shape (scale-critical): explode distinct shingles -> inverted
    index (shingle_hash -> doc) -> self-join on shingle_hash gives
    per-pair intersection counts WITHOUT comparing all pairs; union sizes
    come from per-doc shingle counts. The only shuffles are keyed by
    shingle hash (high cardinality, low skew) and by (id_a, id_b).

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard rounded to 6.
    ``eager`` (default) materializes the result and releases the cached
    shingle table before returning — no storage outlives the call. Pass
    ``eager=False`` to keep the plan lazy; the shingle cache then lives
    until session end (only for composing with a shared shingle table).
    """
    sh = _shingled(df, text_col, id_col, k)
    # Length-ratio prune (semantics-preserving): jaccard <= min/max, so
    # pairs with max*threshold > min can never pass the filter.
    ratio_ok = (
        F.greatest(F.col("a._n"), F.col("b._n")) * F.lit(threshold)
        <= F.least(F.col("a._n"), F.col("b._n")).cast("double")
    )
    inter = _intersection_counts(
        sh,
        (F.col("a._id") < F.col("b._id")) & ratio_ok,
        {
            "id_a": F.col("a._id"),
            "id_b": F.col("b._id"),
            "na": F.col("a._n"),
            "nb": F.col("b._n"),
        },
    )
    jac = inter.withColumn(
        "jaccard",
        F.round(
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"),
            6,
        ),
    )
    out = jac.where(F.col("jaccard") >= threshold).select(
        F.col("id_a"), F.col("id_b"), F.col("jaccard")
    )
    return _checkpoint_released(out, [sh]) if eager else out


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.8,
    eager: bool = True,
) -> DataFrame:
    """DIRECTED near-dup pairs by shingle containment
    ``C(A->B) = |shingles(A) ∩ shingles(B)| / |shingles(A)|`` >= threshold.

    Containment (Broder 1997's second resemblance measure) is the
    asymmetric complement to Jaccard: a short document embedded verbatim
    inside a long one scores C(short->long) ~= 1 while Jaccard ~=
    |short|/|long| ~= 0 — so quote-inclusion, boilerplate-wrapping, and
    excerpt duplicates are invisible to ``ngram_jaccard_pairs`` but
    caught here. Both directions are emitted (C is not symmetric).

    Same inverted-index plan shape as Jaccard — explode distinct
    shingles, self-join on the shingle hash, count intersections — so
    cost is driven by shingle co-occurrence, never by |docs|^2. The
    semantics-preserving prune differs: ``inter <= nb`` implies
    ``C(A->B) <= nb/na``, so pairs with ``nb < threshold * na`` are
    dropped before the join (a containing document can be arbitrarily
    LARGER but not much smaller than the contained one).

    Returns (id_src, id_dst, containment): id_src's shingles are
    covered by id_dst's at >= threshold, rounded to 6.
    """
    sh = _shingled(df, text_col, id_col, k)
    ratio_ok = (
        F.col("b._n").cast("double") >= F.col("a._n") * F.lit(threshold)
    )
    inter = _intersection_counts(
        sh,
        (F.col("a._id") != F.col("b._id")) & ratio_ok,
        {
            "id_src": F.col("a._id"),
            "id_dst": F.col("b._id"),
            "na": F.col("a._n"),
        },
    )
    cont = inter.withColumn(
        "containment",
        F.round(F.col("inter").cast("double") / F.col("na").cast("double"), 6),
    )
    out = cont.where(F.col("containment") >= threshold).select(
        "id_src", "id_dst", "containment"
    )
    return _checkpoint_released(out, [sh]) if eager else out


def ngram_jaccard_pairs_prefix(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    eager: bool = True,
) -> DataFrame:
    """EXACT near-dup pairs (same contract as :func:`ngram_jaccard_pairs`)
    via PPJoin-style prefix filtering — the designed answer to the
    inverted index's stop-shingle residual (SCALE.md).

    Under a global rare-first shingle order, any pair with Jaccard >= t
    must share a shingle within each side's first ``|s| - ceil(t*|s|) + 1``
    shingles (prefix-filter completeness; Chaudhuri 2006 / Xiao 2008 —
    public results, PAPERS.md). So the candidate join indexes ONLY those
    prefixes: frequent shingles sort LAST in the global order and almost
    never enter a prefix, which removes exactly the posting lists that
    blow up the plain inverted index at 100 TB. Candidates are then
    verified with the full hash arrays (array_intersect) — exactness is
    by construction, no recall knob.

    Shuffles: document frequency (keyed by shingle), per-doc reorder
    (keyed by doc), candidate join (keyed by PREFIX shingle — bounded
    lists), verify joins (keyed by doc id). Nothing is broadcast."""
    sh = _shingled(df, text_col, id_col, k)
    inv = sh.select("_id", F.explode("_h").alias("_shash"))
    # Document frequency as ONE count-over-window keyed by shingle hash
    # (r12, the span-coverage precedent): the previous groupBy + join
    # back exploded the postings twice and shuffled them twice — the
    # near-unique shingle hashes barely compress under partial agg, so
    # the aggregate's exchange carried ~|postings| rows as well.
    # Measured 1.26 -> 0.92 s for the piece at sf0.1; same rows by
    # construction (count per hash attached to each posting).
    ordered = (
        inv.withColumn(
            "_df", F.count("*").over(Window.partitionBy("_shash"))
        )
        .groupBy("_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("_df", "_shash"))).alias("_os"),
            F.count("*").alias("_n"),
        )
    )
    p_len = (F.col("_n") - F.ceil(F.lit(threshold) * F.col("_n")) + 1).cast("int")
    pref = ordered.select(
        "_id",
        "_n",
        F.explode(
            F.slice(
                F.transform("_os", lambda st: st["_shash"]), F.lit(1), p_len
            )
        ).alias("_shash"),
    )
    a, b = pref.alias("a"), pref.alias("b")
    ratio_ok = (
        F.greatest(F.col("a._n"), F.col("b._n")) * F.lit(threshold)
        <= F.least(F.col("a._n"), F.col("b._n")).cast("double")
    )
    cand = (
        a.join(
            b,
            (F.col("a._shash") == F.col("b._shash"))
            & (F.col("a._id") < F.col("b._id"))
            & ratio_ok,
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._n").alias("na"),
            F.col("b._n").alias("nb"),
        )
        .distinct()
    )
    ha = sh.select(F.col("_id").alias("id_a"), F.col("_h").alias("_ha"))
    hb = sh.select(F.col("_id").alias("id_b"), F.col("_h").alias("_hb"))
    inter = F.size(F.array_intersect("_ha", "_hb"))
    out = (
        cand.join(ha, "id_a")
        .join(hb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                inter.cast("double")
                / (F.col("na") + F.col("nb") - inter).cast("double"),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return _checkpoint_released(out, [sh]) if eager else out


# --- MinHash + LSH ----------------------------------------------------------

def _minhash_multipliers(num_hashes: int):
    """Deterministic odd uint64 multipliers for the permutation family
    h_j(x) = a_j * x mod 2^64. An odd multiplier is a BIJECTION on the
    64-bit ring, so each h_j is a genuine permutation of the shingle-hash
    space — exactly what MinHash's min-over-permutation argument wants
    (the classic multiply-shift family; Broder's permutations
    approximated the standard way)."""
    import numpy as np

    rng = np.random.RandomState(42)
    return (
        rng.randint(1, 2**62, size=num_hashes).astype(np.uint64) * np.uint64(2)
        + np.uint64(1)
    )


def minhash_signature(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    k: int = 3,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """``num_hashes`` min-hash values per doc over the JVM-computed
    shingle hashes: h_j(doc) = min over shingles of a_j * xxhash64(shingle)
    mod 2^64 (odd-multiplier permutation family, `_minhash_multipliers`).

    The min-reduction runs as ONE vectorized numpy matrix product per
    Arrow batch (a (H x S) uint64 wraparound multiply + min along S) — the
    interpreted-HOF formulation (nested transform/array_min re-invoking
    xxhash64 H x S times per row) was 3.5x slower at sf0.1 and is
    lambda-dispatch-bound, which at 100 TB makes the signature pass the
    corpus-scan bottleneck. Still O(H x S) per row, zero shuffle, and the
    shingle hashing itself stays JVM-side in ``_shingled``. Empty-shingle
    docs get NULL signatures. Pass ``shingled`` (a `_shingled` table) to
    share the materialized shingle arrays with other stages.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    sh = shingled if shingled is not None else _shingled(df, text_col, id_col, k)
    mult = _minhash_multipliers(num_hashes)

    @pandas_udf("array<bigint>")
    def _sig(hs: pd.Series) -> pd.Series:
        # One flattened segment-min pass per batch (r12): the per-doc loop
        # dispatched a tiny (H x S_doc) multiply+min per document, so the
        # batch cost was Python-dispatch-bound at thousands of small docs.
        # Flatten every doc's hashes into ONE array and run H vectorized
        # multiply+minimum.reduceat sweeps over it (segment boundaries =
        # doc starts) — identical uint64 wraparound products, identical
        # per-segment mins, so signatures are bit-identical to the loop
        # form (pinned by test_minhash_signature_vectorized_reference).
        # Memory stays ~S_total x 8 bytes per sweep, not H x S_total.
        n = len(hs)
        out = [None] * n
        lens = np.fromiter(
            (0 if h is None else len(h) for h in hs), dtype=np.int64, count=n
        )
        keep = np.flatnonzero(lens > 0)
        if keep.size == 0:
            return pd.Series(out)
        flat = np.concatenate(
            [np.asarray(hs.iloc[int(i)], dtype=np.int64) for i in keep]
        ).view(np.uint64)
        starts = np.zeros(keep.size, dtype=np.int64)
        np.cumsum(lens[keep][:-1], out=starts[1:])
        sig = np.empty((mult.size, keep.size), dtype=np.uint64)
        for j in range(mult.size):
            sig[j] = np.minimum.reduceat(mult[j] * flat, starts)
        rows = sig.T.view(np.int64)
        for pos, i in enumerate(keep):
            out[int(i)] = rows[pos]
        return pd.Series(out)

    return sh.select(
        F.col("_id"),
        F.when(F.col("_n") > 0, _sig("_h")).alias("signature"),
    )


def minhash_lsh_candidates(
    signatures: DataFrame,
    bands: int = 16,
    num_hashes: int = 64,
    assume_materialized: bool = False,
) -> DataFrame:
    """LSH banding: split each signature into ``bands`` rows, hash each
    band, group by (band_idx, band_hash) -> candidate pairs. The shuffle
    key is the band hash: docs only meet if they collide in >=1 band —
    never an all-pairs comparison.

    ``assume_materialized=True`` skips the internal persist — for callers
    (``minhash_near_dup_pairs``) that persisted ``signatures`` themselves
    and own its release. Default callers must unpersist ``signatures``
    after materializing (the candidate plan caches it).
    """
    rows_per_band = num_hashes // bands
    # Materialize signatures before the banding explode (module note).
    if not assume_materialized:
        signatures = signatures.persist()
    # Band hash = xxhash64 over the band's signature slots, statically
    # unrolled with element_at — stays in numeric codegen (hashing a
    # sliced-array-cast-to-string serializes per band; ~2x slower).
    # Built as ONE parsed SQL expression (r12 driver-side construction
    # cost, vectors._sign_bits_sql precedent): the Column-API unroll made
    # ~8 py4j round-trips per band; the parsed tree is the same
    # CreateNamedStruct/xxhash64(seed 42)/element_at chain, so band
    # hashes are bit-identical (pinned by
    # test_minhash_banding_sql_form_matches_column_api).
    band_structs = F.expr(
        "ARRAY("
        + ",".join(
            "NAMED_STRUCT('band', {b}, 'band_hash', XXHASH64({slots}))".format(
                b=b,
                slots=",".join(
                    f"element_at(`signature`, {b * rows_per_band + j + 1})"
                    for j in range(rows_per_band)
                ),
            )
            for b in range(bands)
        )
        + ")"
    )
    banded = (
        signatures.where(F.col("signature").isNotNull())
        .select("_id", F.explode(band_structs).alias("bh"))
        .select("_id", "bh.band", "bh.band_hash")
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
    threshold: float = 0.5,
    eager: bool = True,
) -> DataFrame:
    """MinHash-LSH candidate generation + exact Jaccard verification.

    Candidates come from band collisions (cheap, recall-tuned by
    bands/num_hashes); the verify step recomputes true Jaccard only for
    candidates. Returns (id_a, id_b, jaccard) with jaccard >= threshold.
    ``eager`` (default) materializes the verified pairs and releases both
    cached intermediates (shingles, signatures) before returning.
    """
    # One materialized shingle table shared by signature generation and
    # the verify join (module materialization note).
    sh = _shingled(df, text_col, id_col, k)
    sigs = minhash_signature(df, text_col, id_col, num_hashes, k, shingled=sh).persist()
    cands = minhash_lsh_candidates(sigs, bands, num_hashes, assume_materialized=True)
    pa = sh.select(
        F.col("_id").alias("id_a"), F.col("_h").alias("sh_a"), F.col("_n").alias("na")
    )
    pb = sh.select(
        F.col("_id").alias("id_b"), F.col("_h").alias("sh_b"), F.col("_n").alias("nb")
    )
    joined = cands.join(pa, "id_a").join(pb, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = F.round(
        inter.cast("double") / (F.col("na") + F.col("nb") - inter).cast("double"), 6
    )
    out = joined.select("id_a", "id_b", jac.alias("jaccard")).where(
        F.col("jaccard") >= threshold
    )
    return _checkpoint_released(out, [sh, sigs]) if eager else out


def dup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over near-dup pairs: every document gets a
    ``cluster_id`` = the min doc id reachable through dup edges — the
    step that turns pairwise dedup output into keep-one-per-cluster.

    Iterative min-label propagation (the Pregel/GraphX recipe in plain
    DataFrames): each round, every node takes the min of its own label
    and its neighbors'; converged when no label changes. Rounds needed =
    graph diameter — dup clusters are short chains, so a handful. Each
    round is one shuffle (groupBy id); ``localCheckpoint`` truncates the
    growing lineage (without it, round N replans rounds 1..N-1). The
    driver only coordinates the loop and reads a 1-row convergence
    count — labels never leave the cluster.
    """
    F_ = F
    fwd = pairs.select(F_.col(id_a).alias("u"), F_.col(id_b).alias("v"))
    rev = pairs.select(F_.col(id_b).alias("u"), F_.col(id_a).alias("v"))
    edges = fwd.union(rev).distinct().persist()
    labels = (
        edges.select(F_.col("u").alias("id"))
        .distinct()
        .withColumn("comp", F_.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        msgs = edges.join(labels, edges.u == labels.id).select(
            F_.col("v").alias("id"), F_.col("comp")
        )
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("id")
            .agg(F_.min("comp").alias("comp"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F_.col("n.comp") != F_.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels.select(F_.col("id").alias("doc_id"), F_.col("comp").alias("cluster_id"))


def duplicated_span_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    min_count: int = 2,
    eager: bool = True,
    deferred: bool | None = None,
) -> DataFrame:
    """Exact-substring duplication metric (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"): for each
    document, the fraction of its tokens covered by at least one k-token
    span that occurs >= min_count times in the corpus (including
    self-repeats — boilerplate repeated within one page counts, as in the
    paper's suffix-array formulation). By default returns one row per
    input doc: ``(doc_id, n_tokens, covered_tokens, dup_span_frac)``.
    With ``deferred=True`` returns ``(stats_df, cached_docs)`` — the
    caller must unpersist ``cached_docs`` after materializing
    ``stats_df``.

    ``deferred`` is the VERSIONED name for what ``eager=False`` came to
    mean after its return shape changed (round 7 replaced a
    DataFrame-with-attr contract with the tuple). ``eager=False`` still
    works as a deprecated alias for ``deferred=True`` and emits a
    DeprecationWarning; passing both raises if they conflict.

    Spark-first plan instead of a suffix array: positional span hashes
    per row (JVM zip_with chain, linear in tokens) -> global span-hash
    count (one hash-keyed shuffle with map-side partial agg) -> hash join
    back to positions -> per-doc interval union. The union of equal-length
    intervals is a single lead() window per doc: a span at position p
    covers [p, p+k); sorted by p, its net contribution is
    min(k, next_p - p) — no per-token explode, no arrays collected.
    Shuffles are keyed by span hash then doc id; nothing is broadcast or
    collected, so the plan is corpus-size-bounded end to end.

    ``eager`` (default) materializes the per-doc result and releases the
    cached span table (the storage contract of the pair operators).
    Unlike those, this result is one row per DOCUMENT, not a filtered
    pair set — at full corpus scale pass ``deferred=True``, write the
    returned plan straight to storage instead of checkpointing it, and
    then unpersist the second element of the returned tuple (an ad-hoc
    attribute on the DataFrame would be silently lost by the caller's
    first transformation).

    Returns the stats DataFrame by default; ``(stats, cached_docs)``
    when ``deferred=True`` — the caller owns ``cached_docs.unpersist()``.
    """
    from ..functions.text import span_hashes, token_count

    if not eager:
        import warnings

        if deferred is False:
            raise ValueError(
                "eager=False (deprecated alias for deferred=True) conflicts "
                "with explicit deferred=False"
            )
        warnings.warn(
            "duplicated_span_stats(eager=False) is deprecated; its return "
            "shape changed to (stats_df, cached_docs) in round 7 — pass "
            "deferred=True for the tuple form",
            DeprecationWarning,
            stacklevel=2,
        )
        deferred = True
    deferred = bool(deferred)

    # Spread the raw (id, text) rows before the span projection (r12,
    # _shingled precedent): with the count-over-window hit derivation
    # below, the tokenize + span-hash projection and the positional
    # explode run exactly once on the critical path, so parallelizing
    # them pays (A/B at sf0.1: 2.19 -> 1.85 s full-query medians; under
    # the old aggregate+semi-join shape the same spread measured WORSE,
    # which is why earlier rounds rejected it). The exchange carries
    # raw text (~MBs), not the 50x-larger span arrays.
    docs = (
        df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
        .repartition(df.sparkSession.sparkContext.defaultParallelism)
        .select(
            "_id",
            token_count(F.col("_t")).alias("_n"),
            span_hashes(F.col("_t"), k).alias("_spans"),
        )
        .persist()
    )
    pos = docs.select(
        "_id", F.posexplode("_spans").alias("_pos", "_h")
    )
    # Corpus-wide span count as ONE count-over-window keyed by span hash
    # (r12): the previous groupBy(_h) >= min_count + semi-join back onto
    # pos exploded the span arrays twice and shuffled them twice (the
    # aggregate's near-unique hashes barely compress under partial agg,
    # so its exchange carried ~|pos| rows too). The window form explodes
    # once and shuffles the positions once — measured 2.98 -> 1.54 s for
    # the piece at sf0.1; same rows out (count per hash >= min_count,
    # keep (id, pos)), proved by the oracle gate at three SFs.
    hits = (
        pos.withColumn("_c", F.count("*").over(Window.partitionBy("_h")))
        .where(F.col("_c") >= min_count)
        .select("_id", "_pos")
    )
    w = Window.partitionBy("_id").orderBy("_pos")
    contrib = F.least(
        F.lit(k),
        F.coalesce(F.lead("_pos").over(w), F.col("_pos") + k) - F.col("_pos"),
    )
    cov = (
        hits.select("_id", contrib.alias("_cv"))
        .groupBy("_id")
        .agg(F.sum("_cv").cast("long").alias("covered_tokens"))
    )
    out = (
        docs.select("_id", "_n")
        .join(cov, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.col("_n").cast("long").alias("n_tokens"),
            F.coalesce(F.col("covered_tokens"), F.lit(0)).alias("covered_tokens"),
            F.when(
                F.col("_n") > 0,
                F.coalesce(F.col("covered_tokens"), F.lit(0))
                / F.col("_n").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_span_frac"),
        )
    )
    if deferred:
        return out, docs  # caller unpersists docs after materializing out
    return _checkpoint_released(out, [docs])


def dup_clusters_alternating(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC 2014) — the designated SCALE path for :func:`dup_clusters`.

    Same contract as ``dup_clusters``: (doc_id, cluster_id) with
    cluster_id = min doc id in the component, covering every id that
    appears in ``pairs``. The difference is convergence: min-label
    propagation needs O(diameter) rounds — fine for dup graphs (short
    chains), pathological for adversarial inputs (one 10^6-node chain
    = 10^6 shuffles). Alternating stars converge in O(log^2 n) rounds
    on ANY graph by rewiring edges toward component minima:

    - large-star(u): every neighbor v > u re-points to
      m = min(N(u) + {u}) — emitted per-edge after a groupBy(u).agg(min)
      + join-back, so neighborhoods are never collected into arrays and
      a high-degree hub costs a wide join, not a wide row.
    - small-star(u): over hi->lo directed edges, every smaller neighbor
      (and u itself) re-points to m = min of the smaller neighborhood.

    At the fixed point the edge set is a forest of stars (leaf ->
    component min); roots are the ids never appearing on the hi side.
    Each half-round is one groupBy shuffle + one hash join;
    localCheckpoint truncates lineage per round, and the fixed point is
    detected with two left-anti probes (edge sets are compared, not
    collected). Raises RuntimeError if max_iter rounds don't converge
    (log^2-bounded: 50 covers any conceivable graph) rather than return
    a wrong labeling.
    """
    fwd = pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
    rev = pairs.select(F.col(id_b).alias("u"), F.col(id_a).alias("v"))
    nodes = (
        fwd.select(F.col("u").alias("id"))
        .union(rev.select(F.col("u").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    # canonical directed hi -> lo, self-loops dropped
    e = fwd.union(rev).where(F.col("u") > F.col("v")).distinct().localCheckpoint()
    converged = False
    for _ in range(max_iter):
        # large-star over the undirected view: (v, m) for every v > u
        und = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mn = und.groupBy("u").agg(F.min("v").alias("_mnv"))
        mn = mn.select("u", F.least(F.col("u"), F.col("_mnv")).alias("m"))
        # v > u >= m, so the emitted (v, m) is already hi->lo and loop-free
        ls = (
            und.join(mn, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # small-star over hi->lo: every smaller neighbor and u re-point to
        # the smaller-neighborhood min (v >= m always; v == m self-loop
        # dropped), output stays canonical
        mn2 = ls.groupBy("u").agg(F.min("v").alias("m"))
        new_e = (
            ls.join(mn2, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(mn2.select(F.col("u"), F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        same = (
            new_e.join(e, ["u", "v"], "left_anti").limit(1).count() == 0
            and e.join(new_e, ["u", "v"], "left_anti").limit(1).count() == 0
        )
        e = new_e
        if same:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"alternating-star CC did not converge in {max_iter} rounds "
            "(log^2-bounded; this indicates a bug, not a hard graph)"
        )
    leaves = e.select(F.col("u").alias("doc_id"), F.col("v").alias("cluster_id"))
    roots = nodes.join(
        e.select(F.col("u").alias("id")).distinct(), "id", "left_anti"
    ).select(F.col("id").alias("doc_id"), F.col("id").alias("cluster_id"))
    return leaves.unionByName(roots)


# --- SimHash ----------------------------------------------------------------

def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per document, fully JVM-side.

    Per token hash xxhash64(token); per bit position sum +1/-1 by bit
    value; signature bit = majority sign. Near-dups share most bits;
    dedup/blocking uses the whole signature or 16-bit bands (4-band split
    detects Hamming distance <= 3 collisions).
    """
    from ..functions.text import whitespace_tokens

    # Explode token hashes and aggregate 64 bit-vote sums per doc: stays
    # inside whole-stage codegen (HOF lambdas are interpreted and ~2x
    # slower here). Partial aggregation collapses each doc's votes
    # map-side, so the shuffle is docs x 64 longs, not tokens.
    #
    # The 64 vote aggregates and the 64-term signature packing are built
    # as parsed SQL text (r12 driver-side construction cost,
    # vectors._sign_bits_sql precedent): the Column-API form made ~11,900
    # py4j round-trips per call. shiftleft(CAST(1 AS BIGINT), i)
    # constant-folds to exactly the old mask literals — including bit 63,
    # where Java's long shift wraps to Long.MIN_VALUE == -(1 << 63) — so
    # votes and signatures are bit-identical (pinned by
    # test_simhash64_sql_form_matches_column_api).
    flat = df.select(
        F.col(id_col).alias("_id"),
        F.explode(whitespace_tokens(F.lower(F.col(text_col)))).alias("_tok"),
    ).select("_id", F.xxhash64("_tok").alias("_th"))
    votes = flat.groupBy("_id").agg(
        *[
            F.expr(
                "SUM(CASE WHEN (`_th` & shiftleft(CAST(1 AS BIGINT), "
                f"{i})) != 0 THEN 1 ELSE -1 END) AS _v{i}"
            )
            for i in range(64)
        ]
    )
    sig_sql = " + ".join(
        f"(CASE WHEN `_v{i}` > 0 THEN shiftleft(CAST(1 AS BIGINT), {i}) "
        "ELSE CAST(0 AS BIGINT) END)"
        for i in range(64)
    )
    return votes.select("_id", F.expr(sig_sql).alias("simhash"))


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    eager: bool = True,
) -> DataFrame:
    """Near-dup pairs by SimHash banding: split the 64-bit signature into
    ``max_hamming + 1`` bands; by pigeonhole, any pair within the Hamming
    radius collides on >=1 band. Verify with exact popcount on candidates.
    ``eager`` (default) materializes the verified pairs and releases the
    cached signature table before returning.
    """
    n_bands = max_hamming + 1
    width = 64 // n_bands
    # Materialize signatures before the banding explode (module note).
    sigs = simhash64(df, text_col, id_col).persist()
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned(F.col("simhash"), b * width)
                .bitwiseAND(F.lit((1 << width) - 1).cast("long"))
                .alias("band_val"),
            )
            for b in range(n_bands)
        ]
    )
    banded = sigs.select(
        "_id", "simhash", F.explode(band_structs).alias("bh")
    ).select("_id", "simhash", "bh.band", "bh.band_val")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    out = cand.select("id_a", "id_b", hamming.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )
    return _checkpoint_released(out, [sigs]) if eager else out


# --- embedding near-dup -----------------------------------------------------

def _auto_sign_block(vec, n_bits: int = 8):
    """Axis-aligned sign-bit LSH bucket: bit i = sign of component i,
    packed into a long. Dimension-agnostic (components beyond the vector
    length contribute 0) and fully JVM-side — the automatic blocking
    fallback for an unblocked near-dup self-join."""
    sig = F.lit(0).cast("long")
    for i in range(n_bits):
        bit = (
            F.when(F.element_at(vec, i + 1) >= 0, F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
        )
        sig = sig + bit * F.lit(int(2**i)).cast("long")
    return sig


def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str | None = None,
    threshold: float = 0.9,
    allow_all_pairs: bool = False,
) -> DataFrame:
    """Pairs of near-identical embeddings by cosine similarity.

    ``block_col`` (e.g. a cluster/label/LSH-bucket column) bounds the
    self-join: pairs are only formed within a block. At 100 TB an
    unblocked self-join is quadratic, so when ``block_col`` is omitted an
    axis-aligned sign-bit LSH bucket is derived automatically (near-dups
    whose components straddle zero can land in different buckets — supply
    a multi-probe block such as ``functions.vectors.sign_bits`` when
    recall matters). The true all-pairs form requires the explicit
    ``allow_all_pairs=True`` opt-in.
    """
    from ..functions.vectors import cosine_from_norms, norm

    # L2 norm precomputed per ROW before the self-join — bit-identical to
    # evaluating cosine() per pair (see cosine_from_norms) while dropping
    # the per-pair interpreted HOF element evals ~40%
    cols = [
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        norm(F.col(vec_col)).alias("_nrm"),
    ]
    if block_col is not None:
        cols.append(F.col(block_col).alias("_blk"))
    base = df.select(*cols)
    if block_col is None and not allow_all_pairs:
        base = base.withColumn("_blk", _auto_sign_block(F.col("_v")))
        block_col = "_blk"
    a, b = base.alias("a"), base.alias("b")
    cond = F.col("a._id") < F.col("b._id")
    if block_col is not None:
        cond = cond & (F.col("a._blk") == F.col("b._blk"))
    cos_pair = cosine_from_norms(
        F.col("a._v"), F.col("b._v"), F.col("a._nrm"), F.col("b._nrm")
    )
    pairs = a.join(b, cond).select(
        F.col("a._id").alias("id_a"),
        F.col("b._id").alias("id_b"),
        F.round(cos_pair, 6).alias("cos_sim"),
    )
    return pairs.where(F.col("cos_sim") >= threshold)


def embedding_near_dup_pairs_multitable(
    df: DataFrame,
    tables: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    eager: bool = True,
) -> DataFrame:
    """Embedding near-dup pairs via multi-table sign-bit LSH banding —
    the MinHash-LSH banding discipline applied to vectors.

    Each row explodes to L (table_idx, signature) bucket keys; pairs form
    only within a bucket (shuffle keyed by bucket, never all-pairs),
    dedupe across tables, then exact-cosine verify. Recall amplifies as
    1-(1-p^b)^L while the per-bucket join stays bounded — the knob a
    single exact-signature block lacks. Returned pairs are exact-verified,
    so precision is 1.0 regardless of L. ``eager`` (default) materializes
    the verified pairs and releases the cached signature table."""
    from ..functions.vectors import sign_bits_tables

    base = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    # Materialize signatures once before the explode (same discipline as
    # minhash_lsh_candidates: don't recompute L x b plane dots per pair).
    sigs = base.withColumn("_sigs", sign_bits_tables("_v", tables)).persist()
    bucketed = sigs.select(
        "_id", F.posexplode("_sigs").alias("_tbl", "_sig")
    )
    a, b = bucketed.alias("a"), bucketed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a._tbl") == F.col("b._tbl"))
            & (F.col("a._sig") == F.col("b._sig"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    va = sigs.select(F.col("_id").alias("id_a"), F.col("_v").alias("_va"))
    vb = sigs.select(F.col("_id").alias("id_b"), F.col("_v").alias("_vb"))
    verified = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("_va"), F.col("_vb")), 6).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )
    return _checkpoint_released(verified, [sigs]) if eager else verified


def semantic_dedup(
    df: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al., "SemDeDup:
    Data-efficient learning at web-scale through semantic deduplication",
    2023 — PAPERS.md): cluster embeddings by nearest centroid, then
    within each cluster greedily drop every vector whose cosine to an
    already-kept lower-id vector exceeds ``threshold``.

    Returns (id, cluster, kept, dup_of, max_cos): ``kept=false`` rows name
    the kept twin they duplicated in ``dup_of``. Deterministic — greedy
    order is ascending id and centroid assignment is argmax over a fixed
    centroid list (train with ``similarity.ivf_train_centroids``, itself
    deterministic).

    Scale shape: assignment is one broadcast-literal argmax projection
    (narrow); the only shuffle is groupBy(cluster). The intra-cluster
    pass is a vectorized Arrow batch per cluster (numpy matmul against
    the kept prefix — never a pairwise join). Cluster population must fit
    an executor's Arrow batch, which is the SemDeDup deployment contract
    itself: nlist scales with corpus size so E[cluster] = N/nlist stays
    fixed (the paper runs 50k clusters for LAION-440M); a skewed cluster
    is re-split by training more centroids, not by widening this pass.
    """
    import numpy as np
    import pandas as pd

    cent_arr = array_double_lit([[float(x) for x in c] for c in centroids])
    sims = F.transform(cent_arr, lambda c: cosine(F.col(vec_col), c))
    assigned = (F.array_position(sims, F.array_max(sims)) - 1).cast("int")
    clustered = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).alias("_v"),
        assigned.alias("cluster"),
    )

    out_schema = (
        "id long, cluster int, kept boolean, dup_of long, max_cos double"
    )

    def _greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id").reset_index(drop=True)
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["_v"]])
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0.0] = 1.0
        unit = mat / norms[:, None]
        n = len(pdf)
        kept_rows: list[int] = []
        kept = np.zeros(n, dtype=bool)
        dup_of = np.full(n, -1, dtype=np.int64)
        max_cos = np.full(n, np.nan)
        for i in range(n):
            if kept_rows:
                cos = unit[kept_rows] @ unit[i]
                j = int(np.argmax(cos))
                max_cos[i] = round(float(cos[j]), 6)
                if cos[j] >= threshold:
                    dup_of[i] = pdf["id"].iloc[kept_rows[j]]
                    continue
            kept[i] = True
            kept_rows.append(i)
        return pd.DataFrame(
            {
                "id": pdf["id"],
                "cluster": pdf["cluster"],
                "kept": kept,
                "dup_of": [None if d < 0 else d for d in dup_of],
                "max_cos": [None if np.isnan(c) else c for c in max_cos],
            }
        )

    return (
        clustered.groupBy("cluster")
        .applyInPandas(_greedy, out_schema)
        .withColumnRenamed("id", id_col)
    )
