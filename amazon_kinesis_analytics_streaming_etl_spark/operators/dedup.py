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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import fingerprint_md5, word_shingles
from ..functions.vectors import cosine

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

def _shingled(df: DataFrame, text_col: str, id_col: str, k: int) -> DataFrame:
    return df.select(
        F.col(id_col).alias("_id"),
        word_shingles(F.col(text_col), k).alias("_shingles"),
    ).withColumn("_n_shingles", F.size("_shingles"))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """All document pairs with word-k-shingle Jaccard >= threshold.

    Plan shape (scale-critical): explode distinct shingles -> inverted
    index (shingle_hash -> doc) -> self-join on shingle_hash gives
    per-pair intersection counts WITHOUT comparing all pairs; union sizes
    come from per-doc shingle counts. The only shuffles are keyed by
    shingle hash (high cardinality, low skew) and by (id_a, id_b).

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard rounded to 6.
    """
    sh = _shingled(df, text_col, id_col, k)
    inv = sh.select(
        "_id",
        "_n_shingles",
        F.explode("_shingles").alias("_sh"),
    ).withColumn("_shash", F.md5("_sh")).drop("_sh")

    a, b = inv.alias("a"), inv.alias("b")
    inter = (
        a.join(b, (F.col("a._shash") == F.col("b._shash")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._n_shingles").alias("na"),
            F.col("b._n_shingles").alias("nb"),
        )
        .agg(F.count("*").alias("inter"))
    )
    jac = inter.withColumn(
        "jaccard",
        F.round(
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"),
            6,
        ),
    )
    return jac.where(F.col("jaccard") >= threshold).select(
        F.col("id_a"), F.col("id_b"), F.col("jaccard")
    )


# --- MinHash + LSH ----------------------------------------------------------

def minhash_signature(df: DataFrame, text_col: str, id_col: str, num_hashes: int = 64, k: int = 3) -> DataFrame:
    """k seeded min-hash values per doc: h_j(doc) = min over shingles of
    xxhash64(shingle, seed=j). Pure JVM (transform/aggregate); O(H x S)
    per row, zero shuffle. Empty-shingle docs get NULL signatures.
    """
    sh = _shingled(df, text_col, id_col, k)
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda j: F.array_min(
            F.transform(
                F.col("_shingles"),
                lambda s: F.xxhash64(s, j),
            )
        ),
    )
    return sh.select(
        F.col("_id"),
        F.when(F.col("_n_shingles") > 0, sig).alias("signature"),
    )


def minhash_lsh_candidates(
    signatures: DataFrame, bands: int = 16, num_hashes: int = 64
) -> DataFrame:
    """LSH banding: split each signature into ``bands`` rows, hash each
    band, group by (band_idx, band_hash) -> candidate pairs. The shuffle
    key is the band hash: docs only meet if they collide in >=1 band —
    never an all-pairs comparison.
    """
    rows_per_band = num_hashes // bands
    banded = (
        signatures.where(F.col("signature").isNotNull())
        .select(
            "_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(bands - 1)),
                    lambda b: F.struct(
                        b.alias("band"),
                        F.xxhash64(
                            F.slice(F.col("signature"), b * rows_per_band + 1, rows_per_band).cast("string")
                        ).alias("band_hash"),
                    ),
                )
            ).alias("bh"),
        )
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
) -> DataFrame:
    """MinHash-LSH candidate generation + exact Jaccard verification.

    Candidates come from band collisions (cheap, recall-tuned by
    bands/num_hashes); the verify step recomputes true Jaccard only for
    candidates. Returns (id_a, id_b, jaccard) with jaccard >= threshold.
    """
    cands = minhash_lsh_candidates(
        minhash_signature(df, text_col, id_col, num_hashes, k), bands, num_hashes
    )
    sh = _shingled(df, text_col, id_col, k)
    pa = sh.select(
        F.col("_id").alias("id_a"), F.col("_shingles").alias("sh_a"), F.col("_n_shingles").alias("na")
    )
    pb = sh.select(
        F.col("_id").alias("id_b"), F.col("_shingles").alias("sh_b"), F.col("_n_shingles").alias("nb")
    )
    joined = cands.join(pa, "id_a").join(pb, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = F.round(
        inter.cast("double") / (F.col("na") + F.col("nb") - inter).cast("double"), 6
    )
    return (
        joined.select("id_a", "id_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


# --- SimHash ----------------------------------------------------------------

def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per document, fully JVM-side.

    Per token hash xxhash64(token); per bit position sum +1/-1 by bit
    value; signature bit = majority sign. Near-dups share most bits;
    dedup/blocking uses the whole signature or 16-bit bands (4-band split
    detects Hamming distance <= 3 collisions).
    """
    from ..functions.text import whitespace_tokens

    toks = whitespace_tokens(F.lower(F.col(text_col)))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    def bit_vote(mask):
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc + F.when(h.bitwiseAND(mask) != 0, 1).otherwise(-1),
        )

    sig = F.lit(0).cast("long")
    for i in range(64):
        mask = F.lit(1 << i if i < 63 else -(1 << 63)).cast("long")
        sig = sig + F.when(bit_vote(mask) > 0, mask).otherwise(F.lit(0).cast("long"))
    return df.select(F.col(id_col).alias("_id"), sig.alias("simhash"))


def simhash_near_dup_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash banding: split the 64-bit signature into
    ``max_hamming + 1`` bands; by pigeonhole, any pair within the Hamming
    radius collides on >=1 band. Verify with exact popcount on candidates.
    """
    n_bands = max_hamming + 1
    width = 64 // n_bands
    sigs = simhash64(df, text_col, id_col)
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
    return cand.select("id_a", "id_b", hamming.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )


# --- embedding near-dup -----------------------------------------------------

def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str | None = None,
    threshold: float = 0.9,
) -> DataFrame:
    """Pairs of near-identical embeddings by cosine similarity.

    ``block_col`` (e.g. a cluster/label/LSH-bucket column) bounds the
    self-join: pairs are only formed within a block. At 100 TB you never
    run this unblocked — use ``functions.vectors.sign_bits`` to derive a
    blocking column first.
    """
    cols = [F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")]
    if block_col is not None:
        cols.append(F.col(block_col).alias("_blk"))
    base = df.select(*cols)
    a, b = base.alias("a"), base.alias("b")
    cond = F.col("a._id") < F.col("b._id")
    if block_col is not None:
        cond = cond & (F.col("a._blk") == F.col("b._blk"))
    pairs = a.join(b, cond).select(
        F.col("a._id").alias("id_a"),
        F.col("b._id").alias("id_b"),
        F.round(cosine(F.col("a._v"), F.col("b._v")), 6).alias("cos_sim"),
    )
    return pairs.where(F.col("cos_sim") >= threshold)
