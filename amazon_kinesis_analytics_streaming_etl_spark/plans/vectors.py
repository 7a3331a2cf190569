"""Vector-storage ops over the embeddings table (round 2): int8
quantization (the compression step an ANN index applies before shipping
100 TB of float32 vectors) and label-centroid cohesion (cluster-quality
diagnostics). Both DuckDB-oracle-checked with engine-portable
arithmetic.

Portability notes baked into both sides:
- rounding is ``floor(x + 0.5)`` — exact on identical IEEE doubles, no
  half-up vs half-even ambiguity between engines;
- cross-row float aggregation (centroid means, cosine averages) is
  rounded 5-6 dp AFTER all arithmetic, absorbing summation-order drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import read_sf_parquet
from .relational import register


# --------------------------------------------------------------------------
# int8 symmetric quantization with reconstruction-error gate
# --------------------------------------------------------------------------

@register(
    "embedding_quantize_int8",
    """
    WITH q AS (
      SELECT vec_id,
             greatest(list_max(list_transform(embedding, x -> abs(x))), 1e-12) / 127.0
               AS scale,
             embedding
      FROM embeddings
    ), e AS (
      SELECT vec_id, scale,
             list_transform(embedding,
               x -> abs(x - greatest(-127.0, least(127.0, floor(x / scale + 0.5)))
                            * scale)) AS errs
      FROM q
    )
    SELECT vec_id, round(scale, 6) AS scale,
           round(list_aggregate(errs, 'sum') / len(errs), 6) AS mean_abs_err,
           round(list_max(errs), 6) AS max_abs_err
    FROM e ORDER BY vec_id
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization (scale = max|x|/127,
    q = clamp(floor(x/scale + 0.5), ±127)) with the reconstruction
    error surfaced per vector — the quality gate you watch when
    compressing an embedding store 4x before ANN indexing.

    Plan: entirely narrow — array HOFs inside the scan's codegen stage,
    zero shuffles, output one row per vector. The floor(x+0.5) form is
    deliberately used instead of round(): identical IEEE inputs give
    identical results in every engine, so the oracle hash is stable."""
    emb = read_sf_parquet(spark, sf_dir, "embeddings")
    scale = (
        F.greatest(
            F.array_max(F.transform("embedding", lambda x: F.abs(x))),
            F.lit(1e-12),
        )
        / F.lit(127.0)
    )
    q = emb.select("vec_id", scale.alias("scale"), "embedding")
    errs = F.transform(
        "embedding",
        lambda x: F.abs(
            x
            - F.greatest(
                F.lit(-127.0),
                F.least(F.lit(127.0), F.floor(x / F.col("scale") + 0.5)),
            )
            * F.col("scale")
        ),
    )
    e = q.select("vec_id", "scale", errs.alias("errs"))
    return e.select(
        "vec_id",
        F.round("scale", 6).alias("scale"),
        F.round(
            F.aggregate("errs", F.lit(0.0), lambda a, x: a + x) / F.size("errs"), 6
        ).alias("mean_abs_err"),
        F.round(F.array_max("errs"), 6).alias("max_abs_err"),
    ).orderBy("vec_id")


# --------------------------------------------------------------------------
# label-centroid cohesion (cluster quality)
# --------------------------------------------------------------------------

@register(
    "centroid_cohesion",
    """
    WITH x AS (
      SELECT vec_id, label,
             unnest(embedding) AS v,
             CAST(generate_subscripts(embedding, 1) AS INT) AS pos
      FROM embeddings
    ), c AS (
      SELECT label, pos, avg(v) AS cv FROM x GROUP BY label, pos
    ), d AS (
      SELECT x.vec_id, x.label,
             sum(x.v * c.cv) AS dot,
             sum(x.v * x.v) AS n2v,
             sum(c.cv * c.cv) AS n2c
      FROM x JOIN c ON x.label = c.label AND x.pos = c.pos
      GROUP BY x.vec_id, x.label
    )
    SELECT label, count(*) AS n_vectors,
           round(CAST(CAST(avg(dot / (sqrt(n2v) * sqrt(n2c))) AS REAL)
                      AS DOUBLE), 5) AS avg_cosine,
           round(min(dot / (sqrt(n2v) * sqrt(n2c))), 5) AS min_cosine
    FROM d GROUP BY label ORDER BY label
    """,
)
def centroid_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label cluster cohesion: element-wise mean centroid, then the
    average and worst cosine of members to their centroid — the
    diagnostic that tells you whether a label partition is tight enough
    to serve as an IVF/ANN blocking key (operators/similarity.py ivf).

    Plan: posexplode to (label, pos, v) — a 64x row blow-up of 3 narrow
    columns that map-side partial aggregation compresses to labels x 64
    before the shuffle; the member-to-centroid join keys on
    (label, pos); per-vector dot products re-aggregate on vec_id. Three
    keyed shuffles, no collect, no all-pairs. (For very wide vectors,
    the applyInPandas/numpy per-label variant trades the explode for
    one grouped Arrow batch — same result, different constant.)"""
    emb = read_sf_parquet(spark, sf_dir, "embeddings")
    x = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos0", "v"),
    ).select(
        "vec_id", "label", (F.col("pos0") + 1).cast("int").alias("pos"), "v"
    )
    c = x.groupBy("label", "pos").agg(F.avg("v").alias("cv"))
    d = (
        x.join(c, ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum(F.col("v") * F.col("cv")).alias("dot"),
            F.sum(F.col("v") * F.col("v")).alias("n2v"),
            F.sum(F.col("cv") * F.col("cv")).alias("n2c"),
        )
    )
    cos = F.col("dot") / (F.sqrt("n2v") * F.sqrt("n2c"))
    return (
        d.groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            # f32-squash (repo drift-avg convention): the group avg is
            # order-dependent; min is left raw (5dp margin >> the
            # pre-rounding drift of the per-vector sums).
            F.round(F.avg(cos).cast("float").cast("double"), 5).alias("avg_cosine"),
            F.round(F.min(cos), 5).alias("min_cosine"),
        )
        .orderBy("label")
    )


# --------------------------------------------------------------------------
# matryoshka truncation quality (prefix-dim cosine preservation)
# --------------------------------------------------------------------------

@register(
    "embedding_matryoshka",
    """
    WITH p AS (
      SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
             CAST(a.embedding AS DOUBLE[]) AS ea,
             CAST(b.embedding AS DOUBLE[]) AS eb
      FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 250
    )
    SELECT vec_id_a, vec_id_b,
           round(list_cosine_similarity(ea, eb), 6) AS cos_full,
           round(list_cosine_similarity(ea[1:16], eb[1:16]), 6) AS cos_trunc16,
           round(abs(list_cosine_similarity(ea, eb)
                     - list_cosine_similarity(ea[1:16], eb[1:16])), 6) AS drift
    FROM p ORDER BY vec_id_a
    """,
)
def embedding_matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style prefix truncation diagnostic: for a deterministic
    pairing (vec_id, vec_id+250), the cosine at full 64 dims vs the
    first-16-dim prefix (renormalization is implicit in cosine), plus the
    drift — the table you consult before serving ANN at a truncated
    dimension to cut index memory 4x (Kusupati et al. 2022's accuracy/
    cost dial, evaluated corpus-side).

    Plan: one keyed self-join (shuffle on vec_id — at 100 TB the pairing
    key would be the ANN candidate list, same shape), then narrow array
    math; truncation is F.slice, so the prefix never re-materializes as
    a second column store."""
    from ..functions.vectors import cosine

    emb = read_sf_parquet(spark, sf_dir, "embeddings")
    to_d = F.transform("embedding", lambda x: x.cast("double"))
    a = emb.select(F.col("vec_id").alias("vec_id_a"), to_d.alias("ea"))
    b = emb.select((F.col("vec_id") - 250).alias("vec_id_a"),
                   F.col("vec_id").alias("vec_id_b"), to_d.alias("eb"))
    p = a.join(b, "vec_id_a")
    cf = cosine(F.col("ea"), F.col("eb"))
    ct = cosine(F.slice("ea", 1, 16), F.slice("eb", 1, 16))
    return p.select(
        "vec_id_a",
        "vec_id_b",
        F.round(cf, 6).alias("cos_full"),
        F.round(ct, 6).alias("cos_trunc16"),
        F.round(F.abs(cf - ct), 6).alias("drift"),
    ).orderBy("vec_id_a")


@register(
    "embedding_dim_stats",
    """
    WITH d AS (
      SELECT r.i - 1 AS dim, CAST(embedding[r.i] AS DOUBLE) AS v
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS r(i)
    )
    SELECT CAST(dim AS INT) AS dim,
           round(avg(v) + 0.000001, 4) + 0.0 AS mean_v,
           round(sqrt(greatest(avg(v * v) - avg(v) ** 2, 0)) + 0.000001, 4)
             + 0.0 AS std_v,
           round(min(v), 4) + 0.0 AS min_v,
           round(max(v), 4) + 0.0 AS max_v,
           CAST(sum(CASE WHEN abs(v) < 0.000001 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_near_zero
    FROM d GROUP BY dim ORDER BY dim
    """,
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding diagnostics: mean/std/range plus a
    near-zero count per coordinate — the health check that catches dead
    dimensions (zero variance: wasted index width), unnormalized
    coordinates, and collapsed encoders BEFORE an ANN index is built on
    them; it also ranks dimensions for matryoshka-style truncation.

    Plan: one posexplode to (dim, value) — dim x rows narrow tuples —
    then a |dim|-key hash aggregate with map-side partials; std derives
    from the same sum/sum-sq decomposition both engines share. No joins,
    no driver traffic beyond |dim| result rows."""
    emb = read_sf_parquet(spark, sf_dir, "embeddings")
    d = emb.select(F.posexplode("embedding").alias("dim", "v0")).select(
        "dim", F.col("v0").cast("double").alias("v")
    )
    mean = F.avg("v")
    var = F.greatest(F.avg(F.col("v") * F.col("v")) - mean * mean, F.lit(0.0))
    return (
        d.groupBy(F.col("dim").cast("int").alias("dim"))
        .agg(
            # + 0.0 after each round: IEEE -0.0 + 0.0 == +0.0, so a mean
            # that rounds to zero from below hashes identically in both
            # engines (sf0.1 sweep, round 7: Spark kept the -0.0)
            (F.round(mean + F.lit(0.000001), 4) + F.lit(0.0)).alias("mean_v"),
            (F.round(F.sqrt(var) + F.lit(0.000001), 4) + F.lit(0.0)).alias("std_v"),
            (F.round(F.min("v"), 4) + F.lit(0.0)).alias("min_v"),
            (F.round(F.max("v"), 4) + F.lit(0.0)).alias("max_v"),
            F.sum(F.when(F.abs("v") < 0.000001, 1).otherwise(0))
            .cast("long")
            .alias("n_near_zero"),
        )
        .orderBy("dim")
    )


# --------------------------------------------------------------------------
# embedding spectrum diagnostics (covariance eigenstructure)
# --------------------------------------------------------------------------

@register(
    "embedding_spectrum",
    """
    WITH x AS (
      SELECT vec_id, i, CAST(v AS DOUBLE) AS v
      FROM (SELECT vec_id, unnest(embedding) AS v,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings)
    ),
    tr AS (
      SELECT CAST(sum(cnt) / count(*) AS BIGINT) AS n,
             sum(var) AS trace
      FROM (SELECT i, var_pop(v) AS var, count(*) AS cnt FROM x GROUP BY i)
    ),
    fro AS (
      SELECT sum(c * c) AS frob2
      FROM (
        SELECT a.i, b.i AS j, covar_pop(a.v, b.v) AS c
        FROM x a JOIN x b ON a.vec_id = b.vec_id
        GROUP BY a.i, b.i
      )
    )
    SELECT n,
           round(CAST(CAST(trace AS REAL) AS DOUBLE) + 0.00000001, 4)
             AS trace,
           round(CAST(CAST(trace * trace / frob2 AS REAL) AS DOUBLE)
                 + 0.00000001, 2) AS effective_rank,
           TRUE AS eig_identities_ok
    FROM tr CROSS JOIN fro
    """,
)
def embedding_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space spectrum diagnostics: total variance (trace of
    the covariance matrix) and the effective rank trace(C)^2/||C||_F^2
    — the participation-ratio estimate of how many dimensions the
    embeddings actually use (anisotropy / dimensional-collapse check, a
    standard health gate before indexing or training on an embedding
    column). The eigendecomposition itself runs driver-side on the
    dim x dim covariance (64x64 here — constant at any corpus size) and
    is verified in-plan by the exact linear-algebra identities
    sum(eig) = trace(C) and sum(eig^2) = ||C||_F^2, folded into one
    boolean so both engines hash the same deterministic row (the sketch
    gates' pattern; the oracle recomputes trace and Frobenius norm from
    SQL var_pop/covar_pop over the exploded vectors — no eigensolver
    needed on the SQL side, which is the point of the identity gate).

    Scale shape: ONE narrow pass accumulates per-partition Gram partials
    (sum X^T X, sum X, count) via mapInPandas — (d^2 + d + 1) doubles
    per partition regardless of row count — and the driver assembles C
    and calls eigvalsh on d x d. Nothing quadratic in rows anywhere;
    the oracle's self-join is the verification side's privilege at gate
    scale.
    """
    import numpy as np
    import pandas as pd

    emb = read_sf_parquet(spark, sf_dir, "embeddings")

    def _partials(batches):
        S = None
        s = None
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            S = X.T @ X if S is None else S + X.T @ X
            s = X.sum(axis=0) if s is None else s + X.sum(axis=0)
            n += len(X)
        if n:
            yield pd.DataFrame(
                {"S": [S.ravel().tolist()], "s": [s.tolist()], "n": [n]}
            )

    parts = emb.select("embedding").mapInPandas(
        _partials, schema="S array<double>, s array<double>, n long"
    ).collect()
    d = len(parts[0]["s"])
    S = np.zeros((d, d))
    s = np.zeros(d)
    n = 0
    for r in parts:
        S += np.array(r["S"]).reshape(d, d)
        s += np.array(r["s"])
        n += r["n"]
    mu = s / n
    C = S / n - np.outer(mu, mu)
    eig = np.linalg.eigvalsh(C)
    trace = float(np.trace(C))
    frob2 = float((C * C).sum())
    ok = bool(
        abs(eig.sum() - trace) <= 1e-8 * max(1.0, abs(trace))
        and abs((eig**2).sum() - frob2) <= 1e-8 * max(1.0, frob2)
    )
    out = pd.DataFrame(
        {
            "n": [n],
            "trace": [round(float(np.float32(trace)) + 1e-8, 4)],
            "effective_rank": [
                round(float(np.float32(trace * trace / frob2)) + 1e-8, 2)
            ],
            "eig_identities_ok": [ok],
        }
    )
    return spark.createDataFrame(
        out,
        schema="n long, trace double, effective_rank double, "
        "eig_identities_ok boolean",
    )


# --------------------------------------------------------------------------
# round 9: embedding drift between cohorts
# --------------------------------------------------------------------------

@register(
    "embedding_drift_shift",
    """
    WITH d AS (
      SELECT label, vec_id % 2 AS half, r.i - 1 AS dim,
             CAST(embedding[r.i] AS DOUBLE) AS v
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS r(i)
    ),
    cent AS (
      SELECT label, dim,
             avg(v) FILTER (half = 0) AS a,
             avg(v) FILTER (half = 1) AS b
      FROM d GROUP BY label, dim
    ),
    per AS (
      SELECT label,
             sum(a * b) AS ab, sum(a * a) AS aa, sum(b * b) AS bb,
             sum((a - b) * (a - b)) AS d2
      FROM cent GROUP BY label
    ),
    n AS (
      SELECT label,
             count(*) FILTER (vec_id % 2 = 0) AS n_a,
             count(*) FILTER (vec_id % 2 = 1) AS n_b
      FROM embeddings GROUP BY label
    )
    SELECT CAST(p.label AS INT) AS label,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           round(CAST(CAST(ab / sqrt(aa * bb) AS REAL) AS DOUBLE)
                 + 0.00000001, 4) AS centroid_cos,
           round(CAST(CAST(sqrt(d2) AS REAL) AS DOUBLE) + 0.00000001, 4)
             AS shift_l2
    FROM per p JOIN n USING (label)
    ORDER BY label
    """,
)
def embedding_drift_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-drift monitor: split the corpus into two deterministic
    cohorts (vec_id parity — the stand-in for 'last index build' vs
    'today'), compute each label's centroid in both cohorts, and report
    the centroid cosine and L2 shift per label — the re-index/retrain
    trigger a production vector store watches (cos near 1 = stable
    space; a drifting label is re-embedded or its IVF lists retrained).

    Scale shape: one posexplode to (label, half, dim, v) narrow tuples,
    a |labels| x |dims| hash aggregate with FILTERed means (both cohorts
    in the SAME pass — the corpus is scanned once), then the cosine /
    shift reduce over the |labels| x |dims| frame and a |labels|-row
    join for cohort counts. No per-row vector math, no driver traffic
    beyond |labels| rows."""
    emb = read_sf_parquet(spark, sf_dir, "embeddings")
    d = emb.select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode("embedding").alias("dim", "v0"),
    ).select("label", "half", "dim", F.col("v0").cast("double").alias("v"))
    cent = d.groupBy("label", "dim").agg(
        F.avg(F.when(F.col("half") == 0, F.col("v"))).alias("a"),
        F.avg(F.when(F.col("half") == 1, F.col("v"))).alias("b"),
    )
    per = cent.groupBy("label").agg(
        F.sum(F.col("a") * F.col("b")).alias("ab"),
        F.sum(F.col("a") * F.col("a")).alias("aa"),
        F.sum(F.col("b") * F.col("b")).alias("bb"),
        F.sum(F.pow(F.col("a") - F.col("b"), 2)).alias("d2"),
    )
    n = emb.groupBy("label").agg(
        F.count(F.when(F.col("vec_id") % 2 == 0, 1)).cast("long").alias("n_a"),
        F.count(F.when(F.col("vec_id") % 2 == 1, 1)).cast("long").alias("n_b"),
    )
    return (
        per.join(n, "label")
        .select(
            F.col("label").cast("int").alias("label"),
            "n_a",
            "n_b",
            F.round(
                (F.col("ab") / F.sqrt(F.col("aa") * F.col("bb")))
                .cast("float")
                .cast("double")
                + 0.00000001,
                4,
            ).alias("centroid_cos"),
            F.round(
                F.sqrt(F.col("d2")).cast("float").cast("double") + 0.00000001, 4
            ).alias("shift_l2"),
        )
        .orderBy("label")
    )
