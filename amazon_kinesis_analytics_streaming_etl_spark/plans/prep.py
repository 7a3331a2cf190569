"""Training-data preparation queries (round 2): fixed-capacity sequence
packing over a distributed global cumsum, a declarative data-quality
expectation audit, and incremental corpus dedup (new shard vs existing
corpus). Each pairs a scale-safe DataFrame plan with a DuckDB oracle
twin.

Scale notes:
- ``pack_sequences`` is the LLM-training packing layout (concatenate the
  corpus in a deterministic order, cut every ``capacity`` tokens). The
  global running offset uses :func:`operators.scale.global_cumsum` —
  range-partition + per-partition prefix totals — NOT a bare
  ``Window.orderBy`` that would collapse 100 TB onto one task.
- ``quality_expectations`` is one scan + one tiny aggregate: every rule
  is a ``sum(CASE)`` in the same partial-aggregable pass, then a 5-row
  ``stack``. Adding a rule adds a column to the agg, never a scan.
- ``dedup_incremental`` shuffles both sides on the md5 fingerprint
  (hash-agg within the new shard, then shuffle anti-join against the
  corpus) — co-partitioned by the join key, no broadcast assumption on
  the corpus side, which at 100 TB is the big side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import fingerprint_md5, lower_tokens
from ..schemas import load_events, read_sf_parquet
from ..operators.scale import global_cumsum
from .relational import _t, register


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_sf_parquet(spark, sf_dir, "documents")


# --------------------------------------------------------------------------
# fixed-capacity sequence packing
# --------------------------------------------------------------------------

_CAP = 512  # tokens per training sequence

# DuckDB twin of functions.text.lower_tokens (shared definition)
from ..functions.text import LOWER_TOKENS_SQL_TWIN as _TOKS  # noqa: E402


@register(
    "pack_sequences",
    f"""
    WITH t AS (
      SELECT doc_id, CAST(len({_TOKS}) AS INT) AS n_tokens
      FROM documents
    ), c AS (
      SELECT doc_id, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (
               ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS start_offset
      FROM t
    )
    SELECT doc_id, n_tokens, start_offset,
           start_offset // {_CAP} AS pack_id,
           greatest((start_offset + n_tokens - 1) // {_CAP}
                    - start_offset // {_CAP} + 1, 1) AS spans_packs
    FROM c ORDER BY doc_id
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every document its position in the packed training layout:
    concatenate all docs in doc_id order and cut a sequence every
    ``_CAP`` tokens (the standard LLM pre-training packing, where a doc
    may span a pack boundary).

    Per doc: token count, global start offset (exclusive running sum),
    the pack its first token lands in, and how many packs it spans.

    The only wide op is the ``global_cumsum`` range shuffle; everything
    after is narrow arithmetic. A naive ``sum() over (order by doc_id)``
    would be a one-task window — the canonical scale failure this
    operator exists to avoid.
    """
    t = _docs(spark, sf_dir).select(
        "doc_id", F.size(lower_tokens("text")).alias("n_tokens")
    )
    c = global_cumsum(
        t, "doc_id", "n_tokens", cumsum_col="start_offset", exclusive=True
    ).withColumn("start_offset", F.col("start_offset").cast("long"))
    start_pack = F.expr(f"start_offset div {_CAP}")
    end_pack = F.expr(f"(start_offset + n_tokens - 1) div {_CAP}")
    return c.select(
        "doc_id",
        "n_tokens",
        "start_offset",
        start_pack.alias("pack_id"),
        F.greatest(end_pack - start_pack + F.lit(1), F.lit(1))
        .cast("long")
        .alias("spans_packs"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# declarative data-quality expectation audit
# --------------------------------------------------------------------------

# rule name -> SQL predicate that every row is EXPECTED to satisfy
# (identical text runs on both engines; violations = NOT(pred))
_RULES = [
    ("discount_le_5pct", "l_discount <= 0.05"),
    ("qty_le_30", "l_quantity <= 30"),
    (
        "shipdate_in_range",
        "l_shipdate BETWEEN DATE '1992-01-01' AND DATE '1998-12-31'",
    ),
    ("positive_price", "l_extendedprice > 0"),
    ("tax_le_6pct", "l_tax <= 0.06"),
]

_RULES_ORACLE = "\nUNION ALL\n".join(
    f"""
    SELECT '{name}' AS rule,
           CAST(sum(CASE WHEN NOT ({pred}) THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violations,
           round(sum(CASE WHEN NOT ({pred}) THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 6) AS violation_rate
    FROM lineitem
    """
    for name, pred in _RULES
)


@register("quality_expectations", _RULES_ORACLE + "\nORDER BY rule")
def quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative expectation audit: every rule is a predicate all rows
    should satisfy; output is one row per rule with the violation count
    and rate.

    Plan: ONE scan of lineitem, one partial-aggregable ``sum(CASE)`` per
    rule in a single aggregate, then a constant-size ``stack`` over the
    1-row result. The oracle's UNION-ALL-of-scans form is the semantics;
    the engine pays one scan regardless of rule count.
    """
    li = read_sf_parquet(spark, sf_dir, "lineitem")
    aggs = [F.count("*").alias("_n")] + [
        F.sum(F.when(~F.expr(pred), 1).otherwise(0))
        .cast("long")
        .alias(f"_v{i}")
        for i, (_, pred) in enumerate(_RULES)
    ]
    one = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', _v{i}" for i, (name, _) in enumerate(_RULES)
    )
    return (
        one.select(
            F.expr(
                f"stack({len(_RULES)}, {stack_args}) AS (rule, n_violations)"
            ),
            "_n",
        )
        .select(
            "rule",
            "n_violations",
            F.round(F.col("n_violations") / F.col("_n"), 6).alias(
                "violation_rate"
            ),
        )
        .orderBy("rule")
    )


# --------------------------------------------------------------------------
# incremental corpus dedup (new shard vs existing corpus)
# --------------------------------------------------------------------------

_NORM_SQL = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"


@register(
    "dedup_incremental",
    f"""
    WITH corpus AS (
      SELECT DISTINCT md5({_NORM_SQL}) AS fingerprint
      FROM documents WHERE doc_id % 2 = 0
    ), incoming AS (
      SELECT md5({_NORM_SQL}) AS fingerprint, min(doc_id) AS doc_id
      FROM documents WHERE doc_id % 2 = 1
      GROUP BY 1
    )
    SELECT i.doc_id, i.fingerprint
    FROM incoming i
    WHERE i.fingerprint NOT IN (SELECT fingerprint FROM corpus)
    ORDER BY i.doc_id
    """,
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup: a new shard (odd doc_ids) is deduped
    within itself (keep lowest doc_id per fingerprint), then
    anti-joined against the already-ingested corpus (even doc_ids) by
    exact md5 fingerprint. Output = the genuinely new documents.

    Scale: both shuffles key on the fingerprint (uniform — no skew); the
    corpus side is NOT broadcast because at 100 TB the corpus is the big
    side — a shuffled left-anti hash join co-partitions both sides once.
    In production the corpus fingerprints are a bucketed table, making
    re-ingest a zero-shuffle join on the bucket key.
    """
    docs = _docs(spark, sf_dir)
    fp = fingerprint_md5(F.col("text")).alias("fingerprint")
    corpus = docs.where(F.col("doc_id") % 2 == 0).select(fp).distinct()
    incoming = (
        docs.where(F.col("doc_id") % 2 == 1)
        .select(fp, "doc_id")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    return (
        incoming.join(corpus, "fingerprint", "left_anti")
        .select("doc_id", "fingerprint")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# deterministic weighted mixture sampling
# --------------------------------------------------------------------------

@register(
    "mixture_sample_sources",
    """
    WITH r AS (
      SELECT doc_id, source,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
               / 4294967296.0 AS u,
             (1 + CAST(substr(source, 4) AS INT)) / 20.0 AS rate
      FROM documents
    )
    SELECT doc_id, source FROM r WHERE u < rate ORDER BY doc_id
    """,
)
def mixture_sample_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source mixture sampling — the data-mixture step
    of a pre-training pipeline (upsample/downsample each source toward
    target weights).

    Acceptance is a pure function of the row key (md5(doc_id) mapped to
    [0,1) against the source's target rate), NOT ``rand()``: resampling
    the corpus after appends keeps prior decisions stable (reproducible
    mixtures, incremental materialization), and the oracle can replay the
    exact sample. Plan: one scan, one narrow filter — no shuffle at all;
    at 100 TB this is embarrassingly parallel. Here the target rate ramps
    (1+i)/20 across sources src0..src19 to exercise non-uniform weights.
    """
    docs = _docs(spark, sf_dir)
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        / F.lit(4294967296.0)
    )
    rate = (1 + F.substring("source", 4, 10).cast("int")) / F.lit(20.0)
    return (
        docs.where(u < rate).select("doc_id", "source").orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# dedup cluster representative selection (keep-best)
# --------------------------------------------------------------------------

@register(
    "dedup_keep_best",
    # Non-recursive CTEs are MATERIALIZED (DuckDB planner hint, zero
    # semantic change) — same re-inlining pathology as plans/llm.py's
    # _CC_ORACLE: ~29 s at sf0.1 un-hinted vs ~5 s hinted, identical
    # rows. The recursive `reach` member cannot be materialized.
    """
    WITH RECURSIVE sh AS MATERIALIZED (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(string_split_regex(trim(lower(text)), '\\s+')) - 1, 1)),
               i -> array_to_string(string_split_regex(trim(lower(text)), '\\s+')[i:i+2], ' ')
             )) AS shingles
      FROM documents
      WHERE len(string_split_regex(trim(lower(text)), '\\s+')) >= 3
    ),
    inv AS MATERIALIZED (
      SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS sh FROM sh
    ),
    pairs AS MATERIALIZED (
      SELECT id_a, id_b FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               a.n_sh AS na, b.n_sh AS nb, count(*) AS inter
        FROM inv a JOIN inv b ON md5(a.sh) = md5(b.sh) AND a.doc_id < b.doc_id
        GROUP BY 1, 2, 3, 4
      ) WHERE inter * 1.0 / (na + nb - inter) >= 0.5
    ),
    edges AS MATERIALIZED (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(id, comp) AS (
      SELECT u, u FROM edges
      UNION
      SELECT e.u, r.comp FROM edges e JOIN reach r ON e.v = r.id
    ),
    members AS (
      SELECT id AS doc_id, min(comp) AS cluster_id FROM reach GROUP BY id
    ),
    ranked AS (
      SELECT m.cluster_id, m.doc_id, d.n_chars,
             row_number() OVER (
               PARTITION BY m.cluster_id
               ORDER BY d.n_chars DESC, m.doc_id ASC
             ) AS rn
      FROM members m JOIN documents d USING (doc_id)
    )
    SELECT cluster_id,
           min(CASE WHEN rn = 1 THEN doc_id END) AS keep_doc_id,
           count(*) AS n_members,
           CAST(count(*) - 1 AS BIGINT) AS n_dropped
    FROM ranked GROUP BY cluster_id ORDER BY cluster_id
    """,
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The final step of the near-dup pipeline: pairs -> connected
    components -> ONE representative per cluster, chosen by quality
    (longest document wins, doc_id breaks ties), everything else dropped.

    Plan: the pair/cluster stages reuse the inverted-index +
    min-label-propagation operators; representative selection is a
    per-cluster window (shuffle keyed by cluster_id — bounded by cluster
    sizes, which near-dup clusters keep small) plus a count aggregate on
    the same key, so the added cost is one keyed shuffle reused by both.
    """
    from ..operators.dedup import dup_clusters, ngram_jaccard_pairs
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    pairs = ngram_jaccard_pairs(docs, k=3, threshold=0.5)
    members = dup_clusters(pairs)
    with_q = members.join(docs.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    ranked = with_q.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("cluster_id")
        .agg(
            F.min(F.when(F.col("rn") == 1, F.col("doc_id"))).alias("keep_doc_id"),
            F.count("*").alias("n_members"),
            (F.count("*") - 1).cast("long").alias("n_dropped"),
        )
        .orderBy("cluster_id")
    )


# --------------------------------------------------------------------------
# weighted sampling without replacement (Efraimidis-Spirakis)
# --------------------------------------------------------------------------

@register(
    "sample_weighted_topn",
    """
    WITH r AS (
      SELECT doc_id, source, n_chars,
             -ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                  + 0.5) / 4294967296.0) / n_chars AS es_key
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, source, n_chars,
             row_number() OVER (ORDER BY es_key, doc_id) AS rk
      FROM r
    )
    SELECT doc_id, source, n_chars FROM ranked WHERE rk <= 50 ORDER BY doc_id
    """,
)
def sample_weighted_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement via exponential keys
    (Efraimidis-Spirakis): draw u~U(0,1) per row, rank by -ln(u)/w, keep
    the top n — exactly a weighted sample of size n, computed as a
    distributed TakeOrdered (per-partition top-n then a k-row driver
    merge; no global sort, no single-partition window). Here w=n_chars
    (sample long documents preferentially — the char-budget view of a
    training mixture) and u derives from md5(doc_id), so the sample is
    deterministic, append-stable, and replayable by the oracle — the
    same reproducibility contract as mixture_sample_sources, which
    samples each row INDEPENDENTLY (Bernoulli) while this op hits an
    EXACT sample size under weights."""
    docs = _docs(spark, sf_dir)
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    keyed = docs.select(
        "doc_id", "source", "n_chars", (-F.log(u) / F.col("n_chars")).alias("es_key")
    )
    # orderBy + limit => TakeOrdered (distributed top-n), never a full sort
    return (
        keyed.orderBy("es_key", "doc_id")
        .limit(50)
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# leak-free train/test split (fingerprint decontamination across splits)
# --------------------------------------------------------------------------

@register(
    "train_test_split_leakfree",
    f"""
    WITH assigned AS (
      SELECT doc_id,
             md5({_NORM_SQL}) AS fingerprint,
             CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                         AS BIGINT) / 4294967296.0 < 0.8
                  THEN 'train' ELSE 'test' END AS split
      FROM documents
    ),
    train_fp AS (SELECT DISTINCT fingerprint FROM assigned WHERE split = 'train'),
    leaked AS (
      SELECT a.doc_id FROM assigned a
      WHERE a.split = 'test'
        AND a.fingerprint IN (SELECT fingerprint FROM train_fp)
    )
    SELECT split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (WHERE split = 'train'
                                 OR doc_id NOT IN (SELECT doc_id FROM leaked))
                AS BIGINT) AS n_clean
    FROM assigned GROUP BY split ORDER BY split
    """,
)
def train_test_split_leakfree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/20 train/test split with cross-split leakage
    removal: assignment is a pure function of md5(doc_id) (append-stable,
    replayable — same contract as mixture_sample_sources), then any test
    document whose exact-content fingerprint also appears in train is
    dropped from the evaluation split (train/test contamination is the
    eval-integrity twin of benchmark decontamination, which guards the
    TRAINING side). Output: per-split sizes before/after the scrub.

    Plan (r12 single-pass rewrite): fingerprints are computed in the
    same scan as the assignment, then ONE fingerprint-keyed aggregate
    carries per-split counts per fingerprint and a 1-row rollup derives
    every output — train is never scrubbed (its n_clean IS its n_docs),
    and the clean test count is the test mass on fingerprints with zero
    train occurrences, exactly the rows the old left-semi + left-anti
    join pair kept (the previous shape re-scanned the corpus ~5x
    through the assigned diamond: train-fp distinct, the two leak
    joins, and two count branches). Null fingerprints keep the JOIN's
    null semantics: a null never equals a train fingerprint, so
    null-fingerprint test docs always count clean. Still co-partitioned
    by fingerprint with no broadcast assumption on the train side (at
    100 TB train is the big side); the rollup is a 1-row aggregate."""
    docs = _docs(spark, sf_dir)
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        / F.lit(4294967296.0)
    )
    assigned = docs.select(
        "doc_id",
        fingerprint_md5(F.col("text")).alias("fingerprint"),
        F.when(u < 0.8, F.lit("train")).otherwise(F.lit("test")).alias("split"),
    )
    fp_counts = assigned.groupBy("fingerprint").agg(
        F.count(F.when(F.col("split") == "train", 1)).alias("_tr"),
        F.count(F.when(F.col("split") == "test", 1)).alias("_te"),
    )
    summary = fp_counts.agg(
        F.sum("_tr").cast("long").alias("_train_docs"),
        F.sum("_te").cast("long").alias("_test_docs"),
        F.sum(
            F.when(
                (F.col("_tr") == 0) | F.col("fingerprint").isNull(),
                F.col("_te"),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("_test_clean"),
    )
    # Emit one row per split actually present (a fully-leaked test split
    # keeps its row at n_clean=0 — the round-12 synthetic-sf1 edge; an
    # ABSENT split emits nothing, matching the oracle's GROUP BY split).
    rows = F.array(
        F.struct(
            F.lit("test").alias("split"),
            F.col("_test_docs").alias("n_docs"),
            F.coalesce(F.col("_test_clean"), F.lit(0).cast("long")).alias(
                "n_clean"
            ),
        ),
        F.struct(
            F.lit("train").alias("split"),
            F.col("_train_docs").alias("n_docs"),
            F.col("_train_docs").alias("n_clean"),
        ),
    )
    return (
        summary.select(F.explode(rows).alias("r"))
        .select("r.*")
        .where(F.col("n_docs") > 0)
        .orderBy("split")
    )


# --------------------------------------------------------------------------
# stratified sampling: exact top-n-by-hash per stratum
# --------------------------------------------------------------------------

_STRAT_N = 5  # sample size per stratum
_STRAT_CUT = "8"  # md5-hex prefilter: keep ~1/2 of each stratum before sorting


@register(
    "sample_stratified",
    f"""
    WITH h AS (
      SELECT source, doc_id, n_chars, md5(CAST(doc_id AS VARCHAR)) AS hk
      FROM documents
      WHERE md5(CAST(doc_id AS VARCHAR)) < '{_STRAT_CUT}'
    ), r AS (
      SELECT source, doc_id, n_chars,
             row_number() OVER (PARTITION BY source ORDER BY hk, doc_id) AS rn
      FROM h
    )
    SELECT source, CAST(rn AS INT) AS rn, doc_id, n_chars
    FROM r WHERE rn <= {_STRAT_N}
    ORDER BY source, rn
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: exactly the ``_STRAT_N`` docs with
    the smallest md5(doc_id) per ``source`` stratum — layout-stable (a doc
    keeps its membership as the corpus grows) and exact (not Bernoulli,
    so every stratum hits its quota even for rare sources, the failure
    mode of fraction-based sampleBy).

    Two-phase scale shape: a stateless hash prefilter (``hk < '8'``,
    expected survivors = stratum/2) bounds what the per-stratum sort ever
    sees, THEN row_number ranks only survivors. Because ranking is BY the
    same hash, top-n of the survivor set IS top-n of the full stratum
    whenever >= n rows survive (hashes below the cutoff are a prefix of
    the stratum's hash order); at 100 TB the cutoff is tightened so the
    windowed sort touches ~2n rows per stratum instead of billions. The
    one shuffle keys on source; skewed strata stay bounded by the
    prefilter."""
    d = _docs(spark, sf_dir)
    hk = F.md5(F.col("doc_id").cast("string"))
    h = d.select("source", "doc_id", "n_chars", hk.alias("hk")).where(
        F.col("hk") < _STRAT_CUT
    )
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy("hk", "doc_id")
    return (
        h.withColumn("rn", F.row_number().over(w).cast("int"))
        .where(F.col("rn") <= _STRAT_N)
        .select("source", "rn", "doc_id", "n_chars")
        .orderBy("source", "rn")
    )


# --------------------------------------------------------------------------
# incremental materialized-view refresh (mergeable partial aggregates)
# --------------------------------------------------------------------------

_MV_SPLIT = "2024-01-24 12:00:00"  # base MV covers ts < split; delta is >=
# (mid-day split on purpose: Jan 24's groups get partial rows from BOTH
# sides, so the second groupBy performs a real cross-batch merge)


@register(
    "mv_incremental_refresh",
    f"""
    SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           count(*) AS n_events,
           round(CAST(CAST(sum(value) AS REAL) AS DOUBLE)
                 + 0.00000001, 2) AS sum_value,
           round(CAST(CAST(sum(value) / count(*) AS REAL) AS DOUBLE)
                 + 0.00000001, 2) AS avg_value,
           round(min(value), 6) AS min_value,
           round(max(value), 6) AS max_value,
           round(CAST(CAST(sqrt(greatest(sum(value * value) / count(*)
                                         - (sum(value) / count(*)) ** 2, 0))
                      AS REAL) AS DOUBLE) + 0.00000001, 2)
             AS stddev_pop
    FROM events
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the (event_type, day)
    rollup is stored as MERGEABLE partial aggregates (n, sum, sum_sq,
    min, max), so refreshing with a new day's delta merges state rows
    instead of rescanning history — at 100 TB the refresh cost is
    O(delta + |MV|), never O(base). The oracle is the full recompute over
    all events; hash equality IS the refresh-correctness gate (merged
    partials must be indistinguishable from a cold rebuild).

    avg/stddev are derived from the merged sums (the standard mergeable
    decomposition: stddev_pop = sqrt(E[x^2] - E[x]^2)) — BOTH sides use
    the same formula so the gate checks merge algebra, not float trivia.
    The three sum-derived outputs carry the repo's float32-squash on
    both engines: the per-group double sums are order-dependent, and
    tools/oracle_order_audit.py caught a live 2dp boundary straddle
    (avg 42.205 flipping 42.2 vs 42.21 under a row-order scramble of
    the same data). min/max are order-independent folds and need none.

    Precision ceiling of the squash (r10 ADVICE): float32 carries ~7
    significant digits, so once a per-group sum passes ~1e5 the squash
    quantizes coarser than the 2dp round implies — parity is unaffected
    (both engines squash identically) but sum_value's absolute precision
    degrades with SF. avg/stddev are magnitude-bounded and keep full 2dp
    meaning at any scale; a production MV would publish the raw partials
    (n/s/s2) and leave presentation rounding to the reader.
    Plan: two partial-aggregable scans (base once in real life, here both
    sides of the simulated split) + a |MV|-sized merge groupBy."""
    ev = load_events(spark, sf_dir)
    proj = ev.select(
        "event_type",
        F.col("ts"),
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        F.col("value"),
        (F.col("value") * F.col("value")).alias("value_sq"),
    )

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type", "day").agg(
            F.count("*").alias("n"),
            F.sum("value").alias("s"),
            F.sum("value_sq").alias("s2"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )

    base = partials(proj.where(F.col("ts") < F.lit(_MV_SPLIT).cast("timestamp")))
    delta = partials(proj.where(F.col("ts") >= F.lit(_MV_SPLIT).cast("timestamp")))
    merged = (
        base.unionByName(delta)
        .groupBy("event_type", "day")
        .agg(
            F.sum("n").alias("n"),
            F.sum("s").alias("s"),
            F.sum("s2").alias("s2"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
        )
    )
    mean = F.col("s") / F.col("n")
    var = F.greatest(F.col("s2") / F.col("n") - mean * mean, F.lit(0.0))
    def _f32(c):
        return F.round(c.cast("float").cast("double") + 0.00000001, 2)

    return merged.select(
        "event_type",
        "day",
        F.col("n").alias("n_events"),
        _f32(F.col("s")).alias("sum_value"),
        _f32(mean).alias("avg_value"),
        F.round("mn", 6).alias("min_value"),
        F.round("mx", 6).alias("max_value"),
        _f32(F.sqrt(var)).alias("stddev_pop"),
    ).orderBy("event_type", "day")


# --------------------------------------------------------------------------
# temperature-scaled mixture weights
# --------------------------------------------------------------------------

_MIX_ALPHA = 0.3  # multilingual-LM temperature (Conneau & Lample 2019)


@register(
    "mixture_temperature_weights",
    f"""
    WITH s AS (
      SELECT source, count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS n_chars
      FROM documents GROUP BY source
    ), t AS (
      SELECT *, sum(n_docs) OVER () AS total,
             pow(n_docs / CAST(sum(n_docs) OVER () AS DOUBLE), {_MIX_ALPHA}) AS q
      FROM s
    )
    SELECT source, n_docs, n_chars,
           round(n_docs / CAST(total AS DOUBLE), 6) AS raw_share,
           round(q / sum(q) OVER () + 0.00000001, 6) AS weight,
           CAST(round(q / sum(q) OVER () * total + 0.00000001, 0) AS BIGINT)
             AS target_docs
    FROM t ORDER BY source
    """,
)
def mixture_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled sampling weights per source: w_i proportional
    to p_i^alpha (alpha=0.3), the exponential-smoothing rule that
    upsamples rare sources / downsamples head sources when fixing a
    training-data mixture (Conneau & Lample 2019 sec 3.1; same rule in
    mT5/XLM-R). Output gives each source's raw share, smoothed weight,
    and the implied per-source document budget at constant corpus size
    — the table a data-mixture review actually signs off on.

    Plan: ONE map-side-combined aggregate collapses the corpus to
    |sources| rows; every window after that runs over that
    dimension-sized frame (the single-partition windows here are over
    ~20 rows by construction, the same bound as global_cumsum's offsets
    side). Corpus size only affects the first aggregate.
    """
    docs = _docs(spark, sf_dir)
    from pyspark.sql import Window

    s = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("n_chars"),
    )
    wall = Window.partitionBy()  # |sources| rows — dimension-sized
    total = F.sum("n_docs").over(wall)
    q = F.pow(F.col("n_docs") / total.cast("double"), F.lit(_MIX_ALPHA))
    t = s.withColumn("total", total).withColumn("q", q)
    wsum = F.sum("q").over(wall)
    return (
        t.select(
            "source",
            "n_docs",
            "n_chars",
            F.round(F.col("n_docs") / F.col("total").cast("double"), 6).alias(
                "raw_share"
            ),
            F.round(F.col("q") / wsum + 0.00000001, 6).alias("weight"),
            F.round(F.col("q") / wsum * F.col("total") + 0.00000001, 0)
            .cast("long")
            .alias("target_docs"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# ranking-metric evaluation: AUC (Mann-Whitney)
# --------------------------------------------------------------------------

_AUC_POS_LABEL = 3


@register(
    "eval_auc_roc",
    f"""
    WITH s AS (
      SELECT round(CAST(embedding[1] AS DOUBLE), 6) AS score,
             CASE WHEN label = {_AUC_POS_LABEL} THEN 1 ELSE 0 END AS y
      FROM embeddings
    ),
    g AS (SELECT score, count(*) AS n, sum(y) AS npos FROM s GROUP BY score),
    r AS (
      SELECT *, coalesce(sum(n) OVER (ORDER BY score
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
      FROM g
    )
    SELECT CAST(sum(npos) AS BIGINT) AS n_pos,
           CAST(sum(n) - sum(npos) AS BIGINT) AS n_neg,
           round((sum(npos * (bef + (n + 1) / 2.0))
                  - sum(npos) * (sum(npos) + 1) / 2.0)
                 / (sum(npos) * (sum(n) - sum(npos))) + 0.00000001, 6) AS auc
    FROM r
    """,
)
def eval_auc_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC of a scalar score against a binary relevance label
    (here: embedding component 0 scoring 'is label 3'), via the
    Mann-Whitney rank-sum identity with proper midrank tie handling —
    AUC = (R+ - n+(n+1)/2) / (n+ * n-). This is the model-eval
    primitive a training pipeline runs on every scored validation
    shard; the identity makes it computable as pure aggregation, no
    per-threshold sweep.

    Scale shape: scores collapse to distinct values first (one hash
    aggregate), midranks come from the EXCLUSIVE distributed running
    count (operators/scale.py:bucketed_cumsum — a pure-JVM two-level
    prefix over the quantization-bounded score domain, no
    single-partition ORDER BY over the data even at billions of rows),
    and the final reduction is a 1-row aggregate. Counts are exact
    integers; the one float division is the last step, so both engines
    agree to float64 ulps.
    """
    from ..operators.scale import bucketed_cumsum

    emb = read_sf_parquet(spark, sf_dir, "embeddings")
    s = emb.select(
        F.round(F.col("embedding")[0].cast("double"), 6).alias("score"),
        F.when(F.col("label") == _AUC_POS_LABEL, F.lit(1))
        .otherwise(F.lit(0))
        .alias("y"),
    )
    g = s.groupBy("score").agg(
        F.count("*").alias("n"), F.sum("y").alias("npos")
    )
    # scores are unit-interval components quantized to 6dp: 1/64-wide
    # buckets bound the offsets frame by the score domain (<= 128 rows
    # for [-1, 1]) and each bucket at <= 15625 quantized values — the
    # pure-JVM prefix (r12; was global_cumsum's Python pass)
    r = bucketed_cumsum(
        g, "score", "n", cumsum_col="bef", bucket_width=1.0 / 64, exclusive=True
    )
    npos = F.sum("npos")
    ntot = F.sum("n")
    rpos = F.sum(F.col("npos") * (F.col("bef") + (F.col("n") + 1) / 2.0))
    return r.agg(
        npos.cast("long").alias("n_pos"),
        (ntot - npos).cast("long").alias("n_neg"),
        F.round(
            (rpos - npos * (npos + 1) / 2.0) / (npos * (ntot - npos))
            + 0.00000001,
            6,
        ).alias("auc"),
    )


# --------------------------------------------------------------------------
# calibration (reliability) bins
# --------------------------------------------------------------------------

_CALIB_BINS = 10


@register(
    "eval_calibration_bins",
    f"""
    WITH s AS (
      SELECT round(CAST(embedding[1] AS DOUBLE), 6) AS score,
             CASE WHEN label = {_AUC_POS_LABEL} THEN 1.0 ELSE 0.0 END AS y
      FROM embeddings
    ),
    b AS (SELECT min(score) AS lo, max(score) AS hi FROM s)
    SELECT CAST(CASE WHEN score >= hi THEN {_CALIB_BINS - 1}
                ELSE floor((score - lo) * {_CALIB_BINS} / (hi - lo)) END
           AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(CAST(avg(score) AS REAL) AS DOUBLE) + 0.00000001, 6)
             AS avg_score,
           round(CAST(CAST(avg(y) AS REAL) AS DOUBLE) + 0.00000001, 6)
             AS pos_rate
    FROM s CROSS JOIN b
    GROUP BY 1 ORDER BY bin
    """,
)
def eval_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram table for the same score/label pair as
    eval_auc_roc: 10 equal-width score bins (top edge inclusive in the
    last bin), each reporting its population, mean score, and observed
    positive rate — the calibration companion to AUC's ranking quality
    (a well-calibrated scorer has pos_rate tracking avg_score per bin;
    ECE is one weighted subtraction away from this table).

    Scale shape: the bin edges are a 1-row min/max aggregate broadcast
    via the whitelisted scalar crossJoin; binning is arithmetic (both
    engines evaluate the identical IEEE-double expression, so boundary
    assignment agrees exactly); the rollup is one map-side-combined
    aggregate down to B rows. Bin means go through the float32 squash +
    half-tie epsilon, the repo's cross-engine summation contract.
    """
    emb = read_sf_parquet(spark, sf_dir, "embeddings")
    s = emb.select(
        F.round(F.col("embedding")[0].cast("double"), 6).alias("score"),
        F.when(F.col("label") == _AUC_POS_LABEL, F.lit(1.0))
        .otherwise(F.lit(0.0))
        .alias("y"),
    )
    b = s.agg(F.min("score").alias("lo"), F.max("score").alias("hi"))
    binned = s.crossJoin(F.broadcast(b)).withColumn(
        "bin",
        F.when(F.col("score") >= F.col("hi"), F.lit(_CALIB_BINS - 1))
        .otherwise(
            F.floor(
                (F.col("score") - F.col("lo"))
                * _CALIB_BINS
                / (F.col("hi") - F.col("lo"))
            )
        )
        .cast("long"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(
                F.avg("score").cast("float").cast("double") + 0.00000001, 6
            ).alias("avg_score"),
            F.round(
                F.avg("y").cast("float").cast("double") + 0.00000001, 6
            ).alias("pos_rate"),
        )
        .orderBy("bin")
    )


# --------------------------------------------------------------------------
# round 8: feature winsorization + deterministic corpus shuffle
# --------------------------------------------------------------------------

@register(
    "prep_winsorize_stats",
    """
    WITH q AS (
      SELECT quantile_cont(l_extendedprice, 0.01) AS p01,
             quantile_cont(l_extendedprice, 0.99) AS p99
      FROM lineitem
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           round(CAST(CAST((SELECT p01 FROM q) AS REAL) AS DOUBLE)
                 + 0.00000001, 2) AS p01,
           round(CAST(CAST((SELECT p99 FROM q) AS REAL) AS DOUBLE)
                 + 0.00000001, 2) AS p99,
           round(CAST(CAST(avg(l_extendedprice) AS REAL) AS DOUBLE)
                 + 0.00000001, 2) AS mean_raw,
           round(CAST(CAST(avg(least(greatest(l_extendedprice,
                       (SELECT p01 FROM q)), (SELECT p99 FROM q)))
                 AS REAL) AS DOUBLE) + 0.00000001, 2) AS mean_winsor,
           CAST(count(*) FILTER (l_extendedprice < (SELECT p01 FROM q)
                OR l_extendedprice > (SELECT p99 FROM q)) AS BIGINT)
             AS n_clipped
    FROM lineitem
    """,
)
def prep_winsorize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized feature statistics: clip l_extendedprice at its exact
    [p01, p99] and report the clip bounds, raw vs winsorized mean, and
    the clipped-row count — the outlier-robust normalization step before
    a numeric feature enters training.

    The gate uses Spark's exact `percentile` so the oracle (DuckDB
    quantile_cont, same linear interpolation) matches bit-for-bit after
    the squash; the production path at 100 TB swaps in
    approx_percentile(eps) — same plan shape, sketch instead of sort —
    which this gate's exact twin exists to validate against. Two passes
    over one cached scan (quantiles, then clipped aggregate) with the
    1-row quantile pair broadcast as a whitelisted scalar."""
    li = _t(spark, sf_dir, "lineitem").select("l_extendedprice")
    li = li.localCheckpoint(eager=False)  # quantile pass + stats pass
    # ONE percentile(col, array(...)) buffer for both quantiles (r12,
    # the sketch_tdigest_rollup change-(c) precedent): two scalar
    # percentile aggregates each keep an independent full value-multiset
    # buffer; the array form sorts once and interpolates both —
    # per-element results are bit-identical (same Percentile aggregate).
    q = li.agg(
        F.expr("percentile(l_extendedprice, array(0.01D, 0.99D))").alias("pq")
    ).select(F.col("pq")[0].alias("p01"), F.col("pq")[1].alias("p99"))
    x = F.col("l_extendedprice")
    clipped = F.least(F.greatest(x, F.col("p01")), F.col("p99"))
    return li.crossJoin(F.broadcast(q)).agg(
        F.count("*").cast("long").alias("n"),
        F.round(
            F.first("p01").cast("float").cast("double") + 0.00000001, 2
        ).alias("p01"),
        F.round(
            F.first("p99").cast("float").cast("double") + 0.00000001, 2
        ).alias("p99"),
        F.round(
            F.avg(x).cast("float").cast("double") + 0.00000001, 2
        ).alias("mean_raw"),
        F.round(
            F.avg(clipped).cast("float").cast("double") + 0.00000001, 2
        ).alias("mean_winsor"),
        F.count(
            F.when((x < F.col("p01")) | (x > F.col("p99")), 1)
        ).cast("long").alias("n_clipped"),
    )


@register(
    "prep_shuffle_deterministic",
    """
    WITH h AS (
      SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || ':42') AS hk
      FROM documents
    ),
    top AS (SELECT doc_id, hk FROM h ORDER BY hk, doc_id LIMIT 20)
    SELECT CAST(row_number() OVER (ORDER BY hk, doc_id) AS BIGINT)
             AS position,
           doc_id, hk
    FROM top ORDER BY position
    """,
)
def prep_shuffle_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded deterministic corpus shuffle — the reproducible
    training-order primitive: every engine and every rerun agrees on the
    permutation because the sort key is md5(doc_id || seed), a pure
    function of the data (never rand(), whose draw order is
    partitioning-dependent). The gate surfaces the first 20 positions.

    Scale shape: the full shuffle at 100 TB is a range-partitioned sort
    on the hash key (one shuffle, writers emit sorted runs per range —
    exactly how the packing pipeline consumes it); the gate's top-20 is
    a sort-limit (per-partition top-k + driver merge of 20-row heads,
    no global sort materialized). The 20-row row_number window is
    bounded by the limit, not the corpus."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":42"))).alias(
            "hk"
        ),
    )
    top = docs.orderBy("hk", "doc_id").limit(20)
    w = Window.orderBy("hk", "doc_id")  # bounded: 20 rows post-limit
    return top.select(
        F.row_number().over(w).cast("long").alias("position"),
        "doc_id",
        "hk",
    ).orderBy("position")


@register(
    "prep_target_encoding",
    """
    WITH base AS (
      SELECT event_type,
             CAST(substring(md5(CAST(event_id AS VARCHAR) || ':fold'), 1, 1)
                  <= '3' AS INT)
               + CAST(substring(md5(CAST(event_id AS VARCHAR) || ':fold'), 1, 1)
                  <= '7' AS INT)
               + CAST(substring(md5(CAST(event_id AS VARCHAR) || ':fold'), 1, 1)
                  <= 'b' AS INT) AS fold,
             value
      FROM events WHERE value IS NOT NULL
    ),
    g AS (SELECT avg(value) AS gmean, count(*) AS gn FROM base),
    per AS (
      SELECT event_type, fold,
             sum(value) AS s, count(*) AS c
      FROM base GROUP BY 1, 2
    ),
    tot AS (
      SELECT event_type, sum(s) AS ts, sum(c) AS tc FROM per GROUP BY 1
    )
    SELECT p.event_type, CAST(p.fold AS INT) AS fold,
           CAST(p.c AS BIGINT) AS n_fold,
           round(CAST(CAST(
             ((t.ts - p.s) + 20.0 * (SELECT gmean FROM g))
             / ((t.tc - p.c) + 20.0)
             AS REAL) AS DOUBLE) + 0.00000001, 4) AS encoding
    FROM per p JOIN tot t USING (event_type)
    ORDER BY 1, 2
    """,
)
def prep_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe (out-of-fold) target encoding with additive
    smoothing — the categorical-feature workhorse: each (category, fold)
    cell is encoded by the target mean computed from the OTHER folds
    (so a row never sees its own target), shrunk toward the global mean
    with pseudo-count 20 (micci-barreca smoothing). Folds assign by an
    md5 range split of the row id — deterministic, layout-stable, the
    same trick as the leak-free train/test split.

    Scale shape: one scan to per-(category, fold) partials (map-side
    combined), category totals are an aggregate OF those partials
    (never a rescan), leave-one-fold-out encodings assemble by
    subtraction on the |categories| x |folds| frame — the full-table
    encode is then one broadcast join of this tiny table back onto rows.
    Folds compare the FIRST hex digit of the md5 (<= '3' / '7' / 'b' via
    3 cumulative indicator sums), cutting hex space into 4 genuinely
    equal quarters {0-3, 4-7, 8-b, c-f} — a full-string BETWEEN against
    1-char bounds would exclude hashes starting with the boundary digit
    and skew the folds 3/4/4/5 sixteenths. Identical arithmetic in both
    engines."""
    ev = load_events(spark, sf_dir).where(F.col("value").isNotNull())
    h1 = F.substring(
        F.md5(F.concat(F.col("event_id").cast("string"), F.lit(":fold"))), 1, 1
    )
    fold = (
        (h1 <= "3").cast("int") + (h1 <= "7").cast("int") + (h1 <= "b").cast("int")
    )
    base = ev.select("event_type", fold.alias("fold"), "value")
    base = base.localCheckpoint(eager=False)  # gmean + partials, one scan
    g = base.agg(F.avg("value").alias("gmean"))
    per = base.groupBy("event_type", "fold").agg(
        F.sum("value").alias("s"), F.count("*").alias("c")
    )
    per = per.localCheckpoint(eager=False)  # totals reuse the partials
    tot = per.groupBy("event_type").agg(
        F.sum("s").alias("ts"), F.sum("c").alias("tc")
    )
    enc = (
        per.join(F.broadcast(tot), "event_type")
        .crossJoin(F.broadcast(g))
        .select(
            "event_type",
            F.col("fold").cast("int").alias("fold"),
            F.col("c").cast("long").alias("n_fold"),
            F.round(
                (
                    (F.col("ts") - F.col("s") + 20.0 * F.col("gmean"))
                    / (F.col("tc") - F.col("c") + 20.0)
                )
                .cast("float")
                .cast("double")
                + 0.00000001,
                4,
            ).alias("encoding"),
        )
    )
    return enc.orderBy("event_type", "fold")


# --------------------------------------------------------------------------
# round 9 (late window): DSIR — importance resampling weights
# --------------------------------------------------------------------------

_DSIR_B = 4096  # hashed-feature buckets
from ..functions.text import LOWER_TOKENS_SQL_TWIN as _DSIR_T  # noqa: E402


@register(
    "prep_dsir_weights",
    f"""
    WITH toks AS (
      SELECT doc_id, lang,
             (CAST(('0x' || substr(md5(term), 1, 4)) AS BIGINT) % {_DSIR_B})
               AS b
      FROM (SELECT doc_id, lang, unnest({_DSIR_T}) AS term FROM documents)
      WHERE term <> ''
    ),
    bc AS (
      SELECT b, count(*) AS n_r,
             count(*) FILTER (lang = 'en') AS n_t
      FROM toks GROUP BY b
    ),
    tot AS (SELECT sum(n_r) AS tot_r, sum(n_t) AS tot_t FROM bc),
    lr AS (
      SELECT b, ln((n_t + 1.0) / (tot_t + {_DSIR_B}))
                - ln((n_r + 1.0) / (tot_r + {_DSIR_B})) AS logr
      FROM bc CROSS JOIN tot
    )
    SELECT t.doc_id, max(t.lang) AS lang,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(CAST(CAST(sum(lr.logr) AS REAL) AS DOUBLE) + 0.00000001, 3)
             AS log_weight
    FROM toks t JOIN lr ON t.b = lr.b
    GROUP BY t.doc_id
    ORDER BY log_weight DESC, t.doc_id
    LIMIT 20
    """,
)
def prep_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Xie et al. 2023, "Data Selection for Language Models via
    Importance Resampling"): score every document by how target-like its
    hashed n-gram features are — log w(d) = sum over tokens of
    log p_target(bucket) / log p_raw(bucket), with the 'en' slice as the
    target domain, 4096 md5-hashed unigram buckets, and +1 smoothing.
    The top-weight docs are what an importance-resampled pre-training
    mix would keep.

    Plan: one explode to (doc, bucket) pairs; bucket stats are ONE
    conditional-aggregate pass (4096 groups, map-side partials); the
    log-ratio table is bounded (|buckets| rows) and broadcast back onto
    the token stream, so the only data-sized shuffle is the per-doc sum
    — the same shape as TF-IDF. At 100 TB: scan-bound; nothing global
    except two bounded frames."""
    return (
        dsir_doc_weights(spark, sf_dir)
        .orderBy(F.col("log_weight").desc(), "doc_id")
        .limit(20)
    )


def dsir_doc_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full per-document DSIR frame (doc_id, lang, n_tokens, log_weight)
    — the library face of ``prep_dsir_weights`` (which keeps only the
    top-20 display head). See that query's docstring for the plan."""
    docs = _docs(spark, sf_dir)
    toks = (
        docs.select(
            "doc_id", "lang", F.explode(lower_tokens("text")).alias("term")
        )
        .where(F.col("term") != "")
        .select(
            "doc_id",
            "lang",
            (
                F.conv(F.substring(F.md5("term"), 1, 4), 16, 10).cast("long")
                % _DSIR_B
            ).alias("b"),
        )
    )
    bc = toks.groupBy("b").agg(
        F.count("*").alias("n_r"),
        F.count(F.when(F.col("lang") == "en", 1)).alias("n_t"),
    )
    tot = bc.agg(
        F.sum("n_r").alias("tot_r"), F.sum("n_t").alias("tot_t")
    )
    lr = bc.crossJoin(F.broadcast(tot)).select(
        "b",
        (
            F.log((F.col("n_t") + 1.0) / (F.col("tot_t") + _DSIR_B))
            - F.log((F.col("n_r") + 1.0) / (F.col("tot_r") + _DSIR_B))
        ).alias("logr"),
    )
    return (
        toks.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.max("lang").alias("lang"),
            F.count("*").cast("long").alias("n_tokens"),
            F.round(
                F.sum("logr").cast("float").cast("double") + 0.00000001, 3
            ).alias("log_weight"),
        )
    )


# --------------------------------------------------------------------------
# round 9 (late window): cross-source quantile normalization
# --------------------------------------------------------------------------

@register(
    "prep_quantile_normalize",
    """
    WITH g AS (
      SELECT source, n_chars, count(*) AS cnt
      FROM documents GROUP BY source, n_chars
    ),
    c AS (
      SELECT source, n_chars, cnt,
             COALESCE(sum(cnt) OVER (PARTITION BY source ORDER BY n_chars
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below,
             sum(cnt) OVER (PARTITION BY source) AS nsrc
      FROM g
    ),
    d AS (
      SELECT source, cnt, n_chars,
             least(CAST(floor((below + cnt / 2.0) / nsrc * 10) AS INT) + 1,
                   10) AS decile
      FROM c
    ),
    cell AS (
      SELECT source, decile, CAST(sum(cnt) AS BIGINT) AS n_docs,
             sum(cnt * n_chars) / sum(cnt) AS raw_mean
      FROM d GROUP BY source, decile
    ),
    norm AS (SELECT decile, avg(raw_mean) AS nv FROM cell GROUP BY decile)
    SELECT source, decile, n_docs,
           round(CAST(CAST(raw_mean AS REAL) AS DOUBLE) + 0.00000001, 4)
             AS raw_mean,
           round(CAST(CAST(nv AS REAL) AS DOUBLE) + 0.00000001, 4)
             AS norm_value
    FROM cell JOIN norm USING (decile)
    ORDER BY source, decile
    """,
)
def prep_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source quantile normalization of document length — map each
    source's per-decile mean onto the cross-source decile mean, the
    classic rank-based batch-effect correction (Bolstad 2003) applied to
    corpus features: after normalization every source shares the same
    length distribution, so a length-based quality filter can't encode a
    source bias.

    Deciles are VALUE-based (midpoint percentile of each distinct
    n_chars, split-ties-never), not ntile — that keeps every window on
    the bounded (source x distinct-value) aggregate frame, never a
    per-source sort of raw rows: the same quantized-domain rank
    discipline as Mann-Whitney (operators/stats.py). At 100 TB the
    windowed frame is |sources| x |length domain| rows; the only
    raw-data pass is the initial groupBy."""
    docs = _docs(spark, sf_dir)
    g = docs.groupBy("source", "n_chars").agg(F.count("*").alias("cnt"))
    from pyspark.sql import Window

    ws = Window.partitionBy("source").orderBy("n_chars")
    below = F.coalesce(
        F.sum("cnt").over(ws.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    nsrc = F.sum("cnt").over(Window.partitionBy("source"))
    d = g.select(
        "source",
        "cnt",
        "n_chars",
        F.least(
            F.floor((below + F.col("cnt") / 2.0) / nsrc * 10).cast("int") + 1,
            F.lit(10),
        ).alias("decile"),
    )
    cell = d.groupBy("source", "decile").agg(
        F.sum("cnt").cast("long").alias("n_docs"),
        (
            F.sum(F.col("cnt") * F.col("n_chars")) / F.sum("cnt")
        ).alias("raw_mean"),
    )
    norm = cell.groupBy("decile").agg(F.avg("raw_mean").alias("nv"))
    sq = lambda c, a: F.round(  # noqa: E731
        F.col(c).cast("float").cast("double") + 0.00000001, 4
    ).alias(a)
    return (
        cell.join(F.broadcast(norm), "decile")
        .select(
            "source",
            "decile",
            "n_docs",
            sq("raw_mean", "raw_mean"),
            sq("nv", "norm_value"),
        )
        .orderBy("source", "decile")
    )
