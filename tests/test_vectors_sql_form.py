"""The one-round-trip SQL form of sign_bits / sign_bits_tables must be
bit-identical to the Column-API form (r12: driver-side construction was
rebuilt as one parsed expression; the VALUES must not move by a single
bit — the LSH bucket assignment feeds oracle-gated queries)."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from amazon_kinesis_analytics_streaming_etl_spark.functions.vectors import (
    _double_sql,
    sign_bits,
    sign_bits_tables,
)


def _planes(n_bits: int, dim: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_bits)]


def test_double_sql_round_trips_exactly(spark):
    # Adversarial doubles: exponent reprs, integral floats, negatives,
    # denormals, a value at the repr-shortening boundary.
    vals = [
        0.1,
        -0.1,
        2.0,
        -2.0,
        1e-17,
        -1e22,
        5e-324,
        1.7976931348623157e308,
        0.30000000000000004,
        -0.0,
        123456789.123456789,
    ]
    exprs = ",".join(_double_sql(v) for v in vals)
    row = spark.sql(f"SELECT ARRAY({exprs}) AS a").head()
    got = row["a"]
    for v, g in zip(vals, got):
        # bit equality (0.0 == -0.0 under ==, so compare the bit patterns)
        import struct

        assert struct.pack("<d", g) == struct.pack("<d", float(v)), (v, g)


def test_double_sql_rejects_non_finite():
    with pytest.raises(ValueError):
        _double_sql(math.inf)
    with pytest.raises(ValueError):
        _double_sql(math.nan)


@pytest.mark.parametrize("n_bits,dim", [(8, 64), (16, 8), (1, 3)])
def test_sign_bits_sql_form_matches_column_form(spark, n_bits, dim):
    planes = _planes(n_bits, dim, seed=n_bits * 100 + dim)
    rng = random.Random(7)
    rows = [
        (i, [rng.gauss(0.0, 1.0) for _ in range(dim)]) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    both = df.select(
        "id",
        sign_bits("v", planes).alias("sql_form"),
        sign_bits(F.col("v"), planes).alias("col_form"),
    ).collect()
    assert all(r["sql_form"] == r["col_form"] for r in both)
    # non-degenerate: more than one bucket over 200 gaussian vectors
    assert len({r["sql_form"] for r in both}) > 1


def test_sign_bits_tables_sql_form_matches_column_form(spark):
    tables = [_planes(8, 16, seed=s) for s in range(4)]
    rng = random.Random(11)
    rows = [(i, [rng.gauss(0.0, 1.0) for _ in range(16)]) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    both = df.select(
        "id",
        sign_bits_tables("v", tables).alias("sql_form"),
        sign_bits_tables(F.col("v"), tables).alias("col_form"),
    ).collect()
    assert all(list(r["sql_form"]) == list(r["col_form"]) for r in both)


def test_cosine_to_query_matches_column_form(spark):
    from amazon_kinesis_analytics_streaming_etl_spark.functions.vectors import (
        cosine,
        cosine_to_query,
    )

    rng = random.Random(5)
    dim = 32
    qvec = [rng.gauss(0.0, 1.0) for _ in range(dim)]
    rows = [(i, [rng.gauss(0.0, 1.0) for _ in range(dim)]) for i in range(150)]
    rows.append((150, [0.0] * dim))  # zero norm -> NULL contract
    df = spark.createDataFrame(rows, "id long, v array<double>")
    both = df.select(
        "id",
        cosine_to_query("v", qvec).alias("sql_form"),
        cosine(F.col("v"), F.lit([float(x) for x in qvec])).alias("col_form"),
    ).collect()
    for r in both:
        assert r["sql_form"] == r["col_form"], r
    assert both[-1]["sql_form"] is None  # zero-norm row


def test_sign_bits_sql_form_on_float_arrays(spark):
    # The real embeddings tables carry array<float>; the zip_with lambda
    # casts elementwise, so float inputs must behave identically too.
    planes = _planes(8, 4, seed=3)
    rows = [(i, [float(i) * 0.25 - 1.5, -0.5, 0.125, 2.0]) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, v array<float>")
    both = df.select(
        sign_bits("v", planes).alias("sql_form"),
        sign_bits(F.col("v"), planes).alias("col_form"),
    ).collect()
    assert all(r["sql_form"] == r["col_form"] for r in both)


def test_minhash_banding_sql_form_matches_column_api(spark):
    # The r12 SQL-text banding in minhash_lsh_candidates must produce the
    # same (band, band_hash) rows as the Column-API unroll it replaced.
    import random

    from pyspark.sql import functions as F

    from amazon_kinesis_analytics_streaming_etl_spark.operators.dedup import (
        minhash_lsh_candidates,
    )

    bands, num_hashes = 16, 64
    rows_per_band = num_hashes // bands
    rng = random.Random(3)
    rows = [
        (i, [rng.randrange(-(2**62), 2**62) for _ in range(num_hashes)])
        for i in range(60)
    ]
    rows.append((60, None))
    sigs = spark.createDataFrame(rows, "_id long, signature array<bigint>")

    legacy_band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[
                        F.element_at("signature", b * rows_per_band + j + 1)
                        for j in range(rows_per_band)
                    ]
                ).alias("band_hash"),
            )
            for b in range(bands)
        ]
    )
    legacy = (
        sigs.where(F.col("signature").isNotNull())
        .select("_id", F.explode(legacy_band_structs).alias("bh"))
        .select("_id", "bh.band", "bh.band_hash")
    )
    legacy_a, legacy_b = legacy.alias("a"), legacy.alias("b")
    legacy_pairs = (
        legacy_a.join(
            legacy_b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    new_pairs = minhash_lsh_candidates(sigs, bands=bands, num_hashes=num_hashes)
    assert new_pairs.exceptAll(legacy_pairs).count() == 0
    assert legacy_pairs.exceptAll(new_pairs).count() == 0
    sigs.unpersist()


def test_simhash64_sql_form_matches_column_api(spark):
    # r12: simhash64's vote aggregates + packing moved to parsed SQL text;
    # signatures must equal the legacy Column-API form bit for bit
    # (including bit 63, where shiftleft(1L, 63) wraps to Long.MIN_VALUE).
    from pyspark.sql import functions as F

    from amazon_kinesis_analytics_streaming_etl_spark.functions.text import (
        whitespace_tokens,
    )
    from amazon_kinesis_analytics_streaming_etl_spark.operators.dedup import (
        simhash64,
    )

    rng = random.Random(13)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    rows = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randrange(1, 30))))
        for i in range(80)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    masks = [1 << i if i < 63 else -(1 << 63) for i in range(64)]
    flat = docs.select(
        F.col("doc_id").alias("_id"),
        F.explode(whitespace_tokens(F.lower(F.col("text")))).alias("_tok"),
    ).select("_id", F.xxhash64("_tok").alias("_th"))
    votes = flat.groupBy("_id").agg(
        *[
            F.sum(
                F.when(
                    F.col("_th").bitwiseAND(F.lit(m).cast("long")) != 0, 1
                ).otherwise(-1)
            ).alias(f"_v{i}")
            for i, m in enumerate(masks)
        ]
    )
    sig_terms = [
        F.when(F.col(f"_v{i}") > 0, F.lit(m).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        for i, m in enumerate(masks)
    ]
    sig = sig_terms[0]
    for term in sig_terms[1:]:
        sig = sig + term
    legacy = {
        r["_id"]: r["simhash"]
        for r in votes.select("_id", sig.alias("simhash")).collect()
    }
    new = {r["_id"]: r["simhash"] for r in simhash64(docs).collect()}
    assert new == legacy
    assert len(set(new.values())) > 1  # non-degenerate


def test_array_double_lit_matches_f_lit(spark):
    from amazon_kinesis_analytics_streaming_etl_spark.functions.vectors import (
        array_double_lit,
    )

    rng = random.Random(17)
    flat = [rng.gauss(0.0, 1.0) for _ in range(8)]
    two = [[rng.gauss(0.0, 1.0) for _ in range(4)] for _ in range(3)]
    three = [[[rng.gauss(0.0, 1.0) for _ in range(2)] for _ in range(3)] for _ in range(2)]
    row = spark.range(1).select(
        array_double_lit(flat).alias("f_sql"),
        F.lit(flat).alias("f_col"),
        array_double_lit(two).alias("t_sql"),
        F.lit(two).alias("t_col"),
        array_double_lit(three).alias("d_sql"),
        F.lit(three).alias("d_col"),
    ).head()
    assert list(row["f_sql"]) == list(row["f_col"])
    assert [list(x) for x in row["t_sql"]] == [list(x) for x in row["t_col"]]
    assert row["d_sql"] == row["d_col"]
    # empty arrays take the F.lit fallback and still evaluate
    empty = spark.range(1).select(array_double_lit([]).alias("e")).head()
    assert list(empty["e"]) == []
