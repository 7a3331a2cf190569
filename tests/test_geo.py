"""Geo family — geohash encoding vs a pure-Python reference and public
test vectors; haversine vs known city-pair distances; the cell-bucketed
zone join vs the plain theta-join semantics; nearest-POI argmin vs brute
force."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from amazon_kinesis_analytics_streaming_etl_spark.functions import geo
from tests.conftest import SF_SMOKE

BASE32 = geo.GEOHASH_BASE32


def ref_geohash(lat: float, lon: float, chars: int) -> str:
    """Independent reference: classic interval-bisection geohash."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits, out, even = 0, [], True
    ch = 0
    while len(out) < chars:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                ch = (ch << 1) | 1
                lon_lo = mid
            else:
                ch = ch << 1
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                ch = (ch << 1) | 1
                lat_lo = mid
            else:
                ch = ch << 1
                lat_hi = mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(BASE32[ch])
            bits, ch = 0, 0
    return "".join(out)


def sql_geohash(spark, lat: float, lon: float, chars: int = 6) -> str:
    # CAST: Spark parses bare decimal literals as DECIMAL, not DOUBLE.
    la = f"CAST({lat!r} AS DOUBLE)"
    lo = f"CAST({lon!r} AS DOUBLE)"
    q = (
        f"SELECT {geo.geohash_chars_expr('g', chars)} AS gh FROM ("
        f"SELECT {geo.interleave_expr('xg', 'yg', chars)} AS g FROM ("
        f"SELECT {geo.lon_bits_expr(lo, chars)} AS xg, "
        f"{geo.lat_bits_expr(la, chars)} AS yg))"
    )
    return spark.sql(q).collect()[0][0]


def test_geohash_public_vectors(spark):
    # Wikipedia's canonical example point (57.64911, 10.40744) -> u4pruy.
    assert sql_geohash(spark, 57.64911, 10.40744, 6) == "u4pruy"
    # NYC Times Square-ish and a southern-hemisphere point, vs reference.
    for lat, lon in [(40.758, -73.9855), (-33.8568, 151.2153)]:
        assert sql_geohash(spark, lat, lon, 6) == ref_geohash(lat, lon, 6)


@settings(max_examples=25, deadline=None)
@given(
    lat=st.floats(min_value=-89.99, max_value=89.99).map(lambda v: round(v, 3)),
    lon=st.floats(min_value=-179.99, max_value=179.99).map(lambda v: round(v, 3)),
)
def test_geohash_matches_bisection_reference(spark_holder, lat, lon):
    spark = spark_holder[0]
    # The bit-interleave formulation must equal interval bisection
    # everywhere (same algorithm, different statement). Coordinates are
    # quantized to 3dp: within ~1e-13 of a cell boundary the two
    # formulations can legitimately differ by one cell via double
    # rounding (scale-then-floor vs exact midpoint compare), and 3dp
    # points never sit in that window.
    assert sql_geohash(spark, lat, lon, 6) == ref_geohash(lat, lon, 6)


@pytest.fixture(scope="module")
def spark_holder(spark):
    # hypothesis forbids function-scoped fixtures; smuggle the session in
    # a module-scoped holder.
    return [spark]


def test_haversine_known_distance(spark):
    # JFK (40.6413, -73.7781) to LAX (33.9416, -118.4085): great-circle
    # distance ~3974 km (public airport-pair figure, R=6371.0088).
    def d(v):
        return f"CAST({v!r} AS DOUBLE)"

    e = geo.haversine_km_expr(
        d(40.6413), d(-73.7781), d(33.9416), d(-118.4085)
    )
    km = spark.sql(f"SELECT {e} AS km").collect()[0][0]
    assert km == pytest.approx(3974.0, abs=5.0)
    # zero distance to itself
    z = geo.haversine_km_expr(d(40.0), d(-74.0), d(40.0), d(-74.0))
    assert spark.sql(f"SELECT {z} AS km").collect()[0][0] == 0.0


def test_zone_cell_join_equals_theta_join(spark):
    """The broadcast cell-bucketed rewrite must return exactly the plain
    inequality-join result (cells are a prefilter, never a semantic)."""
    from amazon_kinesis_analytics_streaming_etl_spark.plans.geo import (
        _pts,
        _zone_bound_exprs,
        _ZN,
        geo_zone_cell_join,
    )

    got = {
        r["zone_id"]: (r["n_points"], r["avg_value"])
        for r in geo_zone_cell_join(spark, SF_SMOKE).collect()
    }
    from pyspark.sql import functions as F

    zones = (
        spark.range(_ZN)
        .withColumnRenamed("id", "z")
        .selectExpr(
            "z AS zone_id",
            *[
                f"{geo.spark_expr(e)} AS {n}"
                for n, e in _zone_bound_exprs().items()
            ],
        )
    )
    theta = (
        _pts(spark, SF_SMOKE)
        .crossJoin(zones)
        .where(
            (F.col("lat") >= F.col("zlat0"))
            & (F.col("lat") < F.col("zlat0") + F.col("zh"))
            & (F.col("lon") >= F.col("zlon0"))
            & (F.col("lon") < F.col("zlon0") + F.col("zw"))
        )
        .groupBy("zone_id")
        .agg(
            F.count("*").cast("long").alias("n_points"),
            F.round(F.avg("value") + 0.00000001, 4).alias("avg_value"),
        )
    )
    want = {
        r["zone_id"]: (r["n_points"], r["avg_value"]) for r in theta.collect()
    }
    assert got == want
    assert len(got) == _ZN  # every zone catches points at this SF


def test_nearest_poi_argmin_matches_bruteforce(spark):
    from amazon_kinesis_analytics_streaming_etl_spark.plans.geo import (
        _poi_coords,
        _pts,
        geo_nearest_poi,
    )

    pois = _poi_coords()

    def hav(lat1, lon1, lat2, lon2):
        p1, p2 = math.radians(lat1), math.radians(lat2)
        dp, dl = p2 - p1, math.radians(lon2) - math.radians(lon1)
        a = (
            math.sin(dp / 2) ** 2
            + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
        )
        return 6371.0088 * 2 * math.asin(math.sqrt(a))

    # deterministic subset: LIMIT without ORDER BY can return different
    # rows per invocation, so pin by event_id on BOTH sides
    from pyspark.sql import functions as F

    base = _pts(spark, SF_SMOKE).where(F.col("event_id") < 200)
    pts = base.select("lat", "lon").collect()
    want_counts: dict[int, int] = {}
    for r in pts:
        best = min(pois, key=lambda p: (hav(r["lat"], r["lon"], p[1], p[2]), p[0]))
        want_counts[best[0]] = want_counts.get(best[0], 0) + 1

    # full-table sanity: EXECUTE the catalog query (not just analysis)
    got_rows = geo_nearest_poi(spark, SF_SMOKE)
    assert got_rows.columns == ["poi_id", "n_assigned", "avg_km", "sum_value"]
    full = got_rows.collect()
    assert sum(r["n_assigned"] for r in full) == base.count() + _pts(
        spark, SF_SMOKE
    ).where(F.col("event_id") >= 200).count()

    sub = base
    poisl = F.array(
        *[
            F.struct(
                F.lit(i).alias("poi_id"),
                F.lit(la).alias("plat"),
                F.lit(lo).alias("plon"),
            )
            for i, la, lo in pois
        ]
    )
    havs = geo.haversine_km_expr("p.plat", "p.plon", "lat", "lon")
    best = F.expr(
        "array_min(transform(pois, "
        f"p -> struct({havs} AS km, p.poi_id AS poi_id)))"
    )
    got = {
        r["poi_id"]: r["n"]
        for r in sub.withColumn("pois", poisl)
        .select(F.col("lat"), F.col("lon"), best.alias("b"))
        .groupBy(F.col("b.poi_id").alias("poi_id"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want_counts


def test_grid_cell_key_roundtrip(spark):
    # cell key decomposes back into the right y/x bins
    e = geo.cell_expr(
        "CAST(40.712 AS DOUBLE)", "CAST(-74.006 AS DOUBLE)", 0.01
    )
    cell = spark.sql(f"SELECT {e} AS c").collect()[0][0]
    y, x = divmod(cell, 100000)
    assert y == math.floor((40.712 + 90.0) / 0.01)
    assert x == math.floor((-74.006 + 180.0) / 0.01)


def test_dbscan_cells_clusters_are_disjoint_and_dense(spark):
    """Cluster labels partition the core cells (sum of n_cells == core
    count) and every cluster's mean density stays above the 2x gate that
    defines core cells."""
    from pyspark.sql import functions as F

    from amazon_kinesis_analytics_streaming_etl_spark.plans.geo import (
        _pts,
        geo_dbscan_cells,
    )

    out = geo_dbscan_cells(spark, SF_SMOKE).collect()
    assert 1 <= len(out) <= 10
    assert all(r["n_cells"] >= 1 and r["n_points"] >= r["n_cells"] for r in out)
    labels = [r["cluster_id"] for r in out]
    assert len(set(labels)) == len(labels)

    cells = (
        _pts(spark, SF_SMOKE)
        .groupBy(
            F.expr("CAST(floor((lat + 90.0) / 0.01) AS BIGINT)").alias("yc"),
            F.expr("CAST(floor((lon + 180.0) / 0.01) AS BIGINT)").alias("xc"),
        )
        .agg(F.count("*").alias("n"))
        .collect()
    )
    avg = sum(r["n"] for r in cells) / len(cells)
    n_core = sum(1 for r in cells if r["n"] > 2 * avg)
    # top-10 clusters cannot exceed the core-cell population
    assert sum(r["n_cells"] for r in out) <= n_core


def test_geohash_domain_edges_clamp_to_top_cell(spark):
    """lat=90 / lon=180 must encode as the all-ones top cell (matching
    bisection, where every compare takes the upper half) instead of
    overflowing one bit past the interleave width."""
    assert sql_geohash(spark, 90.0, 180.0, 6) == ref_geohash(90.0, 180.0, 6)
    assert sql_geohash(spark, 90.0, 180.0, 6) == "zzzzzz"
    assert sql_geohash(spark, -90.0, -180.0, 6) == "000000"


def test_u32_uniform_is_double_and_bit_equals_python_float_recipe(spark):
    """The md5-uniform (r12) divides in IEEE-754 double, not decimal:
    the Spark column type must be DOUBLE and every value must bit-equal
    the Python float recipe (int(md5hex[s:s+8], 16) / 2**32) that
    plans/geo.py:_poi_coords uses — k/2^32 is exact in double, so any
    mismatch means an engine fell back to truncated decimal division."""
    import hashlib

    from pyspark.sql import functions as F

    keys = [f"probe{i}" for i in range(64)]
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    for start in (1, 9, 17, 25):
        expr = geo.spark_expr(geo.u32_expr("k", start))
        out = df.select("k", F.expr(expr).alias("u"))
        assert dict(out.dtypes)["u"] == "double"
        got = {r["k"]: r["u"] for r in out.collect()}
        for k in keys:
            h = hashlib.md5(k.encode()).hexdigest()
            want = int(h[start - 1 : start + 7], 16) / 4294967296.0
            assert got[k] == want and math.isfinite(got[k])
