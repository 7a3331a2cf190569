"""Geospatial query family — haversine trip metrics, grid/geohash hotspot
aggregation, cell-bucketed spatial join, broadcast nearest-POI assignment.

The reference pipeline's domain is taxi trips (TripEvent.avsc carries
pickup/dropoff location ids; the Flink job partitions the file sink by
``pickup_location``, StreamingEtl.java:219-224). This family supplies the
geo analytics a user of that pipeline runs next: point density, distance/
speed profiling, zone assignment, nearest-facility — re-expressed as
Spark-first plans (pure builtin arithmetic, broadcast dimension joins,
cell-key bucketing; zero UDFs).

The test tables carry no raw coordinates, so each query derives
DETERMINISTIC lat/lon from the row key via the shared md5-uniform
(functions/geo.py) — both engines replay the exact same points, which is
what makes a DuckDB value-hash oracle possible for geometry.

Scale notes (100 TB): every query here is scan + narrow projection into
either one hash aggregate (hotspots), one broadcast join (zones/POIs), or
one per-user window (hops). The geometry itself is whole-stage-codegen
expression work that costs only the scan; there is no all-pairs stage —
the spatial join prunes through coarse cell keys exactly like the
similarity family prunes through LSH bands.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import geo
from ..schemas import load_events
from .relational import register

_KEY = "CAST(event_id AS STRING)"
_LAT = geo.lat_expr(_KEY)
_LON = geo.lon_expr(_KEY)

#: Shared point-projection (engine-neutral text): every geo query starts
#: from this CTE / select so Spark and DuckDB hash the same points.
_PTS_SQL = (
    "SELECT event_id, user_id, ts, event_type, value, "
    f"{_LAT} AS lat, {_LON} AS lon FROM events"
)


def _pts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        "value",
        F.expr(geo.spark_expr(_LAT)).alias("lat"),
        F.expr(geo.spark_expr(_LON)).alias("lon"),
    )


# --------------------------------------------------------------------------
# haversine hop distance / implied speed between consecutive user events
# --------------------------------------------------------------------------

_HOP_KM = geo.haversine_km_expr("plat", "plon", "lat", "lon")

@register(
    "geo_haversine_speed",
    f"""
    WITH pts AS ({_PTS_SQL}),
    hops AS (
      SELECT event_type, lat, lon,
             lag(lat) OVER w AS plat,
             lag(lon) OVER w AS plon,
             epoch_us(ts) - lag(epoch_us(ts)) OVER w AS dus
      FROM pts
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_hops,
           round(avg({_HOP_KM}) + 0.00000001, 4) AS avg_km,
           round(max({_HOP_KM} / (dus / 3600000000.0)) + 0.00000001, 3)
             AS max_kmh
    FROM hops
    WHERE plat IS NOT NULL AND dus > 0
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def geo_haversine_speed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-hop distance and implied speed per user trajectory —
    the trip-profiling pass (distance sanity, speed outliers) a taxi
    pipeline runs over its position stream.

    Plan: one scan -> per-user lag window (single shuffle on user_id,
    the natural trajectory partitioning at 100 TB) -> hash aggregate on
    event_type. Haversine stays in codegen; hop duration uses exact
    integer microseconds on both engines (unix_micros / epoch_us) so no
    float truncation can diverge."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    hops = _pts(spark, sf_dir).select(
        "event_type",
        "lat",
        "lon",
        F.lag("lat").over(w).alias("plat"),
        F.lag("lon").over(w).alias("plon"),
        (us - F.lag(us).over(w)).alias("dus"),
    )
    km = F.expr(_HOP_KM)
    return (
        hops.where(F.col("plat").isNotNull() & (F.col("dus") > 0))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_hops"),
            F.round(F.avg(km) + 0.00000001, 4).alias("avg_km"),
            F.round(
                F.max(km / (F.col("dus") / 3600000000.0)) + 0.00000001, 3
            ).alias("max_kmh"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# grid-cell hotspots (0.01 deg ~ 1.1 km bins)
# --------------------------------------------------------------------------

_CELL = geo.cell_expr("lat", "lon", 0.01)

@register(
    "geo_grid_hotspots",
    f"""
    WITH pts AS ({_PTS_SQL})
    SELECT {_CELL} AS cell,
           CAST(count(*) AS BIGINT) AS n_points,
           round(avg(value) + 0.00000001, 4) AS avg_value
    FROM pts
    GROUP BY cell
    ORDER BY n_points DESC, cell
    LIMIT 20
    """,
)
def geo_grid_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-density hotspots on a 0.01-degree grid — the pickup-heatmap
    aggregation. Plan: scan -> codegen cell key -> hash aggregate
    (map-side partial) -> TakeOrdered top-20; the cell key is the same
    integer bucketing a 100 TB layout would range-partition on, so the
    shuffle is one narrow (cell, count, sum) stream."""
    return (
        _pts(spark, sf_dir)
        .groupBy(F.expr(_CELL).alias("cell"))
        .agg(
            F.count("*").cast("long").alias("n_points"),
            F.round(F.avg("value") + 0.00000001, 4).alias("avg_value"),
        )
        .orderBy(F.col("n_points").desc(), "cell")
        .limit(20)
    )


# --------------------------------------------------------------------------
# geohash hotspots (precision 6, base32 — public Niemeyer algorithm)
# --------------------------------------------------------------------------

_XG = geo.lon_bits_expr("lon", 6)
_YG = geo.lat_bits_expr("lat", 6)
_GH = geo.geohash_chars_expr("g", 6)

@register(
    "geo_geohash_hotspots",
    f"""
    WITH pts AS ({_PTS_SQL}),
    ax AS (SELECT value, {_XG} AS xg, {_YG} AS yg FROM pts),
    iv AS (SELECT value, {geo.interleave_expr('xg', 'yg', 6)} AS g FROM ax)
    SELECT {_GH} AS geohash,
           CAST(count(*) AS BIGINT) AS n_points,
           round(sum(value) + 0.00000001, 2) AS sum_value
    FROM iv
    GROUP BY geohash
    ORDER BY n_points DESC, geohash
    LIMIT 20
    """,
)
def geo_geohash_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top geohash-6 cells by point count. Geohash is computed with pure
    integer arithmetic (axis quantization -> bit interleave -> base32
    substr lookup, functions/geo.py — validated against the public
    (57.64911, 10.40744) -> ``u4pruy`` vector), so the encode rides in
    whole-stage codegen: a 100 TB scan pays zero UDF/serialization tax,
    and the geohash string doubles as a prefix-prunable sort key for
    Z-order-style layout (geohash prefix == spatial containment)."""
    pts = _pts(spark, sf_dir)
    ax = pts.select(
        "value", F.expr(_XG).alias("xg"), F.expr(_YG).alias("yg")
    )
    iv = ax.select(
        "value", F.expr(geo.interleave_expr("xg", "yg", 6)).alias("g")
    )
    return (
        iv.groupBy(F.expr(_GH).alias("geohash"))
        .agg(
            F.count("*").cast("long").alias("n_points"),
            F.round(F.sum("value") + 0.00000001, 2).alias("sum_value"),
        )
        .orderBy(F.col("n_points").desc(), "geohash")
        .limit(20)
    )


# --------------------------------------------------------------------------
# cell-bucketed spatial join: points -> irregular bbox zones
# --------------------------------------------------------------------------

_ZN = 12
_Z_CELL_DEG = 0.05  # coarse prefilter grid for the equi-join

def _zone_bound_exprs() -> dict[str, str]:
    """Engine-neutral zone-bound expressions over a ``z`` id column: 12
    deterministic irregular bboxes inside the synthetic coordinate box,
    bounds md5-derived (4 uniform windows per zone id) so both engines
    build identical zones."""
    k = "CAST(concat('zone', CAST(z AS STRING)) AS STRING)"
    return {
        "zlat0": f"({geo.LAT0} + 0.32 * {geo.u32_expr(k, 1)})",
        "zh": f"(0.02 + 0.06 * {geo.u32_expr(k, 9)})",
        "zlon0": f"({geo.LON0} + 0.40 * {geo.u32_expr(k, 17)})",
        "zw": f"(0.02 + 0.08 * {geo.u32_expr(k, 25)})",
    }


def _zone_bounds_sql() -> str:
    cols = ", ".join(f"{e} AS {n}" for n, e in _zone_bound_exprs().items())
    return f"SELECT z AS zone_id, {cols}"


@register(
    "geo_zone_cell_join",
    f"""
    WITH pts AS ({_PTS_SQL}),
    zones AS ({_zone_bounds_sql()}
              FROM (SELECT unnest(generate_series(0, {_ZN - 1})) AS z))
    SELECT z.zone_id,
           CAST(count(*) AS BIGINT) AS n_points,
           round(avg(p.value) + 0.00000001, 4) AS avg_value
    FROM zones z JOIN pts p
      ON p.lat >= z.zlat0 AND p.lat < z.zlat0 + z.zh
     AND p.lon >= z.zlon0 AND p.lon < z.zlon0 + z.zw
    GROUP BY z.zone_id
    ORDER BY z.zone_id
    """,
)
def geo_zone_cell_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign points to irregular (possibly overlapping) bbox zones — the
    borough/zone rollup — WITHOUT a theta join: each zone is exploded to
    the coarse grid cells it overlaps, points carry the same cell key,
    and the join is a broadcast EQUI-join on cell followed by the exact
    bbox predicate. The oracle states the plain inequality-join
    semantics; the Spark plan is the scalable rewrite (cells prune the
    candidate set exactly like LSH bands prune near-dup pairs — at
    100 TB a BroadcastNestedLoopJoin over every point is the one shape
    to avoid)."""
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
    # explode each zone over the coarse cells its bbox overlaps
    d = _Z_CELL_DEG
    ycells = F.sequence(
        F.expr(f"CAST(floor((zlat0 + 90.0) / {d}) AS BIGINT)"),
        F.expr(f"CAST(floor((zlat0 + zh + 90.0) / {d}) AS BIGINT)"),
    )
    xcells = F.sequence(
        F.expr(f"CAST(floor((zlon0 + 180.0) / {d}) AS BIGINT)"),
        F.expr(f"CAST(floor((zlon0 + zw + 180.0) / {d}) AS BIGINT)"),
    )
    zcells = (
        zones.withColumn("yc", F.explode(ycells))
        .withColumn("xc", F.explode(xcells))
        .withColumn("cell", F.col("yc") * 100000 + F.col("xc"))
        .drop("yc", "xc")
    )
    pts = _pts(spark, sf_dir).withColumn(
        "cell", F.expr(geo.cell_expr("lat", "lon", d))
    )
    joined = pts.join(F.broadcast(zcells), "cell").where(
        (F.col("lat") >= F.col("zlat0"))
        & (F.col("lat") < F.col("zlat0") + F.col("zh"))
        & (F.col("lon") >= F.col("zlon0"))
        & (F.col("lon") < F.col("zlon0") + F.col("zw"))
    )
    return (
        joined.groupBy("zone_id")
        .agg(
            F.count("*").cast("long").alias("n_points"),
            F.round(F.avg("value") + 0.00000001, 4).alias("avg_value"),
        )
        .orderBy("zone_id")
    )


# --------------------------------------------------------------------------
# nearest-POI assignment (broadcast argmin over a bounded facility list)
# --------------------------------------------------------------------------

_POI_N = 20


def _poi_coords() -> list[tuple[int, float, float]]:
    """The POI list, derived with the SAME md5-uniform recipe the SQL
    helpers use (hashlib md5 hex == both engines' md5), so the Python-
    built broadcast literal and the oracle's generated CTE agree to the
    last IEEE bit."""
    out = []
    for i in range(_POI_N):
        h = hashlib.md5(f"poi{i}".encode()).hexdigest()
        u1 = int(h[0:8], 16) / 4294967296.0
        u2 = int(h[8:16], 16) / 4294967296.0
        out.append(
            (i, geo.LAT0 + geo.LAT_SPAN * u1, geo.LON0 + geo.LON_SPAN * u2)
        )
    return out


_POI_KEY = "CAST(concat('poi', CAST(i AS STRING)) AS STRING)"
_POI_KM = geo.haversine_km_expr("plat", "plon", "lat", "lon")

@register(
    "geo_nearest_poi",
    f"""
    WITH pts AS ({_PTS_SQL}),
    pois AS (
      SELECT i AS poi_id,
             ({geo.LAT0} + {geo.LAT_SPAN} * {geo.u32_expr(_POI_KEY, 1)}) AS plat,
             ({geo.LON0} + {geo.LON_SPAN} * {geo.u32_expr(_POI_KEY, 9)}) AS plon
      FROM (SELECT unnest(generate_series(0, {_POI_N - 1})) AS i)
    ),
    d AS (
      SELECT p.event_id, p.value, o.poi_id, {_POI_KM} AS km,
             row_number() OVER (PARTITION BY p.event_id
                                ORDER BY {_POI_KM}, o.poi_id) AS rn
      FROM pts p CROSS JOIN pois o
    )
    SELECT poi_id,
           CAST(count(*) AS BIGINT) AS n_assigned,
           round(avg(km) + 0.00000001, 4) AS avg_km,
           round(sum(value) + 0.00000001, 2) AS sum_value
    FROM d
    WHERE rn = 1
    GROUP BY poi_id
    ORDER BY poi_id
    """,
)
def geo_nearest_poi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-facility assignment: each point claims its closest of 20
    POIs; per-POI demand rollup. The oracle states it as cross-join +
    per-event rank; the Spark plan never materializes the cross join —
    the POI list is a broadcast ARRAY LITERAL and the argmin is one
    ``aggregate`` HOF fold per row (20 haversines in codegen), so the
    shape is scan -> map -> hash aggregate: zero joins, zero extra
    shuffles, the exact plan you want when 100 TB of points meet a
    bounded facility dimension. Ties break toward the lower poi_id on
    both engines (strict ``<`` fold left-to-right vs ORDER BY km,
    poi_id)."""
    # least() over one (km, poi_id) struct per POI: the whole argmin is
    # a flat codegen expression — each haversine evaluated ONCE (an
    # aggregate-fold formulation paid 2x trig, and higher-order-function
    # lambdas are interpreted per element, outside codegen) — and struct
    # ordering breaks km ties toward the lower poi_id, matching the
    # oracle's ORDER BY km, poi_id.
    def d(v: float) -> str:
        return f"CAST({v!r} AS DOUBLE)"

    best = F.least(
        *[
            F.struct(
                F.expr(
                    geo.haversine_km_expr(d(la), d(lo), "lat", "lon")
                ).alias("km"),
                F.lit(i).alias("poi_id"),
            )
            for i, la, lo in _poi_coords()
        ]
    )
    # Spread the single-file small-SF scan before the 20-struct argmin
    # projection (parse_dead_letter precedent): the least()-ladder is
    # this query's whole cost and otherwise runs single-threaded on the
    # one-split events file (measured 1.6s -> ~0.6s at sf0.1 on 32
    # cores; a real corpus arrives pre-partitioned, defaultParallelism
    # keeps the spread cluster-shaped). The exchange carries only
    # (event_id, value) — lat/lon derive after it, so the shuffled bytes
    # are two columns, not the geometry.
    ev = (
        load_events(spark, sf_dir)
        .select("event_id", "value")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    assigned = (
        ev.select(
            "value",
            F.expr(geo.spark_expr(_LAT)).alias("lat"),
            F.expr(geo.spark_expr(_LON)).alias("lon"),
        )
        .withColumn("best", best)
        .select(
            "value",
            F.col("best.poi_id").alias("poi_id"),
            F.col("best.km").alias("km"),
        )
    )
    return (
        assigned.groupBy("poi_id")
        .agg(
            F.count("*").cast("long").alias("n_assigned"),
            F.round(F.avg("km") + 0.00000001, 4).alias("avg_km"),
            F.round(F.sum("value") + 0.00000001, 2).alias("sum_value"),
        )
        .orderBy("poi_id")
    )


# --------------------------------------------------------------------------
# grid-density clustering (DBSCAN on cells: core cells + 8-neighbor CC)
# --------------------------------------------------------------------------

@register(
    "geo_dbscan_cells",
    f"""
    WITH RECURSIVE pts AS ({_PTS_SQL}),
    cells AS (
      SELECT CAST(floor((lat + 90.0) / 0.01) AS BIGINT) AS yc,
             CAST(floor((lon + 180.0) / 0.01) AS BIGINT) AS xc,
             count(*) AS n
      FROM pts GROUP BY yc, xc
    ),
    core AS (
      SELECT yc, xc, yc * 100000 + xc AS cell, n
      FROM cells
      WHERE n > 2 * (SELECT avg(n) FROM cells)
    ),
    edges AS (
      SELECT a.cell AS src, b.cell AS dst
      FROM core a JOIN core b
        ON b.yc BETWEEN a.yc - 1 AND a.yc + 1
       AND b.xc BETWEEN a.xc - 1 AND a.xc + 1
       AND a.cell <> b.cell
    ),
    reach AS (
      SELECT cell AS node, cell AS lbl FROM core
      UNION
      SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
    ),
    labels AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node)
    SELECT l.cluster_id,
           CAST(count(*) AS BIGINT) AS n_cells,
           CAST(sum(c.n) AS BIGINT) AS n_points
    FROM core c JOIN labels l ON l.node = c.cell
    GROUP BY l.cluster_id
    ORDER BY n_points DESC, cluster_id
    LIMIT 10
    """,
)
def geo_dbscan_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-density spatial clustering — the cell-based DBSCAN variant
    (GriDBSCAN family): core cells are grid cells denser than 2x the
    mean occupied-cell density (adaptive, so the threshold is meaningful
    at every SF), clusters are 8-neighborhood connected components of
    core cells; top-10 clusters by contained points.

    Plan: hotspot aggregation (scan -> hash agg on cell) exactly like
    geo_grid_hotspots; the density gate is a 1-row broadcast; adjacency
    is an EQUI-join — each core cell explodes its 9 neighbor keys and
    joins back on the cell key (never a theta-join over cells); the CC
    runs operators/dedup.py:dup_clusters_alternating (Kiveris
    large-star/small-star — O(log^2 n) rounds on ANY shape, RAISES
    rather than return an unconverged labeling; a long hotspot corridor
    is exactly the high-diameter case that starves min-label's
    O(diameter) rounds) over the BOUNDED core-cell graph. At
    100 TB the raw data appears only in the first aggregate; everything
    after is city-area-bounded. Oracle: recursive-CTE transitive
    closure, the dedup_clusters precedent."""
    from ..operators.dedup import dup_clusters_alternating

    pts = _pts(spark, sf_dir)
    # localCheckpoint: the cell aggregate is city-area-bounded and feeds
    # FOUR downstream subtrees (density avg, core filter, neighbor
    # probes, final labels join) — without it each one re-scans the raw
    # events, which is exactly what this docstring promises not to do
    cells = (
        pts.groupBy(
            F.expr("CAST(floor((lat + 90.0) / 0.01) AS BIGINT)").alias("yc"),
            F.expr("CAST(floor((lon + 180.0) / 0.01) AS BIGINT)").alias("xc"),
        )
        .agg(F.count("*").alias("n"))
        .localCheckpoint()
    )
    avg = cells.agg(F.avg("n").alias("avg_n"))
    core = (
        cells.crossJoin(F.broadcast(avg))
        .where(F.col("n") > 2 * F.col("avg_n"))
        .select(
            "yc", "xc", (F.col("yc") * 100000 + F.col("xc")).alias("cell"), "n"
        )
    )
    offsets = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1) if (dy, dx) != (0, 0)]
    off = F.explode(
        F.array(
            *[
                F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
                for dy, dx in offsets
            ]
        )
    ).alias("o")
    probes = core.select("cell", "yc", "xc", off).select(
        "cell",
        (
            (F.col("yc") + F.col("o.dy")) * 100000
            + (F.col("xc") + F.col("o.dx"))
        ).alias("ncell"),
    )
    pairs = probes.join(
        core.select(F.col("cell").alias("ncell")), "ncell"
    ).select("cell", "ncell")
    labels = dup_clusters_alternating(pairs, id_a="cell", id_b="ncell")
    return (
        core.join(labels, core["cell"] == labels["doc_id"], "left")
        .select(
            F.coalesce(F.col("cluster_id"), F.col("cell")).alias("cluster_id"),
            "n",
        )
        .groupBy("cluster_id")
        .agg(
            F.count("*").cast("long").alias("n_cells"),
            F.sum("n").cast("long").alias("n_points"),
        )
        .orderBy(F.col("n_points").desc(), "cluster_id")
        .limit(10)
    )


# --------------------------------------------------------------------------
# origin-destination flow matrix (top movement corridors)
# --------------------------------------------------------------------------

_OD_CELL_O = geo.cell_expr("plat", "plon", 0.05)
_OD_CELL_D = geo.cell_expr("lat", "lon", 0.05)

@register(
    "geo_od_flows",
    f"""
    WITH pts AS ({_PTS_SQL}),
    hops AS (
      SELECT lat, lon,
             lag(lat) OVER w AS plat,
             lag(lon) OVER w AS plon
      FROM pts
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT {_OD_CELL_O} AS origin_cell,
           {_OD_CELL_D} AS dest_cell,
           CAST(count(*) AS BIGINT) AS n_trips,
           round(avg({geo.haversine_km_expr('plat', 'plon', 'lat', 'lon')})
                 + 0.00000001, 4) AS avg_km
    FROM hops
    WHERE plat IS NOT NULL
    GROUP BY origin_cell, dest_cell
    ORDER BY n_trips DESC, origin_cell, dest_cell
    LIMIT 20
    """,
)
def geo_od_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Origin-destination flow matrix — the top movement corridors
    between 0.05-degree cells, the classic taxi-demand analytic over the
    reference's trip stream (which zone feeds which). Plan: the SAME
    per-user lag shuffle as geo_haversine_speed (one Exchange on the
    trajectory key), then a hash aggregate on the (origin, dest) cell
    pair — the OD key is two bounded integers, so the aggregate state is
    area^2-bounded, not traffic-bounded; TakeOrdered top-20."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    hops = _pts(spark, sf_dir).select(
        "lat",
        "lon",
        F.lag("lat").over(w).alias("plat"),
        F.lag("lon").over(w).alias("plon"),
    )
    km = F.expr(geo.haversine_km_expr("plat", "plon", "lat", "lon"))
    return (
        hops.where(F.col("plat").isNotNull())
        .groupBy(
            F.expr(_OD_CELL_O).alias("origin_cell"),
            F.expr(_OD_CELL_D).alias("dest_cell"),
        )
        .agg(
            F.count("*").cast("long").alias("n_trips"),
            F.round(F.avg(km) + 0.00000001, 4).alias("avg_km"),
        )
        .orderBy(F.col("n_trips").desc(), "origin_cell", "dest_cell")
        .limit(20)
    )
