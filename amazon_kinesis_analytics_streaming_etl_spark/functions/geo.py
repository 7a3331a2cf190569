"""Geospatial column expressions — haversine distance, geohash encoding,
grid-cell keys — as ENGINE-NEUTRAL SQL expression builders.

Every helper here returns a SQL string (not a Column): the same text is
compiled by Spark (``F.expr``) and by the DuckDB oracle, so the engines
evaluate bit-identical IEEE-754 expression trees and the driver's
value-hash compare holds without per-engine fudging. Both engines parse
the shared operator subset used here (``+ - * / % & | << >>``, ``sin cos
asin sqrt radians floor pow round substr concat``).

All geometry is JVM-side builtin arithmetic once Spark compiles the
expression — no UDFs, fully codegen'd, scales linearly with the scan.

Geohash follows the public algorithm (Niemeyer 2008; see the Wikipedia
"Geohash" reference implementation): normalize lon/lat to [0,1), take the
top ``5*chars/2`` bits of each, interleave starting with longitude, then
emit 5-bit groups through the base32 alphabet
``0123456789bcdefghjkmnpqrstuvwxyz``.
"""

from __future__ import annotations

GEOHASH_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"

#: Synthetic-coordinate box (NYC-ish) used by the plans/geo.py queries to
#: derive deterministic lat/lon from event ids: both engines compute the
#: same md5-uniform, so the points are reproducible and oracle-replayable.
LAT0, LAT_SPAN = 40.50, 0.40
LON0, LON_SPAN = -74.25, 0.50


def u32_expr(key_sql: str, start: int = 1) -> str:
    """md5-derived uniform in [0,1) from 8 hex chars of ``md5(key_sql)``.

    ``start`` picks the hex window (1, 9, 17, or 25) so one 32-hex md5
    yields up to four independent uniforms. Spark ``conv(x,16,10)`` and DuckDB
    ``('0x'||x)::bigint`` agree; the Spark side uses this exact text via
    a tiny rewrite in :func:`spark_expr` (DuckDB's ``::`` cast is not
    Spark syntax, so the one non-shared token is centralized here).

    The hash integer is cast to DOUBLE *before* the division (r12): both
    engines parse ``4294967296.0`` as a DECIMAL literal, so the bare
    ``bigint / literal`` quotient — and every lat/lon/bound/weight
    derived from it — was evaluated in decimal arithmetic (Spark:
    decimal(36,13) columns, decimal(37,14) casts at every comparison),
    which is both materially slower per row than double math and a
    truncated 12-13-digit approximation rather than the exact value.
    ``k / 2^32`` with k < 2^53 is exactly representable in IEEE-754
    double, the division is exact, and double +,*,floor are the same
    operation in both engines — so the module's bit-identical-trees
    contract now holds in the type the docstring always promised, and
    the Python float recipe in plans/geo.py:_poi_coords is literally
    the same arithmetic. Shared-text change: Spark and the DuckDB
    oracle flip together (re-gated at sf0.001/0.01/0.1, all consumers).
    """
    return (
        f"(CAST(CAST(('0x' || substr(md5({key_sql}), {start}, 8)) AS BIGINT)"
        " AS DOUBLE) / 4294967296.0)"
    )


def spark_expr(sql: str) -> str:
    """Rewrite the one DuckDB-only construct (hex-literal cast) into the
    Spark equivalent (``conv(hex,16,10)``), leaving everything else —
    which is shared syntax — untouched.

    The close paren of ``('0x' || <hex>)`` is found by balanced-paren
    scan, NOT by searching for the next ``) AS BIGINT)`` — a key_sql
    that itself contains ``CAST(... AS BIGINT)`` (e.g. a composite cell
    key) would otherwise mis-splice into invalid Spark SQL."""
    marker = "('0x' || "
    out = sql
    while marker in out:
        i = out.index(marker)
        depth, j = 1, i + len(marker)
        while depth:
            if out[j] == "(":
                depth += 1
            elif out[j] == ")":
                depth -= 1
            j += 1
        inner = out[i + len(marker) : j - 1]
        out = out[:i] + f"conv({inner}, 16, 10)" + out[j:]
    return out


def lat_expr(key_sql: str) -> str:
    """Deterministic latitude in [LAT0, LAT0+LAT_SPAN) from a key."""
    return f"({LAT0} + {LAT_SPAN} * {u32_expr(key_sql, 1)})"


def lon_expr(key_sql: str) -> str:
    """Deterministic longitude in [LON0, LON0+LON_SPAN) from a key."""
    return f"({LON0} + {LON_SPAN} * {u32_expr(key_sql, 9)})"


def haversine_km_expr(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """Great-circle distance (km), mean earth radius 6371.0088 km.

    Identical operand order in both engines keeps the IEEE result
    bit-equal; callers still round before hashing per repo convention.
    """
    return (
        "(6371.0088 * 2 * asin(sqrt("
        f"pow(sin((radians({lat2}) - radians({lat1})) / 2), 2)"
        f" + cos(radians({lat1})) * cos(radians({lat2}))"
        f" * pow(sin((radians({lon2}) - radians({lon1})) / 2), 2)"
        ")))"
    )


def lon_bits_expr(lon: str, chars: int = 6) -> str:
    """Top ``5*chars/2`` bits of the normalized longitude as an integer.
    The ``least`` clamp keeps the exact domain edge (lon = 180) in the
    top cell instead of overflowing one bit past the interleave width."""
    nbits = 5 * chars // 2
    return (
        f"CAST(least(floor((({lon}) + 180.0) / 360.0 * {1 << nbits}),"
        f" {(1 << nbits) - 1}) AS BIGINT)"
    )


def lat_bits_expr(lat: str, chars: int = 6) -> str:
    """Top ``5*chars/2`` bits of the normalized latitude as an integer.
    Clamped like :func:`lon_bits_expr` so lat = 90 stays in the top cell
    (without it the pole wrapped to the -90 cell)."""
    nbits = 5 * chars // 2
    return (
        f"CAST(least(floor((({lat}) + 90.0) / 180.0 * {1 << nbits}),"
        f" {(1 << nbits) - 1}) AS BIGINT)"
    )


def interleave_expr(x: str, y: str, chars: int = 6) -> str:
    """Bit-interleave PRE-PROJECTED axis integers ``x``/``y`` (see
    :func:`lon_bits_expr` / :func:`lat_bits_expr`; pass simple column
    names — the interleave references each axis ``5*chars/2`` times, so
    inlining the axis math would blow up the expression tree) into the
    ``5*chars``-bit geohash integer. Even output bits (from the MSB) are
    longitude: with k the bit index from the LSB of each axis, lon bit k
    lands at position 2k+1 and lat bit k at 2k."""
    if chars % 2 != 0:
        raise ValueError("geohash interleave supports even precision only")
    nbits = 5 * chars // 2  # bits per axis
    terms = []
    for k in range(nbits):
        terms.append(f"(((({x}) >> {k}) & 1) << {2 * k + 1})")
        terms.append(f"(((({y}) >> {k}) & 1) << {2 * k})")
    return "(" + " + ".join(terms) + ")"


def geohash_chars_expr(g: str, chars: int = 6) -> str:
    """Base32 string from a PRE-PROJECTED interleaved integer ``g`` (a
    simple column name; the lookup references it once per character).
    Pure integer arithmetic + ``substr`` alphabet lookup — compiles to
    one whole-stage-codegen expression per row, no UDF, no join; a
    100 TB scan pays only the scan."""
    total = 5 * chars
    parts = [
        f"substr('{GEOHASH_BASE32}', CAST(((({g}) >> {total - 5 * (i + 1)}) & 31)"
        " AS INT) + 1, 1)"
        for i in range(chars)
    ]
    return "concat(" + ", ".join(parts) + ")"


def cell_expr(lat: str, lon: str, cell_deg: float) -> str:
    """Coarse integer grid-cell key ``(y_cell * 100000 + x_cell)`` at
    ``cell_deg`` resolution — the bucketing key for hotspot aggregation
    and the equi-join prefilter of the cell-bucketed spatial join."""
    ydim = f"CAST(floor((({lat}) + 90.0) / {cell_deg}) AS BIGINT)"
    xdim = f"CAST(floor((({lon}) + 180.0) / {cell_deg}) AS BIGINT)"
    return f"({ydim} * 100000 + {xdim})"
