"""Cross-engine SQL snippets shared by the Spark queries and the DuckDB oracle.

The driver contract (``/root/repo/__spark_entry__.py``) compares each Spark
query against an ANSI-SQL oracle run by DuckDB, hashing values
order-insensitively.  To make that comparison *exact* (not approximate), every
derived quantity in an oracle-checked query is built from snippets defined
here once and rendered into both dialects.  Rules:

- integer arithmetic only where possible (products kept < 2**62 so Spark's
  ANSI mode never overflows);
- ``floor(x / c.0)`` for integer division (identical in both engines for
  non-negative x < 2**53);
- doubles only where both engines perform the *same* IEEE operations in the
  *same* order (element-wise ops, left folds);
- DECIMAL(38,10) for summed monetary/real aggregates (order-independent).

The geometry derivations mirror the reference's fixture shapes
(/root/reference/test/data, see FIXTURES.md): points on a centidegree
lattice, convex polygons (triangles) around seeded centers
(cf. GeoIO.jl src/conversion/gi.jl:99-109 polygon construction).
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Deterministic point derivation from a row id (centidegrees, non-negative).
# lon_i in [0, 36000)  ~ lon = lon_i/100 - 180
# lat_i in [0, 17000)  ~ lat = lat_i/100 - 85
# A skewed variant sends 30% of rows into 3 "hot" cells (web-scale geotag
# skew: cities >> oceans), exercising the salting path (BASELINE.json:14).
# ---------------------------------------------------------------------------

LON_I = "(({id} * 48271) % 36000)"
LAT_I = "(({id} * 69621) % 17000)"

# Hot-cell injection: rows with id % 10 in (0,1,2) collapse onto 3 centers.
LON_I_SKEW = (
    "(CASE WHEN ({id} % 10) = 0 THEN 8050 + ({id} % 97) "
    "WHEN ({id} % 10) = 1 THEN 20050 + ({id} % 89) "
    "WHEN ({id} % 10) = 2 THEN 31050 + ({id} % 83) "
    "ELSE (({id} * 48271) % 36000) END)"
)
LAT_I_SKEW = (
    "(CASE WHEN ({id} % 10) = 0 THEN 4050 + ({id} % 79) "
    "WHEN ({id} % 10) = 1 THEN 9050 + ({id} % 73) "
    "WHEN ({id} % 10) = 2 THEN 13050 + ({id} % 71) "
    "ELSE (({id} * 69621) % 17000) END)"
)

# ---------------------------------------------------------------------------
# Cell index (H3/S2 analog, pure int64 arithmetic — SURVEY.md §2.4 J4).
# Resolution r: cell edge = 100 * 2**(5-r) centidegrees (r=5 → 1 degree).
# cell_id packs (resolution, cx, cy) so ids are unique across resolutions.
# ---------------------------------------------------------------------------

def cell_edge_centideg(res: int) -> int:
    """Cell edge length in centidegrees at resolution ``res`` (0..5)."""
    return 100 * (2 ** (5 - res))


def cell_id_sql(lon_i: str, lat_i: str, res: int) -> str:
    """cell_id = res*2^40 + cx*2^20 + cy   (identical Spark / DuckDB)."""
    e = cell_edge_centideg(res)
    return (
        f"({res} * 1099511627776 + "
        f"CAST(floor({lon_i} / {e}.0) AS BIGINT) * 1048576 + "
        f"CAST(floor({lat_i} / {e}.0) AS BIGINT))"
    )


_Z_SPREADS = [(8, 0x00FF00FF00FF00FF), (4, 0x0F0F0F0F0F0F0F0F),
              (2, 0x3333333333333333), (1, 0x5555555555555555)]


def zorder_sql(i_expr: str, j_expr: str, dialect: str) -> str:
    """Morton interleave of two 16-bit coords — identical arithmetic in
    both dialects (Spark: shiftleft(); DuckDB: <<)."""
    shl = (lambda x, n: f"shiftleft({x}, {n})") if dialect == "spark" \
        else (lambda x, n: f"(({x}) << {n})")

    def spread(e: str) -> str:
        out = f"(CAST({e} AS BIGINT) & 65535)"
        for s, m in _Z_SPREADS:
            out = f"(({out} | {shl(out, s)}) & {m})"
        return out

    return f"({spread(i_expr)} | {shl(spread(j_expr), 1)})"


# ---------------------------------------------------------------------------
# Polygon (triangle) derivation from nation.n_nationkey — integer vertices on
# the centidegree lattice, CCW orientation.  Used as the polygon side of the
# flagship point-in-polygon join (reference R-tree analog gpkg.jl:411-448).
# ---------------------------------------------------------------------------

TRI_CX = "((n_nationkey * 1117) % 33000 + 1500)"
TRI_CY = "((n_nationkey * 2339) % 14000 + 1500)"
TRI_W = "(((n_nationkey % 5) + 3) * 300)"
TRI_H = "(((n_nationkey % 7) + 3) * 300)"

# Vertices: A=(cx-w, cy-h), B=(cx+w, cy-h), C=(cx, cy+h)  (CCW).
TRIANGLES_SQL = (
    "SELECT n_nationkey AS poly_id, "
    f"{TRI_CX} - {TRI_W} AS ax, {TRI_CY} - {TRI_H} AS ay, "
    f"{TRI_CX} + {TRI_W} AS bx, {TRI_CY} - {TRI_H} AS by, "
    f"{TRI_CX} AS cx, {TRI_CY} + {TRI_H} AS cy "
    "FROM nation"
)


def point_in_triangle_sql(px: str, py: str) -> str:
    """Inclusive point-in-convex-CCW-triangle via three cross-product sign
    tests — exact int64 arithmetic (values < 2**32, products < 2**62)."""
    return (
        f"((bx - ax) * ({py} - ay) - (by - ay) * ({px} - ax)) >= 0 AND "
        f"((cx - bx) * ({py} - by) - (cy - by) * ({px} - bx)) >= 0 AND "
        f"((ax - cx) * ({py} - cy) - (ay - cy) * ({px} - cx)) >= 0"
    )


# ---------------------------------------------------------------------------
# Portable string->int64 hash: first 15 hex chars of md5 (< 2**60, positive).
# The one snippet that needs per-dialect rendering.
# ---------------------------------------------------------------------------

def md5_int60(expr: str, dialect: str) -> str:
    if dialect == "spark":
        return f"CAST(conv(substring(md5({expr}), 1, 15), 16, 10) AS BIGINT)"
    if dialect == "duckdb":
        return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"
    raise ValueError(f"unknown dialect: {dialect}")


# MinHash parameters (shared by operators/dedup.py and the oracle SQL).
MINHASH_P = 2147483647  # 2**31 - 1 (prime); a*h+b stays < 2**62
MINHASH_SEEDS = [(7919 * (j + 1) % MINHASH_P, 104729 * (j + 1) % MINHASH_P)
                 for j in range(16)]
MINHASH_BANDS = 4  # 4 bands x 4 rows

# Tokenization shared by text ops: non-empty whitespace-split tokens.
def tokens_sql(expr: str, dialect: str) -> str:
    if dialect == "spark":
        return f"filter(split({expr}, '\\\\s+'), x -> x != '')"
    if dialect == "duckdb":
        return f"list_filter(string_split_regex({expr}, '\\s+'), x -> x != '')"
    raise ValueError(f"unknown dialect: {dialect}")


# ---------------------------------------------------------------------------
# Geohash (round 6) — classic base-32 interleaved-bit cell key.  The
# centidegree lattice makes the bin indices exact integer arithmetic:
#   lon in [-180, 180) <- lon_i/100 - 180, so (lon+180)/360 = lon_i/36000
#   lat in [ -85,  85) <- lat_i/100 -  85, so (lat+90)/180 = (lat_i+500)/18000
# Bin products stay < 2**53, so floor(x / c.0) is the identical IEEE op in
# both engines (module rules above).  Geohash interleaving: even stream
# bits (0-based, MSB first) come from longitude, odd from latitude;
# each base-32 digit is 5 stream bits.
# ---------------------------------------------------------------------------

GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_idx_sql(lon_i: str, lat_i: str, precision: int
                    ) -> tuple[str, str, int, int]:
    """(lon_idx_sql, lat_idx_sql, nlon_bits, nlat_bits)."""
    nbits = 5 * precision
    nlon = (nbits + 1) // 2
    nlat = nbits // 2
    lon_idx = (f"CAST(floor((CAST(({lon_i}) AS BIGINT) * {1 << nlon})"
               " / 36000.0) AS BIGINT)")
    lat_idx = (f"CAST(floor((CAST((({lat_i}) + 500) AS BIGINT)"
               f" * {1 << nlat}) / 18000.0) AS BIGINT)")
    return lon_idx, lat_idx, nlon, nlat


def geohash_sql(lon_idx_col: str, lat_idx_col: str, precision: int) -> str:
    """Base-32 geohash string from hoisted bin-index columns (hoist the
    :func:`geohash_idx_sql` expressions first — they are referenced
    once per bit here)."""
    nbits = 5 * precision
    nlon = (nbits + 1) // 2
    nlat = nbits // 2
    digits = []
    for d in range(precision):
        terms = []
        for m in range(5):
            j = 5 * d + m                      # stream bit, MSB first
            if j % 2 == 0:
                src, shift = lon_idx_col, nlon - 1 - j // 2
            else:
                src, shift = lat_idx_col, nlat - 1 - (j - 1) // 2
            bit = (f"(CAST(floor(({src}) / {float(1 << shift)}) AS BIGINT)"
                   f" % 2)") if shift else f"(({src}) % 2)"
            terms.append(f"{bit} * {1 << (4 - m)}" if m < 4 else bit)
        digit = " + ".join(terms)
        digits.append(
            f"substring('{GEOHASH_ALPHABET}', CAST(({digit}) AS INT) + 1, 1)")
    return " || ".join(digits)
