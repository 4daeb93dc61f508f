"""Geohash differential tests: the dialect's integer-arithmetic bit
formula vs an independent textbook interval-halving encoder."""

import duckdb
import numpy as np

from geoio_jl_spark import dialect as D

_ALPHA = "0123456789bcdefghjkmnpqrstuvwxyz"


def _reference_geohash(lat: float, lon: float, precision: int) -> str:
    """Classic interval-halving encoder (test-only, no shared code)."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits, even, out = 0, True, []
    ch = 0
    while len(out) < precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                ch = (ch << 1) | 1
                lon_lo = mid
            else:
                ch <<= 1
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                ch = (ch << 1) | 1
                lat_lo = mid
            else:
                ch <<= 1
                lat_hi = mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(_ALPHA[ch])
            bits, ch = 0, 0
    return "".join(out)


def _formula_geohash(lon_i: int, lat_i: int, precision: int) -> str:
    lon_idx, lat_idx, _, _ = D.geohash_idx_sql(str(lon_i), str(lat_i),
                                               precision)
    gh = D.geohash_sql(lon_idx, lat_idx, precision)
    return duckdb.sql(f"SELECT {gh} AS g").fetchone()[0]


def test_formula_matches_reference_on_lattice():
    rng = np.random.default_rng(21)
    for _ in range(60):
        lon_i = int(rng.integers(0, 36000))
        lat_i = int(rng.integers(0, 17000))
        lon = lon_i / 100.0 - 180.0
        lat = lat_i / 100.0 - 85.0
        for p in (1, 4, 6, 8):
            assert _formula_geohash(lon_i, lat_i, p) == \
                _reference_geohash(lat, lon, p), (lon_i, lat_i, p)


def test_known_city_value():
    # Copenhagen-ish: lat 57.64, lon 10.40 on the centidegree lattice
    lon_i, lat_i = 19040, 14264
    assert (_formula_geohash(lon_i, lat_i, 6)
            == _reference_geohash(57.64, 10.40, 6))


def test_prefix_property():
    """A geohash at precision p is a prefix of the same point at p+k —
    the property every geo-sharding scheme relies on."""
    rng = np.random.default_rng(22)
    for _ in range(20):
        lon_i = int(rng.integers(0, 36000))
        lat_i = int(rng.integers(0, 17000))
        g8 = _formula_geohash(lon_i, lat_i, 8)
        for p in (2, 4, 6):
            assert _formula_geohash(lon_i, lat_i, p) == g8[:p]


def test_spark_oracle_agreement(spark):
    """Same expression through Spark's evaluator (F.expr) vs DuckDB."""
    from pyspark.sql import functions as F
    rng = np.random.default_rng(23)
    rows = [(int(rng.integers(0, 36000)), int(rng.integers(0, 17000)))
            for _ in range(100)]
    lon_idx, lat_idx, _, _ = D.geohash_idx_sql("lon_i", "lat_i", 6)
    gh = D.geohash_sql("lon_idx", "lat_idx", 6)
    df = (spark.createDataFrame(rows, ["lon_i", "lat_i"])
          .withColumn("lon_idx", F.expr(lon_idx))
          .withColumn("lat_idx", F.expr(lat_idx))
          .select("lon_i", "lat_i", F.expr(gh).alias("g")))
    for r in df.collect():
        assert r["g"] == _formula_geohash(r["lon_i"], r["lat_i"], 6)