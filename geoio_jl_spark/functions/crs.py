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

# ---------------------------------------------------------------------------
# Transverse Mercator (UTM) — Krüger series on the WGS84 ellipsoid
# (the reference's Projected/UTM family, resolved via PROJ there; here a
# from-scratch 3rd-order-in-n series, sub-mm over a UTM zone)
# ---------------------------------------------------------------------------

_F = 1.0 / 298.257223563
_E2 = _F * (2.0 - _F)
_E = np.sqrt(_E2)
_N = _F / (2.0 - _F)
_A_BAR = R_WGS84 / (1.0 + _N) * (1.0 + _N ** 2 / 4.0 + _N ** 4 / 64.0)
_K0 = 0.9996
_ALPHA = [
    _N / 2.0 - 2.0 * _N ** 2 / 3.0 + 5.0 * _N ** 3 / 16.0,
    13.0 * _N ** 2 / 48.0 - 3.0 * _N ** 3 / 5.0,
    61.0 * _N ** 3 / 240.0,
]
_BETA = [
    _N / 2.0 - 2.0 * _N ** 2 / 3.0 + 37.0 * _N ** 3 / 96.0,
    _N ** 2 / 48.0 + _N ** 3 / 15.0,
    17.0 * _N ** 3 / 480.0,
]
_DELTA = [
    2.0 * _N - 2.0 * _N ** 2 / 3.0 - 2.0 * _N ** 3,
    7.0 * _N ** 2 / 3.0 - 8.0 * _N ** 3 / 5.0,
    56.0 * _N ** 3 / 15.0,
]


def _lonlat_to_utm(zone: int, south: bool):
    lon0 = np.radians(zone * 6.0 - 183.0)

    def fwd(lon: np.ndarray, lat: np.ndarray):
        lam = np.radians(np.asarray(lon, float)) - lon0
        phi = np.radians(np.asarray(lat, float))
        s = np.sin(phi)
        t = np.sinh(np.arctanh(s) - _E * np.arctanh(_E * s))
        xi_p = np.arctan2(t, np.cos(lam))
        eta_p = np.arcsinh(np.sin(lam) / np.sqrt(t * t + np.cos(lam) ** 2))
        xi, eta = xi_p.copy(), eta_p.copy()
        for j, a in enumerate(_ALPHA, start=1):
            xi += a * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
            eta += a * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
        E = 500000.0 + _K0 * _A_BAR * eta
        Nn = _K0 * _A_BAR * xi + (10000000.0 if south else 0.0)
        return E, Nn

    return fwd


def _utm_to_lonlat(zone: int, south: bool):
    lon0 = np.radians(zone * 6.0 - 183.0)

    def inv(E: np.ndarray, Nn: np.ndarray):
        xi = (np.asarray(Nn, float) - (10000000.0 if south else 0.0)) / (_K0 * _A_BAR)
        eta = (np.asarray(E, float) - 500000.0) / (_K0 * _A_BAR)
        xi_p, eta_p = xi.copy(), eta.copy()
        for j, b in enumerate(_BETA, start=1):
            xi_p -= b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
            eta_p -= b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
        chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
        phi = chi.copy()
        for j, d in enumerate(_DELTA, start=1):
            phi += d * np.sin(2 * j * chi)
        lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
        return np.degrees(lam + lon0), np.degrees(phi)

    return inv


def _parse_utm(crs: str):
    """EPSG:326xx (north) / EPSG:327xx (south) → (zone, south)."""
    if not crs.startswith("EPSG:"):
        return None
    try:
        code = int(crs.split(":")[1])
    except ValueError:
        return None
    if 32601 <= code <= 32660:
        return code - 32600, False
    if 32701 <= code <= 32760:
        return code - 32700, True
    return None


def get_transform(src: str, dst: str):
    if src == dst:
        return lambda a, b: (a, b)
    fn = _TRANSFORMS.get((src, dst))
    if fn is not None:
        return fn
    geographic = ("EPSG:4326", "OGC:CRS84")
    utm = _parse_utm(dst)
    if src in geographic and utm is not None:
        return _lonlat_to_utm(*utm)
    utm = _parse_utm(src)
    if utm is not None and dst in geographic:
        return _utm_to_lonlat(*utm)
    raise ValueError(f"no transform registered for {src} -> {dst}")


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
