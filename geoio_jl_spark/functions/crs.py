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
    """EPSG-style code → descriptor (F9). Resolution order: the static
    registry, UTM code patterns, then the WKT2 corpus (30 codes whose
    PROJJSON is schema-validated in tests); unknown codes fall back to a
    plain Cartesian tag (the reference's fallback, gi.jl:63-68)."""
    hit = KNOWN_CRS.get(crs)
    if hit is not None:
        return hit
    utm = _parse_utm(crs)
    if utm is not None:
        return {"kind": "projected", "axis": "xy", "unit": "m",
                "projection": "utm", "zone": utm[0], "south": utm[1]}
    if crs.upper().startswith("EPSG:"):
        try:
            code = int(crs.split(":")[1])
        except ValueError:
            code = None
        if code is not None:
            from geoio_jl_spark.functions.wkt2_corpus import projjson_for
            doc = projjson_for(code)
            if doc is not None:
                if doc["type"] in ("GeographicCRS", "GeodeticCRS"):
                    return {"kind": "geographic", "axis": "latlon",
                            "unit": "degree", "name": doc["name"]}
                method = doc["conversion"]["method"]["name"]
                return {"kind": "projected", "axis": "xy", "unit": "m",
                        "projection": method, "name": doc["name"]}
    return {"kind": "cartesian", "axis": "xy", "unit": "m"}


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


# ---------------------------------------------------------------------------
# Ellipsoidal Mercator (EPSG:3395), Lambert azimuthal equal-area
# (EPSG:3035) and Albers equal-area (EPSG:5070) — Snyder closed forms on
# GRS80/WGS84 (a, e² differ at the cm level; ETRS89/NAD83 treated as
# WGS84-compatible, the standard GIS convention). F15 widening: the
# reference resolves these through PROJ.
# ---------------------------------------------------------------------------

def _merc_fwd(lon, lat):
    phi = np.radians(np.clip(np.asarray(lat, float), -89.9999, 89.9999))
    es = _E * np.sin(phi)
    x = R_WGS84 * np.radians(np.asarray(lon, float))
    y = R_WGS84 * np.log(np.tan(np.pi / 4 + phi / 2)
                         * ((1 - es) / (1 + es)) ** (_E / 2))
    return x, y


def _merc_inv(x, y):
    lon = np.degrees(np.asarray(x, float) / R_WGS84)
    t = np.exp(-np.asarray(y, float) / R_WGS84)
    phi = np.pi / 2 - 2 * np.arctan(t)
    for _ in range(6):
        es = _E * np.sin(phi)
        phi = np.pi / 2 - 2 * np.arctan(t * ((1 - es) / (1 + es)) ** (_E / 2))
    return lon, np.degrees(phi)


def _q_auth(phi):
    s = np.sin(phi)
    return (1 - _E2) * (s / (1 - _E2 * s * s)
                        - np.log((1 - _E * s) / (1 + _E * s)) / (2 * _E))


_QP = float(_q_auth(np.pi / 2))
# authalic → geodetic latitude series (Snyder 3-18)
_AUTH = (_E2 / 3 + 31 * _E2 ** 2 / 180 + 517 * _E2 ** 3 / 5040,
         23 * _E2 ** 2 / 360 + 251 * _E2 ** 3 / 3780,
         761 * _E2 ** 3 / 45360)


def _beta_to_phi(beta):
    return (beta + _AUTH[0] * np.sin(2 * beta)
            + _AUTH[1] * np.sin(4 * beta) + _AUTH[2] * np.sin(6 * beta))


def _m_fn(phi):
    return np.cos(phi) / np.sqrt(1 - _E2 * np.sin(phi) ** 2)


def _laea(lat0: float, lon0: float, fe: float, fn: float):
    """Ellipsoidal oblique LAEA (Snyder 24-2..24-14), e.g. EPSG:3035."""
    phi0 = np.radians(lat0)
    lam0 = np.radians(lon0)
    beta0 = np.arcsin(_q_auth(phi0) / _QP)
    rq = R_WGS84 * np.sqrt(_QP / 2)
    d = R_WGS84 * _m_fn(phi0) / (rq * np.cos(beta0))

    def fwd(lon, lat):
        lam = np.radians(np.asarray(lon, float)) - lam0
        beta = np.arcsin(_q_auth(np.radians(np.asarray(lat, float))) / _QP)
        b = rq * np.sqrt(2 / (1 + np.sin(beta0) * np.sin(beta)
                              + np.cos(beta0) * np.cos(beta) * np.cos(lam)))
        x = fe + b * d * np.cos(beta) * np.sin(lam)
        y = fn + (b / d) * (np.cos(beta0) * np.sin(beta)
                            - np.sin(beta0) * np.cos(beta) * np.cos(lam))
        return x, y

    def inv(x, y):
        xx = (np.asarray(x, float) - fe) / d
        yy = (np.asarray(y, float) - fn) * d
        rho = np.sqrt(xx * xx + yy * yy)
        ce = 2 * np.arcsin(np.clip(rho / (2 * rq), -1, 1))
        with np.errstate(invalid="ignore", divide="ignore"):
            beta = np.arcsin(np.clip(
                np.cos(ce) * np.sin(beta0)
                + np.where(rho == 0, 0.0,
                           yy * np.sin(ce) * np.cos(beta0) / rho), -1, 1))
            lam = np.arctan2(
                xx * np.sin(ce),
                rho * np.cos(beta0) * np.cos(ce)
                - yy * np.sin(beta0) * np.sin(ce))
        return (np.degrees(lam0 + lam), np.degrees(_beta_to_phi(beta)))

    return fwd, inv


def _albers(lat1: float, lat2: float, lat0: float, lon0: float,
            fe: float, fn: float):
    """Ellipsoidal Albers equal-area conic (Snyder 14-1..14-11),
    e.g. EPSG:5070 Conus Albers."""
    p1, p2, p0 = (np.radians(v) for v in (lat1, lat2, lat0))
    lam0 = np.radians(lon0)
    m1, m2 = _m_fn(p1), _m_fn(p2)
    q0, q1, q2 = _q_auth(p0), _q_auth(p1), _q_auth(p2)
    n = (m1 * m1 - m2 * m2) / (q2 - q1)
    c = m1 * m1 + n * q1
    rho0 = R_WGS84 * np.sqrt(c - n * q0) / n

    def fwd(lon, lat):
        q = _q_auth(np.radians(np.asarray(lat, float)))
        rho = R_WGS84 * np.sqrt(c - n * q) / n
        theta = n * (np.radians(np.asarray(lon, float)) - lam0)
        return fe + rho * np.sin(theta), fn + rho0 - rho * np.cos(theta)

    def inv(x, y):
        xx = np.asarray(x, float) - fe
        yy = rho0 - (np.asarray(y, float) - fn)
        rho = np.sqrt(xx * xx + yy * yy)
        theta = np.arctan2(np.sign(n) * xx, np.sign(n) * yy)
        q = (c - (rho * n / R_WGS84) ** 2) / n
        beta = np.arcsin(np.clip(q / _QP, -1, 1))
        return (np.degrees(lam0 + theta / n),
                np.degrees(_beta_to_phi(beta)))

    return fwd, inv


_LAEA_EUROPE = _laea(52.0, 10.0, 4321000.0, 3210000.0)
_CONUS_ALBERS = _albers(29.5, 45.5, 23.0, -96.0, 0.0, 0.0)

for _geo in ("EPSG:4326", "OGC:CRS84", "EPSG:4258", "EPSG:4269"):
    _TRANSFORMS[(_geo, "EPSG:3395")] = _merc_fwd
    _TRANSFORMS[("EPSG:3395", _geo)] = _merc_inv
    _TRANSFORMS[(_geo, "EPSG:3035")] = _LAEA_EUROPE[0]
    _TRANSFORMS[("EPSG:3035", _geo)] = _LAEA_EUROPE[1]
    _TRANSFORMS[(_geo, "EPSG:5070")] = _CONUS_ALBERS[0]
    _TRANSFORMS[("EPSG:5070", _geo)] = _CONUS_ALBERS[1]


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
