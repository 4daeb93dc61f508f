"""Arbitrary CRS *input* resolution (F9 breadth — the reference accepts
any EPSG/ESRI code, WKT1/WKT2 string, or PROJJSON via PROJ,
src/conversion/gi.jl:63-68 and src/extra/gpkg.jl:163-182; no PROJ exists
here, so inputs are normalized to PROJJSON with the from-scratch parser
and dispatched onto the engine's closed-form projection families).

``projjson_from_any`` accepts:
- a PROJJSON dict or JSON string,
- a WKT2 string (PROJCRS / GEOGCRS / GEODCRS),
- an ESRI/OGC WKT1 string (PROJCS / GEOGCS — the .prj file dialect).

``transform_from_projjson`` maps a ProjectedCRS document onto a
(forward, inverse) numpy pair for the supported method families:
Transverse Mercator, Mercator (A/B + spherical pseudo-Mercator), LAEA,
Albers, Lambert Conformal Conic (1SP/2SP), Polar Stereographic (A/B),
Robinson.  Anything else raises ``UnsupportedProjectionError`` naming
the method, never a silent fallback.

Datum note: like every closed-form (non-gridshift) implementation, the
geographic side of a transform is the CRS's own datum; datum shifts are
identity (the standard GIS convention when PROJ grids are absent).
"""

from __future__ import annotations

import json
import re

from geoio_jl_spark.functions.crsstrings import parse_wkt2, wkt2_to_projjson

_DEG_RAD = 0.017453292519943295


# Every projection-method spelling the dispatcher in
# _projjson_transform accepts (EPSG names, ESRI WKT1 aliases, common
# shorthands), normalized through _norm.  Kept next to the error class
# so the coverage table in docs/PROJECTIONS.md, the error message, and
# the nearest-family hint all read from one list.  The reference
# reaches every projection via PROJ (src/extra/gis.jl:29-38); this
# engine's closed-form families cover the methods behind the vast
# majority of real EPSG codes (all UTM/Gauss-Krüger zones, State Plane,
# Web/W3984 Mercator, the European LCC/LAEA grids, polar products,
# the national oblique grids) — an exotic code outside them fails fast
# here with the closest supported family named.
SUPPORTED_METHOD_SPELLINGS = (
    "transversemercator", "gausskruger", "transversemercatorsouthorientated",
    "popularvisualisationpseudomercator", "mercatorauxiliarysphere",
    "mercatorvarianta", "mercator1sp", "mercator",
    "mercatorvariantb", "mercator2sp",
    "lambertazimuthalequalarea",
    "albersequalarea", "albersconicequalarea", "albers",
    "lambertconicconformal2sp", "lambertconformalconic2sp",
    "lambertconformalconic", "lambertconicconformal1sp",
    "polarstereographicvarianta", "polarstereographic",
    "polarstereographicvariantb", "polarstereographicvariantc",
    "cassinisoldner", "cassini",
    "modifiedazimuthalequidistant", "azimuthalequidistant",
    "robinson",
    "americanpolyconic", "polyconic",
    "equidistantcylindrical", "equirectangular",
    "equidistantcylindricalspherical", "platecarree",
    "obliquestereographic", "doublestereographic",
    "hotineobliquemercatorvarianta", "hotineobliquemercator",
    "hotineobliquemercatorvariantb", "obliquemercator",
    "rectifiedskeworthomorphic",
    "hotineobliquemercatorazimuthnaturalorigin",
    "rectifiedskeworthomorphicnaturalorigin",
    "hotineobliquemercatorazimuthcenter",
    "rectifiedskeworthomorphiccenter",
    "krovak", "krovaknorthorientated", "krovakeastnorth",
    "orthographic", "sinusoidal", "sansonflamsteed",
)


class UnsupportedProjectionError(ValueError):
    def __init__(self, method: str):
        import difflib
        norm = re.sub(r"[^a-z0-9]", "", method.lower())
        close = difflib.get_close_matches(
            norm, SUPPORTED_METHOD_SPELLINGS, n=1, cutoff=0.6)
        hint = (f"; nearest supported family: {close[0]!r} — if this is "
                f"a spelling/variant of it, pass that method name"
                if close else "")
        super().__init__(
            f"projection method {method!r} has no closed-form transform "
            f"in this engine (supported families: Transverse Mercator "
            f"(+South Orientated), Mercator A/B, Pseudo-Mercator, LAEA, "
            f"Albers, LCC 1SP/2SP, Polar Stereographic A/B/C, "
            f"Cassini-Soldner, (Modified) Azimuthal Equidistant, "
            f"Equidistant Cylindrical / Plate Carrée, Polyconic, "
            f"Robinson, Oblique Stereographic, Hotine Oblique Mercator "
            f"A/B / RSO, Krovak (+North Orientated), Orthographic, "
            f"Sinusoidal — full table: docs/PROJECTIONS.md)"
            f"{hint}")
        self.method = method
        self.nearest = close[0] if close else None


def _norm(name: str) -> str:
    return re.sub(r"[^a-z0-9]", "", name.lower())


# ---------------------------------------------------------------------------
# WKT1 (.prj dialect) → PROJJSON normal form
# ---------------------------------------------------------------------------

def _wkt1_id(node) -> dict | None:
    """WKT1 AUTHORITY["EPSG","27700"] → PROJJSON id object."""
    auth = node.child("AUTHORITY")
    if auth is None:
        return None
    code = auth.args[1]
    try:
        code = int(code)
    except (TypeError, ValueError):
        pass
    return {"authority": str(auth.args[0]), "code": code}


def _wkt1_geogcs_json(node) -> dict:
    datum = node.child("DATUM")
    sph = datum.child("SPHEROID") or datum.child("ELLIPSOID")
    ell = {"name": sph.args[0], "semi_major_axis": sph.args[1]}
    if sph.args[2] == 0:
        ell["radius"] = sph.args[1]
        del ell["semi_major_axis"]
    else:
        ell["inverse_flattening"] = sph.args[2]
    out = {
        "type": "GeographicCRS",
        "name": node.args[0],
        "datum": {"type": "GeodeticReferenceFrame",
                  "name": datum.args[0], "ellipsoid": ell},
    }
    pm = node.child("PRIMEM")
    if pm is not None and float(pm.args[1]) != 0.0:
        out["datum"]["prime_meridian"] = {
            "name": pm.args[0], "longitude": pm.args[1]}
    if _wkt1_id(node):
        out["id"] = _wkt1_id(node)
    return out


def _wkt1_projcs_json(node) -> dict:
    base = _wkt1_geogcs_json(node.child("GEOGCS"))
    proj = node.child("PROJECTION")
    unit = node.child("UNIT")
    to_m = float(unit.args[1]) if unit is not None else 1.0
    params = []
    for p in node.children("PARAMETER"):
        name = p.args[0]
        value = float(p.args[1])
        # WKT1 convention: linear params in the PROJCS unit, angles in
        # degrees.  Normalize lengths to metres here.
        if _norm(name) in _LINEAR_PARAMS:
            params.append({"name": name, "value": value * to_m,
                           "unit": "metre"})
        else:
            params.append({"name": name, "value": value, "unit": "degree"})
    out = {
        "type": "ProjectedCRS",
        "name": node.args[0],
        "base_crs": base,
        "conversion": {
            "name": proj.args[0],
            "method": {"name": proj.args[0]},
            "parameters": params,
        },
    }
    if _wkt1_id(node):
        out["id"] = _wkt1_id(node)
    return out


_LINEAR_PARAMS = {
    "falseeasting", "falsenorthing", "eastingatfalseorigin",
    "northingatfalseorigin", "eastingatprojectioncentre",
    "northingatprojectioncentre",
}


def projjson_from_any(crs) -> dict:
    """dict / JSON / WKT2 / WKT1 → PROJJSON document."""
    if isinstance(crs, dict):
        return crs
    s = crs.strip()
    if s.startswith("{"):
        return json.loads(s)
    node = parse_wkt2(s)
    if node.keyword == "PROJCS":          # WKT1 projected
        return _wkt1_projcs_json(node)
    if node.keyword == "GEOGCS":          # WKT1 geographic
        return _wkt1_geogcs_json(node)
    return wkt2_to_projjson(node)


def is_geographic_doc(doc: dict) -> bool:
    return doc.get("type") in ("GeographicCRS", "GeodeticCRS")


# ---------------------------------------------------------------------------
# ProjectedCRS PROJJSON → (fwd, inv)
# ---------------------------------------------------------------------------

def _param_value(p: dict, kind: str) -> float:
    """Parameter value normalized to degrees (angles) / metres (lengths).
    Handles grads/feet/etc. via the unit's conversion_factor (the exact
    reason reference code 3407 — Clarke's-foot units — is in the test
    corpus)."""
    v = float(p["value"])
    unit = p.get("unit", "metre")
    if isinstance(unit, dict):
        factor = float(unit.get("conversion_factor", 1.0))
        if kind == "angle":
            return v * factor / _DEG_RAD
        return v * factor
    if unit == "degree" or kind == "angle":
        return v
    return v


def _params_dict(doc: dict) -> dict[str, float]:
    out = {}
    for p in doc["conversion"].get("parameters", []):
        key = _norm(p["name"])
        kind = "length" if key in _LINEAR_PARAMS else "angle"
        if key in ("scalefactoratnaturalorigin", "scalefactor",
                   "scalefactoronpseudostandardparallel",
                   "scalefactoratprojectioncentre",
                   "scalefactoroninitialline"):
            kind = "scale"
            out[key] = float(p["value"])
            continue
        out[key] = _param_value(p, kind)
    return out


def _get(params: dict, names: list[str], default: float = 0.0) -> float:
    for n in names:
        if n in params:
            return params[n]
    return default


def _ellipsoid_of(doc: dict):
    from geoio_jl_spark.functions.crs import Ellipsoid
    base = doc.get("base_crs", doc)
    datum = base.get("datum") or base.get("datum_ensemble")
    ell = datum["ellipsoid"]
    if "radius" in ell:
        return Ellipsoid(float(ell["radius"]), 0.0)
    return Ellipsoid(float(ell["semi_major_axis"]),
                     float(ell["inverse_flattening"]))


_LAT0 = ["latitudeofnaturalorigin", "latitudeoforigin",
         "latitudeoffalseorigin", "latitudeofcenter",
         "latitudeofprojectioncentre"]
_LON0 = ["longitudeofnaturalorigin", "centralmeridian",
         "longitudeoffalseorigin", "longitudeofcenter",
         "longitudeofprojectioncentre", "longitudeoforigin"]
_K0 = ["scalefactoratnaturalorigin", "scalefactor",
       "scalefactoratprojectioncentre", "scalefactoroninitialline",
       "scalefactoronpseudostandardparallel"]
_AZ = ["azimuthatprojectioncentre", "azimuthofinitialline", "azimuth"]
_GAMMA = ["anglefromrectifiedtoskewgrid", "anglefromrectifiedtoskewedgrid",
          "rectifiedgridangle", "xyplanerotation"]
_FE = ["falseeasting", "eastingatfalseorigin",
       "eastingatprojectioncentre"]
_FN = ["falsenorthing", "northingatfalseorigin",
       "northingatprojectioncentre"]
_LAT1 = ["latitudeof1ststandardparallel", "standardparallel1"]
_LAT2 = ["latitudeof2ndstandardparallel", "standardparallel2"]
_LATTS = ["latitudeofstandardparallel"]


def transform_from_projjson(doc: dict):
    """ProjectedCRS document → (fwd, inv) closed-form pair."""
    from geoio_jl_spark.functions import crs as C

    if doc.get("type") != "ProjectedCRS":
        raise ValueError(f"not a ProjectedCRS: {doc.get('type')}")
    method = doc["conversion"]["method"]["name"]
    m = _norm(method)
    p = _params_dict(doc)
    ell = _ellipsoid_of(doc)
    lat0 = _get(p, _LAT0)
    lon0 = _get(p, _LON0)
    # non-Greenwich base prime meridian (e.g. MGI (Ferro) / M31,
    # EPSG:31288): the conversion's longitudes are relative to it, while
    # engine input longitudes are Greenwich-based
    base = doc.get("base_crs", {})
    datum = base.get("datum") or base.get("datum_ensemble") or {}
    pm = datum.get("prime_meridian")
    if pm is not None:
        lon0 += float(pm.get("longitude", 0.0))
    k0 = _get(p, _K0, 1.0)
    fe, fn = _get(p, _FE), _get(p, _FN)

    if m in ("transversemercator", "gausskruger"):
        return C.tm_projection(lat0, lon0, k0, fe, fn, ell)
    if m in ("transversemercatorsouthorientated",):
        # EPSG method 9808: axes point WEST and SOUTH (SA Lo grids).
        # W = FE − k0·ν·A…, S = FN − k0·(M − M0)… — i.e. the plain TM
        # offsets NEGATED relative to the false origin (EPSG Guidance
        # Note 7-2 §3.2.2); Lo29 (28.2E, 25.7S) → positive (W, S).
        f0, i0 = C.tm_projection(lat0, lon0, k0, 0.0, 0.0, ell)

        def fwd(lon, lat):
            x, y = f0(lon, lat)
            return fe - x, fn - y

        def inv(w, s):
            import numpy as np
            return i0(fe - np.asarray(w, float), fn - np.asarray(s, float))

        return fwd, inv
    if m in ("popularvisualisationpseudomercator",
             "mercatorauxiliarysphere"):
        sph = C.Ellipsoid(ell.a, 0.0)  # spherical formulas on a
        return C.mercator_projection(lon0, 1.0, fe, fn, sph)
    if m in ("mercatorvarianta", "mercator1sp", "mercator"):
        return C.mercator_projection(lon0, k0, fe, fn, ell)
    if m in ("mercatorvariantb", "mercator2sp"):
        import numpy as np
        ts = np.radians(_get(p, _LATTS + _LAT1))
        k_ts = float(np.cos(ts) / np.sqrt(1 - ell.e2 * np.sin(ts) ** 2))
        return C.mercator_projection(lon0, k_ts, fe, fn, ell)
    if m in ("lambertazimuthalequalarea",):
        return C._laea(lat0, lon0, fe, fn, ell)
    if m in ("albersequalarea", "albersconicequalarea", "albers"):
        return C._albers(_get(p, _LAT1), _get(p, _LAT2), lat0, lon0,
                         fe, fn, ell)
    if m in ("lambertconicconformal2sp", "lambertconformalconic2sp",
             "lambertconformalconic"):
        lat1 = _get(p, _LAT1, lat0)
        lat2 = _get(p, _LAT2, lat1)
        return C.lcc_projection(lat1, lat2, lat0, lon0, fe, fn, ell)
    if m in ("lambertconicconformal1sp",):
        # 1SP: standard parallel = natural origin; k0 scales the cone —
        # fold k0 into the radius (Snyder 15-4 with k0)
        scaled = C.Ellipsoid(ell.a * k0, 1.0 / ell.f if ell.f else 0.0)
        return C.lcc_projection(lat0, lat0, lat0, lon0, fe, fn, scaled)
    if m in ("polarstereographicvarianta", "polarstereographic"):
        return C.polar_stereographic("A", lat0 if lat0 else 90.0, lon0,
                                     k0, fe, fn, ell)
    if m in ("polarstereographicvariantb",):
        ts = _get(p, _LATTS + _LAT1 + _LAT0, 90.0)
        lon_o = _get(p, ["longitudeoforigin"] + _LON0)
        return C.polar_stereographic("B", ts, lon_o, 1.0, fe, fn, ell)
    if m in ("polarstereographicvariantc",):
        ts = _get(p, _LATTS + _LAT1 + _LAT0, 90.0)
        lon_o = _get(p, ["longitudeoforigin"] + _LON0)
        return C.polar_stereographic("C", ts, lon_o, 1.0, fe, fn, ell)
    if m in ("cassinisoldner", "cassini"):
        return C.cassini_soldner(lat0, lon0, fe, fn, ell)
    if m in ("modifiedazimuthalequidistant", "azimuthalequidistant"):
        return C.modified_azimuthal_equidistant(lat0, lon0, fe, fn, ell)
    if m in ("robinson",):
        return C.robinson_projection(lon0, fe, fn, ell.a)
    if m in ("americanpolyconic", "polyconic"):
        return C.polyconic(lat0, lon0, fe, fn, ell)
    if m in ("equidistantcylindrical", "equirectangular"):
        return C.equidistant_cylindrical(
            _get(p, _LAT1 + _LATTS, lat0), lon0, fe, fn, ell)
    if m in ("equidistantcylindricalspherical", "platecarree"):
        return C.equidistant_cylindrical(
            _get(p, _LAT1 + _LATTS, lat0), lon0, fe, fn, ell,
            spherical=True)
    if m in ("obliquestereographic", "doublestereographic"):
        return C.oblique_stereographic(lat0, lon0, k0, fe, fn, ell)
    if m in ("hotineobliquemercatorvarianta", "hotineobliquemercator",
             "hotineobliquemercatorvariantb", "obliquemercator",
             "rectifiedskeworthomorphic",
             # ESRI WKT1 spellings: "natural origin" = variant A
             # (FE/FN at the natural origin), "azimuth center" = B
             "hotineobliquemercatorazimuthnaturalorigin",
             "rectifiedskeworthomorphicnaturalorigin",
             "hotineobliquemercatorazimuthcenter",
             "rectifiedskeworthomorphiccenter"):
        az = _get(p, _AZ, 90.0)
        gamma = _get(p, _GAMMA, az)
        variant = ("A" if m in ("hotineobliquemercatorvarianta",
                                "hotineobliquemercatorazimuthnaturalorigin",
                                "rectifiedskeworthomorphicnaturalorigin")
                   else "B")
        return C.hotine_oblique_mercator(lat0, lon0, az, gamma, k0,
                                         fe, fn, ell, variant)
    if m in ("krovak", "krovaknorthorientated", "krovakeastnorth"):
        # all real Krovak grids share the cone axis / pseudo parallel;
        # defaults are the EPSG registry values for S-JTSK.  ESRI WKT1
        # spells the parallel "Pseudo_Standard_Parallel_1".
        az = _get(p, ["colatitudeofconeaxis"] + _AZ, 30.28813975277778)
        lat1 = _get(p, ["latitudeofpseudostandardparallel",
                        "pseudostandardparallel1"], 78.5)
        return C.krovak(lat0, lon0, az, lat1, k0, fe, fn, ell,
                        north_orientated=(m != "krovak"))
    if m in ("orthographic",):
        return C.orthographic(lat0, lon0, fe, fn, ell)
    if m in ("sinusoidal", "sansonflamsteed"):
        return C.sinusoidal(lon0, fe, fn, ell)
    raise UnsupportedProjectionError(method)
