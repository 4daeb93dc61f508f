"""F14 — CF ``grid_mapping`` ↔ CRS descriptor (reference cdm.jl:220-306,
ellipsoid table cdm.jl:155-166).

The reference maps CF grid-mapping attribute sets to typed
CoordRefSystems types. This engine has no typed CRS universe, so the
round-trippable unit is a descriptor dict: ``{"type": ..., "datum": ...,
params...}``. ``gm_to_crs`` / ``crs_to_gm`` are exact inverses for the
five grid mappings the reference supports; ``crs_code`` additionally
resolves descriptors onto the EPSG registry codes the rest of the
engine keys on (4326, 326xx/327xx UTM) when one exists.
"""

from __future__ import annotations

import numpy as np

# CF ellipsoid name → datum (cdm.jl:155-166; the reference's comment cites
# https://raw.githubusercontent.com/wiki/cf-convention/cf-conventions/csv/ellipsoid.csv)
ELLIP2DATUM = {
    "WGS 84": "WGS84Latest",
    "GRS 1980": "ITRFLatest",
    "Airy 1830": "OSGB36",
    "Airy Modified 1849": "Ire65",
    "Bessel 1841": "Hermannskogel",
    "International 1924": "NZGD1949",
    "Clarke 1880 (IGN)": "Carthage",
    "GRS 1967 Modified": "SAD69",
}
DATUM2ELLIP = {v: k for k, v in ELLIP2DATUM.items()}


def _scalar(attrs: dict, name: str, default: float = 0.0) -> float:
    v = attrs.get(name)
    if v is None:
        return default
    return float(np.asarray(v).ravel()[0])


def gm_to_crs(attrs: dict) -> dict | None:
    """CF grid-mapping attribute dict → CRS descriptor (_gm2crs,
    cdm.jl:222-280). Unknown grid_mapping_name → None, matching the
    reference's fallthrough."""
    name = attrs.get("grid_mapping_name")
    datum = ELLIP2DATUM.get(attrs.get("reference_ellipsoid_name", "WGS 84"),
                            "WGS84Latest")
    shift = {
        "lon_o": _scalar(attrs, "longitude_of_central_meridian"),
        "x_o": _scalar(attrs, "false_easting"),
        "y_o": _scalar(attrs, "false_northing"),
    }
    if name == "latitude_longitude":
        return {"type": "LatLon", "datum": datum}
    if name == "lambert_cylindrical_equal_area":
        if "standard_parallel" in attrs:
            lat_ts = _scalar(attrs, "standard_parallel")
        else:
            lat_ts = _scalar(attrs, "scale_factor_at_projection_origin")
        return {"type": "EqualAreaCylindrical", "datum": datum,
                "lat_ts": lat_ts, **shift}
    if name == "mercator":
        return {"type": "Mercator", "datum": datum, **shift}
    if name == "orthographic":
        return {"type": "Orthographic", "datum": datum,
                "lat_o": _scalar(attrs, "latitude_of_projection_origin"),
                **shift}
    if name == "sinusoidal":
        d = {"type": "Sinusoidal", "datum": datum, **shift}
        # MODIS files carry a spherical earth_radius (6371007.181)
        # instead of a reference ellipsoid name
        if "earth_radius" in attrs:
            d["radius"] = _scalar(attrs, "earth_radius")
        return d
    if name == "transverse_mercator":
        return {"type": "TransverseMercator", "datum": datum,
                "k_0": _scalar(attrs, "scale_factor_at_central_meridian"),
                "lat_o": _scalar(attrs, "latitude_of_projection_origin"),
                **shift}
    return None


def crs_to_gm(desc: dict) -> dict | None:
    """CRS descriptor → CF grid-mapping attributes (_crsattribs,
    cdm.jl:282-306). Inverse of gm_to_crs."""
    t = desc.get("type")
    ellip = DATUM2ELLIP.get(desc.get("datum", "WGS84Latest"), "WGS 84")
    shift = {
        "longitude_of_central_meridian": desc.get("lon_o", 0.0),
        "false_easting": desc.get("x_o", 0.0),
        "false_northing": desc.get("y_o", 0.0),
    }
    if t == "LatLon":
        return {"grid_mapping_name": "latitude_longitude",
                "reference_ellipsoid_name": ellip}
    if t == "EqualAreaCylindrical":
        return {"grid_mapping_name": "lambert_cylindrical_equal_area",
                "reference_ellipsoid_name": ellip,
                "standard_parallel": desc["lat_ts"], **shift}
    if t == "Mercator":
        return {"grid_mapping_name": "mercator",
                "reference_ellipsoid_name": ellip, **shift}
    if t == "Orthographic":
        return {"grid_mapping_name": "orthographic",
                "reference_ellipsoid_name": ellip,
                "latitude_of_projection_origin": desc["lat_o"], **shift}
    if t == "Sinusoidal":
        out = {"grid_mapping_name": "sinusoidal", **shift}
        if "radius" in desc:
            out["earth_radius"] = desc["radius"]
        else:
            out["reference_ellipsoid_name"] = ellip
        return out
    if t == "TransverseMercator":
        return {"grid_mapping_name": "transverse_mercator",
                "reference_ellipsoid_name": ellip,
                "scale_factor_at_central_meridian": desc["k_0"],
                "latitude_of_projection_origin": desc["lat_o"], **shift}
    return None


def crs_code(desc: dict | None) -> str | None:
    """Descriptor → EPSG code where the registry has one: geographic
    WGS84 → EPSG:4326; standard UTM TransverseMercator → EPSG:326xx/327xx
    (the codes functions/crs.py transforms accept)."""
    if desc is None:
        return None
    if desc["type"] == "LatLon":
        return "EPSG:4326" if desc["datum"] == "WGS84Latest" else None
    if (desc["type"] == "TransverseMercator"
            and desc.get("k_0") == 0.9996
            and desc.get("lat_o") == 0.0
            and desc.get("x_o") == 500000.0
            and desc.get("y_o") in (0.0, 10000000.0)):
        lon = desc.get("lon_o", 0.0)
        zone = (lon + 183.0) / 6.0
        if zone == int(zone) and 1 <= zone <= 60:
            south = desc["y_o"] == 10000000.0
            return f"EPSG:{(32700 if south else 32600) + int(zone)}"
    return None


# descriptor types resolvable straight onto the closed-form projection
# families (consumed by functions/crs._resolve_side, which makes any
# CF-loaded grid's descriptor a first-class get_transform side — the
# round-5 "CF orthographic end-to-end" wiring)
DESC_TYPES = ("LatLon", "Mercator", "Orthographic", "Sinusoidal",
              "TransverseMercator")


def _desc_ellipsoid(desc: dict):
    from geoio_jl_spark.functions.crs import Ellipsoid
    if "radius" in desc:
        return Ellipsoid(float(desc["radius"]), 0.0)
    from geoio_jl_spark.functions.wkt2_corpus import _ELLIPSOIDS
    name = DATUM2ELLIP.get(desc.get("datum", "WGS84Latest"), "WGS 84")
    _n, a, rf, _code = _ELLIPSOIDS.get(name, _ELLIPSOIDS["WGS 84"])
    return Ellipsoid(float(a), float(rf))


def transform_from_descriptor(desc: dict):
    """CF CRS descriptor → ('geographic', None) | ('projected',
    (fwd, inv)) | None.  The bridge from a grid_mapping loaded out of a
    NetCDF/HDF5 file to the reprojection engine: a MODIS sinusoidal or
    an orthographic grid can be warped without ever minting a WKT
    string for it."""
    from geoio_jl_spark.functions import crs as C
    t = desc.get("type")
    if t not in DESC_TYPES:
        return None
    if t == "LatLon":
        return ("geographic", None)
    ell = _desc_ellipsoid(desc)
    lon0 = float(desc.get("lon_o", 0.0))
    fe = float(desc.get("x_o", 0.0))
    fn = float(desc.get("y_o", 0.0))
    if t == "Mercator":
        return ("projected", C.mercator_projection(lon0, 1.0, fe, fn, ell))
    if t == "Orthographic":
        return ("projected", C.orthographic(
            float(desc.get("lat_o", 0.0)), lon0, fe, fn, ell))
    if t == "Sinusoidal":
        return ("projected", C.sinusoidal(lon0, fe, fn, ell))
    if t == "TransverseMercator":
        return ("projected", C.tm_projection(
            float(desc.get("lat_o", 0.0)), lon0,
            float(desc.get("k_0", 1.0)), fe, fn, ell))
    return None
