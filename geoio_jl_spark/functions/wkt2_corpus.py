"""WKT2 corpus for the PROJJSON differential suite (reference
test/crsstrings.jl:2-69 drives ~55 EPSG codes through wkt2 → PROJJSON →
GDAL diff + JSON-Schema validation; no PROJ/GDAL exists here, so this
module carries WKT2:2019 strings authored from the public EPSG registry
facts, and the tests validate every conversion against the schema
artifact the reference ships, test/artifacts/projjson.schema.json).

``wkt2_for(code)`` → WKT2 string; ``projjson_for(code)`` → PROJJSON dict
(also the GeoParquet footer ``crs`` source — the spec requires PROJJSON).
"""

from __future__ import annotations

from geoio_jl_spark.functions.crsstrings import wkt2_to_projjson

_DEG = 'ANGLEUNIT["degree",0.0174532925199433]'
_M = 'LENGTHUNIT["metre",1]'

# ellipsoid facts (name, semi-major, inverse flattening) — public EPSG
_ELLIPSOIDS = {
    "WGS 84": ("WGS 84", 6378137, 298.257223563, 7030),
    "GRS 1980": ("GRS 1980", 6378137, 298.257222101, 7019),
    "Clarke 1866": ("Clarke 1866", 6378206.4, 294.978698213898, 7008),
    "Airy 1830": ("Airy 1830", 6377563.396, 299.3249646, 7001),
    "Airy Modified 1849": ("Airy Modified 1849", 6377340.189, 299.3249646, 7002),
    "Bessel 1841": ("Bessel 1841", 6377397.155, 299.1528128, 7004),
    "Clarke 1880 (IGN)": ("Clarke 1880 (IGN)", 6378249.2, 293.466021293627, 7011),
    "GRS 1967 Modified": ("GRS 1967 Modified", 6378160, 298.25, 7050),
    "International 1924": ("International 1924", 6378388, 297, 7022),
}


def _ellps(name: str) -> str:
    n, a, rf, code = _ELLIPSOIDS[name]
    return (f'ELLIPSOID["{n}",{a},{rf},{_M},ID["EPSG",{code}]]')


def _geog(name: str, datum: str, ellps: str, code: int,
          datum_code: int) -> str:
    return (
        f'GEOGCRS["{name}",'
        f'DATUM["{datum}",{_ellps(ellps)},ID["EPSG",{datum_code}]],'
        f'CS[ellipsoidal,2],'
        f'AXIS["geodetic latitude (Lat)",north,{_DEG}],'
        f'AXIS["geodetic longitude (Lon)",east,{_DEG}],'
        f'ID["EPSG",{code}]]'
    )


def _param_deg(name: str, value: float, code: int) -> str:
    return f'PARAMETER["{name}",{value},{_DEG},ID["EPSG",{code}]]'


def _param_m(name: str, value: float, code: int) -> str:
    return f'PARAMETER["{name}",{value},{_M},ID["EPSG",{code}]]'


def _param_scale(name: str, value: float, code: int) -> str:
    return (f'PARAMETER["{name}",{value},'
            f'SCALEUNIT["unity",1],ID["EPSG",{code}]]')


def _proj(name: str, base_code: int, conv_name: str, method: str,
          method_code: int, params: list[str], code: int,
          axis: str = "en") -> str:
    base = _GEOG_WKT[base_code]
    # strip the trailing ID[...] and CS[...] of the base for embedding
    bname = base.split('"')[1]
    datum_part = base[base.index("DATUM["):base.index(",CS[")]
    axes = {
        "en": ('AXIS["easting (E)",east,' + _M + "],"
               'AXIS["northing (N)",north,' + _M + "]"),
        "ne": ('AXIS["northing (N)",north,' + _M + "],"
               'AXIS["easting (E)",east,' + _M + "]"),
    }[axis]
    return (
        f'PROJCRS["{name}",'
        f'BASEGEOGCRS["{bname}",{datum_part},ID["EPSG",{base_code}]],'
        f'CONVERSION["{conv_name}",'
        f'METHOD["{method}",ID["EPSG",{method_code}]],'
        + ",".join(params) +
        f'],CS[Cartesian,2],{axes},ID["EPSG",{code}]]'
    )


def _tm(lat0: float, lon0: float, k0: float, fe: float, fn: float) -> list[str]:
    return [
        _param_deg("Latitude of natural origin", lat0, 8801),
        _param_deg("Longitude of natural origin", lon0, 8802),
        _param_scale("Scale factor at natural origin", k0, 8805),
        _param_m("False easting", fe, 8806),
        _param_m("False northing", fn, 8807),
    ]


_GEOG_WKT = {
    4326: _geog("WGS 84", "World Geodetic System 1984", "WGS 84", 4326, 6326),
    4269: _geog("NAD83", "North American Datum 1983", "GRS 1980", 4269, 6269),
    4267: _geog("NAD27", "North American Datum 1927", "Clarke 1866", 4267, 6267),
    4258: _geog("ETRS89", "European Terrestrial Reference System 1989",
                "GRS 1980", 4258, 6258),
    4277: _geog("OSGB36", "Ordnance Survey of Great Britain 1936",
                "Airy 1830", 4277, 6277),
    4171: _geog("RGF93 v1", "Reseau Geodesique Francais 1993 v1",
                "GRS 1980", 4171, 6171),
    4674: _geog("SIRGAS 2000",
                "Sistema de Referencia Geocentrico para las AmericaS 2000",
                "GRS 1980", 4674, 6674),
    4618: _geog("SAD69", "South American Datum 1969",
                "GRS 1967 Modified", 4618, 6618),
    4314: _geog("DHDN", "Deutsches Hauptdreiecksnetz", "Bessel 1841",
                4314, 6314),
    4275: _geog("NTF", "Nouvelle Triangulation Francaise",
                "Clarke 1880 (IGN)", 4275, 6275),
    4230: _geog("ED50", "European Datum 1950", "International 1924",
                4230, 6230),
    4173: _geog("IRENET95", "IRENET95", "GRS 1980", 4173, 6173),
    4272: _geog("NZGD49", "New Zealand Geodetic Datum 1949",
                "International 1924", 4272, 6272),
    4167: _geog("NZGD2000", "New Zealand Geodetic Datum 2000",
                "GRS 1980", 4167, 6167),
    4300: _geog("TM75", "Geodetic Datum of 1965", "Airy Modified 1849",
                4300, 6300),
}

_PROJ_WKT = {
    3857: _proj(
        "WGS 84 / Pseudo-Mercator", 4326, "Popular Visualisation Pseudo-Mercator",
        "Popular Visualisation Pseudo Mercator", 1024,
        [_param_deg("Latitude of natural origin", 0, 8801),
         _param_deg("Longitude of natural origin", 0, 8802),
         _param_m("False easting", 0, 8806),
         _param_m("False northing", 0, 8807)], 3857),
    3395: _proj(
        "WGS 84 / World Mercator", 4326, "World Mercator",
        "Mercator (variant A)", 9804,
        [_param_deg("Latitude of natural origin", 0, 8801),
         _param_deg("Longitude of natural origin", 0, 8802),
         _param_scale("Scale factor at natural origin", 1, 8805),
         _param_m("False easting", 0, 8806),
         _param_m("False northing", 0, 8807)], 3395),
    32601: _proj("WGS 84 / UTM zone 1N", 4326, "UTM zone 1N",
                 "Transverse Mercator", 9807,
                 _tm(0, -177, 0.9996, 500000, 0), 32601),
    32632: _proj("WGS 84 / UTM zone 32N", 4326, "UTM zone 32N",
                 "Transverse Mercator", 9807,
                 _tm(0, 9, 0.9996, 500000, 0), 32632),
    32660: _proj("WGS 84 / UTM zone 60N", 4326, "UTM zone 60N",
                 "Transverse Mercator", 9807,
                 _tm(0, 177, 0.9996, 500000, 0), 32660),
    32733: _proj("WGS 84 / UTM zone 33S", 4326, "UTM zone 33S",
                 "Transverse Mercator", 9807,
                 _tm(0, 15, 0.9996, 500000, 10000000), 32733),
    25832: _proj("ETRS89 / UTM zone 32N", 4258, "UTM zone 32N",
                 "Transverse Mercator", 9807,
                 _tm(0, 9, 0.9996, 500000, 0), 25832),
    27700: _proj("OSGB36 / British National Grid", 4277,
                 "British National Grid", "Transverse Mercator", 9807,
                 _tm(49, -2, 0.9996012717, 400000, -100000), 27700),
    2157: _proj("IRENET95 / Irish Transverse Mercator", 4173,
                "Irish Transverse Mercator", "Transverse Mercator", 9807,
                _tm(53.5, -8, 0.99982, 600000, 750000), 2157),
    29903: _proj("TM75 / Irish Grid", 4300, "Irish Grid",
                 "Transverse Mercator", 9807,
                 _tm(53.5, -8, 1.000035, 200000, 250000), 29903),
    2193: _proj("NZGD2000 / New Zealand Transverse Mercator 2000", 4167,
                "New Zealand Transverse Mercator 2000",
                "Transverse Mercator", 9807,
                _tm(0, 173, 0.9996, 1600000, 10000000), 2193, axis="ne"),
    2180: _proj("ETRF2000-PL / CS92", 4258, "Poland CS92",
                "Transverse Mercator", 9807,
                _tm(0, 19, 0.9993, 500000, -5300000), 2180, axis="ne"),
    3035: _proj(
        "ETRS89-extended / LAEA Europe", 4258, "Europe Equal Area 2001",
        "Lambert Azimuthal Equal Area", 9820,
        [_param_deg("Latitude of natural origin", 52, 8801),
         _param_deg("Longitude of natural origin", 10, 8802),
         _param_m("False easting", 4321000, 8806),
         _param_m("False northing", 3210000, 8807)], 3035, axis="ne"),
    5070: _proj(
        "NAD83 / Conus Albers", 4269, "Conus Albers",
        "Albers Equal Area", 9822,
        [_param_deg("Latitude of false origin", 23, 8821),
         _param_deg("Longitude of false origin", -96, 8822),
         _param_deg("Latitude of 1st standard parallel", 29.5, 8823),
         _param_deg("Latitude of 2nd standard parallel", 45.5, 8824),
         _param_m("Easting at false origin", 0, 8826),
         _param_m("Northing at false origin", 0, 8827)], 5070),
    3310: _proj(
        "NAD83 / California Albers", 4269, "California Albers",
        "Albers Equal Area", 9822,
        [_param_deg("Latitude of false origin", 0, 8821),
         _param_deg("Longitude of false origin", -120, 8822),
         _param_deg("Latitude of 1st standard parallel", 34, 8823),
         _param_deg("Latitude of 2nd standard parallel", 40.5, 8824),
         _param_m("Easting at false origin", 0, 8826),
         _param_m("Northing at false origin", -4000000, 8827)], 3310),
}

WKT2 = {**_GEOG_WKT, **_PROJ_WKT}


def wkt2_for(code: int) -> str:
    return WKT2[code]


def projjson_for(code: int) -> dict | None:
    """EPSG code → PROJJSON document (None when outside the corpus);
    the GeoParquet ``geo`` footer crs source."""
    w = WKT2.get(code)
    return wkt2_to_projjson(w) if w else None
