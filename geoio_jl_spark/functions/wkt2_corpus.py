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
    "Clarke 1858": ("Clarke 1858", 6378293.645208759, 294.26067636926103,
                    7007),
}


def _ellps(name: str) -> str:
    n, a, rf, code = _ELLIPSOIDS[name]
    return (f'ELLIPSOID["{n}",{a},{rf},{_M},ID["EPSG",{code}]]')


def _geog(name: str, datum: str, ellps: str, code: int,
          datum_code: int | None, primem: str = "") -> str:
    """datum_code=None omits the datum ID (modern realizations whose
    datum codes are not confidently reproducible offline — the ID is
    optional in both WKT2 and PROJJSON)."""
    did = f',ID["EPSG",{datum_code}]' if datum_code else ""
    return (
        f'GEOGCRS["{name}",'
        f'DATUM["{datum}",{_ellps(ellps)}{did}],{primem}'
        f'CS[ellipsoidal,2],'
        f'AXIS["geodetic latitude (Lat)",north,{_DEG}],'
        f'AXIS["geodetic longitude (Lon)",east,{_DEG}],'
        f'ID["EPSG",{code}]]'
    )


def _geog3d(name: str, datum: str, ellps: str, code: int,
            datum_code: int | None) -> str:
    did = f',ID["EPSG",{datum_code}]' if datum_code else ""
    return (
        f'GEOGCRS["{name}",'
        f'DATUM["{datum}",{_ellps(ellps)}{did}],'
        f'CS[ellipsoidal,3],'
        f'AXIS["geodetic latitude (Lat)",north,{_DEG}],'
        f'AXIS["geodetic longitude (Lon)",east,{_DEG}],'
        f'AXIS["ellipsoidal height (h)",up,{_M}],'
        f'ID["EPSG",{code}]]'
    )


def _geocentric(name: str, datum: str, ellps: str, code: int,
                datum_code: int | None) -> str:
    did = f',ID["EPSG",{datum_code}]' if datum_code else ""
    return (
        f'GEODCRS["{name}",'
        f'DATUM["{datum}",{_ellps(ellps)}{did}],'
        f'CS[Cartesian,3],'
        f'AXIS["geocentric X (X)",geocentricX,{_M}],'
        f'AXIS["geocentric Y (Y)",geocentricY,{_M}],'
        f'AXIS["geocentric Z (Z)",geocentricZ,{_M}],'
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
    # ---- round-3 corpus growth: the reference's remaining 2D
    # geographic codes (test/crsstrings.jl:2-69). Classic (4xxx) datum
    # ids follow the EPSG crs+2000 rule; modern realizations omit the
    # optional datum id rather than risk a wrong fact. ----
    4207: _geog("Lisbon", "Lisbon 1937", "International 1924", 4207, 6207),
    4208: _geog("Aratu", "Aratu", "International 1924", 4208, 6208),
    4231: _geog("ED87", "European Datum 1987", "International 1924",
                4231, 6231),
    4274: _geog("Datum 73", "Datum 73", "International 1924", 4274, 6274),
    4659: _geog("ISN93", "Islands Net 1993", "GRS 1980", 4659, 6659),
    4666: _geog("Lisbon 1890", "Lisbon 1890", "Bessel 1841", 4666, 6666),
    4668: _geog("ED79", "European Datum 1979", "International 1924",
                4668, 6668),
    4745: _geog("RD/83", "Rauenberg Datum/83", "Bessel 1841", 4745, 6745),
    4746: _geog("PD/83", "Potsdam Datum/83", "Bessel 1841", 4746, 6746),
    5324: _geog("ISN2004", "Islands Net 2004", "GRS 1980", 5324, None),
    5527: _geog("SAD69(96)", "South American Datum 1969(96)",
                "GRS 1967 Modified", 5527, None),
    8086: _geog("ISN2016", "Islands Net 2016", "GRS 1980", 8086, None),
    8232: _geog("NAD83(CSRS96)",
                "North American Datum of 1983 (CSRS96)", "GRS 1980",
                8232, None),
    8237: _geog("NAD83(CSRS)v2",
                "North American Datum of 1983 (CSRS) version 2",
                "GRS 1980", 8237, None),
    8240: _geog("NAD83(CSRS)v3",
                "North American Datum of 1983 (CSRS) version 3",
                "GRS 1980", 8240, None),
    8246: _geog("NAD83(CSRS)v4",
                "North American Datum of 1983 (CSRS) version 4",
                "GRS 1980", 8246, None),
    8249: _geog("NAD83(CSRS)v5",
                "North American Datum of 1983 (CSRS) version 5",
                "GRS 1980", 8249, None),
    8252: _geog("NAD83(CSRS)v6",
                "North American Datum of 1983 (CSRS) version 6",
                "GRS 1980", 8252, None),
    8255: _geog("NAD83(CSRS)v7",
                "North American Datum of 1983 (CSRS) version 7",
                "GRS 1980", 8255, None),
    9777: _geog("RGF93 v2", "Reseau Geodesique Francais 1993 v2",
                "GRS 1980", 9777, None),
    9782: _geog("RGF93 v2b", "Reseau Geodesique Francais 1993 v2b",
                "GRS 1980", 9782, None),
    4283: _geog("GDA94", "Geocentric Datum of Australia 1994",
                "GRS 1980", 4283, 6283),
    4805: _geog("MGI (Ferro)", "Militar-Geographische Institut (Ferro)",
                "Bessel 1841", 4805, 6805,
                primem='PRIMEM["Ferro",-17.66666666666667,'
                       + _DEG + "],"),
    4156: _geog("S-JTSK",
                "System of the Unified Trigonometrical Cadastral Network",
                "Bessel 1841", 4156, 6156),
    4150: _geog("CH1903+", "CH1903+", "Bessel 1841", 4150, 6150),
    4149: _geog("CH1903", "CH1903", "Bessel 1841", 4149, 6149),
    4289: _geog("Amersfoort", "Amersfoort", "Bessel 1841", 4289, 6289),
    # geocentric / 3D members of the reference list
    4988: _geocentric("ISN93", "Islands Net 1993", "GRS 1980", 4988, 6659),
    4989: _geog3d("ISN93", "Islands Net 1993", "GRS 1980", 4989, 6659),
    9988: _geocentric("ITRF2020",
                      "International Terrestrial Reference Frame 2020",
                      "GRS 1980", 9988, None),
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
    28355: _proj("GDA94 / MGA zone 55", 4283, "Map Grid of Australia zone 55",
                 "Transverse Mercator", 9807,
                 _tm(0, 147, 0.9996, 500000, 10000000), 28355),
    # ---- oblique families (round 4) — the European national grids the
    # r3 verdict ranked first among missing projections ----
    5514: _proj(
        "S-JTSK / Krovak East North", 4156, "Krovak East North (Greenwich)",
        "Krovak (North Orientated)", 1041,
        [_param_deg("Latitude of projection centre", 49.5, 8811),
         _param_deg("Longitude of origin", 24.833333333333332, 8833),
         _param_deg("Co-latitude of cone axis", 30.28813975277778, 1036),
         _param_deg("Latitude of pseudo standard parallel", 78.5, 8818),
         _param_scale("Scale factor on pseudo standard parallel",
                      0.9999, 8819),
         _param_m("False easting", 0, 8806),
         _param_m("False northing", 0, 8807)], 5514),
    2056: _proj(
        "CH1903+ / LV95", 4150, "Swiss Oblique Mercator 1995",
        "Hotine Oblique Mercator (variant B)", 9815,
        [_param_deg("Latitude of projection centre",
                    46.952405555555565, 8811),
         _param_deg("Longitude of projection centre",
                    7.4395833333333345, 8812),
         _param_deg("Azimuth at projection centre", 90, 8813),
         _param_deg("Angle from Rectified to Skew Grid", 90, 8814),
         _param_scale("Scale factor at projection centre", 1, 8815),
         _param_m("Easting at projection centre", 2600000, 8816),
         _param_m("Northing at projection centre", 1200000, 8817)], 2056),
    21781: _proj(
        "CH1903 / LV03", 4149, "Swiss Oblique Mercator 1903M",
        "Hotine Oblique Mercator (variant B)", 9815,
        [_param_deg("Latitude of projection centre",
                    46.952405555555565, 8811),
         _param_deg("Longitude of projection centre",
                    7.4395833333333345, 8812),
         _param_deg("Azimuth at projection centre", 90, 8813),
         _param_deg("Angle from Rectified to Skew Grid", 90, 8814),
         _param_scale("Scale factor at projection centre", 1, 8815),
         _param_m("Easting at projection centre", 600000, 8816),
         _param_m("Northing at projection centre", 200000, 8817)], 21781),
    29101: _proj(
        "SAD69 / Brazil Polyconic", 4618, "Brazil Polyconic",
        "American Polyconic", 9818,
        [_param_deg("Latitude of natural origin", 0, 8801),
         _param_deg("Longitude of natural origin", -54, 8802),
         _param_m("False easting", 5000000, 8806),
         _param_m("False northing", 10000000, 8807)], 29101),
    4087: _proj(
        "WGS 84 / World Equidistant Cylindrical", 4326,
        "World Equidistant Cylindrical", "Equidistant Cylindrical", 1028,
        [_param_deg("Latitude of 1st standard parallel", 0, 8823),
         _param_deg("Longitude of natural origin", 0, 8802),
         _param_m("False easting", 0, 8806),
         _param_m("False northing", 0, 8807)], 4087),
    28992: _proj(
        "Amersfoort / RD New", 4289, "RD New",
        "Oblique Stereographic", 9809,
        [_param_deg("Latitude of natural origin",
                    52.15616055555555, 8801),
         _param_deg("Longitude of natural origin",
                    5.38763888888889, 8802),
         _param_scale("Scale factor at natural origin", 0.9999079, 8805),
         _param_m("False easting", 155000, 8806),
         _param_m("False northing", 463000, 8807)], 28992),
    # ESRI:54008 World Sinusoidal (the Sinusoidal method has no EPSG
    # method code — ESRI/PROJ only — so the METHOD node carries no ID
    # and the CRS ID authority is ESRI)
    54008: (
        'PROJCRS["World_Sinusoidal",'
        'BASEGEOGCRS["WGS 84",DATUM["World Geodetic System 1984",'
        + _ellps("WGS 84") + ',ID["EPSG",6326]],ID["EPSG",4326]],'
        'CONVERSION["World_Sinusoidal",METHOD["Sinusoidal"],'
        + _param_deg("Longitude of natural origin", 0, 8802) + ","
        + _param_m("False easting", 0, 8806) + ","
        + _param_m("False northing", 0, 8807) +
        '],CS[Cartesian,2],'
        'AXIS["easting (E)",east,' + _M + "],"
        'AXIS["northing (N)",north,' + _M + "],"
        'ID["ESRI",54008]]'
    ),
}

# ---- special-feature codes from the reference list (crsstrings.jl:58-63):
# 2986 exercises axis.meridian (polar CRS), 3407 non-metre units with
# conversion_factor, 31288 base_crs.datum.prime_meridian. ----

_CLARKE_FT = 'LENGTHUNIT["Clarke\'s foot",0.3047972654]'

_PROJ_WKT[2986] = (
    'PROJCRS["Terre Adelie 1950 / Terre Adelie Polar Stereographic",'
    'BASEGEOGCRS["Terre Adelie 1950",'
    'DATUM["Pointe Geologie Perroud 1950",'
    + _ellps("International 1924") + ',ID["EPSG",6637]],'
    'ID["EPSG",4637]],'
    'CONVERSION["Terre Adelie Polar Stereographic",'
    'METHOD["Polar Stereographic (variant C)",ID["EPSG",9830]],'
    + _param_deg("Latitude of standard parallel", -67, 8832) + ","
    + _param_deg("Longitude of origin", 140, 8833) + ","
    + _param_m("Easting at false origin", 300000, 8826) + ","
    + _param_m("Northing at false origin", 200000, 8827) +
    '],CS[Cartesian,2],'
    'AXIS["easting (X)",north,MERIDIAN[230,' + _DEG + '],' + _M + '],'
    'AXIS["northing (Y)",north,MERIDIAN[140,' + _DEG + '],' + _M + '],'
    'ID["EPSG",2986]]'
)

_PROJ_WKT[3407] = (
    'PROJCRS["Hong Kong 1963 Grid System",'
    'BASEGEOGCRS["Hong Kong 1963",'
    'DATUM["Hong Kong 1963",' + _ellps("Clarke 1858") + '],'
    'ID["EPSG",4738]],'
    'CONVERSION["Hong Kong 1963 Grid",'
    'METHOD["Cassini-Soldner",ID["EPSG",9806]],'
    + _param_deg("Latitude of natural origin", 22.31213333333334, 8801) + ","
    + _param_deg("Longitude of natural origin", 114.1785555555556, 8802) + ","
    + 'PARAMETER["False easting",132033.92,' + _CLARKE_FT
    + ',ID["EPSG",8806]],'
    + 'PARAMETER["False northing",62565.96,' + _CLARKE_FT
    + ',ID["EPSG",8807]]'
    '],CS[Cartesian,2],'
    'AXIS["easting (E)",east,' + _CLARKE_FT + '],'
    'AXIS["northing (N)",north,' + _CLARKE_FT + '],'
    'ID["EPSG",3407]]'
)

_PROJ_WKT[31288] = (
    'PROJCRS["MGI (Ferro) / M31",'
    'BASEGEOGCRS["MGI (Ferro)",'
    'DATUM["Militar-Geographische Institut (Ferro)",'
    + _ellps("Bessel 1841") + ',ID["EPSG",6805]],'
    'PRIMEM["Ferro",-17.66666666666667,' + _DEG + '],'
    'ID["EPSG",4805]],'
    'CONVERSION["Austria Gauss-Kruger M31",'
    'METHOD["Transverse Mercator",ID["EPSG",9807]],'
    + ",".join(_tm(0, 31, 1.0, 450000, 0)) +
    '],CS[Cartesian,2],'
    'AXIS["northing (X)",north,' + _M + '],'
    'AXIS["easting (Y)",east,' + _M + '],'
    'ID["EPSG",31288]]'
)

WKT2 = {**_GEOG_WKT, **_PROJ_WKT}


def wkt2_for(code: int) -> str:
    return WKT2[code]


def projjson_for(code: int) -> dict | None:
    """EPSG code → PROJJSON document (None when outside the corpus);
    the GeoParquet ``geo`` footer crs source."""
    w = WKT2.get(code)
    return wkt2_to_projjson(w) if w else None
