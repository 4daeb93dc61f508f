"""Reference-fixture parity suite: every file in
/root/reference/test/data is loaded through sources/registry.load and
checked against the expectations the reference's own tests assert
(test/io/*.jl, test/runtests.jl:31-64). This anchors every from-scratch
codec to real files rather than self-round-trips.

Unsupported files are xfailed with a named reason so the coverage map
stays honest.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from geoio_jl_spark.functions import wkb as W
from geoio_jl_spark.sources import netcdf3, registry

DATA = "/root/reference/test/data"

# extra kwargs per fixture (the reference passes the same ones:
# csv.jl:3,12,22 coords; netcdf.jl:16 x/y/t)
KWARGS = {
    "points.csv": dict(coords=("x", "y")),
    "latlon.csv": dict(coords=("lat", "lon")),
    "missingcoords.csv": dict(coords=("x", "y")),
    "test_kw.nc": dict(x="lon_x", y="lat_y", t="time_t"),
}

# not loadable, with the honest reason
XFAIL: dict[str, str] = {}

# too slow for the blanket loader (2.16M-pixel Python JPEG decode +
# Spark frame); covered by tests/test_jpeg.py instead
SLOW_SKIP = {"image.jpg"}

SIDE_CAR = {".dbf", ".shx", ".prj", ".sbn", ".sbx", ".xml"}


def _fixtures():
    for f in sorted(os.listdir(DATA)):
        if os.path.splitext(f)[1].lower() in SIDE_CAR:
            continue
        yield f


def _load(spark, fname):
    return registry.load(spark, os.path.join(DATA, fname),
                         **KWARGS.get(fname, {}))


def _xy(wkb_bytes):
    g = W.decode_wkb(bytes(wkb_bytes))
    while g.geoms:
        g = g.geoms[0]
    return float(g.coords[0][0]), float(g.coords[0][1])


@pytest.mark.parametrize("fname", list(_fixtures()))
def test_fixture_loads(spark, fname):
    """Blanket check: every reference fixture parses to rows > 0."""
    if fname in XFAIL:
        pytest.xfail(XFAIL[fname])
    if fname in SLOW_SKIP:
        pytest.skip("covered by the dedicated codec suite")
    out = _load(spark, fname)
    if isinstance(out, tuple):
        assert out[0].count() > 0
        assert out[1].count() > 0
    else:
        assert out.count() > 0


# -- cross-format differential: the points/lines/polygons tables exist in
#    csv/geojson/gpkg/shp/parquet; all must agree (io/*.jl all assert the
#    same 5 rows) -------------------------------------------------------------

POINTS_TRUTH = {  # points.csv is the plain-text ground truth
    1: (0.0, 0.0, 0.07336635446929285, "word1"),
    2: (1.0, 1.1, 0.34924148955718615, "word2"),
    3: (2.0, 2.2, 0.6988266836914685, "word3"),
    4: (3.0, 3.3, 0.6282647403425017, "word4"),
    5: (4.0, 4.4, 0.9149290036628314, "word5"),
}


@pytest.mark.parametrize("fname,gcol", [
    ("points.csv", "geometry"), ("points.geojson", "geometry"),
    ("points.gpkg", "geom"), ("points.shp", "geometry"),
    ("points.parquet", "geometry"), ("points_latlon.parquet", "geometry"),
])
def test_points_cross_format(spark, fname, gcol):
    df = _load(spark, fname)
    rows = df.collect()
    assert len(rows) == 5
    for r in rows:
        x, y, var, name = POINTS_TRUTH[int(r["code"])]
        assert r["name"] == name
        assert abs(r["variable"] - var) < 1e-12 or \
            abs(r["variable"] - var) < 1e-6  # dbf text precision
        # GeoParquet WKB is always easting/northing order even for a
        # LatLon CRS (spec §encoding) — no F3 flip inside the file
        gx, gy = _xy(r[gcol])
        assert abs(gx - x) < 1e-9 and abs(gy - y) < 1e-9


@pytest.mark.parametrize("base", ["lines", "polygons"])
def test_lines_polygons_cross_format(spark, base):
    counts, attrs = {}, {}
    for ext, gcol in [("geojson", "geometry"), ("gpkg", "geom"),
                      ("shp", "geometry"), ("parquet", "geometry")]:
        df = _load(spark, f"{base}.{ext}")
        rows = sorted(df.collect(), key=lambda r: r["code"])
        counts[ext] = len(rows)
        attrs[ext] = [(r["code"], r["name"], round(r["variable"], 6))
                      for r in rows]
        assert all(r[gcol] is not None for r in rows)
    assert all(c == 5 for c in counts.values()), counts
    assert len(set(map(tuple, attrs.values()))) == 1  # identical attributes


# -- hard attribute anchors from the reference's shapefile tests -------------

def test_zone_shp_values(spark):
    """io/shapefile.jl:41-50 exact attribute vectors."""
    df = _load(spark, "zone.shp")
    rows = sorted(df.collect(), key=lambda r: r["PERIMETER"])
    assert [r["PERIMETER"] for r in rows] == [
        5.850803650776888e6, 7.096124186552936e6, 9.539471535859613e6,
        1.01743436941e7]
    byz = {r["MACROZONA"]: r for r in rows}
    assert byz["Estuario"]["ACRES"] == 3.23144676827e7
    assert byz["Estuario"]["Hectares"] == 1.30772011078e7
    assert byz["Estuario"]["area_m2"] == 1.30772011078e11
    assert set(byz) == {"Estuario", "Fronteiras Antigas",
                        "Fronteiras Intermediarias", "Fronteiras Novas"}


def test_path_shp_values(spark):
    """io/shapefile.jl:32-38: ZONA column, 6 rows, order preserved."""
    df = _load(spark, "path.shp")
    assert [r["ZONA"] for r in df.collect()] == [
        "PA 150", "BR 364", "BR 163", "BR 230", "BR 010", "Estuarina PA"]


def test_land_shp_values(spark):
    """io/shapefile.jl:52-60."""
    df = _load(spark, "land.shp")
    rows = df.collect()
    assert len(rows) == 127
    assert all(r["featurecla"] == "Land" for r in rows)
    assert all(r["scalerank"] in (0, 1) for r in rows)
    assert all(r["min_zoom"] in (0.0, 0.5, 1.0, 1.5) for r in rows)


def test_issue158_loadvalues(spark):
    """io/shapefile.jl:66-74: 2 rows, 1 with missing geometry."""
    path = os.path.join(DATA, "issue158.shp")
    tb = registry.loadvalues(spark, path)
    assert [r["SA22023__2"] for r in tb.collect()] == [
        "Putaruru Rural", "Oceanic Kermadec Islands"]
    inv = registry.loadvalues(spark, path, rows="invalid")
    assert [r["SA22023__2"] for r in inv.collect()] == [
        "Oceanic Kermadec Islands"]
    with pytest.raises(ValueError):
        registry.loadvalues(spark, path, rows="incorrect")


def test_missingcoords_csv(spark):
    """io/csv.jl:11-19: rows 1,3,5 of points.csv survive."""
    df = _load(spark, "missingcoords.csv")
    assert sorted(r["code"] for r in df.collect()) == [1, 3, 5]


# -- NetCDF-4/HDF5 fixtures (io/netcdf.jl:3-52) -------------------------------

@pytest.mark.parametrize("fname", [
    "test.nc", "test_data.nc", "test_kw.nc", "test_latlon.nc",
    "test_latlon_itrf.nc", "test_utm_north_32.nc"])
def test_netcdf_fixture_grid(spark, fname):
    """121 grid vertices, tempanomaly time-series of length 100."""
    df = _load(spark, fname)
    rows = df.collect()
    assert len(rows) == 121
    assert all(len(r["tempanomaly"]) == 100 for r in rows)
    if fname == "test_data.nc":  # timeless Float64 variable (netcdf.jl:23-31)
        assert all(isinstance(r["data"], float) for r in rows)


def test_netcdf_crs_f14(spark):
    """F14 grid_mapping → CRS: io/netcdf.jl:33-52 datum/type asserts."""
    desc, code = netcdf3.read_crs(os.path.join(DATA, "test_latlon.nc"))
    assert desc == {"type": "LatLon", "datum": "WGS84Latest"}
    assert code == "EPSG:4326"
    desc, _ = netcdf3.read_crs(os.path.join(DATA, "test_latlon_itrf.nc"))
    assert desc["datum"] == "ITRFLatest"  # GRS 1980 → ITRF (cdm.jl:155-166)
    desc, code = netcdf3.read_crs(os.path.join(DATA, "test_utm_north_32.nc"))
    assert desc["type"] == "TransverseMercator" and desc["k_0"] == 0.9996
    assert code == "EPSG:32632"
    assert netcdf3.read_crs(os.path.join(DATA, "test.nc")) == (None, None)


# -- VTK fixtures (io/vtk.jl:14-66) — all appended+zlib-compressed binary ----

def test_spiral_vtp(spark):
    v, e = _load(spark, "spiral.vtp")
    vr, er = v.collect(), e.collect()
    assert len(vr) == 20 and len(er) == 17
    assert all(isinstance(r["theta"], float) for r in vr)  # PointData
    assert all(isinstance(r["h"], float) for r in er)      # CellData
    assert all(len(r["vids"]) == 4 for r in er)            # quads (Ngon)


def test_imagedata_vti(spark):
    df = _load(spark, "imagedata.vti")
    rows = df.collect()
    assert len(rows) == 551  # 19x29 cells
    assert all(isinstance(r["myCellData"], float) for r in rows)


def test_maskedgrid_vti(spark):
    """io/vtk.jl:57-61: mask column → SubGrid view of 100 elements."""
    df = _load(spark, "maskedgrid.vti")
    assert df.count() == 100


def test_rectilinear_vtr(spark):
    df = _load(spark, "rectilinear.vtr")
    rows = df.collect()
    assert len(rows) == 551
    assert all(isinstance(r["myCellData"], float) for r in rows)


def test_structured_vts(spark):
    df = _load(spark, "structured.vts")
    rows = df.collect()
    assert len(rows) == 600  # 20x30 points
    assert all(len(r["myVector"]) == 3 for r in rows)
    assert all(isinstance(r["p_values"], float) for r in rows)


# -- GeoTIFF fixtures ---------------------------------------------------------

def test_iterator_tif_deflate(spark):
    """Deflate + float-predictor + planar=2 TIFF (the one fixture the
    uncompressed-only reader couldn't parse)."""
    from geoio_jl_spark.sources import geotiff
    arr, A, b, epsg = geotiff.read_raw(os.path.join(DATA, "iterator.tif"))
    assert arr.shape == (46, 91, 2)
    assert epsg == "EPSG:4267"
    assert abs(A[0][0] - 1 / 60) < 1e-12 and abs(A[1][1] + 1 / 60) < 1e-12
    assert abs(b[0] + 124.5) < 1e-9 and abs(b[1] - 49.0) < 1e-9
    # smooth small-magnitude float fields, not byte noise
    assert -1.0 < arr[..., 0].mean() < 0.0
    assert -5.0 < arr[..., 1].mean() < -4.0


@pytest.mark.parametrize("fname,shape", [
    ("test.tif", (100, 100, 3)), ("test_gray.tif", (108, 108, 1)),
    ("utm.tif", (100, 100, 1)), ("natural_earth_1.tif", (81, 162, 3)),
    ("natural_earth_1_projected.tif", (81, 162, 3))])
def test_tif_shapes(spark, fname, shape):
    from geoio_jl_spark.sources import geotiff
    arr, A, b, epsg = geotiff.read_raw(os.path.join(DATA, fname))
    assert arr.shape == shape


def test_tif_crs_geokeys(spark):
    """GeoKey CRS extraction across the fixture set: geographic 4326,
    Plate Carrée 32662, UTM 17N 32617 (io/geotiff.jl CRS asserts)."""
    from geoio_jl_spark.sources import geotiff
    expect = {"natural_earth_1.tif": "EPSG:4326",
              "natural_earth_1_projected.tif": "EPSG:32662",
              "utm.tif": "EPSG:32617", "test.tif": None}
    for f, code in expect.items():
        _a, _A, _b, epsg = geotiff.read_raw(os.path.join(DATA, f))
        assert epsg == code, f


def test_natural_earth_affine(spark):
    """World raster: origin (-180, 90), 1/0.45° pixels, EPSG:4326."""
    from geoio_jl_spark.sources import geotiff
    arr, A, b, epsg = geotiff.read_raw(
        os.path.join(DATA, "natural_earth_1.tif"))
    assert abs(b[0] + 180.0) < 1e-6 and abs(b[1] - 90.0) < 1e-6
    assert abs(A[0][0] * 162 - 360.0) < 1e-6


# -- meshes: all five tetrahedron encodings agree ------------------------------

def test_tetrahedron_cross_format(spark):
    """obj/off/msh(x2)/stl all encode the same 4-vertex, 4-face
    tetrahedron (io/{obj,off,stl,msh}.jl: length == 4)."""
    vert_sets = {}
    for f in ["tetrahedron.obj", "tetrahedron.off", "tetrahedron1.msh",
              "tetrahedron2.msh", "tetrahedron_ascii.stl",
              "tetrahedron_bin.stl"]:
        v, e = _load(spark, f)
        assert v.count() == 4, f
        assert e.count() == 4, f
        vert_sets[f] = {tuple(round(float(r[c]), 6) for c in ("x", "y", "z"))
                       for r in v.collect()}
    assert len(set(map(frozenset, vert_sets.values()))) == 1, vert_sets


def test_off_colors_normalized(spark):
    """F24: int color channels normalize to [0,1] (off.jl:108-113)."""
    _, e = _load(spark, "tetrahedron.off")
    rows = sorted(e.collect(), key=lambda r: r["eid"])
    assert rows[0]["color"] == [1.0, 0.0, 0.0]  # 255 0 0 → red
    assert rows[1]["color"] == [0.0, 1.0, 0.0]
    assert rows[2]["color"] == [0.0, 0.0, 1.0]
    assert rows[3]["color"] is None


def test_beethoven_ply(spark):
    v, e = _load(spark, "beethoven.ply")
    assert v.count() == 2521
    assert e.count() == 5030


# -- GSLIB grid dialect (io/gslib.jl) ----------------------------------------

def test_grid_gslib(spark, tmp_path):
    df = _load(spark, "grid.gslib")
    rows = sorted(df.collect(), key=lambda r: r["cell_id"])
    assert len(rows) == 8  # 2x2x2 CartesianGrid
    assert rows[0]["Porosity"] == 0.1
    assert rows[0]["Lithology"] == 1.0
    ws = rows[-1]["Water Saturation"]  # gslib.jl:8 isnan
    assert ws is None or np.isnan(ws)
    # save round-trip (gslib.jl:12-19)
    out = str(tmp_path / "grid.gslib")
    registry.save(df, out)
    rows2 = sorted(registry.load(spark, out).collect(),
                   key=lambda r: r["cell_id"])
    for a, b in zip(rows, rows2):
        assert a["x"] == b["x"] and a["y"] == b["y"] and a["z"] == b["z"]
        assert a["Porosity"] == b["Porosity"]


# -- GeoPackage extras ---------------------------------------------------------

def test_gdal_gpkg_multilayer(spark):
    """geopackage.jl:31-36: 16 layers, layer 1 has a NULL geometry row."""
    import warnings as _w
    path = os.path.join(DATA, "gdal.gpkg")
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        df = registry.load(spark, path)
        assert any("16 layers" in str(w.message) for w in rec)
    rows = df.collect()
    assert len(rows) == 5
    assert sum(1 for r in rows if r["geom"] is None) == 1


def test_missing_gpkg(spark):
    df = _load(spark, "missing.gpkg")
    rows = sorted(df.collect(), key=lambda r: r["id"])
    assert [r["identifier"] for r in rows] == ["A", "B"]
    assert rows[1]["geometry"] is None


# -- round-trips through our writers on reference data ------------------------

@pytest.mark.parametrize("fname", ["points.shp", "points.geojson",
                                   "polygons.geojson"])
def test_roundtrip_reference_data(spark, tmp_path, fname):
    """load fixture → save with our writer → reload → identical attrs
    + coordinates (the reference's save-testset pattern)."""
    df = _load(spark, fname)
    gcol = "geometry"
    out = str(tmp_path / fname)
    registry.save(df, out)
    df2 = registry.load(spark, out)
    a = sorted(df.collect(), key=lambda r: r["code"])
    b = sorted(df2.collect(), key=lambda r: r["code"])
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert ra["name"] == rb["name"]
        assert abs(ra["variable"] - rb["variable"]) < 1e-9
        xa, ya = _xy(ra[gcol])
        xb, yb = _xy(rb[gcol])
        assert abs(xa - xb) < 1e-9 and abs(ya - yb) < 1e-9


def test_roundtrip_spiral_vtp(spark, tmp_path):
    v1, e1 = _load(spark, "spiral.vtp")
    out = str(tmp_path / "spiral.vtp")
    registry.save((v1, e1), out)
    v2, e2 = registry.load(spark, out)
    assert v2.count() == 20 and e2.count() == 17
    t1 = {r["vid"]: round(r["theta"], 9) for r in v1.collect()}
    t2 = {r["vid"]: round(r["theta"], 9) for r in v2.collect()}
    assert t1 == t2


def test_grib_gaussian_grid(spark):
    """regular_gg_ml.grib (io/grib.jl role): N32 regular Gaussian grid,
    128x64, one model-level temperature field. The header's declared
    first latitude (La1, an independent field) must match the computed
    Legendre-root latitude — a self-differential on the Gaussian math."""
    from geoio_jl_spark.sources import grib2
    msgs = grib2.read_raw(os.path.join(DATA, "regular_gg_ml.grib"))
    assert len(msgs) == 1
    m = msgs[0]
    assert m["name"] == "t" and m["values"].shape == (64, 128)
    assert abs(m["lats"][0] - 87.863799) < 5e-4  # La1 vs leggauss root
    assert 150 < np.nanmean(m["values"]) < 250   # model-level temps (K)
    df = _load(spark, "regular_gg_ml.grib")
    assert df.count() == 8192
    assert "t" in df.columns


def test_netcdf_save_roundtrip_time_series(spark, tmp_path):
    """The reference's save testset: load test.nc, save, reload,
    equal (io/netcdf.jl:55-61) — here HDF5 read → classic write →
    classic read, a genuine cross-codec differential including the
    (t, y, x) time-series variable and its NaN fill values."""
    df1 = _load(spark, "test.nc")
    out = str(tmp_path / "resaved.nc")
    netcdf3.write(df1.select("cell_id", "i", "j", "x", "y", "tempanomaly"),
                  out)
    df2 = netcdf3.read(spark, out)
    a = {(r["i"], r["j"]): r["tempanomaly"]
         for r in df1.collect()}
    b = {(r["i"], r["j"]): r["tempanomaly"] for r in df2.collect()}
    assert set(a) == set(b) and len(a) == 121
    for k in a:
        va = np.asarray(a[k], float)
        vb = np.asarray(b[k], float)
        assert len(va) == len(vb) == 100
        mask = ~np.isnan(va)
        assert (mask == ~np.isnan(vb)).all()
        np.testing.assert_allclose(va[mask], vb[mask], rtol=1e-6)
