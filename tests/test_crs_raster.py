"""CRS transforms (closure + anchors) and implicit-grid raster operators."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geoio_jl_spark.functions import crs as C
from geoio_jl_spark.functions import wkb as W
from geoio_jl_spark.operators import raster as R


def test_webmercator_anchor_values():
    # known anchors (role of the reference's GDAL differential tests)
    x, y = C._lonlat_to_webmerc(np.array([0.0, 180.0]), np.array([0.0, 0.0]))
    assert abs(x[0]) < 1e-9 and abs(y[0]) < 1e-9
    assert abs(x[1] - 20037508.342789244) < 1e-6
    x, y = C._lonlat_to_webmerc(np.array([0.0]), np.array([45.0]))
    assert abs(y[0] - 5621521.486192066) < 1e-4


def test_transform_roundtrip_closure():
    rng = np.random.RandomState(7)
    lon = rng.uniform(-179, 179, 1000)
    lat = rng.uniform(-84, 84, 1000)
    x, y = C.get_transform("EPSG:4326", "EPSG:3857")(lon, lat)
    lon2, lat2 = C.get_transform("EPSG:3857", "EPSG:4326")(x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_utm_anchor_values():
    # central meridian of zone 32 (lon=9): easting exactly 500000
    fwd = C.get_transform("EPSG:4326", "EPSG:32632")
    E, N = fwd(np.array([9.0]), np.array([50.0]))
    assert abs(E[0] - 500000.0) < 1e-6
    # northing on CM = k0 * meridian arc; independent arc series check
    f = 1 / 298.257223563
    n = f / (2 - f)
    a_bar = 6378137.0 / (1 + n) * (1 + n**2 / 4 + n**4 / 64)
    phi = np.radians(50.0)
    arc = a_bar * (phi
                   + (-3 * n / 2 + 9 * n**3 / 16) * np.sin(2 * phi)
                   + (15 * n**2 / 16 - 15 * n**4 / 32) * np.sin(4 * phi)
                   + (-35 * n**3 / 48) * np.sin(6 * phi))
    assert abs(N[0] - 0.9996 * arc) < 1e-3
    # equator/CM origin
    E0, N0 = fwd(np.array([9.0]), np.array([0.0]))
    assert abs(E0[0] - 500000.0) < 1e-6 and abs(N0[0]) < 1e-6


def test_utm_roundtrip_closure_and_south():
    rng = np.random.RandomState(5)
    lon = 9.0 + rng.uniform(-2.9, 2.9, 500)   # inside zone 32
    lat = rng.uniform(-79, 83, 500)
    E, N = C.get_transform("EPSG:4326", "EPSG:32632")(lon, lat)
    lon2, lat2 = C.get_transform("EPSG:32632", "EPSG:4326")(E, N)
    np.testing.assert_allclose(lon2, lon, atol=1e-8)
    np.testing.assert_allclose(lat2, lat, atol=1e-8)
    # south zone: false northing 10,000,000
    Es, Ns = C.get_transform("EPSG:4326", "EPSG:32732")(
        np.array([9.0]), np.array([-30.0]))
    assert Ns[0] > 6_000_000
    lon3, lat3 = C.get_transform("EPSG:32732", "EPSG:4326")(Es, Ns)
    assert abs(lat3[0] + 30.0) < 1e-8


def test_unknown_transform_raises():
    with pytest.raises(ValueError, match="no transform"):
        C.get_transform("EPSG:4326", "EPSG:9999")


def test_column_exprs_match_numpy(spark):
    pdf = pd.DataFrame({"lon": [-120.3, 0.0, 45.7], "lat": [33.9, 0.0, -71.2]})
    df = spark.createDataFrame(pdf)
    x, y = C.lonlat_to_webmercator_cols(F.col("lon"), F.col("lat"))
    rows = df.select(x.alias("x"), y.alias("y")).collect()
    ex, ey = C._lonlat_to_webmerc(pdf["lon"].values, pdf["lat"].values)
    # JVM and numpy trig differ in the last ulp (tan(pi/4)): atol covers 0
    np.testing.assert_allclose([r["x"] for r in rows], ex, rtol=1e-12, atol=1e-6)
    np.testing.assert_allclose([r["y"] for r in rows], ey, rtol=1e-9, atol=1e-6)


def test_transform_wkb_udf(spark):
    pdf = pd.DataFrame({
        "geometry": [W.encode_wkb(W.polygon([(0, 0), (10, 0), (5, 8), (0, 0)]))]
    })
    df = spark.createDataFrame(pdf)
    out = df.withColumn(
        "g2", C.transform_wkb_udf("EPSG:4326", "EPSG:3857")(F.col("geometry")))
    g2 = W.decode_wkb(bytes(out.collect()[0]["g2"]))
    ex, ey = C._lonlat_to_webmerc(np.array([0.0, 10.0, 5.0]), np.array([0.0, 0.0, 8.0]))
    np.testing.assert_allclose(g2.coords[:3, 0], ex)
    np.testing.assert_allclose(g2.coords[:3, 1], ey)


def test_grid_cells_affine(spark):
    spec = R.GridSpec(nx=4, ny=3, A=((0.5, 0.0), (0.0, -0.25)), b=(100.0, 200.0))
    rows = {r["cell_id"]: r for r in R.grid_cells(spark, spec).collect()}
    assert len(rows) == 12
    r5 = rows[5]  # i=1, j=1
    assert (r5["i"], r5["j"]) == (1, 1)
    assert r5["x"] == 100.5 and r5["y"] == 199.75


def test_rectilinear_cells(spark):
    df = R.rectilinear_cells(spark, xs=[0.0, 1.0, 4.0], ys=[10.0, 20.0])
    rows = sorted((r["i"], r["j"], r["x"], r["y"]) for r in df.collect())
    assert len(rows) == 6
    assert rows[-1] == (2, 1, 4.0, 20.0)


def test_mask_and_fill_roundtrip(spark):
    spec = R.GridSpec(nx=8, ny=8)
    grid = R.grid_cells(spark, spec).withColumn(
        "val", F.col("cell_id").cast("double")
    ).withColumn(
        "mask", F.when((F.col("i") >= 2) & (F.col("i") < 6)
                       & (F.col("j") >= 2) & (F.col("j") < 6), 1)
        .otherwise(0).cast("tinyint"))
    sub = R.apply_mask(grid)  # P6: mask view
    assert sub.count() == 16
    assert "mask" not in sub.columns
    # K12 semantics: back to parent grid with NaN-fill + mask
    filled = R.fill_to_parent(sub, spark, spec, ["val"])
    assert filled.count() == 64
    back = filled.filter(F.col("mask") == 1)
    assert back.count() == 16
    nans = filled.filter(F.col("mask") == 0).filter(F.isnan("val")).count()
    assert nans == 48


def test_raster_to_vector_tiles(spark):
    spec = R.GridSpec(nx=10, ny=10, A=((10.0, 0.0), (0.0, 10.0)), b=(0.0, 0.0))
    grid = R.grid_cells(spark, spec)
    polys = spark.createDataFrame(pd.DataFrame({
        "poly_id": [0], "minx": [25.0], "miny": [25.0],
        "maxx": [44.0], "maxy": [34.0],
    }))
    out = R.raster_to_vector_tiles(grid, polys, tile_w=10.0, tile_h=10.0)
    # x in {20,30,40}, y in {20,30} -> 6 tiles
    assert out.count() == 6


def test_degenerate_axes(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "a": [1.0, 1.0, 1.0], "b": [1.0, 2.0, 3.0], "c": [5, 5, 5],
    }))
    assert R.degenerate_axes(df, ["a", "b", "c"]) == ["a", "c"]


def test_f15_widened_projections_anchors():
    """Ellipsoidal Mercator / LAEA Europe / Conus Albers (F15 widening;
    the reference resolves these via PROJ — anchors are the projection
    natural origins plus the textbook equator scale)."""
    import numpy as np
    from geoio_jl_spark.functions import crs as C
    x, y = C.get_transform("EPSG:4326", "EPSG:3035")(
        np.array([10.0]), np.array([52.0]))
    assert abs(x[0] - 4321000.0) < 1e-6 and abs(y[0] - 3210000.0) < 1e-6
    x, y = C.get_transform("EPSG:4326", "EPSG:5070")(
        np.array([-96.0]), np.array([23.0]))
    assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6
    x, y = C.get_transform("EPSG:4326", "EPSG:3395")(
        np.array([1.0, 0.0]), np.array([0.0, 50.0]))
    assert abs(x[0] - 111319.4908) < 1e-3   # a * pi/180
    assert abs(y[1] - 6413524.594) < 1e-2   # ellipsoidal (not spherical) y


def test_f15_widened_projections_roundtrip():
    import numpy as np
    from geoio_jl_spark.functions import crs as C
    rng = np.random.default_rng(3)
    cases = [("EPSG:3035", (-30, 60), (30, 70)),
             ("EPSG:3395", (-180, 180), (-80, 80)),
             ("EPSG:5070", (-120, -75), (25, 49))]
    for code, lo_r, la_r in cases:
        lon = rng.uniform(*lo_r, 500)
        lat = rng.uniform(*la_r, 500)
        fwd = C.get_transform("EPSG:4326", code)
        inv = C.get_transform(code, "EPSG:4326")
        lo2, la2 = inv(*fwd(lon, lat))
        assert np.abs(lo2 - lon).max() < 1e-7, code
        assert np.abs(la2 - lat).max() < 1e-7, code


def test_f9_corpus_resolution():
    from geoio_jl_spark.functions import crs as C
    assert C.crs_info("EPSG:3035")["projection"] == \
        "Lambert Azimuthal Equal Area"
    assert C.crs_info("EPSG:2157")["projection"] == "Transverse Mercator"
    assert C.crs_info("EPSG:4269")["kind"] == "geographic"
    assert C.crs_info("EPSG:32745") == {
        "kind": "projected", "axis": "xy", "unit": "m",
        "projection": "utm", "zone": 45, "south": True}
    assert C.crs_info("FOO:1")["kind"] == "cartesian"


# ---------------------------------------------------------------------------
# round-6 focal map algebra: scatter-stencil focal stats + Horn slope /
# ESRI hillshade, differentially tested against direct numpy stencils
# ---------------------------------------------------------------------------

def _grid_df(spark, z):
    ny, nx = z.shape
    rows = [(i, j, float(z[j, i])) for j in range(ny) for i in range(nx)]
    return spark.createDataFrame(rows, ["i", "j", "v"])


def test_focal_stats_match_numpy(spark):
    import numpy as np

    from geoio_jl_spark.operators.raster import focal_stats

    rng = np.random.default_rng(31)
    z = rng.normal(100, 10, (9, 11))          # (ny, nx), v[j, i]
    out = {(r["i"], r["j"]): (r["focal_mean"], r["focal_min"],
                              r["focal_max"])
           for r in focal_stats(_grid_df(spark, z)).collect()}
    ny, nx = z.shape
    assert len(out) == (nx - 2) * (ny - 2)    # interior only
    for j in range(1, ny - 1):
        for i in range(1, nx - 1):
            w = z[j - 1:j + 2, i - 1:i + 2]
            m, mn, mx = out[(i, j)]
            assert abs(m - w.mean()) < 1e-9
            assert mn == w.min() and mx == w.max()


def test_slope_hillshade_match_numpy_horn(spark):
    import numpy as np

    from geoio_jl_spark.operators.raster import slope_hillshade

    rng = np.random.default_rng(32)
    z = rng.normal(0, 5, (8, 10))
    cell = 30.0
    got = {(r["i"], r["j"]): r
           for r in slope_hillshade(_grid_df(spark, z), cell).collect()}
    ny, nx = z.shape
    zen, az = np.radians(45.0), np.radians(360.0 - 315.0 + 90.0)
    for j in range(1, ny - 1):
        for i in range(1, nx - 1):
            nwv, nv, nev = z[j - 1, i - 1], z[j - 1, i], z[j - 1, i + 1]
            wv, ev = z[j, i - 1], z[j, i + 1]
            swv, sv, sev = z[j + 1, i - 1], z[j + 1, i], z[j + 1, i + 1]
            dzdx = ((nev + 2 * ev + sev) - (nwv + 2 * wv + swv)) / (8 * cell)
            dzdy = ((swv + 2 * sv + sev) - (nwv + 2 * nv + nev)) / (8 * cell)
            slope = np.arctan(np.hypot(dzdx, dzdy))
            aspect = np.arctan2(dzdy, -dzdx)
            hs = max(0.0, 255.0 * (np.cos(zen) * np.cos(slope)
                                   + np.sin(zen) * np.sin(slope)
                                   * np.cos(az - aspect)))
            r = got[(i, j)]
            assert abs(r["dzdx"] - dzdx) < 1e-12
            assert abs(r["dzdy"] - dzdy) < 1e-12
            assert abs(r["slope_deg"] - np.degrees(slope)) < 1e-9
            assert abs(r["hillshade"] - hs) < 1e-7


def test_slope_flat_plane_and_known_incline(spark):
    import numpy as np

    from geoio_jl_spark.operators.raster import slope_hillshade

    flat = np.full((5, 5), 42.0)
    rows = slope_hillshade(_grid_df(spark, flat), 10.0).collect()
    assert all(abs(r["slope_deg"]) < 1e-12 for r in rows)
    # 45-degree incline: z = x * cellsize
    cell = 7.0
    inc = np.tile(np.arange(6) * cell, (5, 1))
    rows = slope_hillshade(_grid_df(spark, inc), cell).collect()
    assert all(abs(r["slope_deg"] - 45.0) < 1e-9 for r in rows)


def test_focal_single_shuffle_plan(spark):
    import numpy as np

    from geoio_jl_spark.operators.raster import focal_stats

    z = np.ones((6, 6))
    plan = (focal_stats(_grid_df(spark, z))
            ._jdf.queryExecution().executedPlan().toString())
    assert "Window" not in plan
    assert plan.count("Exchange") <= 2         # key agg (+AQE read)
