"""Raster warp (inverse-mapping reprojection) — verified against a
driver-side numpy reference computing the same nearest-neighbor lookup
per destination cell."""

import numpy as np
from pyspark.sql import functions as F

from geoio_jl_spark.functions.crs import get_transform
from geoio_jl_spark.operators.raster import GridSpec, grid_cells, warp_to_crs


def _src_values(spark, spec):
    g = grid_cells(spark, spec)
    return g.withColumn("v", (F.col("i") * 1000 + F.col("j")).cast("double"))


def test_identity_warp_returns_original(spark):
    spec = GridSpec(nx=8, ny=6, A=((0.5, 0.0), (0.0, 0.25)), b=(10.0, 20.0),
                    crs="EPSG:4326")
    src = _src_values(spark, spec)
    out = warp_to_crs(src, spec, spec, ["v"])
    got = {(r["i"], r["j"]): (r["v"], r["mask"]) for r in out.collect()}
    assert len(got) == 48
    for (i, j), (v, m) in got.items():
        assert m == 1 and v == i * 1000 + j


def test_warp_lonlat_to_webmercator_matches_numpy_reference(spark):
    src_spec = GridSpec(nx=12, ny=10, A=((1.0, 0.0), (0.0, 1.0)),
                        b=(-5.0, 40.0), crs="EPSG:4326")
    src = _src_values(spark, src_spec)
    # destination: web-mercator window roughly covering the source
    t = get_transform("EPSG:4326", "EPSG:3857")
    x0, y0 = (float(a[0]) for a in t(np.array([-5.0]), np.array([40.0])))
    x1, y1 = (float(a[0]) for a in t(np.array([10.0]), np.array([53.0])))
    nx, ny = 15, 13
    dst_spec = GridSpec(nx=nx, ny=ny,
                        A=(((x1 - x0) / nx, 0.0), (0.0, (y1 - y0) / ny)),
                        b=(x0, y0), crs="EPSG:3857")
    out = warp_to_crs(src, src_spec, dst_spec, ["v"])
    got = {(r["i"], r["j"]): (r["v"], r["mask"]) for r in out.collect()}

    inv = get_transform("EPSG:3857", "EPSG:4326")
    ii, jj = np.meshgrid(np.arange(nx), np.arange(ny))
    xs = dst_spec.A[0][0] * ii.ravel() + x0
    ys = dst_spec.A[1][1] * jj.ravel() + y0
    lon, lat = inv(xs, ys)
    si = np.round(lon - (-5.0)).astype(int)
    sj = np.round(lat - 40.0).astype(int)
    inb = (si >= 0) & (si < 12) & (sj >= 0) & (sj < 10)
    for k in range(nx * ny):
        key = (int(ii.ravel()[k]), int(jj.ravel()[k]))
        v, m = got[key]
        if inb[k]:
            assert m == 1 and v == si[k] * 1000 + sj[k], key
        else:
            assert m == 0 and np.isnan(v), key
    assert sum(1 for _, m in got.values() if m == 0) > 0  # edges exist


def test_warp_rotated_affine(spark):
    """Full 2x2 inverse (rotated source affine), identity CRS."""
    c, s = np.cos(0.3), np.sin(0.3)
    spec = GridSpec(nx=9, ny=9, A=((c, -s), (s, c)), b=(1.0, 2.0),
                    crs="EPSG:4326")
    src = _src_values(spark, spec)
    out = warp_to_crs(src, spec, spec, ["v"])
    got = {(r["i"], r["j"]): r["v"] for r in out.collect()}
    assert all(got[(i, j)] == i * 1000 + j
               for i in range(9) for j in range(9))


def test_warp_to_oblique_crs(spark):
    """Round-4 integration: the generic warp path reaches the new
    oblique families through get_transform — warp a lon/lat grid over
    the Netherlands onto an RD New (EPSG:28992) grid and verify each
    destination cell fetched the source cell its inverse-projected
    center lands in."""
    import numpy as np
    from geoio_jl_spark.functions.crs import get_transform
    from geoio_jl_spark.operators.raster import (GridSpec, grid_cells,
                                                 warp_to_crs)
    # source: 0.1-degree lon/lat grid over NL (4.0..7.0 E, 51.0..53.5 N)
    src = GridSpec(nx=30, ny=25, A=((0.1, 0.0), (0.0, 0.1)),
                   b=(4.05, 51.05), crs="EPSG:4326")
    vals = grid_cells(spark, src).select(
        "i", "j", (F.col("i") * 1000 + F.col("j")).alias("v"))
    # destination: 10 km RD New grid covering the same area
    dst = GridSpec(nx=22, ny=28, A=((10000.0, 0.0), (0.0, 10000.0)),
                   b=(30000.0, 300000.0), crs="EPSG:28992")
    out = warp_to_crs(vals, src, dst, ["v"]).collect()
    assert len(out) == 22 * 28
    inv = get_transform("EPSG:28992", "EPSG:4326")
    hits = 0
    for r in out:
        lon, lat = inv(np.array([r["x"]]), np.array([r["y"]]))
        si = round((lon[0] - 4.05) / 0.1)
        sj = round((lat[0] - 51.05) / 0.1)
        if 0 <= si < 30 and 0 <= sj < 25:
            assert r["mask"] == 1 and r["v"] == si * 1000 + sj, r
            hits += 1
        else:
            assert r["mask"] == 0, r
    assert hits > 100  # the NL box genuinely overlaps the RD grid


def test_warp_cf_orthographic_netcdf_end_to_end(spark, tmp_path):
    """Round-5 wiring: a NetCDF written with an Orthographic CF
    grid_mapping loads back to a descriptor (sources/netcdf3.read_crs)
    and that DESCRIPTOR is directly a warp side — no WKT minting.
    Verifies each destination lon/lat cell fetched the source cell its
    forward-projected center lands in (reference reaches orthographic
    CF grids through PROJ, src/extra/cdm.jl:253,289 + gi.jl:63-68)."""
    import numpy as np
    from geoio_jl_spark.functions.crs import get_transform
    from geoio_jl_spark.sources import netcdf3 as NC

    desc = {"type": "Orthographic", "datum": "WGS84Latest",
            "lat_o": 55.0, "lon_o": 5.0, "x_o": 0.0, "y_o": 0.0}
    # source: 25 km orthographic grid about the origin
    src = GridSpec(nx=20, ny=16, A=((25000.0, 0.0), (0.0, 25000.0)),
                   b=(-250000.0, -200000.0), crs=desc)
    vals = grid_cells(spark, src).select(
        "x", "y", "i", "j", (F.col("i") * 1000 + F.col("j")).alias("v"))
    path = str(tmp_path / "ortho.nc")
    NC.write(vals, path, value_cols=["v"], crs_desc=desc)
    back_desc, code = NC.read_crs(path)
    assert back_desc == desc and code is None

    # destination: 0.25-degree lon/lat window over the grid
    dst = GridSpec(nx=24, ny=20, A=((0.25, 0.0), (0.0, 0.25)),
                   b=(1.0, 53.0), crs="EPSG:4326")
    out = warp_to_crs(vals.select("i", "j", "v"), src, dst, ["v"]).collect()
    assert len(out) == 24 * 20
    fwd = get_transform("EPSG:4326", back_desc)
    hits = 0
    for r in out:
        sx, sy = fwd(np.array([r["x"]]), np.array([r["y"]]))
        si = round((sx[0] - (-250000.0)) / 25000.0)
        sj = round((sy[0] - (-200000.0)) / 25000.0)
        if 0 <= si < 20 and 0 <= sj < 16:
            assert r["mask"] == 1 and r["v"] == si * 1000 + sj, r
            hits += 1
        else:
            assert r["mask"] == 0, r
    assert hits > 200
