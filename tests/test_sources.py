"""Source/sink round-trip tests (reference test pattern 1:
save(load(x)) == load(save(...)) — test/io/*.jl)."""

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from geoio_jl_spark.datagen import geo_points_pdf, geo_polygons_pdf
from geoio_jl_spark.functions import wkb as W
from geoio_jl_spark.geoschema import GeoSchema
from geoio_jl_spark.sources import csvgeo, geojson, geoparquet, meshtext, registry


@pytest.fixture()
def tmp(tmp_path):
    return str(tmp_path)


def _points_df(spark, missing=False):
    return spark.createDataFrame(geo_points_pdf(32, missing=missing))


def test_csv_roundtrip(spark, tmp):
    src = os.path.join(tmp, "pts_src.csv")
    import pandas as pd
    pd.DataFrame({
        "x": [1.5, 2.5, None, 4.0], "y": [0.5, 1.5, 2.5, None],
        "name": ["a", "b", "c", "d"],
    }).to_csv(src, index=False)
    df = csvgeo.read(spark, src, coords=("x", "y"))
    rows = df.collect()
    assert len(rows) == 2  # missing-coordinate rows dropped (csv.jl:11-18)
    g = W.decode_wkb(bytes(rows[0]["geometry"]))
    assert g.kind == W.POINT
    out = os.path.join(tmp, "pts_out.csv")
    csvgeo.write(df.select("name", "geometry"), out, coords=("x", "y"))
    back = spark.read.csv(out, header=True, inferSchema=True)
    assert sorted(r["x"] for r in back.collect()) == [1.5, 2.5]


def test_csv_uniquenames_collision(spark, tmp):
    # name collision: existing column 'x' -> centroid lands in 'x_'
    # (csv.jl:50, utils.jl:13-26)
    import pandas as pd
    src = os.path.join(tmp, "c.csv")
    pd.DataFrame({"x": [1.0], "y": [2.0]}).to_csv(src, index=False)
    df = csvgeo.read(spark, src, coords=("x", "y"))
    out = os.path.join(tmp, "c_out.csv")
    csvgeo.write(df, out, coords=("x", "y"))
    back = spark.read.csv(out, header=True, inferSchema=True)
    assert "x_" in back.columns and "y_" in back.columns


def test_geoparquet_roundtrip_distributed(spark, tmp):
    df = _points_df(spark)
    path = os.path.join(tmp, "pts.parquet")
    geoparquet.write(df, path, GeoSchema(crs="EPSG:4326"))
    back = geoparquet.read(spark, path)
    assert back.count() == 32
    gs = GeoSchema.from_df(back)
    assert gs.crs == "EPSG:4326" and gs.geometry_column == "geometry"
    a = {bytes(r["geometry"]) for r in df.collect()}
    b = {bytes(r["geometry"]) for r in back.collect()}
    assert a == b  # byte-identical WKB round trip


def test_geoparquet_single_file_footer(spark, tmp):
    df = _points_df(spark).limit(5)
    path = os.path.join(tmp, "single.parquet")
    geoparquet.write_single(df, path, GeoSchema(crs="EPSG:3857"))
    import pyarrow.parquet as pq
    meta = pq.read_schema(path).metadata
    geo = json.loads(meta[b"geo"].decode())
    assert geo["primary_column"] == "geometry"
    # GeoParquet 1.0.0 requires PROJJSON (or omission) in the footer —
    # the plain "EPSG:3857" string form is sidecar-only
    crs = geo["columns"]["geometry"]["crs"]
    assert isinstance(crs, dict) and crs["type"] == "ProjectedCRS"
    assert crs["id"] == {"authority": "EPSG", "code": 3857}
    back = geoparquet.read(spark, path)
    assert GeoSchema.from_df(back).crs == "EPSG:3857"


def test_geojson_roundtrip(spark, tmp):
    pdf = geo_polygons_pdf(5)
    df = spark.createDataFrame(pdf)
    path = os.path.join(tmp, "polys.geojson")
    geojson.write(df, path, GeoSchema())
    with open(path) as f:
        doc = json.load(f)
    assert doc["type"] == "FeatureCollection"
    assert len(doc["features"]) == len(pdf)
    back = geojson.read(spark, path)
    assert back.count() == len(pdf)
    # geometry survives the dict round trip byte-identically
    a = sorted(bytes(r["geometry"]) for r in df.collect())
    b = sorted(bytes(r["geometry"]) for r in back.collect())
    assert a == b


def test_geojsonl_distributed_roundtrip(spark, tmp):
    df = _points_df(spark)
    path = os.path.join(tmp, "pts_seq")
    geojson.write_seq(df, path, GeoSchema())
    back = geojson.read_seq(spark, path)
    rows = back.collect()
    assert len(rows) == 32
    props = json.loads(rows[0]["properties"])
    assert "name" in props and "variable" in props


def test_geojson_reproject_warning(spark, tmp):
    df = _points_df(spark).limit(3)
    path = os.path.join(tmp, "warn.geojson")
    with pytest.warns(UserWarning, match="reprojecting"):
        geojson.write(df, path, GeoSchema(crs="EPSG:3857"))


def test_obj_roundtrip(spark, tmp):
    path = os.path.join(tmp, "mesh.obj")
    with open(path, "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 1\n")
        f.write("f 1 2 3\nf -1 -2 -3\n")  # negative indices (obj.jl:32-40)
    verts, faces = meshtext.read_obj(spark, path)
    assert verts.count() == 4
    got = {tuple(r["vids"]) for r in faces.collect()}
    assert got == {(1, 2, 3), (4, 3, 2)}  # -1 -> 4, -2 -> 3, -3 -> 2
    out = os.path.join(tmp, "mesh_out.obj")
    meshtext.write_obj(verts, faces, out)
    v2, f2 = meshtext.read_obj(spark, out)
    assert v2.count() == 4 and f2.count() == 2


def test_off_roundtrip_with_colors(spark, tmp):
    path = os.path.join(tmp, "m.off")
    with open(path, "w") as f:
        f.write("OFF\n3 1 0\n0 0 0\n1 0 0\n0 1 0\n3 0 1 2 255 0 0 255\n")
    verts, elems = meshtext.read_off(spark, path)
    assert verts.count() == 3
    e = elems.collect()[0]
    assert list(e["vids"]) == [1, 2, 3]
    assert e["color"][0] == 1.0  # 255/255 int channel normalize (off.jl:108-113)
    out = os.path.join(tmp, "m_out.off")
    meshtext.write_off(verts, elems, out)
    v2, e2 = meshtext.read_off(spark, out)
    assert v2.count() == 3 and e2.count() == 1


def test_registry_dispatch_and_formats(spark, tmp):
    cat = registry.formats()
    assert "extension" in cat.columns
    assert ".parquet" in set(cat["extension"])
    with pytest.raises(ValueError, match="unsupported format"):
        registry.load(spark, "/nope/file.xyz")


def test_loadvalues_semantics(spark, tmp):
    df = _points_df(spark, missing=True)
    path = os.path.join(tmp, "miss.parquet")
    geoparquet.write(df, path)
    vals = registry.loadvalues(spark, path, rows="all")
    assert "geometry" not in vals.columns
    assert vals.count() == 32
    invalid = registry.loadvalues(spark, path, rows="invalid")
    assert invalid.count() == df.filter(F.col("geometry").isNull()).count()


def test_filter_missing_geometry_observe(spark, tmp):
    df = _points_df(spark, missing=True)
    valid, obs = registry.filter_missing_geometry(df)
    n_valid = valid.count()
    n_missing = obs.get["n_missing"]
    assert n_valid + n_missing == 32
    assert n_missing == df.filter(F.col("geometry").isNull()).count()


def test_load_gif_and_bmp_grid(spark, tmp_path):
    """Round-6 IMGEXTS breadth: .gif/.bmp route through the image grid
    scan (reference img.jl orientation) via the load dispatcher."""
    import numpy as np

    from geoio_jl_spark.sources import bmp, gif, registry

    rng = np.random.default_rng(51)
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    idx = rng.integers(0, 8, (5, 7), dtype=np.uint8)
    gp = tmp_path / "t.gif"
    gp.write_bytes(gif.encode([idx], pal))
    df = registry.load(spark, str(gp))
    assert df.count() == 35
    row = df.filter("i = 2 AND j = 1").collect()[0]
    exp = pal[idx[1, 2]]
    assert (row["r"], row["g"], row["b"]) == tuple(int(v) for v in exp)
    assert row["y"] == 5 - 1 - 1               # rotate/translate layout

    arr = rng.integers(0, 256, (4, 6, 3), dtype=np.uint8)
    bp = tmp_path / "t.bmp"
    bp.write_bytes(bmp.encode(arr))
    df2 = registry.load(spark, str(bp))
    assert df2.count() == 24
    r2 = df2.filter("i = 3 AND j = 2").collect()[0]
    assert (r2["r"], r2["g"], r2["b"]) == tuple(int(v) for v in arr[2, 3])
