"""Shapefile round trips (reference test/io/shapefile.jl model; Multi-
wrapping quirk per testutils.jl isequalshp)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geoio_jl_spark.functions import wkb as W
from geoio_jl_spark.sources import shapefile as SHP


def test_point_roundtrip(spark, tmp_path):
    pdf = pd.DataFrame({
        "name": ["a", "b"], "code": [1, 2], "v": [0.5, 1.5],
        "geometry": [W.encode_wkb(W.point(1.0, 2.0)),
                     W.encode_wkb(W.point(-3.5, 4.25))],
    })
    path = str(tmp_path / "pts.shp")
    with pytest.warns(UserWarning, match="switchfromshapefile"):
        SHP.write(spark.createDataFrame(pdf), path)
    back = SHP.read(spark, path)
    rows = back.orderBy("code").collect()
    assert [r["name"] for r in rows] == ["a", "b"]
    assert [r["code"] for r in rows] == [1, 2]
    assert rows[0]["v"] == 0.5
    g = W.decode_wkb(bytes(rows[1]["geometry"]))
    np.testing.assert_array_equal(g.coords, [[-3.5, 4.25]])


def test_polygon_roundtrip_multi_wrapped(spark, tmp_path):
    # single polygon with a hole -> shapefile -> MultiPolygon (quirk)
    poly = W.polygon([(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)],
                     holes=[[(2, 2), (4, 2), (4, 4), (2, 4), (2, 2)]])
    pdf = pd.DataFrame({"pid": [7], "geometry": [W.encode_wkb(poly)]})
    path = str(tmp_path / "poly.shp")
    with pytest.warns(UserWarning):
        SHP.write(spark.createDataFrame(pdf), path)
    back = SHP.read(spark, path)
    g = W.decode_wkb(bytes(back.collect()[0]["geometry"]))
    assert g.kind == W.MULTIPOLYGON  # wrapped (testutils.jl:1-10)
    assert len(g.parts) - 1 == 1
    ring_count = g.parts[1] - g.parts[0]
    assert ring_count == 2  # exterior + hole survived orientation regroup
    # containment semantics identical after round trip
    from geoio_jl_spark.functions.geomkernels import points_in_geom
    got = points_in_geom(np.array([5.0, 3.0]), np.array([5.0, 3.0]), g)
    np.testing.assert_array_equal(got, [True, False])


def test_polyline_and_null(spark, tmp_path):
    pdf = pd.DataFrame({
        "i": [1, 2],
        "geometry": [W.encode_wkb(W.linestring([(0, 0), (5, 5), (10, 0)])), None],
    })
    path = str(tmp_path / "lines.shp")
    with pytest.warns(UserWarning):
        SHP.write(spark.createDataFrame(pdf), path)
    back = SHP.read(spark, path).orderBy("i").collect()
    g = W.decode_wkb(bytes(back[0]["geometry"]))
    assert g.kind == W.MULTILINESTRING
    assert back[1]["geometry"] is None  # null shape round-trips


def test_prj_crs_passthrough(spark, tmp_path):
    from geoio_jl_spark.geoschema import GeoSchema
    pdf = pd.DataFrame({"geometry": [W.encode_wkb(W.point(0.0, 0.0))]})
    path = str(tmp_path / "c.shp")
    with pytest.warns(UserWarning):
        SHP.write(spark.createDataFrame(pdf), path)
    back = SHP.read(spark, path)
    assert "WGS 84" in GeoSchema.from_df(back).crs


def test_ring_orientation_written_cw(spark, tmp_path):
    # a CCW-authored exterior must be flipped to CW on disk
    poly = W.polygon([(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)])
    ring = poly.coords
    assert SHP._signed_area(ring) > 0  # CCW in memory
    stype, content = SHP._wkb_to_shape(W.encode_wkb(poly))
    assert stype == SHP.SHP_POLYGON
    import struct
    nparts, npoints = struct.unpack_from("<2i", content, 36)
    pts = np.frombuffer(content, "<f8", npoints * 2, 44 + 4 * nparts).reshape(-1, 2)
    assert SHP._signed_area(pts) < 0  # CW on disk
