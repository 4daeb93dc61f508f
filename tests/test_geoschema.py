"""GeoSchema: geometry-column discovery + uniquenames (P1, F21)."""

import pytest

from geoio_jl_spark.geoschema import (
    GeoColumnNotFound,
    GeoSchema,
    detect_geometry_column,
    uniquename,
    uniquenames,
    with_geo_metadata,
)


def test_detection_priority_order():
    # gis.jl:104-114: geometry > geom > shape, any case
    assert detect_geometry_column(["a", "geom", "geometry"]) == "geometry"
    assert detect_geometry_column(["a", "GEOMETRY"]) == "GEOMETRY"
    assert detect_geometry_column(["a", "Shape", "geom"]) == "geom"
    assert detect_geometry_column(["a", "Shape"]) == "Shape"
    assert detect_geometry_column(["a", ""]) == ""


def test_detection_failure():
    with pytest.raises(GeoColumnNotFound):
        detect_geometry_column(["a", "b"])


def test_uniquename_loop():
    # utils.jl:13-26
    assert uniquename({"x", "x_"}, "x") == "x__"
    assert uniquename(set(), "x") == "x"
    assert uniquenames(["x", "y"], ["x", "y", "z"]) == ["x_", "y_", "z"]


def test_metadata_roundtrip(spark):
    import pandas as pd
    df = spark.createDataFrame(pd.DataFrame({"geometry": [b"\x01"], "v": [1]}))
    tagged = with_geo_metadata(df, GeoSchema(crs="EPSG:3857", unit="m"))
    gs = GeoSchema.from_df(tagged)
    assert gs.crs == "EPSG:3857"
    # metadata survives projections/filters
    gs2 = GeoSchema.from_df(tagged.select("geometry").filter("1=1"))
    assert gs2.crs == "EPSG:3857"
