"""Geometry-only tables (no attribute columns) across formats — the
reference's novalues.jl pattern (test/novalues.jl:1-73)."""

import pandas as pd
import pytest

from geoio_jl_spark.datagen import geo_points_pdf
from geoio_jl_spark.sources import geojson, geoparquet, gpkg


@pytest.fixture()
def geom_only(spark):
    pdf = geo_points_pdf(8)[["geometry"]]
    return spark.createDataFrame(pdf)


def test_geoparquet_novalues(spark, geom_only, tmp_path):
    path = str(tmp_path / "g.parquet")
    geoparquet.write(geom_only, path)
    back = geoparquet.read(spark, path)
    assert back.columns == ["geometry"]
    assert back.count() == 8


def test_geojson_novalues(spark, geom_only, tmp_path):
    path = str(tmp_path / "g.geojson")
    geojson.write(geom_only, path)
    back = geojson.read(spark, path)
    assert back.count() == 8
    a = sorted(bytes(r["geometry"]) for r in geom_only.collect())
    b = sorted(bytes(r["geometry"]) for r in back.collect())
    assert a == b


def test_gpkg_novalues(spark, geom_only, tmp_path):
    path = str(tmp_path / "g.gpkg")
    gpkg.write(geom_only, path, table="geoms")
    back = gpkg.read(spark, path)
    assert back.count() == 8
    a = sorted(bytes(r["geometry"]) for r in geom_only.collect())
    b = sorted(bytes(r["geometry"]) for r in back.collect())
    assert a == b
