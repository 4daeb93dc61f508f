"""st_* accessor functions over WKB columns (F8 trait surface)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from geoio_jl_spark.functions import accessors as A
from geoio_jl_spark.functions import wkb as W


@pytest.fixture(scope="module")
def geoms_df(spark):
    rows = [
        (1, W.encode_wkb(W.point(3.0, 4.0))),
        (2, W.encode_wkb(W.linestring([(0, 0), (2, 0), (2, 2)]))),
        (3, W.encode_wkb(W.polygon([(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)]))),
        (4, W.encode_wkb(W.multipolygon([
            W.polygon([(0, 0), (1, 0), (0, 1), (0, 0)]),
            W.polygon([(5, 5), (6, 5), (5, 6), (5, 5)]),
        ]))),
        (5, None),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["id", "g"]))


def test_accessors(spark, geoms_df):
    out = geoms_df.select(
        "id",
        A.st_kind("g").alias("kind"),
        A.st_x("g").alias("x"),
        A.st_y("g").alias("y"),
        A.st_npoints("g").alias("np"),
        A.st_numgeometries("g").alias("ng"),
        A.st_bounds("g").alias("b"),
        A.st_centroid_x("g").alias("cx"),
    )
    r = {row["id"]: row for row in out.collect()}
    assert r[1]["kind"] == "POINT" and r[1]["x"] == 3.0 and r[1]["y"] == 4.0
    assert r[2]["kind"] == "LINESTRING" and r[2]["np"] == 3
    assert r[3]["kind"] == "POLYGON"
    assert r[3]["b"]["maxx"] == 4.0 and r[3]["b"]["miny"] == 0.0
    assert r[3]["cx"] == pytest.approx(1.6)  # vertex mean (5 ring points)
    assert r[4]["kind"] == "MULTIPOLYGON" and r[4]["ng"] == 2
    assert r[5]["kind"] is None and r[5]["x"] is None


def test_accessors_compose_with_relational_plan(spark, geoms_df):
    # usable inside filters/aggregations like any column function
    n = geoms_df.filter(A.st_kind("g") == "POLYGON").count()
    assert n == 1
    agg = geoms_df.agg(F.max(A.st_npoints("g"))).collect()[0][0]
    assert agg == 8  # multipolygon: 2 triangles x 4 ring points
