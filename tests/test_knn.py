"""kNN join: the scalable map-side-partial plan must equal the window plan."""

import pandas as pd
from pyspark.sql import functions as F

from geoio_jl_spark import dialect as D
from geoio_jl_spark.operators import knn as KNN


def _points(spark, n=3000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.expr(D.LON_I.format(id="id")).alias("lon_i"),
        F.expr(D.LAT_I.format(id="id")).alias("lat_i"),
    )


def _queries(spark):
    return spark.createDataFrame(pd.DataFrame({
        "query_id": range(12),
        "qx": [(q * 1117) % 33000 + 1500 for q in range(12)],
        "qy": [(q * 2339) % 14000 + 1500 for q in range(12)],
    }))


def test_partial_equals_window(spark):
    pts = _points(spark).repartition(6)  # force multiple partitions
    qs = _queries(spark)
    a = KNN.knn_join_window(pts, qs, k=7).collect()
    b = KNN.knn_join_partial(pts, qs, k=7).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_k_larger_than_points(spark):
    pts = _points(spark, n=3)
    qs = _queries(spark).limit(2)
    out = KNN.knn_join_window(pts, qs, k=10).collect()
    assert len(out) == 6  # 2 queries x 3 points
    out2 = KNN.knn_join_partial(pts, qs, k=10).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_tie_break_deterministic(spark):
    # two points equidistant from the query: lower doc_id wins rank
    pts = spark.createDataFrame(pd.DataFrame({
        "doc_id": [10, 20, 30], "lon_i": [0, 200, 500], "lat_i": [100, 100, 100],
    }))
    qs = spark.createDataFrame(pd.DataFrame({
        "query_id": [0], "qx": [100], "qy": [100],
    }))
    rows = {r["rank"]: r["doc_id"]
            for r in KNN.knn_join_window(pts, qs, k=2).collect()}
    assert rows == {1: 10, 2: 20}
