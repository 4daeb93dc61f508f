"""As-of join semantics: backward inclusive, per-key, inner/left modes."""

import pandas as pd

from geoio_jl_spark.operators.asof import asof_join


def _dfs(spark):
    left = spark.createDataFrame(pd.DataFrame({
        "lid": [1, 2, 3, 4],
        "k": [1, 1, 1, 2],
        "t": [5, 10, 20, 7],
    }))
    right = spark.createDataFrame(pd.DataFrame({
        "k": [1, 1, 2],
        "t": [10, 15, 99],
        "v": ["a", "b", "c"],
    }))
    return left, right


def test_backward_inclusive(spark):
    left, right = _dfs(spark)
    out = {r["lid"]: (r["asof_v"], r["asof_ts"])
           for r in asof_join(left, right, on="k", ts="t").collect()}
    assert 1 not in out          # t=5: no prior right row (inner)
    assert out[2] == ("a", 10)   # t=10: inclusive match at equal ts
    assert out[3] == ("b", 15)   # t=20: latest prior
    assert 4 not in out          # k=2 right row is in the future


def test_left_mode_keeps_unmatched(spark):
    left, right = _dfs(spark)
    out = {r["lid"]: r["asof_v"]
           for r in asof_join(left, right, on="k", ts="t", how="left").collect()}
    assert out[1] is None and out[4] is None and out[3] == "b"
    assert len(out) == 4
