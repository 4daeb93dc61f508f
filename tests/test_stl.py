"""STL: sniffing, distributed vertex dedup (J3), round trips, normals."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geoio_jl_spark.sources import stl


@pytest.fixture()
def square_mesh(spark):
    """Two triangles sharing an edge: 6 corners, 4 unique vertices."""
    verts = spark.createDataFrame(pd.DataFrame({
        "vid": [1, 2, 3, 4],
        "x": [0.0, 1.0, 0.0, 1.0], "y": [0.0, 0.0, 1.0, 1.0],
        "z": [0.0, 0.0, 0.0, 0.0],
    }))
    elems = spark.createDataFrame(pd.DataFrame({
        "eid": [1, 2], "vids": [[1, 2, 3], [2, 4, 3]],
    }))
    return verts, elems


def test_binary_roundtrip_dedups_vertices(spark, square_mesh, tmp_path):
    v, e = square_mesh
    path = str(tmp_path / "sq.stl")
    stl.write(v, e, path, binary=True)
    assert stl.is_binary_stl(path)
    v2, e2 = stl.read(spark, path)
    assert v2.count() == 4  # shared-edge vertices deduped (stl.jl:16-21)
    assert e2.count() == 2
    # triangles reference valid vertex ids and reproduce the geometry
    vm = {r["vid"]: (r["x"], r["y"], r["z"]) for r in v2.collect()}
    tris = {frozenset(vm[int(i)] for i in r["vids"]) for r in e2.collect()}
    assert frozenset({(0, 0, 0), (1, 0, 0), (0, 1, 0)}) in tris
    assert frozenset({(1, 0, 0), (1, 1, 0), (0, 1, 0)}) in tris


def test_ascii_roundtrip(spark, square_mesh, tmp_path):
    v, e = square_mesh
    path = str(tmp_path / "sq_ascii.stl")
    stl.write(v, e, path, binary=False)
    assert not stl.is_binary_stl(path)
    v2, e2 = stl.read(spark, path)
    assert v2.count() == 4 and e2.count() == 2


def test_non_triangle_rejected(spark, tmp_path):
    v = spark.createDataFrame(pd.DataFrame({
        "vid": [1, 2, 3, 4], "x": [0.0, 1, 1, 0], "y": [0.0, 0, 1, 1],
        "z": [0.0] * 4}))
    quad = spark.createDataFrame(pd.DataFrame({"eid": [1], "vids": [[1, 2, 3, 4]]}))
    with pytest.raises(ValueError, match="triangles"):
        stl.write(v, quad, str(tmp_path / "bad.stl"))


def test_float32_warning(spark, tmp_path):
    v = spark.createDataFrame(pd.DataFrame({
        "vid": [1, 2, 3], "x": [0.1, 1.0, 0.0], "y": [0.0, 0.0, 1.0],
        "z": [0.0] * 3}))
    e = spark.createDataFrame(pd.DataFrame({"eid": [1], "vids": [[1, 2, 3]]}))
    with pytest.warns(UserWarning, match="precision"):
        stl.write(v, e, str(tmp_path / "w.stl"))


def test_normals_written(spark, square_mesh, tmp_path):
    import struct
    v, e = square_mesh
    path = str(tmp_path / "n.stl")
    stl.write(v, e, path, binary=True)
    with open(path, "rb") as f:
        f.seek(84)
        nx, ny, nz = struct.unpack("<3f", f.read(12))
    assert (nx, ny, nz) == (0.0, 0.0, 1.0)  # CCW in-plane triangle -> +z
