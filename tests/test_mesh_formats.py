"""PLY / MSH / GSLIB round trips (reference test/io/{ply,msh,gslib}.jl
model)."""

import pandas as pd
import pytest

from geoio_jl_spark.sources import gslib, msh, ply


@pytest.fixture()
def mesh(spark):
    verts = spark.createDataFrame(pd.DataFrame({
        "vid": [1, 2, 3, 4],
        "x": [0.0, 1.0, 0.0, 1.0], "y": [0.0, 0.0, 1.0, 1.0],
        "z": [0.0, 0.0, 0.0, 0.25],
    }))
    elems = spark.createDataFrame(pd.DataFrame({
        "eid": [1, 2], "vids": [[1, 2, 3], [2, 4, 3]],
    }))
    return verts, elems


def test_ply_roundtrip(spark, mesh, tmp_path):
    v, e = mesh
    path = str(tmp_path / "m.ply")
    ply.write(v, e, path)
    v2, e2 = ply.read(spark, path)
    assert v2.count() == 4 and e2.count() == 2
    got = {tuple(r["vids"]) for r in e2.collect()}
    assert got == {(1, 2, 3), (2, 4, 3)}
    vm = {r["vid"]: (r["x"], r["y"], r["z"]) for r in v2.collect()}
    assert vm[4] == (1.0, 1.0, 0.25)


def test_ply_extra_vertex_property(spark, tmp_path):
    # extra per-vertex property -> vtable column (ply.jl:21-22 role)
    path = str(tmp_path / "t.ply")
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\nelement vertex 2\n"
                "property float x\nproperty float y\nproperty float z\n"
                "property float temperature\n"
                "element face 1\nproperty list uchar int vertex_indices\n"
                "end_header\n0 0 0 37.5\n1 0 0 39.0\n2 0 1\n")
    v, e = ply.read(spark, path)
    rows = v.orderBy("vid").collect()
    assert rows[0]["temperature"] == 37.5 and rows[1]["temperature"] == 39.0


def test_msh_roundtrip_and_tag_remap(spark, tmp_path):
    # sparse node tags (10, 20, 30) must remap to dense vids (J2)
    path = str(tmp_path / "m.msh")
    with open(path, "w") as f:
        f.write("$MeshFormat\n4.1 0 8\n$EndMeshFormat\n"
                "$Nodes\n1 3 10 30\n2 1 0 3\n10\n20\n30\n"
                "0 0 0\n1 0 0\n0 1 0\n$EndNodes\n"
                "$Elements\n1 1 1 3\n2 1 2 1\n1 10 20 30\n$EndElements\n")
    v, e = msh.read(spark, path)
    assert v.count() == 3
    row = e.collect()[0]
    assert row["kind"] == "triangle"
    assert list(row["vids"]) == [1, 2, 3]  # tags 10/20/30 -> dense 1/2/3
    out = str(tmp_path / "out.msh")
    msh.write(v, e.withColumnRenamed("etag", "eid"), out)
    v2, e2 = msh.read(spark, out)
    assert v2.count() == 3 and e2.count() == 1


def test_msh_nodedata_aligned_with_null_fill(spark, tmp_path):
    # $NodeData only covers some tags -> null fill (A7, msh.jl:235-242)
    path = str(tmp_path / "d.msh")
    with open(path, "w") as f:
        f.write("$MeshFormat\n4.1 0 8\n$EndMeshFormat\n"
                "$Nodes\n1 3 1 3\n2 1 0 3\n1\n2\n3\n"
                "0 0 0\n1 0 0\n0 1 0\n$EndNodes\n"
                "$Elements\n1 1 1 3\n2 1 2 1\n1 1 2 3\n$EndElements\n"
                "$NodeData\n1\n\"temp\"\n1\n0.0\n3\n0\n1\n2\n"
                "1 10.5\n3 30.5\n$EndNodeData\n")
    v, _e = msh.read(spark, path)
    rows = {r["tag"]: r["temp"] for r in v.collect()}
    assert rows[1] == 10.5 and rows[3] == 30.5 and rows[2] is None


def test_gslib_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(pd.DataFrame({
        "east": [0.5, 1.5], "north": [2.5, 3.5], "grade": [0.1, 0.9]}))
    path = str(tmp_path / "g.gslib")
    gslib.write(df, path, title="test grid")
    back = gslib.read(spark, path)
    assert back.columns == ["east", "north", "grade"]
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_registry_includes_new_formats(spark):
    from geoio_jl_spark.sources import registry
    exts = set(registry.formats()["extension"])
    assert {".ply", ".msh", ".gslib", ".shp"} <= exts


def test_ply_binary_roundtrip(spark, tmp_path):
    """binary_little_endian PLY: write binary, read back, equal to the
    ascii form of the same mesh (reference PlyIO handles both)."""
    from geoio_jl_spark.sources import ply
    v1, e1 = ply.read(spark, "/root/reference/test/data/beethoven.ply")
    out = str(tmp_path / "bin.ply")
    ply.write(v1, e1, out, fmt="binary_little_endian")
    with open(out, "rb") as f:
        assert b"binary_little_endian" in f.read(64)
    v2, e2 = ply.read(spark, out)
    assert v2.count() == v1.count() == 2521
    assert e2.count() == e1.count() == 5030
    a = {r["vid"]: (round(r["x"], 3), round(r["y"], 3), round(r["z"], 3))
         for r in v1.collect()}
    b = {r["vid"]: (round(r["x"], 3), round(r["y"], 3), round(r["z"], 3))
         for r in v2.collect()}
    # PLY float properties are float32 on disk: compare at f32 precision
    for k in a:
        assert all(abs(x - y) < 2e-3 for x, y in zip(a[k], b[k])), k
    fa = {r["eid"]: r["vids"] for r in e1.collect()}
    fb = {r["eid"]: r["vids"] for r in e2.collect()}
    assert fa == fb
