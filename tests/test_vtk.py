"""VTK XML: vtu mesh round trip (+pixel/voxel reorder), vti mask/SubGrid
round trip (reference test/io/vtk.jl model)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geoio_jl_spark.operators.raster import GridSpec, fill_to_parent, grid_cells
from geoio_jl_spark.sources import vtk


def test_vtu_roundtrip_with_data(spark, tmp_path):
    verts = spark.createDataFrame(pd.DataFrame({
        "vid": [1, 2, 3, 4], "x": [0.0, 1, 0, 1], "y": [0.0, 0, 1, 1],
        "z": [0.0] * 4, "temp": [10.0, 20.0, 30.0, 40.0]}))
    elems = spark.createDataFrame(pd.DataFrame({
        "eid": [1, 2], "kind": ["triangle", "triangle"],
        "vids": [[1, 2, 3], [2, 4, 3]], "pressure": [1.5, 2.5]}))
    path = str(tmp_path / "m.vtu")
    vtk.write_vtu(verts, elems, path)
    v2, e2 = vtk.read_vtu(spark, path)
    assert v2.count() == 4 and e2.count() == 2
    t = {r["vid"]: r["temp"] for r in v2.collect()}
    assert t[4] == 40.0  # per-vertex data (vtable)
    p = {r["eid"]: r["pressure"] for r in e2.collect()}
    assert p[2] == 2.5  # per-cell data (etable)
    assert {tuple(r["vids"]) for r in e2.collect()} == {(1, 2, 3), (2, 4, 3)}


def test_vtu_pixel_voxel_reorder(spark, tmp_path):
    # hand-write a vtu with a VTK_PIXEL (type 8) cell: row-major order
    path = str(tmp_path / "p.vtu")
    with open(path, "w") as f:
        f.write("""<?xml version="1.0"?>
<VTKFile type="UnstructuredGrid"><UnstructuredGrid>
<Piece NumberOfPoints="4" NumberOfCells="1">
<Points><DataArray type="Float64" NumberOfComponents="3" format="ascii">
0 0 0  1 0 0  0 1 0  1 1 0</DataArray></Points>
<Cells>
<DataArray type="Int64" Name="connectivity" format="ascii">0 1 2 3</DataArray>
<DataArray type="Int64" Name="offsets" format="ascii">4</DataArray>
<DataArray type="UInt8" Name="types" format="ascii">8</DataArray>
</Cells></Piece></UnstructuredGrid></VTKFile>""")
    _v, e = vtk.read_vtu(spark, path)
    row = e.collect()[0]
    assert row["kind"] == "quad"
    # pixel (0,1,2,3) -> quad (0,1,3,2) => 1-based (1,2,4,3) (F26)
    assert list(row["vids"]) == [1, 2, 4, 3]


def test_vti_mask_subgrid_roundtrip(spark, tmp_path):
    spec = GridSpec(nx=6, ny=6)
    grid = grid_cells(spark, spec).withColumn(
        "val", F.col("cell_id").cast("double")
    ).withColumn(
        "mask", F.when((F.col("i") >= 2) & (F.col("i") < 5)
                       & (F.col("j") >= 2) & (F.col("j") < 5), 1)
        .otherwise(0).cast("int"))
    path = str(tmp_path / "g.vti")
    vtk.write_vti(grid, path, nx=6, ny=6, value_cols=["val", "mask"])
    sub = vtk.read_vti(spark, path)  # mask applied -> SubGrid view (P6)
    assert sub.count() == 9
    assert "mask" not in sub.columns
    # K12 inverse: subdomain back onto parent grid with NaN + mask
    filled = fill_to_parent(sub, spark, spec, ["val"])
    path2 = str(tmp_path / "g2.vti")
    vtk.write_vti(filled, path2, nx=6, ny=6, value_cols=["val", "mask"])
    sub2 = vtk.read_vti(spark, path2)
    a = sorted((r["cell_id"], r["val"]) for r in sub.collect())
    b = sorted((r["cell_id"], r["val"]) for r in sub2.collect())
    assert a == b  # mask -> fill -> mask round trip


def test_vtr_roundtrip(spark, tmp_path):
    xs = [0.0, 1.0, 3.0, 6.0]   # rectilinear (non-uniform) axes
    ys = [10.0, 20.0, 40.0]
    from geoio_jl_spark.operators.raster import rectilinear_cells
    import pandas as pd
    # cell-centered values over a 3x2 cell grid
    cells = spark.createDataFrame(pd.DataFrame({
        "cell_id": range(6), "i": [0, 1, 2, 0, 1, 2], "j": [0, 0, 0, 1, 1, 1],
        "x": [0.5, 2.0, 4.5] * 2, "y": [15.0] * 3 + [30.0] * 3,
        "val": [float(v) for v in range(6)],
    }))
    path = str(tmp_path / "g.vtr")
    vtk.write_vtr(cells, path, xs=xs, ys=ys, value_cols=["val"])
    back = vtk.read_vtr(spark, path)
    rows = {r["cell_id"]: r for r in back.collect()}
    assert len(rows) == 6
    assert rows[1]["x"] == 2.0 and rows[4]["y"] == 30.0  # midpoints
    assert rows[5]["val"] == 5.0


def test_vts_roundtrip_curvilinear(spark, tmp_path):
    import numpy as np
    import pandas as pd
    npx, npy = 4, 3
    vid = np.arange(npx * npy)
    i, j = vid % npx, vid // npx
    # curvilinear: sheared coordinates
    pdf = pd.DataFrame({
        "point_id": vid, "i": i, "j": j,
        "x": i + 0.3 * j, "y": j + 0.1 * i, "z": np.zeros(len(vid)),
        "temp": vid * 1.5,
    })
    path = str(tmp_path / "g.vts")
    vtk.write_vts(spark.createDataFrame(pdf), path, npx=npx, npy=npy,
                  value_cols=["temp"])
    back = vtk.read_vts(spark, path)
    rows = {r["point_id"]: r for r in back.collect()}
    assert len(rows) == 12
    assert rows[5]["x"] == 1 + 0.3 * 1 and rows[5]["temp"] == 7.5
    # degenerate-axis detection works on the curvilinear table (A5)
    from geoio_jl_spark.operators.raster import degenerate_axes
    assert degenerate_axes(back, ["x", "y", "z"]) == ["z"]


def test_vti_rejects_incomplete(spark, tmp_path):
    grid = grid_cells(spark, GridSpec(nx=3, ny=3)).filter("cell_id < 5") \
        .withColumn("v", F.lit(1.0))
    with pytest.raises(ValueError, match="fill_to_parent"):
        vtk.write_vti(grid, str(tmp_path / "x.vti"), nx=3, ny=3)
