"""GSLIB text table source/sink (reference S16/K13 delegate role,
src/load.jl:108-110, GslibIO.jl formats).

Two dialects, sniffed on line 2:

- legacy: title / nvars / names / whitespace rows
- extended grid (fixture grid.gslib): title / "grid" / nx ny nz /
  origin / spacing / nvars / names (may contain spaces) / rows — loads
  as a long-form CartesianGrid cell table (cell_id, i, j, k, x, y, z,
  vars), the same shape the raster ops consume.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def read(spark: SparkSession, path: str) -> DataFrame:
    with open(path) as f:
        title = f.readline()  # noqa: F841
        second = f.readline().strip()
        if second == "grid":
            dims = [int(t) for t in f.readline().split()[:3]]
            origin = [float(t) for t in f.readline().split()[:3]]
            spacing = [float(t) for t in f.readline().split()[:3]]
            nvars = int(f.readline().split()[0])
            names = [f.readline().rstrip("\n") for _ in range(nvars)]
            pdf = pd.read_csv(f, sep=r"\s+", names=names, header=None,
                              na_values=["NaN", "-999", "-999.0"])
            nx, ny, nz = dims
            cell = np.arange(nx * ny * max(nz, 1), dtype=np.int64)
            i = cell % nx
            j = (cell // nx) % ny
            k = cell // (nx * ny)
            grid = pd.DataFrame({
                "cell_id": cell, "i": i, "j": j, "k": k,
                "x": origin[0] + spacing[0] * (i + 0.5),
                "y": origin[1] + spacing[1] * (j + 0.5),
                "z": origin[2] + spacing[2] * (k + 0.5)})
            for c in names:
                grid[c] = pdf[c].to_numpy()
            return spark.createDataFrame(grid)
        nvars = int(second.split()[0])
        names = [f.readline().rstrip("\n") for _ in range(nvars)]
        pdf = pd.read_csv(f, sep=r"\s+", names=names, header=None)
    return spark.createDataFrame(pdf)


def write(df: DataFrame, path: str, title: str = "geoio_jl_spark") -> None:
    """Grid frames (with i/j/k + x/y/z columns) round-trip through the
    extended grid dialect; plain tables use the legacy dialect."""
    pdf = df.toPandas()
    grid_cols = {"cell_id", "i", "j", "k", "x", "y", "z"}
    if grid_cols.issubset(pdf.columns):
        pdf = pdf.sort_values("cell_id")
        nx = int(pdf["i"].max()) + 1
        ny = int(pdf["j"].max()) + 1
        nz = int(pdf["k"].max()) + 1
        def axis(col, n):
            vals = np.sort(pdf[col].unique())
            step = vals[1] - vals[0] if len(vals) > 1 else 1.0
            return vals[0] - step / 2.0, step
        (ox, sx), (oy, sy), (oz, sz) = (axis("x", nx), axis("y", ny),
                                        axis("z", nz))
        names = [c for c in pdf.columns if c not in grid_cols]
        with open(path, "w") as f:
            f.write(f"{title}\ngrid\n{nx} {ny} {nz}\n")
            f.write(f"{ox} {oy} {oz}\n{sx} {sy} {sz}\n{len(names)}\n")
            for c in names:
                f.write(f"{c}\n")
            pdf[names].to_csv(f, sep="\t", header=False, index=False,
                              na_rep="NaN")
        return
    with open(path, "w") as f:
        f.write(f"{title}\n{len(pdf.columns)}\n")
        for c in pdf.columns:
            f.write(f"{c}\n")
        pdf.to_csv(f, sep=" ", header=False, index=False)
