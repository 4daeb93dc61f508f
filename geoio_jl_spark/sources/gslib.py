"""GSLIB text table source/sink (reference S16/K13 delegate role,
src/load.jl:108-110). Header-driven schema: title line, variable count,
variable names, whitespace rows."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def read(spark: SparkSession, path: str) -> DataFrame:
    with open(path) as f:
        title = f.readline()  # noqa: F841
        nvars = int(f.readline().split()[0])
        names = [f.readline().strip() for _ in range(nvars)]
        pdf = pd.read_csv(f, sep=r"\s+", names=names, header=None)
    return spark.createDataFrame(pdf)


def write(df: DataFrame, path: str, title: str = "geoio_jl_spark") -> None:
    pdf = df.toPandas()
    with open(path, "w") as f:
        f.write(f"{title}\n{len(pdf.columns)}\n")
        for c in pdf.columns:
            f.write(f"{c}\n")
        pdf.to_csv(f, sep=" ", header=False, index=False)
