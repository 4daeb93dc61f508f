"""CSV point source/sink — reference csv.jl semantics, Spark execution.

read (csvread, csv.jl:5-20): spark.read.csv with header+inferSchema →
drop rows with missing coordinates (csv.jl:11-18) → build WKB Point per
row in an Arrow-batched kernel.

write (csvwrite, csv.jl:22-57): geometry → centroid x/y(/z) columns
(csv.jl:40-43), name collisions resolved via uniquenames (csv.jl:50,
utils.jl:13-26), optional C-style float format (csv.jl:55-60).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StringType

from geoio_jl_spark.functions import wkb as W
from geoio_jl_spark.geoschema import GeoSchema, uniquenames, with_geo_metadata


def read(spark: SparkSession, path: str, coords: tuple[str, ...] = ("x", "y"),
         crs: str = "EPSG:4326", lenunit: str = "m") -> DataFrame:
    from geoio_jl_spark.shipping import ensure_pyfiles
    ensure_pyfiles(spark)
    df = spark.read.csv(path, header=True, inferSchema=True)
    missing = [c for c in coords if c not in df.columns]
    if missing:
        raise ValueError(f"coords {missing} not in CSV columns {df.columns}")
    df = df.na.drop(subset=list(coords))  # csv.jl:11-18

    @F.pandas_udf(BinaryType())
    def encode_points(*cols: pd.Series) -> pd.Series:
        arr = np.column_stack([c.values.astype(np.float64) for c in cols])
        return pd.Series([W.encode_wkb(W.point(*row)) for row in arr])

    out = df.withColumn("geometry", encode_points(*[F.col(c) for c in coords]))
    return with_geo_metadata(
        out, GeoSchema(geometry_column="geometry", crs=crs, unit=lenunit)
    )


def write(df: DataFrame, path: str, coords: tuple[str, ...] = ("x", "y"),
          floatformat: str | None = None, geometry_column: str = "geometry",
          mode: str = "overwrite") -> None:
    from geoio_jl_spark.shipping import ensure_pyfiles
    ensure_pyfiles(df.sparkSession)

    @F.pandas_udf(StringType())
    def centroid_packed(wkbs: pd.Series) -> pd.Series:
        c = W.wkb_centroid_batch(wkbs.tolist())
        return pd.Series([f"{x!r},{y!r}" for x, y in c])

    names = uniquenames(
        [c for c in df.columns if c != geometry_column], list(coords)
    )  # csv.jl:50
    packed = df.withColumn("_c", centroid_packed(F.col(geometry_column)))
    split = packed
    for i, n in enumerate(names):
        col = F.split(F.col("_c"), ",").getItem(i).cast("double")
        if floatformat:
            col = F.format_string(floatformat, col)  # csv.jl:55-60
        split = split.withColumn(n, col)
    split.drop(geometry_column, "_c").write.mode(mode).option("header", True).csv(path)
