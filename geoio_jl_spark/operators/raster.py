"""Implicit grids + raster↔vector operators.

The reference materializes CartesianGrid/RectilinearGrid domains in memory
(geotiff.jl:29, cdm.jl:61-67).  At 100-TB scale a raster must stay
*implicit*: a ``GridSpec`` (dims + affine) generates cells on demand with
``spark.range`` + integer div/mod — shuffle-free on the raster side
(SURVEY.md §1.3, §4.4).

Operators:
- ``grid_cells``      — generate the cell table (cell_id, i, j, x, y)
- ``apply_mask``      — SubGrid view via boolean mask (vtk/read.jl:32-48)
- ``fill_to_parent``  — inverse: subdomain rows → full grid with NaN-fill
                        + mask column (vtk/write.jl:76-97 semantics as a
                        generated-grid left join)
- ``raster_to_vector_tiles`` — assign grid cells to polygons by bbox
                        overlap (tiling; north-rule raster↔vector)
- ``rectilinear_cells`` — per-axis coordinate vectors (cdm.jl:61-67) as
                        small broadcast joins
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class GridSpec:
    """Regular grid: dims + affine (A, b). Mirrors CartesianGrid composed
    with an affine transform (geotiff.jl:128-148)."""

    nx: int
    ny: int
    A: tuple = ((1.0, 0.0), (0.0, 1.0))
    b: tuple = (0.0, 0.0)
    crs: str = "EPSG:4326"

    @property
    def ncells(self) -> int:
        return self.nx * self.ny


def grid_cells(spark: SparkSession, spec: GridSpec,
               partitions: int | None = None) -> DataFrame:
    """Implicit grid → cell table. Never materializes on the driver."""
    from geoio_jl_spark.functions.crs import affine_cols
    rng = spark.range(0, spec.ncells, 1,
                      partitions or spark.sparkContext.defaultParallelism)
    i = (F.col("id") % spec.nx).cast("bigint")
    j = F.floor(F.col("id") / F.lit(float(spec.nx))).cast("bigint")
    x, y = affine_cols(i.cast("double"), j.cast("double"), spec.A, spec.b)
    return rng.select(
        F.col("id").alias("cell_id"), i.alias("i"), j.alias("j"),
        x.alias("x"), y.alias("y"),
    )


def rectilinear_cells(spark: SparkSession, xs: list[float], ys: list[float],
                      partitions: int | None = None) -> DataFrame:
    """RectilinearGrid (per-axis coordinate vectors, cdm.jl:61-67): the
    axis vectors are tiny — broadcast-join them onto generated indices."""
    nx, ny = len(xs), len(ys)
    ax = spark.createDataFrame([(i, float(v)) for i, v in enumerate(xs)], "i long, x double")
    ay = spark.createDataFrame([(j, float(v)) for j, v in enumerate(ys)], "j long, y double")
    rng = spark.range(0, nx * ny, 1,
                      partitions or spark.sparkContext.defaultParallelism)
    base = rng.select(
        F.col("id").alias("cell_id"),
        (F.col("id") % nx).cast("bigint").alias("i"),
        F.floor(F.col("id") / F.lit(float(nx))).cast("bigint").alias("j"),
    )
    return base.join(F.broadcast(ax), "i").join(F.broadcast(ay), "j") \
        .select("cell_id", "i", "j", "x", "y")


def apply_mask(df: DataFrame, mask_col: str = "mask") -> DataFrame:
    """SubGrid view: keep mask==1, drop the mask column
    (vtk/read.jl:32-48; P6)."""
    return df.filter(F.col(mask_col) == 1).drop(mask_col)


def fill_to_parent(sub: DataFrame, spark: SparkSession, spec: GridSpec,
                   value_cols: list[str], cell_id: str = "cell_id") -> DataFrame:
    """SubDomain → parent grid: NaN-fill values outside the subdomain and
    emit a mask column — the vtk/write.jl:76-97 semantics, executed as a
    left join of subdomain rows onto the generated full grid."""
    grid = grid_cells(spark, spec)
    joined = grid.join(
        sub.select(cell_id, *value_cols).withColumnRenamed(cell_id, "_sub_id"),
        grid["cell_id"] == F.col("_sub_id"), "left",
    )
    out = joined.withColumn(
        "mask", F.when(F.col("_sub_id").isNotNull(), F.lit(1)).otherwise(F.lit(0))
        .cast("tinyint"))
    for c in value_cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(float("nan"))))
    return out.drop("_sub_id")


def raster_to_vector_tiles(grid: DataFrame, polygons: DataFrame,
                           tile_w: float, tile_h: float,
                           x: str = "x", y: str = "y") -> DataFrame:
    """Assign grid cells to polygons by bbox overlap (cell's [x, x+w) x
    [y, y+h) vs polygon bbox). Polygon side must carry minx/miny/maxx/maxy;
    broadcast (polygon tables are small relative to rasters)."""
    return grid.join(
        F.broadcast(polygons),
        (F.col(x) <= F.col("maxx")) & (F.col(x) + tile_w > F.col("minx"))
        & (F.col(y) <= F.col("maxy")) & (F.col(y) + tile_h > F.col("miny")),
    )


def degenerate_axes(df: DataFrame, cols: list[str]) -> list[str]:
    """Constant-dimension detection (vtk/read.jl:89,106,149 `allequal`;
    A5): one pass of min/max aggregates."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_mn_{c}"), F.max(c).alias(f"_mx_{c}")]
    row = df.agg(*aggs).collect()[0]
    return [c for c in cols if row[f"_mn_{c}"] == row[f"_mx_{c}"]]
