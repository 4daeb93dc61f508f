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


def warp_to_crs(src_values: DataFrame, src_spec: GridSpec,
                dst_spec: GridSpec, value_cols: list[str],
                partitions: int | None = None) -> DataFrame:
    """Raster reprojection by inverse mapping (nearest neighbor): the
    standard warp. Generates the destination grid implicitly, transforms
    each destination cell center dst-CRS → src-CRS through the engine's
    closed-form transforms (one Arrow-batched crossing — the transform
    itself is numpy), inverse-affines into source indices, and fetches
    values with a plain (i, j) equi-join — co-partitionable, no shuffle
    of the destination side beyond the join, both rasters stay implicit.
    Cells outside the source coverage keep NaN values and mask=0
    (fill_to_parent semantics).

    Reference role: PROJ-based raster reprojection the reference reaches
    through Meshes/Proj (gi.jl:63-68); here it composes grid_cells +
    functions.crs.get_transform.
    """
    from geoio_jl_spark.functions.crs import COLUMN_TRANSFORMS, get_transform

    spark = src_values.sparkSession
    dst = grid_cells(spark, dst_spec, partitions)

    pair = (dst_spec.crs, src_spec.crs)
    if src_spec.crs == dst_spec.crs:
        # same CRS: the whole warp is affine codegen, no crossing
        d = dst.withColumn("_s", F.struct(F.col("x").alias("sx"),
                                          F.col("y").alias("sy")))
    elif (isinstance(dst_spec.crs, str) and isinstance(src_spec.crs, str)
          and pair in COLUMN_TRANSFORMS):
        # registered pure-column transform: stays in whole-stage codegen
        sx, sy = COLUMN_TRANSFORMS[pair](F.col("x"), F.col("y"))
        d = dst.withColumn("_s", F.struct(sx.alias("sx"), sy.alias("sy")))
    else:
        # general closed forms are numpy: ONE Arrow-batched crossing
        import pandas as pd
        from pyspark.sql.types import DoubleType, StructField, StructType

        from geoio_jl_spark.shipping import ensure_pyfiles
        ensure_pyfiles(spark)
        inv = get_transform(dst_spec.crs, src_spec.crs)

        @F.pandas_udf(StructType([StructField("sx", DoubleType()),
                                  StructField("sy", DoubleType())]))
        def to_src(x, y):
            sx, sy = inv(x.values, y.values)
            return pd.DataFrame({"sx": sx, "sy": sy})

        d = dst.withColumn("_s", to_src(F.col("x"), F.col("y")))
    # inverse affine (full 2x2): index = A^-1 (pt - b)
    (a00, a01), (a10, a11) = src_spec.A
    det = a00 * a11 - a01 * a10
    px = F.col("_s.sx") - F.lit(float(src_spec.b[0]))
    py = F.col("_s.sy") - F.lit(float(src_spec.b[1]))
    si = F.round((F.lit(a11 / det) * px - F.lit(a01 / det) * py))
    sj = F.round((F.lit(-a10 / det) * px + F.lit(a00 / det) * py))
    d = (d.withColumn("_si", si.cast("bigint"))
          .withColumn("_sj", sj.cast("bigint"))
          .drop("_s"))
    in_range = ((F.col("_si") >= 0) & (F.col("_si") < src_spec.nx)
                & (F.col("_sj") >= 0) & (F.col("_sj") < src_spec.ny))
    d = d.withColumn("_si", F.when(in_range, F.col("_si")))\
         .withColumn("_sj", F.when(in_range, F.col("_sj")))
    src = src_values.select(F.col("i").alias("_si"),
                            F.col("j").alias("_sj"), *value_cols)
    out = d.join(src, ["_si", "_sj"], "left")
    out = out.withColumn(
        "mask", F.when(F.col("_si").isNotNull(), F.lit(1))
        .otherwise(F.lit(0)).cast("tinyint"))
    for c in value_cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(float("nan"))))
    return out.drop("_si", "_sj")


def focal_stats(values: DataFrame, i_col: str = "i", j_col: str = "j",
                v_col: str = "v") -> DataFrame:
    """3x3 focal mean/min/max as a SCATTER stencil: every cell emits its
    value to the 9 targets it neighbors (explode over a literal offset
    array — pure built-ins), then ONE groupBy on the target key
    aggregates.  No window over a global order, no per-row Python; the
    single shuffle is on (i, j), which AQE coalesces like any key agg.
    Border cells (fewer than 9 contributions) are dropped — the
    interior-only contract keeps semantics exact at tile seams: at
    100 TB the grid arrives tiled, and a 1-cell halo exchange is this
    same scatter restricted to tile borders."""
    offs = F.array(*[
        F.struct(F.lit(di).alias("di"), F.lit(dj).alias("dj"))
        for di in (-1, 0, 1) for dj in (-1, 0, 1)])
    scattered = (values
                 .select(F.explode(offs).alias("_o"), i_col, j_col, v_col)
                 .select((F.col(i_col) - F.col("_o.di")).alias("ti"),
                         (F.col(j_col) - F.col("_o.dj")).alias("tj"),
                         F.col(v_col).alias("v")))
    return (scattered
            .groupBy("ti", "tj")
            .agg(F.count("*").alias("_n"),
                 F.avg("v").alias("focal_mean"),
                 F.min("v").alias("focal_min"),
                 F.max("v").alias("focal_max"))
            .filter(F.col("_n") == 9)
            .select(F.col("ti").alias(i_col), F.col("tj").alias(j_col),
                    "focal_mean", "focal_min", "focal_max"))


def slope_hillshade(values: DataFrame, cellsize: float,
                    i_col: str = "i", j_col: str = "j", v_col: str = "v",
                    azimuth_deg: float = 315.0,
                    altitude_deg: float = 45.0,
                    z_factor: float = 1.0) -> DataFrame:
    """Horn-method slope + ESRI-formula hillshade over an (i, j, v)
    grid table — the classic DEM map-algebra pair, as the same
    one-shuffle scatter stencil as :func:`focal_stats`.

    Horn 1981 gradients (i = x column index, j = y row index):
      dz/dx = ((ne+2e+se) - (nw+2w+sw)) / (8*cellsize)
      dz/dy = ((sw+2s+se) - (nw+2n+ne)) / (8*cellsize)
    Both are LINEAR in the neighbor values, so each source cell scatters
    ``v * wx`` and ``v * wy`` to its 9 targets and the groupBy sums —
    gradients fall out of the same single aggregation that counts
    contributions (interior-only, as focal_stats).  Slope/aspect/
    hillshade are then row-local trig on the two sums."""
    import math
    wx = {(-1, -1): -1, (-1, 0): -2, (-1, 1): -1,
          (1, -1): 1, (1, 0): 2, (1, 1): 1}
    wy = {(-1, -1): -1, (0, -1): -2, (1, -1): -1,
          (-1, 1): 1, (0, 1): 2, (1, 1): 1}
    offs = F.array(*[
        F.struct(F.lit(di).alias("di"), F.lit(dj).alias("dj"),
                 F.lit(float(wx.get((di, dj), 0))).alias("wx"),
                 F.lit(float(wy.get((di, dj), 0))).alias("wy"))
        for di in (-1, 0, 1) for dj in (-1, 0, 1)])
    scattered = (values
                 .select(F.explode(offs).alias("_o"), i_col, j_col, v_col)
                 .select((F.col(i_col) - F.col("_o.di")).alias("ti"),
                         (F.col(j_col) - F.col("_o.dj")).alias("tj"),
                         (F.col(v_col) * F.col("_o.wx")).alias("cx"),
                         (F.col(v_col) * F.col("_o.wy")).alias("cy")))
    sums = (scattered
            .groupBy("ti", "tj")
            .agg(F.count("*").alias("_n"),
                 F.sum("cx").alias("_sx"),
                 F.sum("cy").alias("_sy"))
            .filter(F.col("_n") == 9))
    dzdx = F.col("_sx") / (8.0 * cellsize)
    dzdy = F.col("_sy") / (8.0 * cellsize)
    slope = F.atan(F.lit(float(z_factor))
                   * F.sqrt(dzdx * dzdx + dzdy * dzdy))
    zen = math.radians(90.0 - altitude_deg)
    az = math.radians(360.0 - azimuth_deg + 90.0)
    aspect = F.atan2(dzdy, -dzdx)
    hs = (F.lit(255.0)
          * (F.lit(math.cos(zen)) * F.cos(slope)
             + F.lit(math.sin(zen)) * F.sin(slope)
             * F.cos(F.lit(az) - aspect)))
    return (sums.select(F.col("ti").alias(i_col),
                        F.col("tj").alias(j_col),
                        dzdx.alias("dzdx"), dzdy.alias("dzdy"),
                        F.degrees(slope).alias("slope_deg"),
                        F.greatest(F.lit(0.0), hs).alias("hillshade")))
