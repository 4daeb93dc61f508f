"""Tile-pyramid rollup — multi-zoom tile aggregation (the map-tiling /
hypertable-rollup pattern: web maps and OLAP cubes serve every zoom
level from pre-aggregated tiles).

Extends the engine's single-level ``raster_to_vector_tiles`` (oracle
``grid_tiles``) up the zoom hierarchy.  Scale shape: the corpus is
shuffled ONCE, at the finest zoom (map-side combined count); every
coarser level then aggregates the PREVIOUS level's tile table with a
4:1 fan-in, so the level tables shrink geometrically and the points are
never re-scanned.  Exactness: ``floor(floor(x/a)/2) == floor(x/(2a))``
for non-negative coordinates, so the hierarchical rollup equals
aggregating the raw points at each zoom directly (the oracle's form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tile_pyramid(points: DataFrame, x_col: str, y_col: str,
                 max_zoom: int, min_zoom: int = 0,
                 base_tile: int = 64,
                 weight_col: str | None = None) -> DataFrame:
    """→ (zoom, tx, ty, n) for every zoom in [min_zoom, max_zoom];
    tile size at zoom z is ``base_tile * 2**(max_zoom - z)`` coordinate
    units.  Coordinates must be non-negative.  ``weight_col`` sums a
    weight per row instead of counting rows — pre-aggregated inputs
    (e.g. the streaming tile store's folded partials) roll up through
    the same machinery."""
    if not (0 <= min_zoom <= max_zoom):
        raise ValueError(f"bad zoom range [{min_zoom}, {max_zoom}]")
    ts = F.lit(base_tile)
    base_agg = (F.count("*") if weight_col is None
                else F.sum(weight_col)).alias("n")
    # Each level is materialized once (localCheckpoint): a lazy union
    # would duplicate the whole upstream chain per branch — Catalyst
    # does not share common subplans across union branches, so the
    # corpus would be re-scanned and re-shuffled once PER LEVEL.  The
    # level tables are tile counts (tiny), so materializing them costs
    # almost nothing and the corpus is scanned exactly once.
    cur = (points
           .select(F.floor(F.col(x_col) / ts).alias("tx"),
                   F.floor(F.col(y_col) / ts).alias("ty"),
                   *([weight_col] if weight_col else []))
           .groupBy("tx", "ty")
           .agg(base_agg)
           .localCheckpoint())
    out = cur.select(F.lit(max_zoom).alias("zoom"), "tx", "ty", "n")
    for z in range(max_zoom - 1, min_zoom - 1, -1):
        cur = (cur
               .select(F.floor(F.col("tx") / 2).alias("tx"),
                       F.floor(F.col("ty") / 2).alias("ty"), "n")
               .groupBy("tx", "ty")
               .agg(F.sum("n").alias("n"))
               .localCheckpoint())
        out = out.unionByName(
            cur.select(F.lit(z).alias("zoom"), "tx", "ty", "n"))
    return out
