"""Geometry repair (F29) — the observable invariants of the reference's
default pipeline `Repair(11) |> Repair(12)` (load.jl:161-165):

- rings re-closed / trailing duplicate vertices dropped
  (pinned by io/geopackage.jl:133-142)
- exterior rings oriented CCW, holes CW (Repair(11) orientation fix)
- zero-area triangles / degenerate rings (< 3 distinct vertices) dropped
  (Repair(12))

Implemented as an Arrow-batched WKB→WKB kernel, skippable with
``repair=False`` like the reference's escape hatch (load.jl:16-20 —
"repairs can be expensive on large data sets").
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

from geoio_jl_spark.functions import wkb as W
from geoio_jl_spark.shipping import ensure_pyfiles


def _ring_area2(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def repair_geom(g: W.Geom) -> W.Geom | None:
    """Repair one geometry; None if fully degenerate."""
    if g.kind == W.POLYGON:
        rings_out = []
        for ri in range(len(g.rings) - 1):
            ring, _closed = W.normalize_chain(
                g.coords[g.rings[ri]:g.rings[ri + 1]])
            if len(np.unique(ring[:, :2], axis=0)) < 3:
                if ri == 0:
                    return None  # degenerate exterior kills the polygon
                continue  # drop degenerate hole
            area2 = _ring_area2(ring[:, :2])
            if area2 == 0 and ri == 0:
                return None  # zero-area exterior (Repair(12))
            want_ccw = ri == 0
            if (area2 > 0) != want_ccw:
                ring = ring[::-1]
            rings_out.append(ring)
        if not rings_out:
            return None
        return W.polygon(rings_out[0], holes=rings_out[1:])
    if g.kind == W.MULTIPOLYGON:
        children = g.geoms if g.geoms else W._split_multi(g)
        fixed = [repair_geom(c) for c in children]
        fixed = [c for c in fixed if c is not None]
        return W.multipolygon(fixed) if fixed else None
    if g.kind == W.LINESTRING:
        coords, _ = W.normalize_chain(g.coords)
        return None if len(coords) < 2 else W.linestring(
            np.vstack([coords, coords[:1]]) if _ else coords)
    if g.kind == W.GEOMETRYCOLLECTION:
        fixed = [repair_geom(c) or c for c in g.geoms]
        return W.Geom(g.kind, g.dim, g.coords, geoms=fixed)
    return g


def repair_wkb_udf() -> Column:
    @F.pandas_udf(BinaryType())
    def _repair(wkbs: pd.Series) -> pd.Series:
        def fix(b):
            if b is None:
                return None
            fixed = repair_geom(W.decode_wkb(bytes(b)))
            return None if fixed is None else W.encode_wkb(fixed)
        return wkbs.apply(fix)

    return _repair


def repair_geometries(df: DataFrame, geometry_column: str = "geometry",
                      repair: bool = True) -> DataFrame:
    """The load-pipeline stage: repair on by default, elidable for scale
    (reference advice, load.jl:16-20)."""
    if not repair:
        return df
    ensure_pyfiles(df.sparkSession)
    return df.withColumn(geometry_column,
                         repair_wkb_udf()(F.col(geometry_column)))
