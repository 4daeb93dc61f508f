"""Repair pipeline invariants (F29 — Repair(11)|Repair(12) observables:
ring orientation, closure dedup, zero-area drop)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geoio_jl_spark.functions import wkb as W
from geoio_jl_spark.operators.repair import repair_geom, repair_geometries


def test_exterior_reoriented_ccw():
    cw = W.polygon([(0, 0), (0, 4), (4, 4), (4, 0), (0, 0)])  # clockwise
    fixed = repair_geom(cw)
    ring = fixed.coords[fixed.rings[0]:fixed.rings[1]]
    x, y = ring[:, 0], ring[:, 1]
    assert np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)) > 0  # CCW


def test_hole_reoriented_cw():
    p = W.polygon([(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)],
                  holes=[[(2, 2), (4, 2), (4, 4), (2, 4), (2, 2)]])  # CCW hole
    fixed = repair_geom(p)
    hole = fixed.coords[fixed.rings[1]:fixed.rings[2]]
    x, y = hole[:, 0], hole[:, 1]
    assert np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)) < 0  # CW


def test_trailing_duplicates_dropped():
    # wkb.jl:62-73: pop TRAILING duplicates, then closure dup
    p = W.polygon([(0, 0), (4, 0), (2, 3), (0, 0), (0, 0)])
    fixed = repair_geom(p)
    ring = fixed.coords[fixed.rings[0]:fixed.rings[1]]
    assert len(ring) == 3  # trailing dup popped, closure dup popped


def test_zero_area_dropped():
    degenerate = W.polygon([(0, 0), (1, 1), (2, 2), (0, 0)])  # collinear
    assert repair_geom(degenerate) is None
    two_pts = W.polygon([(0, 0), (1, 1), (0, 0)])
    assert repair_geom(two_pts) is None


def test_multipolygon_partial_repair():
    mp = W.multipolygon([
        W.polygon([(0, 0), (1, 1), (2, 2), (0, 0)]),  # degenerate
        W.polygon([(5, 5), (6, 5), (5, 6), (5, 5)]),  # fine
    ])
    fixed = repair_geom(mp)
    assert fixed.kind == W.MULTIPOLYGON
    assert len(fixed.parts) - 1 == 1  # degenerate part dropped


def test_dataframe_stage_and_escape_hatch(spark):
    rows = [
        (1, W.encode_wkb(W.polygon([(0, 0), (0, 4), (4, 4), (4, 0), (0, 0)]))),
        (2, W.encode_wkb(W.polygon([(0, 0), (1, 1), (2, 2), (0, 0)]))),
        (3, None),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["id", "geometry"]))
    out = {r["id"]: r["geometry"] for r in repair_geometries(df).collect()}
    assert out[1] is not None and out[2] is None and out[3] is None
    # repair=False elides the UDF stage entirely (load.jl:16-20)
    same = repair_geometries(df, repair=False)
    assert same is df
