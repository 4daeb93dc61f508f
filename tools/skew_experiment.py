"""Measure the effect of explicit hot-cell salting on a skewed
sort-merge spatial join (north-rule evidence; results → docs/SKEW.md).

Setup: N skewed points (30% of traffic in 3 hot cells, dialect.*_SKEW) vs
a polygon table large enough that Catalyst cannot broadcast it
(triangles replicated with jittered ids). The join is forced to
sort-merge; AQE skew-join is left ON in both runs (it is the baseline —
explicit salting must beat or match it on top).

Usage: python tools/skew_experiment.py [n_points] [n_poly_copies]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from geoio_jl_spark import dialect as D
from geoio_jl_spark.operators import sjoin as SJ
from geoio_jl_spark.operators.cells import assign_cells
from geoio_jl_spark.queries import _triangles
from geoio_jl_spark.session import get_spark


def build_inputs(spark, n_points: int, n_copies: int):
    pts = spark.range(n_points).select(
        F.col("id").alias("doc_id"),
        F.expr(D.LON_I_SKEW.format(id="id")).alias("lon_i"),
        F.expr(D.LAT_I_SKEW.format(id="id")).alias("lat_i"))
    tri = _triangles(spark, "/root/testdata/sf0.001")
    polys = tri.withColumn(
        "copy", F.explode(F.sequence(F.lit(0), F.lit(n_copies - 1)))
    ).select(
        (F.col("poly_id") * n_copies + F.col("copy")).alias("poly_id"),
        "ax", "ay", "bx", "by", "cx", "cy", "minx", "miny", "maxx", "maxy")
    return pts, polys


def run_unsalted(pts, tiled):
    joined = assign_cells(pts, res=3).hint("merge").join(tiled, "cell_id")
    pairs = joined.filter(F.expr(D.point_in_triangle_sql("lon_i", "lat_i")))
    return pairs.groupBy().agg(F.count("*")).collect()[0][0]


def run_salted(pts, tiled, n_salt: int):
    p = assign_cells(pts, res=3).withColumn(
        "salt", F.pmod(F.hash("doc_id"), F.lit(n_salt)))
    t = tiled.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))))
    joined = p.hint("merge").join(t, ["cell_id", "salt"])
    pairs = joined.filter(F.expr(D.point_in_triangle_sql("lon_i", "lat_i")))
    return pairs.groupBy().agg(F.count("*")).collect()[0][0]


def main():
    n_points = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    n_copies = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    spark = get_spark("skew_experiment", cores=8, driver_memory="32g",
                      extra_conf={"spark.ui.showConsoleProgress": "false",
                                  "spark.sql.autoBroadcastJoinThreshold": "-1"})
    pts, polys = build_inputs(spark, n_points, n_copies)
    tiled = SJ.tile_polygons(polys, 3).persist()
    n_tiles = tiled.count()
    pts = pts.persist()
    pts.count()
    # hot-cell profile
    prof = (assign_cells(pts, res=3).groupBy("cell_id").count()
            .orderBy(F.desc("count")).limit(3).collect())
    print(f"points={n_points} tiled_polygons={n_tiles} "
          f"hot cells: {[(r['cell_id'], r['count']) for r in prof]}",
          flush=True)
    for mode in ("unsalted", "salted"):
        for trial in range(3):
            t0 = time.time()
            n = (run_unsalted(pts, tiled) if mode == "unsalted"
                 else run_salted(pts, tiled, 16))
            print(f"{mode} trial{trial}: {time.time() - t0:.1f}s pairs={n}",
                  flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
