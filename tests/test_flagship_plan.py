"""Plan-shape guard for the flagship pipeline (tools/scaling_probe.py::
pipeline) — the job every bench/scaling number is built on.  Pins the
executed-plan properties the 100-TB story depends on, so a future edit
cannot silently regress them:

* exactly ONE Arrow/Python crossing (the fused extract_page kernel —
  a second crossing doubles the dominant cost),
* the salted polygon side is broadcast (no shuffle of the doc stream
  for the join),
* no cartesian product, no global (unpartitioned) window anywhere.
"""

from pyspark.sql import functions as F

from geoio_jl_spark.datagen import webpages
from tools.scaling_probe import pipeline


def test_flagship_plan_shape(spark, tmp_path):
    path = str(tmp_path / "pages.parquet")
    webpages(spark, 2000, skew=True, partitions=4).write.parquet(path)
    df = pipeline(spark, path)
    df.collect()                               # force AQE final plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AdaptiveSparkPlan.toString() prints BOTH the final and the initial
    # plan after execution; only the final section is what ran.
    if "== Initial Plan ==" in plan:
        plan = plan.split("== Initial Plan ==")[0]
    assert plan.count("ArrowEvalPython") == 1, plan
    assert "BatchEvalPython" not in plan       # no row-at-a-time Python
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


def test_flagship_counts_match_unsalted_reference(spark, tmp_path):
    """The salted broadcast join must produce exactly the same
    per-polygon counts as a direct unsalted cell join + refine."""
    from geoio_jl_spark import dialect as D
    from geoio_jl_spark.functions.textkernels import extract_page
    from geoio_jl_spark.operators import sjoin as SJ
    from geoio_jl_spark.operators.cells import assign_cells
    from geoio_jl_spark.queries import _triangles

    path = str(tmp_path / "pages2.parquet")
    webpages(spark, 3000, skew=True, partitions=4).write.parquet(path)
    got = {r["poly_id"]: (r["n"], r["tc"])
           for r in pipeline(spark, path).collect()}

    pages = spark.read.parquet(path)
    pts = pages.select("url", extract_page("html").alias("p")).select(
        ((F.col("p.lon") + 180.0) * 100).cast("bigint").alias("lon_i"),
        ((F.col("p.lat") + 85.0) * 100).cast("bigint").alias("lat_i"),
        F.length("p.text").alias("text_len"))
    polys = _triangles(spark, "/root/testdata/sf0.001")
    ref = (assign_cells(pts, res=3)
           .join(SJ.tile_polygons(polys, 3), "cell_id")
           .filter(F.expr(D.point_in_triangle_sql("lon_i", "lat_i")))
           .groupBy("poly_id")
           .agg(F.count("*").alias("n"), F.sum("text_len").alias("tc")))
    want = {r["poly_id"]: (r["n"], r["tc"]) for r in ref.collect()}
    assert got == want
