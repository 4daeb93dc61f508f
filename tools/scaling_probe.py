"""Run the flagship pipeline once at a given core count; print one JSON line.

Usage: python tools/scaling_probe.py <cores> <pages_parquet> [trials]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from geoio_jl_spark import dialect as D
from geoio_jl_spark.functions.textkernels import extract_page
from geoio_jl_spark.operators import sjoin as SJ
from geoio_jl_spark.operators.cells import assign_cells
from geoio_jl_spark.queries import _triangles
from geoio_jl_spark.session import get_spark


def pipeline(spark, path):
    pages = spark.read.parquet(path)
    # fused Arrow kernel: html crosses to Python once -> (text, lat, lon)
    extracted = pages.select("url", extract_page("html").alias("p"))
    pts = extracted.select(
        ((F.col("p.lon") + 180.0) * 100).cast("bigint").alias("lon_i"),
        ((F.col("p.lat") + 85.0) * 100).cast("bigint").alias("lat_i"),
        F.xxhash64("url").alias("doc_id"),
        F.length("p.text").alias("text_len"))
    polys = _triangles(spark, "/root/testdata/sf0.001")
    tiled_salted = SJ.tile_polygons(polys, 3).withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(15))))
    pts2 = assign_cells(pts, res=3).withColumn(
        "salt", F.pmod(F.hash("doc_id"), F.lit(16)))
    pairs = pts2.join(F.broadcast(tiled_salted), ["cell_id", "salt"]).filter(
        F.expr(D.point_in_triangle_sql("lon_i", "lat_i")))
    return pairs.groupBy("poly_id").agg(
        F.count("*").alias("n"), F.sum("text_len").alias("tc"))


def main():
    cores = int(sys.argv[1])
    path = sys.argv[2]
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    # Executor sizing for pandas-UDF-heavy stages: every task runs a JVM
    # thread AND a Python worker concurrently (the Arrow batches
    # pipeline), so a slot should budget 2 CPUs — exactly what
    # spark.task.cpus=2 declares on a real cluster.  Measured on the
    # 16M-doc flagship at a pinned 32-CPU budget: task.cpus=2 18.65s vs
    # task.cpus=1 36.83s (2x — 32 JVM threads + 32 Python workers on 32
    # CPUs thrash); neutral at 8 CPUs (39.2 vs 37.8s) and below.
    task_cpus = int(os.environ.get("GEOIO_TASK_CPUS", "1"))
    spark = get_spark(
        f"scaling{cores}", cores=cores, driver_memory="24g",
        shuffle_partitions=max(cores // task_cpus, 8),
        extra_conf={"spark.ui.showConsoleProgress": "false",
                    "spark.task.cpus": str(task_cpus),
                    "spark.sql.execution.arrow.maxRecordsPerBatch": "50000"})
    n_docs = spark.read.parquet(path).count()
    pipeline(spark, path).collect()  # warm
    times = []
    for _ in range(trials):
        t0 = time.time()
        pipeline(spark, path).collect()
        times.append(round(time.time() - t0, 2))
    spark.stop()
    print(json.dumps({"cores": cores, "n_docs": n_docs, "times": times,
                      "best_sec": min(times),
                      "docs_per_sec": round(n_docs / min(times), 1)}))


if __name__ == "__main__":
    main()
