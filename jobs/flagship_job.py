"""Flagship pipeline as a spark-submit job (north-rule deployment shape).

    python tools/make_zip.py                       # build geoio_jl_spark.zip
    spark-submit --py-files geoio_jl_spark.zip \
        jobs/flagship_job.py \
        --pages bench_data/webpages_2m.parquet \
        --polygons-sf /root/testdata/sf0.001 \
        --output /tmp/flagship_out \
        --checkpoints /tmp/flagship_ckpt --job-id run1

On a cluster the same command line works with ``--master yarn``/k8s and
N executors; everything below is master-agnostic.  Stages checkpoint via
plans.checkpoint, so re-submitting with the same --job-id resumes after
the last committed stage.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--polygons-sf", default="/root/testdata/sf0.001")
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoints", required=True)
    ap.add_argument("--job-id", default="flagship")
    ap.add_argument("--res", type=int, default=3)
    ap.add_argument("--salt", type=int, default=16)
    ap.add_argument("--fail-after", default=None,
                    help="crash injection for the resume test: abort "
                         "(exit 7) right after this stage commits")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("geoio-flagship").getOrCreate()
    # --py-files puts the zip on workers; make sure the driver sees it too
    from geoio_jl_spark import dialect as D
    from geoio_jl_spark.functions.textkernels import geotag_lat, geotag_lon, html_to_text
    from geoio_jl_spark.operators import sjoin as SJ
    from geoio_jl_spark.operators.cells import assign_cells
    from geoio_jl_spark.plans.checkpoint import CheckpointedJob
    from geoio_jl_spark.queries import _triangles

    job = CheckpointedJob(spark, args.checkpoints, args.job_id)

    def extract():
        pages = spark.read.parquet(args.pages)
        return pages.select(
            "url", html_to_text("html").alias("text"),
            geotag_lat(F.col("html").cast("string")).alias("lat"),
            geotag_lon(F.col("html").cast("string")).alias("lon"))

    extracted = job.stage("extract", extract)
    if args.fail_after == "extract":
        print("CRASH-INJECT after extract", file=sys.stderr)
        spark.stop()
        sys.exit(7)

    def join_counts():
        pts = extracted.select(
            ((F.col("lon") + 180.0) * 100).cast("bigint").alias("lon_i"),
            ((F.col("lat") + 85.0) * 100).cast("bigint").alias("lat_i"),
            F.xxhash64("url").alias("doc_id"),
            F.length("text").alias("text_len"))
        polys = _triangles(spark, args.polygons_sf)
        tiled = SJ.tile_polygons(polys, args.res).withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(args.salt - 1))))
        pts2 = assign_cells(pts, res=args.res).withColumn(
            "salt", F.pmod(F.hash("doc_id"), F.lit(args.salt)))
        pairs = pts2.join(F.broadcast(tiled), ["cell_id", "salt"]).filter(
            F.expr(D.point_in_triangle_sql("lon_i", "lat_i")))
        return pairs.groupBy("poly_id").agg(
            F.count("*").alias("n_docs"), F.sum("text_len").alias("total_chars"))

    counts = job.stage("pip_counts", join_counts)
    counts.write.mode("overwrite").parquet(args.output)
    summary = {
        "polygons_matched": counts.count(),
        "stages": [e["stage"] for e in job.manifest()],
        "rows_per_stage": {e["stage"]: e["rows"] for e in job.manifest()},
    }
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
