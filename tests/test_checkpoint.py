"""Checkpoint/lineage/resume layer (north rule)."""

import os

from pyspark.sql import functions as F

from geoio_jl_spark.plans.checkpoint import CheckpointedJob


def test_stage_commit_and_metrics(spark, tmp_path, sf_dir):
    job = CheckpointedJob(spark, str(tmp_path), "job1")
    docs = job.stage("scan", lambda: spark.read.parquet(f"{sf_dir}/documents.parquet"))
    n = docs.count()
    assert n > 0
    man = job.manifest()
    assert len(man) == 1
    assert man[0]["rows"] == n
    assert man[0]["bytes"] > 0
    assert man[0]["n_partitions"] >= 1
    m = job.metrics()
    assert m.count() == man[0]["n_partitions"]
    assert m.agg(F.sum("rows")).collect()[0][0] == n
    cols = set(m.columns)
    assert {"job_id", "stage", "snapshot_id", "partition_id", "rows", "bytes"} <= cols


def test_resume_skips_committed_stage(spark, tmp_path, sf_dir):
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.read.parquet(f"{sf_dir}/documents.parquet")

    job = CheckpointedJob(spark, str(tmp_path), "job2")
    job.stage("scan", build)
    assert calls["n"] == 1
    # new job object = driver restart; same job_id resumes
    job2 = CheckpointedJob(spark, str(tmp_path), "job2")
    df = job2.stage("scan", build)
    assert calls["n"] == 1  # NOT recomputed
    assert df.count() > 0


def test_multi_stage_lineage(spark, tmp_path, sf_dir):
    job = CheckpointedJob(spark, str(tmp_path), "job3")
    docs = job.stage("scan", lambda: spark.read.parquet(f"{sf_dir}/documents.parquet"))
    agg = job.stage("agg", lambda: docs.groupBy("lang").count())
    assert agg.count() > 0
    man = {e["stage"]: e for e in job.manifest()}
    assert man["agg"]["upstream"] == ["scan"]
    assert man["agg"]["snapshot_id"] != man["scan"]["snapshot_id"]


def test_invalidate_forces_recompute(spark, tmp_path, sf_dir):
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(10)

    job = CheckpointedJob(spark, str(tmp_path), "job4")
    job.stage("s", build)
    job.invalidate("s")
    job2 = CheckpointedJob(spark, str(tmp_path), "job4")
    job2.stage("s", build)
    assert calls["n"] == 2
