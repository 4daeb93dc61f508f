"""End-to-end resume proof (VERDICT r2 item 8 / north rule: "resumable
from checkpoint with per-partition lineage + metrics"): run the actual
spark-submit entrypoint (jobs/flagship_job.py) as a subprocess, crash it
right after stage 1 commits, resume with the same --job-id, and assert
(a) the committed stage's parquet is reused byte-untouched (mtimes),
(b) the final output is identical to an uninterrupted run,
(c) the metrics table has per-partition rows for every stage."""

import glob
import json
import os
import subprocess
import sys

import pytest


def _run_job(args, cwd="/root/repo"):
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    env.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    return subprocess.run(
        [sys.executable, "jobs/flagship_job.py", *args],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=420)


def _mtimes(d):
    return {os.path.relpath(p, d): os.path.getmtime(p)
            for p in glob.glob(os.path.join(d, "**", "*.parquet"),
                               recursive=True)}


@pytest.mark.slow
def test_flagship_job_crash_resume_identical(spark, tmp_path):
    pages = str(tmp_path / "pages.parquet")
    from geoio_jl_spark.datagen import webpages
    webpages(spark, 2000, partitions=4).write.parquet(pages)

    ckpt = str(tmp_path / "ckpt")
    out1 = str(tmp_path / "out_resumed")
    out2 = str(tmp_path / "out_straight")
    common = ["--pages", pages, "--polygons-sf", "/root/testdata/sf0.001",
              "--checkpoints", ckpt]

    # run 1: crash-inject right after the extract stage commits
    r1 = _run_job([*common, "--output", out1, "--job-id", "rj",
                   "--fail-after", "extract"])
    assert r1.returncode == 7, r1.stderr[-2000:]
    extract_dir = os.path.join(ckpt, "rj", "extract", "data")
    assert os.path.exists(os.path.join(extract_dir, "_SUCCESS"))
    m_before = _mtimes(extract_dir)
    assert m_before, "extract stage wrote no parquet"
    assert not os.path.exists(out1)  # crash happened before the output

    # run 2: same job-id resumes — extract must NOT be recomputed
    r2 = _run_job([*common, "--output", out1, "--job-id", "rj"])
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert _mtimes(extract_dir) == m_before  # (a) stage-1 parquet untouched
    summary = json.loads(r2.stdout.strip().splitlines()[-1])
    assert summary["stages"] == ["extract", "pip_counts"]

    # run 3: fresh job-id, uninterrupted — (b) identical final output
    r3 = _run_job([*common, "--output", out2, "--job-id", "straight"])
    assert r3.returncode == 0, r3.stderr[-2000:]
    a = spark.read.parquet(out1)
    b = spark.read.parquet(out2)
    rows_a = sorted(map(tuple, a.collect()))
    rows_b = sorted(map(tuple, b.collect()))
    assert rows_a == rows_b and len(rows_a) > 0

    # (c) metrics table: per-partition rows for every stage
    from geoio_jl_spark.plans.checkpoint import CheckpointedJob
    job = CheckpointedJob(spark, ckpt, "rj")
    metrics = job.metrics()
    per_stage = {r["stage"]: r["n"] for r in
                 metrics.groupBy("stage").count()
                 .withColumnRenamed("count", "n").collect()}
    assert set(per_stage) == {"extract", "pip_counts"}
    assert all(n >= 1 for n in per_stage.values())
    cols = set(metrics.columns)
    assert {"job_id", "stage", "snapshot_id", "partition_id", "file",
            "rows", "bytes"} <= cols
    # lineage recorded: pip_counts lists extract upstream
    man = {e["stage"]: e for e in job.manifest()}
    assert man["pip_counts"]["upstream"] == ["extract"]
