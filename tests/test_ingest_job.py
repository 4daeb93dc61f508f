"""Incremental ingest job (jobs/ingest_job.py): two crawl epochs into
the log-structured store via subprocess, retry idempotence, CDC counts,
and compaction trigger."""

import json
import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F


def _run(args, cwd="/root/repo"):
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    env.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    return subprocess.run(
        [sys.executable, "jobs/ingest_job.py", *args],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=420)


def _segments(spark, tmp_path):
    """Two crawl snapshots: epoch-2 re-crawls some urls (one changed,
    rest identical) and discovers new ones."""
    from geoio_jl_spark.datagen import webpages
    from geoio_jl_spark.sources import warc

    pages = webpages(spark, 120).select(
        F.lit("response").alias("warc_type"),
        F.col("url").alias("target_uri"),
        F.lit("application/http").alias("content_type"),
        F.concat(
            F.lit(b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"),
            F.col("html")).alias("payload"))
    rows = pages.collect()
    d1, d2 = tmp_path / "crawl1", tmp_path / "crawl2"
    d1.mkdir(), d2.mkdir()
    warc.write(spark.createDataFrame(rows[:80], pages.schema),
               str(d1 / "seg.warc.gz"))
    # epoch 2: urls 60..79 unchanged re-crawl, url[0] changed content,
    # urls 80..119 new
    changed = rows[0]
    new_payload = bytes(changed["payload"]).replace(
        b"<article>", b"<article>edited revision ", 1)
    assert new_payload != bytes(changed["payload"])
    changed_row = (changed["warc_type"], changed["target_uri"],
                   changed["content_type"], new_payload)
    warc.write(spark.createDataFrame(
        rows[60:80] + [changed_row] + rows[80:], pages.schema),
        str(d2 / "seg.warc.gz"))
    return str(d1), str(d2)


@pytest.mark.slow
def test_ingest_job_two_epochs(spark, tmp_path):
    from geoio_jl_spark.plans import store as S

    d1, d2 = _segments(spark, tmp_path)
    st = str(tmp_path / "store")

    r1 = _run(["--warc", d1, "--store", st, "--epoch", "1"])
    assert r1.returncode == 0, r1.stderr[-2000:]
    out1 = json.loads([ln for ln in r1.stdout.splitlines()
                       if ln.startswith("{")][-1])
    assert out1["ingest"]["inserted"] == 80
    assert out1["ingest"]["updated"] == 0

    r2 = _run(["--warc", d2, "--store", st, "--epoch", "2"])
    assert r2.returncode == 0, r2.stderr[-2000:]
    out2 = json.loads([ln for ln in r2.stdout.splitlines()
                       if ln.startswith("{")][-1])
    assert out2["ingest"]["inserted"] == 40      # the new urls
    assert out2["ingest"]["updated"] == 1        # the edited page
    assert out2["store_epochs"] == [1, 2]

    resolved = S.resolve(spark, st)
    assert resolved.count() == 120

    # retry idempotence: same epoch again is a no-op
    r3 = _run(["--warc", d2, "--store", st, "--epoch", "2"])
    assert r3.returncode == 0
    out3 = json.loads([ln for ln in r3.stdout.splitlines()
                       if ln.startswith("{")][-1])
    assert out3["ingest"]["skipped"] is True
    assert S.resolve(spark, st).count() == 120

    # extraction invariant holds through the store
    from geoio_jl_spark.functions.textkernels import html_to_text
    bad = (resolved
           .withColumn("_re", html_to_text(F.col("html")))
           .filter(F.col("_re") != F.col("text")).count())
    assert bad == 0


@pytest.mark.slow
def test_ingest_job_compaction_trigger(spark, tmp_path):
    from geoio_jl_spark.plans import store as S

    d1, d2 = _segments(spark, tmp_path)
    st = str(tmp_path / "store")
    _run(["--warc", d1, "--store", st, "--epoch", "1"])
    r = _run(["--warc", d2, "--store", st, "--epoch", "2",
              "--compact-after", "2"])
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads([ln for ln in r.stdout.splitlines()
                      if ln.startswith("{")][-1])
    assert out["ingest"]["inserted"] == 40
    man = S.read_manifest(st)
    assert man["base_epoch"] == 2 and man["epochs"] == []
    assert S.resolve(spark, st).count() == 120