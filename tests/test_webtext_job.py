"""End-to-end web-text curation job (jobs/webtext_job.py): WARC segments
→ extraction → Gopher gate → PII → minhash dedup → decontamination →
mixing, run as a subprocess with checkpoint-resume verified."""

import glob
import json
import os
import subprocess
import sys

import pytest

from pyspark.sql import functions as F


def _run_job(args, cwd="/root/repo"):
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    env.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    return subprocess.run(
        [sys.executable, "jobs/webtext_job.py", *args],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=420)


@pytest.mark.slow
def test_webtext_job_end_to_end(spark, tmp_path):
    from geoio_jl_spark.datagen import webpages
    from geoio_jl_spark.sources import warc

    pages = webpages(spark, 400).select(
        F.lit("response").alias("warc_type"),
        F.col("url").alias("target_uri"),
        F.lit("application/http").alias("content_type"),
        F.concat(
            F.lit(b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"),
            F.col("html")).alias("payload"),
        "text")
    # plant near-dup copies of one page under fresh URLs → dedup work
    dup = pages.limit(1).collect()[0]
    dups = spark.createDataFrame(
        [(dup["warc_type"], f"https://copycat{i}.test/p/{i}",
          dup["content_type"], bytes(dup["payload"]), dup["text"])
         for i in range(8)], pages.schema)
    allp = pages.union(dups)

    warc_dir = tmp_path / "segments"
    warc_dir.mkdir()
    rows = allp.collect()
    third = (len(rows) + 2) // 3
    for i in range(3):
        seg = spark.createDataFrame(rows[i * third:(i + 1) * third],
                                    pages.schema)
        warc.write(seg.drop("text"), str(warc_dir / f"seg{i}.warc.gz"))

    # eval set: unseen texts — the datagen corpus plants a GLOBAL
    # template suffix in every page, so an eval set built from corpus
    # texts correctly flags 100% of docs (drop semantics are covered at
    # unit level in test_decontaminate.py); here the e2e run must flag
    # nothing and keep the corpus intact
    bench_path = str(tmp_path / "bench.parquet")
    spark.createDataFrame(
        [(0, "zebra quantum falcon orbit saffron ledger granite"),
         (1, "meridian copper wolf harbor lantern ivory plume")],
        "doc_id long, text string").write.parquet(bench_path)

    out = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    r = _run_job(["--warc", str(warc_dir), "--bench", bench_path,
                  "--output", out, "--checkpoints", ckpt,
                  "--job-id", "wt1", "--ngram", "6"])
    assert r.returncode == 0, r.stderr[-3000:]
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["stages"] == ["ingest", "clean", "dedup", "decontam",
                               "mix"]

    result = spark.read.parquet(out)
    n = result.count()
    assert 0 < n <= 408
    # dedup: at most one of the 9 identical pages survives
    assert result.filter(F.col("url").contains("copycat")).count() <= 1
    # PII columns present and text preserved as the redacted form
    assert {"n_emails", "n_phones", "n_ips"} <= set(result.columns)

    # resume: rerun with the same job id → committed stage data untouched
    mt_before = {p: os.path.getmtime(p) for p in glob.glob(
        os.path.join(ckpt, "wt1", "*", "data", "*.parquet"))}
    r2 = _run_job(["--warc", str(warc_dir), "--bench", bench_path,
                   "--output", out, "--checkpoints", ckpt,
                   "--job-id", "wt1", "--ngram", "6"])
    assert r2.returncode == 0, r2.stderr[-3000:]
    mt_after = {p: os.path.getmtime(p) for p in glob.glob(
        os.path.join(ckpt, "wt1", "*", "data", "*.parquet"))}
    assert mt_before == mt_after
