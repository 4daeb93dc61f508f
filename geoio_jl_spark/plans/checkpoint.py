"""Stage checkpointing with per-partition lineage + metrics, and
resume-from-last-committed-stage (north rule: "resumable from checkpoint
with per-partition lineage + metrics").

Design (sandbox stand-in for Iceberg): every pipeline stage writes its
output to ``<base>/<job_id>/<stage>/data`` (parquet — the snapshot), a
metrics table ``.../metrics`` with one row per output file/partition
``(job_id, stage, snapshot_id, partition_id, file, rows, bytes)``
(harvested from parquet footers — no extra Spark pass), and appends a
manifest entry ``(stage, snapshot_id, upstream, rows, wall_ms)``.

``stage()`` is the reference's staged-dataflow lifecycle (SURVEY.md §3.4)
made durable: a rerun of the same job_id skips every stage whose snapshot
committed (manifest entry + parquet _SUCCESS) and reads the snapshot
instead — resume is just re-running the driver program.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


class CheckpointedJob:
    def __init__(self, spark: SparkSession, base_dir: str, job_id: str):
        self.spark = spark
        self.root = os.path.join(base_dir, job_id)
        self.job_id = job_id
        os.makedirs(self.root, exist_ok=True)
        self._manifest_path = os.path.join(self.root, "_manifest.jsonl")
        self._stages: list[str] = []

    # -- manifest ----------------------------------------------------------
    def manifest(self) -> list[dict]:
        if not os.path.exists(self._manifest_path):
            return []
        with open(self._manifest_path) as f:
            return [json.loads(line) for line in f if line.strip()]

    def _committed(self, stage: str) -> dict | None:
        # last matching entry wins: a crash between manifest append and a
        # later rerun can leave duplicates, and the newest snapshot is
        # the one whose data is on disk
        for entry in reversed(self.manifest()):
            if entry["stage"] == stage:
                data = os.path.join(self.root, name_safe(stage), "data")
                if os.path.exists(os.path.join(data, "_SUCCESS")):
                    return entry
        return None

    # -- stages ------------------------------------------------------------
    def stage(self, name: str, build, partition_by: list[str] | None = None) -> DataFrame:
        """Run (or resume) one stage. ``build`` is a zero-arg callable
        returning the stage's DataFrame."""
        # one canonical directory name for data, metrics, and manifest
        # lookups (stage names may contain '/')
        data_dir = os.path.join(self.root, name_safe(name), "data")
        upstream = list(self._stages)
        self._stages.append(name)
        entry = self._committed(name)
        if entry is not None:
            return self.spark.read.parquet(data_dir)
        t0 = time.time()
        df = build()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(data_dir)
        wall_ms = int((time.time() - t0) * 1000)
        metrics = self._harvest_metrics(name, data_dir)
        snapshot_id = self._snapshot_id(name, metrics)
        self._write_metrics(name, snapshot_id, metrics)
        with open(self._manifest_path, "a") as f:
            f.write(json.dumps({
                "job_id": self.job_id, "stage": name,
                "snapshot_id": snapshot_id, "upstream": upstream,
                "rows": sum(m["rows"] for m in metrics),
                "bytes": sum(m["bytes"] for m in metrics),
                "n_partitions": len(metrics), "wall_ms": wall_ms,
            }) + "\n")
        return self.spark.read.parquet(data_dir)

    # -- metrics -----------------------------------------------------------
    def _harvest_metrics(self, stage: str, data_dir: str) -> list[dict]:
        """Per-partition (output file) rows/bytes from parquet footers —
        metadata-only, no extra Spark job (the Iceberg-manifest analog)."""
        import pyarrow.parquet as pq
        out = []
        files = sorted(glob.glob(os.path.join(data_dir, "**", "*.parquet"),
                                 recursive=True))
        for pid, path in enumerate(files):
            md = pq.ParquetFile(path).metadata
            out.append({
                "partition_id": pid,
                "file": os.path.relpath(path, data_dir),
                "rows": md.num_rows,
                "bytes": os.path.getsize(path),
            })
        return out

    @staticmethod
    def _snapshot_id(stage: str, metrics: list[dict]) -> str:
        h = hashlib.sha256()
        h.update(stage.encode())
        for m in metrics:
            h.update(f"{m['file']}:{m['rows']}:{m['bytes']}".encode())
        return h.hexdigest()[:16]

    def _write_metrics(self, stage: str, snapshot_id: str,
                       metrics: list[dict]) -> None:
        import pandas as pd
        rows = [{"job_id": self.job_id, "stage": stage,
                 "snapshot_id": snapshot_id, **m} for m in metrics]
        mdir = os.path.join(self.root, name_safe(stage), "metrics")
        os.makedirs(mdir, exist_ok=True)
        pd.DataFrame(rows).to_parquet(os.path.join(mdir, "part-0.parquet"))

    def metrics(self) -> DataFrame:
        """All stages' per-partition metrics as one DataFrame."""
        paths = sorted(glob.glob(os.path.join(self.root, "*", "metrics")))
        return self.spark.read.parquet(*paths)

    def invalidate(self, stage: str) -> None:
        """Drop a stage's commit (forces recompute on next run)."""
        entries = [e for e in self.manifest() if e["stage"] != stage]
        with open(self._manifest_path, "w") as f:
            for e in entries:
                f.write(json.dumps(e) + "\n")


def name_safe(stage: str) -> str:
    return stage.replace("/", "_")
