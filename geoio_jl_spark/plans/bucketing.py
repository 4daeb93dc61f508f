"""Bucketed-table layout for repeated co-located joins (SURVEY §2/M4:
"bucketing for co-located joins").

At 100 TB a fact table joined on the same key across many jobs should be
written bucketed once: both sides hash-partitioned into the same number
of buckets on disk, so every subsequent equi-join is planned WITHOUT an
Exchange (no shuffle of either side). This module wraps Spark's
``bucketBy`` (which requires ``saveAsTable``) behind path-style helpers
and a plan assertion used by tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str,
                   n_buckets: int = 32, sort: bool = True) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by ``key`` —
    sorted buckets additionally drop the per-task Sort before a
    sort-merge join."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str) -> DataFrame:
    return spark.table(left_table).join(spark.table(right_table), key)


def exchanges_in_plan(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the executed plan —
    0 for a correctly co-located bucketed join."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(1 for ln in plan.splitlines()
               if "Exchange" in ln and "reuse" not in ln.lower())
