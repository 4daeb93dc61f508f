"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``geoio_jl_spark.queries``; every entry is an
operator from SURVEY.md §2 (or a training-data-pipeline op) expressed
Spark-first with an exact-arithmetic DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from geoio_jl_spark import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: point-in-polygon join (cell equi-join + exact refine) →
    docs per polygon, on /root/testdata/sf0.001."""
    from geoio_jl_spark.shipping import ensure_pyfiles
    ensure_pyfiles(spark)
    return Q.q_pip_count(spark, "/root/testdata/sf0.001")


def _wrap(fn: Callable) -> Callable:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from geoio_jl_spark.shipping import ensure_pyfiles
        ensure_pyfiles(spark)  # workers import the package via addPyFile
        return fn(spark, sf_dir)
    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(fn) for name, (fn, _sql) in Q.registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_fn, sql) in Q.registry().items() if sql is not None
    }
