"""Deterministic data mixing — per-source weighted subsampling, the
"domain weights" step of training-data assembly (e.g. sampling web text
down while keeping books/code at full rate).

No reference counterpart (LLM-pipeline axis of the brief).  Scale shape:
a pure per-row filter — no shuffle, no RNG state, no driver round-trips.
Each row draws a deterministic uniform from a Knuth multiplicative hash
of its id, so the decision is reproducible across runs, executors and
retries (unlike ``DataFrame.sample``, whose per-partition seeds change
with the partition layout), and the same row is kept or dropped no
matter how the 100-TB input is split.  The arithmetic stays inside
int64 under ANSI mode: (id % 2^31) * 2654435761 < 2^62.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_KNUTH = 2654435761          # 2^32 / golden ratio, Knuth §6.4
_M32 = 4294967296            # 2^32


def sample_uniform(key: Column) -> Column:
    """Deterministic 32-bit uniform in [0, 2^32) from an integer key.

    ``pmod`` (not ``%``) keeps the value non-negative for NEGATIVE keys
    — xxhash64-derived ids are negative for half of all rows, and a
    signed ``%`` would make every negative-id row compare below any
    threshold, i.e. always kept regardless of weight (review finding)."""
    return F.pmod(F.pmod(key.cast("bigint"), F.lit(2147483648)) * _KNUTH,
                  F.lit(_M32))


def weighted_sample(df: DataFrame, weights: dict[str, float] | DataFrame,
                    strat_col: str = "source",
                    key_col: str = "doc_id",
                    default: float = 1.0) -> DataFrame:
    """Keep each row with its stratum's probability, deterministically.

    ``weights`` is either a small Python dict (compiled into a CASE
    expression — zero joins, for a handful of literal sources) or a
    ``(strat_col, weight)`` DataFrame, broadcast-joined to the corpus —
    the 100-TB shape, where the weights table is itself the product of a
    distributed computation and must never round-trip through the
    driver.  Strata absent from the table fall back to ``default``.
    Both paths floor ``weight * 2^32`` to the same int64 threshold, so
    dict and DataFrame weights keep bit-identical row sets.

    ``key_col`` must be an integral column (the uniform is arithmetic on
    the id); a string key would cast to NULL and silently drop every
    row, so non-integral key types are rejected up front."""
    kind = dict(df.dtypes).get(key_col)
    if kind not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"key_col {key_col!r} must be an integral column, got {kind}")
    if isinstance(weights, DataFrame):
        if strat_col not in weights.columns or \
                "weight" not in weights.columns:
            raise ValueError(
                f"weights DataFrame needs columns ({strat_col!r}, "
                f"'weight'), got {weights.columns}")
        wdf = weights.select(strat_col,
                             F.col("weight").cast("double").alias("__w"))
        thresh = F.floor(F.coalesce(F.col("__w"), F.lit(float(default)))
                         * _M32).cast("bigint")
        return (df.join(F.broadcast(wdf), strat_col, "left")
                .filter(sample_uniform(F.col(key_col)) < thresh)
                .drop("__w")
                .select(*df.columns))
    thresh = F.lit(int(default * _M32))
    for src, w in weights.items():
        thresh = F.when(F.col(strat_col) == src,
                        F.lit(int(w * _M32))).otherwise(thresh)
    return df.filter(sample_uniform(F.col(key_col)) < thresh)
