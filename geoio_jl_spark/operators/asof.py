"""As-of join — for each left row, the most recent right row with
``right.ts <= left.ts`` within a partition key (the classic event-stream
enrichment the reference lacks; SURVEY.md §2.4 engine additions).

From-scratch Spark implementation: tag + union both sides, sort within the
key partition by (ts, right-first), carry the last non-null right payload
forward with a window ``last(..., ignorenulls)`` — one shuffle on the key,
no range-join blowup.  Differentially tested against DuckDB's *native*
``ASOF JOIN`` in the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str, ts: str,
              right_cols: list[str] | None = None,
              how: str = "inner") -> DataFrame:
    """Backward (inclusive) as-of join.

    Result: all left columns + the matched right payload columns (renamed
    ``asof_<col>``). ``how='inner'`` drops left rows with no prior right
    row (DuckDB ASOF semantics); ``'left'`` keeps them with nulls."""
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, ts)]
    payload = F.struct(*[F.col(c) for c in right_cols],
                       F.col(ts).alias("_asof_ts"))
    r = right.select(
        F.col(on), F.col(ts), F.lit(1).alias("_is_right"),
        payload.alias("_payload"))
    l = left.withColumn("_is_right", F.lit(0)).withColumn(
        "_payload", F.lit(None).cast(r.schema["_payload"].dataType))
    unioned = l.select(r.columns + [c for c in l.columns if c not in r.columns]) \
        if False else None  # noqa: F841 (kept simple below)
    lcols = [c for c in left.columns]
    l2 = l.select(on, ts, "_is_right", "_payload",
                  F.struct(*[F.col(c) for c in lcols]).alias("_lrow"))
    r2 = r.select(on, ts, "_is_right", "_payload",
                  F.lit(None).cast(l2.schema["_lrow"].dataType).alias("_lrow"))
    u = l2.unionByName(r2)
    # right rows sort before left rows at equal ts → inclusive <=
    w = (Window.partitionBy(on)
         .orderBy(F.col(ts).asc(), F.col("_is_right").desc())
         .rowsBetween(Window.unboundedPreceding, 0))
    carried = u.withColumn("_match", F.last("_payload", ignorenulls=True).over(w))
    out = carried.filter(F.col("_is_right") == 0)
    if how == "inner":
        out = out.filter(F.col("_match").isNotNull())
    cols = [F.col(f"_lrow.{c}").alias(c) for c in lcols]
    cols += [F.col(f"_match.{c}").alias(f"asof_{c}") for c in right_cols]
    cols.append(F.col("_match._asof_ts").alias("asof_ts"))
    return out.select(*cols)
