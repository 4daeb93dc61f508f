"""As-of join — for each left row, the most recent right row with
``right.ts <= left.ts`` within a partition key (the classic event-stream
enrichment the reference lacks; SURVEY.md §2.4 engine additions).

From-scratch Spark implementation: tag + union both sides, sort within the
key partition by (ts, right-first), carry the last non-null right payload
forward with a window ``last(..., ignorenulls)`` — one shuffle on the key,
no range-join blowup.  Differentially tested against DuckDB's *native*
``ASOF JOIN`` in the oracle gate.

Skew: a window partitioned by the bare key serializes one hot key (a bot
user with 10⁷ events) into a single task.  Keys whose combined row count
exceeds ``hot_threshold`` are therefore split into ``n_buckets``
time-range buckets: per (key, bucket) the last right payload is reduced
map-side, a tiny running-last window over the ≤n_buckets bucket summaries
computes each bucket's carry-in, the carry-in is injected as a synthetic
first row of its bucket, and the carry-forward window then runs
partitioned by (key, bucket) — bounded task size, identical rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _carry_window(parts: list[str], ts: str) -> "Window":
    # right rows sort before left rows at equal ts → inclusive <=;
    # _pri=0 synthetic carry-in rows sort before everything in the bucket
    return (Window.partitionBy(*parts)
            .orderBy(F.col("_pri").asc(), F.col(ts).asc(),
                     F.col("_is_right").desc())
            .rowsBetween(Window.unboundedPreceding, 0))


def _project(out: DataFrame, lcols: list[str], right_cols: list[str],
             how: str) -> DataFrame:
    out = out.filter(F.col("_is_right") == 0)
    if how == "inner":
        out = out.filter(F.col("_match").isNotNull())
    cols = [F.col(f"_lrow.{c}").alias(c) for c in lcols]
    cols += [F.col(f"_match.{c}").alias(f"asof_{c}") for c in right_cols]
    cols.append(F.col("_match._asof_ts").alias("asof_ts"))
    return out.select(*cols)


def asof_join(left: DataFrame, right: DataFrame, on: str, ts: str,
              right_cols: list[str] | None = None,
              how: str = "inner",
              hot_threshold: int = 1_000_000,
              n_buckets: int = 32) -> DataFrame:
    """Backward (inclusive) as-of join.

    Result: all left columns + the matched right payload columns (renamed
    ``asof_<col>``). ``how='inner'`` drops left rows with no prior right
    row (DuckDB ASOF semantics); ``'left'`` keeps them with nulls.
    ``hot_threshold``: keys with more combined rows than this are
    processed through the time-bucketed skew path (``None`` disables
    detection entirely — single window per key)."""
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, ts)]
    payload = F.struct(*[F.col(c) for c in right_cols],
                       F.col(ts).alias("_asof_ts"))
    r = right.select(
        F.col(on), F.col(ts), F.lit(1).alias("_is_right"),
        payload.alias("_payload"))
    l = left.withColumn("_is_right", F.lit(0)).withColumn(
        "_payload", F.lit(None).cast(r.schema["_payload"].dataType))
    lcols = [c for c in left.columns]
    l2 = l.select(on, ts, "_is_right", "_payload",
                  F.struct(*[F.col(c) for c in lcols]).alias("_lrow"))
    r2 = r.select(on, ts, "_is_right", "_payload",
                  F.lit(None).cast(l2.schema["_lrow"].dataType).alias("_lrow"))
    u = l2.unionByName(r2).withColumn("_pri", F.lit(1))

    if hot_threshold is None:
        carried = u.withColumn(
            "_match",
            F.last("_payload", ignorenulls=True).over(_carry_window([on], ts)))
        return _project(carried, lcols, right_cols, how)

    # -- skew detection: per-key combined counts + time span (tiny agg) --
    stats = (u.groupBy(on)
             .agg(F.count("*").alias("_n"),
                  F.min(ts).alias("_tmin"), F.max(ts).alias("_tmax"))
             .filter(F.col("_n") > hot_threshold)
             .select(on, "_tmin", "_tmax"))
    u = u.join(F.broadcast(stats), on, "left")

    cold = u.filter(F.col("_tmin").isNull())
    carried_cold = cold.withColumn(
        "_match",
        F.last("_payload", ignorenulls=True).over(_carry_window([on], ts)))

    hot = u.filter(F.col("_tmin").isNotNull())
    # monotonic time-range bucket (double math only picks the split
    # point; ordering inside a bucket still uses the exact ts column)
    ts_type = dict(u.dtypes)[ts]

    def _num(c: Column) -> Column:
        if "timestamp" in ts_type:  # incl. timestamp_ntz (no double cast)
            return F.unix_micros(c.cast("timestamp")).cast("double")
        if ts_type == "date":
            return F.datediff(c, F.lit("1970-01-01")).cast("double")
        return c.cast("double")

    span = _num(F.col("_tmax")) - _num(F.col("_tmin")) + F.lit(1.0)
    frac = (_num(F.col(ts)) - _num(F.col("_tmin"))) / span
    hot = hot.withColumn(
        "_bkt",
        F.least(F.floor(frac * n_buckets).cast("int"),
                F.lit(n_buckets - 1)))
    # last right payload per (key, bucket): map-side-combinable agg
    bucket_last = (hot.filter(F.col("_is_right") == 1)
                   .groupBy(on, "_bkt")
                   .agg(F.max_by("_payload", F.col(ts)).alias("_blast")))
    # carry-in per bucket = running last over STRICTLY earlier buckets;
    # ≤ n_buckets rows per hot key → trivially small window
    buckets = hot.select(on, "_bkt").distinct()
    wb = (Window.partitionBy(on).orderBy(F.col("_bkt").asc())
          .rowsBetween(Window.unboundedPreceding, -1))
    carry = (buckets.join(bucket_last, [on, "_bkt"], "left")
             .withColumn("_cin", F.last("_blast", ignorenulls=True).over(wb))
             .filter(F.col("_cin").isNotNull())
             .select(on, "_bkt", "_cin"))
    synth = carry.select(
        F.col(on), F.col("_bkt"),
        F.col("_cin._asof_ts").alias(ts), F.lit(1).alias("_is_right"),
        F.col("_cin").alias("_payload"),
        F.lit(None).cast(l2.schema["_lrow"].dataType).alias("_lrow"),
        F.lit(0).alias("_pri"))
    hot_all = hot.select(on, "_bkt", ts, "_is_right", "_payload",
                         "_lrow", "_pri").unionByName(synth)
    carried_hot = hot_all.withColumn(
        "_match",
        F.last("_payload", ignorenulls=True).over(
            _carry_window([on, "_bkt"], ts)))

    out = carried_cold.select(ts, "_is_right", "_match", "_lrow").unionByName(
        carried_hot.select(ts, "_is_right", "_match", "_lrow"))
    return _project(out, lcols, right_cols, how)
