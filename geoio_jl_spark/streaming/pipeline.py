"""Structured Streaming surface.

The reference is batch-only (SURVEY.md §2.8); the engine adds streaming
ingest because the north-star pipeline is continuous: cell assignment is a
stateless map, so the batch operators run unchanged per micro-batch.

- ``stream_assign_cells`` — stateless streaming transform (no state store)
- ``windowed_event_counts`` — tumbling window + watermark for late data
- ``stream_point_in_polygon`` — foreachBatch wrapper running the batch
  salted join against a (small, broadcast) polygon table per micro-batch
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geoio_jl_spark.operators.cells import cell_id_col


def stream_assign_cells(stream: DataFrame, lon_i: str = "lon_i",
                        lat_i: str = "lat_i", res: int = 5) -> DataFrame:
    return stream.withColumn("cell_id", cell_id_col(lon_i, lat_i, res))


def windowed_event_counts(stream: DataFrame, ts: str = "ts",
                          key: str = "event_type", window: str = "5 minutes",
                          watermark: str = "10 minutes") -> DataFrame:
    return (
        stream.withWatermark(ts, watermark)
        .groupBy(F.window(F.col(ts), window).alias("w"), F.col(key))
        .agg(F.count("*").alias("n_events"),
             F.sum(F.floor(F.col("value") * 1000000).cast("bigint"))
             .alias("value_sum_e6"))
        .select(F.col("w.start").alias("window_start"), key,
                "n_events", "value_sum_e6")
    )


def stream_exact_dedup(stream: DataFrame, ts: str = "ts",
                       text: str = "text",
                       watermark: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup: first occurrence of each md5(text) wins;
    `dropDuplicatesWithinWatermark` bounds the dedup state store to the
    watermark horizon — unbounded streams never accumulate unbounded
    hash state (the batch exact_duplicates analog for ingest pipelines)."""
    hashed = stream.withColumn("text_hash", F.md5(F.col(text)))
    return (hashed.withWatermark(ts, watermark)
            .dropDuplicatesWithinWatermark(["text_hash"]))


def stream_url_dedup(stream: DataFrame, ts: str = "ts",
                     url: str = "url",
                     watermark: str = "10 minutes") -> DataFrame:
    """Streaming URL-level dedup: canonicalize (functions/urls.py — one
    codegen expression, no UDF) and keep the first occurrence of each
    canonical form within the watermark horizon.  The ingest-side twin
    of the batch `url_dup_groups` pass: at crawl scale the same page is
    re-fetched under utm/fragment/case variants within hours, so
    watermark-bounded state removes most copies before content hashing
    ever runs."""
    from geoio_jl_spark.functions import urls as U
    canon = stream.withColumn(
        "canon_url", F.expr(U.canonical_url_sql(url, "spark")))
    return (canon.withWatermark(ts, watermark)
            .dropDuplicatesWithinWatermark(["canon_url"]))


def sessionize(stream: DataFrame, gap_seconds: int = 1800,
               user_col: str = "user_id", ts_col: str = "ts",
               use_timeout: bool = False) -> DataFrame:
    """Custom stateful operator: session windows per user via
    ``applyInPandasWithState`` (the engine's example of state the built-in
    windows can't express — session gap logic with carried state).

    Emits one row per closed session: (user_id, session_start_us,
    session_end_us, n_events). Sessions close when a new event arrives
    more than ``gap_seconds`` after the last one; the state timeout closes
    trailing sessions.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = ("user_id long, session_start_us long, session_end_us long, "
                  "n_events long")
    state_schema = "start_us long, end_us long, n long"

    def fn(key, pdf_iter, state: GroupState):
        user = key[0]
        closed = []
        if state.hasTimedOut:
            if state.exists:
                s, e, n = state.get
                closed.append((user, s, e, n))
                state.remove()
            yield pd.DataFrame(
                closed, columns=["user_id", "session_start_us",
                                 "session_end_us", "n_events"])
            return
        cur = state.get if state.exists else None
        events = []
        for pdf in pdf_iter:
            events.extend((int(t.value // 1000),) for t in pd.to_datetime(pdf[ts_col]))
        events.sort()
        for (us,) in events:
            us = us  # microseconds
            if cur is None:
                cur = (us, us, 1)
            elif us - cur[1] > gap_seconds * 1_000_000:
                closed.append((user, *cur))
                cur = (us, us, 1)
            else:
                cur = (cur[0], us, cur[2] + 1)
        if cur is not None:
            state.update(cur)
            if use_timeout:
                state.setTimeoutDuration(gap_seconds * 1000)
        yield pd.DataFrame(
            closed, columns=["user_id", "session_start_us",
                             "session_end_us", "n_events"])

    return (
        stream.groupBy(user_col).applyInPandasWithState(
            fn, outputStructType=out_schema, stateStructType=state_schema,
            outputMode="append",
            timeoutConf=(GroupStateTimeout.ProcessingTimeTimeout if use_timeout
                         else GroupStateTimeout.NoTimeout))
    )


def stream_point_in_polygon(stream: DataFrame, polygons: DataFrame,
                            output_fn, res: int = 3,
                            checkpoint_dir: str | None = None,
                            refine=None):
    """foreachBatch: run the batch point-in-polygon join per micro-batch
    (the polygon side is static/broadcast; stateless, so exactly-once
    comes from the sink's idempotence + checkpointed offsets)."""
    from geoio_jl_spark.operators.sjoin import point_in_polygon_join

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        pairs = point_in_polygon_join(
            batch_df, polygons, res=res, wkb_col="geometry",
            broadcast_polygons=True, refine=refine,
        )
        output_fn(pairs, batch_id)

    writer = stream.writeStream.foreachBatch(handle)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer
