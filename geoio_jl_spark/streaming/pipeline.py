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
