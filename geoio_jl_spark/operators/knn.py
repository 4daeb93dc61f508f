"""kNN join: for each query point, the k nearest data points.

Two physical strategies, both returning identical rows:

- ``knn_join_window`` — broadcast the (small) query side, theta-join, rank
  with ``row_number`` over (distance, tiebreak).  Simple; one shuffle of
  |points| x |queries| candidate rows.  Fine when |queries| is tiny; this is
  the oracle-checked form (exact int64 squared distances).

- ``knn_join_partial`` — the 100-TB shape: broadcast queries, compute a
  *local* top-k per partition inside an Arrow-batched numpy kernel
  (map-side combine), then merge the |partitions| x |queries| x k survivors
  with one tiny shuffle.  Shuffle volume is O(P*Q*k), independent of |points|.

Distances are squared-Euclidean in integer centidegrees (exact, hash-stable
across engines); ties break on the point id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def knn_join_window(points: DataFrame, queries: DataFrame, k: int,
                    px: str = "lon_i", py: str = "lat_i",
                    qid: str = "query_id", qx: str = "qx", qy: str = "qy",
                    point_id: str = "doc_id") -> DataFrame:
    cand = points.join(F.broadcast(queries))
    dist = (F.col(px) - F.col(qx)) ** 2 + (F.col(py) - F.col(qy)) ** 2
    w = Window.partitionBy(qid).orderBy(F.col("dist2").asc(), F.col(point_id).asc())
    return (
        cand.withColumn("dist2", dist.cast("bigint"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid, point_id, "dist2", "rank")
    )


def knn_join_partial(points: DataFrame, queries: DataFrame, k: int,
                     px: str = "lon_i", py: str = "lat_i",
                     qid: str = "query_id", qx: str = "qx", qy: str = "qy",
                     point_id: str = "doc_id") -> DataFrame:
    """Map-side local top-k, then global merge (scale path)."""
    from geoio_jl_spark.shipping import ensure_pyfiles
    spark = points.sparkSession
    ensure_pyfiles(spark)
    qrows = queries.select(qid, qx, qy).collect()  # query side is small by contract
    q_ids = np.array([r[0] for r in qrows], dtype=np.int64)
    q_x = np.array([r[1] for r in qrows], dtype=np.int64)
    q_y = np.array([r[2] for r in qrows], dtype=np.int64)
    bq = spark.sparkContext.broadcast((q_ids, q_x, q_y))

    def local_topk(batches):
        ids, xs, ys = bq.value
        best: dict[int, list] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            p_id = pdf[point_id].values.astype(np.int64)
            p_x = pdf[px].values.astype(np.int64)
            p_y = pdf[py].values.astype(np.int64)
            # (Q, B) squared distances, vectorized
            d2 = (p_x[None, :] - xs[:, None]) ** 2 + (p_y[None, :] - ys[:, None]) ** 2
            kk = min(k, d2.shape[1])
            part = np.argpartition(d2, kk - 1, axis=1)[:, :kk]
            for qi in range(len(ids)):
                sel = part[qi]
                rows = list(zip(d2[qi, sel].tolist(), p_id[sel].tolist()))
                cur = best.setdefault(int(ids[qi]), [])
                cur.extend(rows)
                cur.sort()
                del cur[k:]
        out = [(q, pid, d) for q, rows in best.items() for d, pid in rows]
        yield pd.DataFrame(out, columns=[qid, point_id, "dist2"])

    partial = points.select(point_id, px, py).mapInPandas(
        local_topk, schema=f"{qid} long, {point_id} long, dist2 long"
    )
    w = Window.partitionBy(qid).orderBy(F.col("dist2").asc(), F.col(point_id).asc())
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid, point_id, "dist2", "rank")
    )
