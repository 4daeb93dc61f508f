"""Similarity search over embedding columns (array<float>).

- ``cosine_topk`` (in queries.py): broadcast cross join + window — exact,
  oracle-checked, fine for small query sets.
- ``cosine_topk_partial``: the 100-TB shape — broadcast query matrix,
  numpy matmul local top-k per partition (map-side combine), merge the
  P×Q×k survivors with one tiny shuffle. Same results as the window plan.
- ``lsh_signature_expr`` / ``ann_candidate_pairs``: random-hyperplane LSH.
  The hyperplanes are integer-lattice vectors derived by formula, so the
  signature is reproducible in ANSI SQL (DuckDB oracle) — sign bits of
  left-fold dot products are bit-exact across engines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geoio_jl_spark.shipping import ensure_pyfiles

N_PLANES = 16
DIM = 64


def plane_vector(j: int, dim: int = DIM) -> np.ndarray:
    """Deterministic integer hyperplane ((j+1)*97 + i*31) % 19 - 9."""
    i = np.arange(1, dim + 1, dtype=np.int64)
    return (((j + 1) * 97 + i * 31) % 19 - 9).astype(np.float64)


def _dot_plane_sql(emb: str, j: int, dialect: str) -> str:
    if dialect == "spark":
        return (
            f"aggregate(zip_with({emb}, transform(sequence(1, {DIM}), "
            f"i -> CAST((({j + 1} * 97 + i * 31) % 19) - 9 AS DOUBLE)), "
            f"(x, y) -> CAST(x AS DOUBLE) * y), CAST(0.0 AS DOUBLE), "
            f"(acc, x) -> acc + x)"
        )
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(generate_series(1, {DIM}), "
        f"i -> CAST({emb}[i] AS DOUBLE) * CAST((({j + 1} * 97 + i * 31) % 19) - 9 AS DOUBLE))), "
        f"(acc, x) -> acc + x)"
    )


def lsh_signature_sql(emb: str, dialect: str, n_planes: int = N_PLANES) -> str:
    """16-bit signature: bit j set iff dot(e, plane_j) >= 0."""
    terms = [
        f"(CASE WHEN {_dot_plane_sql(emb, j, dialect)} >= 0 "
        f"THEN {1 << j} ELSE 0 END)"
        for j in range(n_planes)
    ]
    return "(" + " + ".join(terms) + ")"


def ann_candidate_pairs(emb_df: DataFrame, id_col: str = "vec_id",
                        emb_col: str = "embedding",
                        max_bucket: int | None = None) -> DataFrame:
    """Bucket embeddings by LSH signature; candidate pairs share a bucket.
    The bucket join is a plain equi-join — Catalyst/AQE territory.

    ``max_bucket`` applies the same stop-list rule as the shingle DF cap:
    a bucket of n members emits n² pair rows, so signatures holding more
    than max_bucket vectors (degenerate regions: zero vectors, template
    embeddings) are excluded via broadcast anti-join before the self-join.
    Documented recall trade — oversized buckets carry near-zero
    discriminative value at web scale."""
    sig = emb_df.select(
        id_col, F.expr(lsh_signature_sql(emb_col, "spark")).alias("sig"))
    if max_bucket is not None:
        hot = (sig.groupBy("sig").agg(F.count("*").alias("n"))
               .filter(F.col("n") > max_bucket).select("sig"))
        sig = sig.join(F.broadcast(hot), "sig", "left_anti")
    left = sig.alias("l")
    right = sig.alias("r")
    return (
        left.join(right, "sig")
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(F.col(f"l.{id_col}").alias("id_a"),
                F.col(f"r.{id_col}").alias("id_b"), "sig")
    )


def ivf_index(emb_df: DataFrame, k_centroids: int = 16, n_iter: int = 2,
              id_col: str = "vec_id", emb_col: str = "embedding"):
    """IVF index: Lloyd iterations executed distributed (mapInPandas
    partial sums per partition, tiny driver-side combine), then cluster
    assignment column.  Deterministic: centroids init from the lowest ids.

    Returns (assigned_df with `ivf_cluster`, centroids ndarray (K, dim)).
    """
    spark = emb_df.sparkSession
    ensure_pyfiles(spark)
    first = emb_df.orderBy(id_col).limit(k_centroids).collect()
    centroids = np.array([r[emb_col] for r in first], dtype=np.float64)

    for _ in range(n_iter):
        bc = spark.sparkContext.broadcast(centroids)

        def partial_sums(batches):
            c = bc.value
            sums = np.zeros_like(c)
            counts = np.zeros(len(c), dtype=np.int64)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                mat = np.array(pdf[emb_col].tolist(), dtype=np.float64)
                d2 = ((mat[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
                assign = d2.argmin(axis=1)
                for ci in range(len(c)):
                    m = assign == ci
                    if m.any():
                        sums[ci] += mat[m].sum(axis=0)
                        counts[ci] += int(m.sum())
            rows = [(ci, counts[ci], sums[ci].tolist())
                    for ci in range(len(c))]
            yield pd.DataFrame(rows, columns=["c", "n", "s"])

        parts = emb_df.select(emb_col).mapInPandas(
            partial_sums, schema="c int, n long, s array<double>").collect()
        sums = np.zeros_like(centroids)
        counts = np.zeros(len(centroids), dtype=np.int64)
        for r in parts:
            sums[r["c"]] += np.array(r["s"])
            counts[r["c"]] += r["n"]
        nonzero = counts > 0
        centroids[nonzero] = sums[nonzero] / counts[nonzero, None]

    bc = spark.sparkContext.broadcast(centroids)

    def assign(batches):
        c = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(ivf_cluster=pd.Series(dtype="int32"))
                continue
            mat = np.array(pdf[emb_col].tolist(), dtype=np.float64)
            d2 = ((mat[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            yield pdf.assign(ivf_cluster=d2.argmin(axis=1).astype("int32"))

    from pyspark.sql import types as T
    # NB: StructType.add mutates in place — build a fresh StructType so the
    # input DataFrame's cached schema isn't poisoned
    schema = T.StructType(list(emb_df.schema.fields)
                          + [T.StructField("ivf_cluster", T.IntegerType())])
    assigned = emb_df.mapInPandas(assign, schema=schema)
    return assigned, centroids


def ivf_search(assigned: DataFrame, centroids: np.ndarray,
               query_df: DataFrame, k: int, n_probe: int = 4,
               id_col: str = "vec_id", emb_col: str = "embedding",
               qid_col: str = "query_id", qemb_col: str = "qe") -> DataFrame:
    """Probe the n_probe nearest centroids per query, brute-force cosine
    within those clusters only (partition pruning for vectors: the scan
    touches ~n_probe/K of the data).

    ONE pass for the whole query batch: the query matrix + per-query
    probe lists broadcast, the scan filters to the union of probed
    clusters, and each Arrow batch scores every query against only its
    own clusters' rows (mask on the cluster column) — no per-query
    driver loop / per-query Spark job."""
    spark = assigned.sparkSession
    ensure_pyfiles(spark)
    qrows = query_df.select(qid_col, qemb_col).collect()
    q_ids = np.array([r[0] for r in qrows], dtype=np.int64)
    q_mat = np.array([r[1] for r in qrows], dtype=np.float64)
    q_norm = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    d2 = ((centroids[None, :, :] - q_mat[:, None, :]) ** 2).sum(axis=2)
    probes = np.argsort(d2, axis=1)[:, :n_probe]  # (Q, n_probe)
    all_probed = sorted({int(c) for c in probes.ravel()})
    bq = spark.sparkContext.broadcast((q_ids, q_norm, probes))
    sub = assigned.filter(F.col("ivf_cluster").isin(all_probed))

    def local_topk(batches):
        ids, qn, pr = bq.value
        best: dict[int, list] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            e_ids = pdf[id_col].values.astype(np.int64)
            clusters = pdf["ivf_cluster"].values.astype(np.int64)
            mat = np.array(pdf[emb_col].tolist(), dtype=np.float64)
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            sims = qn @ mat.T  # (Q, B)
            for qi in range(len(ids)):
                mask = np.isin(clusters, pr[qi]) & (e_ids != ids[qi])
                cand = sims[qi][mask]
                cids = e_ids[mask]
                kk = min(k, len(cand))
                if kk == 0:
                    continue
                sel = np.argpartition(-cand, kk - 1)[:kk]
                cur = best.setdefault(int(ids[qi]), [])
                cur.extend(zip((-cand[sel]).tolist(), cids[sel].tolist()))
                cur.sort()
                del cur[k:]
        out = [(q, vid, -negcos) for q, rows in best.items()
               for negcos, vid in rows]
        yield pd.DataFrame(out, columns=[qid_col, id_col, "cos"])

    partial = sub.select(id_col, emb_col, "ivf_cluster").mapInPandas(
        local_topk, schema=f"{qid_col} long, {id_col} long, cos double")
    w = Window.partitionBy(qid_col).orderBy(F.col("cos").desc(),
                                            F.col(id_col).asc())
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, id_col, "cos", "rank")
    )


def write_ivf_index(assigned: DataFrame, centroids: np.ndarray,
                    path: str) -> None:
    """Persist the IVF index partitioned BY CLUSTER: probing n_probe of
    K clusters then touches n_probe/K of the files (Spark partition
    pruning on the `ivf_cluster=...` directories) — the disk layout that
    makes ivf_search's cluster filter a scan-level prune at 100 TB.
    Centroids ride along as a small JSON sidecar."""
    import json
    import os
    assigned.write.mode("overwrite").partitionBy("ivf_cluster").parquet(path)
    with open(os.path.join(path, "_ivf_centroids.json"), "w") as f:
        json.dump(centroids.tolist(), f)


def read_ivf_index(spark, path: str):
    import json
    import os
    with open(os.path.join(path, "_ivf_centroids.json")) as f:
        centroids = np.array(json.load(f), dtype=np.float64)
    return spark.read.parquet(path), centroids


def cosine_topk_partial(emb_df: DataFrame, query_df: DataFrame, k: int,
                        id_col: str = "vec_id", emb_col: str = "embedding",
                        qid_col: str = "query_id",
                        qemb_col: str = "qe") -> DataFrame:
    """Map-side local top-k cosine via numpy matmul, then global merge."""
    spark = emb_df.sparkSession
    ensure_pyfiles(spark)
    qrows = query_df.select(qid_col, qemb_col).collect()
    q_ids = np.array([r[0] for r in qrows], dtype=np.int64)
    q_mat = np.array([r[1] for r in qrows], dtype=np.float64)
    q_norm = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    bq = spark.sparkContext.broadcast((q_ids, q_norm))

    def local_topk(batches):
        ids, qn = bq.value
        best: dict[int, list] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            e_ids = pdf[id_col].values.astype(np.int64)
            mat = np.array(pdf[emb_col].tolist(), dtype=np.float64)
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            sims = qn @ mat.T  # (Q, B)
            for qi in range(len(ids)):
                mask = e_ids != ids[qi]
                cand = sims[qi][mask]
                cids = e_ids[mask]
                kk = min(k, len(cand))
                if kk == 0:
                    continue
                sel = np.argpartition(-cand, kk - 1)[:kk]
                cur = best.setdefault(int(ids[qi]), [])
                cur.extend(zip((-cand[sel]).tolist(), cids[sel].tolist()))
                cur.sort()
                del cur[k:]
        out = [(q, vid, -negcos) for q, rows in best.items()
               for negcos, vid in rows]
        yield pd.DataFrame(out, columns=[qid_col, id_col, "cos"])

    partial = emb_df.select(id_col, emb_col).mapInPandas(
        local_topk, schema=f"{qid_col} long, {id_col} long, cos double")
    w = Window.partitionBy(qid_col).orderBy(F.col("cos").desc(),
                                            F.col(id_col).asc())
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, id_col, "cos", "rank")
    )
