"""Z-order clustering: Morton interleave correctness vs a bit-twiddling
reference, and footer-stats evidence that the clustered layout makes
spatial ranges prunable (few files overlap any cell window)."""

import glob

import numpy as np
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from geoio_jl_spark.operators.zorder import write_spatially_clustered, zorder_col


def _morton_ref(i: int, j: int) -> int:
    z = 0
    for b in range(16):
        z |= ((i >> b) & 1) << (2 * b)
        z |= ((j >> b) & 1) << (2 * b + 1)
    return z


def test_zorder_matches_bitwise_reference(spark):
    rng = np.random.default_rng(2)
    pts = [(int(a), int(b)) for a, b in
           rng.integers(0, 65536, size=(300, 2))]
    df = spark.createDataFrame(pts, ["i", "j"]) \
        .withColumn("z", zorder_col("i", "j"))
    for r in df.collect():
        assert r["z"] == _morton_ref(r["i"], r["j"]), (r["i"], r["j"])


def test_clustered_layout_is_file_prunable(spark, tmp_path):
    """After zorder clustering, a 32x32 cell window overlaps only a few
    files' [min, max] zorder footer ranges; the unclustered layout
    overlaps nearly all files."""
    n = 200_000
    df = (spark.range(n)
          .withColumn("i", F.pmod(F.hash("id"), F.lit(1024)))
          .withColumn("j", F.pmod(F.hash(F.col("id") * 7 + 1), F.lit(1024))))
    clustered = str(tmp_path / "clustered")
    write_spatially_clustered(df, clustered, "i", "j", n_files=16)
    plain = str(tmp_path / "plain")
    df.withColumn("zorder", zorder_col("i", "j")) \
        .repartition(16).write.parquet(plain)

    def overlap_count(path, lo, hi):
        cnt = 0
        for f in glob.glob(path + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            names = {md.schema.column(c).name: c
                     for c in range(len(md.schema))}
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(names["zorder"]).statistics
                mins.append(st.min)
                maxs.append(st.max)
            if min(mins) <= hi and max(maxs) >= lo:
                cnt += 1
        return cnt

    # a spatially tight window: cells [256, 288) x [256, 288) — one
    # contiguous morton block [z0, z0 + 32*32)
    z0 = _morton_ref(256, 256)
    lo, hi = z0, z0 + 32 * 32 - 1
    pruned = overlap_count(clustered, lo, hi)
    unpruned = overlap_count(plain, lo, hi)
    assert pruned <= 2, pruned          # clustered: ~1 file covers it
    assert unpruned >= 12, unpruned     # random layout: nearly all files
    # correctness: the clustered table still holds every row
    assert spark.read.parquet(clustered).count() == n
