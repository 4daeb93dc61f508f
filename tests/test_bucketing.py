"""Bucketed co-located joins: same-bucket tables join with ZERO
Exchange operators (the disk layout that removes the shuffle for
repeated same-key joins at scale)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geoio_jl_spark.plans.bucketing import (
    bucketed_join, exchanges_in_plan, write_bucketed,
)


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(0, 5000).withColumn("va", F.col("id") * 2)
        b = spark.range(0, 5000).withColumn("vb", F.col("id") % 7)
        write_bucketed(a, "bk_a", "id", n_buckets=8)
        write_bucketed(b, "bk_b", "id", n_buckets=8)
        joined = bucketed_join(spark, "bk_a", "bk_b", "id")
        assert exchanges_in_plan(joined) == 0
        assert joined.count() == 5000
        # the same join on plain parquet DOES shuffle both sides
        plain = a.join(b, "id")
        assert exchanges_in_plan(plain) >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS bk_a")
        spark.sql("DROP TABLE IF EXISTS bk_b")


def test_ann_bucket_cap_bounds_degenerate_buckets(spark):
    """max_bucket drops a planted degenerate bucket (identical
    embeddings all land in one signature) from the pair blow-up."""
    from geoio_jl_spark.operators import similarity as S
    rng = np.random.default_rng(9)
    n_dup = 40
    rows = [(i, [1.0] * S.DIM) for i in range(n_dup)]          # one bucket
    rows += [(100 + i, rng.normal(size=S.DIM).tolist()) for i in range(20)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    uncapped = S.ann_candidate_pairs(df).count()
    capped = S.ann_candidate_pairs(df, max_bucket=10).count()
    assert uncapped >= n_dup * (n_dup - 1) / 2
    assert capped < uncapped / 10
