"""PageRank operator (operators/graph.py): analytic cases + the
fixed-point determinism contract."""

import pytest
from pyspark.sql import functions as F

from geoio_jl_spark.operators.graph import SCALE, pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def test_symmetric_cycle_stays_uniform(spark):
    """A directed cycle is doubly stochastic: ranks stay (near) r0
    forever — exact up to the fixed-point floor losses."""
    e = _edges(spark, [(1, 2), (2, 3), (3, 1)])
    r = {x["node"]: x["r"] for x in pagerank(e, iters=4).collect()}
    r0 = SCALE // 3
    assert set(r) == {1, 2, 3}
    assert len(set(r.values())) == 1            # symmetry preserved
    assert abs(r[1] - r0) < SCALE // 100        # floor losses only


def test_hub_outranks_leaves(spark):
    """Star pointing into a hub: the hub's rank exceeds every leaf's,
    and leaves (equal in-structure) tie exactly."""
    e = _edges(spark, [(i, 99) for i in range(1, 6)]
               + [(99, i) for i in range(1, 6)])
    r = {x["node"]: x["r"] for x in pagerank(e, iters=6).collect()}
    assert all(r[99] > r[i] for i in range(1, 6))
    assert len({r[i] for i in range(1, 6)}) == 1


def test_no_in_edges_gets_teleport_only(spark):
    """A source-only node keeps exactly the teleport term."""
    e = _edges(spark, [(1, 2), (2, 1), (3, 1)])   # 3 has no in-edges
    r = {x["node"]: x["r"] for x in pagerank(e, iters=3).collect()}
    import math
    r0 = int(math.floor(SCALE / 3.0))
    tele = int(math.floor(15 * r0 / 100.0))
    assert r[3] == tele


def test_duplicate_edges_collapse(spark):
    e1 = _edges(spark, [(1, 2), (1, 2), (2, 1)])
    e2 = _edges(spark, [(1, 2), (2, 1)])
    r1 = {x["node"]: x["r"] for x in pagerank(e1, iters=3).collect()}
    r2 = {x["node"]: x["r"] for x in pagerank(e2, iters=3).collect()}
    assert r1 == r2


def test_determinism_across_partitionings(spark):
    """Same graph under different partitioning -> bit-identical ranks
    (the int64 fixed-point sums are order-independent)."""
    import numpy as np
    rng = np.random.default_rng(91)
    pairs = [(int(a), int(b)) for a, b in rng.integers(0, 60, (300, 2))
             if a != b]
    e = _edges(spark, pairs)
    r1 = {x["node"]: x["r"]
          for x in pagerank(e.repartition(1), iters=4).collect()}
    r2 = {x["node"]: x["r"]
          for x in pagerank(e.repartition(17, "dst"), iters=4).collect()}
    assert r1 == r2


def test_empty_graph_raises(spark):
    empty = spark.createDataFrame([], "src bigint, dst bigint")
    with pytest.raises(ValueError, match="empty graph"):
        pagerank(empty, iters=1)