"""Physical-plan regression tests — the scale properties the engine
promises (docs/PLANS.md) must survive refactors:

- polygon side of the spatial join broadcasts (no shuffle of the big side)
- parquet scans are pruned to the referenced columns
- no CartesianProduct anywhere in the oracle query set
"""

import contextlib
import io

import pytest

from geoio_jl_spark import queries as Q


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_pip_join_broadcasts_polygons(spark, sf_dir):
    p = plan_of(Q.q_pip_count(spark, sf_dir))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_docs_scan_pruned_to_one_column(spark, sf_dir):
    p = plan_of(Q.q_pip_count(spark, sf_dir))
    # documents has 5 columns; the join needs only doc_id
    assert "ReadSchema: struct<doc_id:bigint>" in p


def test_token_stats_scan_pruned(spark, sf_dir):
    p = plan_of(Q.q_token_stats(spark, sf_dir))
    assert "ReadSchema: struct<text:string,lang:string>" in p


def test_no_cartesian_products_anywhere(spark, sf_dir):
    offenders = []
    for name, (fn, _sql) in Q.registry().items():
        p = plan_of(fn(spark, sf_dir))
        if "CartesianProduct" in p:
            offenders.append(name)
    assert offenders == []


def test_salted_join_keeps_broadcast(spark, sf_dir):
    p = plan_of(Q.q_pip_pairs_salted(spark, sf_dir))
    assert "BroadcastHashJoin" in p


def test_url_canonical_is_shuffle_free(spark, sf_dir):
    """URL canonicalization is a pure projection: no Exchange, scan
    pruned to doc_id (the URL is derived; a real table would read url)."""
    p = plan_of(Q.q_url_canonical(spark, sf_dir))
    assert "Exchange" not in p
    assert "ReadSchema: struct<doc_id:bigint>" in p


def test_gopher_repetition_scan_pruned(spark, sf_dir):
    p = plan_of(Q.q_gopher_repetition(spark, sf_dir))
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in p
    assert "CartesianProduct" not in p


def test_warp_webmercator_is_pure_codegen(spark, sf_dir):
    """The registered column-transform fast path keeps the web-mercator
    warp entirely JVM-side — no Arrow/Python eval node in the plan."""
    p = plan_of(Q.q_raster_warp(spark, sf_dir))
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
