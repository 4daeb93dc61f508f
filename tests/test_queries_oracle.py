"""Differential test vs DuckDB — the in-repo replica of the driver gate
(SURVEY.md §5 pattern 3). Runs a fast subset at sf0.001; the full set runs
via tools/parity_check.py."""

import duckdb
import pytest

from geoio_jl_spark import queries as Q

FAST = [
    "pip_count", "pip_pairs_salted", "knn_join", "bbox_range_join",
    "extent", "cell_counts", "valid_counts", "invalid_rows", "centroid",
    "grid_tiles", "token_stats", "fingerprint", "cosine_topk",
    "events_window",
    # round-6 additions (fast at sf0.001; the slower bpe_encode is
    # covered by the full parity gate)
    "geohash_cells", "focal_mean", "pagerank", "bm25_score",
]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        "|".join(repr(r[i]) if isinstance(r[i], float) else str(r[i]) for i in order)
        for r in rows
    )


@pytest.mark.parametrize("name", FAST)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    fn, sql = Q.registry()[name]
    sdf = fn(spark, sf_dir)
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]
    rel = duck.sql(sql)
    dcols = [c.lower() for c in rel.columns]
    drows = rel.fetchall()
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows)
    assert _multiset(scols, srows) == _multiset(dcols, drows)


def _over_cap_names():
    names = list(Q.registry())
    return names[50:]


@pytest.mark.parametrize("name", _over_cap_names())
def test_rotated_out_query_matches_oracle(spark, sf_dir, duck, name):
    """Every entry past the driver's 50-query window stays gated here on
    every pytest run (ADVICE r6: rotation must not leave rotated-out
    queries checked by nothing but history)."""
    fn, sql = Q.registry()[name]
    if sql is None:
        pytest.skip("no SQL oracle (rows-only query)")
    sdf = fn(spark, sf_dir)
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]
    rel = duck.sql(sql)
    dcols = [c.lower() for c in rel.columns]
    drows = rel.fetchall()
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows)
    assert _multiset(scols, srows) == _multiset(dcols, drows)
