"""Bigram LM surprisal (operators/lm.py): hand-computed model on a tiny
corpus, partitioning invariance of the fixed-point totals, and the
<2-token exclusion contract."""

import math

import pytest
from pyspark.sql import functions as F

from geoio_jl_spark.operators.lm import (bigram_expand, bigram_model,
                                         bigram_surprisal)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, ["a", "b", "a", "b"]),      # bigrams: ab, ba, ab
        (2, ["a", "b", "c"]),           # ab, bc
        (3, ["c"]),                     # no bigram -> excluded
        (4, []),                        # no bigram -> excluded
    ]
    return spark.createDataFrame(rows, "doc_id long, t array<string>")


def test_bigram_expand_counts(corpus):
    bg = bigram_expand(corpus).collect()
    pairs = sorted((r["doc_id"], r["w1"], r["w2"]) for r in bg)
    assert pairs == [(1, "a", "b"), (1, "a", "b"), (1, "b", "a"),
                     (2, "a", "b"), (2, "b", "c")]


def test_model_matches_hand_computation(corpus):
    # corpus bigrams: ab x3, ba x1, bc x1 ; c1: a=3, b=2 ; V = |{a,b}| = 2
    got = {(r["w1"], r["w2"]): r["sup_e6"]
           for r in bigram_model(bigram_expand(corpus)).collect()}

    def sup(c12, c1, v=2):
        return math.floor(-math.log((c12 + 1.0) / (c1 + v)) * 1e6)

    assert got == {("a", "b"): sup(3, 3), ("b", "a"): sup(1, 2),
                   ("b", "c"): sup(1, 2)}


def test_surprisal_totals_and_exclusion(corpus):
    out = {r["doc_id"]: r for r in bigram_surprisal(corpus).collect()}
    assert set(out) == {1, 2}           # <2-token docs excluded
    ab = math.floor(-math.log(4.0 / 5.0) * 1e6)
    ba = math.floor(-math.log(2.0 / 4.0) * 1e6)
    bc = math.floor(-math.log(2.0 / 4.0) * 1e6)
    assert out[1]["n_bigrams"] == 3
    assert out[1]["total_surprisal_e6"] == 2 * ab + ba
    assert out[1]["avg_surprisal_e6"] == (2 * ab + ba) / 3
    assert out[2]["total_surprisal_e6"] == ab + bc


def test_partitioning_invariance(corpus):
    a = sorted(map(tuple, bigram_surprisal(corpus).collect()))
    b = sorted(map(tuple,
                   bigram_surprisal(corpus.repartition(7)).collect()))
    assert a == b


def test_no_python_eval_in_plan(corpus):
    plan = bigram_surprisal(corpus)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan
