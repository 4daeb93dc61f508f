"""Corpus-trained bigram language-model surprisal — the CCNet/Gopher
"perplexity filter" shape: train token-bigram statistics on the corpus
itself, score every document by its average per-bigram surprisal, and
drop the tails (low = boilerplate/templated, high = garbled).

Scale shape (the only plan that works at 100 TB):

* the model is a **groupBy on (w1, w2)** — partial-aggregable, so the
  map side collapses each partition's bigrams before the shuffle; model
  size is bounded by observed-vocabulary², not corpus size;
* scoring joins the bigram stream back to the model on (w1, w2) — a
  plain shuffle equi-join; hot bigrams ("of the") are exactly the AQE
  skew-join case, and the model side is pre-aggregated to one row per
  key so the split is cheap;
* no Python anywhere: tokenize/bigram expansion are codegen
  ``transform``/``explode``, the math is ``ln`` on integer-derived
  doubles.

Cross-engine determinism (the repo's fixed-point precedent, see
operators/graph.py): each distinct bigram's surprisal is computed ONCE
as ``floor(-ln((c12+1)/(c1+V)) * 1e6)`` — identical IEEE ops on
identical integers in Spark and DuckDB — and per-document totals are
**integer sums**, immune to float summation order under any
partitioning.  Smoothing is add-one over the prefix vocabulary.

Reference has no counterpart (GeoIO.jl is a geo I/O library); this is
part of the training-data-pipeline surface the graft brief adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bigram_expand(docs: DataFrame, id_col: str = "doc_id",
                  tokens_col: str = "t") -> DataFrame:
    """Token array → one row per adjacent pair (w1, w2).  Documents with
    fewer than two tokens contribute nothing (and are absent from the
    score output — a <2-token doc has no bigram evidence either way)."""
    return (docs
            .filter(F.size(tokens_col) >= 2)
            .select(
                id_col,
                F.explode(F.expr(
                    f"transform(sequence(0, size({tokens_col}) - 2), "
                    f"i -> struct({tokens_col}[i] AS w1, "
                    f"{tokens_col}[i + 1] AS w2))")).alias("b"))
            .select(id_col, "b.w1", "b.w2"))


def bigram_model(bg: DataFrame) -> DataFrame:
    """(w1, w2) stream → per-bigram add-one-smoothed surprisal table:
    (w1, w2, sup_e6) with sup_e6 = floor(-ln((c12+1)/(c1+V)) * 1e6)."""
    m = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    u = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = bg.agg(F.countDistinct("w1").alias("vocab"))
    p = (F.col("c12") + F.lit(1.0)) / (F.col("c1") + F.col("vocab"))
    return (m.join(u, "w1")
            .join(F.broadcast(vocab))          # 1-row corpus constant
            .withColumn("sup_e6",
                        F.floor(-F.log(p) * F.lit(1000000.0))
                        .cast("bigint"))
            .select("w1", "w2", "sup_e6"))


def bigram_surprisal(docs: DataFrame, id_col: str = "doc_id",
                     tokens_col: str = "t") -> DataFrame:
    """Per-document LM quality score over a tokenized corpus:
    (id, n_bigrams, total_surprisal_e6, avg_surprisal_e6)."""
    bg = bigram_expand(docs, id_col, tokens_col)
    model = bigram_model(bg)
    return (bg.join(model, ["w1", "w2"])
            .groupBy(id_col)
            .agg(F.count("*").cast("bigint").alias("n_bigrams"),
                 F.sum("sup_e6").alias("total_surprisal_e6"))
            .withColumn("avg_surprisal_e6",
                        F.col("total_surprisal_e6").cast("double")
                        / F.col("n_bigrams")))
