"""Benchmark decontamination — flag training documents that share token
n-grams with an evaluation set (the GPT-3/PaLM/Llama report methodology:
a doc is contaminated when any n-gram of the eval corpus appears in it).

No reference counterpart (LLM-pipeline axis of the brief).  Scale shape:
the eval side is orders of magnitude smaller than the training corpus,
so its distinct n-gram set is built once and BROADCAST — the training
side stays a scan → explode → broadcast-hash-semi-join → per-doc partial
count, with no all-to-all shuffle of corpus n-grams.  At eval sets too
large to broadcast raw strings, ``use_hash=True`` joins on xxhash64
fingerprints (8 bytes/gram instead of ~10×), the standard trick.  The
hash path is APPROXIMATE: a 64-bit collision between any corpus gram
and any eval gram false-flags a clean doc (expected collisions grow
with \\|corpus grams\\| × \\|eval grams\\| / 2^64 — negligible at test
scale, a real consideration at 10^12 × 10^8), and colliding distinct
grams merge in the per-doc count.  The string path is exact and is
what the driver oracle runs; the two paths agree on collision-free
data (asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _gram_arr(toks_col: str, n: int):
    """n-gram windows over an ALREADY-materialized token array column.
    (Inlining ``split`` here would re-tokenize the text inside the
    lambda for every gram position — O(tokens²) per doc; the two-step
    projection is the guaranteed-linear shape, same lesson as
    operators/dedup.exploded_shingles.)"""
    toks = F.col(toks_col)
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " ")),
    ).otherwise(F.array().cast("array<string>"))


def eval_ngrams(bench: DataFrame, n: int,
                text_col: str = "text") -> DataFrame:
    """Distinct token n-grams of the (small) evaluation corpus."""
    return (bench
            .select(F.split(F.col(text_col), " ").alias("_toks"))
            .select(F.explode(_gram_arr("_toks", n)).alias("gram"))
            .distinct())


def decontaminate(docs: DataFrame, bench: DataFrame, n: int = 8,
                  id_col: str = "doc_id", text_col: str = "text",
                  use_hash: bool = False) -> DataFrame:
    """→ (id, n_overlap, contaminated): distinct eval n-grams found in
    each training doc, and a 0/1 flag."""
    grams = eval_ngrams(bench, n, text_col)
    exploded = (docs
                .select(F.col(id_col),
                        F.split(F.col(text_col), " ").alias("_toks"))
                .select(F.col(id_col),
                        F.explode(_gram_arr("_toks", n)).alias("gram")))
    if use_hash:
        grams = grams.select(F.xxhash64("gram").alias("gh")).distinct()
        exploded = exploded.select(id_col, F.xxhash64("gram").alias("gh"))
        key = "gh"
    else:
        key = "gram"
    hits = (exploded.join(F.broadcast(grams), key)
            .groupBy(id_col)
            .agg(F.count_distinct(key).alias("n_overlap")))
    return (docs.select(id_col)
            .join(hits, id_col, "left")
            .select(
                F.col(id_col),
                F.coalesce("n_overlap", F.lit(0)).cast("int")
                 .alias("n_overlap"))
            .withColumn("contaminated",
                        (F.col("n_overlap") > 0).cast("int")))
