"""Deduplication operators over document tables (training-data pipeline
ops; SURVEY.md §2.7 web-text payload).

All four families return DataFrames and are built from plain relational
ops (explode / groupBy / self-join) so Catalyst plans them; the hashing
arithmetic matches ``dialect`` so each has an exact DuckDB oracle (wired
in queries.py):

- exact_duplicates: md5(text) groups
- minhash_lsh_pairs: shingle → md5-int → k universal-hash mins → banded
  signatures → candidate pairs sharing a band
- simhash_signatures: 32-bit simhash over token hashes
- ngram_jaccard_pairs: distinct-shingle inverted index → pairs with exact
  intersection/union counts
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geoio_jl_spark import dialect as D


def shingles_expr(text_col: str = "text", n: int = 3) -> str:
    toks = D.tokens_sql(text_col, "spark")
    parts = ", ".join(f"element_at({toks}, i + {k})" for k in range(n))
    return (
        f"transform(sequence(1, greatest(size({toks}) - {n - 1}, 0)), "
        f"i -> concat_ws(' ', {parts}))"
    )


def exact_duplicates(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    return (
        docs.groupBy(F.md5(text_col).alias("text_hash"))
        .agg(F.count("*").alias("n_copies"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_copies") > 1)
    )


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    sh = docs.select(
        id_col, F.explode(F.expr(shingles_expr(text_col))).alias("sh")
    ).withColumn("h", F.expr(D.md5_int60("sh", "spark")) % F.lit(D.MINHASH_P))
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(D.MINHASH_P)).alias(f"mh{j}")
        for j, (a, b) in enumerate(D.MINHASH_SEEDS)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    sig = minhash_signatures(docs, text_col, id_col)
    nr = len(D.MINHASH_SEEDS) // D.MINHASH_BANDS
    band_arr = F.array(*[
        F.concat_ws("_", *[f"mh{b * nr + r}" for r in range(nr)])
        for b in range(D.MINHASH_BANDS)
    ])
    allb = sig.select(id_col, F.posexplode(band_arr).alias("band", "sig")).persist()
    allb.count()
    out = (
        allb.alias("l").join(allb.alias("r"), ["band", "sig"])
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(F.col(f"l.{id_col}").alias("id_a"),
                F.col(f"r.{id_col}").alias("id_b"))
        .distinct()
    )
    return out


def simhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", bits: int = 32) -> DataFrame:
    toks = D.tokens_sql(text_col, "spark")
    exploded = docs.select(
        id_col, F.explode(F.expr(toks)).alias("tok")
    ).select(id_col, F.expr(D.md5_int60("tok", "spark")).alias("h"))
    votes = exploded.select(
        id_col, F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit"), "h"
    ).select(
        id_col, "bit",
        F.expr("CASE WHEN (shiftright(h, bit) & 1) = 1 THEN 1 ELSE -1 END").alias("w"),
    ).groupBy(id_col, "bit").agg(F.sum("w").alias("v"))
    return votes.groupBy(id_col).agg(
        F.sum(F.expr(
            "CASE WHEN v > 0 THEN shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT)) "
            "ELSE CAST(0 AS BIGINT) END")).alias("simhash"))


def ngram_jaccard_pairs(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", min_inter: int = 2) -> DataFrame:
    sh = (
        docs.select(id_col, F.explode(F.expr(shingles_expr(text_col))).alias("sh"))
        .distinct().persist()
    )
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    pairs = (
        sh.alias("l").join(sh.alias("r"), "sh")
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .groupBy(F.col(f"l.{id_col}").alias("id_a"),
                 F.col(f"r.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("inter"))
        .filter(F.col("inter") >= min_inter)
    )
    return (
        pairs.join(sizes.withColumnRenamed(id_col, "id_a")
                   .withColumnRenamed("n_sh", "na"), "id_a")
        .join(sizes.withColumnRenamed(id_col, "id_b")
              .withColumnRenamed("n_sh", "nb"), "id_b")
        .select("id_a", "id_b", "inter",
                (F.col("na") + F.col("nb") - F.col("inter")).alias("uni"))
    )
