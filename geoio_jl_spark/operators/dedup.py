"""Deduplication operators over document tables (training-data pipeline
ops; SURVEY.md §2.7 web-text payload).

All four families return DataFrames and are built from plain relational
ops (explode / groupBy / self-join) so Catalyst plans them; the hashing
arithmetic matches ``dialect`` so each has an exact DuckDB oracle (wired
in queries.py):

- exact_duplicates: md5(text) groups
- minhash_star_edges (PRIMARY dedup API): shingle → minhash → banded
  buckets → per-bucket (min-id, member) star edges — linear output per
  bucket; feed operators/components.connected_components for keep/drop
- minhash_lsh_pairs (opt-in): full per-bucket pair sets — quadratic per
  bucket; only when the downstream genuinely needs every pair
- simhash_signatures: 32-bit simhash over token hashes
- ngram_jaccard_pairs: distinct-shingle inverted index → pairs with exact
  intersection/union counts; the stop-shingle DF cap is ON by default
  (max_df=DEFAULT_MAX_DF, pass None to opt out into the unbounded join)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geoio_jl_spark import dialect as D


def shingles_from_tokens(toks_col: str, n: int = 3) -> str:
    """Shingle transform over an ALREADY-materialized token array.
    (The array must be a real column: inlining the tokenizer expression
    here makes Spark re-evaluate split(text) inside the lambda for
    every position — O(tokens²) per document, measured 20× slower at
    sf0.1. Use exploded_shingles for the two-step projection.)"""
    parts = ", ".join(f"element_at({toks_col}, i + {k})" for k in range(n))
    # explicit short-doc guard: sequence(1, 0) DESCENDS in Spark
    # ([1, 0]) and ANSI element_at throws on the out-of-range indices a
    # < n-token doc would produce
    return (
        f"CASE WHEN size({toks_col}) < {n} "
        f"THEN CAST(array() AS array<string>) "
        f"ELSE transform(sequence(1, size({toks_col}) - {n - 1}), "
        f"i -> concat_ws(' ', {parts})) END"
    )


def exploded_shingles(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """(id, sh) rows: tokenize once per row (projection), then shingle
    over the token array column — linear in tokens."""
    return (docs
            .select(id_col, F.expr(D.tokens_sql(text_col, "spark"))
                    .alias("toks"))
            .select(id_col, F.explode(
                F.expr(shingles_from_tokens("toks", n))).alias("sh")))


def exact_duplicates(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    return (
        docs.groupBy(F.md5(text_col).alias("text_hash"))
        .agg(F.count("*").alias("n_copies"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_copies") > 1)
    )


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       fast_hash: bool = False) -> DataFrame:
    """``fast_hash=True`` swaps the dialect-portable md5-substring hash
    (needed for the DuckDB oracle, but it materializes a hex string per
    shingle) for JVM-native xxhash64 — ~an order of magnitude cheaper
    per shingle and the right choice at 100 TB where no cross-engine
    replay is needed. Bucket contents differ; dedup semantics (equal
    shingle sets → equal signatures) are identical."""
    if fast_hash:
        h = (F.pmod(F.xxhash64(F.col("sh")), F.lit(D.MINHASH_P))
             .cast("bigint"))
    else:
        h = F.expr(D.md5_int60("sh", "spark")) % F.lit(D.MINHASH_P)
    sh = exploded_shingles(docs, text_col, id_col).withColumn("h", h)
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(D.MINHASH_P)).alias(f"mh{j}")
        for j, (a, b) in enumerate(D.MINHASH_SEEDS)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Full per-bucket candidate pair sets — OPT-IN. A bucket of n docs
    emits n(n-1)/2 rows (a 10k-copy template page: 50M pairs); for
    dedup keep/drop use ``minhash_star_edges`` (n-1 rows per bucket,
    component-equivalent) + ``components.connected_components``."""
    sig = minhash_signatures(docs, text_col, id_col)
    nr = len(D.MINHASH_SEEDS) // D.MINHASH_BANDS
    band_arr = F.array(*[
        F.concat_ws("_", *[f"mh{b * nr + r}" for r in range(nr)])
        for b in range(D.MINHASH_BANDS)
    ])
    # Single-pass bucket-list plan instead of a self-join: the r4 plan
    # audit showed Spark does NOT reuse the shuffle stage across the two
    # sides of the old allb⋈allb join (verified executed plans: the
    # whole signature pipeline — scan, tokenize, shingle, 128 minhash
    # aggs — ran twice, zero ReusedExchange, with and without AQE
    # broadcast conversion).  groupBy(band, sig) → sorted id list →
    # explode i<j pairs computes signatures ONCE and shuffles once
    # (by bucket key) instead of twice; pair fanout is identical to the
    # join's output and stays executor-side inside the explode.
    allb = sig.select(id_col, F.posexplode(band_arr).alias("band", "sig"))
    buckets = (allb.groupBy("band", "sig")
               .agg(F.sort_array(F.collect_set(id_col)).alias("ids"))
               .filter(F.size("ids") > 1))
    pair_sql = (
        "flatten(transform(ids, (a, i) -> "
        "transform(slice(ids, i + 2, size(ids)), "
        "b -> struct(a AS id_a, b AS id_b))))"
    )
    return (buckets.select(F.explode(F.expr(pair_sql)).alias("p"))
            .select("p.id_a", "p.id_b")
            .distinct())


def minhash_star_edges(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Duplicate-cluster contraction: per (band, signature) bucket emit
    (representative = min id, member) STAR edges instead of all pairs.

    A bucket of n near-identical docs produces n-1 rows here versus
    n(n-1)/2 from the pair join — the difference between linear and
    quadratic output on boilerplate-heavy web text (a 10k-copy template
    page: 10k edges, not 50M). Connected components over these star
    edges equal components over the full pair graph, so downstream
    keep/drop decisions are unchanged."""
    sig = minhash_signatures(docs, text_col, id_col)
    nr = len(D.MINHASH_SEEDS) // D.MINHASH_BANDS
    band_arr = F.array(*[
        F.concat_ws("_", *[f"mh{b * nr + r}" for r in range(nr)])
        for b in range(D.MINHASH_BANDS)
    ])
    allb = sig.select(id_col, F.posexplode(band_arr).alias("band", "sig"))
    from pyspark.sql import Window
    w = Window.partitionBy("band", "sig")
    return (
        allb.withColumn("rep", F.min(id_col).over(w))
        .filter(F.col(id_col) != F.col("rep"))
        .select("rep", F.col(id_col).alias("member"))
        .distinct()
    )


def simhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", bits: int = 32) -> DataFrame:
    """One row per token, ONE groupBy with `bits` conditional sums —
    no bit explosion (the naive plan amplifies the shuffle ×bits), so
    partial aggregation combines map-side and the shuffle carries one
    row of 32 longs per (partition, doc)."""
    toks = D.tokens_sql(text_col, "spark")
    hashed = docs.select(
        id_col, F.explode(F.expr(toks)).alias("tok")
    ).select(id_col, F.expr(D.md5_int60("tok", "spark")).alias("h"))
    votes = [
        F.sum(F.expr(
            f"CASE WHEN (shiftright(h, {j}) & 1) = 1 THEN 1 ELSE -1 END"
        )).alias(f"v{j}")
        for j in range(bits)
    ]
    sig = " + ".join(
        f"(CASE WHEN v{j} > 0 THEN shiftleft(CAST(1 AS BIGINT), {j}) "
        f"ELSE CAST(0 AS BIGINT) END)" for j in range(bits))
    return (hashed.groupBy(id_col).agg(*votes)
            .select(id_col, F.expr(sig).alias("simhash")))


DEFAULT_MAX_DF = 1000  # stop-shingle cap: bounds per-shingle pair fanout


def ngram_jaccard_pairs(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", min_inter: int = 2,
                        max_df: int | None = DEFAULT_MAX_DF) -> DataFrame:
    """Inverted-index shingle self-join. ``max_df`` applies the standard
    stop-shingle rule: shingles appearing in more than max_df documents
    are dropped BEFORE the self-join (a shingle in n docs yields n² pair
    rows — unbounded on skewed web text without the cap). The cap is ON
    by default (DEFAULT_MAX_DF); pass ``max_df=None`` to opt into the
    unbounded exact join (only safe on bounded corpora — at web scale a
    single boilerplate shingle in 10⁶ docs would emit 10¹² pairs). The
    cap becomes a plain ``size(ids) <= max_df`` filter on the grouped
    bucket row (no separate hot-list branch); intersection AND union
    are computed over the capped shingle sets, so the result is the
    exact Jaccard of the filtered feature space.

    Plan shape (r5 rework — the r4 audit showed the old sh⋈sh self-join
    plus the hot-list and sizes branches re-ran the tokenize+shingle
    pipeline 8× per query, zero stage reuse): one inverted-index
    groupBy(sh) → per-shingle sorted id list → explode i<=j pairs
    (diagonal (a,a) rows carry each doc's kept-shingle count through
    the SAME aggregate) → groupBy(id_a, id_b).  The upstream pipeline
    runs exactly once; only the final small pair-count aggregate is
    branched (diag vs off-diag vs joins), so THAT is the piece
    materialized via ``localCheckpoint`` (plan truncation + block
    reuse, auto-freed when the RDD is GC'd — same pattern as
    operators/components.py; no CacheManager entry to leak across
    calls).  Per-shingle pair fanout is bounded by max_df²/2.

    r8 shuffle diet (guide §2.3/§2.4): ``collect_set`` already dedups
    (sh, id), so the old ``.distinct()`` shuffle of every posting is
    gone outright; and when the id range provably fits in 31 bits (one
    tiny min/max agg over the id column) each (id_a, id_b) pair is
    packed into ONE bigint through the quadratic explode + count —
    half the bytes and a single-long hash key in the dominant
    aggregate, unpacked only after counting."""
    sh = exploded_shingles(docs, text_col, id_col)
    buckets = (sh.groupBy("sh")
               .agg(F.sort_array(F.collect_set(id_col)).alias("ids")))
    if max_df is not None:
        buckets = buckets.filter(F.size("ids") <= max_df)
    bounds = docs.agg(F.min(id_col).alias("lo"),
                      F.max(id_col).alias("hi")).first()
    packable = (bounds["lo"] is not None and int(bounds["lo"]) >= 0
                and int(bounds["hi"]) < (1 << 31))
    if packable:
        # i<j pairs ++ diagonal (a,a) rows, packed a*2^32+b (exact:
        # 0 <= a <= b < 2^31 keeps the product under 2^63, ANSI-safe)
        contrib_sql = (
            "concat("
            "flatten(transform(ids, (a, i) -> "
            "transform(slice(ids, i + 2, size(ids)), "
            "b -> a * 4294967296L + b))), "
            "transform(ids, a -> a * 4294967296L + a))"
        )
        id_type = docs.schema[id_col].dataType
        g = (buckets.select(F.explode(F.expr(contrib_sql)).alias("k"))
             .groupBy("k")
             .agg(F.count("*").alias("cnt"))
             .select(F.shiftright("k", 32).cast(id_type).alias("id_a"),
                     F.col("k").bitwiseAND(F.lit(4294967295))
                     .cast(id_type).alias("id_b"),
                     "cnt")
             .localCheckpoint(eager=False))
    else:
        # i<j pairs (inter contributions) ++ diagonal (a,a) rows (each
        # doc in the bucket once → per-doc kept-shingle counts = n_sh)
        contrib_sql = (
            "concat("
            "flatten(transform(ids, (a, i) -> "
            "transform(slice(ids, i + 2, size(ids)), "
            "b -> struct(a AS id_a, b AS id_b)))), "
            "transform(ids, a -> struct(a AS id_a, a AS id_b)))"
        )
        g = (buckets.select(F.explode(F.expr(contrib_sql)).alias("p"))
             .groupBy(F.col("p.id_a").alias("id_a"),
                      F.col("p.id_b").alias("id_b"))
             .agg(F.count("*").alias("cnt"))
             .localCheckpoint(eager=False))
    diag = g.filter(F.col("id_a") == F.col("id_b")).select(
        F.col("id_a").alias("id"), F.col("cnt").alias("n_sh"))
    pairs = (g.filter((F.col("id_a") < F.col("id_b"))
                      & (F.col("cnt") >= min_inter))
             .withColumnRenamed("cnt", "inter"))
    return (
        pairs.join(diag.select(F.col("id").alias("id_a"),
                               F.col("n_sh").alias("na")), "id_a")
        .join(diag.select(F.col("id").alias("id_b"),
                          F.col("n_sh").alias("nb")), "id_b")
        .select("id_a", "id_b", "inter",
                (F.col("na") + F.col("nb") - F.col("inter")).alias("uni"))
    )


def _chunk_arr(toks_col: str, chunk_len: int):
    """Consecutive ``chunk_len``-token windows (ragged tail dropped)
    over an ALREADY-materialized token array column — linear in tokens
    (inlining the tokenizer here re-splits the text per chunk)."""
    toks = F.col(toks_col)
    n = (F.size(toks) / chunk_len).cast("int")
    return F.when(n > 0, F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.array_join(
            F.slice(toks, i * chunk_len + 1, chunk_len), " "))
    ).otherwise(F.array().cast("array<string>"))


def chunk_dup_stats(docs: DataFrame, chunk_len: int = 3,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Chunk-level (line/paragraph-analog) exact dedup stats — the
    C4/RefinedWeb-style "remove spans duplicated across documents" pass
    expressed relationally: split each doc into consecutive
    ``chunk_len``-token windows (ragged tail dropped), count how many of
    a doc's chunk INSTANCES occur in >= 2 distinct documents.

    → (id, n_chunks, dup_chunks).  Plan shape at scale: explode →
    groupBy(chunk) with map-side combine → join back on chunk → final
    groupBy(id).  A boilerplate chunk shared by 10⁶ docs makes the
    chunk join key hot — AQE skew-join splits it (the join carries only
    (chunk, df), no payload), and the final per-doc aggregate is
    uniform in |doc|.

    r8: the tokenizer is materialized as a REAL column before the chunk
    transform (an inlined ``split`` is re-evaluated inside the lambda
    for every chunk position — O(tokens²) per doc; same lesson as
    ``exploded_shingles``), and the exploded chunk table is
    localCheckpoint'd so the df-count branch and the join-back branch
    share ONE tokenize+explode pass instead of re-running it.
    """
    exploded = (docs
                .select(F.col(id_col),
                        F.split(F.col(text_col), " ").alias("_toks"))
                .select(F.col(id_col),
                        F.explode(_chunk_arr("_toks", chunk_len))
                        .alias("chunk"))
                .localCheckpoint(eager=False))
    df_counts = (exploded.groupBy("chunk")
                 .agg(F.count_distinct(id_col).alias("df")))
    per_doc = (exploded.join(df_counts, "chunk")
               .groupBy(id_col)
               .agg(F.count("*").alias("n_chunks"),
                    F.sum((F.col("df") >= 2).cast("bigint"))
                    .alias("dup_chunks")))
    # docs too short for one chunk still get a row (0, 0)
    return (docs.select(id_col)
            .join(per_doc, id_col, "left")
            .select(id_col,
                    F.coalesce("n_chunks", F.lit(0)).alias("n_chunks"),
                    F.coalesce("dup_chunks", F.lit(0)).alias("dup_chunks")))


def remove_dup_chunks(docs: DataFrame, chunk_len: int = 3,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Span REMOVAL — the cleaning half of :func:`chunk_dup_stats` (the
    actual C4/RefinedWeb "remove spans duplicated across documents"
    step): drop every chunk instance whose chunk occurs in >= 2
    distinct documents, rejoin the surviving chunks in original order,
    and keep the ragged token tail (it was never part of any chunk, so
    it is never "duplicated").

    → (id, clean_text, removed_chunks).  Plan shape at scale: explode
    chunks with position → groupBy(chunk) df filter (map-side combine;
    only df>=2 chunks survive into the join, so the join input is the
    dup set, not the corpus) → per-doc sorted dup-position arrays →
    ONE join back to the docs table on id → per-row reassembly with
    pure built-ins (split / filter-with-index / slice / concat_ws —
    whole-stage codegen, no Python crossing).  Invariant (tested):
    clean tokens ⊎ removed-chunk tokens == original tokens per doc.

    r8: the tokenizer and the chunk array are materialized as REAL
    columns wherever a lambda iterates over them (an inlined ``split``
    re-runs per chunk position — O(tokens²) per doc), and the exploded
    chunk table is localCheckpoint'd so the df-count branch and the
    dup-position branch share one tokenize+explode pass.
    """
    exploded = (docs
                .select(F.col(id_col),
                        F.split(F.col(text_col), " ").alias("_toks"))
                .select(F.col(id_col),
                        F.posexplode(_chunk_arr("_toks", chunk_len))
                        .alias("pos", "chunk"))
                .localCheckpoint(eager=False))
    dup_chunks = (exploded.groupBy("chunk")
                  .agg(F.count_distinct(id_col).alias("df"))
                  .filter(F.col("df") >= 2).select("chunk"))
    dup_pos = (exploded.join(dup_chunks, "chunk")
               .groupBy(id_col)
               .agg(F.sort_array(F.collect_set("pos")).alias("dpos")))
    base = (docs.join(dup_pos, id_col, "left")
            .withColumn("dpos", F.coalesce("dpos",
                                           F.array().cast("array<int>")))
            .withColumn("_toks", F.split(F.col(text_col), " "))
            .withColumn("_chunks", _chunk_arr("_toks", chunk_len)))
    n = (F.size("_toks") / chunk_len).cast("int")
    kept_str = F.array_join(
        F.filter(F.col("_chunks"),
                 lambda c, i: ~F.array_contains("dpos", i)), " ")
    tail_str = F.array_join(
        F.slice(F.col("_toks"), n * chunk_len + 1, F.size("_toks")), " ")
    return base.select(
        F.col(id_col),
        F.concat_ws(" ", F.nullif(kept_str, F.lit("")),
                    F.nullif(tail_str, F.lit(""))).alias("clean_text"),
        F.size("dpos").alias("removed_chunks"))
