"""Distributed BPE tokenizer TRAINING (Sennrich et al. merge learning) —
the step that produces the merge table which ``bpe_tokens``-style
tokenizers then apply.

No reference counterpart (LLM-pipeline axis of the brief).  Scale shape
is the one that matters at 100 TB: the corpus is aggregated ONCE into a
(word, count) table (shuffle O(|corpus|) with map-side combine — the
classic trainer's first step), and every merge round then runs over the
VOCABULARY table only (|vocab| ~ 10^8 rows for a web corpus, ~10^6×
smaller than the corpus).  Per round: explode adjacent symbol pairs
weighted by word count → one partial-aggregated groupBy → a SINGLE-ROW
collect of the winning pair (the same accepted small-by-contract driver
round-trip as the IVF seeds / connected-components convergence checks) →
apply the merge with literal ``replace`` passes and localCheckpoint the
new vocabulary (bounded lineage, components.py discipline).

Merge application detail: one ``replace(' a b ', ' ab ')`` pass merges
left-to-right but misses occurrences that share a boundary space with a
previous match ("a b a b" → "ab a b"), so the replace is applied
``_REPLACE_PASSES`` times — occurrences halve per pass, so 6 passes
cover symbol chains up to 2^6, far beyond real word lengths.  The DuckDB
oracle unrolls the identical rounds (same pass count, same
count-desc/pair-asc tie-break), so learned merges are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_REPLACE_PASSES = 6
END = "</w>"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """corpus → (word, cnt): the one corpus-sized aggregation."""
    return (docs
            .select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
            .filter(F.col("word") != "")
            .groupBy("word").agg(F.count("*").alias("cnt")))


def _initial_symbols(words: DataFrame) -> DataFrame:
    sym = F.concat(F.array_join(F.split("word", ""), " "),
                   F.lit(" " + END))
    return words.select(sym.alias("sym"), "cnt")


def _apply_merge(sym, a: str, b: str):
    """Merge every standalone occurrence of symbol pair (a, b)."""
    search = F.lit(f" {a} {b} ")
    repl = F.lit(f" {a}{b} ")
    out = F.concat(F.lit(" "), sym, F.lit(" "))
    for _ in range(_REPLACE_PASSES):
        out = F.replace(out, search, repl)
    return F.trim(out)


def train_bpe(docs: DataFrame, n_merges: int,
              text_col: str = "text",
              checkpoint_every: int = 4) -> list[tuple[str, int]]:
    """Learn ``n_merges`` BPE merges → [(pair, summed count), ...].

    The vocabulary is materialized with ``localCheckpoint`` every
    ``checkpoint_every`` rounds rather than every round: between
    checkpoints a round's aggregation recomputes at most
    ``checkpoint_every × _REPLACE_PASSES`` literal string replaces over
    the vocab table — far cheaper than an extra materialization per
    round — while lineage depth stays bounded."""
    vocab = _initial_symbols(word_counts(docs, text_col)).localCheckpoint()
    merges: list[tuple[str, int]] = []
    for r in range(n_merges):
        parts = F.split("sym", " ")
        # guard: sequence(0, -1) would run DESCENDING for fully-merged
        # single-symbol words
        pairs = F.when(
            F.size(parts) >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size(parts) - 2),
                lambda i: F.concat_ws(" ", parts[i], parts[i + 1])),
        ).otherwise(F.array().cast("array<string>"))
        best = (vocab
                .select(F.explode(pairs).alias("pair"), "cnt")
                .groupBy("pair").agg(F.sum("cnt").alias("c"))
                .orderBy(F.desc("c"), F.asc("pair"))
                .limit(1)
                .collect())
        if not best:
            break
        pair, c = best[0]["pair"], int(best[0]["c"])
        merges.append((pair, c))
        a, b = pair.split(" ")
        vocab = vocab.select(
            _apply_merge(F.col("sym"), a, b).alias("sym"), "cnt")
        if (r + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint()
    return merges


def apply_bpe(docs: DataFrame, merges: list[tuple[str, int] | str],
              text_col: str = "text",
              out_col: str = "bpe_sym") -> DataFrame:
    """Tokenize with a learned merge list (same replace-pass kernel).

    Merges are applied per WORD inside the array lambda — never across
    word boundaries (a merged symbol ending in the terminal marker must
    not pair with the next word's first character).

    The merge list compiles into one Catalyst expression of
    ``len(merges) × _REPLACE_PASSES`` nested replaces, so this form is
    for SMALL merge tables (analysis cost and JVM codegen limits are
    superlinear in expression depth); a production tokenizer with
    thousands of merges should apply them round-by-round over a
    materialized column (train_bpe's shape) or in an Arrow kernel —
    enforced with a named error rather than an opaque codegen failure."""
    if len(merges) > 64:
        raise ValueError(
            f"{len(merges)} merges would compile into a "
            f"{len(merges) * _REPLACE_PASSES}-deep expression tree; "
            "apply large merge tables round-by-round over a "
            "materialized column instead")
    pairs = [(m[0] if isinstance(m, tuple) else m) for m in merges]

    def word_to_sym(w):
        col = F.concat(F.array_join(F.split(w, ""), " "),
                       F.lit(" " + END))
        for pair in pairs:
            a, b = pair.split(" ")
            col = _apply_merge(col, a, b)
        return col

    return docs.withColumn(
        out_col,
        F.transform(F.split(F.col(text_col), " "), word_to_sym))
