"""PII redaction — the scrubbing pass every public-webtext training
pipeline runs before tokenization (emails / IP addresses / phone
numbers → typed placeholder tokens, as in C4/Dolma-style cleaning).

No reference counterpart (LLM-pipeline axis of the brief); the operator
follows the repo's kernel discipline: pure ``pyspark.sql.functions``
regex built-ins (JVM-side, whole-stage codegen) — no Python crossing,
no shuffle, embarrassingly parallel over the scan, so the plan is a
single mapper stage at any scale.

Pattern notes: the three patterns are written in the common subset of
Java regex and RE2 syntax (character classes, bounded repetition, word
boundaries; no backreferences or lookaround) so the DuckDB oracle can
run the byte-identical pattern.  Replacement order is fixed
(email → phone → IPv4) and counts are measured on the RAW text per
pattern independently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Shared with the DuckDB oracle (dialect-compatible: Java regex ∩ RE2).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+\d{1,2} \d{3} \d{3} \d{4}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
CARD_RE = r"\b\d{13,19}\b"

EMAIL_TOKEN, PHONE_TOKEN, IP_TOKEN = "<EMAIL>", "<PHONE>", "<IP>"
CARD_TOKEN = "<CARD>"


def _luhn_valid_sql(cand: str, dialect: str) -> str:
    """Luhn checksum over a digit string — the same pure-SQL aggregate
    in both dialects (reversed digits; every second one doubled with
    digit-sum), so card VALIDATION, not just the regex shape, runs
    engine-side.  ``cand`` is an expression naming one candidate."""
    if dialect == "spark":
        return (
            f"aggregate(transform(sequence(0, length({cand}) - 1), i -> "
            f"  CASE WHEN i % 2 = 0 "
            f"  THEN ascii(substring(reverse({cand}), i + 1, 1)) - 48 "
            f"  ELSE IF((ascii(substring(reverse({cand}), i + 1, 1)) - 48) * 2 > 9, "
            f"          (ascii(substring(reverse({cand}), i + 1, 1)) - 48) * 2 - 9, "
            f"          (ascii(substring(reverse({cand}), i + 1, 1)) - 48) * 2) END), "
            f"0, (acc, x) -> acc + x) % 10 = 0"
        )
    return (
        f"list_sum([CASE WHEN i % 2 = 0 "
        f"  THEN ascii(substring(reverse({cand}), i + 1, 1)) - 48 "
        f"  ELSE CASE WHEN (ascii(substring(reverse({cand}), i + 1, 1)) - 48) * 2 > 9 "
        f"       THEN (ascii(substring(reverse({cand}), i + 1, 1)) - 48) * 2 - 9 "
        f"       ELSE (ascii(substring(reverse({cand}), i + 1, 1)) - 48) * 2 END END "
        f"  for i in generate_series(0, length({cand}) - 1)]) % 10 = 0"
    )


def card_redact_sql(text_expr: str, dialect: str) -> str:
    """Replace every Luhn-VALID 13-19 digit run with ``<CARD>`` —
    candidates from the regex, validation by checksum, replacement by a
    left fold over the valid candidates.  Same composition in both
    dialects (Spark ``aggregate`` / DuckDB ``list_reduce`` with the
    text prepended as the fold seed)."""
    # The fold replaces with \b-anchored regex, not literal replace: a
    # candidate's digit run can also appear EMBEDDED in a longer token
    # ("a4532...66b") that the \b-anchored extraction pattern explicitly
    # did not match, and a literal replace would over-redact it (review
    # finding).  Candidates are pure digits, so no regex escaping needed.
    if dialect == "spark":
        # Spark SQL string literals process backslash escapes; DuckDB's
        # don't — double them on the Spark side only (urls.py's _pat
        # convention)
        pat = CARD_RE.replace("\\", "\\\\")
        cands = (f"filter(regexp_extract_all({text_expr}, "
                 f"'{pat}', 0), c -> {_luhn_valid_sql('c', 'spark')})")
        return (f"aggregate({cands}, {text_expr}, (acc, c) -> "
                f"regexp_replace(acc, concat('\\\\b', c, '\\\\b'), "
                f"'{CARD_TOKEN}'))")
    cands = (f"list_filter(regexp_extract_all({text_expr}, '{CARD_RE}'), "
             f"c -> {_luhn_valid_sql('c', 'duckdb')})")
    return (f"list_reduce(list_prepend({text_expr}, {cands}), "
            f"(acc, c) -> regexp_replace(acc, '\\b' || c || '\\b', "
            f"'{CARD_TOKEN}', 'g'))")


def card_count_sql(text_expr: str, dialect: str) -> str:
    if dialect == "spark":
        pat = CARD_RE.replace("\\", "\\\\")
        return (f"size(filter(regexp_extract_all({text_expr}, "
                f"'{pat}', 0), c -> {_luhn_valid_sql('c', 'spark')}))")
    return (f"CAST(len(list_filter(regexp_extract_all({text_expr}, "
            f"'{CARD_RE}'), c -> {_luhn_valid_sql('c', 'duckdb')})) AS INT)")


def redact_pii(df: DataFrame, text_col: str = "text",
               out_col: str = "clean_text") -> DataFrame:
    """Append ``out_col`` (redacted text) and per-kind match counts.

    Counts come from ``regexp_extract_all`` over the raw text (not the
    partially-redacted string), so each kind is independent of the
    replacement order."""
    raw = F.col(text_col)
    red = F.regexp_replace(raw, EMAIL_RE, EMAIL_TOKEN)
    red = F.regexp_replace(red, PHONE_RE, PHONE_TOKEN)
    red = F.regexp_replace(red, IPV4_RE, IP_TOKEN)
    tmp = "__pii_tmp"
    out = df.select(
        "*",
        red.alias(tmp),
        F.size(F.regexp_extract_all(raw, F.lit(EMAIL_RE), F.lit(0)))
         .alias("n_emails"),
        F.size(F.regexp_extract_all(raw, F.lit(PHONE_RE), F.lit(0)))
         .alias("n_phones"),
        F.size(F.regexp_extract_all(raw, F.lit(IPV4_RE), F.lit(0)))
         .alias("n_ips"),
        F.expr(card_count_sql(text_col, "spark")).alias("n_cards"),
    )
    return (out.withColumn(out_col, F.expr(card_redact_sql(tmp, "spark")))
            .drop(tmp))
