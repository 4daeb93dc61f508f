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

EMAIL_TOKEN, PHONE_TOKEN, IP_TOKEN = "<EMAIL>", "<PHONE>", "<IP>"


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
    return df.select(
        "*",
        red.alias(out_col),
        F.size(F.regexp_extract_all(raw, F.lit(EMAIL_RE), F.lit(0)))
         .alias("n_emails"),
        F.size(F.regexp_extract_all(raw, F.lit(PHONE_RE), F.lit(0)))
         .alias("n_phones"),
        F.size(F.regexp_extract_all(raw, F.lit(IPV4_RE), F.lit(0)))
         .alias("n_ips"),
    )
