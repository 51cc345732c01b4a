"""PII redaction — the privacy scrub every published web-corpus
pipeline runs before training (emails, phone numbers, IP addresses,
national-ID-shaped digit runs).

The reference engine stores scraped article text verbatim
(/root/reference/article.py persists `text` as extracted); a
training-data deployment of the same corpus must scrub
personally-identifying spans first. This operator is pure JVM —
chained `regexp_replace`/`regexp_extract_all` inside one codegen
stage, no Python, no shuffle at all (fully row-local), so it runs at
scan speed on any corpus size.

Pattern notes: the expressions deliberately stay inside the common
subset of Java regex (Spark) and RE2 (DuckDB oracle, and what a
Go/Rust scrubber would use) — character classes and greedy counted
quantifiers only, no backreferences or lookaround, so leftmost-first
(Java) and leftmost-longest (RE2) agree on every match. Order matters
and is fixed: emails first (their local part may contain digit runs an
ID pattern would claim), then national-ID-shaped runs, then IPv4, then
international phone runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["pii_redact", "PII_PATTERNS"]

# (name, regex, replacement token) — applied in this order
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    # kennitala-shaped: 6 digits, optional dash, 4 digits
    ("id", r"\d{6}-\d{4}", "<ID>"),
    ("ipv4", r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", "<IP>"),
    # international phone: '+' then 7+ digits with optional separators
    ("phone", r"\+\d[\d. -]{5,}\d", "<PHONE>"),
)


def pii_redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_email, n_id, n_ipv4, n_phone, clean_text): per-class
    match counts plus the text with every PII span replaced by its
    class token. Counts are taken before any replacement on the
    *partially scrubbed* text each pattern actually sees, so a span is
    counted by exactly one class (the first in PII_PATTERNS order that
    claims it)."""
    cur: Column = F.col(text_col)
    counts = []
    for name, pat, token in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0)))
            .cast("long").alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, pat, token)
    return docs.select("doc_id", *counts, cur.alias("clean_text"))
