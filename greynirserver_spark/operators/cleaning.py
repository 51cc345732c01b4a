"""Composite corpus-cleaning pipeline for training-data preparation.

One declarative plan that tags every document with its fate — the
C4/Gopher-style gate sequence over web text:

    1. language filter        (keep a target language)
    2. length gates           (too_short / too_long, in tokens)
    3. diversity gate         (low unique-token ratio = boilerplate/spam)
    4. exact dedup            (md5 groups, keep min doc_id)
    5. near-dup dedup         (optional: MinHash-LSH pairs, keep the
                               smaller doc_id of every verified pair)

First matching rule wins. Steps 1-4 are pure relational (SQL-mirrorable
for the DuckDB gate); step 5 composes the dedup operator family and is
rows-only checked. The output is a status column, not a filtered table,
so downstream consumers can both filter and audit drop reasons — at
10^12 docs the audit aggregate is what you actually look at.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from .dedup import minhash_lsh_pairs
from .textops import document_tokens

__all__ = ["clean_corpus", "clean_summary"]


def clean_corpus(
    docs: DataFrame,
    lang: Optional[str] = "en",
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    min_unique_ratio: float = 0.05,
    near_dup: bool = False,
    near_dup_threshold: float = 0.9,
) -> DataFrame:
    """(doc_id, status) for every input document.

    status in ('kept', 'lang', 'too_short', 'too_long', 'low_diversity',
    'exact_dup', 'near_dup').
    """
    stats = (
        document_tokens(docs)
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.countDistinct("term").cast("long").alias("n_unique"),
        )
    )
    w = Window.partitionBy(F.md5("text"))
    base = (
        docs.select("doc_id", "lang", "text")
        .withColumn("dup_min", F.min("doc_id").over(w))
        .join(stats, "doc_id", "left")
        .na.fill({"n_tokens": 0, "n_unique": 0})
    )

    lang_bad = (
        (F.col("lang") != F.lit(lang)) if lang is not None else F.lit(False)
    )
    status = (
        F.when(lang_bad, "lang")
        .when(F.col("n_tokens") < min_tokens, "too_short")
        .when(F.col("n_tokens") > max_tokens, "too_long")
        .when(
            F.col("n_unique") < F.col("n_tokens") * F.lit(min_unique_ratio),
            "low_diversity",
        )
        .when(F.col("dup_min") != F.col("doc_id"), "exact_dup")
        .otherwise("kept")
    )
    tagged = base.select("doc_id", status.alias("status"))

    if not near_dup:
        return tagged

    # near-dup pass over survivors only: drop the larger doc_id of each
    # verified pair (transitively greedy — the canonical keep-first rule)
    survivors = tagged.where(F.col("status") == "kept").select("doc_id")
    pairs = minhash_lsh_pairs(
        docs.join(survivors, "doc_id", "left_semi"),
        threshold=near_dup_threshold,
    )
    drop = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    return (
        tagged.join(drop.withColumn("_nd", F.lit(1)), "doc_id", "left")
        .select(
            "doc_id",
            F.when(
                (F.col("status") == "kept") & F.col("_nd").isNotNull(),
                "near_dup",
            )
            .otherwise(F.col("status"))
            .alias("status"),
        )
    )


def clean_summary(status_df: DataFrame) -> DataFrame:
    """Audit aggregate: documents per status (the number you watch)."""
    return (
        status_df.groupBy("status")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .orderBy("status")
    )
