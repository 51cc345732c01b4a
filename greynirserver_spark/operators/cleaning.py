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

__all__ = ["clean_corpus", "clean_summary", "gate_funnel"]


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


def gate_funnel(
    docs: DataFrame,
    stopwords=None,
    min_words: int = 50,
    ppl_max: float = 1e9,
) -> DataFrame:
    """Sequential-gate attrition report — the funnel a pipeline owner
    reads before training: (stage_idx, stage, n_in, n_dropped, n_out)
    for gopher -> perplexity -> exact-dup keep-first, each stage applied
    to the previous stage's survivors. Complements `clean_corpus` (per-
    document fates) with the per-stage aggregate view, composing the
    round-5 gates: `gopher_rules` (structural quality), the
    `unigram_logprob_scores` ppl cap (statistical quality, compared on
    the published 4-dp value so any engine re-deriving the gate from the
    scored table agrees), and md5 keep-first dedup ranked WITHIN the
    stage-2 survivor set (a duplicate whose first copy was dropped
    upstream keeps its earliest surviving copy).

    Scale shape: the flags are two gate joins plus one min-groupBy on
    the text digest (skew-safe: partial agg, no window over duplicate
    clusters); the funnel itself is ONE full aggregate folded map-side
    and exploded into three report rows — no driver-side loop, no
    second pass over the corpus.
    """
    from .textops import (
        GOPHER_STOPWORDS,
        gopher_rules,
        unigram_logprob_scores,
    )

    g = gopher_rules(
        docs, stopwords=stopwords or GOPHER_STOPWORDS, min_words=min_words
    ).select("doc_id", "passes")
    u = unigram_logprob_scores(docs).select("doc_id", "ppl")
    base = (
        docs.select("doc_id", F.md5("text").alias("h"))
        .join(g, "doc_id", "left")
        .join(u, "doc_id", "left")
        .na.fill({"passes": 0})
    )
    f1 = F.col("passes") == 1
    base = base.withColumn(
        "f2", f1 & F.col("ppl").isNotNull() & (F.col("ppl") <= ppl_max)
    )
    firsts = (
        base.where("f2").groupBy("h").agg(F.min("doc_id").alias("first_id"))
    )
    flags = (
        base.join(firsts, "h", "left")
        .select(
            f1.cast("long").alias("f1"),
            F.col("f2").cast("long").alias("f2"),
            (F.col("f2") & (F.col("doc_id") == F.col("first_id")))
            .cast("long").alias("f3"),
        )
    )
    agg = flags.agg(
        F.count("*").alias("n"),
        F.sum("f1").alias("s1"), F.sum("f2").alias("s2"),
        F.sum("f3").alias("s3"),
    )
    stage = lambda i, name, n_in, n_out: F.struct(  # noqa: E731
        F.lit(i).cast("long").alias("stage_idx"),
        F.lit(name).alias("stage"),
        n_in.cast("long").alias("n_in"),
        (n_in - n_out).cast("long").alias("n_dropped"),
        n_out.cast("long").alias("n_out"),
    )
    return agg.select(
        F.explode(
            F.array(
                stage(1, "gopher", F.col("n"), F.col("s1")),
                stage(2, "perplexity", F.col("s1"), F.col("s2")),
                stage(3, "exact_dup", F.col("s2"), F.col("s3")),
            )
        ).alias("r")
    ).select("r.*")
