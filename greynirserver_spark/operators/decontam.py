"""Benchmark decontamination + intra-document repetition gates.

Two standard training-data n-gram gates a 100 TB pipeline runs next to
dedup (both pure JVM — tokenize, n-gram assembly, hash joins; no Python
in the hot path):

* **contamination_report** — the eval-leak check: any document sharing
  an n-gram (default 8-gram, the common published choice) with a
  benchmark/eval set is flagged so it can be dropped before training.
  The benchmark side is tiny by construction (eval suites are ~10^5-6
  n-grams), so the join broadcasts below a size gate and falls back to
  a shuffle hash join above it — the corpus side streams through one
  explode + join + partial-agg, linear at any corpus size.
* **ngram_repetition** — the Gopher-style within-document repetition
  filter: the fraction of duplicate n-grams inside each document
  (1 - distinct/total). High ratios mark boilerplate/spam/looping
  generator output. One groupBy over exploded n-grams with map-side
  partial aggregation.

The reference has no training-pipeline analog (its corpus is curated
news scraped per-site); these follow the published web-pipeline designs
(C4/Gopher-class gates) the engine's documents table exists to serve.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..tokenization import MAX_WORD_LEN, TOKEN_SPLIT_RE

__all__ = ["contamination_report", "ngram_repetition", "benchmark_ngrams"]

# eval-suite n-gram sets are small; broadcast under this row count,
# shuffle-join above (same gate pattern as the segment term dictionary)
BENCH_BROADCAST_MAX = 2_000_000


def _tokens_arr() -> Column:
    return F.filter(
        F.split(F.lower(F.col("text")), TOKEN_SPLIT_RE),
        lambda x: (F.length(x) >= 1) & (F.length(x) <= MAX_WORD_LEN),
    )


def _ngrams(arr: Column, n: int) -> Column:
    """All word n-grams of a token array as space-joined strings —
    JVM-side (sequence + slice + concat_ws inside codegen)."""
    return F.when(
        F.size(arr) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(arr) - n),
            lambda i: F.concat_ws(" ", F.slice(arr, i + F.lit(1), n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def benchmark_ngrams(bench_docs: DataFrame, n: int = 8) -> DataFrame:
    """DISTINCT n-grams of the benchmark/eval set: (gram). Build once,
    reuse across corpus shards."""
    return (
        bench_docs.select(F.explode(_ngrams(_tokens_arr(), n)).alias("gram"))
        .distinct()
    )


def contamination_report(
    docs: DataFrame,
    bench_docs: DataFrame,
    n: int = 8,
    min_hits: int = 1,
    bench_ngrams: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, n_hits, contaminated) for every document: n_hits is the
    number of DISTINCT benchmark n-grams the document contains,
    contaminated = n_hits >= *min_hits*. Pass a prebuilt
    :func:`benchmark_ngrams` frame to amortize the benchmark side."""
    bench = (
        benchmark_ngrams(bench_docs, n)
        if bench_ngrams is None else bench_ngrams
    )
    n_bench = bench.count()
    if n_bench <= BENCH_BROADCAST_MAX:
        bench = F.broadcast(bench)
    doc_grams = docs.select(
        "doc_id", F.explode(_ngrams(_tokens_arr(), n)).alias("gram")
    ).distinct()
    hits = (
        doc_grams.join(bench, "gram")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_hits"))
    )
    return (
        docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) >= min_hits).alias(
                "contaminated"
            ),
        )
    )


def ngram_repetition(docs: DataFrame, n: int = 2) -> DataFrame:
    """(doc_id, n_ngrams, n_distinct, dup_ratio): the within-document
    duplicate-n-gram fraction (0.0 for documents shorter than n)."""
    grams = docs.select(
        "doc_id", F.explode_outer(_ngrams(_tokens_arr(), n)).alias("gram")
    )
    agg = grams.groupBy("doc_id").agg(
        F.count("gram").cast("long").alias("n_ngrams"),
        F.countDistinct("gram").cast("long").alias("n_distinct"),
    )
    return agg.select(
        "doc_id",
        "n_ngrams",
        "n_distinct",
        F.when(F.col("n_ngrams") > 0,
               F.round(1.0 - F.col("n_distinct") / F.col("n_ngrams"), 6))
        .otherwise(F.lit(0.0)).alias("dup_ratio"),
    )
