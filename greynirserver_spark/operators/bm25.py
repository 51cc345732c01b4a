"""Exact BM25 top-k scoring as a declarative DataFrame plan.

This is the engine's reference scorer (the compressed-segment WAND path in
``wand.py`` must be rank-identical to it). Shape of the plan — designed for
a 1000-executor cluster:

* the query's terms are a tiny ``isin`` filter -> pushed to the postings
  scan (partition/row-group pruning on a term-sorted layout),
* ``term_stats`` for those terms and the 1-row corpus stats are broadcast,
* per-(doc, term) partial scores are summed **in term-sorted order** via
  ``array_sort(collect_list(...))`` + ``aggregate`` so float addition order
  is fixed -> scores are bit-reproducible run-to-run and engine-to-oracle
  (the determinism requirement behind "rank-identical top-k", SURVEY §4.3),
* global top-k is ``orderBy(score desc, doc_id asc).limit(k)`` which
  Catalyst executes as TakeOrderedAndProject (per-partition heaps, no full
  sort) — the distributed analog of the reference's ``np.argpartition``
  top-k (vectors/simserver.py:349-356).

BM25 parameters: k1=1.2, b=0.75 (standard Robertson defaults; the
reference's cosine-LSA ranking is replaced by BM25 per the north rule).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["bm25_score_exact", "bm25_topk_exact", "K1", "B"]

K1 = 1.2
B = 0.75


def bm25_score_exact(
    postings: DataFrame,
    term_stats: DataFrame,
    doc_stats: DataFrame,
    corpus: DataFrame,
    query_terms: Sequence[str],
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Score all documents containing any *query_terms*: (doc_id, score).

    Duplicate query terms are deduplicated (each unique term contributes
    once, matching the bag-of-words query model of the reference's term
    blending, vectors/builder.py:336-365).
    """
    terms = sorted(set(query_terms))
    if not terms:
        return postings.sparkSession.createDataFrame(
            [], "doc_id bigint, score double"
        )
    q_post = postings.where(F.col("term").isin(terms))
    q_stats = term_stats.where(F.col("term").isin(terms))
    scored = (
        q_post.join(F.broadcast(q_stats.select("term", "idf")), "term")
        .join(doc_stats, "doc_id")
        .crossJoin(F.broadcast(corpus.select("avgdl")))
        .withColumn(
            "part_score",
            F.col("idf")
            * (F.col("tf") * (F.lit(k1) + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("doclen") / F.col("avgdl"))
            ),
        )
    )
    # Deterministic summation: collect (term, part_score) per doc, sort by
    # term, fold in that order. Fixed float addition order == reproducible
    # scores (bit-identical to the NumPy oracle's term-sorted summation).
    return (
        scored.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("term", "part_score"))
            ).alias("parts")
        )
        .select(
            "doc_id",
            F.aggregate(
                "parts",
                F.lit(0.0),
                lambda acc, x: acc + x["part_score"],
            ).alias("score"),
        )
    )


def bm25_topk_exact(
    postings: DataFrame,
    term_stats: DataFrame,
    doc_stats: DataFrame,
    corpus: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Top-k (rank, doc_id, score), tie-broken (score desc, doc_id asc)."""
    scores = bm25_score_exact(
        postings, term_stats, doc_stats, corpus, query_terms, k1=k1, b=b
    )
    topk = scores.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    # rank assignment over <=k rows: a driver-sized window is fine here
    from pyspark.sql.window import Window

    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", "score"
    )
