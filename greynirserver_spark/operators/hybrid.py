"""Hybrid retrieval: reciprocal-rank fusion of lexical and dense lists.

The reference serves TWO disjoint ranking surfaces — keyword search
(``/root/reference/search.py``) and topic-vector article similarity
(``/root/reference/vectors/simserver.py:232-290``) — and its web UI
picks one per request. A production replacement unifies them per
query: run BM25 over the inverted index AND cosine top-k over the
embedding column, then fuse with reciprocal-rank fusion
(RRF, Cormack/Clarke/Buettcher SIGIR'09): each document's fused score
is ``sum over lists of 1 / (k_rrf + rank_in_list)``. RRF needs only
ranks — no score calibration between BM25 logs and cosine values —
which is exactly why it is the standard fusion for mixed lexical/dense
retrieval.

Scale shape: both input lists arrive already cut to ``fuse_depth``
rows by their own distributed top-k (TakeOrderedAndProject for BM25,
the bucketed/brute-force ANN ops for the dense side), so the fusion
itself joins two <= fuse_depth-row DataFrames — constant work per
query regardless of corpus size. The final rank window runs after a
``limit(k)``, never over an unbounded input.
"""
from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

__all__ = ["rrf_fuse", "hybrid_documents_topk"]

DEFAULT_K_RRF = 60
DEFAULT_FUSE_DEPTH = 50


def rrf_fuse(
    lists: Sequence[DataFrame],
    key: str = "doc_id",
    k: int = 10,
    k_rrf: int = DEFAULT_K_RRF,
) -> DataFrame:
    """(rank, *key*, rrf) — reciprocal-rank fusion of ranked lists.

    Each input must carry (*key*, ``rank``) with rank starting at 1
    (the shape every top-k operator in this package returns). A key
    absent from a list contributes 0 for that list. ``rrf`` is rounded
    to 6 decimals and ties break on *key* ascending, so DuckDB
    reproduces rows bit-for-bit.
    """
    if not lists:
        raise ValueError("rrf_fuse needs at least one ranked list")
    if k_rrf < 0:
        raise ValueError("k_rrf must be >= 0")
    joined = None
    for i, l in enumerate(lists):
        c = l.select(
            F.col(key),
            (
                F.lit(1.0)
                / (F.lit(float(k_rrf)) + F.col("rank").cast("double"))
            ).alias(f"_c{i}"),
        )
        # using-style full join coalesces the key column
        joined = c if joined is None else joined.join(c, key, "full")
    total = F.coalesce(F.col("_c0"), F.lit(0.0))
    for i in range(1, len(lists)):
        total = total + F.coalesce(F.col(f"_c{i}"), F.lit(0.0))
    fused = joined.select(F.col(key), F.round(total, 6).alias("rrf"))
    w = Window.orderBy(F.desc("rrf"), F.asc(key))
    return (
        fused.orderBy(F.desc("rrf"), F.asc(key))
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", key, "rrf")
    )


def hybrid_documents_topk(
    docs: DataFrame,
    emb: DataFrame,
    query_terms: Sequence[str],
    query_vec: Sequence[float],
    k: int = 10,
    fuse_depth: int = DEFAULT_FUSE_DEPTH,
    k_rrf: int = DEFAULT_K_RRF,
    min_df: int = 3,
    exclude_doc_id: int | None = None,
    postings: DataFrame | None = None,
) -> DataFrame:
    """(rank, doc_id, rrf) — BM25 + embedding-cosine hybrid top-k.

    The lexical list is :func:`textops.bm25_documents_topk` (same
    rounding/tie rules as the ``bm25_topk`` oracle); the dense list is
    :func:`ann.cosine_topk_bruteforce` over *emb* (``vec_id`` is the
    document id, as everywhere in the embeddings table). Both lists are
    cut to *fuse_depth* before fusion; pass a materialized *postings*
    to skip re-tokenization on repeated queries (the serving path uses
    compressed segments instead — this operator is the oracle-safe
    pipeline form).

    *exclude_doc_id* (the similar-articles guard: drop the query's own
    document) is excluded from BOTH lists before ranking — a
    dense-side-only exclusion would let the source document re-enter
    the fused top-k through its own lexical rank.
    """
    from .ann import cosine_topk_bruteforce
    from .textops import bm25_documents_topk

    from pyspark.sql.window import Window

    overfetch = fuse_depth + (1 if exclude_doc_id is not None else 0)
    lex = bm25_documents_topk(
        docs, query_terms, k=overfetch, min_df=min_df, postings=postings
    ).select("doc_id", "rank")
    if exclude_doc_id is not None:
        # drop the excluded doc, then close the rank gap — identical to
        # excluding before ranking (<= fuse_depth+1 rows, driver-sized)
        lex = (
            lex.where(F.col("doc_id") != int(exclude_doc_id))
            .withColumn(
                "rank",
                F.row_number().over(Window.orderBy("rank")).cast("long"),
            )
            .where(F.col("rank") <= fuse_depth)
        )
    dense = cosine_topk_bruteforce(
        emb, list(query_vec), k=fuse_depth, exclude_vec_id=exclude_doc_id
    ).select(F.col("vec_id").alias("doc_id"), "rank")
    return rrf_fuse([lex, dense], key="doc_id", k=k, k_rrf=k_rrf)
