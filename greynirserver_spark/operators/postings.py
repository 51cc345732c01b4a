"""Inverted-index build: doc ids, postings, term/doc statistics.

Spark re-expression of the reference's ``words`` table build
(``article.py:324-343``, ``tree/util.py:317-321``) and gensim dictionary
statistics (``vectors/builder.py:170-216``):

* ``assign_doc_ids`` — deterministic dense ``doc_id`` by global ``url``
  order, computed scalably (range partition + per-partition offsets; no
  single-partition window, no driver materialization of data rows).
* ``build_postings`` — ``(term, doc_id, tf)`` via partial+final hash agg.
* ``build_term_stats`` — df/cf/idf with the reference's df>=min_df pruning
  (gensim ``filter_extremes(no_below=3)``, ``vectors/builder.py:176``).
* ``build_doc_stats`` — per-doc length + corpus (N, avgdl) for BM25.

All pure DataFrame ops — partial aggregation, broadcast-ready dimension
outputs, no Python in the hot path.
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "assign_doc_ids",
    "build_postings",
    "build_term_stats",
    "build_doc_stats",
    "corpus_stats",
]


def assign_doc_ids(
    df: DataFrame, order_col: str = "url", num_partitions: Optional[int] = None
) -> DataFrame:
    """Add a dense, deterministic ``doc_id`` (0-based) in global
    *order_col* order.

    Scale path: ``repartitionByRange`` + ``sortWithinPartitions`` gives a
    global sort across partitions; a tiny per-partition count job computes
    offsets (P rows to the driver, never data); ids are then assigned
    map-side. Equivalent to a dense rank but without collapsing to one
    partition the way ``row_number() OVER (ORDER BY url)`` would.
    """
    spark = df.sparkSession
    num_partitions = num_partitions or df.rdd.getNumPartitions()
    parts = (
        df.repartitionByRange(num_partitions, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("_pid", F.spark_partition_id())
    )
    # One lightweight pass for per-partition counts (column-pruned scan)
    counts = {
        r["_pid"]: r["cnt"]
        for r in parts.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    b_offsets = spark.sparkContext.broadcast(offsets)

    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in parts.schema.fields
        if f.name != "_pid"
    ) + ", doc_id bigint"

    def add_ids(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = None
        for b in batches:
            if len(b) == 0:
                continue
            if local is None:
                local = b_offsets.value.get(int(b["_pid"].iloc[0]), 0)
            b = b.drop(columns=["_pid"])
            b["doc_id"] = range(local, local + len(b))
            local += len(b)
            yield b

    return parts.mapInPandas(add_ids, out_schema)


def build_postings(tokens: DataFrame, term_col: str = "term") -> DataFrame:
    """(doc cols..., term) token rows -> (term, doc_id, tf).

    The reference's per-article word-count dict (``tree/util.py:317-321``)
    as a hash aggregation: Spark performs map-side partial aggregation,
    so the shuffle carries (term, doc_id) groups, not raw tokens.
    """
    return (
        tokens.groupBy(term_col, "doc_id")
        .agg(F.count("*").cast("int").alias("tf"))
        .withColumnRenamed(term_col, "term")
    )


def build_term_stats(
    postings: DataFrame, min_df: int = 3, corpus: Optional[DataFrame] = None
) -> DataFrame:
    """(term, df, cf, idf) with BM25 idf = ln((N-df+0.5)/(df+0.5)+1).

    df pruning mirrors gensim ``filter_extremes(no_below=3)``
    (reference vectors/builder.py:176). Pass *corpus* (the 1-row output of
    :func:`corpus_stats`) to reuse the already-aggregated N; otherwise a
    countDistinct over postings computes it (extra shuffle — avoid at scale).
    """
    if corpus is not None:
        n_docs = corpus.select("n_docs")
    else:
        n_docs = postings.agg(F.countDistinct("doc_id").alias("n_docs"))
    stats = (
        postings.groupBy("term")
        .agg(
            F.count("*").cast("long").alias("df"),
            F.sum("tf").cast("long").alias("cf"),
        )
        .where(F.col("df") >= min_df)
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "idf",
            F.log(
                (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
                + F.lit(1.0)
            ),
        )
        .drop("n_docs")
    )
    return stats


def build_doc_stats(postings: DataFrame) -> DataFrame:
    """(doc_id, doclen): document length in indexed tokens."""
    return postings.groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("doclen")
    )


def corpus_stats(doc_stats: DataFrame) -> DataFrame:
    """1-row (n_docs, avgdl). avgdl = exact integer sum / count, so it is
    bit-reproducible across engines (summation-order independent)."""
    return doc_stats.agg(
        F.count("*").alias("n_docs"),
        (F.sum("doclen").cast("double") / F.count("*")).alias("avgdl"),
    )
