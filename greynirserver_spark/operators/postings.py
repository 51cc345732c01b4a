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
    "build_term_counts",
    "append_term_counts_run",
    "compact_term_counts",
    "load_term_counts",
    "derive_term_stats",
    "build_doc_stats",
    "corpus_stats",
]


def _sketch_boundaries(
    df: DataFrame, order_col: str, num_partitions: int,
    key_type: str = "string",
) -> list:
    """One column-pruned pass that collects a small deterministic key
    sketch (a few keys per Arrow batch, weighted by batch size) and turns
    it into ``num_partitions - 1`` range boundaries at the driver.

    The boundaries are returned as plain Python values and inlined as
    literals downstream — this is the determinism fix: Spark's own
    ``repartitionByRange`` re-samples per job (seeded by RDD id), so two
    actions over the same range exchange can land rows in different
    partitions once partitions exceed the sample size, corrupting any
    id scheme that pairs a count job with an assignment job.
    """

    def sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        keys: list = []
        weights: list = []
        for b in batches:
            n = len(b)
            if n == 0:
                continue
            step = max(1, n // 8)
            picked = b["k"].iloc[::step]
            keys.extend(picked)
            weights.extend([float(n) / len(picked)] * len(picked))
        yield pd.DataFrame({"k": keys, "w": weights})

    sample = (
        df.select(F.col(order_col).alias("k"))
        .mapInPandas(sketch, f"k {key_type}, w double")
        .collect()
    )
    if not sample:
        return []
    pairs = sorted((r["k"], r["w"]) for r in sample)
    total = sum(w for _, w in pairs)
    boundaries: list = []
    acc = 0.0
    targets = [total * i / num_partitions for i in range(1, num_partitions)]
    ti = 0
    for k, w in pairs:
        acc += w
        while ti < len(targets) and acc >= targets[ti]:
            if not boundaries or boundaries[-1] != k:
                boundaries.append(k)
            ti += 1
    return boundaries


def assign_doc_ids(
    df: DataFrame, order_col: str = "url", num_partitions: Optional[int] = None
) -> DataFrame:
    """Add a dense, deterministic ``doc_id`` (0-based) in global
    *order_col* order.

    Scale path: a key sketch collected once at the driver fixes literal
    range boundaries; every row's range bucket is then a pure JVM
    expression (count of boundaries <= key), so the counts job and the
    id-assignment job see identical bucketing by construction. A tiny
    per-bucket count job computes offsets (P rows to the driver, never
    data); ids are assigned map-side inside each bucket. Equivalent to a
    dense rank but without collapsing to one partition the way
    ``row_number() OVER (ORDER BY url)`` would — and, unlike
    ``repartitionByRange`` + two actions, immune to per-job re-sampling
    of partition boundaries (which measurably produced duplicate/gapped
    ids at 200k rows).
    """
    spark = df.sparkSession
    num_partitions = num_partitions or df.rdd.getNumPartitions()
    boundaries = _sketch_boundaries(df, order_col, num_partitions)

    if boundaries:
        barr = F.array(*[F.lit(b) for b in boundaries])
        pid_expr = F.size(
            F.filter(barr, lambda b: b <= F.col(order_col))
        ).cast("int")
    else:
        pid_expr = F.lit(0)
    with_pid = df.withColumn("_pid", pid_expr)

    # Exact per-bucket counts (column-pruned; bucket expr is deterministic)
    counts = {
        r["_pid"]: r["cnt"]
        for r in with_pid.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    b_offsets = spark.sparkContext.broadcast(offsets)

    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", doc_id bigint"

    def add_ids(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        next_id: dict = {}
        for b in batches:
            n = len(b)
            if n == 0:
                continue
            pid_arr = b["_pid"].to_numpy()
            ids = np.empty(n, dtype=np.int64)
            change = np.empty(n, dtype=bool)
            change[0] = True
            change[1:] = pid_arr[1:] != pid_arr[:-1]
            starts = np.nonzero(change)[0]
            ends = np.append(starts[1:], n)
            for s, e in zip(starts, ends):
                p = int(pid_arr[s])
                base = next_id.get(p, b_offsets.value.get(p, 0))
                ids[s:e] = np.arange(base, base + (e - s))
                next_id[p] = base + (e - s)
            b = b.drop(columns=["_pid"])
            b["doc_id"] = ids
            yield b

    # hash-partition on the bucket id: every bucket lands in exactly one
    # task (several buckets may share a task; the per-bucket carry above
    # handles that), rows sorted by key inside each bucket
    return (
        with_pid.repartition(num_partitions, "_pid")
        .sortWithinPartitions("_pid", order_col)
        .mapInPandas(add_ids, out_schema)
    )


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
    """1-row (n_docs, avgdl, total_doclen). avgdl = exact integer sum /
    count, so it is bit-reproducible across engines (summation-order
    independent). ``total_doclen`` is carried so incremental appends can
    update the row EXACTLY (old total + new integer sum) instead of
    reconstructing the total from the rounded double."""
    return doc_stats.agg(
        F.count("*").alias("n_docs"),
        (F.sum("doclen").cast("double") / F.count("*")).alias("avgdl"),
        F.sum("doclen").cast("long").alias("total_doclen"),
    )


def build_term_counts(postings: DataFrame) -> DataFrame:
    """(term, df, cf) — UNPRUNED per-term document and collection
    frequencies. The mergeable form of the term statistics: df/cf are
    pure sums, so an incremental batch's counts fold in with one
    log-structured run append (:func:`append_term_counts_run`) instead of re-scanning
    the whole postings table; pruning and idf (which depend on the
    GLOBAL min_df/N) are derived at read time by
    :func:`derive_term_stats`."""
    return postings.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("tf").cast("long").alias("cf"),
    )


def append_term_counts_run(
    spark, store_path: str, delta: DataFrame, run_id: Optional[str] = None
) -> bool:
    """Append a batch's (term, df, cf) deltas as one LSM run
    (operators/runstore.py) — O(batch) WRITE-ONLY, no read of the
    store. This is what makes the index append loop vocabulary-
    independent: the round-3 bucketed MERGE read+rewrote every bucket
    its terms hashed into, and an append batch's thousands of distinct
    terms touch essentially all buckets — O(vocab) in disguise
    (measured, scripts/append_stats_scaling.py). On Iceberg: a
    fast-append snapshot of the delta table. Returns False on
    idempotent replay (*run_id* already appended)."""
    from .runstore import append_run

    return append_run(spark, store_path, delta, run_id=run_id)


def compact_term_counts(spark, store_path: str, counts: DataFrame) -> None:
    """Publish authoritative full counts as the new base epoch —
    build/rebuild/recovery path (O(vocab) there by definition)."""
    from .runstore import compact

    return compact(spark, store_path, counts)


def load_term_counts(spark, store_path: str) -> DataFrame:
    """The exact mergeable (term, df, cf) view: base ∪ runs re-summed.
    Long sums are order-independent, so the view is bit-equal to
    :func:`build_term_counts` over the full postings table. Reads a
    pre-round-4 hash-bucketed store (``bkt=N`` dirs) transparently."""
    import os

    from .runstore import load_counts

    df = load_counts(spark, store_path, ["term"], ["df", "cf"])
    if df is not None:
        return df
    if os.path.isdir(store_path) and any(
        d.startswith("bkt=") for d in os.listdir(store_path)
    ):
        return spark.read.parquet(store_path).select("term", "df", "cf")
    return spark.createDataFrame([], "term string, df long, cf long")


def derive_term_stats(
    term_counts: DataFrame, corpus: DataFrame, min_df: int = 3
) -> DataFrame:
    """(term, df, cf, idf) from the mergeable counts + the 1-row corpus
    — identical to :func:`build_term_stats` over the full postings
    (same pruning, same BM25 idf), but reading only vocab-size data."""
    return (
        term_counts.where(F.col("df") >= min_df)
        .crossJoin(F.broadcast(corpus.select("n_docs")))
        .withColumn(
            "idf",
            F.log(
                (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
                + F.lit(1.0)
            ),
        )
        .select("term", "df", "cf", "idf")
    )
