"""Positional postings and exact-phrase search.

The reference engine matches queries against single-token stems
(``queries/builtin/words.py``) — it has no phrase operator. A fulltext
index at Common-Crawl scale needs one, so this module extends the
postings design (``operators/postings.py``) with token positions and an
exact consecutive-phrase matcher.

Scale shape (the part that matters at 100 TB):

* ``document_positional_tokens`` tokenizes once, JVM-side
  (``filter(split(...))`` + ``posexplode`` — no Python), positions are
  indices in the *filtered* token sequence, matching the NER layer's
  convention (``functions/ner.py``).
* ``phrase_match_counts`` uses offset alignment: a token matching
  phrase word *o* at text position *p* votes for a phrase start at
  ``p - o``; a start with all ``len(phrase)`` distinct offsets voting
  is an occurrence. One broadcast join against the tiny
  ``(term, offset)`` dim, one shuffle on ``(doc_id, start)`` — the
  shuffled rows are only tokens that equal SOME phrase word, a
  vanishing fraction of the corpus. No self-join of the token table,
  no window sort of the full corpus. Duplicate words in the phrase are
  handled (the dim is multi-valued per term; distinct-offset counting
  does the rest).
* ``positional_postings`` is the index-side form: one extra
  ``collect_list`` next to the tf aggregate the postings build already
  does, so the positions column rides the existing shuffle for free.
  A phrase query over the materialized table prunes to the phrase's
  terms at the parquet scan (predicate pushdown on ``term``).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tokenization import MAX_WORD_LEN, TOKEN_SPLIT_RE

__all__ = [
    "document_positional_tokens",
    "positional_postings",
    "phrase_match_counts",
    "phrase_topk",
    "phrase_topk_positional",
    "kwic_snippets",
    "proximity_match_counts",
    "proximity_topk",
    "proximity_topk_positional",
    "ordered_proximity_topk",
    "ordered_proximity_topk_positional",
]


def document_positional_tokens(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, term): lower-cased regex tokens with their index in
    the filtered token sequence. JVM-side; split artifacts (empty
    leading token, >64-char blobs) are dropped *before* positions are
    assigned, so positions are dense 0..n-1."""
    toks = F.filter(
        F.split(F.lower("text"), TOKEN_SPLIT_RE),
        lambda x: (F.length(x) >= 1) & (F.length(x) <= MAX_WORD_LEN),
    )
    return docs.select(
        "doc_id", F.posexplode(toks).alias("pos", "term")
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "term")


def positional_postings(docs: DataFrame) -> DataFrame:
    """(term, doc_id, tf, positions): the postings build extended with a
    doc-ordered positions array — same single shuffle as
    ``document_postings``; positions ride the tf aggregate."""
    return (
        document_positional_tokens(docs)
        .groupBy("term", "doc_id")
        .agg(
            F.count("*").cast("long").alias("tf"),
            F.sort_array(F.collect_list("pos")).alias("positions"),
        )
    )


def _phrase_dim(spark: SparkSession, phrase: Sequence[str]):
    """Tiny (term, off) dim — multi-valued when the phrase repeats a
    word."""
    rows = [(t.lower(), o) for o, t in enumerate(phrase)]
    return spark.createDataFrame(rows, "term string, off long")


def phrase_match_counts(
    spark: SparkSession, docs: DataFrame, phrase: Sequence[str]
) -> DataFrame:
    """(doc_id, phrase_tf): occurrences of the exact consecutive phrase
    per document, via offset alignment (module docstring)."""
    n = len(phrase)
    if n == 0:
        raise ValueError("empty phrase")
    dim = _phrase_dim(spark, phrase)
    toks = document_positional_tokens(docs)
    starts = (
        toks.join(F.broadcast(dim), "term")
        .select("doc_id", (F.col("pos") - F.col("off")).alias("start"), "off")
        .where(F.col("start") >= 0)
        .groupBy("doc_id", "start")
        .agg(F.countDistinct("off").alias("hits"))
        .where(F.col("hits") == n)
    )
    return starts.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("phrase_tf")
    )


def phrase_topk(
    spark: SparkSession, docs: DataFrame, phrase: Sequence[str], k: int = 20
) -> DataFrame:
    """Top-k docs by phrase frequency: (doc_id, phrase_tf), ordered by
    (phrase_tf desc, doc_id) — deterministic, TakeOrdered top-k."""
    return (
        phrase_match_counts(spark, docs, phrase)
        .orderBy(F.desc("phrase_tf"), F.asc("doc_id"))
        .limit(k)
    )


def kwic_snippets(
    docs: DataFrame, term: str, window: int = 4, k: int = 20
) -> DataFrame:
    """Keyword-in-context: (doc_id, pos, snippet) around the FIRST
    occurrence of *term* per document, ordered by doc_id, limit k.

    One pass: tokens arrays stay whole per doc (no explode of the
    corpus), the hit position comes from ``array_position`` on the
    filtered token array, and the snippet is a ``slice`` + ``array_join``
    — all JVM expressions. At scale this runs over the top-k result set
    of a search, not the corpus; here it is corpus-wide for the oracle.
    """
    t = term.lower()
    toks = F.filter(
        F.split(F.lower("text"), TOKEN_SPLIT_RE),
        lambda x: (F.length(x) >= 1) & (F.length(x) <= MAX_WORD_LEN),
    )
    with_arr = docs.select("doc_id", toks.alias("toks"))
    # array_position is 1-based, 0 = absent
    hit = F.array_position("toks", F.lit(t))
    start = F.greatest(F.lit(1), hit - window)
    length = F.lit(2 * window + 1)
    return (
        with_arr.withColumn("hit", hit)
        .where(F.col("hit") > 0)
        .select(
            "doc_id",
            (F.col("hit") - 1).cast("long").alias("pos"),
            F.array_join(
                F.slice("toks", start.cast("int"), length), " "
            ).alias("snippet"),
        )
        .orderBy("doc_id")
        .limit(k)
    )


def phrase_topk_positional(
    postings: DataFrame, spark: SparkSession, phrase: Sequence[str],
    k: int = 20,
) -> DataFrame:
    """Same result computed from a materialized ``positional_postings``
    table — the serving path: the ``term IN (phrase)`` filter prunes at
    the parquet scan, then positions re-explode and align exactly as in
    ``phrase_match_counts``."""
    n = len(phrase)
    dim = _phrase_dim(spark, phrase)
    toks = (
        postings.join(F.broadcast(dim), "term")
        .select("doc_id", "off", F.explode("positions").alias("pos"))
    )
    starts = (
        toks.select("doc_id", (F.col("pos") - F.col("off")).alias("start"),
                    "off")
        .where(F.col("start") >= 0)
        .groupBy("doc_id", "start")
        .agg(F.countDistinct("off").alias("hits"))
        .where(F.col("hits") == n)
    )
    return (
        starts.groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("phrase_tf"))
        .orderBy(F.desc("phrase_tf"), F.asc("doc_id"))
        .limit(k)
    )


# ------------------------------------------------------------ proximity

def _proximity_dim(spark: SparkSession, terms: Sequence[str]):
    """Distinct lowercase terms, each assigned one bit in
    first-occurrence order (the same order the oracle SQL generator
    uses, so masks agree across engines)."""
    uniq: list = []
    for t in terms:
        tl = t.lower()
        if tl not in uniq:
            uniq.append(tl)
    if not uniq:
        raise ValueError("empty term list")
    if len(uniq) > 30:
        raise ValueError("proximity supports at most 30 distinct terms")
    dim = spark.createDataFrame(
        [(t, 1 << i) for i, t in enumerate(uniq)],
        "term string, bit long",
    )
    return dim, uniq


def proximity_match_counts(
    spark: SparkSession, docs: DataFrame, terms: Sequence[str],
    window: int = 8,
) -> DataFrame:
    """(doc_id, prox_tf): proximity (NEAR/``window``) matching — the
    sloppy counterpart of the exact phrase operator, a standard
    inverted-index feature (Lucene's sloppy phrase / NEAR) the
    reference lacks.

    Semantics: a query-term occurrence at position ``p`` is a *cover
    start* when every DISTINCT query term occurs somewhere in
    ``[p, p + window - 1]``; ``prox_tf`` counts a document's cover
    starts (unordered proximity, span ≤ ``window`` tokens).

    Plan shape (the 100-TB story): each distinct term is one bit of a
    mask; after the broadcast term join keeps only query-term
    occurrences (a vanishing fraction of the corpus), a single
    ``bit_or`` over a RANGE frame per doc decides coverage — one
    shuffle on doc_id, no self-join, no per-row Python, and the whole
    predicate is a plain window aggregate both Spark and DuckDB
    evaluate identically (the driver oracle shares the exact shape).
    """
    from pyspark.sql import Window

    dim, uniq = _proximity_dim(spark, terms)
    full = (1 << len(uniq)) - 1
    toks = document_positional_tokens(docs).join(
        F.broadcast(dim), "term")
    w = (
        Window.partitionBy("doc_id").orderBy("pos")
        .rangeBetween(Window.currentRow, window - 1)
    )
    starts = (
        toks.select("doc_id", "pos",
                    F.bit_or("bit").over(w).alias("mask"))
        .where(F.col("mask") == full)
    )
    return starts.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("prox_tf")
    )


def proximity_topk(
    spark: SparkSession, docs: DataFrame, terms: Sequence[str],
    window: int = 8, k: int = 20,
) -> DataFrame:
    """Top-k docs by proximity cover count, deterministic order."""
    return (
        proximity_match_counts(spark, docs, terms, window)
        .orderBy(F.desc("prox_tf"), F.asc("doc_id"))
        .limit(k)
    )


def proximity_topk_positional(
    postings: DataFrame, spark: SparkSession, terms: Sequence[str],
    window: int = 8, k: int = 20,
) -> DataFrame:
    """Proximity top-k from a materialized ``positional_postings``
    table — the index-side form: the ``term IN (query)`` filter prunes
    at the parquet scan, positions re-explode, then the same bit-mask
    window plan as :func:`proximity_match_counts`."""
    from pyspark.sql import Window

    dim, uniq = _proximity_dim(spark, terms)
    full = (1 << len(uniq)) - 1
    toks = (
        postings.join(F.broadcast(dim), "term")
        .select("doc_id", "bit", F.explode("positions").alias("pos"))
    )
    w = (
        Window.partitionBy("doc_id").orderBy("pos")
        .rangeBetween(Window.currentRow, window - 1)
    )
    starts = (
        toks.select("doc_id", "pos",
                    F.bit_or("bit").over(w).alias("mask"))
        .where(F.col("mask") == full)
    )
    return (
        starts.groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("prox_tf"))
        .orderBy(F.desc("prox_tf"), F.asc("doc_id"))
        .limit(k)
    )


# ---------------------------------------------------- ordered proximity

def _ordered_proximity_from_tokens(
    toks: DataFrame, terms: Sequence[str], window: int,
) -> DataFrame:
    """(doc_id, oprox_tf) from a (doc_id, pos, term) relation: count
    positions ``p1`` of ``terms[0]`` from which the GREEDY successor
    chain — the nearest following occurrence of ``terms[1]``, then of
    ``terms[2]`` after that, ... — ends within ``p1 + window - 1``.

    Greedy-minimal is exact: if ANY in-order chain fits the window, the
    one that always takes the nearest next occurrence fits too, so no
    search is needed. Each hop is precomputed for EVERY query-term
    occurrence in one pass (a conditional ``min`` over the following
    row frame per chain term), and chaining is then k-2 EQUI-joins back
    onto those rows (the successor is itself a row) — no inequality
    join anywhere, everything partitions by doc_id.
    """
    from pyspark.sql import Window

    seq = [t.lower() for t in terms]
    if not seq:
        raise ValueError("empty term list")
    hops = sorted(set(seq[1:]))
    base = toks.where(F.col("term").isin(sorted(set(seq))))
    w = (
        Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    aug = base.select(
        "doc_id", "pos", "term",
        *[
            F.min(
                F.when(F.col("term") == t, F.col("pos"))
            ).over(w).alias(f"nxt_{i}")
            for i, t in enumerate(hops)
        ],
    )
    hop_col = {t: f"nxt_{i}" for i, t in enumerate(hops)}
    chain = (
        aug.where(F.col("term") == seq[0])
        .select("doc_id", F.col("pos").alias("p1"),
                F.col("pos").alias("cur"))
    )
    for t in seq[1:]:
        nxt = aug.select(
            "doc_id", F.col("pos").alias("cur"),
            F.col(hop_col[t]).alias("stepped"),
        )
        # first hop reads the start row's own nxt column; later hops
        # join the successor row (it IS a row of the aug relation)
        chain = (
            chain.join(nxt, ["doc_id", "cur"])
            .where(F.col("stepped").isNotNull())
            .select("doc_id", "p1", F.col("stepped").alias("cur"))
        )
    return (
        chain.where(F.col("cur") - F.col("p1") <= window - 1)
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("oprox_tf"))
    )


def ordered_proximity_topk(
    spark: SparkSession, docs: DataFrame, terms: Sequence[str],
    window: int = 8, k: int = 20,
) -> DataFrame:
    """Ordered NEAR/``window`` top-k over the corpus text: the query
    terms must appear IN ORDER within a ``window``-token span (the
    phrase-with-slop retrieval form between exact ``phrase_topk`` and
    unordered ``proximity_topk``). ``oprox_tf`` counts chain starts.
    """
    if len(set(t.lower() for t in terms)) > 30:
        raise ValueError("ordered proximity supports at most 30 terms")
    window = max(int(window), len(terms))
    hits = _ordered_proximity_from_tokens(
        document_positional_tokens(docs), terms, window
    )
    return hits.orderBy(
        F.desc("oprox_tf"), F.asc("doc_id")
    ).limit(k)


def ordered_proximity_topk_positional(
    postings: DataFrame, spark: SparkSession, terms: Sequence[str],
    window: int = 8, k: int = 20,
) -> DataFrame:
    """Ordered NEAR from a materialized ``positional_postings`` table
    (term-pruned scan, positions re-exploded, then the same greedy
    successor-chain plan)."""
    toks = (
        postings.where(
            F.col("term").isin(sorted(set(t.lower() for t in terms)))
        )
        .select("doc_id", "term", F.explode("positions").alias("pos"))
    )
    window = max(int(window), len(terms))
    hits = _ordered_proximity_from_tokens(toks, terms, window)
    return hits.orderBy(
        F.desc("oprox_tf"), F.asc("doc_id")
    ).limit(k)
