"""Faceted search: aggregations over a query's match set.

The reference renders per-source article groupings in its web UI
(``/root/reference/routes/news.py:62-96`` filters the article list by
root/domain and the ``roots`` registry drives the source picker) but
computes them with one SQL query per page view; search engines expose
the same thing as facet/terms aggregations next to the hit list
(Lucene/Solr facets, Elasticsearch ``terms`` aggregation): for each
value of a document attribute, how many documents in the MATCH SET
carry it.

Spark-first shape, two serving paths:

* :func:`facet_counts` — oracle-expressible path over the raw
  ``documents`` table: term-pruned postings scan -> distinct match set
  -> one shuffle join to the docs on ``doc_id`` -> partial+final count
  aggregation on the facet value. Match semantics are ANY-of (the
  SHOULD/OR match set — the relation a search UI facets over).
* :func:`facet_counts_segments` — the index-backed path: the match
  set comes from ``wand.matched_docs`` (term-pruned COMPRESSED block
  scan, bulk varint decode, no scoring), so at 10^12 documents the
  only per-query costs are the pruned segment scan and one join
  against the doc dimension. Facet cardinality is typically tiny
  (languages, domains), so the final aggregation is a near-free
  map-side combine.

Both return ``(facet, doc_count)`` ordered by (doc_count desc, facet
asc) — a deterministic total order for the oracle comparison.

:func:`facet_counts` is the raw-corpus oracle twin of the
segment-served driver row ``facet_counts``
(``textops.facet_counts_documents``, which delegates its join/agg to
:func:`facet_counts_segments` here) — the same raw-vs-segments pairing
as ``bm25_topk`` / ``bm25_wand_topk``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["facet_counts", "facet_counts_segments"]


def _facet_agg(matched_docs_df: DataFrame, dim: DataFrame,
               facet_col: str, k: "int | None") -> DataFrame:
    out = (
        dim.join(matched_docs_df.select("doc_id"), "doc_id")
        .groupBy(F.col(facet_col).alias("facet"))
        .agg(F.count("*").cast("long").alias("doc_count"))
        .orderBy(F.desc("doc_count"), F.asc("facet"))
    )
    return out if k is None else out.limit(k)


def facet_counts(
    docs: DataFrame,
    query_terms: Sequence[str],
    facet_col: str = "source",
    k: int = 10,
    postings: DataFrame | None = None,
) -> DataFrame:
    """(facet, doc_count) for documents matching ANY of *query_terms*.

    *postings* optionally reuses a materialized
    ``textops.document_postings(docs)`` so repeated queries don't
    re-tokenize the corpus (production serves from segments instead —
    :func:`facet_counts_segments`).
    """
    from .textops import document_postings

    terms = sorted({t.lower() for t in query_terms})
    if not terms:
        raise ValueError("empty query")
    if postings is None:
        postings = document_postings(docs)
    matched = (
        postings.where(F.col("term").isin(terms))
        .select("doc_id")
        .distinct()
    )
    return _facet_agg(matched, docs, facet_col, k)


def facet_counts_segments(
    segments: DataFrame,
    doc_dim: DataFrame,
    query_terms: Sequence[str],
    facet_col: str,
    k: "int | None" = 10,
) -> DataFrame:
    """Index-backed facets: match set from the compressed segment store
    (``wand.matched_docs`` — decode-only, never scores), facet values
    from *doc_dim* ``(doc_id, <facet_col>, ...)``. Shard doc ranges are
    disjoint, so the per-shard distinct sets concatenate with no
    cross-shard dedup; the join shuffles on ``doc_id`` and the count
    aggregation combines map-side."""
    from .wand import matched_docs

    terms = sorted({t.lower() for t in query_terms})
    if not terms:
        raise ValueError("empty query")
    return _facet_agg(matched_docs(segments, terms), doc_dim, facet_col, k)
