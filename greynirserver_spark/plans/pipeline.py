"""End-to-end index-build plan: pages -> extraction -> tokens -> postings
-> stats (SURVEY §3.2 "Spark shape").

The reference's cron pipeline (scrape -> parse -> words -> model,
scraper.py:276-444 / vectors/builder.py:565-592) becomes one declarative
job graph:

    pages --extract UDF--> texts --assign ids--> docs
          --tokenize (JVM)--> tokens --index filter--> indexed terms
          --hash agg--> postings --aggs--> term_stats / doc_stats / corpus

Everything after the extraction UDF is Catalyst-planned: map-side partial
aggregation for TF, broadcast dims for the vocabulary and stoplist, no
Python row loops.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..corpus import vocabulary
from ..extraction import extract_text_udf
from ..operators.postings import (
    assign_doc_ids,
    build_doc_stats,
    build_postings,
    build_term_stats,
    corpus_stats,
)
from ..tokenization import apply_index_filter, tokenize_marked_text

__all__ = ["IndexTables", "build_index", "query_to_terms"]


@dataclass
class IndexTables:
    """The index's logical tables (each maps to an Iceberg/Parquet table)."""

    doc_map: DataFrame      # (doc_id, url, warc_ts, doclen)
    postings: DataFrame     # (term, doc_id, tf)
    term_stats: DataFrame   # (term, df, cf, idf)
    doc_stats: DataFrame    # (doc_id, doclen)
    corpus: DataFrame       # 1 row: (n_docs, avgdl)


def _vocab_df(spark: SparkSession) -> DataFrame:
    v = vocabulary()[["stem", "cat"]]
    return spark.createDataFrame(v)


def build_index(
    spark: SparkSession,
    pages: DataFrame,
    min_df: int = 3,
    num_partitions: Optional[int] = None,
    use_text_column: bool = False,
) -> IndexTables:
    """Build all index tables from a `pages` DataFrame.

    *use_text_column* skips HTML extraction and trusts the ``text``
    column — useful for oracle cross-checks; the production path always
    extracts from ``html`` (and the byte-identity tests prove both agree).
    """
    pages_is = pages.where(F.col("lang") == "is")
    if use_text_column:
        texts = pages_is.select("url", "warc_ts", "text")
    else:
        texts = pages_is.select(
            "url", "warc_ts", extract_text_udf()(F.col("html")).alias("text")
        )
    docs = assign_doc_ids(texts, order_col="url", num_partitions=num_partitions)

    tokens = tokenize_marked_text(
        docs.select("doc_id", "text"), vocab=_vocab_df(spark)
    )
    indexed = apply_index_filter(tokens, spark)

    postings = build_postings(indexed.select("doc_id", "term"))
    doc_stats = build_doc_stats(postings)
    corpus = corpus_stats(doc_stats)
    term_stats = build_term_stats(postings, min_df=min_df, corpus=corpus)
    doc_map = docs.select("doc_id", "url", "warc_ts").join(
        doc_stats, "doc_id", "left"
    )
    return IndexTables(
        doc_map=doc_map,
        postings=postings,
        term_stats=term_stats,
        doc_stats=doc_stats,
        corpus=corpus,
    )


def query_to_terms(qtext: str, default_cat: str = "entity") -> list[str]:
    """Driver-side query normalization: the same term pipeline the index
    applies (tokenize -> vocab category -> index filter -> normalized key).

    The reference parses queries on the driver too (a Flask worker,
    queries/__init__.py:393-408); query strings are tiny, so this is
    plain Python by design, not a UDF.
    """
    import re

    from ..tokenization import (
        CATEGORIES_TO_INDEX,
        MAX_WORD_LEN,
        NOINDEX_PAIRS,
        PY_TOKEN_SPLIT_RE,
    )

    vocab = vocabulary()
    cat_map = dict(zip(vocab["stem"], vocab["cat"]))
    noindex = {(s.lower(), c) for s, c in NOINDEX_PAIRS}
    terms = []
    for tok in re.split(PY_TOKEN_SPLIT_RE, qtext.lower()):
        if not tok or len(tok) > MAX_WORD_LEN:
            continue
        cat = cat_map.get(tok, default_cat)
        if cat not in CATEGORIES_TO_INDEX or (tok, cat) in noindex:
            continue
        terms.append(
            tok.replace("-", "").replace(" ", "_") + "/" + cat
        )
    return terms
