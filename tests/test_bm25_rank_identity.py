"""Rank-identity: Spark exact BM25 vs the independent NumPy oracle.

Mirrors FIXTURES.md §3-4: head terms (Zipf skew), mid/rare terms,
stopword-only queries (empty), mixed case, df<3-pruned terms.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from greynirserver_spark.corpus import generate_pages_pdf, vocabulary
from greynirserver_spark.operators.bm25 import bm25_topk_exact
from greynirserver_spark.plans.pipeline import build_index, query_to_terms

from oracle_bm25 import oracle_index, oracle_topk

N_DOCS = 300


@pytest.fixture(scope="module")
def corpus_pdf():
    return generate_pages_pdf(N_DOCS)


@pytest.fixture(scope="module")
def spark_index(spark, corpus_pdf):
    pages = spark.createDataFrame(corpus_pdf)
    idx = build_index(spark, pages, min_df=3, num_partitions=7)
    # materialize once for the whole module
    for name in ("postings", "term_stats", "doc_stats", "corpus"):
        setattr(idx, name, getattr(idx, name).cache())
    return idx


@pytest.fixture(scope="module")
def oracle(corpus_pdf):
    return oracle_index(corpus_pdf, min_df=3)


def _queries():
    from greynirserver_spark.corpus import indexable_stems_by_rank

    head, head2 = indexable_stems_by_rank(2)
    (mid,) = indexable_stems_by_rank(1, start_rank=200)
    (rare,) = indexable_stems_by_rank(1, start_rank=15000)  # df<3 -> pruned
    return [
        (f"{head}", 10),
        (f"{head} {head2}", 10),
        (f"{mid} {head}", 20),
        (f"{mid.upper()}", 10),            # case-insensitivity
        (f"{rare} {head}", 10),            # pruned term contributes nothing
        ("vera hafa segja", 10),           # stopword-only -> empty
        (f"{head} {head}", 10),            # duplicate terms deduplicated
    ]


def test_corpus_sanity(oracle):
    docs, postings, term_stats, doclen, n, avgdl = oracle
    assert n > 250
    assert len(term_stats) > 100
    assert 50 < avgdl < 2000


def test_rank_identity_vs_numpy_oracle(spark_index, oracle):
    docs, postings, term_stats, doclen, n, avgdl = oracle
    # engine and oracle must agree on corpus stats exactly
    crow = spark_index.corpus.collect()[0]
    assert crow["n_docs"] == n
    assert crow["avgdl"] == pytest.approx(avgdl, abs=0)

    non_empty = 0
    for qtext, k in _queries():
        terms = query_to_terms(qtext)
        expected = oracle_topk(postings, term_stats, doclen, avgdl, terms, k)
        if len(expected):
            non_empty += 1
        got = (
            bm25_topk_exact(
                spark_index.postings,
                spark_index.term_stats,
                spark_index.doc_stats,
                spark_index.corpus,
                terms,
                k,
            )
            .toPandas()
            .reset_index(drop=True)
        )
        assert list(got["doc_id"]) == list(expected["doc_id"]), qtext
        assert list(got["rank"]) == list(expected["rank"]), qtext
        for s_got, s_exp in zip(got["score"], expected["score"]):
            assert s_got == pytest.approx(s_exp, rel=1e-12), qtext
    # guard against empty-vs-empty trivial passes
    assert non_empty >= 5


def test_stopword_only_query_is_empty(spark_index):
    terms = query_to_terms("vera hafa segja mega")
    assert terms == []  # all filtered by the noindex stoplist
    got = bm25_topk_exact(
        spark_index.postings,
        spark_index.term_stats,
        spark_index.doc_stats,
        spark_index.corpus,
        terms,
        10,
    )
    assert got.count() == 0
