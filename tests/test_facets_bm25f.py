"""Faceted search (match-set aggregations) + BM25F fielded ranking.

Round-5 additions: operators/facets.py, operators/bm25f.py, and the
``Searcher.facets`` serving surface (incl. tombstone exclusion).
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from greynirserver_spark.operators.bm25f import (
    bm25f_documents_topk,
    fielded_postings,
)
from greynirserver_spark.operators.facets import (
    facet_counts,
    facet_counts_segments,
)


def _docs(spark):
    rows = [
        (1, "spark join window spark extra words here", "is", "a"),
        (2, "join join join filler text here too", "is", "a"),
        (3, "window stream other words beyond that", "en", "b"),
        (4, "nothing matching at all in this row", "en", "b"),
        (5, "spark once only", "is", "c"),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


def test_facet_counts_matches_manual(spark):
    docs = _docs(spark)
    out = facet_counts(
        docs, ["spark", "join"], facet_col="source", k=10
    ).collect()
    # matched docs: 1, 2 (source a), 5 (source c)
    assert [(r.facet, r.doc_count) for r in out] == [("a", 2), ("c", 1)]
    out2 = facet_counts(
        docs, ["spark", "join"], facet_col="lang", k=10
    ).collect()
    assert [(r.facet, r.doc_count) for r in out2] == [("is", 3)]
    with pytest.raises(ValueError):
        facet_counts(docs, [])


def test_facet_counts_segments_parity(spark):
    """Index-backed facets == raw-postings facets on real data (the
    decode-only compressed match set reproduces the tokenized one)."""
    from greynirserver_spark.operators.textops import (
        _documents_segment_index,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    )
    terms = ["spark", "join", "window", "stream"]
    raw = [
        (r.facet, r.doc_count)
        for r in facet_counts(
            docs, terms, facet_col="source", k=50
        ).collect()
    ]
    # min_df=1: facet matching has no df floor, so the parity store
    # must keep every term
    segments, _ = _documents_segment_index(docs, min_df=1, n_shards=4)
    seg = [
        (r.facet, r.doc_count)
        for r in facet_counts_segments(
            segments, docs, terms, "source", k=50
        ).collect()
    ]
    from greynirserver_spark.operators.segments import release_cached_deps

    release_cached_deps(segments)
    assert raw == seg
    assert raw  # non-empty on the fixture corpus


def test_searcher_facets_and_tombstones(spark, tmp_path):
    from greynirserver_spark.corpus import (
        generate_pages_pdf,
        indexable_stems_by_rank,
    )
    from greynirserver_spark.plans.lineage import (
        build_index_checkpointed,
        delete_urls,
    )
    from greynirserver_spark.plans.pipeline import query_to_terms
    from greynirserver_spark.query.searcher import Searcher

    pages = spark.createDataFrame(generate_pages_pdf(200))
    store = build_index_checkpointed(
        spark, pages, str(tmp_path / "store"), n_shards=4, block_size=16
    )
    terms = query_to_terms(" ".join(indexable_stems_by_rank(2)))
    s = Searcher(spark, store)
    fc = s.facets(terms, facet="domain", k=10)
    assert fc and all(c > 0 for _, c in fc)
    total = sum(c for _, c in fc)

    # domain counts must equal a direct match-set group-by
    from greynirserver_spark.operators.wand import matched_docs

    dm = store.load(spark, "doc_map").withColumn(
        "domain", F.regexp_extract("url", r"^https?://([^/]+)", 1)
    )
    expect = {
        (r.domain, r.cnt)
        for r in matched_docs(store.load_segments(spark), terms)
        .join(dm, "doc_id")
        .groupBy("domain")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert set(fc) == expect

    # tombstoned docs leave the counts (distributed anti-join path)
    victims = [
        r.url
        for r in matched_docs(store.load_segments(spark), terms)
        .join(dm, "doc_id")
        .limit(3)
        .collect()
    ]
    delete_urls(spark, store, victims)
    s2 = Searcher(spark, store)
    fc2 = s2.facets(terms, facet="domain", k=10)
    assert sum(c for _, c in fc2) == total - len(victims)


def test_fielded_postings_split_sums_to_total_tf(spark):
    docs = _docs(spark)
    from greynirserver_spark.operators.textops import document_postings

    post, flen = fielded_postings(docs, title_tokens=3)
    merged = {
        (r.term, r.doc_id): r.tf_title + r.tf_body for r in post.collect()
    }
    total = {
        (r.term, r.doc_id): r.tf for r in document_postings(docs).collect()
    }
    assert merged == total
    # field lengths sum to doclen
    fl = {r.doc_id: (r.len_title, r.len_body) for r in flen.collect()}
    assert fl[5] == (3, 0)  # 3-token doc: all title, empty body
    assert fl[1] == (3, 4)


def test_bm25f_title_hit_outranks_body_hit(spark):
    # identical token multisets; 'spark' in the title field (first 8)
    # of doc 1, in the body of doc 2 — the 2x title weight must win
    rows = [
        (1, "spark a b c d e f g h i j k l m n", "is", "x"),
        (2, "a b c d e f g h i j k spark l m n", "is", "x"),
        (3, "spark spark unrelated words in here", "is", "x"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    out = bm25f_documents_topk(
        docs, ["spark"], k=3, min_df=1, title_tokens=8, title_weight=2.0
    ).collect()
    scores = {r.doc_id: r.score for r in out}
    assert scores[1] > scores[2]


def test_bm25f_single_field_reduces_to_bm25(spark):
    """With no title field, BM25F == BM25 / (k1 + 1) doc-for-doc:
    tf*(k1+1)/(tf + k1*norm) == (k1+1) * (tf/norm)/((tf/norm) + k1)."""
    from greynirserver_spark.operators.textops import (
        bm25_documents_topk,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    )
    terms = ["spark", "join", "window", "stream"]
    plain = {
        r.doc_id: r.score
        for r in bm25_documents_topk(docs, terms, k=100).collect()
    }
    fielded = {
        r.doc_id: r.score
        for r in bm25f_documents_topk(
            docs, terms, k=100, title_tokens=0, title_weight=2.0
        ).collect()
    }
    assert set(plain) == set(fielded)
    for d, sc in plain.items():
        assert fielded[d] == pytest.approx(sc / 2.2, abs=2e-3)


def test_bm25f_reduction_holds_with_empty_and_null_docs(spark):
    """Corpus stats must count TOKEN-BEARING docs only (the plain-BM25
    universe): with an empty-text and a NULL-text doc present, the
    single-field reduction still holds exactly, and size(NULL)=-1 must
    never pollute the field-length sums (round-5 review finding)."""
    from greynirserver_spark.operators.textops import bm25_documents_topk

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    extra = spark.createDataFrame(
        [(900001, ""), (900002, None), (900003, "   ")],
        "doc_id long, text string",
    )
    docs2 = docs.union(extra)
    terms = ["spark", "join", "window", "stream"]
    plain = {
        r.doc_id: r.score
        for r in bm25_documents_topk(docs2, terms, k=100).collect()
    }
    fielded = {
        r.doc_id: r.score
        for r in bm25f_documents_topk(
            docs2, terms, k=100, title_tokens=0, title_weight=2.0
        ).collect()
    }
    assert set(plain) == set(fielded)
    assert plain  # the query actually matched
    for d, sc in plain.items():
        assert fielded[d] == pytest.approx(sc / 2.2, abs=2e-3)
