"""Round-5 serving completions: site-collapse diversification, score
explain, and prefix suggest — corpus-level operators plus their
index-backed Searcher twins."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import pytest
from pyspark.sql import functions as F

from greynirserver_spark.corpus import generate_pages, indexable_stems_by_rank
from greynirserver_spark.operators.textops import (
    bm25_documents_topk,
    bm25_score_breakdown,
    bm25_topk_source_collapsed,
    document_term_stats,
    suggest_terms,
)
from greynirserver_spark.plans.lineage import build_index_checkpointed
from greynirserver_spark.plans.pipeline import query_to_terms
from greynirserver_spark.query.searcher import Searcher

_TERMS = ["spark", "join", "window", "stream"]


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .cache()
    )


@pytest.fixture(scope="module")
def searcher(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("div") / "store")
    pages = generate_pages(spark, 400)
    store = build_index_checkpointed(spark, pages, root, n_shards=4)
    return Searcher(spark, store, version_check_interval_s=0.0)


# ---------------------------------------------------------------------------
# corpus-level operators
# ---------------------------------------------------------------------------

def _greedy_collapse(ranked, per_key, k):
    counts, out = {}, []
    for row in ranked:
        c = counts.get(row[-2], 0)  # key is second-to-last column
        if c < per_key:
            counts[row[-2]] = c + 1
            out.append(row)
            if len(out) == k:
                break
    return out


def test_source_collapsed_is_exact_greedy_over_full_ranking(docs):
    full = (
        bm25_documents_topk(docs, _TERMS, k=10**6)
        .join(docs.select("doc_id", "source"), "doc_id")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .select("doc_id", "source", "score")
        .collect()
    )
    expect = _greedy_collapse(
        [(r.doc_id, r.source, r.score) for r in full], per_key=2, k=20
    )
    got = bm25_topk_source_collapsed(
        docs, _TERMS, k=20, per_source=2
    ).collect()
    assert [(r.doc_id, r.source, r.score) for r in got] == expect
    assert [r.rank for r in got] == list(range(1, len(got) + 1))
    # the cap is actually binding on this corpus (else the test is vacuous)
    plain = [r.doc_id for r in bm25_documents_topk(docs, _TERMS, k=20).collect()]
    assert plain != [r.doc_id for r in got]


def test_source_collapsed_cap_respected(docs):
    got = bm25_topk_source_collapsed(
        docs, _TERMS, k=50, per_source=1
    ).collect()
    sources = [r.source for r in got]
    assert len(sources) == len(set(sources))


def test_breakdown_contributions_sum_to_score(docs):
    top5 = [
        r.doc_id for r in bm25_documents_topk(docs, _TERMS, k=5).collect()
    ]
    rows = bm25_score_breakdown(docs, _TERMS, k=5).collect()
    assert sorted({r.doc_id for r in rows}) == sorted(top5)
    by_doc: dict = {}
    for r in rows:
        assert r.tf > 0 and r.df >= 3 and r.idf > 0
        by_doc.setdefault(r.doc_id, []).append(r)
    for d, terms in by_doc.items():
        total = sum(t.contrib for t in terms)
        # each contrib rounded at 4, score rounded once: tolerance is
        # the worst-case accumulation of per-term rounding
        assert total == pytest.approx(
            terms[0].score, abs=5e-4 * len(terms) + 1e-9
        )


def test_suggest_terms_prefix_and_order(docs):
    got = [(r.term, r.df) for r in suggest_terms(docs, "s", k=10).collect()]
    assert got, "prefix 's' must match planted vocabulary"
    assert all(t.startswith("s") for t, _ in got)
    stats = {
        r.term: r.df
        for r in document_term_stats(docs, min_df=3)
        .where(F.col("term").startswith("s"))
        .collect()
    }
    expect = sorted(stats.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == expect
    with pytest.raises(ValueError):
        suggest_terms(docs, "", k=5)


# ---------------------------------------------------------------------------
# index-backed Searcher twins
# ---------------------------------------------------------------------------

def test_searcher_collapsed_matches_greedy_over_search(searcher):
    terms = query_to_terms(" ".join(indexable_stems_by_rank(3)))
    full = searcher.search(terms, 400)
    assert len(full) > 20
    hosts = {
        d: h for d, h, _ in searcher.search_collapsed(terms, k=400,
                                                      per_domain=10**6)
    }
    expect = _greedy_collapse(
        [(d, hosts[d], s) for d, s in full], per_key=2, k=10
    )
    got = searcher.search_collapsed(terms, k=10, per_domain=2)
    assert got == expect
    per_host: dict = {}
    for _, h, _ in got:
        per_host[h] = per_host.get(h, 0) + 1
    assert all(c <= 2 for c in per_host.values())


def test_searcher_explain_sums_to_served_score(searcher):
    terms = query_to_terms(" ".join(indexable_stems_by_rank(3)))
    hits = searcher.search(terms, 5)
    assert hits
    for doc_id, score in hits:
        rows = searcher.explain(terms, doc_id)
        assert rows
        assert {t for t, _, _ in rows} <= set(terms)
        assert sum(c for _, _, c in rows) == pytest.approx(score, rel=1e-9)
        assert all(i > 0 for _, i, _ in rows)


def test_searcher_explain_unmatched_doc_is_empty(searcher):
    terms = query_to_terms(" ".join(indexable_stems_by_rank(2)))
    assert searcher.explain(terms, 10**12) == []


def test_searcher_suggest_from_store_vocabulary(searcher):
    stem = indexable_stems_by_rank(1)[0]
    p = stem[:2].lower()
    got = searcher.suggest(p, k=10)
    assert got
    assert all(t.startswith(p) for t, _ in got)
    dfs = [df for _, df in got]
    assert dfs == sorted(dfs, reverse=True) or len(got) <= 1 or all(
        (dfs[i] > dfs[i + 1])
        or (dfs[i] == dfs[i + 1] and got[i][0] < got[i + 1][0])
        for i in range(len(got) - 1)
    )
    # served from cache second time (same object)
    assert searcher.suggest(p, k=10) == got
    with pytest.raises(ValueError):
        searcher.suggest("", k=5)


# ---------------------------------------------------------------------------
# synonym-group BM25 (SynonymQuery semantics)
# ---------------------------------------------------------------------------

def test_synonym_singletons_reduce_to_plain_bm25(docs):
    from greynirserver_spark.operators.textops import bm25_synonym_topk

    plain = bm25_documents_topk(docs, _TERMS, k=50).collect()
    syn = bm25_synonym_topk(docs, [[t] for t in _TERMS], k=50).collect()
    assert [(r.rank, r.doc_id, r.score) for r in plain] == [
        (r.rank, r.doc_id, r.score) for r in syn
    ]


def test_synonym_group_scores_as_one_pseudo_term(docs):
    """A doc using both members once must score the group like a doc
    using one member twice (identical tf), and must NOT get two idf
    rewards."""
    import pandas as pd
    from greynirserver_spark.operators.textops import bm25_synonym_topk

    spark = docs.sparkSession
    base = ["filler"] * 8
    rows = [
        (1, " ".join(base + ["spark", "stream"])),   # one of each member
        (2, " ".join(base + ["spark", "spark"])),    # one member twice
        (3, " ".join(base + ["spark"])),             # tf 1
    ] + [(10 + i, " ".join(base + ["spark"])) for i in range(4)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r.score
        for r in bm25_synonym_topk(d, [["spark", "stream"]], k=10,
                                   min_df=1).collect()
    }
    assert out[1] == out[2]          # summed tf, single saturation
    assert out[1] > out[3]
    # doc 1's score comes from ONE idf over the group (df = docs with
    # ANY member = 7), not spark-idf + stream-idf
    import math
    n, df, tf = 7, 7, 2
    dl, avgdl = 10, 65 / 7  # docs: 10, 10, 9, and four of 9 tokens
    idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    expect = round(idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)), 4)
    assert out[1] == pytest.approx(expect, abs=1e-9)


def test_synonym_rejects_cross_group_duplicates(docs):
    from greynirserver_spark.operators.textops import bm25_synonym_topk

    with pytest.raises(ValueError):
        bm25_synonym_topk(docs, [["spark"], ["spark", "stream"]], k=5)
    with pytest.raises(ValueError):
        bm25_synonym_topk(docs, [[]], k=5)


def test_searcher_synonym_singletons_match_search(searcher):
    terms = query_to_terms(" ".join(indexable_stems_by_rank(3)))
    via_search = searcher.search(terms, 10)
    via_syn = searcher.synonym([[t] for t in terms], 10)
    assert [d for d, _ in via_syn] == [d for d, _ in via_search]
    for (_, s1), (_, s2) in zip(via_syn, via_search):
        assert s1 == pytest.approx(s2, rel=1e-6)


def test_searcher_synonym_group_fold(searcher):
    stems = indexable_stems_by_rank(4)
    terms = query_to_terms(" ".join(stems))
    assert len(terms) >= 2
    grouped = searcher.synonym([terms[:2], *[[t] for t in terms[2:]]], 10)
    assert grouped
    # folding two terms into one group can only DROP total idf mass
    # vs scoring them separately: top score must not increase
    separate = searcher.synonym([[t] for t in terms], 10)
    assert grouped[0][1] <= separate[0][1] + 1e-9
    # cached replay returns the identical object content
    assert searcher.synonym(
        [terms[:2], *[[t] for t in terms[2:]]], 10) == grouped
    with pytest.raises(ValueError):
        searcher.synonym([[terms[0]], terms[:2]], 5)


def test_synonym_and_explain_respect_tombstones(spark, tmp_path_factory):
    """Post-delete consistency (round-5 self-review findings): explain
    must not fabricate a breakdown for a doc search() no longer serves,
    and singleton-group synonym() must keep matching search() under a
    delete backlog (both use baked stats; both exclude tombstones from
    results only)."""
    from greynirserver_spark.plans.lineage import delete_urls

    root = str(tmp_path_factory.mktemp("tombsyn") / "store")
    store = build_index_checkpointed(
        spark, generate_pages(spark, 300), root, n_shards=4
    )
    s = Searcher(spark, store, version_check_interval_s=0.0)
    terms = query_to_terms(" ".join(indexable_stems_by_rank(3)))
    before = s.search(terms, 5)
    assert before
    victim = before[0][0]
    assert s.explain(terms, victim)  # served doc has a breakdown
    url = (
        store.load(spark, "doc_map")
        .where(F.col("doc_id") == victim)
        .first()["url"]
    )
    assert delete_urls(spark, store, [url]) == 1

    assert s.explain(terms, victim) == []  # no served score to explain
    after_search = s.search(terms, 5)
    after_syn = s.synonym([[t] for t in terms], 5)
    assert victim not in [d for d, _ in after_search]
    assert victim not in [d for d, _ in after_syn]
    assert [d for d, _ in after_syn] == [d for d, _ in after_search]
    for (_, s1), (_, s2) in zip(after_syn, after_search):
        assert s1 == pytest.approx(s2, rel=1e-6)


def test_searcher_synonym_inprocess_matches_distributed(searcher):
    """Mixed-group synonym: the in-process block-decode path must be
    rank- and score-identical to the distributed raw-postings path
    (forced via a zero fetch cap)."""
    terms = query_to_terms(" ".join(indexable_stems_by_rank(4)))
    groups = [terms[:2]] + [[t] for t in terms[2:]]
    searcher._cache.clear()
    fast = searcher.synonym(groups, 10)
    assert fast
    old_cap = searcher._max_fetch_blocks
    searcher._cache.clear()
    searcher._max_fetch_blocks = 0
    try:
        slow = searcher.synonym(groups, 10)
    finally:
        searcher._max_fetch_blocks = old_cap
        searcher._cache.clear()
    assert [d for d, _ in fast] == [d for d, _ in slow]
    for (_, s1), (_, s2) in zip(fast, slow):
        assert s1 == pytest.approx(s2, rel=1e-9)


def test_searcher_synonym_submindf_member_matches_distributed(
    spark, tmp_path_factory
):
    """A group containing a member BELOW the store's min_df must score
    identically to the distributed raw-postings path: segments are
    df-pruned at bake time, so the in-process path must detect the
    uncovered member and route to the exact path (round-5 self-found
    edge)."""
    root = str(tmp_path_factory.mktemp("rare") / "store")
    store = build_index_checkpointed(
        spark, generate_pages(spark, 300), root, n_shards=4, min_df=3
    )
    s = Searcher(spark, store, version_check_interval_s=0.0,
                 cache_ttl_s=0.0)
    post = store.load(spark, "postings")
    rare = (
        post.groupBy("term").count().where(F.col("count") < 3)
        .orderBy("term").limit(1).collect()
    )
    assert rare, "fixture must contain a sub-min_df term"
    rare_t = rare[0]["term"]
    common = query_to_terms(" ".join(indexable_stems_by_rank(2)))
    groups = [[rare_t, common[0]], [common[1]]]
    got = s.synonym(groups, 10)
    cap = s._max_fetch_blocks
    s._max_fetch_blocks = 0
    try:
        expect = s.synonym(groups, 10)
    finally:
        s._max_fetch_blocks = cap
    assert [d for d, _ in got] == [d for d, _ in expect]
    for (_, s1), (_, s2) in zip(got, expect):
        assert s1 == pytest.approx(s2, rel=1e-9)
