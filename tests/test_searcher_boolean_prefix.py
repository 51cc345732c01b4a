"""Searcher.boolean / Searcher.prefix — the interactive serving paths
for the boolean (MUST/SHOULD/MUST_NOT) and trailing-wildcard query
surfaces added in operators/wand.py, incl. tombstone exclusion and the
distributed terminal plans.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from greynirserver_spark.corpus import generate_pages_pdf, indexable_stems_by_rank
from greynirserver_spark.operators.wand import boolean_topk, prefix_topk, wand_topk
from greynirserver_spark.plans.lineage import build_index_checkpointed, delete_urls
from greynirserver_spark.plans.pipeline import query_to_terms
from greynirserver_spark.query.searcher import Searcher


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    pages = spark.createDataFrame(generate_pages_pdf(250))
    root = str(tmp_path_factory.mktemp("sbp") / "store")
    return build_index_checkpointed(spark, pages, root, n_shards=6,
                                    block_size=16)


def _terms(n, start=0):
    return query_to_terms(" ".join(indexable_stems_by_rank(n, start_rank=start)))


def test_boolean_matches_distributed(spark, store):
    searcher = Searcher(spark, store)
    segments = store.load_segments(spark)
    corpus = store.load(spark, "corpus")
    must = _terms(1)
    should = _terms(1, start=40)
    must_not = _terms(1, start=200)
    local = searcher.boolean(must, should=should, must_not=must_not, k=12)
    dist = [
        (r.doc_id, r.score)
        for r in boolean_topk(
            segments, must, corpus, should=should, must_not=must_not,
            k=12,
        ).collect()
    ]
    assert local == dist
    assert len(local) > 0


def test_boolean_must_gate_and_not_gate(spark, store):
    searcher = Searcher(spark, store)
    must = _terms(2)
    hits = searcher.boolean(must, k=15)
    assert hits
    # every hit contains both must terms: intersect with single-term
    # searches over the full doc space
    for t in must:
        one = {d for d, _ in searcher.boolean([t], k=10_000)}
        assert {d for d, _ in hits} <= one
    # excluding one of the must terms empties the result
    assert searcher.boolean(must, must_not=[must[0]], k=15) == []


def test_boolean_should_only_matches_search(spark, store):
    searcher = Searcher(spark, store)
    terms = _terms(2, start=80)
    assert searcher.boolean([], should=terms, k=10) == \
        searcher.search(terms, k=10)


def test_prefix_matches_distributed_and_cap(spark, store):
    searcher = Searcher(spark, store)
    segments = store.load_segments(spark)
    corpus = store.load(spark, "corpus")
    stem = indexable_stems_by_rank(1)[0]
    pre = query_to_terms(stem)[0][:3]
    for cap in (2, 32):
        local = searcher.prefix(pre, k=12, max_expand=cap)
        dist = [
            (r.doc_id, r.score)
            for r in prefix_topk(segments, pre, corpus, k=12,
                                 max_expand=cap).collect()
        ]
        assert local == dist
    assert searcher.prefix(pre, k=12, max_expand=32)
    assert searcher.prefix("zzzzqq", k=5) == []


def test_boolean_and_prefix_exclude_tombstones(spark, tmp_path_factory):
    pages = spark.createDataFrame(generate_pages_pdf(220))
    root = str(tmp_path_factory.mktemp("sbp_del") / "store")
    store = build_index_checkpointed(spark, pages, root, n_shards=4,
                                     block_size=16)
    searcher = Searcher(spark, store)
    must = _terms(1)
    pre = must[0][:3]
    before_b = searcher.boolean(must, k=10)
    before_p = searcher.prefix(pre, k=10)
    assert before_b and before_p
    victims = {before_b[0][0], before_p[0][0]}
    doc_map = store.load(spark, "doc_map")
    urls = [
        r["url"]
        for r in doc_map.where(
            doc_map.doc_id.isin([int(v) for v in victims])
        ).collect()
    ]
    delete_urls(spark, store, urls)
    searcher2 = Searcher(spark, store)
    after_b = searcher2.boolean(must, k=10)
    after_p = searcher2.prefix(pre, k=10)
    assert not victims & {d for d, _ in after_b}
    assert not victims & {d for d, _ in after_p}
    # survivors keep their relative order
    kept_b = [r for r in before_b if r[0] not in victims]
    assert after_b[: len(kept_b)] == kept_b or len(after_b) == 10


def test_boolean_above_cap_terminal_plan(spark, tmp_path_factory):
    """Force the above-cap backlog shape (tombstone_driver_cap=1) so
    boolean/prefix run the distributed anti-join filter + exact
    terminal plans."""
    pages = spark.createDataFrame(generate_pages_pdf(200))
    root = str(tmp_path_factory.mktemp("sbp_cap") / "store")
    store = build_index_checkpointed(spark, pages, root, n_shards=4,
                                     block_size=16)
    searcher0 = Searcher(spark, store)
    must = _terms(1)
    pre = must[0][:3]
    base_b = searcher0.boolean(must, k=8)
    base_p = searcher0.prefix(pre, k=8)
    victims = sorted({d for d, _ in base_b[:3]} | {d for d, _ in base_p[:3]})
    doc_map = store.load(spark, "doc_map")
    urls = [
        r["url"]
        for r in doc_map.where(doc_map.doc_id.isin(victims)).collect()
    ]
    delete_urls(spark, store, urls)
    searcher = Searcher(spark, store, tombstone_driver_cap=1)
    assert searcher._tomb_df is not None  # above-cap: executor-side set
    after_b = searcher.boolean(must, k=8)
    after_p = searcher.prefix(pre, k=8)
    assert not set(victims) & {d for d, _ in after_b}
    assert not set(victims) & {d for d, _ in after_p}
    assert after_b and after_p


def test_snippets_highlight_and_bound(spark, store):
    from greynirserver_spark.query.searcher import _kwic_window

    searcher = Searcher(spark, store)
    terms = _terms(2)
    hits = searcher.search(terms, 6)
    snips = searcher.snippets(terms, 6, width=8)
    # ranking identical to search; snippet non-empty and highlighted
    assert [(d, s) for d, s, _ in snips] == hits
    for _, _, sn in snips:
        assert sn
        assert len(sn.split()) <= 17  # 2*width+1 tokens
    assert any("**" in sn for _, _, sn in snips)
    # unit: tie-break earliest, head fallback when nothing matches
    assert _kwic_window("alpha beta gamma", {"zzz/entity"}, 2) \
        == "alpha beta gamma"
    # the window centered on the 2-distinct-term region wins over the
    # earlier 1-term match
    text = "foo " * 5 + "alpha " + "bar " * 30 + "alpha beta " + "baz " * 5
    from greynirserver_spark.plans.pipeline import query_to_terms
    q = set(query_to_terms("alpha beta"))
    win = _kwic_window(text.strip(), q, 3)
    assert "**alpha** **beta**" in win


def test_index_health_report(spark, tmp_path_factory):
    from greynirserver_spark.plans.lineage import (
        build_index_checkpointed, delete_urls, index_health,
    )

    pages = spark.createDataFrame(generate_pages_pdf(150))
    root = str(tmp_path_factory.mktemp("health") / "store")
    store = build_index_checkpointed(spark, pages, root, n_shards=4,
                                     block_size=32)
    h = index_health(spark, store).collect()[0]
    # n_docs counts INDEXED docs (non-Icelandic pages filtered at build)
    assert h["n_docs"] == store.load(spark, "doc_map").count()
    assert h["avgdl"] > 0
    assert h["segment_bytes"] > 0 and h["store_bytes"] > h["segment_bytes"]
    assert h["positional_bytes"] == 0  # built without positions
    assert h["n_tombstones"] == 0 and not h["stats_dirty"]
    assert h["committed_shards"] == 4 and h["total_wall_ms"] > 0
    # a delete surfaces in the backlog column
    url = store.load(spark, "doc_map").limit(1).collect()[0]["url"]
    delete_urls(spark, store, [url])
    h2 = index_health(spark, store).collect()[0]
    assert h2["n_tombstones"] == 1


def test_search_page_consistency(spark, store):
    searcher = Searcher(spark, store)
    terms = _terms(2)
    full = searcher.search(terms, 9)
    pages = [searcher.search_page(terms, 3, off) for off in (0, 3, 6)]
    assert pages[0] + pages[1] + pages[2] == full
    with pytest.raises(ValueError):
        searcher.search_page(terms, 3, -1)


def test_searcher_boolean_phrase(spark, tmp_path_factory):
    """In-process phrase-clause boolean == distributed cogrouped
    operator; distributed fallback (fetch cap 0) agrees; tombstones
    excluded."""
    import re
    from collections import Counter

    from greynirserver_spark.operators.wand import boolean_phrase_topk
    from greynirserver_spark.tokenization import PY_TOKEN_SPLIT_RE

    pages = spark.createDataFrame(generate_pages_pdf(150))
    root = str(tmp_path_factory.mktemp("sbp_ph") / "store")
    store = build_index_checkpointed(spark, pages, root, n_shards=4,
                                     block_size=32, with_positions=True)
    texts = {
        r["doc_id"]: r["text"]
        for r in store.load(spark, "doc_map")
        .select("doc_id", "text").collect()
    }

    def toks(t):
        return [w for w in re.split(PY_TOKEN_SPLIT_RE, t.lower()) if w]

    big = Counter()
    for t in texts.values():
        tk = toks(t)
        big.update(zip(tk, tk[1:]))
    (w1, w2), _ = big.most_common(1)[0]
    indexed = {
        r["term"]
        for r in store.load(spark, "term_stats").select("term").collect()
    }
    carrier = next(
        tk for tk in map(toks, texts.values())
        if any(a == w1 and b == w2 for a, b in zip(tk, tk[1:]))
    )
    must = next(
        [query_to_terms(w)[0]] for w in carrier
        if query_to_terms(w) and query_to_terms(w)[0] in indexed
    )
    phrases = [[w1, w2]]

    s = Searcher(spark, store)
    got = s.boolean_phrase(phrases, must=must, k=10)
    assert got
    dist = [
        (r["doc_id"], r["score"])
        for r in boolean_phrase_topk(
            store.load_segments(spark),
            store.load(spark, "positions"),
            store.load(spark, "corpus"),
            phrases, must=must, k=10,
        ).collect()
    ]
    assert got == dist
    s_low = Searcher(spark, store, max_fetch_blocks=0)
    assert s_low.boolean_phrase(phrases, must=must, k=10) == dist
    # delete the top hit; it must vanish
    victim = got[0][0]
    dm = store.load(spark, "doc_map")
    url = dm.where(dm.doc_id == victim).collect()[0]["url"]
    delete_urls(spark, store, [url])
    s2 = Searcher(spark, store)
    after = s2.boolean_phrase(phrases, must=must, k=10)
    assert victim not in {d for d, _ in after}
