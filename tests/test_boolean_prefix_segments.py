"""Boolean (MUST/SHOULD/MUST_NOT) and prefix-wildcard retrieval served
from the compressed segment store (operators/wand.py::boolean_topk /
prefix_topk) — the serving-side counterparts of textops'
bm25_boolean_topk and term autocomplete.

Reference parity: GreynirServer's search exposes only plain-OR term
search (/root/reference/search.py); AND/NOT and wildcard are the
standard fulltext surfaces the index tier adds. Gate semantics over the
INDEXED vocabulary (df >= min_df) are pinned explicitly here.
"""

import math

import pytest

from pyspark.sql import functions as F

from greynirserver_spark.operators.textops import (
    bm25_boolean_topk,
    bm25_boolean_segments_topk,
    prefix_documents_topk,
    bm25_wand_documents_topk,
    _documents_segment_index,
)
from greynirserver_spark.operators.wand import boolean_topk, prefix_topk


DOCS = [
    # spark+join docs, some with slow, one with the rare term 'zeta'
    (0, "spark join window spark fast", "is", "w", 10),
    (1, "spark join stream slow slow", "is", "w", 10),
    (2, "spark join join window stream", "is", "w", 10),
    (3, "spark window stream fast", "is", "w", 10),       # no join
    (4, "join stream window slow", "is", "w", 10),        # no spark
    (5, "spark join zeta window", "is", "w", 10),         # rare term
    (6, "spark spark join stream window fast", "is", "w", 10),
    (7, "slow fast window stream", "is", "w", 10),
    (8, "spark join slow window", "is", "w", 10),
    (9, "stream stream window fast join spark", "is", "w", 10),
]


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df = df.cache()
    df.count()
    yield df
    df.unpersist()


def _rows(df):
    return [(r["rank"], r["doc_id"], r["score"]) for r in df.collect()]


def test_boolean_segments_matches_corpus_variant(docs):
    """All query terms indexed (df>=min_df) => the raw-postings gate and
    the indexed gate coincide, so the two implementations must agree."""
    kw = dict(must=["spark", "join"], should=["stream"],
              must_not=["slow"], k=10)
    corpus_side = _rows(bm25_boolean_topk(docs, min_df=2, **kw))
    seg_side = _rows(bm25_boolean_segments_topk(docs, min_df=2, **kw))
    assert corpus_side == seg_side
    assert len(seg_side) > 0
    got_docs = {d for _, d, _ in seg_side}
    # the gate: every survivor has spark AND join, none has slow
    assert got_docs <= {0, 2, 5, 6, 9}
    assert {1, 8} & got_docs == set()


def test_boolean_segments_brute_force_scores(docs, spark):
    """Exact BM25 sums vs a hand-rolled python scorer (no segments)."""
    from collections import Counter, defaultdict

    toks = {d: t.split() for d, t, *_ in DOCS}
    n_docs = len(DOCS)
    avgdl = sum(len(v) for v in toks.values()) / n_docs
    df_ = Counter()
    for ts in toks.values():
        df_.update(set(ts))
    min_df = 2
    idf = {
        t: math.log((n_docs - d + 0.5) / (d + 0.5) + 1.0)
        for t, d in df_.items() if d >= min_df
    }
    must, should, must_not = ["spark", "join"], ["stream"], ["slow"]
    expected = {}
    for d, ts in toks.items():
        tf = Counter(ts)
        if not all(t in tf for t in must):
            continue
        if any(t in tf for t in must_not):
            continue
        s = 0.0
        for t in sorted(set(must) | set(should)):
            if t in tf and t in idf:
                s += idf[t] * (tf[t] * 2.2) / (
                    tf[t] + 1.2 * (0.25 + 0.75 * len(ts) / avgdl)
                )
        expected[d] = round(s, 4)
    got = _rows(bm25_boolean_segments_topk(
        docs, must=must, should=should, must_not=must_not, k=10,
        min_df=min_df,
    ))
    assert {d: s for _, d, s in got} == expected
    # ranks: score desc, doc_id asc
    assert [d for _, d, _ in got] == sorted(
        expected, key=lambda d: (-expected[d], d)
    )


def test_boolean_must_term_df_pruned_is_empty(docs):
    """A must term below min_df was never indexed: strict AND over the
    indexed vocabulary answers empty (what a scratch build of the
    pruned index would say). Pinned deliberately — the corpus-side
    variant gates on raw postings and WOULD match doc 5."""
    seg = bm25_boolean_segments_topk(
        docs, must=["spark", "zeta"], k=10, min_df=2
    )
    assert seg.count() == 0
    corpus_side = bm25_boolean_topk(docs, must=["spark", "zeta"], k=10,
                                    min_df=2)
    assert corpus_side.count() == 1  # doc 5 — the documented divergence


def test_boolean_must_not_df_pruned_excludes_nothing(docs):
    """A df-pruned must_not term excludes nothing on the segment side."""
    base = _rows(bm25_boolean_segments_topk(
        docs, must=["spark", "join"], k=10, min_df=2
    ))
    with_rare_not = _rows(bm25_boolean_segments_topk(
        docs, must=["spark", "join"], must_not=["zeta"], k=10, min_df=2
    ))
    assert with_rare_not == base  # doc 5 survives: zeta is unindexed


def test_boolean_should_only_equals_wand(docs):
    """No must/must_not degenerates to plain OR — must equal the WAND
    serving path on the same terms."""
    terms = ["spark", "stream"]
    via_bool = _rows(bm25_boolean_segments_topk(
        docs, must=[], should=terms, k=10, min_df=2
    ))
    via_wand = _rows(bm25_wand_documents_topk(docs, terms, k=10, min_df=2))
    assert via_bool == via_wand


def test_boolean_empty_inputs(docs, spark):
    segments, corpus = _documents_segment_index(docs, 2, 4)
    out = boolean_topk(segments, [], corpus, should=[], k=5)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["rank", "doc_id", "score"]


def test_prefix_expansion_cap_by_df(docs):
    """'s*' at max_expand=2 keeps only the 2 highest-df s-terms
    (df desc, term asc) — result equals WAND over that hand-computed
    expansion; a wider cap changes the expansion and the result."""
    from collections import Counter

    toks = {d: t.split() for d, t, *_ in DOCS}
    df_ = Counter()
    for ts in toks.values():
        df_.update(set(ts))
    s_terms = sorted(
        (t for t, d in df_.items() if t.startswith("s") and d >= 2),
        key=lambda t: (-df_[t], t),
    )
    capped = _rows(prefix_documents_topk(docs, "s", k=10, max_expand=2,
                                         min_df=2))
    manual = _rows(bm25_wand_documents_topk(docs, s_terms[:2], k=10,
                                            min_df=2))
    assert capped == manual and len(capped) > 0
    full = _rows(prefix_documents_topk(docs, "s", k=10, max_expand=50,
                                       min_df=2))
    manual_full = _rows(bm25_wand_documents_topk(docs, s_terms, k=10,
                                                 min_df=2))
    assert full == manual_full
    assert full != capped  # the cap is observable on this fixture


def test_prefix_no_match_is_empty(docs, spark):
    segments, corpus = _documents_segment_index(docs, 2, 4)
    out = prefix_topk(segments, "qqq", corpus, k=5)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["rank", "doc_id", "score"]


def test_no_cartesian_in_boolean_plan(docs):
    segments, corpus = _documents_segment_index(docs, 2, 4)
    plan = boolean_topk(
        segments, ["spark"], corpus, should=["stream"], must_not=["slow"],
        k=5,
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    from greynirserver_spark.operators.segments import release_cached_deps
    release_cached_deps(segments)


def test_matched_docs_and_hit_count(docs, spark):
    from greynirserver_spark.operators.wand import matched_docs
    from greynirserver_spark.operators.textops import (
        hit_count_documents, facet_counts_documents,
    )
    from collections import Counter

    toks = {d: t.split() for d, t, *_ in DOCS}
    df_ = Counter()
    for ts in toks.values():
        df_.update(set(ts))
    indexed = {t for t, c in df_.items() if c >= 2}
    q = ["spark", "slow", "zeta"]  # zeta is df-pruned at min_df=2
    expect = {d for d, ts in toks.items()
              if set(ts) & (set(q) & indexed)}
    segments, _ = _documents_segment_index(docs, 2, 4)
    got = {r["doc_id"] for r in matched_docs(segments, q).collect()}
    assert got == expect
    # distinctness: no doc twice even when it carries several terms
    assert matched_docs(segments, q).count() == len(expect)
    from greynirserver_spark.operators.segments import release_cached_deps
    release_cached_deps(segments)
    hc = hit_count_documents(docs, q, min_df=2).collect()
    assert [(r["n_hits"]) for r in hc] == [len(expect)]
    # facets over the one-source fixture: a single row, full count
    fc = facet_counts_documents(docs, q, facet="source", min_df=2).collect()
    assert [(r["facet_value"], r["n_hits"]) for r in fc] == [("w", len(expect))]
    # empty query
    assert matched_docs(segments2 := _documents_segment_index(docs, 2, 4)[0], []).count() == 0
    release_cached_deps(segments2)


def test_boolean_batch_matches_per_query(docs):
    """Each qid's rows in ONE batched job == the per-query operator."""
    from greynirserver_spark.operators.textops import (
        bm25_boolean_segments_topk_batch,
    )

    queries = {
        "a": (["spark", "join"], ["stream"], ["slow"]),
        "b": (["window"], [], []),
        "c": ([], ["fast", "stream"], ["spark"]),
        "d": (["spark", "zeta"], [], []),  # pruned conjunct -> empty
    }
    batch = bm25_boolean_segments_topk_batch(docs, queries, k=10,
                                             min_df=2)
    got = {}
    for r in batch.collect():
        got.setdefault(r["qid"], []).append(
            (r["rank"], r["doc_id"], r["score"])
        )
    for qid, (m, s, n) in queries.items():
        single = _rows(bm25_boolean_segments_topk(
            docs, must=m, should=s, must_not=n, k=10, min_df=2
        ))
        assert got.get(qid, []) == single, qid
    assert "d" not in got  # strict AND with an unindexed conjunct


def test_hit_count_bounds_sandwich(docs):
    """Metadata bounds always sandwich the exact count; equality holds
    for a single term (lb == exact == ub)."""
    from greynirserver_spark.operators.textops import (
        hit_count_bounds_documents, hit_count_documents,
    )

    for q in (["spark", "slow"], ["window"], ["spark", "join", "fast"]):
        b = hit_count_bounds_documents(docs, q, min_df=2).collect()[0]
        exact = hit_count_documents(docs, q, min_df=2).collect()[0]["n_hits"]
        assert b["lb_hits"] <= exact <= b["ub_hits"], q
        if len(q) == 1:
            assert b["lb_hits"] == exact == b["ub_hits"]
    # unindexed-only query: both bounds zero
    z = hit_count_bounds_documents(docs, ["zeta"], min_df=2).collect()[0]
    assert (z["lb_hits"], z["ub_hits"]) == (0, 0)


def test_boolean_phrase_gate(docs, spark):
    """Phrase-clause boolean: gate = docs containing the consecutive
    phrase AND every must term, minus must_not; scored over must+should
    only. Brute-forced on the fixture."""
    from greynirserver_spark.operators.textops import (
        bm25_boolean_phrase_topk,
    )
    from collections import Counter
    import math

    toks = {d: t.split() for d, t, *_ in DOCS}

    def has_phrase(ts, ph):
        return any(
            ts[i:i + len(ph)] == ph for i in range(len(ts) - len(ph) + 1)
        )

    n_docs = len(DOCS)
    avgdl = sum(len(v) for v in toks.values()) / n_docs
    df_ = Counter()
    for ts in toks.values():
        df_.update(set(ts))
    idf = {
        t: math.log((n_docs - d + 0.5) / (d + 0.5) + 1.0)
        for t, d in df_.items() if d >= 2
    }

    cases = [
        ([["spark", "join"]], ["window"], ["stream"], []),
        ([["spark", "join"]], [], ["fast"], ["slow"]),
        ([["spark", "join"], ["window", "spark"]], [], ["fast"], []),
    ]
    for phrases, must, should, must_not in cases:
        expected = {}
        for d, ts in toks.items():
            if not all(has_phrase(ts, p) for p in phrases):
                continue
            tf = Counter(ts)
            if not all(t in tf for t in must if t in idf):
                continue
            if must and not all(t in tf for t in must):
                continue
            if any(t in tf for t in must_not):
                continue
            s = 0.0
            for t in sorted(set(must) | set(should)):
                if t in tf and t in idf:
                    s += idf[t] * (tf[t] * 2.2) / (
                        tf[t] + 1.2 * (0.25 + 0.75 * len(ts) / avgdl)
                    )
            if s:
                expected[d] = round(s, 4)
        got = _rows(bm25_boolean_phrase_topk(
            docs, phrases, must=must, should=should, must_not=must_not,
            k=10, min_df=2,
        ))
        assert {d: s for _, d, s in got} == expected, (phrases, must)
        assert [d for _, d, _ in got] == sorted(
            expected, key=lambda d: (-expected[d], d)
        )
