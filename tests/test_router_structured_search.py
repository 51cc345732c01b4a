"""Lucene-style structured search syntax through the Router:
+word (MUST), -word (MUST_NOT), word* (trailing wildcard)."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from greynirserver_spark.corpus import generate_pages_pdf, indexable_stems_by_rank
from greynirserver_spark.plans.lineage import build_index_checkpointed
from greynirserver_spark.plans.pipeline import query_to_terms
from greynirserver_spark.query.router import Router, _STRUCT_Q_RE


@pytest.fixture(scope="module")
def router(spark, tmp_path_factory):
    pages = spark.createDataFrame(generate_pages_pdf(200))
    root = str(tmp_path_factory.mktemp("rstruct") / "store")
    store = build_index_checkpointed(spark, pages, root, n_shards=4,
                                     block_size=32)
    return Router(spark, store)


def _stems(n, start=0):
    return indexable_stems_by_rank(n, start_rank=start)


def test_boolean_dispatch_and_gates(router):
    a, b = _stems(2)
    c = _stems(1, start=150)[0]
    ans = router.execute(f"+{a} {b} -{c}", k=10)
    assert ans.qtype == "BooleanSearch"
    rows = ans.df.collect()
    assert rows and rows[0].rank == 1
    got = {r.doc_id for r in rows}
    # MUST: every hit also appears in a plain single-term search for a
    must_hits = {r.doc_id
                 for r in router.search(query_to_terms(a), k=20).collect()}
    assert got <= must_hits or len(must_hits) == 20
    # MUST_NOT: excluding one of the must terms empties the result
    empty = router.execute(f"+{a} -{a}", k=10)
    assert empty.qtype == "BooleanSearch"
    assert empty.df.count() == 0


def test_prefix_dispatch(router):
    stem = _stems(1)[0]
    pre = stem[:3]
    ans = router.execute(f"{pre}*", k=10)
    assert ans.qtype == "PrefixSearch"
    rows = ans.df.collect()
    assert rows and rows[0].rank == 1 and rows[0].url.startswith("https://")
    # the expansion is a superset query: a plain search on the full
    # stem can never beat the wildcard's recall
    plain = router.search(query_to_terms(stem), k=10).collect()
    assert len(rows) >= min(len(plain), 10) or len(rows) == 10


def test_wildcard_inside_boolean(router):
    a = _stems(1)[0]
    pre = _stems(1, start=60)[0][:3]
    ans = router.execute(f"+{a} {pre}*", k=10)
    assert ans.qtype == "BooleanSearch"
    rows = ans.df.collect()
    assert rows
    must_hits = {r.doc_id
                 for r in router.search(query_to_terms(a), k=20).collect()}
    assert {r.doc_id for r in rows} <= must_hits or len(must_hits) == 20


def test_plain_queries_do_not_trigger_struct(router):
    # arithmetic keeps its qtype ('5+3' has '+' mid-token, no space)
    ans = router.execute("hvað er 5+3")
    assert ans.qtype == "Arithmetic"
    # hyphenated prose: '-' not at token start with a word after it
    a, b = _stems(2, start=10)
    ans2 = router.execute(f"{a} {b}")
    assert ans2.qtype == "Search"
    # regex unit checks
    assert not _STRUCT_Q_RE.search("plain words here")
    assert not _STRUCT_Q_RE.search("5+3")
    assert _STRUCT_Q_RE.search("+spark join")
    assert _STRUCT_Q_RE.search("spark -slow")
    assert _STRUCT_Q_RE.search("hest* ")
    assert _STRUCT_Q_RE.search("hest*")


def test_struct_answers_are_cacheable(router):
    a = _stems(1)[0]
    q = f"+{a} {_stems(1, start=60)[0]}"
    first = router.execute(q, k=5).df.collect()
    import time
    t0 = time.monotonic()
    second = router.execute(q, k=5).df.collect()
    assert time.monotonic() - t0 < 0.5  # replayed from the TTL cache
    assert [tuple(r) for r in first] == [tuple(r) for r in second]


def test_boolean_phrase_dispatch_and_parity(spark, tmp_path_factory):
    """`"w1 w2" +must` routes to BooleanPhraseSearch; every hit carries
    the consecutive phrase AND the must term; the positional cogrouped
    path and the relational no-positions fallback agree url-for-url."""
    import re
    from collections import Counter

    from greynirserver_spark.tokenization import PY_TOKEN_SPLIT_RE

    pages = spark.createDataFrame(generate_pages_pdf(150))
    base = tmp_path_factory.mktemp("rbp")
    store_p = build_index_checkpointed(
        spark, pages, str(base / "p"), n_shards=4, block_size=32,
        with_positions=True,
    )
    store_np = build_index_checkpointed(
        spark, pages, str(base / "np"), n_shards=4, block_size=32,
    )
    texts = {
        r["doc_id"]: r["text"]
        for r in store_p.load(spark, "doc_map")
        .select("doc_id", "text").collect()
    }

    def toks(t):
        return [w for w in re.split(PY_TOKEN_SPLIT_RE, t.lower()) if w]

    big = Counter()
    for t in texts.values():
        tk = toks(t)
        big.update(zip(tk, tk[1:]))
    (w1, w2), cnt = big.most_common(1)[0]
    assert cnt >= 2
    # a must term from a phrase-carrying doc whose index key is also
    # GLOBALLY indexed (df >= min_df — the segment gate's vocabulary)
    indexed = {
        r["term"]
        for r in store_p.load(spark, "term_stats")
        .select("term").collect()
    }
    carrier = next(
        tk for tk in map(toks, texts.values())
        if any(a == w1 and b == w2 for a, b in zip(tk, tk[1:]))
    )
    must_word = next(
        w for w in carrier
        if query_to_terms(w) and query_to_terms(w)[0] in indexed
    )
    q = f'"{w1} {w2}" +{must_word}'

    r_p = Router(spark, store_p)
    ans = r_p.execute(q, k=10)
    assert ans.qtype == "BooleanPhraseSearch"
    rows = ans.df.collect()
    assert rows
    must_key = query_to_terms(must_word)[0]
    for row in rows:
        tk = toks(texts[row["doc_id"]])
        assert any(a == w1 and b == w2 for a, b in zip(tk, tk[1:])), \
            row["doc_id"]
    # relational fallback (no positional store) agrees
    r_np = Router(spark, store_np)
    ans2 = r_np.execute(q, k=10)
    assert ans2.qtype == "BooleanPhraseSearch"
    assert [(x["url"], round(x["score"], 6)) for x in rows] == [
        (x["url"], round(x["score"], 6)) for x in ans2.df.collect()
    ]
    # phrase present but must term excluded -> empty
    empty = r_p.execute(f'"{w1} {w2}" +{must_word} -{must_word}', k=10)
    assert empty.qtype == "BooleanPhraseSearch"
    assert empty.df.count() == 0


def test_synonym_dispatch_and_fold(router):
    """a|b query syntax: dispatches to SynonymSearch; singleton groups
    reproduce plain Search ranking; a degenerate parse falls back."""
    a, b, c = _stems(3)
    ans = router.execute(f"{a}|{b} {c}", k=10)
    assert ans.qtype == "SynonymSearch"
    rows = ans.df.collect()
    assert rows and rows[0].rank == 1
    assert {"rank", "doc_id", "url", "warc_ts", "score"} <= set(
        ans.df.columns
    )
    # every hit contains a member of some group (it scored)
    from pyspark.sql import functions as F

    members = query_to_terms(f"{a} {b} {c}")
    hit_ids = [r.doc_id for r in rows]
    with_member = {
        r.doc_id
        for r in router.postings.where(
            F.col("term").isin(members) & F.col("doc_id").isin(hit_ids)
        ).select("doc_id").distinct().collect()
    }
    assert set(hit_ids) <= with_member

    # all-singleton '|' query == plain search ranking (score parity)
    syn = router.execute(f"{a}|{a} {c}", k=10).df.collect()
    plain = router.search(query_to_terms(f"{a} {c}"), k=10).collect()
    assert [r.doc_id for r in syn] == [r.doc_id for r in plain]
    for r1, r2 in zip(syn, plain):
        assert r1.score == pytest.approx(r2.score, rel=1e-6)

    # term in two groups -> ValueError inside -> plain Search fallback
    fb = router.execute(f"{a}|{b} {a}", k=5)
    assert fb.qtype == "Search"
