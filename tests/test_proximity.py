"""Proximity (NEAR/window) search: operator semantics vs a brute
force, corpus-side == positional-postings-side, plan audit, and the
Router's ``"..." ~N`` dispatch."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from greynirserver_spark.corpus import generate_pages_pdf
from greynirserver_spark.operators.phrase import (
    positional_postings,
    proximity_match_counts,
    proximity_topk,
    proximity_topk_positional,
)
from greynirserver_spark.plans.lineage import build_index_checkpointed
from greynirserver_spark.query.router import Router


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _brute(text, terms, w):
    toks = [t for t in text.lower().split() if t]
    uniq = set(t.lower() for t in terms)
    return sum(
        1 for p in range(len(toks))
        if toks[p] in uniq and uniq <= set(toks[p:p + w])
    )


FIXTURE = [
    (1, "a x b y c z a b c"),
    (2, "a b c a b c"),
    (3, "a x x x x x b x x c"),   # spread wider than the window
    (4, "b c a"),
    (5, "a a a b b b"),           # no c at all
    (6, "c b a c b a c"),         # order must not matter
]


def test_proximity_semantics_vs_brute_force(spark):
    docs = _docs(spark, FIXTURE)
    got = {
        r["doc_id"]: r["prox_tf"]
        for r in proximity_match_counts(
            spark, docs, ["a", "b", "c"], window=6).collect()
    }
    for doc_id, text in FIXTURE:
        expect = _brute(text, ["a", "b", "c"], 6)
        assert got.get(doc_id, 0) == expect, (doc_id, text)
    # duplicate query words collapse to distinct terms
    dup = {
        r["doc_id"]: r["prox_tf"]
        for r in proximity_match_counts(
            spark, docs, ["a", "b", "c", "a"], window=6).collect()
    }
    assert dup == got


def test_proximity_positional_agrees_and_prunes(spark):
    docs = _docs(spark, FIXTURE)
    pp = positional_postings(docs)
    a = proximity_topk(spark, docs, ["a", "c"], window=4,
                       k=10).collect()
    b = proximity_topk_positional(pp, spark, ["a", "c"], window=4,
                                  k=10).collect()
    assert [(r["doc_id"], r["prox_tf"]) for r in a] == \
        [(r["doc_id"], r["prox_tf"]) for r in b]
    # the term filter must reach the scan side of the postings plan
    plan = proximity_topk_positional(
        pp, spark, ["a", "c"], window=4, k=10
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "CartesianProduct" not in plan


def test_window_edge_cases(spark):
    docs = _docs(spark, [(1, "a b"), (2, "a x b"), (3, "b a")])
    # window 2: only strictly adjacent pairs (either order)
    got = {
        r["doc_id"]: r["prox_tf"]
        for r in proximity_match_counts(
            spark, docs, ["a", "b"], window=2).collect()
    }
    assert got == {1: 1, 3: 1}
    # a single-term "proximity" degenerates to term occurrences
    one = {
        r["doc_id"]: r["prox_tf"]
        for r in proximity_match_counts(
            spark, docs, ["a"], window=1).collect()
    }
    assert one == {1: 1, 2: 1, 3: 1}
    with pytest.raises(ValueError):
        proximity_match_counts(spark, docs, [], window=3)


def test_router_near_dispatch(spark, tmp_path):
    pages = spark.createDataFrame(generate_pages_pdf(80))
    store = build_index_checkpointed(
        spark, pages, str(tmp_path / "near"), n_shards=2,
        block_size=32
    )
    r = Router(spark, store)
    # 'vera' and 'spevætt' co-occur within 6 tokens in most synthetic
    # pages (measured over generate_pages_pdf output)
    a = r.execute('"vera spevætt" ~6')
    assert a.qtype == "ProximitySearch"
    rows = a.df.collect()
    assert 0 < len(rows) <= 10
    assert rows[0]["prox_tf"] >= rows[-1]["prox_tf"]
    assert rows[0]["url"].startswith("https://")
    # exact phrase still routes separately
    b = r.execute('"vera spevætt"')
    assert b.qtype == "PhraseSearch"
    # NEAR is at least as permissive as the exact phrase
    phrase_docs = {x["doc_id"] for x in b.df.collect()}
    near_docs = {x["doc_id"] for x in rows}
    assert phrase_docs <= near_docs or len(near_docs) == 10

def test_proximity_segments_agrees_with_corpus_side(spark):
    """Compressed-block NEAR == raw corpus NEAR, through both the
    applyInPandas path and the forced window-shuffle fallback."""
    from greynirserver_spark.operators.posindex import (
        build_positional_segments,
        proximity_topk_segments,
    )

    docs = _docs(spark, FIXTURE)
    segs = build_positional_segments(
        positional_postings(docs), n_shards=4, block_size=4
    )
    want = [
        (r["doc_id"], r["prox_tf"])
        for r in proximity_topk(
            spark, docs, ["a", "b", "c"], window=6, k=10
        ).collect()
    ]
    got = [
        (r["doc_id"], r["prox_tf"])
        for r in proximity_topk_segments(
            segs, spark, ["a", "b", "c"], window=6, k=10
        ).collect()
    ]
    assert got == want
    # force the bounded-memory fallback (guard threshold of 1 block)
    low = [
        (r["doc_id"], r["prox_tf"])
        for r in proximity_topk_segments(
            segs, spark, ["a", "b", "c"], window=6, k=10,
            max_blocks_per_shard=1,
        ).collect()
    ]
    assert low == want


def test_searcher_near_serves_from_store(spark, tmp_path):
    from greynirserver_spark.query.searcher import Searcher
    from greynirserver_spark.operators.phrase import proximity_topk

    pages = spark.createDataFrame(generate_pages_pdf(120))
    store = build_index_checkpointed(
        spark, pages, str(tmp_path / "near_store"), n_shards=2,
        block_size=32, with_positions=True,
    )
    s = Searcher(spark, store)
    got = s.near(["vera", "spevætt"], window=6, k=10)
    assert got and all(
        got[i][1] >= got[i + 1][1] for i in range(len(got) - 1)
    )
    # parity with the corpus-side operator over the same doc_map text
    dm = store.load(spark, "doc_map").select("doc_id", "text")
    want = [
        (r["doc_id"], r["prox_tf"])
        for r in proximity_topk(
            spark, dm, ["vera", "spevætt"], window=6, k=10
        ).collect()
    ]
    assert got == want
    # distributed path (fetch cap forced to 0 blocks) agrees too
    s_low = Searcher(spark, store, max_fetch_blocks=0)
    assert s_low.near(["vera", "spevætt"], window=6, k=10) == want
    # cache hit returns the same list
    assert s.near(["vera", "spevætt"], window=6, k=10) == got


def _brute_ordered(text, terms, w):
    toks = text.split()
    n = 0
    for p1, tk in enumerate(toks):
        if tk != terms[0]:
            continue
        cur, ok = p1, True
        for t in terms[1:]:
            nxt = next(
                (i for i in range(cur + 1, len(toks)) if toks[i] == t),
                None,
            )
            if nxt is None:
                ok = False
                break
            cur = nxt
        if ok and cur - p1 <= w - 1:
            n += 1
    return n


def test_ordered_proximity_vs_brute_force(spark):
    from greynirserver_spark.operators.phrase import (
        ordered_proximity_topk,
        ordered_proximity_topk_positional,
    )

    fix = FIXTURE + [
        (7, "a a b c"),        # duplicate start position
        (8, "a b a b c"),      # chain must step past reused terms
        (9, "a x x x x x b c"),  # greedy chain exceeds the window
    ]
    docs = _docs(spark, fix)
    for terms, w in ([["a", "b", "c"], 6], [["c", "a"], 4],
                     [["a", "b", "a"], 5]):
        got = {
            r["doc_id"]: r["oprox_tf"]
            for r in ordered_proximity_topk(
                spark, docs, terms, window=w, k=20
            ).collect()
        }
        want = {
            d: _brute_ordered(t, terms, w) for d, t in fix
        }
        want = {d: v for d, v in want.items() if v > 0}
        assert got == want, (terms, w)
        pos = {
            r["doc_id"]: r["oprox_tf"]
            for r in ordered_proximity_topk_positional(
                positional_postings(docs), spark, terms, window=w, k=20
            ).collect()
        }
        assert pos == want, (terms, w)


def test_ordered_is_stricter_than_unordered(spark):
    """Every ordered cover is an unordered cover; doc 6 ('c b a ...')
    has unordered covers for [a, b, c] but order matters here."""
    from greynirserver_spark.operators.phrase import (
        ordered_proximity_topk,
    )

    docs = _docs(spark, FIXTURE)
    unord = {
        r["doc_id"]: r["prox_tf"]
        for r in proximity_topk(
            spark, docs, ["a", "b", "c"], window=6, k=20
        ).collect()
    }
    ordd = {
        r["doc_id"]: r["oprox_tf"]
        for r in ordered_proximity_topk(
            spark, docs, ["a", "b", "c"], window=6, k=20
        ).collect()
    }
    assert set(ordd) <= set(unord)
    # cover COUNTS are not comparable start-by-start (different start
    # definitions), but a doc with in-order text keeps its hits
    assert ordd.get(2, 0) >= 1   # "a b c a b c"
    assert 6 in unord            # "c b a c b a c" matches unordered


def test_ordered_segments_agrees_with_corpus_side(spark):
    """Compressed-block ORDERED NEAR == raw corpus ordered NEAR,
    through both the per-shard vectorized chain walk and the forced
    streamed-decode distributed fallback — including a duplicate-term
    chain."""
    from greynirserver_spark.operators.phrase import ordered_proximity_topk
    from greynirserver_spark.operators.posindex import (
        build_positional_segments,
        ordered_proximity_topk_segments,
    )

    docs = _docs(spark, FIXTURE)
    segs = build_positional_segments(
        positional_postings(docs), n_shards=4, block_size=4
    )
    for seq in (["a", "b", "c"], ["c", "b", "a"], ["a", "b", "a"]):
        want = [
            (r["doc_id"], r["oprox_tf"])
            for r in ordered_proximity_topk(
                spark, docs, seq, window=6, k=10
            ).collect()
        ]
        got = [
            (r["doc_id"], r["oprox_tf"])
            for r in ordered_proximity_topk_segments(
                segs, spark, seq, window=6, k=10
            ).collect()
        ]
        assert got == want, seq
        low = [
            (r["doc_id"], r["oprox_tf"])
            for r in ordered_proximity_topk_segments(
                segs, spark, seq, window=6, k=10,
                max_blocks_per_shard=1,
            ).collect()
        ]
        assert low == want, seq
        # brute-force anchor per doc
        counts = dict(want)
        for doc_id, text in FIXTURE:
            assert counts.get(doc_id, 0) == _brute_ordered(
                text, seq, 6
            ), (doc_id, seq)


def test_searcher_and_router_ordered_near(spark, tmp_path):
    from greynirserver_spark.operators.phrase import ordered_proximity_topk
    from greynirserver_spark.query.searcher import Searcher

    pages = spark.createDataFrame(generate_pages_pdf(120))
    store = build_index_checkpointed(
        spark, pages, str(tmp_path / "onear_store"), n_shards=2,
        block_size=32, with_positions=True,
    )
    s = Searcher(spark, store)
    words = ["vera", "spevætt"]
    got = s.ordered_near(words, window=6, k=10)
    dm = store.load(spark, "doc_map").select("doc_id", "text")
    want = [
        (r["doc_id"], r["oprox_tf"])
        for r in ordered_proximity_topk(
            spark, dm, words, window=6, k=10
        ).collect()
    ]
    assert got == want and got
    # ordered is a subset-count of unordered on the same terms
    un = dict(s.near(words, window=6, k=100))
    assert all(tf <= un.get(d, 0) for d, tf in got)
    # distributed path agrees
    s_low = Searcher(spark, store, max_fetch_blocks=0)
    assert s_low.ordered_near(words, window=6, k=10) == want
    # Router "..."~>N dispatch
    r = Router(spark, store)
    ans = r.execute(f'"{words[0]} {words[1]}" ~>6', k=10)
    assert ans.qtype == "OrderedProximitySearch"
    rows = [(x["doc_id"], x["oprox_tf"]) for x in ans.df.collect()]
    assert rows == want[: len(rows)] and rows
    # unordered syntax still routes to the plain NEAR qtype
    assert r.execute(f'"{words[0]} {words[1]}" ~6', k=5).qtype \
        == "ProximitySearch"
