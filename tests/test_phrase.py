"""Exact-phrase search: offset-alignment operator vs a brute-force
Python oracle, plus parity between the ad-hoc and the
positional-postings serving paths."""

import re

import pytest

from greynirserver_spark.operators.phrase import (
    document_positional_tokens,
    phrase_match_counts,
    phrase_topk,
    phrase_topk_positional,
    positional_postings,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "quick brown quick brown quick"),          # overlapping repeats
    (2, "brown quick brown"),                      # phrase at pos 1
    (3, "a a a a"),                                # repeated-word phrase
    (4, "Quick   Brown!! fox"),                    # case + punct splits
    (5, "nothing to see here"),
    (6, ""),                                       # empty doc
]


def _brute(text: str, phrase: list[str]) -> int:
    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower())
            if 1 <= len(t) <= 64]
    n = len(phrase)
    return sum(
        1 for i in range(len(toks) - n + 1) if toks[i:i + n] == phrase
    )


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.mark.parametrize(
    "phrase",
    [["quick", "brown"], ["quick", "brown", "quick"], ["a", "a"],
     ["the", "lazy", "dog"], ["missing", "phrase"]],
)
def test_phrase_counts_match_bruteforce(spark, docs_df, phrase):
    got = {
        r.doc_id: r.phrase_tf
        for r in phrase_match_counts(spark, docs_df, phrase).collect()
    }
    want = {d: _brute(t, phrase) for d, t in DOCS if _brute(t, phrase)}
    assert got == want


def test_positional_path_matches_adhoc(spark, docs_df):
    phrase = ["quick", "brown"]
    post = positional_postings(docs_df)
    a = sorted(map(tuple, phrase_topk(spark, docs_df, phrase, 10).collect()))
    b = sorted(map(tuple,
                   phrase_topk_positional(post, spark, phrase, 10).collect()))
    assert a == b and len(a) > 0


def test_positions_are_dense_and_filtered(spark, docs_df):
    rows = (
        document_positional_tokens(docs_df)
        .where("doc_id = 4")
        .orderBy("pos")
        .collect()
    )
    # "Quick   Brown!! fox" -> [quick, brown, fox] at dense positions
    assert [(r.pos, r.term) for r in rows] == [
        (0, "quick"), (1, "brown"), (2, "fox")
    ]


def test_topk_ordering_deterministic(spark, docs_df):
    rows = phrase_topk(spark, docs_df, ["quick", "brown"], 10).collect()
    tfs = [r.phrase_tf for r in rows]
    assert tfs == sorted(tfs, reverse=True)
    # doc 1 has 2 occurrences, docs 0/2/4 one each
    assert rows[0].doc_id == 1 and rows[0].phrase_tf == 2


def test_phrase_plan_is_broadcast_and_single_agg_shuffle(spark, docs_df):
    plan = phrase_match_counts(
        spark, docs_df, ["quick", "brown"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_router_phrase_query(spark, tmp_path):
    """Quoted queries dispatch to PhraseSearch; the positional-postings
    serving path agrees with the ad-hoc path over the same store."""
    from greynirserver_spark.corpus import generate_pages
    from greynirserver_spark.plans.lineage import build_index_checkpointed
    from greynirserver_spark.query.router import Router

    pages = generate_pages(spark, 300)
    store = build_index_checkpointed(
        spark, pages, str(tmp_path / "store"), n_shards=4,
        with_positions=True,
    )
    assert store.has("positions")
    router = Router(spark, store)

    # pick a bigram that actually occurs in the stored text
    row = (
        store.load(spark, "doc_map")
        .select("doc_id", "text").first()
    )
    toks = [t for t in re.split(r"[\W_]+", row.text.lower())
            if 1 <= len(t) <= 64]
    phrase = f'"{toks[0]} {toks[1]}"'

    ans = router.execute(phrase, k=10)
    assert ans.qtype == "PhraseSearch"
    rows = ans.df.collect()
    assert len(rows) > 0

    # serving path == ad-hoc path
    adhoc = phrase_topk(
        spark,
        store.load(spark, "doc_map").select("doc_id", "text"),
        toks[:2], 10,
    )
    a = sorted((r.doc_id, r.phrase_tf) for r in adhoc.collect())
    b = sorted((r.doc_id, r.phrase_tf) for r in rows)
    assert a == b


def test_phrase_property_random_texts(spark):
    """Property: offset-alignment phrase counts equal the brute-force
    sliding-window count on randomized small texts (fixed seed corpus;
    hypothesis-style coverage without a Spark job per example)."""
    import random

    rng = random.Random(1234)
    vocab = ["a", "b", "c", "ab", "x1"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30))))
        for i in range(40)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for n in (1, 2, 3):
        phrase = [rng.choice(vocab) for _ in range(n)]
        got = {
            r.doc_id: r.phrase_tf
            for r in phrase_match_counts(spark, df, phrase).collect()
        }
        want = {
            d: _brute(t, phrase) for d, t in docs if _brute(t, phrase)
        }
        assert got == want, (phrase, got, want)


def test_kwic_snippets(spark, docs_df):
    from greynirserver_spark.operators.phrase import kwic_snippets

    rows = {r.doc_id: (r.pos, r.snippet)
            for r in kwic_snippets(docs_df, "quick", window=2, k=10).collect()}
    # doc 0: first 'quick' at pos 1, window 2 -> 5 tokens from pos 0
    assert rows[0] == (1, "the quick brown fox jumps")
    # doc 2: 'quick' at pos 1 of a 3-token doc -> clipped tail
    assert rows[2] == (1, "brown quick brown")
    # doc 4: case-folded hit
    assert rows[4] == (0, "quick brown fox")
    assert 5 not in rows and 6 not in rows
