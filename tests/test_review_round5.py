"""Regression tests for the round-5 code-review findings: two-store
shard alignment, all-duplicate append contract, pure-stopword phrase
fallback, +prefix*/-prefix* parsing, hybrid exclusion on both lists."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import pyspark.sql.functions as F


def test_boolean_phrase_segments_sparse_doc_ids(spark):
    """The two ad-hoc stores must share ONE shard_size: with sparse doc
    ids their defaults diverge (posting-doc COUNT vs max_id+1) and the
    shard-local cogroup phrase gate silently drops matches."""
    from greynirserver_spark.operators.textops import (
        bm25_boolean_phrase_topk,
    )

    # ids 0..19 dense, then a far outlier: count=21 but max_id+1=151
    rows = [(i, f"alpha beta w{i} gamma delta") for i in range(20)]
    rows.append((150, "alpha beta outlier phrase target gamma delta"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    out = bm25_boolean_phrase_topk(
        docs, [["phrase", "target"]], must=[], should=["gamma"],
        k=10, min_df=1, n_shards=8,
    ).collect()
    assert [r["doc_id"] for r in out] == [150]


def test_append_all_duplicates_returns_full_contract(spark, tmp_path):
    from greynirserver_spark.corpus import generate_pages
    from greynirserver_spark.plans.lineage import (
        append_pages,
        build_index_checkpointed,
    )

    pages = generate_pages(spark, 60)
    store = build_index_checkpointed(
        spark, pages, str(tmp_path / "s"), n_shards=2
    )
    res = append_pages(spark, store, pages.limit(10))
    assert res == {"new_docs": 0, "new_blocks": 0,
                   "backfill_blocks": 0, "rebuilt": False}


@pytest.fixture(scope="module")
def pos_router(spark, tmp_path_factory):
    from greynirserver_spark.corpus import generate_pages_pdf
    from greynirserver_spark.plans.lineage import build_index_checkpointed
    from greynirserver_spark.query.router import Router

    pages = spark.createDataFrame(generate_pages_pdf(300))
    root = str(tmp_path_factory.mktemp("rrev") / "store")
    store = build_index_checkpointed(
        spark, pages, root, n_shards=4, block_size=32,
        with_positions=True,
    )
    return Router(spark, store)


def _stopword_bigram(router):
    """An adjacent token pair from the stored text whose BOTH words are
    stoplisted (query_to_terms -> []), or None."""
    import re

    from greynirserver_spark.plans.pipeline import query_to_terms
    from greynirserver_spark.tokenization import NOINDEX_PAIRS

    stop = {w for w, _ in NOINDEX_PAIRS}
    texts = [r["text"] for r in
             router.doc_map.select("text").limit(300).collect()]
    for t in texts:
        toks = [x for x in re.split(r"[^\wáðéíóúýþæö]+", t.lower()) if x]
        for a, b in zip(toks, toks[1:]):
            if a in stop and b in stop \
                    and not query_to_terms(a) and not query_to_terms(b):
                return a, b
    return None


def test_pure_stopword_phrase_with_not_term_not_empty(pos_router):
    """`"<stopword stopword>" -term` must fall back to phrase-tf
    ranking, not an empty answer — the positional store indexes ALL
    terms."""
    from greynirserver_spark.corpus import indexable_stems_by_rank

    pair = _stopword_bigram(pos_router)
    if pair is None:
        pytest.skip("corpus sample has no adjacent stopword bigram")
    a, b = pair
    rare = indexable_stems_by_rank(1, start_rank=190)[0]
    ans = pos_router.execute(f'"{a} {b}" -{rare}', k=10)
    assert ans.qtype == "BooleanPhraseSearch"
    rows = ans.df.collect()
    assert rows, "servable stopword phrase answered empty"
    # every hit really contains the consecutive pair
    ids = [r["doc_id"] for r in rows]
    texts = {
        r["doc_id"]: r["text"].lower()
        for r in pos_router.doc_map
        .where(F.col("doc_id").isin(ids)).select("doc_id", "text")
        .collect()
    }
    import re
    for d in ids:
        toks = [x for x in re.split(r"[^\wáðéíóúýþæö]+", texts[d]) if x]
        assert any(x == a and y == b for x, y in zip(toks, toks[1:]))
    # scores are the phrase counts: descending, positive
    scores = [r["score"] for r in rows]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)


def test_must_prefix_wildcard_not_minted_as_exact_term(pos_router):
    """`+veð*`-style tokens: the old parser stripped the '*' inside
    query_to_terms and required the bare prefix as an exact term —
    usually unindexed, so the whole result emptied."""
    from greynirserver_spark.corpus import indexable_stems_by_rank
    from greynirserver_spark.plans.pipeline import query_to_terms

    stem = indexable_stems_by_rank(1)[0]
    pre = stem[:4]
    # precondition for the regression: the bare prefix is NOT itself an
    # indexed term of the store
    assert not query_to_terms(pre) or pre != stem
    other = indexable_stems_by_rank(1, start_rank=5)[0]
    ans = pos_router.execute(f"+{pre}* {other}", k=10)
    assert ans.qtype in ("BooleanSearch", "PrefixSearch")
    assert ans.df.count() > 0


def test_not_prefix_wildcard_excludes_expansion(pos_router):
    from greynirserver_spark.corpus import indexable_stems_by_rank
    from greynirserver_spark.plans.pipeline import query_to_terms

    a = indexable_stems_by_rank(1)[0]
    b = indexable_stems_by_rank(1, start_rank=5)[0]
    with_hits = {r["doc_id"]
                 for r in pos_router.search(query_to_terms(a), 20)
                 .collect()}
    ans = pos_router.execute(f"{b} -{a[:4]}*", k=20)
    assert ans.qtype == "BooleanSearch"
    got = {r["doc_id"] for r in ans.df.collect()}
    # docs matching the full stem are part of the prefix expansion
    assert not (got & with_hits)
