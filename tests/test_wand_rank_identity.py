"""Rank identity of the compressed-segment block-max WAND path vs the
exact DataFrame scorer (which is itself oracle-verified vs NumPy).
Also unit-tests the per-shard pruner against brute force on random data.
"""

import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from greynirserver_spark.corpus import generate_pages_pdf, indexable_stems_by_rank
from greynirserver_spark.operators.bm25 import bm25_topk_exact
from greynirserver_spark.operators.segments import (
    bm25_partial,
    build_segments,
    encode_block,
    read_segments,
    write_segments,
)
from greynirserver_spark.operators.wand import shard_topk_pandas, wand_topk
from greynirserver_spark.plans.pipeline import build_index, query_to_terms

N_DOCS = 300


# ---------------------------------------------------- pure-python unit

def _make_shard_pdf(rng, n_terms=4, n_docs=2000, avgdl=150.0, block=64):
    """Random postings -> segment-block pdf + exact score dict."""
    rows = []
    truth = {}
    for ti in range(n_terms):
        term = f"t{ti}"
        idf = float(rng.uniform(0.3, 3.0))
        size = min(int(rng.integers(50, 400)), n_docs)
        docs = np.sort(
            rng.choice(n_docs, size=size, replace=False)
        ).astype(np.int64)
        tf = rng.integers(1, 20, docs.size).astype(np.int64)
        dl = rng.integers(50, 400, docs.size).astype(np.int64)
        parts = bm25_partial(tf, dl, idf, avgdl)
        for d, p in zip(docs, parts):
            truth[int(d)] = truth.get(int(d), 0.0) + float(p)
        for b0 in range(0, docs.size, block):
            sl = slice(b0, b0 + block)
            d, t, l = docs[sl], tf[sl], dl[sl]
            db, tb, lb = encode_block(d, t, l)
            rows.append(
                dict(
                    term=term, shard=0, block_id=b0 // block, n_docs=len(d),
                    first_doc=int(d[0]), last_doc=int(d[-1]),
                    block_max=float(bm25_partial(t, l, idf, avgdl).max()),
                    idf=idf, docs=db, tfs=tb, dls=lb,
                )
            )
    return pd.DataFrame(rows), truth


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_shard_pruner_matches_bruteforce(seed):
    rng = np.random.default_rng(seed)
    pdf, truth = _make_shard_pdf(rng)
    k = 10
    expected = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    got = shard_topk_pandas(pdf, k=k, avgdl=150.0)
    assert list(got["doc_id"]) == [d for d, _ in expected]
    for s_got, (_, s_exp) in zip(got["score"], expected):
        assert s_got == pytest.approx(s_exp, rel=1e-12)


def test_shard_pruner_k_larger_than_corpus():
    rng = np.random.default_rng(9)
    pdf, truth = _make_shard_pdf(rng, n_terms=2, n_docs=100)
    got = shard_topk_pandas(pdf, k=10000, avgdl=150.0)
    assert len(got) == len(truth)


# ---------------------------------------------------- spark end-to-end

@pytest.fixture(scope="module")
def indexed(spark, tmp_path_factory):
    pages = spark.createDataFrame(generate_pages_pdf(N_DOCS))
    idx = build_index(spark, pages, min_df=3, num_partitions=7)
    for t in ("postings", "term_stats", "doc_stats", "corpus"):
        setattr(idx, t, getattr(idx, t).cache())
    seg_path = str(tmp_path_factory.mktemp("segments") / "seg")
    segs = build_segments(
        idx.postings, idx.term_stats, idx.doc_stats, idx.corpus,
        n_shards=8, block_size=32,
    )
    write_segments(segs, seg_path)
    return idx, read_segments(spark, seg_path)


def test_wand_vs_exact_rank_identity(spark, indexed):
    idx, segments = indexed
    head = indexable_stems_by_rank(3)
    mid = indexable_stems_by_rank(2, start_rank=150)
    queries = [
        [head[0]],
        head[:2],
        [head[0], mid[0]],
        mid,
        head[:3] + mid[:1],
    ]
    for stems in queries:
        terms = query_to_terms(" ".join(stems))
        exact = bm25_topk_exact(
            idx.postings, idx.term_stats, idx.doc_stats, idx.corpus, terms, 15
        ).toPandas()
        wand = wand_topk(segments, terms, idx.corpus, 15).toPandas()
        assert list(wand["doc_id"]) == list(exact["doc_id"]), stems
        assert list(wand["rank"]) == list(exact["rank"]), stems
        for a, b in zip(wand["score"], exact["score"]):
            assert a == pytest.approx(b, rel=1e-12), stems


def test_wand_empty_and_unknown_terms(spark, indexed):
    idx, segments = indexed
    assert wand_topk(segments, [], idx.corpus, 10).count() == 0
    assert wand_topk(segments, ["nóexistent/hk"], idx.corpus, 10).count() == 0


def test_segment_store_layout(spark, indexed):
    idx, segments = indexed
    pdf = segments.limit(50).toPandas()
    assert set(pdf.columns) == {
        "term", "shard", "block_id", "n_docs", "first_doc", "last_doc",
        "block_max", "idf", "avgdl0", "docs", "tfs", "dls",
    }
    # blocks are doc-sorted and bounded
    assert (pdf["first_doc"] <= pdf["last_doc"]).all()
    assert (pdf["n_docs"] <= 32).all()


def test_block_max_pruning_skips_blocks_on_skewed_scores():
    """On score-skewed data (real web text) the sweep must decode only
    the high-upper-bound region and stop at theta — exactness with
    skipping is the entire point of block-max metadata."""
    rng = np.random.default_rng(77)
    rows, truth = [], {}
    avgdl = 150.0
    # one term, 20k docs: a tiny hot region (huge tf) + a long flat tail
    n = 20000
    docs = np.arange(n, dtype=np.int64)
    tf = np.ones(n, dtype=np.int64)
    hot = rng.choice(n, size=20, replace=False)
    tf[hot] = 500
    dl = np.full(n, 150, dtype=np.int64)
    idf = 2.0
    parts = bm25_partial(tf, dl, idf, avgdl)
    for d, p in zip(docs, parts):
        truth[int(d)] = float(p)
    block = 128
    for b0 in range(0, n, block):
        sl = slice(b0, b0 + block)
        d, t, l = docs[sl], tf[sl], dl[sl]
        db, tb, lb = encode_block(d, t, l)
        rows.append(dict(
            term="t", shard=0, block_id=b0 // block, n_docs=len(d),
            first_doc=int(d[0]), last_doc=int(d[-1]),
            block_max=float(bm25_partial(t, l, idf, avgdl).max()),
            idf=idf, docs=db, tfs=tb, dls=lb,
        ))
    pdf = pd.DataFrame(rows)
    stats = {}
    got = shard_topk_pandas(pdf, k=10, avgdl=avgdl, stats_out=stats)
    expected = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(got["doc_id"]) == [d for d, _ in expected]
    # the flat tail (no hot doc) must be skipped wholesale — and not
    # just skipped from scoring: never DECODED (round-1 regressed to
    # eager decode of every matched block; this pins the lazy path)
    assert stats["blocks_decoded"] < 0.35 * stats["blocks_total"], stats
    assert stats["blocks_scored"] < 0.35 * stats["blocks_total"], stats
    assert stats["intervals_processed"] < 0.35 * stats["intervals_total"], stats
