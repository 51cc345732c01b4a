"""Property-based adversarial tests for the pure per-shard scorers:
shard_boolean_pandas and shard_topk_pandas vs a brute-force python
scorer, and ordered_proximity_counts_pandas vs a brute-force chain
walk — over randomized posting lists encoded through the REAL varint
block codec. No Spark session involved: these functions are the
per-task kernels, so hammering them directly covers the distributed
operators' arithmetic for every shard shape hypothesis can invent.
"""

import math
import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from hypothesis import given, settings, strategies as st

from greynirserver_spark.operators.segments import (
    B,
    K1,
    bm25_partial,
    varint_encode,
)
from greynirserver_spark.operators.wand import (
    shard_boolean_pandas,
    shard_topk_pandas,
)


def _encode_term_blocks(term, postings, block_size, idf, avgdl0, shard=0):
    """Block rows for one term: postings = sorted [(doc, tf, dl)].
    Delta coding restarts per block with the first value absolute
    (matches _TermBlocks.decode's corr-subtraction)."""
    rows = []
    for i in range(0, len(postings), block_size):
        chunk = postings[i:i + block_size]
        docs = np.array([d for d, _, _ in chunk], dtype=np.uint64)
        tfs = np.array([t for _, t, _ in chunk], dtype=np.uint64)
        dls = np.array([l for _, _, l in chunk], dtype=np.uint64)
        deltas = np.concatenate(([docs[0]], np.diff(docs)))
        bmax = float(
            bm25_partial(tfs.astype(np.int64), dls.astype(np.float64),
                         idf, avgdl0).max()
        )
        rows.append(
            {
                "shard": shard,
                "term": term,
                "block_id": i // block_size,
                "first_doc": int(docs[0]),
                "last_doc": int(docs[-1]),
                "n_docs": len(chunk),
                "block_max": bmax,
                "idf": idf,
                "avgdl0": avgdl0,
                "docs": varint_encode(deltas),
                "tfs": varint_encode(tfs),
                "dls": varint_encode(dls),
            }
        )
    return rows


@st.composite
def _shard(draw):
    n_terms = draw(st.integers(2, 5))
    terms = [f"t{i}" for i in range(n_terms)]
    n_docs = draw(st.integers(3, 40))
    doclen = {d: draw(st.integers(1, 30)) for d in range(n_docs)}
    avgdl = sum(doclen.values()) / n_docs
    post = {}
    for t in terms:
        docs = sorted(
            draw(
                st.sets(st.integers(0, n_docs - 1), min_size=0,
                        max_size=n_docs)
            )
        )
        post[t] = [
            (d, draw(st.integers(1, 4)), doclen[d]) for d in docs
        ]
    block_size = draw(st.integers(1, 8))
    idf = {t: math.log(1.0 + (n_docs + 0.5) / (len(post[t]) + 0.5))
           for t in terms}
    rows = []
    for t in terms:
        if post[t]:
            rows.extend(
                _encode_term_blocks(t, post[t], block_size, idf[t], avgdl)
            )
    pdf = pd.DataFrame(rows)
    return terms, post, avgdl, pdf


@settings(max_examples=60, deadline=None)
@given(_shard(), st.data())
def test_boolean_shard_kernel_vs_brute(shard, data):
    terms, post, avgdl, pdf = shard
    if not len(pdf):
        return
    must = data.draw(st.lists(st.sampled_from(terms), max_size=2,
                              unique=True))
    should = data.draw(st.lists(st.sampled_from(terms), max_size=2,
                                unique=True))
    must_not = data.draw(st.lists(st.sampled_from(terms), max_size=1))
    k = data.draw(st.integers(1, 10))
    score_terms = sorted(set(must) | set(should))
    if not score_terms:
        return
    got = shard_boolean_pandas(pdf, sorted(set(must)), sorted(set(should)),
                               k, avgdl, must_not=sorted(set(must_not)))
    # brute force with the real per-term idf (from the blocks)
    idf = {t: float(pdf[pdf["term"] == t]["idf"].iloc[0])
           for t in set(pdf["term"])}
    acc = {}
    for t in score_terms:
        for d, tf, dl in post.get(t, []):
            if t in idf:
                acc[d] = acc.get(d, 0.0) + float(
                    bm25_partial(np.array([tf]), np.array([float(dl)]),
                                 idf[t], avgdl)[0]
                )
    cand = set(acc)
    for t in must:
        cand &= {d for d, _, _ in post.get(t, [])}
    for t in must_not:
        cand -= {d for d, _, _ in post.get(t, [])}
    expect = sorted(((d, acc[d]) for d in cand),
                    key=lambda x: (-x[1], x[0]))[:k]
    got_pairs = list(zip(got["doc_id"].astype(int),
                         got["score"].astype(float)))
    assert len(got_pairs) == len(expect)
    for (gd, gs), (ed, es) in zip(got_pairs, expect):
        assert gd == ed and abs(gs - es) < 1e-9


@settings(max_examples=40, deadline=None)
@given(_shard(), st.data())
def test_wand_shard_kernel_vs_brute(shard, data):
    terms, post, avgdl, pdf = shard
    if not len(pdf):
        return
    q = data.draw(st.lists(st.sampled_from(terms), min_size=1,
                           max_size=3, unique=True))
    k = data.draw(st.integers(1, 10))
    sub = pdf[pdf["term"].isin(q)]
    if not len(sub):
        return
    got = shard_topk_pandas(sub.reset_index(drop=True), k, avgdl)
    idf = {t: float(pdf[pdf["term"] == t]["idf"].iloc[0])
           for t in set(pdf["term"])}
    acc = {}
    for t in sorted(set(q)):
        for d, tf, dl in post.get(t, []):
            if t in idf:
                acc[d] = acc.get(d, 0.0) + float(
                    bm25_partial(np.array([tf]), np.array([float(dl)]),
                                 idf[t], avgdl)[0]
                )
    expect = sorted(acc.items(), key=lambda x: (-x[1], x[0]))[:k]
    got_pairs = list(zip(got["doc_id"].astype(int),
                         got["score"].astype(float)))
    assert len(got_pairs) == len(expect)
    for (gd, gs), (ed, es) in zip(got_pairs, expect):
        assert gd == ed and abs(gs - es) < 1e-9


# ---- ordered proximity kernel ---------------------------------------


def _encode_pos_blocks(term, rows, block_size):
    """Positional block rows for one term, pure python, matching the
    real codec (decode_positional_block): doc deltas reset per block
    with the first value absolute; position deltas reset per doc."""
    out = []
    for i in range(0, len(rows), block_size):
        chunk = rows[i:i + block_size]
        docs = np.array([d for d, _ in chunk], dtype=np.int64)
        deltas = np.concatenate(([docs[0]], np.diff(docs)))
        lens = np.array([len(p) for _, p in chunk], dtype=np.int64)
        pdeltas = []
        for _, p in chunk:
            pa = np.asarray(sorted(p), dtype=np.int64)
            if len(pa):
                pdeltas.append(np.concatenate(([pa[0]], np.diff(pa))))
        flat = (np.concatenate(pdeltas) if pdeltas
                else np.empty(0, dtype=np.int64))
        out.append(
            {
                "term": term,
                "shard": 0,
                "block_id": i // block_size,
                "n_docs": len(chunk),
                "first_doc": int(docs[0]),
                "last_doc": int(docs[-1]),
                "docs": varint_encode(deltas.astype(np.uint64)),
                "poslens": varint_encode(lens.astype(np.uint64)),
                "positions": varint_encode(flat.astype(np.uint64)),
            }
        )
    return out


def _brute_ordered(tokens_by_doc, seq, window):
    out = {}
    for d, toks in tokens_by_doc.items():
        n = 0
        for p1, tk in enumerate(toks):
            if tk != seq[0]:
                continue
            cur, ok = p1, True
            for t in seq[1:]:
                nxt = next(
                    (i for i in range(cur + 1, len(toks))
                     if toks[i] == t),
                    None,
                )
                if nxt is None:
                    ok = False
                    break
                cur = nxt
            if ok and cur - p1 <= window - 1:
                n += 1
        if n:
            out[d] = n
    return out


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_ordered_proximity_kernel_vs_brute(data):
    from greynirserver_spark.operators.posindex import (
        ordered_proximity_counts_pandas,
    )

    vocab = ["a", "b", "c"]
    n_docs = data.draw(st.integers(1, 8))
    tokens_by_doc = {
        d: data.draw(st.lists(st.sampled_from(vocab), min_size=1,
                              max_size=25))
        for d in range(n_docs)
    }
    seq = data.draw(st.lists(st.sampled_from(vocab), min_size=1,
                             max_size=3))
    window = data.draw(st.integers(len(seq), 10))
    rows = []
    for t in vocab:
        trows = [
            (d, [i for i, x in enumerate(toks) if x == t])
            for d, toks in sorted(tokens_by_doc.items())
            if t in toks
        ]
        if trows:
            rows.extend(_encode_pos_blocks(t, trows, block_size=3))
    blocks = pd.DataFrame(rows)
    if not len(blocks):
        return
    got = ordered_proximity_counts_pandas(blocks, seq, window)
    got_d = dict(zip(got["doc_id"].astype(int),
                     got["oprox_tf"].astype(int)))
    assert got_d == _brute_ordered(tokens_by_doc, seq, window)


def _brute_phrase(tokens_by_doc, words):
    out = {}
    n = len(words)
    for d, toks in tokens_by_doc.items():
        c = sum(
            1
            for i in range(len(toks) - n + 1)
            if toks[i:i + n] == list(words)
        )
        if c:
            out[d] = c
    return out


def _brute_proximity(tokens_by_doc, terms, window):
    out = {}
    need = set(terms)
    for d, toks in tokens_by_doc.items():
        c = 0
        for p, tk in enumerate(toks):
            if tk not in need:
                continue
            if need <= set(toks[p:p + window]):
                c += 1
        if c:
            out[d] = c
    return out


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_phrase_kernel_vs_brute(data):
    from greynirserver_spark.operators.posindex import phrase_counts_pandas

    vocab = ["a", "b", "c"]
    n_docs = data.draw(st.integers(1, 8))
    tokens_by_doc = {
        d: data.draw(st.lists(st.sampled_from(vocab), min_size=1,
                              max_size=25))
        for d in range(n_docs)
    }
    words = data.draw(st.lists(st.sampled_from(vocab), min_size=1,
                               max_size=3))
    rows = []
    for t in vocab:
        trows = [
            (d, [i for i, x in enumerate(toks) if x == t])
            for d, toks in sorted(tokens_by_doc.items())
            if t in toks
        ]
        if trows:
            rows.extend(_encode_pos_blocks(t, trows, block_size=3))
    blocks = pd.DataFrame(rows)
    if not len(blocks):
        return
    got = phrase_counts_pandas(blocks, words)
    got_d = dict(zip(got["doc_id"].astype(int),
                     got["phrase_tf"].astype(int)))
    assert got_d == _brute_phrase(tokens_by_doc, words)


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_proximity_kernel_vs_brute(data):
    from greynirserver_spark.operators.posindex import (
        proximity_counts_pandas,
    )

    vocab = ["a", "b", "c"]
    n_docs = data.draw(st.integers(1, 8))
    tokens_by_doc = {
        d: data.draw(st.lists(st.sampled_from(vocab), min_size=1,
                              max_size=25))
        for d in range(n_docs)
    }
    terms = data.draw(st.lists(st.sampled_from(vocab), min_size=1,
                               max_size=3, unique=True))
    window = data.draw(st.integers(max(len(terms), 1), 10))
    rows = []
    for t in vocab:
        trows = [
            (d, [i for i, x in enumerate(toks) if x == t])
            for d, toks in sorted(tokens_by_doc.items())
            if t in toks
        ]
        if trows:
            rows.extend(_encode_pos_blocks(t, trows, block_size=3))
    blocks = pd.DataFrame(rows)
    if not len(blocks):
        return
    got = proximity_counts_pandas(blocks, terms, window)
    got_d = dict(zip(got["doc_id"].astype(int),
                     got["prox_tf"].astype(int)))
    assert got_d == _brute_proximity(tokens_by_doc, terms, window)
