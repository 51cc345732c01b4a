"""Property tests for the segment codec and block-max metadata."""

import sys
from pathlib import Path

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from greynirserver_spark.operators.segments import (
    bm25_partial,
    decode_block,
    encode_block,
    varint_decode,
    varint_encode,
)


@given(
    st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500)
)
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(arr)), arr)


def test_varint_empty_and_boundaries():
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert varint_decode(b"").size == 0
    # 7-bit boundaries
    vals = np.array([0, 1, 127, 128, 16383, 16384, 2**35, 2**62],
                    dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(vals)), vals)
    # single-byte values use exactly one byte
    assert len(varint_encode(np.array([0, 127], dtype=np.uint64))) == 2


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**12),
            st.integers(min_value=1, max_value=1000),
            st.integers(min_value=1, max_value=5000),
        ),
        min_size=1,
        max_size=300,
        unique_by=lambda t: t[0],
    )
)
@settings(max_examples=100, deadline=None)
def test_block_roundtrip(postings):
    postings.sort()
    doc = np.array([p[0] for p in postings], dtype=np.int64)
    tf = np.array([p[1] for p in postings], dtype=np.int64)
    dl = np.array([p[2] for p in postings], dtype=np.int64)
    db, tb, lb = encode_block(doc, tf, dl)
    d2, t2, l2 = decode_block(db, tb, lb)
    assert np.array_equal(d2, doc)
    assert np.array_equal(t2, tf)
    assert np.array_equal(l2, dl)


def test_block_max_is_upper_bound():
    rng = np.random.default_rng(7)
    tf = rng.integers(1, 50, 200)
    dl = rng.integers(50, 500, 200)
    parts = bm25_partial(tf, dl, idf=1.7, avgdl=180.0)
    assert parts.max() >= parts[0]
    assert (parts <= parts.max()).all()
    assert (parts > 0).all()


def test_compression_ratio_dense_postings():
    # Dense docID runs (head terms) should compress far below 8 B/doc
    doc = np.arange(0, 100000, 3, dtype=np.int64)
    tf = np.ones_like(doc)
    dl = np.full_like(doc, 200)
    db, tb, lb = encode_block(doc, tf, dl)
    bytes_per_posting = (len(db) + len(tb) + len(lb)) / len(doc)
    assert bytes_per_posting < 5, bytes_per_posting


def test_shard_bounds_head_term_group_size():
    """The skew guarantee: even a term present in EVERY doc produces
    per-(shard, term) groups no larger than the shard's doc count."""
    import pandas as pd

    n_docs, n_shards = 10_000, 16
    shard_size = -(-n_docs // n_shards)
    # head term in every doc
    doc_ids = np.arange(n_docs)
    shards = doc_ids // shard_size
    sizes = pd.Series(shards).value_counts()
    assert sizes.max() <= shard_size
    assert len(sizes) == n_shards
