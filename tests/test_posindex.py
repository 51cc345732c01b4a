"""Compressed positional segments: codec round-trip, rank identity with
the raw positional table, and compaction equivalence."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import pytest
from pyspark.sql import functions as F

from greynirserver_spark.operators.phrase import (
    phrase_topk_positional,
    positional_postings,
)
from greynirserver_spark.operators.posindex import (
    build_positional_segments,
    compact_positional_segments,
    decode_positional_block,
    phrase_topk_positional_segments,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")


@pytest.fixture(scope="module")
def pos(spark, docs):
    return positional_postings(docs).cache()


@pytest.fixture(scope="module")
def psegs(pos):
    return build_positional_segments(pos, n_shards=4, block_size=16).cache()


def _decode_all(rows):
    out = {}
    for r in rows:
        d, l, f = decode_positional_block(r.docs, r.poslens, r.positions)
        s = np.concatenate(([0], np.cumsum(l)))
        for i, doc in enumerate(d):
            out[(r.term, int(doc))] = list(f[s[i]: s[i + 1]])
    return out


def test_roundtrip_exact(pos, psegs):
    raw = {(r.term, r.doc_id): list(r.positions) for r in pos.collect()}
    assert _decode_all(psegs.collect()) == raw


def test_block_invariants(psegs):
    rows = psegs.collect()
    for r in rows:
        d, l, f = decode_positional_block(r.docs, r.poslens, r.positions)
        assert r.n_docs == len(d) <= 16
        assert r.first_doc == d[0] and r.last_doc == d[-1]
        assert (np.diff(d) > 0).all()  # strictly increasing doc ids
        assert len(f) == l.sum()


def test_phrase_rank_identity(spark, pos, psegs, docs):
    texts = [r.text.lower().split() for r in docs.limit(8).collect()]
    phrases = [t[2:4] for t in texts if len(t) > 6][:5]
    phrases.append(["og", "og"])  # repeated-word phrase
    phrases.append(["aldrei_i_korpus", "ekki"])  # no match
    for ph in phrases:
        a = [
            (r.doc_id, r.phrase_tf)
            for r in phrase_topk_positional(pos, spark, ph, 20).collect()
        ]
        b = [
            (r.doc_id, r.phrase_tf)
            for r in phrase_topk_positional_segments(
                psegs, spark, ph, 20
            ).collect()
        ]
        assert a == b, ph


def test_compaction_is_lossless_and_packs(spark, pos):
    # tiny blocks -> fragmented store; compaction must decode identically
    # with full blocks
    frag = build_positional_segments(pos, n_shards=2, block_size=4)
    packed = compact_positional_segments(frag, block_size=64)
    assert _decode_all(packed.collect()) == _decode_all(frag.collect())
    # fewer, fuller blocks
    assert packed.count() < frag.count()
    over = packed.where(F.col("n_docs") > 64).count()
    assert over == 0


def test_append_then_compact_roundtrip(spark, pos):
    # split the posting space in two, encode separately (as an append
    # would), union, compact: identical to one-shot encode over the whole
    lo = pos.where(F.col("doc_id") < 250)
    hi = pos.where(F.col("doc_id") >= 250)
    a = build_positional_segments(lo, n_shards=2, block_size=16,
                                  shard_size=300)
    b = build_positional_segments(hi, n_shards=2, block_size=16,
                                  shard_size=300)
    merged = compact_positional_segments(a.unionByName(b), block_size=16)
    whole = build_positional_segments(pos, n_shards=2, block_size=16,
                                      shard_size=300)
    assert _decode_all(merged.collect()) == _decode_all(whole.collect())


def test_searcher_phrase_matches_distributed(spark, tmp_path):
    """Searcher.phrase (in-process decode of matched compressed blocks)
    == the distributed applyInPandas plan, including under a fetch cap
    of 1 (forces the fallback)."""
    from greynirserver_spark.corpus import generate_pages
    from greynirserver_spark.plans.lineage import build_index_checkpointed
    from greynirserver_spark.query.searcher import Searcher

    pages = generate_pages(spark, 300)
    store = build_index_checkpointed(
        spark, pages, str(tmp_path / "sp"), n_shards=4,
        with_positions=True,
    )
    row = store.load(spark, "doc_map").select("text").first()
    toks = [t for t in row.text.lower().split() if t.isalpha()]
    words = toks[:2]

    searcher = Searcher(spark, store)
    got = searcher.phrase(words, 10)
    want = [
        (r.doc_id, r.phrase_tf)
        for r in phrase_topk_positional_segments(
            store.load(spark, "positions"), spark, words, 10
        ).collect()
    ]
    assert got == want and len(got) > 0

    capped = Searcher(spark, store, max_fetch_blocks=1).phrase(words, 10)
    assert capped == want

    # cached on repeat
    t_key = ("phrase", tuple(words), 10)
    assert t_key in searcher._cache
    assert searcher.phrase(words, 10) == got


def test_stream_append_to_store(spark, tmp_path):
    """Structured-Streaming store maintenance: two page-file batches
    streamed through append_pages == one batch append; replay is a
    no-op (checkpoint + url anti-join)."""
    from greynirserver_spark.corpus import generate_pages
    from greynirserver_spark.plans.lineage import build_index_checkpointed
    from greynirserver_spark.streaming.ingest import stream_append_to_store

    all_pages = generate_pages(spark, 450).cache()
    h = F.pmod(F.xxhash64("url"), F.lit(3))
    base = all_pages.where(h == 0)
    b1 = all_pages.where(h == 1)
    b2 = all_pages.where(h == 2)

    store = build_index_checkpointed(
        spark, base, str(tmp_path / "stream_store"), n_shards=4,
    )
    indir = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "ckpt")
    b1.write.mode("append").parquet(indir)
    b2.write.mode("append").parquet(indir)

    q = stream_append_to_store(spark, store, indir, ckpt)
    q.awaitTermination(300)

    n_is = all_pages.where(F.col("lang") == "is").count()
    dm = store.load(spark, "doc_map")
    assert dm.count() == n_is
    assert dm.select("doc_id").distinct().count() == n_is

    # replay: new query over the same checkpoint sees no new files
    q2 = stream_append_to_store(spark, store, indir, ckpt)
    q2.awaitTermination(300)
    assert store.load(spark, "doc_map").count() == n_is


def test_vote_shuffle_fallback_matches(spark, pos, psegs, docs):
    """The bounded-memory vote-shuffle plan (forced via
    max_blocks_per_shard=0) ranks identically to the per-shard
    applyInPandas plan, including a repeated-word phrase."""
    texts = [r.text.lower().split() for r in docs.limit(5).collect()]
    phrases = [t[1:3] for t in texts if len(t) > 5][:3]
    phrases.append(["og", "og"])
    for ph in phrases:
        a = [
            (r.doc_id, r.phrase_tf)
            for r in phrase_topk_positional_segments(
                psegs, spark, ph, 20
            ).collect()
        ]
        b = [
            (r.doc_id, r.phrase_tf)
            for r in phrase_topk_positional_segments(
                psegs, spark, ph, 20, max_blocks_per_shard=0
            ).collect()
        ]
        assert a == b, ph


def test_codec_property_roundtrip():
    """Property test (no Spark): random posting shapes round-trip the
    positional block codec exactly."""
    from hypothesis import given, settings, strategies as st

    from greynirserver_spark.operators.segments import (
        varint_decode,
        varint_encode,
    )

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=2**63 - 1),
                 min_size=0, max_size=200)
    )
    def roundtrip(vals):
        arr = np.array(vals, dtype=np.uint64)
        assert list(varint_decode(varint_encode(arr))) == vals

    roundtrip()


def test_positional_block_property_roundtrip():
    """Random (doc_ids, per-doc positions) encode+decode exactly via the
    same delta paths the builder uses."""
    import random

    from greynirserver_spark.operators.segments import (
        varint_encode_with_lengths,
    )

    rnd = random.Random(1234)
    for _ in range(50):
        n = rnd.randint(1, 60)
        docs = np.cumsum(
            np.array([rnd.randint(1, 1000) for _ in range(n)],
                     dtype=np.int64)
        )
        plists = [
            np.cumsum(
                np.array(
                    [rnd.randint(0, 50) + (1 if i else 0)
                     for i in range(rnd.randint(1, 30))],
                    dtype=np.int64,
                )
            )
            for _ in range(n)
        ]
        lens = np.array([len(p) for p in plists], dtype=np.int64)
        flat = np.concatenate(plists)
        # encode exactly as the builder does
        dd = docs.copy()
        dd[1:] -= docs[:-1]
        fd = flat.copy()
        fd[1:] -= flat[:-1]
        st_ = np.concatenate(([0], np.cumsum(lens)[:-1]))
        fd[st_] = flat[st_]
        db, _ = varint_encode_with_lengths(dd.astype(np.uint64))
        lb, _ = varint_encode_with_lengths(lens.astype(np.uint64))
        pb, _ = varint_encode_with_lengths(fd.astype(np.uint64))
        d2, l2, f2 = decode_positional_block(
            db.tobytes(), lb.tobytes(), pb.tobytes()
        )
        assert list(d2) == list(docs)
        assert list(l2) == list(lens)
        assert list(f2) == list(flat)
