"""Interactive Searcher path + segment compaction rank identity."""

import sys
import time
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from greynirserver_spark.corpus import generate_pages_pdf, indexable_stems_by_rank
from greynirserver_spark.operators.segments import compact_segments
from greynirserver_spark.operators.wand import wand_topk
from greynirserver_spark.plans.lineage import build_index_checkpointed
from greynirserver_spark.plans.pipeline import query_to_terms
from greynirserver_spark.query.searcher import Searcher


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    pages = spark.createDataFrame(generate_pages_pdf(250))
    root = str(tmp_path_factory.mktemp("srch") / "store")
    return build_index_checkpointed(spark, pages, root, n_shards=6,
                                    block_size=16)


def test_searcher_matches_wand(spark, store):
    searcher = Searcher(spark, store)
    segments = store.load_segments(spark)
    corpus = store.load(spark, "corpus")
    for stems in (indexable_stems_by_rank(2),
                  indexable_stems_by_rank(2, start_rank=120)):
        terms = query_to_terms(" ".join(stems))
        local = searcher.search(terms, 12)
        dist = [
            (r.doc_id, r.score)
            for r in wand_topk(segments, terms, corpus, 12).collect()
        ]
        assert local == dist


def test_searcher_latency_and_cache(spark, store):
    searcher = Searcher(spark, store)
    terms = query_to_terms(" ".join(indexable_stems_by_rank(2)))
    searcher.search(terms, 10)  # warm scan
    t0 = time.perf_counter()
    searcher.search(list(reversed(terms)), 10)  # cache-key normalized
    warm = time.perf_counter() - t0
    assert warm < 0.01  # LRU hit is instant
    t0 = time.perf_counter()
    searcher.search(query_to_terms(indexable_stems_by_rank(1, 300)[0]), 10)
    cold = time.perf_counter() - t0
    assert cold < 5.0  # pruned-scan single query


def test_searcher_empty(spark, store):
    searcher = Searcher(spark, store)
    assert searcher.search([], 10) == []
    assert searcher.search(["nope/hk"], 10) == []


def test_compaction_rank_identity_and_block_fill(spark, store):
    segments = store.load_segments(spark)
    corpus = store.load(spark, "corpus")
    compacted = compact_segments(segments, corpus, block_size=64).cache()

    # fewer, fuller blocks
    n_before = segments.count()
    n_after = compacted.count()
    assert n_after < n_before
    # every non-final block per (shard, term) holds exactly block_size docs
    from pyspark.sql.window import Window

    w = Window.partitionBy("shard", "term")
    bad = (
        compacted.withColumn("max_b", F.max("block_id").over(w))
        .where((F.col("block_id") < F.col("max_b")) & (F.col("n_docs") != 64))
        .count()
    )
    assert bad == 0

    # identical query results
    terms = query_to_terms(" ".join(indexable_stems_by_rank(3)))
    a = [(r.doc_id, r.score) for r in wand_topk(segments, terms, corpus, 15).collect()]
    b = [(r.doc_id, r.score) for r in wand_topk(compacted, terms, corpus, 15).collect()]
    assert a == b


def test_searcher_ttl_expiry(spark, store):
    searcher = Searcher(spark, store, cache_ttl_s=0.2)
    terms = query_to_terms(" ".join(indexable_stems_by_rank(2)))
    first = searcher.search(terms, 10)
    key = (tuple(sorted(set(terms))), 10)
    assert key in searcher._cache
    time.sleep(0.3)
    # expired entry is dropped and recomputed (same store -> same answer)
    again = searcher.search(terms, 10)
    assert again == first
    inserted, _ = searcher._cache[key]
    # the entry was re-inserted after expiry, not served stale
    assert time.monotonic() - inserted < 0.25


def test_searcher_snapshot_invalidation(spark, store, tmp_path):
    # interval 0: check the snapshot on every query (the default trusts
    # the version for 1s to keep dir-stats off the per-query path)
    searcher = Searcher(spark, store, version_check_interval_s=0.0)
    terms = query_to_terms(" ".join(indexable_stems_by_rank(2)))
    searcher.search(terms, 10)
    assert len(searcher._cache) == 1
    # simulate a new segment commit: touch a file under segments/
    import os

    probe = os.path.join(store.segments, "_new_snapshot_marker")
    with open(probe, "w") as f:
        f.write("x")
    os.utime(store.segments)
    try:
        searcher.search(terms, 10)
        # cache was cleared on snapshot change, then repopulated
        assert len(searcher._cache) == 1
        assert searcher._version > 0
    finally:
        os.remove(probe)


def test_searcher_fetch_cap_falls_back_to_distributed(spark, store):
    # cap of 1 block: every real query exceeds it -> wand_topk path
    searcher = Searcher(spark, store, max_fetch_blocks=1)
    terms = query_to_terms(" ".join(indexable_stems_by_rank(2)))
    capped = searcher.search(terms, 12)
    uncapped = Searcher(spark, store).search(terms, 12)
    assert capped == uncapped and len(capped) == 12
