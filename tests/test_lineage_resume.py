"""Kill/rerun resume tests (FIXTURES.md §6): a killed segment build must
resume without recomputing finished shards, and the resumed index must be
identical to an uninterrupted build."""

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from greynirserver_spark.corpus import generate_pages_pdf, indexable_stems_by_rank
from greynirserver_spark.operators.wand import wand_topk
from greynirserver_spark.plans.lineage import (
    IndexStore,
    build_index_checkpointed,
    read_lineage,
)
from greynirserver_spark.plans.pipeline import query_to_terms

N_DOCS = 200
N_SHARDS = 6


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(generate_pages_pdf(N_DOCS)).cache()


def _segment_rows(spark, store):
    return {
        tuple(r)
        for r in store.load_segments(spark)
        .select("term", "shard", "block_id", "first_doc", "last_doc",
                "n_docs", "block_max")
        .collect()
    }


def _file_mtimes(path):
    out = {}
    for dirpath, _, files in os.walk(path):
        for fn in files:
            p = os.path.join(dirpath, fn)
            out[p] = os.path.getmtime(p)
    return out


def test_kill_and_resume(spark, pages, tmp_path):
    root_a = str(tmp_path / "interrupted")
    root_b = str(tmp_path / "clean")

    # clean reference build
    store_b = build_index_checkpointed(
        spark, pages, root_b, n_shards=N_SHARDS, block_size=32
    )

    # interrupted build: crash after 2 shard commits
    with pytest.raises(RuntimeError, match="injected failure"):
        build_index_checkpointed(
            spark, pages, root_a, n_shards=N_SHARDS, block_size=32,
            fail_after_segment_commits=2,
        )
    lin = read_lineage(root_a)
    seg_done = lin[(lin.stage == "segments") & (lin.status == "done")]
    assert len(seg_done) == 2
    # earlier stages committed exactly once
    for st in ("doc_map", "postings", "stats"):
        assert (lin.stage == st).sum() == 1

    committed_files = _file_mtimes(os.path.join(root_a, "segments"))
    assert committed_files  # the two committed shards are on disk

    # resume: must not rewrite committed shard files
    store_a = build_index_checkpointed(
        spark, pages, root_a, n_shards=N_SHARDS, block_size=32
    )
    lin2 = read_lineage(root_a)
    assert len(lin2[(lin2.stage == "segments") & (lin2.status == "done")]) == N_SHARDS
    for st in ("doc_map", "postings", "stats"):
        assert (lin2.stage == st).sum() == 1  # not recomputed
    after = _file_mtimes(os.path.join(root_a, "segments"))
    for p, mt in committed_files.items():
        assert after[p] == mt, f"finished shard file recomputed: {p}"

    # resumed index == uninterrupted index (content identity)
    assert _segment_rows(spark, store_a) == _segment_rows(spark, store_b)


def test_resume_is_noop_when_complete(spark, pages, tmp_path):
    root = str(tmp_path / "complete")
    build_index_checkpointed(spark, pages, root, n_shards=4, block_size=32)
    lin1 = read_lineage(root)
    build_index_checkpointed(spark, pages, root, n_shards=4, block_size=32)
    lin2 = read_lineage(root)
    assert len(lin1) == len(lin2)  # second run committed nothing


def test_query_over_checkpointed_store(spark, pages, tmp_path):
    root = str(tmp_path / "queryable")
    store = build_index_checkpointed(spark, pages, root, n_shards=4,
                                     block_size=32)
    corpus = store.load(spark, "corpus")
    terms = query_to_terms(" ".join(indexable_stems_by_rank(2)))
    res = wand_topk(store.load_segments(spark), terms, corpus, 10).collect()
    assert len(res) == 10
    assert [r.rank for r in res] == list(range(1, 11))
