"""Store merge: two independently built index stores fold into one
that ranks exactly like a from-scratch build over the union — the
Lucene segment-merge analog at store granularity (parallel partition
builds / offline backfills)."""

import datetime as dt
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import pytest
from pyspark.sql import functions as F

from greynirserver_spark.corpus import generate_pages, indexable_stems_by_rank
from greynirserver_spark.plans.lineage import (
    IndexStore,
    build_index_checkpointed,
    delete_urls,
    merge_stores,
)
from greynirserver_spark.plans.pipeline import query_to_terms
from greynirserver_spark.query.searcher import Searcher


def _ranked_urls(spark, store, terms, k=15):
    s = Searcher(spark, store, version_check_interval_s=0.0)
    hits = s.search(terms, k)
    dm = store.load(spark, "doc_map").select("doc_id", "url")
    urls = {int(r["doc_id"]): r["url"] for r in dm.where(
        F.col("doc_id").isin([d for d, _ in hits])).collect()}
    return [(urls[d], round(sc, 6)) for d, sc in hits]


def test_merge_matches_scratch_build(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("merge")
    pages = generate_pages(spark, 300).cache()
    split = F.pmod(F.xxhash64("url"), F.lit(2))
    pa = pages.where(split == 0)
    pb = pages.where(split == 1)
    # 20-url overlap with IDENTICAL content: collision resolution must
    # keep exactly one copy
    overlap_urls = [r["url"] for r in pa.select("url")
                    .orderBy("url").limit(20).collect()]
    pb_plus = pb.unionByName(pages.where(F.col("url").isin(overlap_urls)))

    a = build_index_checkpointed(
        spark, pa, str(base / "a"), n_shards=4, with_positions=True)
    b = build_index_checkpointed(
        spark, pb_plus, str(base / "b"), n_shards=4, with_positions=True)
    merged = merge_stores(spark, a, b, str(base / "m"))
    scratch = build_index_checkpointed(
        spark, pages, str(base / "scratch"), n_shards=4,
        with_positions=True)

    # one row per url, same corpus as the scratch build (which applies
    # the same lang gate)
    m_dm = merged.load(spark, "doc_map")
    n_scratch = scratch.load(spark, "doc_map").count()
    assert m_dm.count() == n_scratch
    assert m_dm.select("url").distinct().count() == n_scratch

    # rank/score identity by url for two query shapes
    terms = query_to_terms(" ".join(indexable_stems_by_rank(3)))
    assert _ranked_urls(spark, merged, terms) == \
        _ranked_urls(spark, scratch, terms)
    terms2 = query_to_terms(
        " ".join(indexable_stems_by_rank(2, start_rank=40)))
    assert _ranked_urls(spark, merged, terms2) == \
        _ranked_urls(spark, scratch, terms2)

    # phrase serving (positions regenerated from merged stored fields)
    sm = Searcher(spark, merged, version_check_interval_s=0.0)
    ss = Searcher(spark, scratch, version_check_interval_s=0.0)
    ph = [indexable_stems_by_rank(1)[0]]
    # full match set: doc_id tie-breaks differ between the stores, so a
    # small-k cut would legitimately pick different equal-tf docs
    pm, psc = sm.phrase(ph, 10**6), ss.phrase(ph, 10**6)
    urls_m = {r["doc_id"]: r["url"] for r in merged.load(spark, "doc_map")
              .where(F.col("doc_id").isin([d for d, _ in pm]))
              .collect()}
    urls_s = {r["doc_id"]: r["url"] for r in scratch.load(spark, "doc_map")
              .where(F.col("doc_id").isin([d for d, _ in psc]))
              .collect()}
    assert sorted((urls_m[d], tf) for d, tf in pm) == \
        sorted((urls_s[d], tf) for d, tf in psc)


def test_merge_collision_newest_wins_and_tombstones_drop(
    spark, tmp_path_factory
):
    base = tmp_path_factory.mktemp("mergec")

    def mk(rows):
        return spark.createDataFrame(
            rows, "url string, warc_ts timestamp, html binary, lang string"
        )

    t1, t2 = dt.datetime(2026, 1, 1), dt.datetime(2026, 2, 1)
    body = "<html><body>%s</body></html>"
    a_pages = mk([
        ("http://x.is/shared", t1, (body % "old old old").encode(), "is"),
        ("http://x.is/a-only", t1, (body % "alpha words here").encode(), "is"),
        ("http://x.is/deleted", t1, (body % "doomed text").encode(), "is"),
    ])
    b_pages = mk([
        ("http://x.is/shared", t2, (body % "fresh fresh fresh").encode(), "is"),
        ("http://x.is/b-only", t1, (body % "beta words there").encode(), "is"),
    ])
    a = build_index_checkpointed(spark, a_pages, str(base / "a"),
                                 n_shards=2, min_df=1)
    b = build_index_checkpointed(spark, b_pages, str(base / "b"),
                                 n_shards=2, min_df=1)
    assert delete_urls(spark, a, ["http://x.is/deleted"]) == 1

    merged = merge_stores(spark, a, b, str(base / "m"))
    dm = {r["url"]: r["text"]
          for r in merged.load(spark, "doc_map").collect()}
    # tombstoned doc never merged
    assert set(dm) == {"http://x.is/shared", "http://x.is/a-only",
                       "http://x.is/b-only"}
    # newest warc_ts won the collision
    assert "fresh" in dm["http://x.is/shared"]
    assert "old" not in dm["http://x.is/shared"]


def test_merge_refuses_min_df_mismatch_and_dirty_out(
    spark, tmp_path_factory
):
    base = tmp_path_factory.mktemp("merger")
    pages = generate_pages(spark, 40)
    a = build_index_checkpointed(spark, pages, str(base / "a"),
                                 n_shards=2, min_df=1)
    b = build_index_checkpointed(spark, pages, str(base / "b"),
                                 n_shards=2, min_df=3)
    with pytest.raises(ValueError, match="min_df"):
        merge_stores(spark, a, b, str(base / "m"))
    c = build_index_checkpointed(spark, pages, str(base / "c"),
                                 n_shards=2, min_df=1)
    with pytest.raises(ValueError, match="not empty"):
        merge_stores(spark, a, c, str(base / "a"))
