"""Log-structured incremental index append: appends are cheap and
queryable immediately; a segment rebuild restores exact from-scratch
ranking (Lucene-style freshness semantics)."""

from pyspark.sql import functions as F

from greynirserver_spark.corpus import generate_pages, indexable_stems_by_rank
from greynirserver_spark.operators.wand import wand_topk
from greynirserver_spark.plans.lineage import (
    append_pages,
    build_index_checkpointed,
    read_lineage,
    rebuild_segments,
)
from greynirserver_spark.plans.pipeline import query_to_terms


def _topk_by_url(spark, store, terms, k=10):
    segs = store.load_segments(spark)
    corpus = store.load(spark, "corpus")
    hits = wand_topk(segs, terms, corpus, k)
    dm = store.load(spark, "doc_map").select("doc_id", "url")
    return sorted(
        (r.url, round(r.score, 9))
        for r in hits.join(dm, "doc_id").collect()
    )


def test_append_then_rebuild_matches_scratch(spark, tmp_path):
    all_pages = generate_pages(spark, 1000).cache()
    first = all_pages.where(F.xxhash64("url") % 5 != 0)
    second = all_pages.where(F.xxhash64("url") % 5 == 0)

    # incremental store: build on 4/5, append 1/5
    inc = build_index_checkpointed(
        spark, first, str(tmp_path / "inc"), n_shards=8
    )
    n0 = inc.load(spark, "doc_map").count()
    res = append_pages(spark, inc, second)
    assert res["new_docs"] > 0
    dm = inc.load(spark, "doc_map")
    n_is = all_pages.where(F.col("lang") == "is").count()  # build keeps lang=is
    assert dm.count() == n0 + res["new_docs"] == n_is
    # ids stay dense and unique across the append
    assert dm.select("doc_id").distinct().count() == n_is
    assert dm.agg(F.max("doc_id")).first()[0] == n_is - 1

    # appended docs are queryable immediately (approximate idf on old
    # blocks is allowed pre-rebuild); exact after rebuild
    terms = query_to_terms(" ".join(indexable_stems_by_rank(2)))
    assert len(_topk_by_url(spark, inc, terms)) > 0

    rebuild_segments(spark, inc)

    scratch = build_index_checkpointed(
        spark, all_pages, str(tmp_path / "scratch"), n_shards=8
    )
    for qi in range(3):
        stems = indexable_stems_by_rank(8)
        terms = query_to_terms(" ".join(stems[2 * qi: 2 * qi + 2]))
        assert _topk_by_url(spark, inc, terms) == _topk_by_url(
            spark, scratch, terms
        ), terms

    # idempotency: re-appending the same pages is a no-op
    res2 = append_pages(spark, inc, second)
    assert res2["new_docs"] == 0
    assert inc.load(spark, "doc_map").count() == n_is

    lin = read_lineage(inc.root)
    assert (lin["stage"] == "append").sum() == 1
    assert (lin["stage"] == "rebuild_segments").sum() == 1
