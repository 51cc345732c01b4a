"""Document deletion: tombstone immediately, purge physically at
rebuild (the reference's per-url delete, article.py:473-477, as the
log-structured two-phase op)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import pytest
from pyspark.sql import functions as F

from greynirserver_spark.corpus import generate_pages, indexable_stems_by_rank
from greynirserver_spark.plans.lineage import (
    build_index_checkpointed,
    delete_urls,
    read_lineage,
    rebuild_segments,
)
from greynirserver_spark.plans.pipeline import query_to_terms
from greynirserver_spark.query.router import Router
from greynirserver_spark.query.searcher import Searcher


@pytest.fixture(scope="module")
def corpus_pages(spark):
    return generate_pages(spark, 500).cache()


def _search_urls(router, q, k=20):
    return [r.url for r in router.execute(q, k=k).df.collect()]


def test_delete_hides_immediately_and_purges_at_rebuild(
    spark, corpus_pages, tmp_path_factory
):
    root = str(tmp_path_factory.mktemp("del") / "store")
    store = build_index_checkpointed(
        spark, corpus_pages, root, n_shards=4, with_positions=True,
    )
    q = " ".join(indexable_stems_by_rank(2))
    router = Router(spark, store, version_check_interval_s=0.0)
    before = _search_urls(router, q)
    assert len(before) == 20

    # delete the top-2 hits
    victims = before[:2]
    n = delete_urls(spark, store, victims)
    assert n == 2
    # idempotent: re-deleting adds no tombstones
    assert delete_urls(spark, store, victims) == 0

    # BM25 search: victims gone, k still filled, remaining order kept
    after = _search_urls(router, q)
    assert not set(victims) & set(after)
    assert len(after) == 20
    assert after[: len(before) - 2] == [
        u for u in before if u not in victims
    ][:18]

    # every other qtype excludes them too
    dm = store.load(spark, "doc_map")
    n_docs_total = dm.count()
    newest = router.execute("newest articles").df.collect()
    assert not {r.url for r in newest} & set(victims)

    # phrase search over a victim's text finds nothing for it
    vrow = dm.where(F.col("url") == victims[0]).first()
    toks = [t for t in vrow.text.lower().split() if t.isalpha()]
    ph = router.execute(f'"{toks[0]} {toks[1]}"', k=20)
    assert victims[0] not in {r.url for r in ph.df.collect()}

    # Searcher paths exclude them as well (in-process + fallback)
    victim_ids = {
        r.doc_id for r in dm.where(F.col("url").isin(victims)).collect()
    }
    s = Searcher(spark, store)
    terms = query_to_terms(q)
    assert not victim_ids & {d for d, _ in s.search(terms, 20)}
    assert not victim_ids & {
        d for d, _ in Searcher(spark, store, max_fetch_blocks=1).search(
            terms, 20
        )
    }
    assert not victim_ids & {d for d, _ in s.phrase(toks[:2], 20)}

    # rebuild: physical purge + exact ranking vs scratch on survivors
    rebuild_segments(spark, store)
    assert not store.has("tombstones")
    dm2 = store.load(spark, "doc_map")
    assert dm2.count() == n_docs_total - 2
    assert dm2.where(F.col("url").isin(victims)).count() == 0
    assert (
        store.load(spark, "postings")
        .join(dm2.select("doc_id"), "doc_id", "left_anti").count() == 0
    )
    # positional blocks no longer contain the victims
    from greynirserver_spark.operators.posindex import (
        decode_positional_block,
    )
    import numpy as np

    for r in store.load(spark, "positions").collect():
        d, _, _ = decode_positional_block(r.docs, r.poslens, r.positions)
        assert not victim_ids & set(int(x) for x in d)

    scratch_pages = corpus_pages.where(~F.col("url").isin(victims))
    scratch = build_index_checkpointed(
        spark, scratch_pages,
        str(tmp_path_factory.mktemp("del") / "scratch"), n_shards=4,
    )

    def topk_urls(st):
        from greynirserver_spark.operators.wand import wand_topk

        hits = wand_topk(
            st.load_segments(spark), terms, st.load(spark, "corpus"), 20
        )
        dmx = st.load(spark, "doc_map").select("doc_id", "url")
        return sorted(
            (r.url, round(r.score, 9))
            for r in hits.join(dmx, "doc_id").collect()
        )

    assert topk_urls(store) == topk_urls(scratch)

    lin = read_lineage(store.root)
    assert (lin["stage"] == "delete").sum() == 1


def test_append_after_delete_and_rebuild(spark, corpus_pages, tmp_path):
    """Deletes compose with the append loop: tombstone, rebuild, then
    append fresh docs — ids stay unique, counts reconcile."""
    from greynirserver_spark.plans.lineage import append_pages

    h = F.pmod(F.xxhash64("url"), F.lit(4))
    base = corpus_pages.where(h != 0)
    extra = corpus_pages.where(h == 0)
    store = build_index_checkpointed(
        spark, base, str(tmp_path / "adr"), n_shards=4
    )
    dm = store.load(spark, "doc_map")
    n_before = dm.count()
    victims = [r.url for r in dm.orderBy("doc_id").limit(3).collect()]
    assert delete_urls(spark, store, victims) == 3
    rebuild_segments(spark, store)
    n_after_del = store.load(spark, "doc_map").count()
    assert n_after_del == n_before - 3

    res = append_pages(spark, store, extra)
    dm2 = store.load(spark, "doc_map")
    assert dm2.count() == n_after_del + res["new_docs"]
    assert dm2.select("doc_id").distinct().count() == dm2.count()
    # deleted urls stay deleted (they were not in the append batch)
    assert dm2.where(F.col("url").isin(victims)).count() == 0


def test_mass_delete_serving_bounded_driver(
    spark, corpus_pages, tmp_path_factory
):
    """≥100k tombstones (round-4 verdict item #1): the backlog must
    never be collect()ed into serving-driver memory — Searcher/Router
    exclude distributed, stay correct, and fill k via the exact
    terminal plan when the capped overfetch is swallowed."""
    from greynirserver_spark.plans.storage import ADAPTER

    root = str(tmp_path_factory.mktemp("mass") / "store")
    store = build_index_checkpointed(
        spark, corpus_pages, root, n_shards=4, with_positions=True,
    )
    q = " ".join(indexable_stems_by_rank(2))
    terms = query_to_terms(q)
    dm = store.load(spark, "doc_map")

    # pre-delete ranking (deep, for expected-result slices)
    pre = Searcher(spark, store, version_check_interval_s=0.0)
    deep = pre.search(terms, 60)
    assert len(deep) >= 45
    phrase_src = dm.orderBy("doc_id").first()
    toks = [t for t in phrase_src.text.lower().split() if t.isalpha()][:2]
    deep_ph = pre.phrase(toks, 60)

    # backlog: 100k synthetic ids + the query's top-30 real docs + the
    # top phrase docs — enough to swallow a k=5 capped overfetch (20)
    victims = [d for d, _ in deep[:30]]
    ph_victims = [d for d, _ in deep_ph[: max(0, len(deep_ph) - 3)]]
    synthetic = spark.range(100_000).select(
        (F.col("id") + 10_000_000).alias("doc_id"),
        F.lit("synthetic://backlog").alias("url"),
    )
    real = dm.where(
        F.col("doc_id").isin([int(x) for x in set(victims + ph_victims)])
    ).select("doc_id", "url")
    ADAPTER.append_table(synthetic.unionByName(real), store.tombstones)

    s = Searcher(spark, store, version_check_interval_s=0.0)
    # bounded driver memory: above the cap nothing was collected
    assert s._tomb_df is not None
    assert s._tombstones == frozenset()
    assert s._n_tombstones >= 100_000

    # capped rung exhausted -> exact distributed terminal plan fills k
    got = s.search(terms, 5)
    assert [d for d, _ in got] == [d for d, _ in deep[30:35]]
    for (_, a), (_, b) in zip(got, deep[30:35]):
        assert abs(a - b) < 1e-6
    # partial swallow (some survivors inside the capped window): the
    # anti-join filter path serves without the terminal plan
    got20 = s.search(terms, 20)
    assert [d for d, _ in got20] == [d for d, _ in deep[30:50]]

    # phrase: distributed exclusion + pre-top-k terminal
    ph = s.phrase(toks, 5)
    want_ph = [p for p in deep_ph if p[0] not in set(ph_victims)]
    assert ph == want_ph[:5]

    # a control Searcher allowed to collect the backlog agrees exactly
    ctl = Searcher(
        spark, store, version_check_interval_s=0.0,
        tombstone_driver_cap=1_000_000,
    )
    assert ctl._tomb_df is None and len(ctl._tombstones) >= 100_000
    assert ctl.search(terms, 20) == got20
    assert ctl.phrase(toks, 5) == ph

    # Router: anti-joined views + exact terminal (no k+n_tomb heap)
    router = Router(spark, store, version_check_interval_s=0.0)
    out = router.search(terms, 5).collect()
    assert [r.doc_id for r in out] == [d for d, _ in deep[30:35]]
    assert [r.rank for r in out] == [1, 2, 3, 4, 5]
    ph_out = router.phrase(toks, 5).collect()
    assert [(r.doc_id, r.phrase_tf) for r in ph_out] == ph
