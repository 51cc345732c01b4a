"""Federated search: querying N stores as one ranks exactly like a
search over their physical merge — the serving twin of merge_stores
(Lucene multi-reader / distributed-IDF discipline)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import pytest
from pyspark.sql import functions as F

from greynirserver_spark.corpus import generate_pages, indexable_stems_by_rank
from greynirserver_spark.plans.lineage import (
    build_index_checkpointed,
    delete_urls,
    merge_stores,
)
from greynirserver_spark.plans.pipeline import query_to_terms
from greynirserver_spark.query.federation import (
    federated_search,
    federated_term_stats,
)
from greynirserver_spark.query.searcher import Searcher


@pytest.fixture(scope="module")
def fed(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("fed")
    pages = generate_pages(spark, 300).cache()
    split = F.pmod(F.xxhash64("url"), F.lit(3))
    stores = [
        build_index_checkpointed(
            spark, pages.where(split == i), str(base / f"s{i}"),
            n_shards=3, with_positions=True)
        for i in range(3)
    ]
    merged = merge_stores(
        spark, merge_stores(spark, stores[0], stores[1],
                            str(base / "m01")),
        stores[2], str(base / "m"))
    return stores, merged


def _merged_ranked(spark, merged, terms, k):
    s = Searcher(spark, merged, version_check_interval_s=0.0)
    hits = s.search(terms, k)
    dm = {int(r["doc_id"]): r["url"]
          for r in merged.load(spark, "doc_map")
          .where(F.col("doc_id").isin([d for d, _ in hits])).collect()}
    return [(dm[d], round(sc, 6)) for d, sc in hits]


def test_federated_matches_physical_merge(spark, fed):
    stores, merged = fed
    for stems in (indexable_stems_by_rank(3),
                  indexable_stems_by_rank(2, start_rank=60)):
        terms = query_to_terms(" ".join(stems))
        got = [(u, round(sc, 6))
               for u, sc in federated_search(spark, stores, terms, k=12)]
        assert got == _merged_ranked(spark, merged, terms, 12)


def test_federated_stats_are_global(spark, fed):
    stores, merged = fed
    terms = query_to_terms(" ".join(indexable_stems_by_rank(2)))
    idfs, n_docs, avgdl = federated_term_stats(spark, stores, terms)
    crow = spark.read.parquet(merged.corpus).collect()[0]
    assert n_docs == int(crow["n_docs"])
    assert avgdl == pytest.approx(float(crow["avgdl"]), rel=1e-12)
    # idf equals the merged store's derived stats for the same terms
    ts = {r["term"]: r["idf"]
          for r in merged.term_stats_df(spark)
          .where(F.col("term").isin(terms)).collect()}
    for t, v in idfs.items():
        assert v == pytest.approx(ts[t], rel=1e-12)


def test_federated_phrase_matches_physical_merge(spark, fed):
    """Phrase tf is doc-local (stat-free), so per-store serving merges
    exactly: federated full match set == merged store's, keyed by url."""
    from greynirserver_spark.query.federation import FederatedSearcher

    stores, merged = fed
    f = FederatedSearcher(spark, stores, version_check_interval_s=0.0)
    ph = [indexable_stems_by_rank(1)[0]]
    got = f.phrase(ph, k=10**6)
    sm = Searcher(spark, merged, version_check_interval_s=0.0)
    hits = sm.phrase(ph, 10**6)
    dm = {int(r["doc_id"]): r["url"]
          for r in merged.load(spark, "doc_map")
          .where(F.col("doc_id").isin([d for d, _ in hits])).collect()}
    expect = {dm[d]: tf for d, tf in hits}
    assert dict(got) == expect
    # the API's own ordering is deterministic: tf desc, url asc
    assert got == sorted(got, key=lambda kv: (-kv[1], kv[0]))


def test_federated_searcher_search_delegates(spark, fed):
    from greynirserver_spark.query.federation import FederatedSearcher

    stores, merged = fed
    f = FederatedSearcher(spark, stores, version_check_interval_s=0.0)
    terms = query_to_terms(" ".join(indexable_stems_by_rank(2)))
    assert f.search(terms, 5) == federated_search(spark, stores, terms, 5)
    import pytest as _pt
    with _pt.raises(ValueError):
        FederatedSearcher(spark, [])


def test_federated_boolean_matches_physical_merge(spark, fed):
    """Boolean over the union == the merged store's Searcher.boolean,
    keyed by url (gate + scoring both reproduce the merged semantics
    from the global stats exchange)."""
    from greynirserver_spark.query.federation import FederatedSearcher

    stores, merged = fed
    f = FederatedSearcher(spark, stores, version_check_interval_s=0.0)
    stems = indexable_stems_by_rank(6)
    must = query_to_terms(" ".join(stems[:2]))
    should = query_to_terms(stems[2])
    must_not = query_to_terms(stems[5])
    got = [(u, round(sc, 6))
           for u, sc in f.boolean(must, should, must_not, k=10)]
    sm = Searcher(spark, merged, version_check_interval_s=0.0)
    hits = sm.boolean(must, should=should, must_not=must_not, k=10)
    dm = {int(r["doc_id"]): r["url"]
          for r in merged.load(spark, "doc_map")
          .where(F.col("doc_id").isin([d for d, _ in hits])).collect()}
    assert got == [(dm[d], round(sc, 6)) for d, sc in hits]
    # unindexed must term (below the global floor) empties the result
    assert f.boolean(["zzz-not-a-term"], [], [], k=5) == []


# runs LAST: mutates a fixture store (tombstone)
def test_federated_excludes_tombstones_per_store(spark, fed):
    stores, _ = fed
    terms = query_to_terms(" ".join(indexable_stems_by_rank(3)))
    before = federated_search(spark, stores, terms, k=8)
    victim_url = before[0][0]
    owner = next(
        s for s in stores
        if s.load(spark, "doc_map")
        .where(F.col("url") == victim_url).count() > 0
    )
    assert delete_urls(spark, owner, [victim_url]) == 1
    after = federated_search(spark, stores, terms, k=8)
    assert victim_url not in [u for u, _ in after]
    assert len(after) == 8


def test_federated_handles_local_pruning_skew(spark, tmp_path):
    """A term locally pruned in one store (0 < local df < min_df) but
    globally qualified must still contribute that store's postings to
    the federated ranking — the skew-exposed store routes through the
    exact raw-postings scorer (advice r5); result stays rank-identical
    to the physical merge. The fixture splits UNEVENLY (a 4-page slice)
    so rare stems' local dfs in the small store sit under min_df=3."""
    from greynirserver_spark.corpus import indexable_stems_by_rank

    pages = generate_pages(spark, 120).cache()
    big = pages.where(F.col("url").substr(-1, 1) != "7")
    small = pages.where(F.col("url").substr(-1, 1) == "7").limit(4)
    sa = build_index_checkpointed(
        spark, big, str(tmp_path / "sa"), n_shards=3)
    sb = build_index_checkpointed(
        spark, small, str(tmp_path / "sb"), n_shards=3)
    merged = merge_stores(spark, sa, sb, str(tmp_path / "m"))
    stores = [sa, sb]
    # pick a term the SMALL store holds but under its floor (df 1-2)
    cands = [query_to_terms(s)[0]
             for s in indexable_stems_by_rank(24, start_rank=40)]
    local = []
    idfs, _, _ = federated_term_stats(
        spark, stores, cands, per_store_df=local
    )
    skewed = [t for t in cands
              if t in idfs and 0 < local[1].get(t, 0) < 3]
    assert skewed, "fixture no longer produces a locally-pruned term"
    t = skewed[0]
    common = query_to_terms(indexable_stems_by_rank(1)[0])[0]
    for terms in ([t], sorted({t, common})):
        got = [(u, round(sc, 6))
               for u, sc in federated_search(spark, stores, terms, k=12)]
        assert got == _merged_ranked(spark, merged, terms, 12)
