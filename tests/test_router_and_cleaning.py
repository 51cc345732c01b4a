"""Query router dispatch + corpus cleaning pipeline tests."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from greynirserver_spark.corpus import generate_pages_pdf, indexable_stems_by_rank
from greynirserver_spark.operators.cleaning import clean_corpus, clean_summary
from greynirserver_spark.plans.lineage import build_index_checkpointed
from greynirserver_spark.query.router import Router


@pytest.fixture(scope="module")
def router(spark, tmp_path_factory):
    pages = spark.createDataFrame(generate_pages_pdf(200))
    root = str(tmp_path_factory.mktemp("router") / "store")
    store = build_index_checkpointed(spark, pages, root, n_shards=4,
                                     block_size=32)
    return Router(spark, store)


def test_search_dispatch(router):
    head = indexable_stems_by_rank(2)
    ans = router.execute(f"{head[0]} {head[1]}?", k=10)
    assert ans.qtype == "Search"
    rows = ans.df.collect()
    assert 0 < len(rows) <= 10
    assert rows[0].rank == 1
    assert rows[0].url.startswith("https://")
    # caps: k is bounded by the reference _MAXLEN_ANSWER
    big = router.execute(" ".join(head), k=500)
    assert big.df.count() <= 20


def test_related_dispatch(router):
    head = indexable_stems_by_rank(1)[0]
    ans = router.execute(f"skyld orð við {head}")
    assert ans.qtype == "RelatedWords"
    rows = ans.df.collect()
    assert 0 < len(rows) <= 21
    cnts = [r.cnt for r in rows]
    assert cnts == sorted(cnts, reverse=True)


def test_word_frequency_dispatch(router):
    head = indexable_stems_by_rank(1)[0]
    ans = router.execute(f"word frequency of {head}")
    assert ans.qtype == "WordFrequency"
    pdf = ans.df.toPandas()
    # zero-filled contiguous date spine
    assert (pdf["cnt"] >= 0).all()
    assert len(pdf) >= 30  # 120-day corpus window -> long spine
    assert pdf["day"].is_monotonic_increasing


def test_article_count_and_newest(router):
    head = indexable_stems_by_rank(1)[0]
    ans = router.execute(f"article count for {head}")
    assert ans.qtype == "ArticleCount"
    assert ans.df.first()["n_docs"] > 0
    ans2 = router.execute("newest articles")
    assert ans2.qtype == "NewestArticles"
    rows = ans2.df.collect()
    assert len(rows) == 5  # reference _MAX_URLS cap
    ts = [r.warc_ts for r in rows]
    assert ts == sorted(ts, reverse=True)


def test_stopword_search_is_empty(router):
    ans = router.execute("vera hafa segja")
    assert ans.qtype == "Search"
    assert ans.terms == []
    assert ans.df.count() == 0


# ------------------------------------------------------------- cleaning

def test_clean_corpus_statuses(spark):
    rows = [
        (1, "en", "alpha beta gamma delta " * 10),       # kept
        (2, "de", "alpha beta gamma delta " * 10),       # lang
        (3, "en", "tiny text"),                          # too_short
        (4, "en", "spam " * 100),                        # low_diversity
        (5, "en", "alpha beta gamma delta " * 10),       # exact dup of 1
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {r.doc_id: r.status for r in clean_corpus(
        docs, lang="en", min_tokens=20, min_unique_ratio=0.05
    ).collect()}
    assert got == {1: "kept", 2: "lang", 3: "too_short",
                   4: "low_diversity", 5: "exact_dup"}
    summary = {r.status: r.n_docs for r in clean_summary(
        clean_corpus(docs, lang="en", min_tokens=20, min_unique_ratio=0.05)
    ).collect()}
    assert summary["kept"] == 1 and summary["exact_dup"] == 1


def test_clean_corpus_near_dup(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta " * 6
    rows = [
        (1, "en", base),
        (2, "en", base + " extra word here"),   # near-dup of 1 -> dropped
        (3, "en", "completely different content " +
         "about other things entirely " * 8),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {r.doc_id: r.status for r in clean_corpus(
        docs, lang="en", min_tokens=10, near_dup=True, near_dup_threshold=0.6
    ).collect()}
    assert got[1] == "kept"
    assert got[2] == "near_dup"
    assert got[3] == "kept"


def test_bigram_pmi_values(spark):
    """PMI on a tiny corpus with hand-computed values: 'a b' occurs 6 of
    15 adjacent pair positions; p(a)=6/17, p(b)=6/17 over 17 tokens."""
    import math

    from greynirserver_spark.operators.analytics import bigram_pmi

    docs = spark.createDataFrame(
        [(0, "a b a b a b c"), (1, "a b a b a b d e f g")],
        "doc_id long, text string",
    )
    rows = bigram_pmi(docs, min_freq=5, limit=10).collect()
    assert [(r.w1, r.w2, r.freq) for r in rows] == [("a", "b", 6)]
    # n_pair counts ALL adjacent pairs (15), not just the freq>=5 ones
    want = round(math.log((6 / 15) / ((6 / 17) * (6 / 17))), 4)
    assert abs(rows[0].pmi - want) < 1e-9


def test_tfidf_keywords_shape(spark):
    from greynirserver_spark.operators.analytics import tfidf_keywords

    docs = spark.createDataFrame(
        [(i, f"common word{'x' if i % 2 else 'y'} unique{i} "
             "filler filler filler") for i in range(8)],
        "doc_id long, text string",
    )
    rows = tfidf_keywords(docs, per_doc=2, min_df=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(range(8))
    for doc_rows in by_doc.values():
        assert [r.rk for r in sorted(doc_rows, key=lambda r: r.rk)] == [1, 2]
        # rank order follows tfidf desc
        s = sorted(doc_rows, key=lambda r: r.rk)
        assert s[0].tfidf >= s[1].tfidf


def test_router_cache_hit_and_append_invalidation(spark, tmp_path):
    """Router.execute caches materialized answers (TTL + snapshot
    invalidation, reference queries/__init__.py:1295-1324); an
    append_pages commit must invalidate so the cache never serves a
    pre-append answer."""
    import time as _time

    from pyspark.sql import functions as F

    from greynirserver_spark.corpus import generate_pages
    from greynirserver_spark.plans.lineage import append_pages

    pages = generate_pages(spark, 300).cache()
    first = pages.where(F.xxhash64("url") % 4 != 0)
    second = pages.where(F.xxhash64("url") % 4 == 0)
    store = build_index_checkpointed(
        spark, first, str(tmp_path / "rc"), n_shards=4
    )
    router = Router(spark, store, version_check_interval_s=0.0)

    q = " ".join(indexable_stems_by_rank(2))
    a1 = router.execute(q, k=20)
    assert len(router._cache) == 1
    # cache hit: same rows, no recompute (local relation replay)
    a2 = router.execute(q, k=20)
    assert [tuple(r) for r in a2.df.collect()] == [
        tuple(r) for r in a1.df.collect()
    ]
    assert len(router._cache) == 1

    # "hversu margar greinar um X" over the pre-append store
    c1 = router.execute(f"article count for {q}").df.first()["n_docs"]

    append_pages(spark, store, second)
    # snapshot changed -> cache cleared, fresh answers include appends
    c2 = router.execute(f"article count for {q}").df.first()["n_docs"]
    assert c2 > c1
    a3 = router.execute(q, k=20)
    # appended docs are eligible: result sets differ or scores moved
    assert [tuple(r) for r in a3.df.collect()] != [
        tuple(r) for r in a1.df.collect()
    ]


def test_router_cache_ttl_expiry(spark, tmp_path):
    import time as _time

    pages_pdf = generate_pages_pdf(150)
    store = build_index_checkpointed(
        spark, spark.createDataFrame(pages_pdf), str(tmp_path / "ttl"),
        n_shards=4,
    )
    router = Router(spark, store, cache_ttl_s=0.2)
    q = " ".join(indexable_stems_by_rank(2))
    first = router.execute(q, k=10)
    key = (q.lower(), 10)
    assert key in router._cache
    _time.sleep(0.3)
    t0 = _time.monotonic()
    again = router.execute(q, k=10)
    assert [tuple(r) for r in again.df.collect()] == [
        tuple(r) for r in first.df.collect()
    ]
    # the entry was re-inserted after expiry, not served stale
    inserted = router._cache[key][0]
    assert inserted >= t0


def test_router_query_log(spark, tmp_path):
    """log_queries=True appends one record per executed (non-cache-hit)
    query — the reference's query logging (queries/__init__.py:
    1352-1378); cache hits don't log."""
    import json
    import os

    pages_pdf = generate_pages_pdf(150)
    store = build_index_checkpointed(
        spark, spark.createDataFrame(pages_pdf), str(tmp_path / "ql"),
        n_shards=4,
    )
    router = Router(spark, store, log_queries=True)
    q = " ".join(indexable_stems_by_rank(2))
    router.execute(q, k=5)
    router.execute(q, k=5)  # cache hit: not logged
    router.execute("newest articles")

    d = os.path.join(store.root, "_querylog")
    recs = []
    for fn in os.listdir(d):
        if fn.endswith(".json"):
            with open(os.path.join(d, fn)) as f:
                recs.append(json.loads(f.read()))
    assert len(recs) == 2
    qtypes = sorted(r["qtype"] for r in recs)
    assert qtypes == ["NewestArticles", "Search"]
    for r in recs:
        assert r["wall_ms"] >= 0 and r["n_rows"] >= 0


def test_spell_correct_serving_path(router):
    """Typo'd query tokens map to the store's own vocabulary and the
    autocorrected search serves exactly what the corrected terms
    would; in-vocabulary tokens pass through untouched."""
    from greynirserver_spark.plans.pipeline import query_to_terms

    stem = indexable_stems_by_rank(1)[0]
    good = query_to_terms(stem)          # ['<stem>/<cat>'] in-vocab
    typo = query_to_terms(stem + "x")    # ['<stem>x/entity'] unknown

    # passthrough for known terms
    assert router.spell_correct(good) == good

    fixed = router.spell_correct(typo)
    assert fixed != typo
    stats = router.store.load(router.spark, "term_stats")
    assert stats.where(F.col("term") == fixed[0]).count() == 1

    got = router.search(typo, k=5, autocorrect=True).collect()
    want = router.search(fixed, k=5).collect()
    assert len(got) > 0
    assert [r.doc_id for r in got] == [r.doc_id for r in want]

    # no candidate within max_dist: the token stays as typed
    assert router.spell_correct(["qqqqqqqqqq/entity"]) == [
        "qqqqqqqqqq/entity"
    ]


def test_arithmetic_dispatch_outranks_entity_qtypes(router):
    """'hvað er 5 sinnum 7' is Arithmetic, not Entity/Search; the
    answer row carries the reference's expression key and Icelandic
    number format."""
    ans = router.execute("Hvað er 5 sinnum 7?")
    assert ans.qtype == "Arithmetic"
    row = ans.df.first()
    assert row["value"] == 35.0 and row["answer"] == "35"
    assert row["expr"] == "5.0 * 7.0"
    # division by zero: refusal text, NULL value (arithmetic.py:557)
    z = router.execute("Hvað er 9 deilt með 0?")
    assert z.qtype == "Arithmetic"
    assert z.df.first()["value"] is None
    # non-arithmetic 'hvað er' still falls through to the next qtype
    assert router.execute("nýjustu greinar").qtype == "NewestArticles"


def test_date_dispatch_with_injected_clock(spark, tmp_path):
    """Date qtype answers from the injected clock, deterministic."""
    from datetime import date

    pages = spark.createDataFrame(generate_pages_pdf(60))
    store = build_index_checkpointed(
        spark, pages, str(tmp_path / "dts"), n_shards=2, block_size=32
    )
    r = Router(spark, store, clock=lambda: date(2026, 8, 17))
    a = r.execute("Hvaða dagur er í dag?")
    assert a.qtype == "Date"
    assert a.df.first()["answer"] == "Í dag er mánudagur 17. ágúst 2026."
    b = r.execute("Hvenær eru páskar?")
    assert b.qtype == "Date" and b.df.first()["target"] == "2027-03-28"
    # arithmetic still outranks ("hvað er langt til jóla" is Date,
    # "hvað er 2 plús 2" is Arithmetic, plain text is Search)
    assert r.execute("hvað er langt til jóla").qtype == "Date"
    assert r.execute("hvað er 2 plús 2").qtype == "Arithmetic"
    u = r.execute("Hvað eru 5 kíló í pundum?")
    assert u.qtype == "UnitConversion"
    assert u.df.first()["answer"] == "5 kíló eru 11,0132 pund."


def test_distance_dispatch_with_places_dim(spark, tmp_path):
    """Place-to-place distance from the injected places dimension,
    genitive-folded names, haversine pinned to the reference's own
    Munich-Berlin docstring example (geo.py::distance, 504.2 km)."""
    pages = spark.createDataFrame(generate_pages_pdf(60))
    store = build_index_checkpointed(
        spark, pages, str(tmp_path / "dst"), n_shards=2, block_size=32
    )
    places = spark.createDataFrame(
        [("Reykjavík", 64.133097, -21.898145),
         ("Akureyri", 65.6835, -18.1002),
         ("München", 48.1372, 11.5756),
         ("Berlín", 52.5186, 13.4083)],
        "place string, lat double, lon double",
    )
    r = Router(spark, store, places=places)
    a = r.execute("Hvað er langt á milli München og Berlín?")
    assert a.qtype == "Distance"
    row = a.df.first()
    assert row["distance_km"] == 504.2
    assert "kílómetrar á milli" in row["answer"]
    # genitive fold: Reykjavíkur -> Reykjavík, Akureyrar -> Akureyri
    b = r.execute("hvað er langt frá Reykjavíkur til Akureyrar")
    assert b.qtype == "Distance"
    assert 240 < b.df.first()["distance_km"] < 260
    # unknown place: 0 rows, no crash
    c = r.execute("hvað er langt á milli Hvergi og Reykjavíkur")
    assert c.qtype == "Distance" and c.df.count() == 0
