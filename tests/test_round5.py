"""Round-5 regression tests — the round-4 ADVICE items: replay after
compaction, legacy trigram store migration, uncovered positional-count
stores, WAND-wrapper dictionary release, collation probe + z order."""

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F


# ------------------------------------------ runstore replay manifest

def _counts(spark, store):
    from greynirserver_spark.operators.runstore import load_counts

    df = load_counts(spark, store, ["k"], ["v"])
    return {} if df is None else {r["k"]: r["v"] for r in df.collect()}


def test_append_replay_after_compaction_is_noop(spark, tmp_path):
    """A batch replayed AFTER an intervening compaction folded its run
    into the base must still be refused (the `_applied` manifest —
    round-4 advice: the run-dir check alone would double-count)."""
    from greynirserver_spark.operators.runstore import (
        append_run,
        compact,
        load_counts,
        remove_run,
    )

    store = str(tmp_path / "counts")
    d1 = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v long")
    assert append_run(spark, store, d1, run_id="batch-1")
    # same-epoch replay: refused by the run-dir check
    assert not append_run(spark, store, d1, run_id="batch-1")
    # the cron's compaction lands between a crash and the retry
    compact(spark, store, load_counts(spark, store, ["k"], ["v"]))
    # post-compaction replay: the run dir is gone (folded), only the
    # manifest can refuse it
    assert not append_run(spark, store, d1, run_id="batch-1")
    assert _counts(spark, store) == {"a": 1, "b": 2}
    # a genuinely new batch still lands
    d2 = spark.createDataFrame([("a", 10)], "k string, v long")
    assert append_run(spark, store, d2, run_id="batch-2")
    assert _counts(spark, store) == {"a": 11, "b": 2}
    # surgical rollback clears the marker: a legitimate re-append of
    # the same intent id (crash recovery retry) is accepted again
    assert remove_run(spark, store, "batch-2")
    assert _counts(spark, store) == {"a": 1, "b": 2}
    assert append_run(spark, store, d2, run_id="batch-2")
    assert _counts(spark, store) == {"a": 11, "b": 2}


def test_compact_adopts_unmarked_runs(spark, tmp_path):
    """A run published by an append that crashed before writing its own
    marker is adopted into the manifest at compaction, so its replay is
    refused afterwards too."""
    from greynirserver_spark.operators.runstore import (
        append_run,
        compact,
        load_counts,
    )

    store = str(tmp_path / "counts")
    d1 = spark.createDataFrame([("a", 1)], "k string, v long")
    assert append_run(spark, store, d1, run_id="orphan-1")
    # simulate the crash window: the run rename happened but the marker
    # write did not
    os.remove(os.path.join(store, "_applied", "orphan-1"))
    compact(spark, store, load_counts(spark, store, ["k"], ["v"]))
    assert not append_run(spark, store, d1, run_id="orphan-1")
    assert _counts(spark, store) == {"a": 1}


# --------------------------------------- legacy bkt= trigram stores

def test_legacy_bkt_trigram_store_not_orphaned(spark, tmp_path):
    """A pre-round-4 hash-bucketed (bkt=N) trigram store must keep its
    accumulated counts: reads see them, and the first log-structured
    merge migrates them into base-1 instead of orphaning them
    (round-4 advice)."""
    from greynirserver_spark.operators.analytics import (
        load_trigram_counts,
        merge_trigram_counts,
        word_trigram_counts,
    )

    store = str(tmp_path / "trigrams")
    legacy = spark.createDataFrame(
        [("the quick brown", 7), ("quick brown fox", 3)],
        "trigram string, freq long",
    ).withColumn("bkt", F.pmod(F.xxhash64("trigram"), F.lit(4)))
    legacy.write.partitionBy("bkt").parquet(store)

    # reads see the legacy layout transparently
    got = {r.trigram: r.freq
           for r in load_trigram_counts(spark, store).collect()}
    assert got == {"the quick brown": 7, "quick brown fox": 3}

    # first merge migrates then appends — nothing orphaned
    batch = spark.createDataFrame(
        [(1, "the quick brown fox jumps")], "doc_id long, text string"
    )
    merge_trigram_counts(spark, store, batch, batch_id="b1")
    want = {r.trigram: r.freq for r in word_trigram_counts(batch).collect()}
    want = {t: want.get(t, 0) + got.get(t, 0)
            for t in set(want) | set(got)}
    got2 = {r.trigram: r.freq
            for r in load_trigram_counts(spark, store).collect()}
    assert got2 == want
    assert got2["the quick brown"] == 8  # 7 legacy + 1 batch
    # the store is now log-structured (migration happened exactly once)
    from greynirserver_spark.operators.runstore import current_epoch

    assert current_epoch(store) == 1


# ------------------------------------ uncovered positional summaries

def test_uncovered_positions_store_skips_summary(spark, tmp_path):
    """reset=False on a store whose positions predate pos_heavy.json
    (no build-time reset compaction ever ran) must NOT fabricate a
    summary from the append's runs alone — the guard keeps the honest
    count-job fallback until a rebuild recomputes it (round-4 advice,
    medium)."""
    from greynirserver_spark.operators.posindex import (
        load_positional_block_counts,
        update_positional_block_counts,
    )

    root = str(tmp_path / "store")
    os.makedirs(root)
    delta = spark.createDataFrame(
        [("heavy", 0, 1), ("heavy", 0, 2)],
        "term string, shard int, block_id long",
    )
    update_positional_block_counts(spark, root, delta, heavy_floor=1,
                                   run_id="a1")
    # no summary: the pre-existing (never-counted) blocks make any
    # runs-only summary unsound
    assert load_positional_block_counts(root) is None
    # the counts run itself landed (it seeds the next compaction)
    from greynirserver_spark.operators.runstore import has_runs

    assert has_runs(os.path.join(root, "pos_counts"))
    # a reset compaction (build/rebuild) then covers the store: the
    # summary appears and reflects the FULL table it was given
    full = spark.createDataFrame(
        [("heavy", 0, i) for i in range(4)] + [("light", 1, 0)],
        "term string, shard int, block_id long",
    )
    update_positional_block_counts(spark, root, full, heavy_floor=1,
                                   reset=True)
    heavy = load_positional_block_counts(root)
    assert heavy is not None
    assert heavy["terms"] == {"heavy": 4}
    # ...and subsequent reset=False appends update it again
    update_positional_block_counts(spark, root, delta, heavy_floor=1,
                                   run_id="a2")
    heavy2 = load_positional_block_counts(root)
    assert heavy2["terms"]["heavy"] >= 6


# ------------------------------------------ WAND wrapper dict release

def test_wand_document_wrappers_release_dictionaries(spark):
    """bm25_wand_documents_topk / _batch must not leak the persisted
    term dictionary their segment build attaches (round-4 advice): the
    result is materialized eagerly so the release can happen before
    return."""
    from greynirserver_spark.operators.textops import (
        bm25_wand_documents_topk,
        bm25_wand_documents_topk_batch,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta doc{i % 7} alpha") for i in range(60)],
        "doc_id long, text string",
    )

    def n_persisted():
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    r0 = bm25_wand_documents_topk(docs, ["alpha", "beta"], k=5, min_df=1,
                                  n_shards=2)
    assert r0.count() > 0
    base = n_persisted()
    r1 = bm25_wand_documents_topk(docs, ["alpha", "beta"], k=5, min_df=1,
                                  n_shards=2)
    assert r1.count() > 0
    r2 = bm25_wand_documents_topk_batch(
        docs, {"q1": ["alpha"], "q2": ["gamma", "delta"]}, k=5, min_df=1,
        n_shards=2,
    )
    assert r2.count() > 0
    assert n_persisted() <= base


# ------------------------------------------------- collation details

def test_collate_probe_memoized(spark):
    from greynirserver_spark.functions import collation

    collation._COLLATE_PROBE.clear()
    a = collation._has_collate(spark)
    assert id(spark) in collation._COLLATE_PROBE
    # poison the cache entry: a second call must NOT re-probe (it would
    # overwrite the poisoned value with the real one)
    collation._COLLATE_PROBE[id(spark)] = not a
    assert collation._has_collate(spark) is (not a)
    collation._COLLATE_PROBE[id(spark)] = a


def test_fallback_key_orders_z_within_alphabet(spark):
    """is_IS interleaves z between ý and þ; a raw-codepoint z would
    sort after ö at the very end (round-4 advice)."""
    from greynirserver_spark.functions.collation import (
        _FULL_ORDER,
        _WEIGHTS,
    )

    df = spark.createDataFrame(
        [("Þór",), ("Zakarías",), ("Ýr",), ("Örn",), ("Yrsa",)],
        "name string",
    )
    got = [
        r["name"]
        for r in df.orderBy(
            F.translate(F.lower(F.col("name")), _FULL_ORDER, _WEIGHTS)
        ).collect()
    ]
    assert got == ["Yrsa", "Ýr", "Zakarías", "Þór", "Örn"]


# ---------------------------- standalone count-store compaction (LSM)

def test_maintain_count_stores_bounds_run_dirs(spark, tmp_path):
    """With rebuilds disabled, per-append maintenance keeps the
    current-epoch run-dir count bounded (round-4 verdict item #3) and
    the folded view stays exact across many compactions."""
    from greynirserver_spark.operators.postings import (
        append_term_counts_run,
        load_term_counts,
    )
    from greynirserver_spark.operators.runstore import run_count
    from greynirserver_spark.plans.lineage import (
        IndexStore,
        maintain_count_stores,
    )

    store = IndexStore(str(tmp_path / "store"))
    n_batches, max_runs = 60, 8
    for i in range(n_batches):
        delta = spark.createDataFrame(
            [(f"t{i % 5}", 1, 2)], "term string, df long, cf long"
        )
        append_term_counts_run(
            spark, store.term_counts, delta, run_id=f"b{i}"
        )
        maintain_count_stores(spark, store, max_runs=max_runs)
        assert run_count(store.term_counts) <= max_runs
    got = {
        r["term"]: (r["df"], r["cf"])
        for r in load_term_counts(spark, store.term_counts).collect()
    }
    assert got == {f"t{j}": (12, 24) for j in range(5)}


def test_thousand_run_store_compacts_and_lookups_stay_bounded(
    spark, tmp_path
):
    """A store that accumulated 1,000 runs (rebuilds AND maintenance
    disabled) still folds exactly in one standalone compaction, and the
    read path goes from a 1,000-dir union to a single base read."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import time as _time

    from greynirserver_spark.operators.postings import load_term_counts
    from greynirserver_spark.operators.runstore import run_count
    from greynirserver_spark.plans.lineage import (
        IndexStore,
        maintain_count_stores,
    )

    store = IndexStore(str(tmp_path / "store"))
    root = store.term_counts
    os.makedirs(root)
    tbl = pa.table(
        {"term": ["a", "b"], "df": pa.array([1, 1], "int64"),
         "cf": pa.array([2, 3], "int64")}
    )
    for i in range(1000):
        d = os.path.join(root, f"run=0-r{i:04d}")
        os.makedirs(d)
        pq.write_table(tbl, os.path.join(d, "part-0.parquet"))
    assert run_count(root) == 1000
    t0 = _time.monotonic()
    before = {
        r["term"]: r["df"]
        for r in load_term_counts(spark, root).collect()
    }
    t_union = _time.monotonic() - t0
    assert before == {"a": 1000, "b": 1000}
    res = maintain_count_stores(spark, store, max_runs=64)
    assert res["term_counts"] and run_count(root) == 0
    t0 = _time.monotonic()
    after = {
        r["term"]: r["df"]
        for r in load_term_counts(spark, root).collect()
    }
    t_base = _time.monotonic() - t0
    assert after == before
    # the compacted read must not pay the 1,000-dir union
    assert t_base < t_union


def test_serving_exact_after_standalone_compaction(spark, tmp_path):
    """Standalone compaction folds the term-count runs WITHOUT
    refreshing the delta segments — the serving layer must keep the
    exact-stats idf rescale engaged (dirty marker, not has_runs) and
    rank identical to a from-scratch build."""
    from greynirserver_spark.corpus import (
        generate_pages,
        indexable_stems_by_rank,
    )
    from greynirserver_spark.operators.runstore import has_runs
    from greynirserver_spark.plans.lineage import (
        append_pages,
        build_index_checkpointed,
        maintain_count_stores,
        stats_need_rescale,
    )
    from greynirserver_spark.plans.pipeline import query_to_terms
    from greynirserver_spark.query.searcher import Searcher

    all_pages = generate_pages(spark, 500).cache()
    first = all_pages.where(F.xxhash64("url") % 3 != 0)
    second = all_pages.where(F.xxhash64("url") % 3 == 0)

    inc = build_index_checkpointed(
        spark, first, str(tmp_path / "inc"), n_shards=4,
        with_positions=True,
    )
    assert not stats_need_rescale(inc)
    append_pages(spark, inc, second)
    assert stats_need_rescale(inc)
    # force the standalone fold (threshold 0 -> compacts the 1 run)
    res = maintain_count_stores(spark, inc, max_runs=0)
    assert res["term_counts"] and res["pos_counts"]
    assert not has_runs(inc.term_counts)
    # the delta blocks still carry placeholder idf: rescale stays on
    assert stats_need_rescale(inc)

    scratch = build_index_checkpointed(
        spark, all_pages, str(tmp_path / "scr"), n_shards=4
    )
    terms = query_to_terms(" ".join(indexable_stems_by_rank(4)[:2]))

    def urls(store):
        s = Searcher(spark, store, version_check_interval_s=0.0)
        dm = {
            r["doc_id"]: r["url"]
            for r in store.load(spark, "doc_map")
            .select("doc_id", "url").collect()
        }
        return [(dm[d], round(sc, 9)) for d, sc in s.search(terms, 10)]

    s_inc = Searcher(spark, inc, version_check_interval_s=0.0)
    assert s_inc._exact_stats  # marker keeps the lookup engaged
    assert urls(inc) == urls(scratch)

    # rebuild clears the marker: baked stats are current again
    from greynirserver_spark.plans.lineage import rebuild_segments

    rebuild_segments(spark, inc)
    assert not stats_need_rescale(inc)
    assert urls(inc) == urls(scratch)


# ----------------------------- decontamination / repetition gates

def test_contamination_report_flags_benchmark_overlap(spark):
    from greynirserver_spark.operators.decontam import (
        benchmark_ngrams,
        contamination_report,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),        # contains bench 8-gram
            (2, "a b c d e f g x y z"),        # 7-gram overlap only
            (3, "k l m n o p q r s t"),        # disjoint
            (4, "short doc"),                  # < n tokens
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "zz a b c d e f g h zz")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_hits"], r["contaminated"])
        for r in contamination_report(docs, bench, n=8).collect()
    }
    assert got == {1: (1, True), 2: (0, False), 3: (0, False),
                   4: (0, False)}
    # min_hits threshold: the single shared 8-gram no longer flags
    got2 = {
        r["doc_id"]: r["contaminated"]
        for r in contamination_report(docs, bench, n=8,
                                      min_hits=2).collect()
    }
    assert got2 == {1: False, 2: False, 3: False, 4: False}
    # prebuilt benchmark frame is reusable
    bn = benchmark_ngrams(bench, 8)
    got3 = {
        r["doc_id"]: r["contaminated"]
        for r in contamination_report(
            docs, bench, n=8, bench_ngrams=bn
        ).collect()
    }
    assert got3 == {1: True, 2: False, 3: False, 4: False}


def test_ngram_repetition_ratio(spark):
    from greynirserver_spark.operators.decontam import ngram_repetition

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),   # 3 bigrams, 1 distinct
            (2, "a b c d"),               # 3 bigrams, all distinct
            (3, "x"),                     # shorter than n
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_ngrams"], r["n_distinct"], r["dup_ratio"])
        for r in ngram_repetition(docs, n=2).collect()
    }
    assert got[1] == (3, 1, round(1 - 1 / 3, 6))
    assert got[2] == (3, 3, 0.0)
    assert got[3] == (0, 0, 0.0)


def test_decontam_plans_have_no_cartesian(spark):
    from greynirserver_spark.operators.decontam import (
        contamination_report,
        ngram_repetition,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h")], "doc_id long, text string"
    )
    for df in (
        contamination_report(docs, docs, n=4),
        ngram_repetition(docs, n=2),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_fuzzy_term_lookup_ranks_by_distance_then_jaccard(spark):
    from greynirserver_spark.operators.analytics import fuzzy_term_lookup

    docs = spark.createDataFrame(
        [(1, "part sort spark value part sort")],
        "doc_id long, text string",
    )
    rows = fuzzy_term_lookup(docs, "sart", k=10, max_dist=2).collect()
    # 'part' and 'sort' are both edit distance 1; 'part' shares two
    # trigrams (art, rt$) vs 'sort' one (rt$) so it ranks first.
    # 'spark' shares no trigram with ^sart$ -> excluded; 'value' far.
    assert [r["term"] for r in rows] == ["part", "sort"]
    assert [r["lev"] for r in rows] == [1, 1]
    assert rows[0]["jaccard"] > rows[1]["jaccard"]


def test_fuzzy_term_lookup_exact_hit_and_no_hit(spark):
    from greynirserver_spark.operators.analytics import fuzzy_term_lookup

    docs = spark.createDataFrame(
        [(1, "merge window merge")], "doc_id long, text string"
    )
    exact = fuzzy_term_lookup(docs, "merge", k=5).collect()
    assert exact[0]["term"] == "merge" and exact[0]["lev"] == 0
    assert fuzzy_term_lookup(docs, "zzzzqq", k=5).count() == 0


def test_fuzzy_term_lookup_plan_is_single_pass(spark):
    from greynirserver_spark.operators.analytics import fuzzy_term_lookup

    docs = spark.createDataFrame(
        [(1, "part sort")], "doc_id long, text string"
    )
    plan = fuzzy_term_lookup(docs, "sart")._jdf.queryExecution() \
        .executedPlan().toString()
    # trigram profile + intersect + levenshtein are row-local JVM
    # expressions: no explode of the vocabulary, no join at all
    assert "CartesianProduct" not in plan
    assert "Generate" not in plan.split("HashAggregate")[0]


# ------------------------------------------ PII redaction

def test_pii_redact_counts_and_scrub(spark):
    """Every class counted and replaced; claim order (email before id
    before ipv4 before phone) means each span is counted once by the
    first pattern that matches it."""
    from greynirserver_spark.operators.pii import pii_redact

    docs = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex.co.uk and x@y.is now"),
            (2, "kt 120384-3399 ip 10.0.0.1 tel +354 581 2345"),
            (3, "no pii here at all"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pii_redact(docs).collect()}
    assert rows[1]["n_email"] == 2 and rows[1]["n_id"] == 0
    assert rows[1]["clean_text"] == "mail <EMAIL> and <EMAIL> now"
    assert (rows[2]["n_id"], rows[2]["n_ipv4"], rows[2]["n_phone"]) == (
        1, 1, 1,
    )
    assert rows[2]["clean_text"] == "kt <ID> ip <IP> tel <PHONE>"
    assert rows[3]["clean_text"] == "no pii here at all"
    assert sum(rows[3][c] for c in
               ("n_email", "n_id", "n_ipv4", "n_phone")) == 0


def test_pii_redact_is_shuffle_free(spark):
    """The scrub is row-local: one codegen stage, no exchange."""
    from greynirserver_spark.operators.pii import pii_redact

    docs = spark.createDataFrame(
        [(1, "a@b.is")], "doc_id long, text string"
    )
    plan = pii_redact(docs)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "Exchange" not in plan


# ------------------------------------------ unigram LM quality gate

def test_unigram_logprob_ranks_rare_doc_worse(spark):
    """A document of corpus-rare tokens scores lower avg_logprob /
    higher ppl than one of corpus-common tokens; ppl == exp(-avg)."""
    import math

    from greynirserver_spark.operators.textops import (
        unigram_logprob_scores,
    )

    docs = spark.createDataFrame(
        [
            (1, "the the the cat"),
            (2, "the the the cat"),
            (3, "zyx qwv zyx plk"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in
            unigram_logprob_scores(docs).collect()}
    assert rows[1]["n_tokens"] == 4
    assert rows[3]["avg_logprob"] < rows[1]["avg_logprob"]
    assert rows[3]["ppl"] > rows[1]["ppl"]
    # corpus: 12 tokens; doc1 avg = (3*ln(6/12) + ln(2/12))/4
    want = (3 * math.log(6 / 12) + math.log(2 / 12)) / 4
    assert abs(rows[1]["avg_logprob"] - round(want, 4)) < 1e-9
    assert abs(rows[2]["ppl"] - round(math.exp(-want), 4)) < 1e-9


def test_unigram_logprob_broadcast_gate(spark):
    """Vocabulary under the gate broadcasts the frequency dim; above it
    the plan falls back to a shuffle join (same size-gate pattern as
    the segment dictionary)."""
    from greynirserver_spark.operators.textops import (
        unigram_logprob_scores,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta")],
        "doc_id long, text string",
    )
    small = unigram_logprob_scores(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in small
    big = unigram_logprob_scores(docs, broadcast_max=1)._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in big


# ------------------------------------------ URL canonicalization

def test_canonical_url_rules(spark):
    """Scheme/host case, www, default ports, dup+trailing slash,
    tracking params, param order, fragments — each collapsed; path
    case, non-default ports and scheme identity preserved."""
    from greynirserver_spark.operators.urls import normalize_urls

    rows = [
        (1, "HTTP://WWW.Site.IS:80/Art//42/?utm_source=rss&b=2&a=1#f"),
        (2, "https://site.is:443/a/"),
        (3, "https://site.is/a?b=2&a=1"),
        (4, "https://site.is/a?a=1&b=2&utm_campaign=x&fbclid=z"),
        (5, "http://site.is:8080/A"),
        (6, "https://site.is/CaseSensitive/Path"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r["doc_id"]: r["canonical_url"]
           for r in normalize_urls(df).collect()}
    assert got[1] == "http://site.is/Art/42?a=1&b=2"
    assert got[2] == "https://site.is/a"
    assert got[3] == got[4] == "https://site.is/a?a=1&b=2"
    assert got[5] == "http://site.is:8080/A"
    assert got[6] == "https://site.is/CaseSensitive/Path"


def test_url_dup_groups_collapse_and_plan(spark):
    from greynirserver_spark.operators.urls import (
        normalize_urls, url_dup_groups,
    )

    df = spark.createDataFrame(
        [
            (1, "https://WWW.site.is/a/?utm_source=x"),
            (2, "https://site.is/a"),
            (3, "http://other.is/b"),
        ],
        "doc_id long, url string",
    )
    groups = {r["canonical_url"]: r for r in url_dup_groups(df).collect()}
    assert groups["https://site.is/a"]["n_urls"] == 2
    assert groups["https://site.is/a"]["min_doc_id"] == 1
    assert groups["http://other.is/b"]["n_urls"] == 1
    # normalization itself is row-local: no exchange in the plan
    plan = normalize_urls(df)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "Exchange" not in plan


# ------------------------------------------ Gopher quality rules

def test_gopher_rules_gates(spark):
    from greynirserver_spark.operators.textops import gopher_rules

    docs = spark.createDataFrame(
        [
            (1, "the and of to be that have with " * 8),   # passes
            (2, "• a...\n• b\nplain the and line"),        # bullet-heavy
            (3, "word " * 60),                             # no stopwords
            (4, "short the and doc"),                      # < min_words
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in gopher_rules(docs).collect()}
    assert rows[1]["passes"] == 1 and rows[1]["n_words"] == 64
    assert rows[1]["mean_word_len"] == 3.0
    assert rows[2]["passes"] == 0 and rows[2]["bullet_ratio"] == 0.6667
    assert rows[3]["passes"] == 0 and rows[3]["n_stop_distinct"] == 0
    assert rows[4]["passes"] == 0
    # rules are row-local: zero shuffle
    plan = gopher_rules(docs)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "Exchange" not in plan


# ------------------------------------------ temperature sampling

def test_source_temperature_sample_thins_head(spark):
    """Head domain thinned toward n_s^alpha, smallest source kept
    whole; the keep decision is a per-doc deterministic coin, so
    re-running or repartitioning never changes membership."""
    from greynirserver_spark.operators.webclean import (
        source_temperature_sample,
    )

    rows = [(i, "head") for i in range(400)] + \
           [(1000 + i, "tail") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    kept = source_temperature_sample(docs, alpha=0.5).collect()
    by_src = {}
    for r in kept:
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    # tail: p_keep = 1 -> all 20 survive
    assert len(by_src["tail"]) == 20
    # head: p_keep = sqrt(20/400) ~ 0.2236 -> E[kept] ~ 89
    n_head = len(by_src["head"])
    assert 55 <= n_head <= 125
    p = {r["source"]: r["p_keep"] for r in kept}
    assert p["tail"] == 1.0 and abs(p["head"] - 0.223607) < 1e-6
    # determinism across runs and partition layouts
    again = sorted(
        r["doc_id"] for r in
        source_temperature_sample(docs.repartition(13), alpha=0.5)
        .collect()
    )
    assert again == sorted(r["doc_id"] for r in kept)
    # alpha=1 keeps everything
    assert source_temperature_sample(docs, alpha=1.0).count() == 420


def test_url_unparseable_is_null_and_dropped(spark):
    """Relative / schemeless URLs get NULL canonical (no safe dedup
    key) and never form a skewed NULL group in url_dup_groups."""
    from greynirserver_spark.operators.urls import (
        normalize_urls, url_dup_groups,
    )

    df = spark.createDataFrame(
        [(1, "/relative/path"), (2, "not a url"), (3, "https://ok.is/a")],
        "doc_id long, url string",
    )
    got = {r["doc_id"]: r["canonical_url"]
           for r in normalize_urls(df).collect()}
    assert got[1] is None and got[2] is None
    assert got[3] == "https://ok.is/a"
    assert url_dup_groups(df).count() == 1


def test_empty_corpus_guards(spark):
    from greynirserver_spark.operators.textops import (
        unigram_logprob_scores,
    )
    from greynirserver_spark.operators.webclean import (
        source_temperature_sample,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert unigram_logprob_scores(empty).count() == 0
    empty_s = spark.createDataFrame([], "doc_id long, source string")
    assert source_temperature_sample(empty_s).count() == 0


# ------------------------------------------ gate funnel

def test_gate_funnel_stage_attrition(spark):
    """Each stage applies to the previous stage's survivors: the bullet
    fragment dies at gopher, the gibberish doc at the ppl cap, the
    second clone at exact-dup; funnel arithmetic is consistent."""
    from greynirserver_spark.operators.cleaning import gate_funnel

    common = "the a row scan table value part hash merge batch"
    docs = spark.createDataFrame(
        [
            (1, common),
            (2, common),                          # clone -> exact_dup
            (3, "the a " + " ".join(
                f"zzx{i}q" for i in range(8))),   # rare -> perplexity
            (4, "• one\n• two"),                  # bullets -> gopher
            (5, "the a row scan table value part hash fast slow"),
        ],
        "doc_id long, text string",
    )
    rows = {r["stage"]: r for r in gate_funnel(
        docs, stopwords=("the", "a"), min_words=5, ppl_max=25.0
    ).collect()}
    assert (rows["gopher"]["n_in"], rows["gopher"]["n_out"]) == (5, 4)
    assert rows["perplexity"]["n_in"] == 4
    assert rows["perplexity"]["n_out"] == 3
    assert rows["exact_dup"]["n_in"] == 3
    assert rows["exact_dup"]["n_out"] == 2
    for r in rows.values():
        assert r["n_in"] - r["n_dropped"] == r["n_out"]


# ------------------------------------------ geo functions

def test_haversine_reference_pin(spark):
    """Munich->Berlin = 504.2 km — the reference geo.py docstring's own
    example (geo.py::distance); plus symmetry and zero."""
    from pyspark.sql import functions as F

    from greynirserver_spark.functions.geo import haversine_km

    df = spark.range(1).select(
        F.round(haversine_km(
            F.lit(48.1372), F.lit(11.5756), F.lit(52.5186), F.lit(13.4083)
        ), 1).alias("d"),
        F.round(haversine_km(
            F.lit(52.5186), F.lit(13.4083), F.lit(48.1372), F.lit(11.5756)
        ), 1).alias("d_rev"),
        haversine_km(F.lit(64.1), F.lit(-21.9), F.lit(64.1),
                     F.lit(-21.9)).alias("zero"),
    ).first()
    assert df["d"] == 504.2 and df["d_rev"] == 504.2
    assert df["zero"] == 0.0


def test_in_iceland_and_capital_region(spark):
    from pyspark.sql import functions as F

    from greynirserver_spark.functions.geo import (
        in_iceland, near_capital_region,
    )

    row = spark.range(1).select(
        in_iceland(F.lit(64.133097), F.lit(-21.898145)).alias("rvk"),
        in_iceland(F.lit(48.1372), F.lit(11.5756)).alias("munich"),
        near_capital_region(F.lit(64.15), F.lit(-21.9)).alias("near"),
        near_capital_region(F.lit(65.6835), F.lit(-18.1002)).alias("ak"),
    ).first()
    assert row["rvk"] and not row["munich"]
    assert row["near"] and not row["ak"]


def test_geo_tag_documents_broadcast_plan(spark):
    from greynirserver_spark.functions.geo import geo_tag_documents

    docs = spark.createDataFrame(
        [(1, "meet in spark and spark again near vector")],
        "doc_id long, text string",
    )
    places = spark.createDataFrame(
        [("spark", 64.133097, -21.898145, "IS"),
         ("vector", 48.1372, 11.5756, "DE")],
        "place string, lat double, lon double, country string",
    )
    out = geo_tag_documents(docs, places)
    rows = {r["place"]: r for r in out.collect()}
    assert rows["spark"]["n_mentions"] == 2
    assert rows["spark"]["in_iceland"] == 1
    assert rows["vector"]["in_iceland"] == 0
    assert rows["spark"]["dist_rvk_km"] == 0.0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# ------------------------------------------ incremental URL frontier

def test_incremental_url_seen_matches_one_shot(spark, tmp_path):
    """Union of 'new' rows across batches (processed in doc_id order)
    == the one-shot url_dup_groups keep-first survivors; replays are
    refused by the store; the membership probe broadcasts the batch,
    never shuffles the store."""
    from greynirserver_spark.operators.urls import (
        incremental_url_seen, url_dup_groups,
    )

    root = str(tmp_path / "frontier")
    all_rows = [
        (1, "https://a.is/x"),
        (2, "https://WWW.a.is/x/"),          # batch-dup of 1
        (3, "bad url"),                      # invalid
        (4, "https://b.is/y?b=2&a=1"),
        (5, "https://a.is/x?utm_source=z"),  # store-dup of 1
        (6, "https://b.is/y?a=1&b=2"),       # store-dup of 4
        (7, "https://c.is/z"),
    ]
    batches = [all_rows[:4], all_rows[4:]]
    new_ids = []
    for i, b in enumerate(batches):
        df = spark.createDataFrame(b, "doc_id long, url string")
        out = incremental_url_seen(spark, root, df, run_id=f"b{i}")
        got = {r["doc_id"]: r["status"] for r in out.collect()}
        new_ids += [d for d, st in got.items() if st == "new"]
    assert got == {5: "dup_store", 6: "dup_store", 7: "new"}
    one_shot = url_dup_groups(
        spark.createDataFrame(all_rows, "doc_id long, url string")
    )
    assert sorted(new_ids) == sorted(
        r["min_doc_id"] for r in one_shot.collect()
    )
    # replayed batch: store append refused (no double-count) and every
    # valid key now reads as already-stored
    df = spark.createDataFrame(batches[1], "doc_id long, url string")
    replay = incremental_url_seen(spark, root, df, run_id="b1")
    assert {r["status"] for r in replay.collect()} == {"dup_store"}
    from greynirserver_spark.operators.runstore import load_rows

    assert load_rows(spark, root).count() == 3  # a/x, b/y, c/z once each


def test_bm25_boolean_gates(spark):
    """AND gate, NOT anti-join and score parity with the plain scorer."""
    from greynirserver_spark.operators import textops as T

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    post = T.document_postings(docs).cache()
    res = T.bm25_boolean_topk(
        docs, must=["spark", "join"], should=["window"],
        must_not=["dup"], k=50, postings=post,
    ).collect()
    assert res, "boolean query returned no rows"
    by_doc = (
        post.where(F.col("term").isin(["spark", "join", "dup"]))
        .groupBy("doc_id")
        .agg(F.collect_set("term").alias("ts"))
        .collect()
    )
    terms_of = {r["doc_id"]: set(r["ts"]) for r in by_doc}
    for r in res:
        ts = terms_of[r["doc_id"]]
        assert {"spark", "join"} <= ts
        assert "dup" not in ts
    # ranking is (score desc, doc_id asc) like the plain scorer
    scores = [(r["rank"], -r["score"], r["doc_id"]) for r in res]
    assert scores == sorted(scores)
    # no gates == the plain disjunctive scorer, row for row
    plain = T.bm25_documents_topk(
        docs, ["spark", "join", "window"], k=10, postings=post).collect()
    loose = T.bm25_boolean_topk(
        docs, must=[], should=["spark", "join", "window"], k=10,
        postings=post).collect()
    assert [tuple(r) for r in plain] == [tuple(r) for r in loose]


def test_bm25_boolean_not_gate_is_anti_join(spark):
    from greynirserver_spark.operators import textops as T

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = T.bm25_boolean_topk(
        docs, must=["spark"], must_not=["dup"], k=5
    )._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_router_similar_articles(spark, tmp_path):
    """simserver parity: LSA-space similar articles served from the
    store's own postings, snapshot-scoped persisted vectors, no leak."""
    from greynirserver_spark.corpus import generate_pages
    from greynirserver_spark.plans.lineage import build_index_checkpointed
    from greynirserver_spark.query.router import Router

    pages = generate_pages(spark, 200)
    store = build_index_checkpointed(
        spark, pages, str(tmp_path / "store"), n_shards=4)
    r = Router(spark, store)
    url = r.doc_map.orderBy("doc_id").limit(1).collect()[0]["url"]
    hits = r.similar(url, k=5).collect()
    assert 0 < len(hits) <= 5
    assert url not in {h["url"] for h in hits}
    sims = [h["sim"] for h in hits]
    assert sims == sorted(sims, reverse=True)
    # dispatch + TTL cache path
    ans = r.execute(f"similar articles to {url}", k=5)
    assert ans.qtype == "SimilarArticles"
    assert [t["url"] for t in ans.df.collect()] == [h["url"] for h in hits]
    # unknown url -> empty, not an error
    assert r.similar("https://nowhere.example/xyz", k=5).count() == 0
    # snapshot re-open releases the persisted vector table (no leak)
    sc = spark.sparkContext
    base = len(sc._jsc.getPersistentRDDs())
    for _ in range(3):
        r._open()
        r.similar(url, k=3).collect()
    assert len(sc._jsc.getPersistentRDDs()) <= base


def test_router_article_topics(spark, tmp_path):
    """On-demand article topic tags over the snapshot's LSA vectors,
    with an injectable Topics.conf (keywords from the store's own
    vocabulary)."""
    from greynirserver_spark.corpus import generate_pages
    from greynirserver_spark.plans.lineage import build_index_checkpointed
    from greynirserver_spark.query.router import Router

    pages = generate_pages(spark, 200)
    store = build_index_checkpointed(
        spark, pages, str(tmp_path / "store"), n_shards=4)
    probe = Router(spark, store)
    # topic keywords drawn from the store's actual head terms so the
    # synthetic Topics.conf matches this corpus's vocabulary
    head = [r["term"] for r in probe.postings.groupBy("term").count()
            .orderBy("count", ascending=False).limit(8).collect()]
    conf = [("head_a", tuple(head[:4]), 0.05),
            ("head_b", tuple(head[4:8]), 0.05),
            ("impossible", tuple(head[:2]), 0.999999)]
    r = Router(spark, store, topics=conf)
    url = r.doc_map.orderBy("doc_id").limit(1).collect()[0]["url"]
    rows = r.topics(url).collect()
    names = {x["topic"] for x in rows}
    assert names and names <= {"head_a", "head_b"}
    assert "impossible" not in names
    sims = [x["sim"] for x in rows]
    assert sims == sorted(sims, reverse=True)
    ans = r.execute(f"topics of {url}")
    assert ans.qtype == "ArticleTopics"
    assert {x["topic"] for x in ans.df.collect()} == names
    # unknown url -> empty
    assert r.topics("https://nowhere.example/x").count() == 0


def test_recent_persons_better_title_and_cutoff(spark):
    """The reference's is_better_title rule and the early-termination
    cutoff, pinned on a hand-built mention table."""
    import datetime as dt

    from greynirserver_spark.operators.people import recent_persons

    d0 = dt.date(2026, 3, 1)
    LONG_90 = "x" * 90
    LONG_70 = "y" * 70
    rows = [
        # Alpha: long title first, then a SHORTER long one (better),
        # then a short one (best of all), then a longer short one that
        # falls AFTER the cutoff and must be ignored
        ("Alpha", LONG_90, "u/a1", d0 + dt.timedelta(days=9)),
        ("Alpha", LONG_70, "u/a2", d0 + dt.timedelta(days=8)),
        ("Alpha", "stutt", "u/a3", d0 + dt.timedelta(days=7)),
        ("Beta", "ráðherra", "u/b1", d0 + dt.timedelta(days=6)),
        # cutoff: limit=2 -> scan stops at Beta's first occurrence
        ("Alpha", "miklu lengri stuttur titill", "u/a4",
         d0 + dt.timedelta(days=5)),
        ("Gamma", "aldrei séð", "u/c1", d0 + dt.timedelta(days=4)),
    ]
    m = spark.createDataFrame(
        rows, "name string, title string, url string, ts date")
    got = {r["name"]: (r["title"], r["url"])
           for r in recent_persons(m, limit=2).collect()}
    assert set(got) == {"Alpha", "Beta"}
    # short beats long; the post-cutoff longer-short title is ignored
    assert got["Alpha"] == ("stutt", "u/a3")
    assert got["Beta"] == ("ráðherra", "u/b1")
    # among over-long titles only, the SHORTER wins (scan order kept)
    m2 = spark.createDataFrame(
        [("Alpha", LONG_90, "u/1", d0), ("Alpha", LONG_70, "u/2", d0)],
        "name string, title string, url string, ts date")
    got2 = recent_persons(m2, limit=2).collect()[0]
    assert got2["title"] == LONG_70


def test_top_persons_window_dedup_and_name_filter(spark):
    import datetime as dt

    from greynirserver_spark.operators.people import top_persons

    d1 = dt.date(2026, 6, 30)
    rows = [
        # two-part name, 3 distinct articles (one duplicated row)
        ("Jón Jónsson", "kk", "u/1", d1),
        ("Jón Jónsson", "kk", "u/1", d1),
        ("Jón Jónsson", "kk", "u/2", d1 - dt.timedelta(days=1)),
        ("Jón Jónsson", "kk", "u/3", d1 - dt.timedelta(days=2)),
        # outside the window
        ("Jón Jónsson", "kk", "u/4", d1 - dt.timedelta(days=40)),
        # mononym: filtered by the two-name-parts rule
        ("Sturla", "kk", "u/5", d1),
        ("Anna Pála", "kvk", "u/6", d1),
    ]
    w = spark.createDataFrame(
        rows, "name string, gender string, url string, ts date")
    got = [(r["name"], r["gender"], r["n_articles"])
           for r in top_persons(w, limit=10, days=30).collect()]
    assert got == [("Jón Jónsson", "kk", 3), ("Anna Pála", "kvk", 1)]


def test_prioritize_titles_matches_reference_algorithm(spark):
    """Pin the relational scorer against a pure-Python transliteration
    of the reference loop (queries/builtin.py:225-335) with the same
    determinism anchors (now = max ts, answer tiebreaks)."""
    import datetime as dt
    import math

    from greynirserver_spark.operators.titles import prioritize_titles

    d = lambda n: dt.date(2026, 6, 1) + dt.timedelta(days=n)
    rows = []
    # forseti: 6 mentions (only newest 5 count), contained in two others
    for i in range(6):
        rows.append(("forseti landsins", f"u/f{i}", d(30 - i)))
    # ex-variant contains forseti -> ex branch
    rows.append(("fyrrverandi forseti landsins", "u/x1", d(29)))
    rows.append(("fyrrverandi forseti landsins", "u/x2", d(5)))
    # another container (not ex)
    rows.append(("varaforseti", "u/v1", d(28)))  # NOT whole-word contained
    rows.append(("forseti landsins og ritari", "u/w1", d(27)))
    rows.append(("forseti landsins og ritari", "u/w2", d(26)))
    # single mention -> /e penalty
    rows.append(("ritari", "u/r1", d(25)))
    # old mentions -> decay
    rows.append(("gjaldkeri stjórnarinnar", "u/g1", d(0)))
    rows.append(("gjaldkeri stjórnarinnar", "u/g2", d(1)))
    mentions = spark.createDataFrame(
        rows, "answer string, url string, ts date")

    # ---- pure-python reference mirror ----
    rd = {}
    for a, u, t in rows:
        rd.setdefault(a, {})[u] = t
    now = max(t for _, _, t in rows)

    def mw_of(arts):
        newest = sorted(arts.items(), key=lambda kv: (-kv[1].toordinal(),
                                                      kv[0]))[:5]
        w = sum(14.0 / (1.0 + math.log(max(0, (now - t).days) + 4, 4))
                for _, t in newest)
        return w / math.e if len(newest) == 1 else w

    def contained(n, h):
        return (" " + n.lower() + " ") in (" " + h.lower() + " ")

    def is_ex(s):
        return any(contained(x, s) for x in
                   ("fyrrverandi", "fv.", "fráfarandi", "áður",
                    "þáverandi", "fyrrum"))

    mws = {a: mw_of(arts) for a, arts in rd.items()}
    scores = {a: mws[a] + min(math.e * math.log(len(a)), 10.0)
              for a in rd}
    rl = sorted(rd, key=lambda a: (-round(mws[a], 6), a))
    for i in range(len(rl) - 1):
        ri, crosses, ex_i = rl[i], 0, is_ex(rl[i])
        for j in range(i + 1, len(rl)):
            rj = rl[j]
            if contained(rj, ri) or contained(ri, rj):
                crosses += 1
                ex_j = is_ex(rj)
                if ex_i and not ex_j:
                    scores[ri] += mws[rj] * 0.35
                else:
                    scores[rj] += mws[ri] * 0.20 / crosses
                if ex_j and not ex_i:
                    scores[rj] += mws[ri] * 0.35
                else:
                    scores[ri] += mws[rj] * 0.20 / crosses
                if crosses == 5:
                    break
    order = sorted(rd, key=lambda a: (-round(scores[a], 4), a))
    if len(order) > 4 and len(rd[order[4]]) > 1:
        order = [a for a in order if len(rd[a]) > 1]
    want = [
        (k + 1, a, round(scores[a], 4), len(rd[a]),
         min(sorted(rd[a].items(), key=lambda kv: (-kv[1].toordinal(),
                                                   kv[0]))[:1])[0])
        for k, a in enumerate(order[:20])
    ]

    got = [(r["rank"], r["answer"], r["score"], r["n_articles"],
            r["newest_url"])
           for r in prioritize_titles(mentions).collect()]
    assert got == want


def test_people_and_titles_plans(spark, tmp_path):
    """recent_persons bounds the scan with a distributed top-2N
    (TakeOrderedAndProject) and prioritize_titles broadcasts the
    pairwise containment join — no cartesian product anywhere."""
    import datetime as dt

    from greynirserver_spark.operators.people import recent_persons
    from greynirserver_spark.operators.titles import prioritize_titles

    rows = [(f"Nafn {i % 7}", f"titill {i}", f"u/{i}",
             dt.date(2026, 1, 1) + dt.timedelta(days=i % 50))
            for i in range(300)]
    m = spark.createDataFrame(
        rows, "name string, title string, url string, ts date")
    p1 = recent_persons(m, limit=5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in p1
    assert "CartesianProduct" not in p1
    t = m.selectExpr("title as answer", "url", "ts")
    p2 = prioritize_titles(t)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in p2
    assert "CartesianProduct" not in p2


def test_icelandic_asciify_matches_reference(spark):
    """Byte-level pin against a transliteration of utility.py:147-184."""
    from greynirserver_spark.functions.strings import icelandic_asciify

    cases = [
        "Þórður á Húsavík í Öræfum",
        "ÆÐI — þýðing æviskrár",
        "óbreytt ascii line 123",
        "emoji \U0001F600 og grísk βήτα",
    ]

    def ref(text):
        table = {"ð": "d", "Ð": "D", "á": "a", "Á": "A", "ú": "u",
                 "Ú": "U", "í": "i", "Í": "I", "é": "e", "É": "E",
                 "þ": "th", "Þ": "TH", "ó": "o", "Ó": "O", "ý": "y",
                 "Ý": "Y", "ö": "o", "Ö": "O", "æ": "ae", "Æ": "AE"}
        t = text
        for k, v in table.items():
            t = t.replace(k, v)
        return t.encode("ascii", "ignore").decode()

    df = spark.createDataFrame([(c,) for c in cases], "text string")
    got = [r[0] for r in
           df.select(icelandic_asciify(F.col("text"))).collect()]
    assert got == [ref(c) for c in cases]


def test_router_whois_route(spark, tmp_path):
    import datetime as dt

    from greynirserver_spark.corpus import generate_pages
    from greynirserver_spark.plans.lineage import build_index_checkpointed
    from greynirserver_spark.query.router import Router

    store = build_index_checkpointed(
        spark, generate_pages(spark, 120), str(tmp_path / "s"), n_shards=4)
    d0 = dt.date(2026, 5, 1)
    mentions = spark.createDataFrame(
        [("Jón Jónsson", "forsætisráðherra", "u/1", d0),
         ("Jón Jónsson", "forsætisráðherra", "u/2", d0),
         ("Jón Jónsson", "þingmaður", "u/3", d0),
         ("Anna Pála", "ritstjóri", "u/4", d0)],
        "name string, title string, url string, ts date")
    r = Router(spark, store, person_mentions=mentions)
    ans = r.execute("hver er Jón Jónsson", k=5)
    assert ans.qtype == "Person"
    rows = ans.df.collect()
    assert [x["answer"] for x in rows][:1] == ["forsætisráðherra"]
    assert all(x["answer"] != "ritstjóri" for x in rows)
    # without a persons table the pattern falls through to Search
    r2 = Router(spark, store)
    assert r2.execute("hver er Jón Jónsson", k=5).qtype == "Search"


def test_router_whatis_route(spark, tmp_path):
    """End-to-end: definitions EXTRACTED from the indexed pages' own
    text feed the what-is qtype."""
    from greynirserver_spark.corpus import generate_pages
    from greynirserver_spark.functions.ner import extract_definitions
    from greynirserver_spark.plans.lineage import build_index_checkpointed
    from greynirserver_spark.query.router import Router

    pages = generate_pages(spark, 120)
    store = build_index_checkpointed(
        spark, pages, str(tmp_path / "s"), n_shards=4)
    # plant definition sentences into extracted text keyed to REAL
    # doc ids so the doc_map join resolves
    base = Router(spark, store)
    ids = [r["doc_id"] for r in base.doc_map.orderBy("doc_id")
           .limit(3).collect()]
    texts = spark.createDataFrame(
        [(ids[0], "Alþingi er elsta löggjafarsamkoma heims."),
         (ids[1], "Alþingi er löggjafarsamkoma heims og fleira."),
         (ids[2], "Esjan er fjall við Reykjavík.")],
        "doc_id long, text string")
    defs = extract_definitions(texts)
    r = Router(spark, store, entity_definitions=defs)
    ans = r.execute("hvað er Alþingi", k=5)
    assert ans.qtype == "Entity"
    rows = ans.df.collect()
    assert len(rows) == 2
    assert all("löggjafarsamkoma" in x["answer"] for x in rows)
    assert r.execute("hvað er Esjan", k=5).df.collect()[0]["answer"] \
        == "fjall við Reykjavík"
    # no definitions table -> falls through to Search
    assert base.execute("hvað er Alþingi", k=5).qtype == "Search"


def test_rrf_fuse_hand_computed(spark):
    """RRF matches the hand formula: docs in both lists sum both
    contributions, singletons get one, ties break doc_id asc."""
    from greynirserver_spark.operators.hybrid import rrf_fuse

    lex = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "rank long, doc_id long")
    dense = spark.createDataFrame(
        [(1, 20), (2, 40), (3, 10)], "rank long, doc_id long")
    out = rrf_fuse([lex, dense], key="doc_id", k=10, k_rrf=60).collect()
    got = {r["doc_id"]: r["rrf"] for r in out}
    exp = {
        10: round(1 / 61 + 1 / 63, 6),
        20: round(1 / 62 + 1 / 61, 6),
        30: round(1 / 63, 6),
        40: round(1 / 62, 6),
    }
    assert got == exp
    # ordering: fused score desc, doc_id asc; ranks 1..n
    assert [r["doc_id"] for r in out] == [20, 10, 40, 30]
    assert [r["rank"] for r in out] == [1, 2, 3, 4]
    # k cuts, rank stays dense
    cut = rrf_fuse([lex, dense], key="doc_id", k=2).collect()
    assert [(r["rank"], r["doc_id"]) for r in cut] == [(1, 20), (2, 10)]


def test_rrf_fuse_exact_tie_breaks_on_doc_id(spark):
    from greynirserver_spark.operators.hybrid import rrf_fuse

    a = spark.createDataFrame([(1, 7), (2, 5)], "rank long, doc_id long")
    b = spark.createDataFrame([(1, 5), (2, 7)], "rank long, doc_id long")
    out = rrf_fuse([a, b], key="doc_id", k=5).collect()
    # both docs score 1/61 + 1/62 — identical; doc 5 wins on id
    assert [r["doc_id"] for r in out] == [5, 7]
    assert out[0]["rrf"] == out[1]["rrf"]


def test_hybrid_documents_topk_fuses_both_engines(spark):
    """The hybrid list contains lexical-only and dense-only winners and
    the fused scores reproduce the two component ranks exactly."""
    import pyspark.sql.functions as F

    from greynirserver_spark.operators.ann import cosine_topk_bruteforce
    from greynirserver_spark.operators.hybrid import hybrid_documents_topk
    from greynirserver_spark.operators.textops import bm25_documents_topk

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qvec = [float(x) for x in emb.where("vec_id = 0")
            .select("embedding").first()[0]]
    terms = ["spark", "join", "window", "stream"]

    # excluded doc 0 must vanish from BOTH lists (dense-only exclusion
    # would let the source doc re-enter through its lexical rank)
    lex_rows = [r for r in
                bm25_documents_topk(docs, terms, k=51).collect()
                if r["doc_id"] != 0][:50]
    lex = {r["doc_id"]: i + 1 for i, r in enumerate(lex_rows)}
    den = {r["vec_id"]: r["rank"] for r in
           cosine_topk_bruteforce(emb, qvec, k=50,
                                  exclude_vec_id=0).collect()}
    out = hybrid_documents_topk(
        docs, emb, terms, qvec, k=10, fuse_depth=50, exclude_doc_id=0
    ).collect()
    assert len(out) == 10
    assert all(r["doc_id"] != 0 for r in out)
    for r in out:
        exp = round(
            (1.0 / (60 + lex[r["doc_id"]]) if r["doc_id"] in lex else 0.0)
            + (1.0 / (60 + den[r["doc_id"]]) if r["doc_id"] in den else 0.0),
            6,
        )
        assert r["rrf"] == exp
    # monotone non-increasing fused score down the page
    scores = [r["rrf"] for r in out]
    assert scores == sorted(scores, reverse=True)
