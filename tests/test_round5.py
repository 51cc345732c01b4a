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
