"""Incremental MERGE patterns: trigram accumulate and bucketed page
upsert (reference ON CONFLICT / delete+reinsert, re-expressed as
append-then-merge over immutable storage)."""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import pandas as pd
from pyspark.sql import functions as F

from greynirserver_spark.corpus import generate_pages_pdf
from greynirserver_spark.operators.analytics import (
    merge_trigram_counts,
    word_trigram_counts,
)
from greynirserver_spark.sources.pages import upsert_pages


def test_trigram_merge_accumulates(spark, tmp_path):
    from greynirserver_spark.operators.analytics import (
        compact_trigram_counts,
        load_trigram_counts,
    )

    store = str(tmp_path / "trigrams")
    b1 = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "the quick brown cat")],
        "doc_id long, text string",
    )
    b2 = spark.createDataFrame(
        [(3, "the quick brown fox runs")], "doc_id long, text string"
    )
    merge_trigram_counts(spark, store, b1)
    merge_trigram_counts(spark, store, b2)
    got = {
        r.trigram: r.freq
        for r in load_trigram_counts(spark, store).collect()
    }
    want = {
        r.trigram: r.freq
        for r in word_trigram_counts(b1.unionByName(b2)).collect()
    }
    assert got == want
    assert got["the quick brown"] == 3  # accumulated across batches
    # compaction folds runs; the view is unchanged
    compact_trigram_counts(spark, store)
    got2 = {
        r.trigram: r.freq
        for r in load_trigram_counts(spark, store).collect()
    }
    assert got2 == want


def _bucket_mtimes(store):
    return {
        d: os.path.getmtime(os.path.join(store, d))
        for d in os.listdir(store)
        if d.startswith("bkt=")
    }


def test_upsert_pages_rewrites_only_touched_buckets(spark, tmp_path):
    store = str(tmp_path / "pages")
    p = generate_pages_pdf(80)
    n = upsert_pages(spark, store, spark.createDataFrame(p), n_buckets=8)
    assert n == 80
    before = _bucket_mtimes(store)
    assert len(before) > 1

    import time

    time.sleep(1.1)  # parquet mtime granularity
    # second batch: re-scrape 3 urls -> touches only their buckets
    rescrape = p.iloc[:3].copy()
    rescrape["text"] = "[[nýtt efni]]"
    n2 = upsert_pages(spark, store, spark.createDataFrame(rescrape),
                      n_buckets=8)
    assert n2 == 80  # replaced, not appended
    after = _bucket_mtimes(store)

    out = spark.read.parquet(store)
    assert out.where(F.col("text") == "[[nýtt efni]]").count() == 3
    assert out.select("url").distinct().count() == 80

    changed = {b for b in after if after[b] != before.get(b)}
    untouched = set(before) - changed
    assert untouched, "some buckets must be untouched"
    for b in untouched:
        assert after[b] == before[b], f"bucket {b} was rewritten"
    # at most 3 buckets may change for 3 urls
    assert len(changed) <= 3


def test_trigram_merge_is_run_write_only(spark, tmp_path):
    """The trigram store is log-structured: a batch appends ONE run
    and rewrites nothing (round-2's union+overwrite was O(store) per
    batch; round-3's hash buckets were O(store) in disguise — a real
    document batch's trigrams touch every bucket). Existing store
    files are untouched byte-for-byte; replay by batch id is a no-op."""
    from greynirserver_spark.operators.analytics import (
        load_trigram_counts,
    )

    store = str(tmp_path / "trigrams_lsm")
    base = spark.createDataFrame(
        [(i, f"orð{i} miðja{i} endir{i} auka{i}") for i in range(40)],
        "doc_id long, text string",
    )
    merge_trigram_counts(spark, store, base, batch_id="b0")

    def snapshot():
        out = {}
        for dirpath, _, files in os.walk(store):
            for fn in files:
                p = os.path.join(dirpath, fn)
                out[p] = os.path.getmtime(p)
        return out

    before = snapshot()
    batch = spark.createDataFrame(
        [(100, "orð0 miðja0 endir0")], "doc_id long, text string"
    )
    merge_trigram_counts(spark, store, batch, batch_id="b1")
    after = snapshot()
    # every pre-existing file untouched; the batch added new files only
    assert all(after.get(p) == t for p, t in before.items())
    assert len(after) > len(before)
    runs = [d for d in os.listdir(store) if d.startswith("run=")]
    assert any(d.endswith("-b1") for d in runs)

    got = {
        r.trigram: r.freq
        for r in load_trigram_counts(spark, store).collect()
    }
    assert got["orð0 miðja0 endir0"] == 2  # accumulated across batches
    full = base.unionByName(batch)
    want = {r.trigram: r.freq for r in word_trigram_counts(full).collect()}
    assert got == want

    # replay: the same batch id appends nothing and counts stay exact
    n = merge_trigram_counts(spark, store, batch, batch_id="b1")
    got2 = {
        r.trigram: r.freq
        for r in load_trigram_counts(spark, store).collect()
    }
    assert got2 == want and n == len(want)
