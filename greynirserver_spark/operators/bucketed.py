"""Crash-safe hash-bucketed count stores (in-place MERGE substrate).

Used by the trigram store (analytics.py::merge_trigram_counts, the
reference's per-row ``ON CONFLICT (t1,t2,t3) DO UPDATE SET frequency =
frequency + new``, db/models.py:586-609) — the right shape when a
batch's key set is BOUNDED, so the merge genuinely touches few
buckets. For unbounded batch keys (an index append's term deltas:
thousands of distinct terms touch every bucket, making the merge
O(vocabulary) in disguise) use the log-structured store in
operators/runstore.py instead — measured comparison in
scripts/append_stats_scaling.py. Layout and protocol:

* layout: ``bkt=N/`` directories, N = ``pmod(xxhash64(keys), n_buckets)``;
  a batch MERGE reads, sums and swaps ONLY the buckets its keys hash
  into — O(batch + touched buckets), never O(store).
* crash safety (round-3 advice): the swap loop is preceded by a
  durable **merge intent** (``_merge_intent-*.json`` in the store root:
  batch id + staging path + touched buckets). Every reader and every
  subsequent merge first calls :func:`reconcile_bucketed_store`, which
  ROLLS FORWARD any open intent — the staged merged buckets are
  authoritative once the intent exists, so recovery is: finish the
  renames, record the batch in the ledger, drop the intent. A crash at
  any point (mid staging write, between intent and swap, mid swap,
  mid reconcile) leaves the store either fully pre-merge or fully
  post-merge from a reader's perspective after reconcile.
* replay safety: merges carry an optional ``batch_id``; completed ids
  are recorded as marker files under ``_merged/`` (atomic create)
  BEFORE the swap loop but AFTER the intent — so "in ledger" implies
  "reconcile will complete it", and re-running a crashed batch is a
  no-op instead of a double count.
* no ``bkt=N.old`` windows: the old protocol's rename-aside left dirs
  that partition discovery read back as partition value ``'N.old'``;
  the new swap is rmtree + rename (roll-forward makes the old bucket
  bytes unnecessary once the intent is durable), and reconcile deletes
  any legacy ``*.old`` leftovers before a read.

Underscore-prefixed files/dirs inside the store root are invisible to
Spark's partition discovery, so the intent/ledger metadata can live
next to the data. Single-writer per store is assumed (the reference's
cron is single-writer too); readers are concurrency-safe against a
crashed writer, not a live one.

On Iceberg the whole protocol is one ``MERGE INTO`` commit; this module
is the parquet-sandbox equivalent with the same observable semantics.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "merge_bucketed_counts",
    "reconcile_bucketed_store",
    "load_bucketed",
    "read_buckets",
]


def _bdir(root: str, b: int) -> str:
    return os.path.join(root, f"bkt={b}")


def _intent_files(root: str) -> List[str]:
    if not os.path.isdir(root):
        return []
    return sorted(
        os.path.join(root, fn)
        for fn in os.listdir(root)
        if fn.startswith("_merge_intent-") and fn.endswith(".json")
    )


def _ledger_has(root: str, batch_id: str) -> bool:
    return os.path.exists(os.path.join(root, "_merged", f"{batch_id}.json"))


def _ledger_add(root: str, batch_id: str) -> None:
    d = os.path.join(root, "_merged")
    os.makedirs(d, exist_ok=True)
    final = os.path.join(d, f"{batch_id}.json")
    if os.path.exists(final):
        return
    tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        json.dump({"batch_id": batch_id}, f)
    os.rename(tmp, final)


def reconcile_bucketed_store(store_path: str) -> int:
    """Roll forward any crashed merge; drop stray staging dirs and
    legacy ``*.old`` bucket dirs. Idempotent — a crash mid-reconcile
    re-runs the same renames. Returns the number of open intents
    completed."""
    completed = 0
    referenced: set = set()
    for path in _intent_files(store_path):
        with open(path) as f:
            intent = json.load(f)
        staging = intent["staging"]
        referenced.add(os.path.abspath(staging))
        for b in intent["touched"]:
            src, dst = _bdir(staging, int(b)), _bdir(store_path, int(b))
            if os.path.isdir(src):
                if os.path.isdir(dst):
                    shutil.rmtree(dst)
                os.rename(src, dst)
        if intent.get("batch_id"):
            _ledger_add(store_path, intent["batch_id"])
        os.remove(path)
        shutil.rmtree(staging, ignore_errors=True)
        completed += 1
    if os.path.isdir(store_path):
        # legacy rename-aside leftovers: partition discovery would read
        # bkt=N.old back as partition value 'N.old' — purge before reads
        for fn in os.listdir(store_path):
            if fn.endswith(".old"):
                shutil.rmtree(os.path.join(store_path, fn),
                              ignore_errors=True)
        # staging dirs with no intent: the writer died before its intent
        # was durable, so the store is untouched — the half-written
        # staging is garbage (single-writer assumption)
        parent = os.path.dirname(os.path.abspath(store_path))
        base = os.path.basename(os.path.abspath(store_path))
        for fn in os.listdir(parent):
            if fn.startswith(base + ".staging-"):
                p = os.path.join(parent, fn)
                if os.path.abspath(p) not in referenced:
                    shutil.rmtree(p, ignore_errors=True)
    return completed


def load_bucketed(spark, store_path: str) -> DataFrame:
    """Reconcile-then-read: the only safe way to open a bucketed count
    store (a reader racing a crashed writer must not see a half-swapped
    bucket set)."""
    reconcile_bucketed_store(store_path)
    spark.catalog.refreshByPath(store_path)
    return spark.read.parquet(store_path)


def read_buckets(spark, store_path: str, buckets: Sequence[int]) -> Optional[DataFrame]:
    """Read ONLY the given bucket directories (reconciled first).
    Returns None when none of them exist yet."""
    reconcile_bucketed_store(store_path)
    dirs = [_bdir(store_path, b) for b in buckets if os.path.isdir(_bdir(store_path, b))]
    if not dirs:
        return None
    spark.catalog.refreshByPath(store_path)
    return spark.read.parquet(*dirs)


def merge_bucketed_counts(
    spark,
    store_path: str,
    delta: DataFrame,
    key_cols: Sequence[str],
    sum_cols: Sequence[str],
    n_buckets: int = 64,
    batch_id: Optional[str] = None,
    fail_after_buckets: Optional[int] = None,
    hash_cols: Optional[Sequence[str]] = None,
) -> Optional[List[int]]:
    """MERGE *delta* (key_cols..., sum_cols...) into the bucketed store.

    *hash_cols* (default: *key_cols*) picks which key columns feed the
    bucket hash — bucketing a composite key on a PREFIX keeps all rows
    of that prefix in one bucket, so a touched-buckets read sees the
    complete row set for every prefix value in the batch (used by the
    positional block-count store: (term, shard) rows bucketed by term).

    Returns the sorted touched-bucket list, or ``None`` when *batch_id*
    was already merged (idempotent replay). *fail_after_buckets* injects
    a crash mid-swap for recovery tests.
    """
    key_cols = list(key_cols)
    sum_cols = list(sum_cols)
    reconcile_bucketed_store(store_path)
    if batch_id is not None and _ledger_has(store_path, batch_id):
        if os.path.isdir(store_path):
            spark.catalog.refreshByPath(store_path)
        return None

    bkt_expr = F.pmod(
        F.xxhash64(*(hash_cols or key_cols)), F.lit(n_buckets)
    ).cast("int")
    delta = delta.withColumn("bkt", bkt_expr)
    touched = sorted(
        r["bkt"] for r in delta.select("bkt").distinct().collect()
    )
    if not touched:
        if batch_id is not None:
            os.makedirs(store_path, exist_ok=True)
            _ledger_add(store_path, batch_id)
        return touched

    os.makedirs(store_path, exist_ok=True)
    existing_dirs = [b for b in touched if os.path.isdir(_bdir(store_path, b))]
    if existing_dirs:
        existing = spark.read.parquet(
            *[_bdir(store_path, b) for b in existing_dirs]
        ).withColumn("bkt", bkt_expr)
        merged = (
            existing.unionByName(delta)
            .groupBy(*key_cols, "bkt")
            .agg(*[F.sum(c).cast("long").alias(c) for c in sum_cols])
        )
    else:
        merged = delta
    merged = merged.select(*key_cols, *sum_cols, "bkt")

    staging = store_path + f".staging-{uuid.uuid4().hex[:8]}"
    merged.write.partitionBy("bkt").mode("overwrite").parquet(staging)

    # durable intent AFTER the staging write completes, BEFORE any swap:
    # from here on the staged buckets are authoritative and reconcile
    # rolls the merge forward
    intent = dict(batch_id=batch_id, staging=staging,
                  touched=[int(b) for b in touched])
    tmp = os.path.join(store_path, f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        json.dump(intent, f)
    intent_path = os.path.join(
        store_path, f"_merge_intent-{uuid.uuid4().hex[:12]}.json"
    )
    os.rename(tmp, intent_path)
    if batch_id is not None:
        _ledger_add(store_path, batch_id)

    swapped = 0
    for b in touched:
        src, dst = _bdir(staging, b), _bdir(store_path, b)
        if os.path.isdir(src):
            if os.path.isdir(dst):
                shutil.rmtree(dst)
            os.rename(src, dst)
        swapped += 1
        if fail_after_buckets is not None and swapped >= fail_after_buckets:
            raise RuntimeError(
                f"injected merge failure after {swapped} bucket swaps"
            )
    os.remove(intent_path)
    shutil.rmtree(staging, ignore_errors=True)
    spark.catalog.refreshByPath(store_path)
    return touched
