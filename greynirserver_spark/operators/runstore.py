"""Log-structured (LSM-style) count stores: write-only O(batch) appends.

Round-4 finding (measured in ``scripts/append_stats_scaling.py``): any
in-place MERGE — including a hash-bucketed "touched buckets only" one —
degenerates to an O(store) read+rewrite per batch once the batch's key
set touches every partition, and a realistic document batch's term or
trigram delta does exactly that (thousands of distinct keys vs dozens
of buckets). No bucketing constant fixes it; the scalable shape is the
one log-structured engines use:

* ``<root>/base-<epoch>/`` — a compaction's aggregated counts; the
  HIGHEST epoch is current, older bases are swept lazily,
* ``<root>/run=<epoch>-<id>/`` — ONE directory per append since that
  compaction; an append WRITES its delta and reads nothing,
* readers aggregate current base ∪ current-epoch runs on the fly (the
  exact mergeable view; full-view consumers are build/rebuild-time),
* compaction (at segment rebuild) folds everything into
  ``base-<epoch+1>`` — the single atomic rename that publishes it also
  makes every older base and run invisible (epoch mismatch), so there
  is no double-count or data-loss window; stale dirs are swept lazily.

Crash safety: every publish is one atomic POSIX rename of a fully
written staging dir; a run's id doubles as the replay key (appending
an existing id is a no-op) and the rollback key (a crashed append's
run is removed surgically by id). On Iceberg: append = fast-append
snapshot, compact = rewrite_data_files, epoch = snapshot lineage.
"""

from __future__ import annotations

import os
import shutil
import uuid
from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "append_run",
    "load_counts",
    "load_rows",
    "load_runs_only",
    "compact",
    "current_epoch",
    "has_runs",
    "remove_run",
    "run_count",
]


def has_runs(root: str) -> bool:
    """True when appends have landed since the last compaction — the
    serving layer uses this to decide whether baked block stats are
    exact (no runs) or need the query-time idf rescale."""
    return bool(_run_dirs(root, current_epoch(root)))


def run_count(root: str) -> int:
    """Number of current-epoch runs — the auto-compaction trigger:
    every read of the exact view unions this many directories, so a
    store appended thousands of times between segment rebuilds needs a
    standalone compaction cadence (round-4 verdict item #3)."""
    return len(_run_dirs(root, current_epoch(root)))


def _applied_marker(root: str, rid: str) -> str:
    return os.path.join(root, "_applied", rid)


def _mark_applied(root: str, rid: str) -> None:
    d = os.path.join(root, "_applied")
    os.makedirs(d, exist_ok=True)
    try:
        with open(os.path.join(d, rid), "x"):
            pass
    except FileExistsError:
        pass


def current_epoch(root: str) -> int:
    """Highest published base epoch (0 = no compaction yet)."""
    best = 0
    if os.path.isdir(root):
        for d in os.listdir(root):
            if d.startswith("base-"):
                try:
                    best = max(best, int(d.split("-", 1)[1]))
                except ValueError:
                    pass
    return best


def _base_dir(root: str, epoch: int) -> Optional[str]:
    p = os.path.join(root, f"base-{epoch}")
    return p if os.path.isdir(p) else None


def _run_dirs(root: str, epoch: int) -> List[str]:
    if not os.path.isdir(root):
        return []
    pre = f"run={epoch}-"
    return sorted(
        os.path.join(root, d)
        for d in os.listdir(root)
        if d.startswith(pre)
    )


def _sweep_stale(root: str, epoch: int) -> None:
    """Drop pre-compaction bases/runs and orphaned staging dirs — all
    invisible already; removal is pure space reclamation. One epoch of
    GRACE is kept (epoch-1): a reader that resolved its file listing
    just before a compaction landed may still lazily execute against
    the previous epoch's dirs, and deleting them under that plan fails
    the read (Iceberg's analog: snapshot expiration with a retention
    window). Epochs older than the grace window are gone — two
    compactions always separate a listing from its deletion."""
    if not os.path.isdir(root):
        return
    keep = {epoch, epoch - 1}
    for d in os.listdir(root):
        p = os.path.join(root, d)
        if d.startswith(".staging-"):
            shutil.rmtree(p, ignore_errors=True)
        elif d.startswith("base-"):
            try:
                if int(d.split("-", 1)[1]) not in keep:
                    shutil.rmtree(p, ignore_errors=True)
            except ValueError:
                pass
        elif d.startswith("run="):
            try:
                e = int(d.split("=", 1)[1].split("-", 1)[0])
            except ValueError:
                e = -1
            if e not in keep:
                shutil.rmtree(p, ignore_errors=True)


def append_run(
    spark, root: str, delta: DataFrame, run_id: Optional[str] = None
) -> bool:
    """Append *delta* as one new run — O(batch) write, ZERO read of the
    store. Returns False on idempotent replay: *run_id* already visible
    in the current epoch, OR already recorded in the ``_applied``
    manifest — the latter catches a batch replayed AFTER an intervening
    compaction folded its run into the base, where the run-dir check
    alone would double-count (round-4 advice). Markers are one empty
    file per applied run id, written after the run's publishing rename
    and adopted by :func:`compact` for any run it folds, so the only
    unmarked-but-folded window is a crash between the rename and the
    marker followed by a compaction before the retry — two stacked
    failures under the store's single-writer contract. On Iceberg the
    manifest is the WAP id / snapshot summary property."""
    os.makedirs(root, exist_ok=True)
    epoch = current_epoch(root)
    rid = run_id or uuid.uuid4().hex[:12]
    final = os.path.join(root, f"run={epoch}-{rid}")
    if os.path.isdir(final) or os.path.exists(_applied_marker(root, rid)):
        return False
    staging = os.path.join(root, f".staging-{uuid.uuid4().hex[:8]}")
    delta.write.mode("overwrite").parquet(staging)
    os.rename(staging, final)
    _mark_applied(root, rid)
    spark.catalog.refreshByPath(root)
    return True


def remove_run(spark, root: str, run_id: str) -> bool:
    """Surgically roll back one append's run (crash recovery — the run
    id is the append intent id). Clears the ``_applied`` marker too so
    a later legitimate re-append of the same id is not refused."""
    if not os.path.isdir(root):
        return False
    removed = False
    for d in list(os.listdir(root)):
        if d.startswith("run=") and d.endswith(f"-{run_id}"):
            shutil.rmtree(os.path.join(root, d), ignore_errors=True)
            removed = True
    if removed:
        try:
            os.remove(_applied_marker(root, run_id))
        except FileNotFoundError:
            pass
        spark.catalog.refreshByPath(root)
    return removed


def _read_parts(spark, root: str, with_base: bool) -> Optional[DataFrame]:
    epoch = current_epoch(root)
    _sweep_stale(root, epoch)
    parts = _run_dirs(root, epoch)
    base = _base_dir(root, epoch)
    if with_base and base:
        parts = [base] + parts
    if not parts:
        return None
    spark.catalog.refreshByPath(root)
    return spark.read.parquet(*parts)


def load_rows(spark, root: str) -> Optional[DataFrame]:
    """Raw (un-aggregated) union of base ∪ current-epoch runs — for
    stores whose rows are facts, not mergeable counts (e.g. the MinHash
    signature store). None when empty."""
    return _read_parts(spark, root, with_base=True)


def load_counts(
    spark, root: str, key_cols: Sequence[str], sum_cols: Sequence[str]
) -> Optional[DataFrame]:
    """The exact aggregated view: base ∪ current-epoch runs, re-summed.
    None when the store is empty."""
    df = _read_parts(spark, root, with_base=True)
    if df is None:
        return None
    if not _run_dirs(root, current_epoch(root)):
        return df.select(*key_cols, *sum_cols)  # base is already aggregated
    return (
        df.groupBy(*key_cols)
        .agg(*[F.sum(c).cast("long").alias(c) for c in sum_cols])
    )


def load_runs_only(
    spark, root: str, key_cols: Sequence[str], sum_cols: Sequence[str]
) -> Optional[DataFrame]:
    """Aggregated counts of the CURRENT-epoch runs alone (the
    since-last-compaction delta — bounded by the compaction cadence,
    never vocabulary-sized)."""
    df = _read_parts(spark, root, with_base=False)
    if df is None:
        return None
    return (
        df.groupBy(*key_cols)
        .agg(*[F.sum(c).cast("long").alias(c) for c in sum_cols])
    )


def compact(spark, root: str, counts: DataFrame) -> None:
    """Publish *counts* as ``base-<epoch+1>`` with one atomic rename —
    every older base and run becomes invisible at that instant (epoch
    mismatch), so a crash at any point leaves either the old store or
    the new one, never a mix. Every folded run's id is adopted into the
    ``_applied`` manifest (belt and braces for a run published by an
    append that crashed before writing its own marker)."""
    os.makedirs(root, exist_ok=True)
    old_epoch = current_epoch(root)
    folded = [
        os.path.basename(d).split("-", 1)[1]
        for d in _run_dirs(root, old_epoch)
    ]
    new_epoch = old_epoch + 1
    staging = os.path.join(root, f".staging-{uuid.uuid4().hex[:8]}")
    counts.write.mode("overwrite").parquet(staging)
    os.rename(staging, os.path.join(root, f"base-{new_epoch}"))
    for rid in folded:
        _mark_applied(root, rid)
    _sweep_stale(root, new_epoch)
    spark.catalog.refreshByPath(root)
