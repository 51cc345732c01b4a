"""Deterministic training shuffle: partition-invariance (the property
orderBy(rand(seed)) lacks), epoch re-permutation, shard balance, and
the no-global-sort plan shape."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from greynirserver_spark.operators.shuffling import (
    training_shards,
    training_shuffle,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id"
    )


def _perm(df):
    return [
        (r["doc_id"], r["shard"], r["pos"])
        for r in sorted(
            df.collect(), key=lambda r: (r["shard"], r["pos"])
        )
    ]


def test_shuffle_is_partition_invariant(spark):
    docs = _docs(spark)
    a = _perm(training_shards(docs.repartition(3), seed=7, n_shards=4))
    b = _perm(training_shards(docs.repartition(17), seed=7, n_shards=4))
    c = _perm(training_shards(docs.coalesce(1), seed=7, n_shards=4))
    assert a == b == c
    # ...which Spark's own rand(seed) ordering is NOT: it reseeds per
    # partition, so this test documents why md5 keys are used instead


def test_epoch_seed_repermutes(spark):
    docs = _docs(spark)
    e0 = _perm(training_shards(docs, seed=0, n_shards=4))
    e1 = _perm(training_shards(docs, seed=1, n_shards=4))
    assert e0 != e1
    # same doc population either way
    assert {d for d, _, _ in e0} == {d for d, _, _ in e1}
    # and each epoch is internally dense: per shard, pos = 1..n
    for perm in (e0, e1):
        by_shard = {}
        for _, s, p in perm:
            by_shard.setdefault(s, []).append(p)
        for s, ps in by_shard.items():
            assert sorted(ps) == list(range(1, len(ps) + 1))


def test_shards_are_balanced_and_exhaustive(spark):
    docs = _docs(spark)
    n = docs.count()
    rows = training_shards(docs, seed=3, n_shards=8).collect()
    assert len(rows) == n
    sizes = {}
    for r in rows:
        assert 0 <= r["shard"] < 8
        sizes[r["shard"]] = sizes.get(r["shard"], 0) + 1
    # md5 uniformity: no shard dominates (loose 3x bound at n=500)
    assert max(sizes.values()) <= 3 * (n // 8)
    assert len(sizes) == 8


def test_no_global_sort_in_shard_plan(spark):
    """The shard plan's only exchange is hash-by-shard for the window;
    a range-partitioned global sort would mean the total order was
    materialized, which the design avoids."""
    docs = _docs(spark)
    plan = (
        training_shards(docs, seed=1, n_shards=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "rangepartitioning" not in plan.lower()
    assert "CartesianProduct" not in plan


def test_training_shuffle_key_stability(spark):
    docs = _docs(spark)
    keyed = training_shuffle(docs, seed=42)
    row = keyed.where(F.col("doc_id") == 7).first()
    import hashlib

    assert row["shuffle_key"] == hashlib.md5(b"42:7").hexdigest()


def test_bad_n_shards_rejected(spark):
    with pytest.raises(ValueError):
        training_shards(_docs(spark), seed=0, n_shards=0)


def test_split_disjoint_exhaustive_and_stable(spark):
    from greynirserver_spark.operators.shuffling import (
        train_val_test_split,
    )

    docs = _docs(spark)
    n = docs.count()
    out = train_val_test_split(docs, (0.8, 0.1, 0.1), seed=5)
    rows = out.collect()
    assert len(rows) == n
    sizes = {}
    for r in rows:
        sizes[r["split"]] = sizes.get(r["split"], 0) + 1
    assert set(sizes) <= {"train", "val", "test"}
    # roughly proportional at n=500
    assert sizes["train"] > 0.7 * n
    assert 0 < sizes.get("val", 0) < 0.2 * n
    assert 0 < sizes.get("test", 0) < 0.2 * n
    # partition-invariant: identical assignment at other parallelism
    again = {
        r["doc_id"]: r["split"]
        for r in train_val_test_split(
            docs.repartition(13), (0.8, 0.1, 0.1), seed=5
        ).collect()
    }
    assert again == {r["doc_id"]: r["split"] for r in rows}
    # superset stability: membership of shared ids is unchanged when
    # the corpus grows (the property samplesplit-by-rank lacks)
    half = {
        r["doc_id"]: r["split"]
        for r in train_val_test_split(
            docs.where(F.col("doc_id") < 250), (0.8, 0.1, 0.1), seed=5
        ).collect()
    }
    full = {r["doc_id"]: r["split"] for r in rows}
    assert all(full[d] == s for d, s in half.items())
    # a different seed reassigns
    other = {
        r["doc_id"]: r["split"]
        for r in train_val_test_split(
            docs, (0.8, 0.1, 0.1), seed=6
        ).collect()
    }
    assert other != full


def test_split_validates_fracs(spark):
    from greynirserver_spark.operators.shuffling import (
        train_val_test_split,
    )

    docs = _docs(spark)
    with pytest.raises(ValueError):
        train_val_test_split(docs, (0.5, 0.1, 0.1))
    with pytest.raises(ValueError):
        train_val_test_split(docs, (1.2, -0.1, -0.1))
