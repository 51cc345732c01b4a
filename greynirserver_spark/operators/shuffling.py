"""Deterministic global training shuffle + shard assignment.

A training run over a 100-TB corpus needs the documents in a
pseudo-random order that is (a) reproducible bit-for-bit across reruns
and engine versions, (b) independent of the input's partitioning and
arrival order, and (c) computable without any global coordination —
properties Spark's ``orderBy(rand(seed))`` does NOT give (rand(seed)
is seeded per-partition, so the permutation changes whenever the
partitioning does).

The key here is ``md5(seed || ':' || doc_id)``: a pure column
expression, identical in every engine that has md5 (the DuckDB oracle
recomputes it verbatim), stable under repartitioning, and changing the
seed re-permutes everything — one integer IS the epoch.

Shards come from the key's leading hex digits (not row_number over a
global sort): shard assignment is embarrassingly parallel, each shard
can be written by independent tasks, and no stage ever needs the
total order materialized. Within a shard, position = row_number over
(key, id) — a per-shard window, so the only shuffle in the whole plan
is the repartition-by-shard a writer wants anyway.

The reference has no notion of training output at all (its articles
feed a Postgres search index, scraper.py); this module is part of the
LLM-pipeline surface the engine adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

__all__ = [
    "shuffle_key",
    "training_shuffle",
    "training_shards",
    "train_val_test_split",
]

# leading hex chars of the md5 key used for shard assignment;
# 8 chars = 32 bits, supports n_shards up to ~4e9 with even spread
_SHARD_HEX_CHARS = 8


def shuffle_key(seed: int, id_col="doc_id"):
    """md5('<seed>:<id>') — the deterministic permutation key."""
    return F.md5(
        F.concat(F.lit(f"{int(seed)}:"), F.col(id_col).cast("string"))
    )


def training_shuffle(
    docs: DataFrame, seed: int = 0, id_col: str = "doc_id"
) -> DataFrame:
    """Input rows plus ``shuffle_key``; consuming them ordered by
    (shuffle_key, id) IS the epoch-``seed`` global shuffle. Kept lazy:
    a writer that shards (below) never pays a total sort; a consumer
    that truly wants one global stream sorts by the key — Spark's
    range-partitioned sort, the unavoidable cost of that ask."""
    return docs.withColumn("shuffle_key", shuffle_key(seed, id_col))


def training_shards(
    docs: DataFrame,
    seed: int = 0,
    n_shards: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, shard, pos): epoch-``seed`` shuffle materialized as
    ``n_shards`` independently-writable shards.

    shard = first 32 bits of the key modulo n_shards (uniform, no
    global pass); pos = rank within the shard by (key, id). A training
    job reading shard files in (shard, pos) order replays the exact
    permutation; a different seed is a fresh epoch. All three columns
    are plain SQL — the DuckDB oracle runs the same expressions.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    keyed = training_shuffle(docs, seed, id_col).select(
        F.col(id_col),
        F.col("shuffle_key"),
        (
            F.conv(
                F.substring("shuffle_key", 1, _SHARD_HEX_CHARS), 16, 10
            ).cast("long")
            % n_shards
        ).cast("int").alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("shuffle_key", id_col)
    return keyed.select(
        id_col,
        "shard",
        F.row_number().over(w).cast("long").alias("pos"),
    )


def train_val_test_split(
    docs: DataFrame,
    fracs: tuple = (0.98, 0.01, 0.01),
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Input rows plus ``split`` in {'train','val','test'} — the
    held-out partition of a training corpus, decided per document by
    ``md5('split-<seed>:<id>')``'s leading 32 bits mapped to [0, 1).

    Same guarantees as the shuffle key (deterministic, partition- and
    arrival-order-invariant, pure column expression, no shuffle at
    all), plus the property an eval set actually needs: membership is a
    function of the document id alone, so re-running ingestion, adding
    data, or changing the cluster NEVER migrates a document across the
    split boundary — only changing *seed* does. The hash is salted
    ('split-' prefix) so split membership is independent of the same
    seed's shuffle order.

    *fracs* are (train, val, test) and must sum to 1 (within 1e-9).
    """
    if len(fracs) != 3 or any(f < 0 for f in fracs):
        raise ValueError("fracs must be three non-negative fractions")
    if abs(sum(fracs) - 1.0) > 1e-9:
        raise ValueError("fracs must sum to 1")
    f_train, f_val, _ = fracs
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"split-{int(seed)}:"),
                        F.col(id_col).cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(1 << 32))
    )
    return docs.withColumn(
        "split",
        F.when(u < f_train, F.lit("train"))
        .when(u < f_train + f_val, F.lit("val"))
        .otherwise(F.lit("test")),
    )
