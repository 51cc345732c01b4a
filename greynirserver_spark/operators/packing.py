"""Token-budget packing: assign documents to training shards.

A training-data pipeline materializes shards of roughly *budget* tokens
each (sequence-packing upstream of tokenizer sharding). Packing is a
prefix sum over a deterministic document order — inherently sequential,
so the scale-safe plan is the classic two-pass distributed prefix sum:

1. range-partition by the order key (``doc_id``) so partition p holds a
   contiguous doc range,
2. within-partition cumulative sum via a window PARTITIONED by the
   Spark partition id (never a global single-partition window),
3. per-partition totals are collected (one tiny row per partition) and
   their exclusive prefix re-broadcast as offsets.

``shard_id = floor((offset + local_cumsum - n_tokens) / budget)`` —
i.e. a document starts the shard its first token falls into; documents
are never split. The result is identical to a serial scan in doc_id
order, and the only driver-side data is #partitions rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..tokenization import MAX_WORD_LEN, TOKEN_SPLIT_RE

__all__ = ["doc_token_counts", "pack_token_budget"]


def doc_token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens): whitespace/regex token count, JVM-side."""
    toks = F.filter(
        F.split(F.lower("text"), TOKEN_SPLIT_RE),
        lambda x: (F.length(x) >= 1) & (F.length(x) <= MAX_WORD_LEN),
    )
    return docs.select(
        "doc_id", F.size(toks).cast("long").alias("n_tokens")
    )


def pack_token_budget(
    docs: DataFrame, budget: int, num_partitions: int = 32
) -> DataFrame:
    """(doc_id, n_tokens, shard_id): greedy packing in doc_id order."""
    counts = doc_token_counts(docs).repartitionByRange(
        num_partitions, "doc_id"
    )
    pid = F.spark_partition_id().alias("pid")
    with_pid = counts.select("doc_id", "n_tokens", pid)

    w = Window.partitionBy("pid").orderBy("doc_id")
    local = with_pid.withColumn(
        "cum", F.sum("n_tokens").over(w)
    )

    # one tiny row per partition; range partitioning makes pid order ==
    # doc_id order, so the exclusive prefix of totals is the offset
    totals = (
        local.groupBy("pid")
        .agg(F.max("cum").alias("total"), F.min("doc_id").alias("d0"))
        .orderBy("d0")
        .collect()
    )
    offsets, acc = {}, 0
    for r in totals:
        offsets[r["pid"]] = acc
        acc += r["total"]
    off_df = local.sparkSession.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "pid int, off long"
    )
    return (
        local.join(F.broadcast(off_df), "pid")
        .select(
            "doc_id",
            "n_tokens",
            F.floor(
                (F.col("off") + F.col("cum") - F.col("n_tokens"))
                / F.lit(budget)
            ).cast("long").alias("shard_id"),
        )
    )
