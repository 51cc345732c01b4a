"""Token-budget packing: assign documents to training shards.

A training-data pipeline materializes shards of roughly *budget* tokens
each (sequence-packing upstream of tokenizer sharding). Packing is a
prefix sum over a deterministic document order — inherently sequential,
so the scale-safe plan is the classic two-pass distributed prefix sum:

1. a one-pass key sketch fixes LITERAL range boundaries on ``doc_id``
   at the driver, so every row's bucket is a pure deterministic JVM
   expression (``repartitionByRange`` is NOT used: Spark re-samples its
   boundaries per job, so the totals job and the assignment job could
   disagree about which bucket a row is in — the exact cross-job
   corruption measured for ``assign_doc_ids`` at 200k rows; literal
   boundaries make both jobs agree by construction),
2. within-bucket cumulative sum via a window PARTITIONED by the bucket
   id (never a global single-partition window),
3. per-bucket token totals are collected (one tiny row per bucket) and
   their exclusive prefix inlined as a literal offset map.

``shard_id = floor((offset + local_cumsum - n_tokens) / budget)`` —
i.e. a document starts the shard its first token falls into; documents
are never split. The result is identical to a serial scan in doc_id
order, and the only driver-side data is #partitions rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..tokenization import MAX_WORD_LEN, TOKEN_SPLIT_RE
from .postings import _sketch_boundaries

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
    """(doc_id, n_tokens, shard_id): greedy packing in doc_id order.

    Deterministic across jobs: the bucket id is an expression over
    literal boundaries, so re-evaluating the returned plan (write +
    count, task retry, AQE re-plan) always reproduces the same buckets
    the offsets were computed for.
    """
    counts = doc_token_counts(docs)
    boundaries = _sketch_boundaries(
        counts, "doc_id", num_partitions, key_type="long"
    )
    if boundaries:
        barr = F.array(*[F.lit(int(b)) for b in boundaries])
        pid_expr = F.size(
            F.filter(barr, lambda b: b <= F.col("doc_id"))
        ).cast("int")
    else:
        pid_expr = F.lit(0)
    with_pid = counts.select(
        "doc_id", "n_tokens", pid_expr.alias("pid")
    )

    w = Window.partitionBy("pid").orderBy("doc_id")
    local = with_pid.withColumn("cum", F.sum("n_tokens").over(w))

    # one tiny row per bucket; bucket id order == doc_id order by
    # construction, so the exclusive prefix of totals is the offset
    totals = {
        r["pid"]: r["total"]
        for r in with_pid.groupBy("pid")
        .agg(F.sum("n_tokens").alias("total"))
        .collect()
    }
    offsets, acc = {}, 0
    for p in sorted(totals):
        offsets[p] = acc
        acc += totals[p]
    off_expr = (
        F.element_at(
            F.create_map(
                *[F.lit(v) for kv in offsets.items() for v in kv]
            ),
            F.col("pid"),
        )
        if offsets
        else F.lit(0)
    )
    return local.select(
        "doc_id",
        "n_tokens",
        F.floor(
            (off_expr + F.col("cum") - F.col("n_tokens")) / F.lit(budget)
        ).cast("long").alias("shard_id"),
    )
