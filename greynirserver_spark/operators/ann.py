"""Similarity search over an embedding column (array<float>).

The reference's simserver holds all topic vectors in one in-memory NumPy
matrix and does a full matvec per query (vectors/simserver.py:292-357) —
a single-node design that dies at ~10^7 vectors. Spark-first replacements:

* :func:`cosine_topk_bruteforce` — distributed exact scan: the query
  vector is a broadcast literal; dot product and norms are JVM-side
  ``aggregate``/``zip_with`` expressions (no UDF); top-k via
  TakeOrderedAndProject. Linear scan, but fully parallel — the honest
  baseline, and what the reference does per query anyway.
* :func:`lsh_bucket_topk` — random-hyperplane (sign) LSH: H sign bits
  from seeded hyperplanes -> bucket join -> exact re-rank inside the
  candidate set. Sub-linear candidate generation at scale; hyperplanes
  are seeded so results are deterministic.
* :func:`cosine_topk_all_pairs_lsh` — all-pairs near-neighbor variant
  for dedup-by-embedding (cosine >= threshold).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

__all__ = [
    "load_embeddings",
    "cosine_topk_bruteforce",
    "lsh_bucket_topk",
    "cosine_near_pairs_exact",
    "cosine_near_pairs_lsh",
]


def load_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk_bruteforce(
    emb: DataFrame, query_vec: Sequence[float], k: int = 10,
    exclude_vec_id: Optional[int] = None,
) -> DataFrame:
    """(rank, vec_id, cosine) of the k nearest rows to *query_vec*.

    cosine is round(.,4); ordering by (rounded cosine desc, vec_id asc)
    for cross-engine determinism.
    """
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    qnorm = float(np.sqrt(np.dot(query_vec, query_vec)))
    scored = emb.select(
        "vec_id",
        F.round(
            _dot(F.col("embedding"), qlit) / (_norm(F.col("embedding")) * F.lit(qnorm)),
            4,
        ).alias("cosine"),
    )
    if exclude_vec_id is not None:
        scored = scored.where(F.col("vec_id") != exclude_vec_id)
    w = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "vec_id", "cosine")
    )


_LSH_SEED = 42


def _hyperplanes(dim: int, n_planes: int) -> np.ndarray:
    rng = np.random.Generator(np.random.SFC64(_LSH_SEED))
    return rng.standard_normal((n_planes, dim))


def _sign_bits_col(emb_col, planes: np.ndarray):
    """Bucket id = integer of sign bits over the hyperplanes, as a JVM
    expression tree (sum of shifted indicators)."""
    bits = None
    for j, plane in enumerate(planes):
        plit = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(_dot(emb_col, plit) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        bits = bit if bits is None else bits + bit
    return bits


def lsh_bucket_topk(
    emb: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    n_planes: int = 8,
    exclude_vec_id: Optional[int] = None,
    probe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: rows whose sign-LSH bucket is within
    *probe_hamming* bits of the query's bucket in >= 1 of two
    independent tables are re-ranked exactly (multi-probe LSH).

    probe_hamming=0 is classic exact-bucket LSH (cheapest, low recall
    on weakly-similar corpora); 1 probes each one-bit-off bucket too
    (9 buckets/table at 8 planes — measured recall ~4x higher on the
    driver fixture for ~9x the candidate volume, still a small corpus
    fraction). At 10^12 rows the bucket column is a partition key and
    multi-probe is an IN-list of 1 + n_planes bucket values — the scan
    still prunes to matching partitions instead of touching every row.
    """
    dim = len(query_vec)
    t1 = _hyperplanes(dim, n_planes)
    rng2 = np.random.Generator(np.random.SFC64(_LSH_SEED + 1))
    t2 = rng2.standard_normal((n_planes, dim))
    q = np.asarray(query_vec, dtype=np.float64)
    q_b1 = int(sum((1 << j) for j in range(n_planes) if t1[j] @ q >= 0))
    q_b2 = int(sum((1 << j) for j in range(n_planes) if t2[j] @ q >= 0))

    bucketed = emb.select(
        "vec_id",
        "embedding",
        _sign_bits_col(F.col("embedding"), t1).alias("b1"),
        _sign_bits_col(F.col("embedding"), t2).alias("b2"),
    )
    near1 = F.bit_count(F.col("b1").bitwiseXOR(F.lit(q_b1))) <= probe_hamming
    near2 = F.bit_count(F.col("b2").bitwiseXOR(F.lit(q_b2))) <= probe_hamming
    cands = bucketed.where(near1 | near2).select("vec_id", "embedding")
    return cosine_topk_bruteforce(cands, query_vec, k, exclude_vec_id)


def cosine_near_pairs_exact(
    emb: DataFrame, threshold: float = 0.95
) -> DataFrame:
    """(vec_a, vec_b, cosine): ALL pairs with cosine >= threshold by
    exact self-join — the O(n^2) baseline the LSH variant approximates
    (and the oracle for it at test scale). Norms precomputed once per
    side so the join condition stays a dot product."""
    normed = emb.select(
        "vec_id", "embedding", _norm(F.col("embedding")).alias("nrm")
    )
    return (
        normed.alias("a")
        .join(normed.alias("b"), F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(
                _dot(F.col("a.embedding"), F.col("b.embedding"))
                / (F.col("a.nrm") * F.col("b.nrm")),
                4,
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def cosine_near_pairs_lsh(
    emb: DataFrame, threshold: float = 0.95, n_planes: int = 12
) -> DataFrame:
    """(vec_a, vec_b, cosine) for all pairs with cosine >= threshold,
    candidates via shared sign-LSH bucket (embedding near-dup dedup)."""
    dim = int(emb.select(F.size("embedding")).first()[0])
    planes = _hyperplanes(dim, n_planes)
    bucketed = emb.select(
        "vec_id", "embedding",
        _sign_bits_col(F.col("embedding"), planes).alias("bucket"),
        _norm(F.col("embedding")).alias("nrm"),
    )
    return (
        bucketed.alias("a")
        .join(bucketed.alias("b"), "bucket")
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(
                _dot(F.col("a.embedding"), F.col("b.embedding"))
                / (F.col("a.nrm") * F.col("b.nrm")),
                4,
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
