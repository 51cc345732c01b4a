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
    "quantize_embeddings",
    "cosine_topk_quantized",
    "lsh_bucket_topk",
    "seeded_ivf_centroids",
    "train_ivf_centroids",
    "ivf_assign",
    "ivf_topk",
    "cosine_near_pairs_exact",
    "cosine_near_pairs_lsh",
    "incremental_cosine_near_pairs",
    "semantic_dedup_pairs",
    "semantic_dedup_survivors",
    "semantic_dedup_summary",
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


def quantize_embeddings(
    emb: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """(vec_id, scale, qvec) — symmetric per-vector int8 quantization,
    the 4× memory cut a 10^12-row embedding store takes before ANN
    serving (float32 → logical int8; parquet stores the tinyint array
    with INT8-annotated encoding, a production layout packs it to one
    binary column).

    ``scale = max|x| / 127``; ``q_i = round(x_i / scale)`` with
    half-away-from-zero rounding (Spark's and DuckDB's shared ROUND
    rule, so the oracle reproduces the lattice bit-for-bit), values in
    [-127, 127] by construction. Reconstruction ``x̂ = q * scale`` is
    elementwise within ``scale/2`` (test-pinned). All-zero vectors get
    ``scale = 0`` and an all-zero qvec.
    """
    col = F.col(vec_col)
    maxabs = F.array_max(F.transform(col, lambda x: F.abs(x.cast("double"))))
    scale = (maxabs / F.lit(127.0)).alias("scale")
    qvec = F.when(
        maxabs > 0,
        F.transform(
            col,
            lambda x: F.round(
                x.cast("double") / (maxabs / F.lit(127.0))
            ).cast("tinyint"),
        ),
    ).otherwise(
        F.transform(col, lambda x: F.lit(0).cast("tinyint"))
    ).alias("qvec")
    return emb.select("vec_id", scale, qvec)


def cosine_topk_quantized(
    emb: DataFrame, query_vec: Sequence[float], k: int = 10,
) -> DataFrame:
    """(rank, vec_id, cosine) — brute-force top-k over the int8-
    quantized store. The per-vector scale CANCELS in cosine
    (cos(q·scale, y) == cos(q, y) for scale > 0), so scoring runs
    directly on the integer lattice — no dequantize pass, and the
    scan reads 1/4 the bytes of the float store. Same rounding /
    ordering discipline as :func:`cosine_topk_bruteforce`; all-zero
    vectors (scale 0) can never match and are dropped.
    """
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    qnorm = float(np.sqrt(np.dot(query_vec, query_vec)))
    qv = quantize_embeddings(emb)
    scored = qv.where(F.col("scale") > 0).select(
        "vec_id",
        F.round(
            _dot(F.col("qvec"), qlit)
            / (_norm(F.col("qvec")) * F.lit(qnorm)),
            4,
        ).alias("cosine"),
    )
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


# ------------------------------------------------------------------ IVF

_IVF_SEED = 7


def seeded_ivf_centroids(dim: int, k: int) -> np.ndarray:
    """Deterministic unit-norm coarse quantizer (data-independent, like
    the LSH planes) — lets the partitioning be reproduced as SQL
    literals by an external oracle. For data-adapted cells use
    :func:`train_ivf_centroids`."""
    rng = np.random.Generator(np.random.SFC64(_IVF_SEED))
    c = rng.standard_normal((k, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def train_ivf_centroids(
    emb: DataFrame, k: int = 8, iters: int = 5, sample: int = 50_000
) -> np.ndarray:
    """Lloyd k-means on a deterministic sample (first *sample* rows by
    vec_id), driver-side NumPy — the coarse-quantizer training step of
    an IVF index. The sample bound keeps the driver O(sample x dim)
    regardless of corpus size; centroids are then a tiny broadcast.
    Seeds from :func:`seeded_ivf_centroids`; cosine assignment (vectors
    L2-normalized) so cells are Voronoi regions on the unit sphere."""
    rows = (
        emb.orderBy("vec_id").limit(sample)
        .select("embedding").toPandas()["embedding"]
    )
    x = np.asarray([np.asarray(v, dtype=np.float64) for v in rows])
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    c = seeded_ivf_centroids(x.shape[1], k)
    for _ in range(iters):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(k):
            m = assign == j
            if m.any():
                c[j] = x[m].mean(axis=0)
        c = c / np.linalg.norm(c, axis=1, keepdims=True)
    return c


def ivf_assign(emb: DataFrame, centroids: np.ndarray) -> DataFrame:
    """Adds ``bucket`` = argmax_j dot(embedding, centroid_j), as a JVM
    expression tree (dots rounded to 6 so the argmax is reproducible
    across engines/summation orders). At 10^12 rows bucket is the
    partition key of the materialized index; a query touches only its
    probed cells' partitions."""
    dots = F.array(*[
        F.round(_dot(F.col("embedding"),
                     F.array(*[F.lit(float(v)) for v in c])), 6)
        for c in centroids
    ])
    return emb.withColumn(
        "bucket",
        (F.array_position(dots, F.array_max(dots)) - 1).cast("int"),
    )


def ivf_topk(
    emb: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    centroids: Optional[np.ndarray] = None,
    n_probe: int = 2,
    exclude_vec_id: Optional[int] = None,
) -> DataFrame:
    """IVF approximate top-k: rank cells by centroid affinity to the
    query (driver-side, k_cells tiny), exact-rerank only rows in the
    *n_probe* best cells. Complements sign-LSH: cells adapt to the data
    when trained, and probe count trades recall for scan fraction."""
    if centroids is None:
        centroids = seeded_ivf_centroids(len(query_vec), 8)
    q = np.asarray(query_vec, dtype=np.float64)
    order = np.argsort(-np.round(centroids @ q, 6), kind="stable")
    probes = [int(j) for j in order[:n_probe]]
    cand = (
        ivf_assign(emb, centroids)
        .where(F.col("bucket").isin(probes))
        .select("vec_id", "embedding")
    )
    return cosine_topk_bruteforce(cand, query_vec, k, exclude_vec_id)


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


def incremental_cosine_near_pairs(
    spark,
    store_root: str,
    new_emb: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 12,
    run_id=None,
) -> DataFrame:
    """Embedding twin of dedup.incremental_minhash_pairs: check an
    append batch of vectors against the accumulated corpus without
    re-hashing a single stored vector.

    A log-structured store (operators/runstore.py) accumulates one
    (vec_id, bucket, nrm, embedding) row per vector, bucketed by
    seeded sign-LSH. Per batch: bucket the new vectors (O(batch)),
    equi-join on bucket against the store and against themselves,
    verify with the exact cosine (vectors ride along, so verification
    reads nothing), then append the batch's rows as one run. Returns
    (vec_a, vec_b, cosine >= threshold) covering new×stored and
    new×new; the union over batches equals the one-shot
    :func:`cosine_near_pairs_lsh` over the full corpus (test-pinned —
    both sides use the same seeded hyperplanes). *run_id* dedupes
    replays.
    """
    from pyspark import StorageLevel

    from .runstore import append_run, load_rows

    dim = int(new_emb.select(F.size("embedding")).first()[0])
    planes = _hyperplanes(dim, n_planes)
    new_rows = new_emb.select(
        "vec_id", "embedding",
        _sign_bits_col(F.col("embedding"), planes).alias("bucket"),
        _norm(F.col("embedding")).alias("nrm"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    new_rows.count()

    def verified(a, b, cross_only):
        cond = (
            F.col("a.vec_id") != F.col("b.vec_id")
            if cross_only
            else F.col("a.vec_id") < F.col("b.vec_id")
        )
        return (
            a.alias("a").join(b.alias("b"), "bucket")
            .where(cond)
            .select(
                F.least("a.vec_id", "b.vec_id").alias("vec_a"),
                F.greatest("a.vec_id", "b.vec_id").alias("vec_b"),
                F.round(
                    _dot(F.col("a.embedding"), F.col("b.embedding"))
                    / (F.col("a.nrm") * F.col("b.nrm")),
                    4,
                ).alias("cosine"),
            )
            .where(F.col("cosine") >= threshold)
            .dropDuplicates(["vec_a", "vec_b"])
        )

    pairs = verified(new_rows, new_rows, cross_only=False)
    old_rows = load_rows(spark, store_root)
    if old_rows is not None:
        pairs = pairs.unionByName(
            verified(new_rows, old_rows, cross_only=True)
        )
    # materialize before the append: the batch's own run must not join
    # against itself as "stored" (lazy plans list store files at action
    # time)
    pairs = pairs.dropDuplicates(["vec_a", "vec_b"]).localCheckpoint(
        eager=True
    )
    append_run(spark, store_root, new_rows, run_id=run_id)
    new_rows.unpersist()
    return pairs


# --------------------------------------------------------- SemDeDup

def _semdedup_assigned(
    emb: DataFrame, k_cells: int, centroids: Optional[np.ndarray]
) -> DataFrame:
    """(vec_id, embedding, nrm, cell): the SemDeDup partitioning step —
    every vector lands in exactly one k-means cell. Cell assignment is
    the IVF argmax (rounded dots, first-max) so it is bit-reproducible
    across engines; norms ride along so the within-cell verify below
    stays a pure dot product."""
    if centroids is None:
        dim = int(emb.select(F.size("embedding")).first()[0])
        centroids = seeded_ivf_centroids(dim, k_cells)
    return (
        ivf_assign(
            emb.select(
                "vec_id", "embedding",
                _norm(F.col("embedding")).alias("nrm"),
            ),
            centroids,
        )
        .withColumnRenamed("bucket", "cell")
    )


def semantic_dedup_pairs(
    emb: DataFrame,
    k_cells: int = 8,
    threshold: float = 0.35,
    centroids: Optional[np.ndarray] = None,
    assigned: Optional[DataFrame] = None,
) -> DataFrame:
    """(cell, vec_a, vec_b, cosine): semantic near-duplicate pairs, the
    SemDeDup shape (Abbas et al. 2023, arXiv:2303.09540): k-means the
    embedding space, then compare pairs ONLY within a cell — the
    pairwise cost drops from O(n^2) to sum over cells of O(|cell|^2),
    and the cell id is the shuffle/partition key, so each cell's
    comparison runs co-located with no cross-cell traffic.

    At 10^12 docs: train centroids with k ~ corpus/cell_budget
    (:func:`train_ivf_centroids` — driver O(sample x dim), broadcast
    out), recursively sub-split any cell over budget, and the within-
    cell self-join is the whole algorithm; nothing else scans the
    corpus. Here k is small and the quantizer seeded so an external
    SQL oracle reproduces the exact cell walls.

    The within-cell pairwise stage runs as one BLAS matmul per cell
    (grouped Arrow exchange -> blocked ``X @ X.T``), not a row-pair
    self-join: the |cell|^2 dot products were the whole cost of the
    old plan (interpreted zip_with/aggregate per pair — measured 225s
    at the 20k-vector scale vs ~4s for this shape). Python emits only
    the RAW cosine of candidate pairs above a loose guard band; the
    exact gate — ``round(cosine, 4) >= threshold`` with Spark's
    half-up-on-shortest-repr rounding — stays in the JVM, so emitted
    rows are filtered by precisely the same expression as before.
    Non-finite cosines (zero-norm vectors) are forwarded to the JVM
    gate untouched for identical NaN/Inf semantics.

    Cosine rounded to 4 (summation-order independence across engines);
    ``vec_a < vec_b`` canonical order. Pass *assigned* (a materialized
    :func:`_semdedup_assigned` frame) to skip re-assignment when
    composing with survivors/summary.
    """
    import pandas as pd

    if assigned is None:
        assigned = _semdedup_assigned(emb, k_cells, centroids)
    # loose pre-gate: round-half-up(x, 4) >= t can only hold when
    # x >= t - 5e-5; the 1e-7 slack absorbs binary/decimal edge fuzz.
    # The exact JVM round()-gate below re-filters, so the guard only
    # bounds emission volume, never decides membership.
    guard = float(threshold) - 5e-5 - 1e-7

    def cell_pairs(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("vec_id", kind="mergesort")
        ids = pdf["vec_id"].to_numpy()
        cell = int(pdf["cell"].iloc[0])
        x = np.array([np.asarray(v, dtype=np.float64)
                      for v in pdf["embedding"]])
        nrm = pdf["nrm"].to_numpy(dtype=np.float64)
        n = len(ids)
        out = []
        blk = 2048
        with np.errstate(divide="ignore", invalid="ignore"):
            for i0 in range(0, n, blk):
                i1 = min(i0 + blk, n)
                cos = (x[i0:i1] @ x.T) / np.outer(nrm[i0:i1], nrm)
                keep = (cos >= guard) | ~np.isfinite(cos)
                # vec_a < vec_b: drop columns c <= global row index gi
                # (tri(..., k=i0) is True exactly where c <= r + i0)
                keep[:, :i1] &= ~np.tri(i1 - i0, i1, k=i0, dtype=bool)
                r, c = np.nonzero(keep)
                if len(r):
                    out.append(pd.DataFrame({
                        "cell": np.full(len(r), cell, dtype=np.int32),
                        "vec_a": ids[r + i0],
                        "vec_b": ids[c],
                        "raw": cos[r, c],
                    }))
        if not out:
            return pd.DataFrame(
                {"cell": pd.Series(dtype="int32"),
                 "vec_a": pd.Series(dtype="int64"),
                 "vec_b": pd.Series(dtype="int64"),
                 "raw": pd.Series(dtype="float64")}
            )
        return pd.concat(out, ignore_index=True)

    raw = assigned.groupBy("cell").applyInPandas(
        cell_pairs, "cell int, vec_a long, vec_b long, raw double"
    )
    return (
        raw.select(
            "cell", "vec_a", "vec_b", F.round("raw", 4).alias("cosine")
        )
        .where(F.col("cosine") >= threshold)
    )


def semantic_dedup_survivors(
    emb: DataFrame,
    k_cells: int = 8,
    threshold: float = 0.35,
    centroids: Optional[np.ndarray] = None,
) -> DataFrame:
    """(vec_id, cell): the corpus after semantic dedup — drop every
    vector that has a LOWER-id neighbor at cosine >= threshold in its
    cell (greedy min-id representative, SemDeDup's keep-one-per-
    epsilon-ball rule with the same deterministic survivor choice as
    ``exact_dup_groups``). One anti-join against the pruned-id set;
    for transitive-closure clustering over these pairs reuse
    ``dedup.near_dup_clusters``'s label propagation — the pair relation
    here is the same shape. The cell assignment is materialized ONCE
    (localCheckpoint) and shared by the pair stage and the anti-join
    base — the old plan recomputed it per use."""
    assigned = _semdedup_assigned(emb, k_cells, centroids).localCheckpoint(
        eager=True
    )
    pairs = semantic_dedup_pairs(
        emb, k_cells, threshold, centroids, assigned=assigned
    )
    pruned = pairs.select(F.col("vec_b").alias("vec_id")).distinct()
    return (
        assigned
        .join(pruned, "vec_id", "left_anti")
        .select("vec_id", "cell")
    )


def semantic_dedup_summary(
    emb: DataFrame,
    k_cells: int = 8,
    threshold: float = 0.35,
    centroids: Optional[np.ndarray] = None,
) -> DataFrame:
    """(cell, n_vecs, n_pruned): per-cell dedup pressure — the
    monitoring table a pipeline run reports (how semantically redundant
    is each region of the embedding space). Assignment runs once and is
    shared with the pair stage (localCheckpoint)."""
    assigned = _semdedup_assigned(emb, k_cells, centroids).localCheckpoint(
        eager=True
    )
    pairs = semantic_dedup_pairs(
        emb, k_cells, threshold, centroids, assigned=assigned
    )
    pruned = (
        pairs.select("cell", F.col("vec_b").alias("vec_id"))
        .distinct()
        .groupBy("cell")
        .agg(F.count("*").cast("long").alias("n_pruned"))
    )
    return (
        assigned.groupBy("cell")
        .agg(F.count("*").cast("long").alias("n_vecs"))
        .join(pruned, "cell", "left")
        .select(
            "cell", "n_vecs",
            F.coalesce("n_pruned", F.lit(0)).cast("long").alias("n_pruned"),
        )
    )
