"""Recall measurement for the approximate similarity-search paths.

The LSH variants trade recall for sub-linear candidate generation;
round-1 shipped them without ever measuring that trade. These tests pin
recall on the driver's embedding fixture so a regression in the
bucketing (seed drift, plane-count change) is caught, and document the
expected operating point.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from greynirserver_spark.operators.ann import (
    cosine_near_pairs_exact,
    cosine_near_pairs_lsh,
    cosine_topk_bruteforce,
    lsh_bucket_topk,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_lsh_topk_recall(spark, emb):
    """2-table 8-plane OR-bucketing: candidates must contain a usable
    share of the true top-10 for random queries."""
    recalls = []
    for qid in (0, 7, 23):
        qvec = [
            float(x)
            for x in emb.where(f"vec_id = {qid}").first()["embedding"]
        ]
        truth = {
            r.vec_id
            for r in cosine_topk_bruteforce(
                emb, qvec, k=10, exclude_vec_id=qid
            ).collect()
        }
        approx = {
            r.vec_id
            for r in lsh_bucket_topk(
                emb, qvec, k=10, exclude_vec_id=qid
            ).collect()
        }
        recalls.append(len(truth & approx) / len(truth))
    avg = sum(recalls) / len(recalls)
    # 8 planes x 2 tables on 64-dim random vectors: empirical ~0.2-0.5
    # at this fixture; the point of the pin is catching seed/shape drift,
    # not advertising precision
    assert avg >= 0.15, recalls


def test_near_pairs_lsh_is_exact_subset_with_recall(spark, emb):
    exact = {
        (r.vec_a, r.vec_b)
        for r in cosine_near_pairs_exact(emb, threshold=0.35).collect()
    }
    lsh = {
        (r.vec_a, r.vec_b)
        for r in cosine_near_pairs_lsh(
            emb, threshold=0.35, n_planes=4
        ).collect()
    }
    assert lsh <= exact, "LSH near-pairs must never invent pairs"
    assert exact, "fixture must contain near pairs"
    recall = len(lsh) / len(exact)
    # cosine 0.35 is a weak-similarity regime: collision prob per plane
    # ~0.62, ^4 ~0.15 — the pin catches bucketing regressions
    assert recall >= 0.05, recall


def test_ivf_trained_recall_and_subset(spark, emb):
    """k-means IVF: trained cells must give usable recall at n_probe=2,
    and every returned row must be a true row of the table (cells
    partition the data — no invention)."""
    from greynirserver_spark.operators.ann import (
        ivf_assign,
        ivf_topk,
        train_ivf_centroids,
    )

    cents = train_ivf_centroids(emb, k=8, iters=5)
    # cells partition the corpus: every row lands in exactly one bucket
    n = emb.count()
    bucketed = ivf_assign(emb, cents)
    assert bucketed.count() == n
    assert bucketed.where("bucket >= 0 AND bucket < 8").count() == n

    recalls = []
    for qid in (0, 7, 23):
        qvec = [
            float(x)
            for x in emb.where(f"vec_id = {qid}").first()["embedding"]
        ]
        truth = {
            r.vec_id
            for r in cosine_topk_bruteforce(
                emb, qvec, k=10, exclude_vec_id=qid
            ).collect()
        }
        approx = {
            r.vec_id
            for r in ivf_topk(
                emb, qvec, k=10, centroids=cents, n_probe=2,
                exclude_vec_id=qid,
            ).collect()
        }
        recalls.append(len(truth & approx) / len(truth))
    avg = sum(recalls) / len(recalls)
    # 2 of 8 trained cells probed (~1/4 of rows scanned): empirically
    # well above the data-independent seeded quantizer; the pin catches
    # training/assignment drift
    assert avg >= 0.3, recalls


def test_ivf_seeded_matches_driver_oracle_shape(spark, emb):
    """The driver-gate variant (seeded quantizer) returns exactly k rows
    with deterministic ordering."""
    from greynirserver_spark.operators.ann import ivf_topk

    qvec = [float(x) for x in emb.where("vec_id = 0").first()["embedding"]]
    rows = ivf_topk(emb, qvec, k=10, n_probe=2, exclude_vec_id=0).collect()
    assert len(rows) == 10
    assert [r.rank for r in rows] == list(range(1, 11))
    cosines = [r.cosine for r in rows]
    assert cosines == sorted(cosines, reverse=True)


def test_int8_quantization_reconstruction_and_recall(spark, emb):
    """int8 symmetric quantization: elementwise reconstruction error is
    bounded by scale/2, and quantized cosine top-10 keeps high recall
    against the float brute force (the 4x-memory serving trade)."""
    import numpy as np
    from pyspark.sql import functions as F

    from greynirserver_spark.operators.ann import (
        cosine_topk_bruteforce,
        cosine_topk_quantized,
        quantize_embeddings,
    )

    qv = quantize_embeddings(emb)
    joined = qv.join(emb.select("vec_id", "embedding"), "vec_id").limit(200)
    for r in joined.collect():
        x = np.asarray(r["embedding"], dtype=np.float64)
        q = np.asarray(r["qvec"], dtype=np.float64)
        s = float(r["scale"])
        assert np.abs(q).max() <= 127
        if s == 0:
            assert not x.any() and not q.any()
        else:
            assert np.abs(q * s - x).max() <= s / 2 + 1e-12
    # recall@10 of the quantized scan vs the float brute force
    query = emb.orderBy("vec_id").first()
    qvec = [float(v) for v in query["embedding"]]
    rest = emb.where(F.col("vec_id") != query["vec_id"])
    exact = {r.vec_id for r in
             cosine_topk_bruteforce(rest, qvec, k=10).collect()}
    quant = {r.vec_id for r in
             cosine_topk_quantized(rest, qvec, k=10).collect()}
    recall = len(exact & quant) / len(exact)
    assert recall >= 0.8, recall
