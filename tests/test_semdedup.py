"""Semantic dedup (SemDeDup): k-means cells -> within-cell cosine
prune. Brute-force numpy parity, internal consistency, plan audit,
and the trained-quantizer variant."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from greynirserver_spark.operators.ann import (
    load_embeddings,
    seeded_ivf_centroids,
    semantic_dedup_pairs,
    semantic_dedup_summary,
    semantic_dedup_survivors,
    train_ivf_centroids,
)

SF_DIR = "/root/testdata/sf0.001"
TAU = 0.35
K = 8


def _numpy_truth(emb_rows):
    ids = np.array([r["vec_id"] for r in emb_rows])
    x = np.array([r["embedding"] for r in emb_rows], dtype=np.float64)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    cents = seeded_ivf_centroids(x.shape[1], K)
    cell = np.argmax(np.round(x @ cents.T, 6), axis=1)
    sim = np.round(xn @ xn.T, 4)
    pairs, pruned = set(), set()
    for c in range(K):
        idx = np.where(cell == c)[0]
        for a_pos, a in enumerate(idx):
            for b in idx[a_pos + 1 :]:
                lo, hi = sorted((int(ids[a]), int(ids[b])))
                if sim[a, b] >= TAU:
                    pairs.add((int(cell[a]), lo, hi))
                    pruned.add(hi)
    cells = {int(i): int(c) for i, c in zip(ids, cell)}
    return pairs, pruned, cells


def test_semdedup_matches_numpy_brute_force(spark):
    emb = load_embeddings(spark, SF_DIR)
    rows = emb.collect()
    want_pairs, want_pruned, want_cells = _numpy_truth(rows)

    got_pairs = {
        (r["cell"], r["vec_a"], r["vec_b"])
        for r in semantic_dedup_pairs(emb, K, TAU).collect()
    }
    assert got_pairs == want_pairs
    assert len(want_pairs) > 0  # fixture actually exercises the prune

    surv = semantic_dedup_survivors(emb, K, TAU).collect()
    got_surv = {r["vec_id"] for r in surv}
    assert got_surv == set(want_cells) - want_pruned
    # the survivor keeps its own cell id
    for r in surv:
        assert want_cells[r["vec_id"]] == r["cell"]


def test_semdedup_summary_consistent(spark):
    emb = load_embeddings(spark, SF_DIR)
    summ = {
        r["cell"]: (r["n_vecs"], r["n_pruned"])
        for r in semantic_dedup_summary(emb, K, TAU).collect()
    }
    n_total = emb.count()
    assert sum(v for v, _ in summ.values()) == n_total
    surv = semantic_dedup_survivors(emb, K, TAU).collect()
    by_cell = {}
    for r in surv:
        by_cell[r["cell"]] = by_cell.get(r["cell"], 0) + 1
    for cell, (n_vecs, n_pruned) in summ.items():
        assert by_cell.get(cell, 0) == n_vecs - n_pruned


def test_semdedup_plan_is_cell_equijoin(spark):
    """The pairwise stage must join on the cell key — never a cartesian
    product of the corpus with itself."""
    emb = load_embeddings(spark, SF_DIR)
    plan = (
        semantic_dedup_pairs(emb, K, TAU)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    physical = (
        semantic_dedup_pairs(emb, K, TAU)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in physical


def test_semdedup_with_trained_quantizer(spark):
    """Data-adapted cells (the production path): still a partition of
    the corpus, still prunes, survivors + pruned == corpus."""
    emb = load_embeddings(spark, SF_DIR)
    cents = train_ivf_centroids(emb, k=K, iters=3, sample=400)
    pairs = semantic_dedup_pairs(emb, K, TAU, centroids=cents)
    pruned = {r["vec_b"] for r in pairs.collect()}
    surv = {
        r["vec_id"]
        for r in semantic_dedup_survivors(
            emb, K, TAU, centroids=cents
        ).collect()
    }
    n = emb.count()
    assert len(surv) == n - len(pruned)
    assert not surv & pruned
