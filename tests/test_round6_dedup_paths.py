"""Round-6 optimization paths in the dedup family.

The candidate-pair key packing (ids < 2^31 -> one long) and the dense
bitmap verify (distinct-token universe <= 64 -> popcount intersection)
are internal fast paths that must be output-invisible. Each test pins a
fast path against its fallback twin or a brute-force oracle.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from greynirserver_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)

BIG = 1 << 40  # id offset that defeats the 31-bit pair packing


def _corpus(spark, vocab, n_docs=60, words=12, seed=3, clones=10):
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(words))))
    for j in range(clones):  # identical-set groups
        rows.append((n_docs + j, rows[j % 5][1]))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _small_vocab():
    return [f"w{i}" for i in range(20)]


def _large_vocab():
    # > 64 distinct tokens -> the bitmap fast path must NOT engage
    return [f"w{i}" for i in range(150)]


def _brute_jaccard_pairs(spark, docs, threshold, bands):
    """Doc-level oracle: exact token-set jaccard + the same band and
    estimate gates, computed in local Python over collected rows."""
    from greynirserver_spark.operators.dedup import (
        _MINHASH_H, minhash_signatures, token_hash_sets)

    ths = {r["doc_id"]: set(r["ths"])
           for r in token_hash_sets(docs).collect()}
    sig = {r["doc_id"]: list(r["sig"])
           for r in minhash_signatures(docs).collect()}
    rpb = _MINHASH_H // bands
    out = set()
    ids = sorted(ths)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            collide = any(
                sig[a][k * rpb:(k + 1) * rpb] == sig[b][k * rpb:(k + 1) * rpb]
                for k in range(bands)
            )
            if not collide:
                continue
            inter = len(ths[a] & ths[b])
            jac = round(inter / (len(ths[a]) + len(ths[b]) - inter), 4)
            if jac < threshold:
                continue
            est = sum(x == y for x, y in zip(sig[a], sig[b])) / _MINHASH_H
            if est < max(0.0, threshold - 0.15):
                continue
            out.add((a, b, jac))
    return out


@pytest.mark.parametrize("vocab_fn", [_small_vocab, _large_vocab])
def test_minhash_fast_paths_match_bruteforce(spark, vocab_fn):
    docs = _corpus(spark, vocab_fn())
    got = {(r.doc_a, r.doc_b, r.jaccard)
           for r in minhash_lsh_pairs(docs, 0.5, bands=16).collect()}
    want = _brute_jaccard_pairs(spark, docs, 0.5, bands=16)
    assert got == want


def test_minhash_pair_packing_is_id_invariant(spark):
    docs = _corpus(spark, _small_vocab())
    shifted = docs.withColumn("doc_id", F.col("doc_id") + F.lit(BIG))
    small = {(r.doc_a, r.doc_b, r.jaccard)
             for r in minhash_lsh_pairs(docs, 0.5, bands=16).collect()}
    big = {(r.doc_a - BIG, r.doc_b - BIG, r.jaccard)
           for r in minhash_lsh_pairs(shifted, 0.5, bands=16).collect()}
    assert small == big and small


def test_ngram_pair_packing_is_id_invariant(spark):
    docs = _corpus(spark, _small_vocab(), words=9)
    shifted = docs.withColumn("doc_id", F.col("doc_id") + F.lit(BIG))
    small = {(r.doc_a, r.doc_b, r.jaccard)
             for r in ngram_jaccard_pairs(docs, 2, 0.3).collect()}
    big = {(r.doc_a - BIG, r.doc_b - BIG, r.jaccard)
           for r in ngram_jaccard_pairs(shifted, 2, 0.3).collect()}
    assert small == big and small


def test_ngram_hot_branch_still_engages(spark):
    """The empty-hot short circuit must not change the capped-df
    semantics: with a cap below the boilerplate df the hot re-expansion
    path still produces the exact full-set jaccard."""
    boiler = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(0, boiler + " one two three"), (1, boiler + " one two four")]
    rows += [(i, boiler + f" x{i} y{i} z{i}") for i in range(2, 30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    lo = ngram_jaccard_pairs(docs, 3, 0.5, max_shingle_df=5).collect()
    hi = ngram_jaccard_pairs(docs, 3, 0.5, max_shingle_df=10**6).collect()
    # the uncapped run is the semantic reference for the (0, 1) pair
    ref = {(r.doc_a, r.doc_b, r.jaccard) for r in hi if r.doc_a == 0 and r.doc_b == 1}
    got = {(r.doc_a, r.doc_b, r.jaccard) for r in lo if r.doc_a == 0 and r.doc_b == 1}
    assert got == ref and got
