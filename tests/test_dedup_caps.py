"""Candidate-set bounds for the near-dup generators: hot shingles and
hot simhash chunks must not go quadratic (round-1 scale risk)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from greynirserver_spark.operators.dedup import (
    ngram_jaccard_pairs,
    ngram_shingles,
    simhash_near_pairs,
)


def _docs_with_boilerplate(spark, n=40):
    """Every doc shares one boilerplate sentence (a hot shingle); only
    docs 0/1 are real near-dups of each other."""
    boiler = "subscribe to our newsletter today"
    rows = [
        (0, f"{boiler} alpha beta gamma delta epsilon zeta"),
        (1, f"{boiler} alpha beta gamma delta epsilon eta"),
    ]
    for i in range(2, n):
        rows.append((i, f"{boiler} unique{i}a unique{i}b unique{i}c"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shingle_df_cap_bounds_candidates(spark):
    docs = _docs_with_boilerplate(spark)
    # cap below the boilerplate df: candidates must come from rare
    # shingles only -> only the true near-dup pair survives
    got = ngram_jaccard_pairs(
        docs, n=3, threshold=0.5, max_shingle_df=10
    ).collect()
    assert {(r.doc_a, r.doc_b) for r in got} == {(0, 1)}
    # and the jaccard is computed over the FULL shingle sets (hot
    # shingles still count toward the intersection)
    sh = ngram_shingles(docs, 3)
    sz = {r.doc_id: r.cnt for r in sh.groupBy("doc_id").agg(
        F.count("*").alias("cnt")).collect()}
    inter = (
        sh.where(F.col("doc_id") == 0).select("shingle")
        .intersect(sh.where(F.col("doc_id") == 1).select("shingle"))
        .count()
    )
    expected = round(inter / (sz[0] + sz[1] - inter), 4)
    assert got[0].jaccard == expected


def test_simhash_bucket_cap_drops_hot_buckets(spark):
    # 30 byte-identical docs -> identical fingerprints -> one hot bucket
    # per chunk; with the cap below 30 no candidate pairs are generated
    rows = [(i, "same text for every doc here") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    assert simhash_near_pairs(docs, max_hamming=3, max_bucket=10).count() == 0
    # with the cap above the cluster size the pairs come back
    n_pairs = simhash_near_pairs(docs, max_hamming=3, max_bucket=100).count()
    assert n_pairs == 30 * 29 // 2
