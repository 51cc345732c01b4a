"""Context-window chunking and perplexity bucketing semantics."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from greynirserver_spark.operators.textops import (
    chunk_documents,
    perplexity_buckets,
    unigram_logprob_scores,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_overlap_and_tail(spark):
    text = " ".join(f"w{i}" for i in range(10))  # 10 tokens
    out = sorted(
        (r["chunk_id"], r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(
            _docs(spark, [(1, text)]), max_tokens=4, stride=3
        ).collect()
    )
    # starts 1,4,7,10 -> windows of 4,4,4,1
    assert [c for c, _, _ in out] == [0, 1, 2, 3]
    assert [n for _, n, _ in out] == [4, 4, 4, 1]
    assert out[0][2] == "w0 w1 w2 w3"
    assert out[1][2] == "w3 w4 w5 w6"  # 1-token overlap (4 - 3)
    assert out[3][2] == "w9"


def test_chunk_no_overlap_when_stride_equals_max(spark):
    text = " ".join(f"w{i}" for i in range(9))
    out = chunk_documents(
        _docs(spark, [(1, text)]), max_tokens=3, stride=3
    ).collect()
    rebuilt = " ".join(
        r["chunk_text"]
        for r in sorted(out, key=lambda r: r["chunk_id"])
    )
    assert rebuilt == text  # exact partition of the doc


def test_chunk_edge_cases(spark):
    docs = _docs(spark, [(1, ""), (2, "   "), (3, "one")])
    out = chunk_documents(docs, max_tokens=8, stride=8).collect()
    # zero-token docs emit nothing; a 1-token doc emits one chunk
    assert [(r["doc_id"], r["chunk_text"]) for r in out] == [(3, "one")]
    with pytest.raises(ValueError):
        chunk_documents(docs, max_tokens=0, stride=8)
    with pytest.raises(ValueError):
        chunk_documents(docs, max_tokens=8, stride=0)


def test_chunk_plan_has_no_shuffle(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = (
        chunk_documents(docs, 32, 24)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # embarrassingly parallel


def test_perplexity_buckets_invariants(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rows = perplexity_buckets(docs, n_buckets=3).collect()
    scored = unigram_logprob_scores(docs).count()
    assert len(rows) == scored
    # bucket is monotone in ppl: low ppl -> low bucket
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r["ppl"])
    assert sorted(by_bucket) == [0, 1, 2]
    assert max(by_bucket[0]) <= min(by_bucket[2])
    # ties never straddle buckets
    ppl_to_buckets = {}
    for r in rows:
        ppl_to_buckets.setdefault(r["ppl"], set()).add(r["bucket"])
    assert all(len(b) == 1 for b in ppl_to_buckets.values())
    # roughly balanced (value-level assignment can drift on ties)
    n = len(rows)
    for b in (0, 1, 2):
        assert len(by_bucket[b]) > n // 6


def test_perplexity_single_bucket_and_bad_args(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    one = perplexity_buckets(docs, n_buckets=1).collect()
    assert {r["bucket"] for r in one} == {0}
    with pytest.raises(ValueError):
        perplexity_buckets(docs, n_buckets=0)
