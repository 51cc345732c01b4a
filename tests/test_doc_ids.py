"""Regression tests for assign_doc_ids determinism.

Round-1 advisory: the old repartitionByRange implementation ran two
actions over the same range exchange; per-job boundary re-sampling
produced duplicate/gapped doc_ids at 200k rows. The rewrite fixes the
boundaries as driver-collected literals; these tests pin density,
uniqueness and order at a scale where partitions exceed the sampler's
reach.
"""

import pytest
from pyspark.sql import functions as F

from greynirserver_spark.operators.postings import assign_doc_ids


@pytest.mark.parametrize("n,parts", [(5_000, 8), (200_000, 64)])
def test_doc_ids_dense_unique(spark, n, parts):
    df = (
        spark.range(0, n, 1, parts)
        .select(F.md5(F.col("id").cast("string")).alias("url"))
    )
    out = assign_doc_ids(df, "url", num_partitions=parts)
    agg = out.agg(
        F.count("*").alias("n"),
        F.countDistinct("doc_id").alias("nd"),
        F.min("doc_id").alias("mn"),
        F.max("doc_id").alias("mx"),
    ).collect()[0]
    assert agg["n"] == n
    assert agg["nd"] == n, "doc_ids must be unique"
    assert agg["mn"] == 0 and agg["mx"] == n - 1, "doc_ids must be dense"


def test_doc_ids_follow_url_order(spark):
    df = (
        spark.range(0, 3_000, 1, 16)
        .select(F.md5(F.col("id").cast("string")).alias("url"))
    )
    out = assign_doc_ids(df, "url", num_partitions=16).collect()
    by_url = sorted(out, key=lambda r: r["url"])
    assert [r["doc_id"] for r in by_url] == list(range(3_000))


def test_doc_ids_stable_across_runs(spark):
    df = (
        spark.range(0, 2_000, 1, 8)
        .select(F.md5(F.col("id").cast("string")).alias("url"))
    )
    a = {r["url"]: r["doc_id"] for r in assign_doc_ids(df, "url", 8).collect()}
    b = {r["url"]: r["doc_id"] for r in assign_doc_ids(df, "url", 8).collect()}
    assert a == b
