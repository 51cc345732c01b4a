"""Corpus-shaping operators: span dedup, source cap, source stats."""

import pytest


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )


@pytest.fixture(scope="module")
def webclean():
    from greynirserver_spark.operators import webclean as W

    return W


def test_span_dedup_keeps_first_occurrence(spark, webclean):
    # span=2: doc 1 = [a b][c d], doc 2 repeats [a b] twice and adds [e]
    docs = _docs(spark, [
        (1, "a b c d", "s"),
        (2, "a b a b e", "s"),
    ])
    out = {
        r["doc_id"]: r
        for r in webclean.span_dedup(docs, span=2).collect()
    }
    assert out[1]["n_spans"] == 2 and out[1]["n_removed"] == 0
    assert out[1]["clean_text"] == "a b c d"
    # both of doc 2's "a b" spans lose to doc 1's first occurrence
    assert out[2]["n_spans"] == 3 and out[2]["n_removed"] == 2
    assert out[2]["clean_text"] == "e"


def test_span_dedup_within_document_duplicates(spark, webclean):
    docs = _docs(spark, [(7, "x y x y", "s")])
    row = webclean.span_dedup(docs, span=2).collect()[0]
    # second [x y] inside the SAME doc is removed; first kept
    assert row["n_spans"] == 2 and row["n_removed"] == 1
    assert row["clean_text"] == "x y"


def test_span_dedup_short_and_empty_docs(spark, webclean):
    docs = _docs(spark, [
        (1, "solo", "s"),          # shorter than span -> one tail chunk
        (2, "", "s"),              # no tokens at all
    ])
    out = {
        r["doc_id"]: r
        for r in webclean.span_dedup(docs, span=16).collect()
    }
    assert out[1]["n_spans"] == 1 and out[1]["clean_text"] == "solo"
    assert out[2]["n_spans"] == 0 and out[2]["n_removed"] == 0
    assert out[2]["clean_text"] == ""


def test_span_dedup_tail_chunk_not_merged_across_spans(spark, webclean):
    # 5 tokens at span=2 -> [a b][c d][e]; the tail [e] is its own span
    docs = _docs(spark, [(1, "a b c d e", "s")])
    row = webclean.span_dedup(docs, span=2).collect()[0]
    assert row["n_spans"] == 3
    assert row["clean_text"] == "a b c d e"


def test_source_cap_sample_matches_global_window(spark, webclean):
    from pyspark.sql import Window, functions as F

    rows = [(i, f"text {i}", f"src{i % 3}") for i in range(60)]
    docs = _docs(spark, rows).repartition(7)  # multiple input partitions
    got = {
        (r["doc_id"], r["source"], r["rk"])
        for r in webclean.source_cap_sample(docs, cap=4).collect()
    }
    # naive single-window reference on the same priority key
    w = Window.partitionBy("source").orderBy("rkey", "doc_id")
    want = {
        (r["doc_id"], r["source"], r["rk"])
        for r in docs.select(
            "doc_id", "source",
            F.md5(F.concat_ws(":", "source",
                              F.col("doc_id").cast("string")))
            .alias("rkey"),
        )
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .where("rk <= 4")
        .collect()
    }
    assert got == want
    assert len(got) == 12  # 3 sources x cap 4


def test_source_cap_sample_small_groups_kept_whole(spark, webclean):
    docs = _docs(spark, [(1, "a", "only"), (2, "b", "only")])
    got = webclean.source_cap_sample(docs, cap=10).collect()
    assert len(got) == 2
    assert {r["rk"] for r in got} == {1, 2}


def test_source_stats_share_and_skew(spark, webclean):
    docs = _docs(spark, [
        (1, "aaaa", "big"), (2, "bb", "big"), (3, "cc", "big"),
        (4, "d", "small"),
    ])
    out = {r["source"]: r for r in webclean.source_stats(docs).collect()}
    assert out["big"]["n_docs"] == 3 and out["big"]["total_chars"] == 8
    assert out["big"]["docs_share"] == 0.75
    # mean docs/source = 2 -> big skew 1.5, small 0.5
    assert out["big"]["skew_ratio"] == 1.5
    assert out["small"]["skew_ratio"] == 0.5


def test_span_dedup_plan_has_no_cartesian_and_partial_agg(spark, webclean):
    docs = _docs(spark, [(i, f"w{i} w{i + 1} common chunk", "s")
                         for i in range(10)])
    plan = webclean.span_dedup(docs, span=2)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "partial" in plan.lower()  # map-side combine on the digest agg


def test_source_token_report_exact_quantiles(spark):
    """Hand-computed type-1 quantiles, zero-token docs included, and
    the histogram plan never buffers per-group values."""
    from pyspark.sql import functions as F
    from greynirserver_spark.operators.webclean import source_token_report

    # source a: token counts [1,2,3,4,10]; source b: [0 (empty), 5]
    rows = [
        (1, "a", "x"), (2, "a", "x y"), (3, "a", "x y z"),
        (4, "a", "x y z w"), (5, "a", " ".join(["t"] * 10)),
        (6, "b", ""), (7, "b", "a b c d e"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    out = {r["source"]: r for r in source_token_report(docs).collect()}
    a, b = out["a"], out["b"]
    assert a["n_docs"] == 5 and a["total_tokens"] == 20
    # rank ceil(50*5/100)=3 -> 3rd smallest = 3; ceil(90*5/100)=5 -> 10
    assert a["q50_tokens"] == 3 and a["q90_tokens"] == 10
    assert a["mean_tokens"] == 4.0
    # empty doc participates: counts [0,5]; rank 1 -> 0, rank 2 -> 5
    assert b["n_docs"] == 2 and b["q50_tokens"] == 0
    assert b["q90_tokens"] == 5

    plan = (
        source_token_report(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "percentile" not in plan.lower()
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
