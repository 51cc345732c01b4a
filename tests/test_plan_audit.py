"""Physical-plan audits: the plans must be the ones that survive 100 TB.

Each test asserts a property of the formatted Catalyst plan:
pushdown reaching the scan, broadcast joins for dimensions, partial
aggregation, TakeOrderedAndProject for top-k, bounded exchange counts,
whole-stage codegen in the tokenizer.
"""

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from greynirserver_spark.corpus import generate_pages_pdf, vocabulary
from greynirserver_spark.operators.postings import build_postings
from greynirserver_spark.operators.textops import (
    bm25_documents_topk,
    document_postings,
)
from greynirserver_spark.tokenization import apply_index_filter, tokenize_marked_text


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


@pytest.fixture(scope="module")
def seg_store(spark, tmp_path_factory):
    from greynirserver_spark.plans.lineage import build_index_checkpointed

    pages = spark.createDataFrame(generate_pages_pdf(120))
    root = str(tmp_path_factory.mktemp("plan") / "store")
    return build_index_checkpointed(spark, pages, root, n_shards=4,
                                    block_size=32)


def test_term_filter_pushed_to_segment_scan(spark, seg_store):
    segs = seg_store.load_segments(spark)
    plan = _plan(segs.where(F.col("term").isin("a/hk", "b/kk")))
    assert "PushedFilters: [In(term" in plan, plan
    # column pruning: a metadata-only projection must not read postings
    plan2 = _plan(
        segs.where(F.col("term") == "a/hk").select("term", "block_max")
    )
    assert "ReadSchema" in plan2
    read_schema = [l for l in plan2.splitlines() if "ReadSchema" in l][0]
    assert "docs" not in read_schema and "tfs" not in read_schema, read_schema


def test_shard_partition_pruning(spark, seg_store):
    segs = seg_store.load_segments(spark)
    plan = _plan(segs.where(F.col("shard") == 2))
    # partition-column filter: pruned at planning, never a data filter
    assert "PartitionFilters: [" in plan and "shard" in plan.split(
        "PartitionFilters:"
    )[1].split("]")[0], plan


def test_vocab_join_is_broadcast(spark, docs):
    vocab = spark.createDataFrame(vocabulary()[["stem", "cat"]])
    toks = tokenize_marked_text(
        docs.select(F.col("doc_id"), F.col("text")), vocab
    )
    plan = _plan(apply_index_filter(toks, spark))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan  # dims must never SMJ


def test_postings_agg_is_partial_then_final(spark, docs):
    plan = _plan(document_postings(docs))
    # two HashAggregates around one exchange = map-side partial agg
    assert "partial_count" in plan, plan
    assert plan.count("HashAggregate") >= 2, plan
    assert "hashpartitioning" in plan, plan


def test_topk_is_take_ordered(spark, docs):
    plan = _plan(
        document_postings(docs)
        .orderBy(F.desc("tf"), F.asc("doc_id"))
        .limit(10)
    )
    assert "TakeOrderedAndProject" in plan, plan


def test_tokenizer_is_whole_stage_codegen(spark, docs):
    from greynirserver_spark.operators.textops import document_tokens

    plan = _plan(document_tokens(docs))
    assert "codegen id" in plan, plan  # the whole pipeline is one codegen stage
    # and no Python evaluation node in the hot path
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_bm25_exchange_budget(spark, docs):
    """The exact BM25 plan must keep dims broadcast (no SortMergeJoin
    anywhere) and stay within a bounded exchange count. The static plan
    shows the postings subtree under each consumer; at runtime the
    cached postings cut it to one execution."""
    plan = _plan(bm25_documents_topk(docs, ["spark", "join"], k=10))
    assert "SortMergeJoin" not in plan, plan
    n_exchange = plan.count(") Exchange")
    assert n_exchange <= 12, f"{n_exchange} exchanges\n{plan}"
    assert "BroadcastHashJoin" in plan  # term stats + corpus broadcast


def test_segment_encode_has_no_single_partition_exchange(spark, docs):
    """Term-id assignment must never funnel the vocabulary through one
    task (round-2: row_number() OVER (ORDER BY term) planned an
    Exchange SinglePartition; a df-pruned Common-Crawl vocabulary is
    still 10^8+ terms). The whole encode plan must be free of
    single-partition exchanges."""
    from greynirserver_spark.operators.postings import (
        build_doc_stats,
        build_term_stats,
        corpus_stats,
    )
    from greynirserver_spark.operators.segments import build_segments

    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("term")
    )
    postings = build_postings(toks.select("doc_id", "term"))
    doc_stats = build_doc_stats(postings)
    corpus = corpus_stats(doc_stats)
    term_stats = build_term_stats(postings, min_df=3, corpus=corpus)
    segs = build_segments(postings, term_stats, doc_stats, corpus,
                          n_shards=4, block_size=32)
    plan = _plan(segs)
    assert "Exchange SinglePartition" not in plan, plan


def test_positional_scan_prunes_on_term(spark, tmp_path_factory):
    """The phrase query's `term IN (...)` must reach the positional
    segment parquet scan as a pushed filter, and only the binary block
    columns + metadata may be read (no full-store scan)."""
    from greynirserver_spark.corpus import generate_pages_pdf
    from greynirserver_spark.operators.phrase import positional_postings
    from greynirserver_spark.operators.posindex import (
        build_positional_segments,
        phrase_topk_positional_segments,
    )

    docs = spark.createDataFrame(generate_pages_pdf(60)).selectExpr(
        "cast(xxhash64(url) as long) as doc_id", "text"
    )
    pos = positional_postings(docs)
    path = str(tmp_path_factory.mktemp("ppl") / "pseg")
    build_positional_segments(pos, n_shards=4, block_size=16).repartition(
        "shard"
    ).sortWithinPartitions("term", "block_id").write.partitionBy(
        "shard"
    ).parquet(path)
    segs = spark.read.parquet(path)
    plan = _plan(phrase_topk_positional_segments(segs, spark, ["a", "b"], 5))
    assert "PushedFilters: [In(term, [a,b])]" in plan, plan


def test_round5_serving_ops_plans(spark, docs):
    """New round-5 operators: no cartesian product anywhere; the
    term→group mapping and group stats join broadcast; the collapse
    window partitions by the collapse key (no global sort before the
    final top-k cut)."""
    from greynirserver_spark.operators.textops import (
        bm25_score_breakdown,
        bm25_synonym_topk,
        bm25_topk_source_collapsed,
        suggest_terms,
    )

    plans = {
        "collapsed": _plan(bm25_topk_source_collapsed(
            docs, ["spark", "join"], k=10, per_source=2)),
        "breakdown": _plan(bm25_score_breakdown(
            docs, ["spark", "join"], k=5)),
        "synonym": _plan(bm25_synonym_topk(
            docs, [["spark", "stream"], ["join"]], k=10)),
        "suggest": _plan(suggest_terms(docs, "s", k=10)),
    }
    for name, p in plans.items():
        assert "CartesianProduct" not in p, name
    assert "BroadcastHashJoin" in plans["synonym"]
    # the per-source window sorts within key partitions, not globally
    assert "source" in plans["collapsed"]


def test_bm25f_topk_is_take_ordered(spark, docs):
    """BM25F's final cut must be TakeOrderedAndProject over the scored
    match set, not a global unpartitioned row_number window (round-5
    verdict's named scale-killer: a head-term query would funnel the
    whole match set through one partition)."""
    from greynirserver_spark.operators.bm25f import bm25f_documents_topk

    out = bm25f_documents_topk(docs, ["spark", "join"], k=20, lazy=True)
    plan = _plan(out)
    assert "TakeOrderedAndProject" in plan, plan
