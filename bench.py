#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Also the scaling-evidence tool: run with SPARK_GRAFT_CPUS=8 and =32 on the
same input to measure throughput scaling efficiency (BASELINE.md), since a
real multi-executor cluster isn't available in the sandbox.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0

    from pyspark.sql import functions as F

    from greynirserver_spark.session import get_spark
    from greynirserver_spark.corpus import generate_pages, indexable_stems_by_rank
    from greynirserver_spark.operators import ann as N
    from greynirserver_spark.operators import dedup as D
    from greynirserver_spark.operators import textops as T
    from greynirserver_spark.operators.bm25 import bm25_topk_exact
    from greynirserver_spark.plans.pipeline import build_index, query_to_terms

    spark = get_spark(app_name="greynirserver-bench", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus) if cpus.isdigit() else 32)
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        return out

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_docs = docs.count()

    # --- q1: full-text index build over documents (postings + stats) ---
    def q1():
        p = T.document_postings(docs)
        s = T.document_term_stats(docs)
        return p.count() + s.count()
    timed("q1_index_build_documents", q1)

    # --- q2: BM25 top-k queries (the serving path) ---
    def q2():
        total = 0
        for terms in (["spark", "join"], ["window", "stream", "batch"],
                      ["hash", "table", "scan", "filter"]):
            total += T.bm25_documents_topk(docs, terms, k=20).count()
        return total
    timed("q2_bm25_topk_x3", q2)

    # --- q3: pages pipeline end-to-end (extract -> tokenize -> index -> query)
    n_pages = max(1000, int(2000 * max(sf, 0.05) * 10))
    def q3():
        pages = generate_pages(spark, n_pages)
        idx = build_index(spark, pages, min_df=3)
        head = indexable_stems_by_rank(2)
        terms = query_to_terms(" ".join(head))
        return bm25_topk_exact(
            idx.postings, idx.term_stats, idx.doc_stats, idx.corpus, terms, 20
        ).count()
    timed(f"q3_pages_pipeline_{n_pages}docs", q3)

    # --- q4: dedup family ---
    timed("q4_minhash_lsh", lambda: D.minhash_lsh_pairs(docs, 0.8, bands=8).count())
    timed("q5_simhash", lambda: D.simhash_fingerprints(docs).count())
    timed("q6_ngram_jaccard", lambda: D.ngram_jaccard_pairs(docs, 3, 0.2).count())

    # --- q7: ANN ---
    qvec = [float(x) for x in emb.select("embedding").first()[0]]
    timed("q7_ann_bruteforce", lambda: N.cosine_topk_bruteforce(emb, qvec, 10).count())

    # --- q8: analytics (quality + fingerprints) ---
    timed("q8_quality_scores", lambda: T.quality_scores(docs).count())

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": int(cpus) if cpus.isdigit() else cpus,
        "n_documents": n_docs,
        "pages_docs": n_pages,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
