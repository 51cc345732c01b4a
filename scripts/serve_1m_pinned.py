#!/usr/bin/env python
"""Pin the 1M-page serving latency with repetitions (round-3 verdict
item #5: BENCH_r03 recorded a single-shot 1M WAND p50 of 984ms vs the
round-2 addendum's 503ms; run-to-run serving spread at this store size
is documented at 1.3-2x, so single shots are not comparable).

Protocol: build a 1M-page store once (same parameters as the bench's
q1), then run the 12-query WAND batch and the 12-query Searcher batch
REPS times each; per query take the best (min) latency — the
reproducible steady-state number — and report p50/p99 over those
minima, plus the raw per-rep medians so the spread itself is recorded.

Usage: python scripts/serve_1m_pinned.py [n_pages] [reps]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parents[1])
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from greynirserver_spark.corpus import (
        generate_pages,
        indexable_stems_by_rank,
    )
    from greynirserver_spark.operators.wand import wand_topk
    from greynirserver_spark.plans.lineage import build_index_checkpointed
    from greynirserver_spark.plans.pipeline import query_to_terms
    from greynirserver_spark.query.searcher import Searcher
    from greynirserver_spark.session import get_spark

    spark = get_spark(app_name="serve-1m-pinned", master=f"local[{cpus}]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(0, 256, 1, 256).mapInPandas(lambda it: it, "id long").count()

    from pyspark import StorageLevel

    pages = generate_pages(spark, n_pages).persist(StorageLevel.DISK_ONLY)
    pages.count()
    root = f"/tmp/serve1m-{os.getpid()}"
    shutil.rmtree(root, ignore_errors=True)
    t0 = time.perf_counter()
    store = build_index_checkpointed(spark, pages, root, n_shards=64,
                                     min_df=3)
    build_s = time.perf_counter() - t0
    pages.unpersist()

    segments = store.load_segments(spark).cache()
    segments.count()
    corpus = store.load(spark, "corpus").cache()
    stems = indexable_stems_by_rank(24)
    queries = [
        query_to_terms(" ".join(stems[2 * (i % 6): 2 * (i % 6) + 2]))
        for i in range(12)
    ]

    def run_wand() -> list:
        lat = []
        for q in queries:
            t = time.perf_counter()
            wand_topk(segments, q, corpus, 10).collect()
            lat.append(time.perf_counter() - t)
        return lat

    wand_reps = [run_wand() for _ in range(reps)]
    best_w = [min(r[i] for r in wand_reps) for i in range(len(queries))]

    searcher = Searcher(spark, store, cache_ttl_s=0.0)
    def run_searcher() -> list:
        lat = []
        for q in queries:
            t = time.perf_counter()
            searcher.search(q, 10)
            lat.append(time.perf_counter() - t)
        return lat

    # cache_ttl_s=0 above: every rep re-executes the scan (the TTL cache
    # would otherwise serve rep 2+ from memory and measure a dict lookup)
    s_reps = [run_searcher() for _ in range(reps)]
    best_s = [min(r[i] for r in s_reps) for i in range(len(queries))]

    def p(v, q):
        s = sorted(v)
        return s[max(0, min(len(s) - 1, int(len(s) * q) - (q == 1.0)))]

    out = {
        "n_pages": n_pages,
        "reps": reps,
        "cpus": cpus,
        "build_seconds": round(build_s, 1),
        "build_docs_per_sec": round(n_pages / build_s, 1),
        "wand_p50_ms_best": round(statistics.median(best_w) * 1000),
        "wand_p99_ms_best": round(p(best_w, 0.99) * 1000),
        "wand_p50_ms_per_rep": [
            round(statistics.median(r) * 1000) for r in wand_reps
        ],
        "searcher_p50_ms_best": round(statistics.median(best_s) * 1000),
        "searcher_p99_ms_best": round(p(best_s, 0.99) * 1000),
        "searcher_p50_ms_per_rep": [
            round(statistics.median(r) * 1000) for r in s_reps
        ],
    }
    print(json.dumps(out))
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
