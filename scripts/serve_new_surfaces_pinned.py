#!/usr/bin/env python
"""Pin the large-store latency of the round-5 serving surfaces —
boolean (MUST/SHOULD/MUST_NOT), prefix wildcard, ordered NEAR,
hit_count and snippets — with the serve_1m_pinned best-of-reps
protocol (per query take min over reps; report p50 over the minima +
per-rep medians so the spread is in the artifact).

Usage: python scripts/serve_new_surfaces_pinned.py [n_pages] [reps]
       [--positions]
--positions additionally builds the positional store (heavier build)
and measures ordered_near/near; without it those rows are omitted.
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
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    with_pos = "--positions" in sys.argv
    n_pages = int(args[0]) if args else 300_000
    reps = int(args[1]) if len(args) > 1 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from greynirserver_spark.corpus import (
        generate_pages,
        indexable_stems_by_rank,
    )
    from greynirserver_spark.plans.lineage import build_index_checkpointed
    from greynirserver_spark.plans.pipeline import query_to_terms
    from greynirserver_spark.query.searcher import Searcher
    from greynirserver_spark.session import get_spark

    spark = get_spark(app_name="serve-new-pinned", master=f"local[{cpus}]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(0, 256, 1, 256).mapInPandas(lambda it: it, "id long").count()

    from pyspark import StorageLevel

    pages = generate_pages(spark, n_pages).persist(StorageLevel.DISK_ONLY)
    pages.count()
    root = f"/tmp/servenew-{os.getpid()}"
    shutil.rmtree(root, ignore_errors=True)
    t0 = time.perf_counter()
    store = build_index_checkpointed(
        spark, pages, root, n_shards=64, min_df=3,
        with_positions=with_pos,
    )
    build_s = time.perf_counter() - t0
    pages.unpersist()

    stems = indexable_stems_by_rank(64)
    searcher = Searcher(spark, store, cache_ttl_s=0.0)

    def pin(name, thunk_per_query, out, spread):
        lat_reps = []
        for _ in range(reps):
            lat_reps.append([t() for t in thunk_per_query])
        best = [min(r[i] for r in lat_reps)
                for i in range(len(thunk_per_query))]
        out[f"{name}_p50_ms_best"] = round(
            statistics.median(best) * 1000
        )
        spread[f"{name}_p50_ms_per_rep"] = [
            round(statistics.median(r) * 1000) for r in lat_reps
        ]

    def timer(fn):
        def t():
            t0 = time.perf_counter()
            fn()
            return time.perf_counter() - t0
        return t

    bool_specs = [
        (query_to_terms(" ".join(stems[2 * i: 2 * i + 2])),
         query_to_terms(stems[20 + i]),
         query_to_terms(stems[40 + i]))
        for i in range(6)
    ]
    prefixes = [query_to_terms(stems[i])[0][:3] for i in range(6)]
    search_qs = [
        query_to_terms(" ".join(stems[2 * i: 2 * i + 2]))
        for i in range(6)
    ]

    out: dict = {
        "n_pages": n_pages, "reps": reps, "cpus": cpus,
        "with_positions": with_pos,
        "build_seconds": round(build_s, 1),
        "build_docs_per_sec": round(n_pages / build_s, 1),
    }
    spread: dict = {}
    pin("boolean", [
        timer(lambda m=m, s=s, n=n: searcher.boolean(
            m, should=s, must_not=n, k=10))
        for m, s, n in bool_specs
    ], out, spread)
    pin("prefix", [
        timer(lambda p=p: searcher.prefix(p, k=10, max_expand=16))
        for p in prefixes
    ], out, spread)
    pin("hit_count", [
        timer(lambda q=q: __import__(
            "greynirserver_spark.operators.wand", fromlist=["x"]
        ).matched_docs(searcher._segments, q).count())
        for q in search_qs[:3]
    ], out, spread)
    pin("snippets", [
        timer(lambda q=q: searcher.snippets(q, k=10, width=12))
        for q in search_qs[:3]
    ], out, spread)
    syn_specs = [
        (search_qs[i], query_to_terms(stems[30 + i]))
        for i in range(3)
    ]
    pin("synonym", [
        timer(lambda g=g, e=e: searcher.synonym(
            [list(g)] + [[t] for t in e], k=10))
        for g, e in syn_specs
    ], out, spread)
    pin("collapsed", [
        timer(lambda q=q: searcher.search_collapsed(
            q, k=10, per_domain=2))
        for q in search_qs[:3]
    ], out, spread)
    pin("suggest", [
        timer(lambda p=p: searcher.suggest(p, k=10))
        for p in prefixes[:3]
    ], out, spread)
    explain_targets = [
        (q, searcher.search(q, 1)[0][0]) for q in search_qs[:3]
    ]
    pin("explain", [
        timer(lambda q=q, d=d: searcher.explain(q, d))
        for q, d in explain_targets
    ], out, spread)
    if with_pos:
        near_qs = [query_to_terms(" ".join(stems[i:i + 2]))
                   for i in range(0, 6, 2)]
        pin("ordered_near", [
            timer(lambda q=q: searcher.ordered_near(q, window=8, k=10))
            for q in near_qs
        ], out, spread)
        pin("near", [
            timer(lambda q=q: searcher.near(q, window=8, k=10))
            for q in near_qs
        ], out, spread)
    out["rep_spread"] = spread
    print(json.dumps(out))
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
