#!/usr/bin/env python
"""Perfect-partitioning ceiling: 4 fully independent JVMs vs 1.

The strongest single-box scaling evidence possible: run the SAME stage
as 4 concurrent, completely independent local[8] Spark sessions (own
JVM, own driver, own input quarter, zero cross-process traffic) — the
physical upper bound of what ANY engine could achieve on this box with
4 nodes' worth of parallelism, because there is no coordination left to
remove. Compare against one local[8] session on one quarter:

    eff_ceiling = (4 quarters done concurrently) / (1 quarter alone) / 4
                = t_single / t_concurrent4

If a pipeline stage's measured 4N/N efficiency (scaling_cluster.py)
matches this ceiling, the gap to 0.8 is the box's shared memory bus and
SMT, not the engine: on 4 real nodes the independent-JVM layout IS the
cluster layout, and it would scale by construction.

Each worker builds its own quarter corpus (seeded by worker id), runs
the stage once for warmup and once measured, and writes its measured
seconds to a file. The orchestrator launches 1 worker (baseline) then 4
concurrently, and appends the comparison to BENCH.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parents[1])
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

QUARTER_PAGES = int(os.environ.get("SPARK_GRAFT_QUARTER_PAGES", "75000"))
STAGES = ["extract", "tokenize", "encode"]


def _worker(stage: str, wid: int, n_pages: int) -> None:
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from greynirserver_spark.corpus import generate_pages
    from greynirserver_spark.extraction import extract_text_udf
    from greynirserver_spark.operators.postings import (
        build_doc_stats, build_postings, build_term_stats, corpus_stats,
    )
    from greynirserver_spark.operators.segments import build_segments
    from greynirserver_spark.plans.pipeline import _vocab_df
    from greynirserver_spark.session import get_spark
    from greynirserver_spark.tokenization import (
        apply_index_filter, tokenize_marked_text,
    )

    spark = get_spark(app_name=f"conc-{stage}-{wid}", master="local[8]",
                      shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(0, 64, 1, 64).mapInPandas(lambda it: it, "id long").count()

    # disjoint quarter per worker: shift the url/doc space by wid
    pages = generate_pages(spark, n_pages).withColumn(
        "url", F.concat(F.lit(f"w{wid}-"), F.col("url"))
    ).persist(StorageLevel.DISK_ONLY)
    pages.count()

    def run_once() -> None:
        if stage == "extract":
            pages.agg(
                F.sum(F.length(extract_text_udf()(F.col("html"))))
            ).collect()
            return
        texts = pages.select(
            "url", "text"
        ).withColumn("doc_id", F.pmod(F.xxhash64("url"), F.lit(n_pages * 4)))
        toks = tokenize_marked_text(texts.select("doc_id", "text"),
                                    vocab=_vocab_df(spark))
        postings = build_postings(
            apply_index_filter(toks, spark).select("doc_id", "term")
        )
        if stage == "tokenize":
            postings.agg(F.count("*")).collect()
            return
        postings = postings.persist(StorageLevel.DISK_ONLY)
        postings.count()
        doc_stats = build_doc_stats(postings).persist(StorageLevel.DISK_ONLY)
        corpus = corpus_stats(doc_stats)
        term_stats = build_term_stats(postings, min_df=3, corpus=corpus)
        build_segments(postings, term_stats, doc_stats, corpus,
                       n_shards=16).agg(F.count("*")).collect()
        postings.unpersist()
        doc_stats.unpersist()

    run_once()  # warmup (JIT, python workers)
    t0 = time.perf_counter()
    run_once()
    dt = time.perf_counter() - t0
    Path(f"/tmp/conc-{stage}-{wid}.json").write_text(
        json.dumps({"sec": dt})
    )
    spark.stop()


def _launch(stage: str, wid: int) -> subprocess.Popen:
    return subprocess.Popen(
        [sys.executable, __file__, "--worker", stage, str(wid),
         str(QUARTER_PAGES)],
        cwd=_REPO, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        _worker(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
        return

    rows = []
    for stage in STAGES:
        # baseline: one quarter, alone on the box
        p = _launch(stage, 0)
        p.wait()
        t_single = json.loads(
            Path(f"/tmp/conc-{stage}-0.json").read_text())["sec"]

        # 4 quarters concurrently, fully independent JVMs
        t0 = time.perf_counter()
        procs = [_launch(stage, w) for w in (1, 2, 3, 4)]
        for p in procs:
            p.wait()
        # workers include their own warmup; use the max of the four
        # measured sections (the straggler defines cluster throughput)
        t_conc = max(
            json.loads(Path(f"/tmp/conc-{stage}-{w}.json").read_text())["sec"]
            for w in (1, 2, 3, 4)
        )
        eff = t_single / t_conc
        rows.append((stage, t_single, t_conc, eff))
        print(f"{stage}: single-quarter {t_single:.1f}s, "
              f"4x concurrent straggler {t_conc:.1f}s, ceiling eff {eff:.3f}",
              file=sys.stderr)

    lines = [
        "",
        f"## Perfect-partitioning ceiling — 4 independent JVMs "
        f"(quarter={QUARTER_PAGES} pages)",
        "",
        "4 fully independent local[8] sessions on disjoint quarters — the",
        "zero-coordination layout a 4-node cluster realizes physically.",
        "eff = t(1 quarter alone) / t(4 quarters concurrent, straggler).",
        "No engine can beat this on this box; a stage whose measured 4N/N",
        "efficiency reaches this ceiling scales by construction on real",
        "nodes (the only removed resource is the shared memory bus/SMT).",
        "",
        "| stage | 1 quarter alone | 4x concurrent (straggler) | ceiling eff |",
        "|---|---|---|---|",
    ]
    for stage, ts, tc, eff in rows:
        lines.append(f"| {stage} | {ts:.1f}s | {tc:.1f}s | {eff:.3f} |")
    with open(os.path.join(_REPO, "BENCH.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({s: round(e, 3) for s, _, _, e in rows}))


if __name__ == "__main__":
    main()
