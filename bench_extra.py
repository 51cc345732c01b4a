#!/usr/bin/env python
"""Isolation benchmarks for the round-6 optimization targets (guide §1.4).

NOT the driver's bench (bench.py is frozen); this times each optimized
operator alone, best-of-3, on $SPARK_GRAFT_SF_DIR (default sf1.0) so the
per-operator before/after numbers in OPTIMIZATION_r06.md can be
reproduced without running the whole suite. Prints one JSON line.
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
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark import StorageLevel

    from greynirserver_spark.operators import ann as N
    from greynirserver_spark.operators import dedup as D
    from greynirserver_spark.operators import textops as T
    from greynirserver_spark.session import get_spark

    spark = get_spark(app_name="bench-extra", master=f"local[{cpus}]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(0, 256, 1, 256).mapInPandas(lambda it: it, "id long").count()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    timings: dict[str, float] = {}

    def timed(name, fn, reps=3):
        vals = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            fn()
            vals.append(round(time.perf_counter() - t0, 3))
        timings[name] = min(vals)
        timings[name + "_reps"] = vals

    timed("semdedup_survivors", lambda: N.semantic_dedup_survivors(
        emb, k_cells=8, threshold=0.35).count())
    timed("minhash_lsh_pairs", lambda: D.minhash_lsh_pairs(
        docs, 0.8, bands=8).count())
    timed("simhash_fingerprints",
          lambda: D.simhash_fingerprints(docs).count())

    doc_postings = T.document_postings(docs).persist(StorageLevel.DISK_ONLY)
    doc_postings.count()

    def bm25_x9():
        for terms in (["spark", "join"], ["window", "stream", "batch"],
                      ["hash", "table", "scan", "filter"]):
            T.bm25_documents_topk(
                docs, terms, k=20, postings=doc_postings).count()

    timed("bm25_exact_x3", bm25_x9)

    print(json.dumps({
        "metric": "r06_isolation_seconds", "sf_dir": sf_dir,
        "cpus": cpus, "timings": timings,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
