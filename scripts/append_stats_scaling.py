#!/usr/bin/env python
"""Evidence for round-4 item #1: the append loop's term-stats step is
vocabulary-independent.

Three designs timed against term-count stores of growing vocabulary,
with an identical fixed 2k-term batch delta:

* ``lsm_append_step`` — ROUND 4: write the delta as one log-structured
  run (operators/runstore.py, zero store reads) + derive the delta
  blocks' placeholder stats from the batch alone. Must be FLAT.
* ``inplace_merge`` — what any read-modify-write design degenerates to
  when a realistic batch's thousands of terms touch every partition
  (round 3's hash-bucketed "touched buckets only" MERGE was exactly
  this in disguise): read the whole store, sum in the delta, rewrite
  the whole store.
* ``full_derive`` — round 3's additional term_stats table rewrite
  (derive idf over the full counts + write).

Also timed: ``query_idf_lookup`` — the serving-side cost the LSM
design moves the work to: current idf for 4 query terms against the
store WITH pending runs (a point read; the price of exact pre-rebuild
ranking, paid per unique query instead of per append × vocabulary).

Usage: python scripts/append_stats_scaling.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parents[1])
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    from pyspark.sql import functions as F

    from greynirserver_spark.operators.postings import (
        append_term_counts_run,
        compact_term_counts,
        derive_term_stats,
        load_term_counts,
    )
    from greynirserver_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="append-stats-scaling",
                      master=f"local[{cpus}]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(0, 64, 1, 64).mapInPandas(lambda it: it, "id long").count()

    def terms_df(n, prefix):
        return spark.range(n).select(
            F.concat(F.lit(prefix), F.col("id")).alias("term"),
            (F.col("id") % 97 + 3).cast("long").alias("df"),
            (F.col("id") % 997 + 5).cast("long").alias("cf"),
        )

    corpus = spark.createDataFrame(
        [(10_000_000, 450.0, 4_500_000_000)],
        "n_docs long, avgdl double, total_doclen long",
    )
    delta = terms_df(2_000, "t").cache()
    delta.count()
    lookup_terms = ["t11", "t501", "t90007", "t1300333"]

    out = {"delta_terms": 2000, "reps": 3, "sizes": []}
    for vocab in (20_000, 200_000, 2_000_000):
        root = f"/tmp/append-stats-scaling-{os.getpid()}-{vocab}"
        broot = root + "-inplace"
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(broot, ignore_errors=True)
        compact_term_counts(
            spark, root, terms_df(vocab, "t").sortWithinPartitions("term")
        )
        terms_df(vocab, "t").write.mode("overwrite").parquet(broot)

        lsm_times, lookup_times = [], []
        for i in range(3):
            t0 = time.perf_counter()
            append_term_counts_run(spark, root, delta, run_id=f"r{i}")
            # placeholder stats: batch-local, no store read
            derive_term_stats(delta, corpus, min_df=1).count()
            lsm_times.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            (derive_term_stats(
                load_term_counts(spark, root)
                .where(F.col("term").isin(lookup_terms)),
                corpus, min_df=3,
            ).collect())
            lookup_times.append(time.perf_counter() - t0)

        bkt_times = []
        for _ in range(3):
            t0 = time.perf_counter()
            merged = (
                spark.read.parquet(broot).unionByName(delta)
                .groupBy("term")
                .agg(F.sum("df").cast("long").alias("df"),
                     F.sum("cf").cast("long").alias("cf"))
            )
            staging = broot + ".staging"
            merged.write.mode("overwrite").parquet(staging)
            shutil.rmtree(broot)
            os.rename(staging, broot)
            spark.catalog.refreshByPath(broot)
            bkt_times.append(time.perf_counter() - t0)

        ts_path = root + "-term_stats"
        derive_times = []
        for _ in range(3):
            t0 = time.perf_counter()
            derive_term_stats(
                load_term_counts(spark, root), corpus, min_df=3
            ).write.mode("overwrite").parquet(ts_path)
            derive_times.append(time.perf_counter() - t0)

        out["sizes"].append({
            "vocab": vocab,
            "lsm_append_step_sec_best": round(min(lsm_times), 3),
            "query_idf_lookup_sec_best": round(min(lookup_times), 3),
            "inplace_merge_sec_best": round(min(bkt_times), 3),
            "full_derive_sec_best": round(min(derive_times), 3),
        })
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(broot, ignore_errors=True)
        shutil.rmtree(ts_path, ignore_errors=True)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
