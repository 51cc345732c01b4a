#!/usr/bin/env python
"""Second-wave isolation measurements for round 6: q1 build stage split,
q4 minhash stage decomposition, q6 ngram stage decomposition.

Usage: python scripts/measure_r06b.py [q1|q4|q6|all]
$SPARK_GRAFT_SF_DIR points at the documents/embeddings dir
(default /root/scale_data/sf1.0c — the statistical sf1.0 clone).
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/scale_data/sf1.0c")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark import StorageLevel

    from greynirserver_spark.operators import dedup as D
    from greynirserver_spark.session import get_spark

    spark = get_spark(app_name="measure-r06b", master=f"local[{cpus}]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(0, 256, 1, 256).mapInPandas(lambda it: it, "id long").count()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out: dict = {}

    def timed(name, fn, reps=3):
        vals = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            fn()
            vals.append(round(time.perf_counter() - t0, 3))
        out[name] = {"best": min(vals), "reps": vals}
        spark.sparkContext.setJobDescription(None)
        return out[name]["best"]

    if which in ("q1", "all"):
        from greynirserver_spark.corpus import generate_pages
        from greynirserver_spark.plans.lineage import build_index_checkpointed

        n_pages = int(os.environ.get("SPARK_GRAFT_PAGES", "200000"))
        pages = generate_pages(spark, n_pages).persist(StorageLevel.DISK_ONLY)
        pages.count()
        warm = f"/tmp/m6b-warm-{os.getpid()}"
        build_index_checkpointed(spark, pages.limit(max(800, n_pages // 5)),
                                 warm, n_shards=64, min_df=3)
        shutil.rmtree(warm, ignore_errors=True)
        reps = []
        for r in range(3):
            root = f"/tmp/m6b-build-{os.getpid()}-r{r}"
            t0 = time.perf_counter()
            build_index_checkpointed(spark, pages, root, n_shards=64,
                                     min_df=3)
            reps.append(round(time.perf_counter() - t0, 3))
            import glob

            stg: dict = {}
            for fp in glob.glob(f"{root}/_lineage/*.json"):
                rec = json.load(open(fp))
                if isinstance(rec, dict) and "stage" in rec:
                    stg[rec["stage"]] = (
                        stg.get(rec["stage"], 0) + rec.get("wall_ms", 0)
                    )
            out[f"q1_rep{r}_stage_ms"] = stg
            shutil.rmtree(root, ignore_errors=True)
        out["q1_full_build"] = {"best": min(reps), "reps": reps}
        pages.unpersist()

    if which in ("q4", "all"):
        # stage decomposition mirrors the internals of minhash_lsh_pairs
        from greynirserver_spark.operators.dedup import (
            minhash_signatures, token_hash_sets)

        timed("q4_full", lambda: D.minhash_lsh_pairs(
            docs, 0.8, bands=8).count())
        groups = (
            token_hash_sets(docs).groupBy("ths")
            .agg(F.min("doc_id").alias("set_id"),
                 F.sort_array(F.collect_list("doc_id")).alias("members"))
            .persist(StorageLevel.DISK_ONLY)
        )
        timed("q4_groups_materialize", groups.count)
        sigs = minhash_signatures(
            docs, ths=groups.select(F.col("set_id").alias("doc_id"), "ths")
        ).cache()
        timed("q4_sigs", sigs.count, reps=1)
        groups.unpersist()
        sigs.unpersist()

    if which in ("q6", "all"):
        from greynirserver_spark.operators.dedup import ngram_shingles

        timed("q6_full", lambda: D.ngram_jaccard_pairs(
            docs, 3, 0.2).count())
        sh = ngram_shingles(docs, 3).persist(StorageLevel.DISK_ONLY)
        timed("q6_shingles_materialize", sh.count, reps=1)
        sh.unpersist()

    print(json.dumps({"sf_dir": sf_dir, "cpus": cpus, "out": out}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
