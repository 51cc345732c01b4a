"""Batch-WAND query-count scaling: per-query cost must stay flat as the
batch grows (round-4 verdict item #5 — the per-task (query, shard) loop
now skips pairs whose terms miss the shard via a term->qids inverted
index, so a 10^3-query batch does no O(shard blocks) work for absent
queries).

Builds one store, then times wand_topk_batch at 12 / 60 / 120 queries
(best-of-3 each) and prints per-query milliseconds per batch size.
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from greynirserver_spark.session import get_spark
from greynirserver_spark.corpus import generate_pages, indexable_stems_by_rank
from greynirserver_spark.operators.wand import wand_topk_batch
from greynirserver_spark.plans.lineage import build_index_checkpointed
from greynirserver_spark.plans.pipeline import query_to_terms


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_pages = int(os.environ.get("SPARK_GRAFT_PAGES", "20000"))
    reps = int(os.environ.get("SPARK_GRAFT_QUERY_REPS", "3"))
    spark = get_spark(app_name="wand-batch-scaling",
                      master=f"local[{cpus}]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(0, 256, 1, 256).mapInPandas(lambda it: it, "id long").count()

    root = f"/tmp/wand-batch-{os.getpid()}"
    from pyspark import StorageLevel

    pages = generate_pages(spark, n_pages).persist(StorageLevel.DISK_ONLY)
    pages.count()
    store = build_index_checkpointed(spark, pages, root, n_shards=64,
                                     min_df=3)
    segments = store.load_segments(spark).cache()
    segments.count()
    corpus = store.load(spark, "corpus").cache()

    # distinct 2-term queries from the indexable stem inventory; larger
    # batches reuse the pool cyclically with a rotating second term so
    # every qid is a distinct term set
    stems = indexable_stems_by_rank(40)
    pool = [
        query_to_terms(f"{stems[i % len(stems)]} "
                       f"{stems[(i * 7 + 3) % len(stems)]}")
        for i in range(200)
    ]
    out = {}
    for n in (12, 60, 120):
        queries = {f"q{i}": pool[i] for i in range(n)}
        vals = []
        for _ in range(reps):
            t0 = time.perf_counter()
            wand_topk_batch(segments, queries, corpus, 10).collect()
            vals.append(round(time.perf_counter() - t0, 3))
        best = min(vals)
        out[f"batch{n}"] = {
            "total_s": best,
            "per_query_ms": round(1000 * best / n, 1),
            "reps": vals,
        }
    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({"pages": n_pages, "cpus": int(cpus), **out}))
    spark.stop()


if __name__ == "__main__":
    main()
