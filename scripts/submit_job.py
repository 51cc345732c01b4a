#!/usr/bin/env python
"""spark-submit entry point: build an index and run one query.

Usage (see scripts/submit_example.sh):
    spark-submit --master local-cluster[2,4,4096] \
        --py-files /tmp/greynirserver_spark.zip \
        scripts/submit_job.py <n_pages> <store_root>

This is the north rule's execution contract — the same invocation shape
works on a real standalone/YARN/K8s cluster.
"""

import sys

from pyspark.sql import SparkSession


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    root = sys.argv[2] if len(sys.argv) > 2 else "/tmp/submit-store"

    spark = SparkSession.builder.appName("greynirserver-submit").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # imported from the --py-files zip on every executor
    from greynirserver_spark.corpus import generate_pages, indexable_stems_by_rank
    from greynirserver_spark.plans.lineage import build_index_checkpointed
    from greynirserver_spark.plans.pipeline import query_to_terms
    from greynirserver_spark.query.router import Router

    pages = generate_pages(spark, n_pages)
    store = build_index_checkpointed(spark, pages, root, n_shards=8)
    router = Router(spark, store)
    terms = indexable_stems_by_rank(2)
    ans = router.execute(" ".join(terms), k=5)
    rows = ans.df.collect()
    print(f"SUBMIT_OK qtype={ans.qtype} hits={len(rows)} "
          f"top={rows[0].url if rows else None}")
    spark.stop()


if __name__ == "__main__":
    main()
