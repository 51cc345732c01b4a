#!/usr/bin/env python
"""spark-submit entry point: ingest WARC containers into an index store.

Usage (same --py-files contract as scripts/submit_example.sh):
    spark-submit --master <cluster> \
        --py-files /tmp/greynirserver_spark.zip \
        scripts/submit_ingest.py <warc_dir> <store_root>

First run builds the store from every container under <warc_dir>;
later runs APPEND only new pages (append_pages' url anti-join skips
already-indexed urls, so re-submitting over a growing archive
directory is idempotent per url). For the continuous form use
streaming/ingest.py::stream_append_to_store(source_format='warc')
with a checkpoint directory instead.
"""

import os
import sys

from pyspark.sql import SparkSession


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit("usage: submit_ingest.py <warc_dir> <store_root>")
    warc_dir, root = sys.argv[1], sys.argv[2]

    spark = SparkSession.builder.appName("greynirserver-ingest").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # imported from the --py-files zip on every executor
    from greynirserver_spark.plans.lineage import (
        IndexStore,
        append_pages,
        build_index_checkpointed,
    )
    from greynirserver_spark.sources.pages import filter_noindex
    from greynirserver_spark.sources.warc import read_warc, warc_to_pages

    pages = filter_noindex(warc_to_pages(read_warc(spark, warc_dir)))
    if os.path.isdir(os.path.join(root, "doc_map")):
        store = IndexStore(root)
        append_pages(spark, store, pages)
        verb = "appended-to"
    else:
        store = build_index_checkpointed(spark, pages, root, n_shards=8)
        verb = "built"
    n = spark.read.parquet(store.doc_map).count()
    print(f"INGEST_OK store={verb} docs={n} root={root}")
    spark.stop()


if __name__ == "__main__":
    main()
