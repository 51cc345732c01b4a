"""Pages-store maintenance: upsert, URL normalization, link extraction.

The reference's ingest-side row operations re-expressed as set
operations over an immutable store:

* :func:`upsert_pages` — re-scraped URLs replace their old rows
  (reference deletes + reinserts per url, article.py:473-477); here it
  is one anti-join + union + atomic rewrite — the Iceberg
  ``MERGE INTO pages USING batch ON url`` pattern, Parquet-faithful.
* :func:`dedup_http_https` — when both http:// and https:// twins of a
  URL exist, keep https (reference scraper.py:152-153).
* :func:`extract_links` — same-domain child-URL extraction from HTML
  (the link spider, fetcher.py:324-376) as JVM-side regexp over the
  html column + explode + anti-join against known URLs; no live
  fetching — the corpus arrives as a table.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["upsert_pages", "dedup_http_https", "extract_links"]

_HREF_RE = r'href="([^"#][^"]*)"'


def upsert_pages(spark: SparkSession, store_path: str, batch: DataFrame) -> int:
    """MERGE *batch* into the pages store keyed on url (newest wins).

    Atomic: staging write + directory rename, like the segment commits.
    Returns the resulting row count. On Iceberg this is a single
    ``MERGE INTO`` transaction; the rewrite here is the Parquet
    equivalent (and at 10^12 rows you partition the store by url-hash
    bucket and rewrite only touched buckets — same pattern as the
    per-shard segment commits).
    """
    batch = batch.dropDuplicates(["url"])
    if os.path.isdir(store_path):
        existing = spark.read.parquet(store_path)
        merged = existing.join(batch, "url", "left_anti").unionByName(batch)
    else:
        merged = batch
    staging = store_path + f".staging-{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(staging)
    if os.path.isdir(store_path):
        shutil.rmtree(store_path)
    os.rename(staging, store_path)
    return spark.read.parquet(store_path).count()


def dedup_http_https(pages: DataFrame) -> DataFrame:
    """Drop http:// rows whose https:// twin exists (keep https)."""
    https = (
        pages.where(F.col("url").startswith("https://"))
        .select(
            F.concat(
                F.lit("http://"), F.substring("url", 9, 1 << 20)
            ).alias("url")
        )
    )
    return pages.join(https, "url", "left_anti")


def extract_links(pages: DataFrame, same_domain: bool = True) -> DataFrame:
    """(url, link): absolute child links found in each page's html.

    Relative hrefs resolve against the page's scheme+host root;
    fragments and non-http(s) schemes are dropped; *same_domain*
    restricts to the page's own host (the spider's root rule,
    fetcher.py:345-349).
    """
    base = F.regexp_extract("url", r"^(https?://[^/]+)", 1)
    host = F.regexp_extract("url", r"^https?://([^/]+)", 1)
    raw = F.regexp_extract_all(
        F.col("html").cast("string"), F.lit(_HREF_RE), F.lit(1)
    )
    df = (
        pages.select("url", base.alias("base"), host.alias("host"),
                     F.explode(raw).alias("href"))
        .where(~F.col("href").startswith("javascript:")
               & ~F.col("href").startswith("mailto:"))
        .withColumn(
            "link",
            F.when(F.col("href").startswith("http"), F.col("href"))
            .when(F.col("href").startswith("/"),
                  F.concat(F.col("base"), F.col("href")))
            .otherwise(F.concat(F.col("base"), F.lit("/"), F.col("href"))),
        )
        .where(F.col("link").rlike("^https?://"))
    )
    if same_domain:
        df = df.where(
            F.regexp_extract("link", r"^https?://([^/]+)", 1) == F.col("host")
        )
    return df.select("url", "link").distinct()
