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

__all__ = ["upsert_pages", "dedup_http_https", "extract_links",
           "filter_noindex", "canonical_urls", "dedup_by_canonical",
           "host_of", "site_of"]

_HREF_RE = r'href="([^"#][^"]*)"'


def _path_part(col):
    """The url with ?query / #fragment stripped — RFC 3986 resolves
    relative references against the PATH, and a slash inside a query
    string ('?next=/foo/') must never look like a path directory."""
    return F.regexp_replace(col, r"[?#].*$", "")


def host_of(col):
    """Host component of a url column — THE shared helper for every
    host extraction in the tree (link graph, facets, canonical keys),
    so scheme/port handling has a single point of change."""
    return F.regexp_extract(_path_part(col), r"^https?://([^/]+)", 1)


def site_of(col):
    """scheme://host prefix of a url column (absolutization base)."""
    return F.regexp_extract(_path_part(col), r"^(https?://[^/]+)", 1)


def upsert_pages(
    spark: SparkSession, store_path: str, batch: DataFrame,
    n_buckets: int = 32,
) -> int:
    """MERGE *batch* into the pages store keyed on url (newest wins).

    The store is partitioned into url-hash buckets (``bkt=N``
    directories); a batch rewrites ONLY the buckets it touches — at
    10^12 rows the merge cost is O(batch + touched buckets), never
    O(store), matching the reference's per-url delete+reinsert
    (article.py:473-477) re-expressed as Iceberg's
    ``MERGE INTO pages USING batch ON url``. Each touched bucket swaps
    atomically (staging write + directory rename); untouched buckets
    are not read, not rewritten, not even stat'd.

    Returns the resulting row count.
    """
    batch = batch.dropDuplicates(["url"]).withColumn(
        "bkt", F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int")
    )
    touched = sorted(
        r["bkt"] for r in batch.select("bkt").distinct().collect()
    )
    staging = store_path + f".staging-{uuid.uuid4().hex[:8]}"
    if os.path.isdir(store_path):
        existing_dirs = [
            b for b in touched if os.path.isdir(_bucket_dir(store_path, b))
        ]
        if existing_dirs:
            existing = spark.read.parquet(
                *[_bucket_dir(store_path, b) for b in existing_dirs]
            ).withColumn(
                "bkt", F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int")
            )
            merged = existing.join(
                batch, "url", "left_anti"
            ).unionByName(batch)
        else:
            merged = batch
    else:
        os.makedirs(store_path, exist_ok=True)
        merged = batch
    merged.write.partitionBy("bkt").mode("overwrite").parquet(staging)
    for b in touched:
        src = _bucket_dir(staging, b)
        dst = _bucket_dir(store_path, b)
        if not os.path.isdir(src):
            continue
        tmp_old = dst + ".old"
        if os.path.isdir(dst):
            os.rename(dst, tmp_old)
        os.rename(src, dst)
        shutil.rmtree(tmp_old, ignore_errors=True)
    shutil.rmtree(staging, ignore_errors=True)
    return spark.read.parquet(store_path).count()


def _bucket_dir(root: str, bucket: int) -> str:
    return os.path.join(root, f"bkt={bucket}")


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
    base = site_of(F.col("url"))
    host = host_of(F.col("url"))
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
        df = df.where(host_of(F.col("link")) == F.col("host"))
    return df.select("url", "link").distinct()


def filter_noindex(pages: DataFrame) -> DataFrame:
    """Drop pages whose html carries a robots meta ``noindex``
    directive — the crawl-politeness gate a real web index applies
    before anything else touches the page (the reference's scraper
    honors per-root skip rules, scraper.py; a Common-Crawl replay must
    honor the page's own opt-out instead). Pure JVM regexp over the
    html column, attribute order-insensitive, case-insensitive; rows
    with NULL html are kept (nothing to evaluate)."""
    h = F.lower(F.col("html").cast("string"))
    # name must be the TOKEN robots (quoted exactly, or unquoted and
    # terminated by whitespace / '/' / '>'): 'robotsfoo' must not
    # match. content may be quoted (noindex as a \b token inside the
    # directive list) or unquoted per the HTML spec (value runs to
    # whitespace / '>'; noindex must not be a prefix of a longer word).
    name_is_robots = (
        r'name\s*=\s*(?:["\x27]\s*robots\s*["\x27]|robots(?=[\s/>]))'
    )
    # 'none' is the spec'd shorthand for 'noindex, nofollow' — a page
    # using it has opted out exactly as hard as one saying noindex
    content_noindex = (
        r'content\s*=\s*(?:["\x27][^"\x27]*\b(?:noindex|none)\b'
        r'|[^"\x27\s>]*(?:noindex|none)(?![\w-]))'
    )
    name_first = r"<meta[^>]*" + name_is_robots + r"[^>]*" + content_noindex
    content_first = r"<meta[^>]*" + content_noindex + r"[^>]*" + name_is_robots
    return pages.where(
        F.col("html").isNull()
        | (~h.rlike(name_first) & ~h.rlike(content_first))
    )


def canonical_urls(pages: DataFrame) -> DataFrame:
    """(url, canonical): each page's ``<link rel="canonical">`` target,
    absolutized against the page's own scheme+host (relative canonicals
    are legal). Pages without the tag canonicalize to themselves — so
    the output is a total url->key mapping usable directly as a dedup
    key (grouping mirror/parameter variants of one logical document,
    the exact-dedup key real crawl pipelines prefer over raw url)."""
    base = site_of(F.col("url"))
    scheme = F.regexp_extract("url", r"^(https?):", 1)
    # page directory for RFC 3986 relative resolution (greedy .*/ ⇒ up
    # to the LAST path slash); '' when the url has no path component.
    # Query/fragment are stripped FIRST — a slash inside '?next=/foo/'
    # is not a path directory, and resolving against it would mint
    # different canonical keys for parameter variants of one page
    dirbase = F.regexp_extract(
        _path_part(F.col("url")), r"^(https?://[^/]+/.*/)", 1
    )
    h = F.col("html").cast("string")
    # (?i): tag/attribute names are case-insensitive (<LINK
    # REL="CANONICAL">) but the extracted href keeps its original case
    # — URL paths are case-sensitive, so lowering the html (the
    # filter_noindex approach) would corrupt the key.
    rel_first = (
        r'(?i)<link[^>]*rel\s*=\s*["\x27]?canonical["\x27]?[^>]*'
        r'href\s*=\s*["\x27]([^"\x27]+)["\x27]'
    )
    href_first = (
        r'(?i)<link[^>]*href\s*=\s*["\x27]([^"\x27]+)["\x27]'
        r'[^>]*rel\s*=\s*["\x27]?canonical["\x27]?'
    )
    cand = F.when(
        F.regexp_extract(h, rel_first, 1) != "",
        F.regexp_extract(h, rel_first, 1),
    ).otherwise(F.regexp_extract(h, href_first, 1))
    cand = F.regexp_replace(cand, r"^\./", "")  # href="./x" ≡ href="x"
    canonical = (
        F.when(cand == "", F.col("url"))
        .when(cand.rlike("^https?://"), cand)
        # protocol-relative: inherit the page's scheme, not its host
        .when(cand.startswith("//"), F.concat(scheme, F.lit(":"), cand))
        .when(cand.startswith("/"), F.concat(base, cand))
        # directory-relative: resolve against the page's directory
        .otherwise(
            F.concat(
                F.when(dirbase != "", dirbase)
                .otherwise(F.concat(base, F.lit("/"))),
                cand,
            )
        )
    )
    # NULL html ⇒ every regexp above is NULL ⇒ canonical NULL; such a
    # page must canonicalize to ITSELF — a NULL key would merge all
    # html-less pages into one groupBy group and dedup_by_canonical
    # would silently drop all but one of them.
    canonical = F.coalesce(canonical, F.col("url"))
    return pages.select("url", canonical.alias("canonical"))


def dedup_by_canonical(pages: DataFrame) -> DataFrame:
    """Keep one page per canonical target (smallest url wins — the
    deterministic survivor rule used by the exact-dedup family in
    operators/dedup.py). One groupBy on the canonical key; linear."""
    keyed = pages.join(canonical_urls(pages), "url")
    winners = keyed.groupBy("canonical").agg(F.min("url").alias("url"))
    return pages.join(winners.select("url"), "url")
