"""URL canonicalization — the dedup key a web-scale crawl pipeline
actually joins on.

The reference engine keys its entire article store on the raw URL
string (/root/reference/article.py: `url` is the primary key and the
scrape loop's MERGE key), which double-stores any page reachable under
scheme/host-case, default-port, trailing-slash, tracking-parameter or
fragment variants. At crawl scale the same page commonly arrives under
dozens of such spellings; canonicalizing before the URL-keyed upsert
(`lineage.upsert_pages`) or exact-dedup pass collapses them for free.

Everything here is row-local JVM codegen — `regexp_extract` parses the
URL into (scheme, host, port, path, query); array ops filter tracking
parameters and sort the remainder; `concat` rebuilds. No UDF, no
shuffle (`url_dup_groups` adds the single partial-agg groupBy a dedup
needs). Every expression has an exact DuckDB twin, so the driver
oracle checks the canonical form byte-for-byte.

Canonicalization rules (the conservative, safe-everywhere subset):
* scheme and host lowercased; a leading ``www.`` stripped from host
* default ports dropped (``:80`` for http, ``:443`` for https);
  non-default ports kept
* duplicate ``//`` in the path collapsed, one trailing ``/`` stripped
* query parameters: tracking keys removed (``utm_*``, ``fbclid``,
  ``gclid``, ``ref``), the rest SORTED so parameter order is
  insignificant; an emptied query drops its ``?``
* the fragment is always dropped
Path case and scheme identity are preserved (paths are case-sensitive
and http-vs-https may serve different content — unifying either is a
lossy guess, not canonicalization).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["canonical_url", "normalize_urls", "url_dup_groups",
           "incremental_url_seen", "fetch_plan", "TRACKING_PARAM_RE"]

# query parameters that never identify content (RE2/Java common subset)
TRACKING_PARAM_RE = "^(utm_[^=]*|fbclid|gclid|ref)="

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]*)"
_PORT_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/:?#]*:([0-9]+)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def canonical_url(url: Column) -> Column:
    """The canonical form of *url* as a single JVM expression tree."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    host = F.regexp_replace(
        F.lower(F.regexp_extract(url, _HOST_RE, 1)), r"^www\.", ""
    )
    port = F.regexp_extract(url, _PORT_RE, 1)
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    path = F.regexp_replace(
        F.regexp_replace(F.regexp_extract(url, _PATH_RE, 1), "//+", "/"),
        "/$", "",
    )
    query = F.array_join(
        F.array_sort(
            F.filter(
                F.split(F.regexp_extract(url, _QUERY_RE, 1), "&"),
                lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
            )
        ),
        "&",
    )
    return F.when(
        (scheme == "") | (host == ""),
        F.lit(None).cast("string"),  # not an absolute URL: no safe key
    ).otherwise(
        F.concat(
            scheme, F.lit("://"), host,
            F.when(keep_port, F.concat(F.lit(":"), port))
            .otherwise(F.lit("")),
            path,
            F.when(query != "", F.concat(F.lit("?"), query))
            .otherwise(F.lit("")),
        )
    )


def normalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """(doc_id, url, canonical_url) — row-local, zero-shuffle."""
    return df.select(
        "doc_id", url_col, canonical_url(F.col(url_col)).alias("canonical_url")
    )


def url_dup_groups(df: DataFrame, url_col: str = "url") -> DataFrame:
    """(canonical_url, n_urls, min_doc_id): spelling variants collapsed
    per canonical form — the crawl-frontier / upsert dedup key. One
    partial-agg groupBy; at 10^12 URLs the canonical string is the
    shuffle key and the map-side combine folds each page's variant
    cluster before the exchange. Unparseable URLs (NULL canonical) are
    dropped rather than grouped — at crawl scale a junk-URL flood would
    otherwise fold into one skewed NULL key."""
    return (
        normalize_urls(df, url_col)
        .where(F.col("canonical_url").isNotNull())
        .groupBy("canonical_url")
        .agg(
            F.count("*").cast("long").alias("n_urls"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )


def incremental_url_seen(
    spark,
    store_root: str,
    new_urls: DataFrame,
    url_col: str = "url",
    run_id=None,
) -> DataFrame:
    """Crawl-frontier gate — the reference's scrape loop re-fetches a
    URL list every 30 minutes and upserts on the raw url string
    (/root/reference/scraper.py, article.py); at crawl scale the
    frontier must instead ask "which of these candidate URLs have we
    EVER seen?" without re-reading the corpus. This is that gate on the
    log-structured key store (`operators/runstore.py`, the same
    substrate as the MinHash/embedding incremental gates).

    Returns every batch row tagged (doc_id, url, canonical_url, status):
    * ``invalid``   — no canonical key (relative/garbage URL)
    * ``dup_store`` — canonical key already in the accumulated store
    * ``dup_batch`` — first seen in THIS batch, but an earlier batch row
                      (smaller doc_id) claims the key
    * ``new``       — first sighting anywhere; exactly these keys are
                      appended to the store as one O(batch) run
                      (crash-safe, replay-deduped by *run_id*)

    Scale shape: the batch side is always the small side, so the
    store-membership probe BROADCASTS the batch's distinct keys against
    the store scan — the 10^12-key store is scanned (columnar, single
    key column) but never shuffled, and everything else is
    batch × batch. Processing batches in doc_id order makes the union
    of ``new`` rows across batches equal the one-shot
    `url_dup_groups` keep-first survivors (test-pinned).
    """
    from .runstore import append_run, load_rows

    norm = normalize_urls(new_urls, url_col)
    valid = norm.where(F.col("canonical_url").isNotNull())
    firsts = valid.groupBy("canonical_url").agg(
        F.min("doc_id").alias("first_id")
    )
    store = load_rows(spark, store_root)
    if store is not None:
        known = (
            store.join(F.broadcast(firsts), "canonical_url")
            .select("canonical_url")
            .distinct()
            .withColumn("in_store", F.lit(True))
        )
    else:
        known = None
    tagged = norm.join(F.broadcast(firsts), "canonical_url", "left")
    if known is not None:
        tagged = tagged.join(F.broadcast(known), "canonical_url", "left")
    else:
        tagged = tagged.withColumn("in_store", F.lit(None).cast("boolean"))
    out = tagged.select(
        "doc_id", url_col, "canonical_url",
        F.when(F.col("canonical_url").isNull(), "invalid")
        .when(F.col("in_store"), "dup_store")
        .when(F.col("doc_id") != F.col("first_id"), "dup_batch")
        .otherwise("new")
        .alias("status"),
    )
    # materialize BEFORE the append: the lazy plan lists store files at
    # action time and must not see the batch's own run as "stored"
    out = out.localCheckpoint(eager=True)
    new_keys = (
        out.where(F.col("status") == "new").select("canonical_url")
    )
    append_run(spark, store_root, new_keys, run_id=run_id)
    return out


def fetch_plan(
    df: DataFrame, url_col: str = "url", per_host: int = 4
) -> DataFrame:
    """(url, host, wave, slot): politeness-scheduled fetch plan — the
    reference scrapes per-root with one helper process per news root
    and an implicit one-at-a-time budget per site
    (/root/reference/scraper.py::Scraper._scrape_single_root); at
    crawl scale the same invariant is "at most *per_host* in-flight
    fetches per host per wave".  Rows are numbered within their host
    (deterministic order: canonical URL) and cut into waves of
    *per_host*; a scheduler executes wave 0 across all hosts, then
    wave 1, never exceeding the per-host budget while keeping every
    host busy — the long tail of small hosts finishes in wave 0 and
    the plan's depth is ceil(max_host_frontier / per_host).

    Scale shape: one window partitioned by host.  A single host's
    frontier lands in one partition, which is exactly the politeness
    constraint's locality (its wave assignment is a per-host serial
    order); pathological single-host floods should be capped upstream
    with ``source_cap_sample`` (operators/webclean.py), the same
    composition a real frontier uses.  Unparseable URLs are dropped,
    as in ``url_dup_groups``.
    """
    from pyspark.sql import Window

    canon = canonical_url(F.col(url_col))
    host = F.regexp_replace(
        F.lower(F.regexp_extract(F.col(url_col), _HOST_RE, 1)),
        r"^www\.", "",
    )
    # tiebreak on the raw url: distinct spellings of the SAME canonical
    # form otherwise tie and the wave split becomes nondeterministic
    w = Window.partitionBy("host").orderBy("canonical_url", "url")
    return (
        df.select(
            F.col(url_col).alias("url"),
            host.alias("host"),
            canon.alias("canonical_url"),
        )
        .where(F.col("canonical_url").isNotNull())
        .withColumn("rn", F.row_number().over(w))
        .select(
            "url", "host",
            ((F.col("rn") - 1) / per_host).cast("long").alias("wave"),
            ((F.col("rn") - 1) % per_host).cast("long").alias("slot"),
        )
    )
