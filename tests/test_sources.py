"""Pages-store maintenance: upsert (MERGE), url dedup, link spider."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from greynirserver_spark.corpus import generate_pages_pdf
from greynirserver_spark.sources.pages import (
    dedup_http_https,
    extract_links,
    upsert_pages,
)


def test_upsert_pages(spark, tmp_path):
    store = str(tmp_path / "pages")
    p = generate_pages_pdf(50)
    n = upsert_pages(spark, store, spark.createDataFrame(p))
    assert n == 50
    # re-scrape 10 urls with new html + 5 brand-new pages
    rescrape = p.iloc[:10].copy()
    rescrape["text"] = "[[endurunnið]]"
    newp = generate_pages_pdf(5, start=1000)
    batch = spark.createDataFrame(__import__("pandas").concat([rescrape, newp]))
    n2 = upsert_pages(spark, store, batch)
    assert n2 == 55
    out = spark.read.parquet(store)
    assert out.where(F.col("text") == "[[endurunnið]]").count() == 10
    assert out.select("url").distinct().count() == 55


def test_dedup_http_https(spark):
    rows = [
        ("https://a.is/x", 1), ("http://a.is/x", 2),   # twin -> drop http
        ("http://a.is/y", 3),                           # no twin -> keep
        ("https://a.is/z", 4),
    ]
    df = spark.createDataFrame(rows, "url string, v int")
    kept = {r.url for r in dedup_http_https(df).collect()}
    assert kept == {"https://a.is/x", "http://a.is/y", "https://a.is/z"}


def test_extract_links(spark):
    html = (
        '<html><body>'
        '<a href="/innlent/frett-1">a</a>'
        '<a href="https://example.is/b">b</a>'
        '<a href="https://other.com/c">external</a>'
        '<a href="mailto:x@y.is">mail</a>'
        '<a href="rel/path">rel</a>'
        '</body></html>'
    ).encode()
    df = spark.createDataFrame(
        [("https://example.is/page", html)], "url string, html binary"
    )
    links = {r.link for r in extract_links(df).collect()}
    assert links == {
        "https://example.is/innlent/frett-1",
        "https://example.is/b",
        "https://example.is/rel/path",
    }
    all_links = {r.link for r in extract_links(df, same_domain=False).collect()}
    assert "https://other.com/c" in all_links


def test_filter_noindex(spark):
    from greynirserver_spark.sources.pages import filter_noindex

    rows = [
        ("https://a.is/keep", b"<html><head></head><body>x</body></html>"),
        ("https://a.is/drop1",
         b'<html><meta name="robots" content="noindex,nofollow"></html>'),
        ("https://a.is/drop2",
         b"<html><META CONTENT='NOINDEX' NAME=robots></html>"),
        ("https://a.is/keep2",
         b'<html><meta name="robots" content="nofollow"></html>'),
        ("https://a.is/keep3",
         b'<html><meta name="viewport" content="noindex-lookalike">'
         b'</html>'),  # noindex in content but name != robots
        ("https://a.is/nullhtml", None),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    kept = sorted(r.url for r in filter_noindex(pages).collect())
    assert kept == ["https://a.is/keep", "https://a.is/keep2",
                    "https://a.is/keep3", "https://a.is/nullhtml"]


def test_canonical_urls_and_dedup(spark):
    from greynirserver_spark.sources.pages import (
        canonical_urls,
        dedup_by_canonical,
    )

    rows = [
        # absolute canonical, two variants of one doc
        ("https://a.is/page?utm=1",
         b'<html><link rel="canonical" href="https://a.is/page"></html>'),
        ("https://a.is/page?utm=2",
         b'<html><link href="https://a.is/page" rel=canonical></html>'),
        # relative canonical resolves against the page's host
        ("https://a.is/amp/x",
         b'<html><link rel="canonical" href="/x"></html>'),
        # no canonical tag => self
        ("https://a.is/y", b"<html><body>y</body></html>"),
        # stylesheet link must NOT match
        ("https://a.is/z",
         b'<html><link rel="stylesheet" href="/style.css"></html>'),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    canon = {r.url: r.canonical for r in canonical_urls(pages).collect()}
    assert canon["https://a.is/page?utm=1"] == "https://a.is/page"
    assert canon["https://a.is/page?utm=2"] == "https://a.is/page"
    assert canon["https://a.is/amp/x"] == "https://a.is/x"
    assert canon["https://a.is/y"] == "https://a.is/y"
    assert canon["https://a.is/z"] == "https://a.is/z"

    kept = sorted(r.url for r in dedup_by_canonical(pages).collect())
    # one survivor per canonical key, smallest url wins
    assert kept == ["https://a.is/amp/x", "https://a.is/page?utm=1",
                    "https://a.is/y", "https://a.is/z"]


def test_filter_noindex_unquoted_and_token_boundaries(spark):
    """Round-5 review findings: the legal unquoted attribute form must
    be honored, and 'robots'/'noindex' must match as TOKENS, not
    prefixes."""
    from greynirserver_spark.sources.pages import filter_noindex

    rows = [
        # unquoted form is legal HTML and must be DROPPED
        ("https://a.is/unquoted",
         b"<html><meta name=robots content=noindex></html>"),
        ("https://a.is/unquoted2",
         b"<html><meta content=noindex,nofollow name=robots></html>"),
        # prefix lookalikes must be KEPT
        ("https://a.is/prefix",
         b'<html><meta name="robotsfoo" content="noindexy"></html>'),
        ("https://a.is/prefix2",
         b"<html><meta name=robots content=noindexy></html>"),
        ("https://a.is/plain", b"<html><body>ok</body></html>"),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    kept = sorted(r.url for r in filter_noindex(pages).collect())
    assert kept == ["https://a.is/plain", "https://a.is/prefix",
                    "https://a.is/prefix2"]


def test_canonical_urls_case_protocol_relative_and_dirs(spark):
    """Round-5 review findings: uppercase markup, protocol-relative
    hrefs, directory-relative resolution, './' prefix."""
    from greynirserver_spark.sources.pages import canonical_urls

    rows = [
        ("https://a.is/upper",
         b'<html><LINK REL="CANONICAL" HREF="https://a.is/Upper"></html>'),
        ("https://a.is/proto",
         b'<html><link rel="canonical" href="//cdn.b.is/x"></html>'),
        ("https://a.is/dir/page",
         b'<html><link rel="canonical" href="x"></html>'),
        ("https://a.is/dir/page2",
         b'<html><link rel="canonical" href="./x"></html>'),
        ("https://a.is/rootrel",
         b'<html><link rel="canonical" href="x"></html>'),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    canon = {r.url: r.canonical for r in canonical_urls(pages).collect()}
    # href case is PRESERVED (URL paths are case-sensitive)
    assert canon["https://a.is/upper"] == "https://a.is/Upper"
    assert canon["https://a.is/proto"] == "https://cdn.b.is/x"
    assert canon["https://a.is/dir/page"] == "https://a.is/dir/x"
    assert canon["https://a.is/dir/page2"] == "https://a.is/dir/x"
    assert canon["https://a.is/rootrel"] == "https://a.is/x"


def test_dedup_by_canonical_keeps_all_null_html_pages(spark):
    """NULL html must canonicalize to SELF: a NULL groupBy key would
    merge every html-less page into one group and silently drop all
    but one (round-5 review finding)."""
    from greynirserver_spark.sources.pages import dedup_by_canonical

    rows = [("https://a.is/1", None), ("https://b.is/2", None),
            ("https://a.is/3", b"<html>x</html>")]
    pages = spark.createDataFrame(rows, "url string, html binary")
    kept = sorted(r.url for r in dedup_by_canonical(pages).collect())
    assert kept == ["https://a.is/1", "https://a.is/3", "https://b.is/2"]


def test_filter_noindex_none_shorthand(spark):
    """content="none" is the spec'd shorthand for noindex,nofollow —
    an opted-out page must not be ingested (round-5 review finding);
    lookalike words containing 'none' must not over-drop."""
    from greynirserver_spark.sources.pages import filter_noindex

    rows = [
        ("https://a.is/drop-none",
         b'<html><meta name="robots" content="none"></html>'),
        ("https://a.is/drop-none-unq",
         b"<html><meta name=robots content=none></html>"),
        ("https://a.is/keep-lookalike",
         b'<html><meta name="robots" content="nonexistent"></html>'),
        ("https://a.is/keep-plain", b"<html><body>ok</body></html>"),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    kept = sorted(r.url for r in filter_noindex(pages).collect())
    assert kept == ["https://a.is/keep-lookalike", "https://a.is/keep-plain"]


def test_canonical_urls_query_string_slashes(spark):
    """A slash inside ?query must not look like a path directory:
    relative canonicals resolve against the PATH (RFC 3986), so two
    parameter variants of one page share one canonical key (round-5
    review finding)."""
    from greynirserver_spark.sources.pages import canonical_urls

    rows = [
        ("https://a.is/p?next=/foo/",
         b'<html><link rel="canonical" href="x"></html>'),
        ("https://a.is/p?next=/bar/",
         b'<html><link rel="canonical" href="x"></html>'),
        ("https://a.is/dir/p?next=/foo/",
         b'<html><link rel="canonical" href="x"></html>'),
        ("https://a.is/p#frag/ment/",
         b'<html><link rel="canonical" href="x"></html>'),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    canon = {r.url: r.canonical for r in canonical_urls(pages).collect()}
    assert canon["https://a.is/p?next=/foo/"] == "https://a.is/x"
    assert canon["https://a.is/p?next=/bar/"] == "https://a.is/x"
    assert canon["https://a.is/dir/p?next=/foo/"] == "https://a.is/dir/x"
    assert canon["https://a.is/p#frag/ment/"] == "https://a.is/x"
