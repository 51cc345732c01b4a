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
