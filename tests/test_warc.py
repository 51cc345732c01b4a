"""WARC/WET container source: record parsing, round-trip byte
identity, ingest-chain equivalence, and the map-only plan shape."""
import datetime as dt
import gzip

import pytest

from greynirserver_spark.corpus import generate_pages
from greynirserver_spark.sources.warc import (
    export_warc,
    export_wet,
    parse_warc_bytes,
    read_warc,
    read_wet,
    warc_to_pages,
)


def _record(rtype: str, url: str, date: str, block: bytes,
            ctype: str = "application/http; msgtype=response") -> bytes:
    header = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {rtype}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {date}\r\n"
        f"Content-Type: {ctype}\r\n"
        f"Content-Length: {len(block)}\r\n\r\n"
    ).encode()
    return header + block + b"\r\n\r\n"


HTML = "<html><body><p>halló heimur</p></body></html>".encode("utf-8")
HTTP_BLOCK = (
    b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
    b"Content-Length: " + str(len(HTML)).encode() + b"\r\n\r\n" + HTML
)


def _container() -> bytes:
    """warcinfo + request + response + conversion, CC-style order."""
    return (
        _record("warcinfo", "", "2026-01-02T03:04:05Z",
                b"software: test\r\n", ctype="application/warc-fields")
        + _record("request", "http://x.is/a", "2026-01-02T03:04:05Z",
                  b"GET /a HTTP/1.1\r\n\r\n",
                  ctype="application/http; msgtype=request")
        + _record("response", "http://x.is/a", "2026-01-02T03:04:05Z",
                  HTTP_BLOCK)
        + _record("conversion", "http://x.is/a", "2026-01-02T03:04:05Z",
                  "halló heimur".encode(), ctype="text/plain")
    )


def test_parse_warc_bytes_plain_and_multimember_gzip():
    raw = _container()
    recs = list(parse_warc_bytes(raw))
    assert [f["warc-type"] for f, _ in recs] == [
        "warcinfo", "request", "response", "conversion"]
    # body is exactly Content-Length bytes
    assert recs[2][1] == HTTP_BLOCK

    # member-per-record gzip (the Common Crawl layout)
    members = b"".join(
        gzip.compress(_record("response", f"http://x.is/{i}",
                              "2026-01-02T03:04:05Z", HTTP_BLOCK))
        for i in range(3)
    )
    recs = list(parse_warc_bytes(members))
    assert len(recs) == 3
    assert {f["warc-target-uri"] for f, _ in recs} == {
        "http://x.is/0", "http://x.is/1", "http://x.is/2"}


def test_parse_warc_bytes_truncated_tail_drops_last_record_only():
    raw = _container()
    recs_full = list(parse_warc_bytes(raw))
    truncated = raw[:-10]  # cut into the final record's body
    recs = list(parse_warc_bytes(truncated))
    assert len(recs) == len(recs_full) - 1
    # garbage prefix after records ends iteration without raising
    assert list(parse_warc_bytes(raw + b"NOT A RECORD")) and True


def test_http_envelope_chunked_and_content_encoding():
    from greynirserver_spark.sources.warc import _split_http_block

    # chunked transfer framing
    chunked = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n"
        b"5\r\n<html\r\n1\r\n>\r\n0\r\n\r\n"
    )
    status, ctype, body = _split_http_block(chunked)
    assert (status, body) == (200, b"<html>")

    # gzip content-encoding
    gz = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Encoding: gzip\r\n\r\n" + gzip.compress(HTML)
    )
    status, _, body = _split_http_block(gz)
    assert (status, body) == (200, HTML)

    # corrupt gzip degrades to raw bytes, never raises
    bad = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\nnot-gzip"
    )
    assert _split_http_block(bad)[2] == b"not-gzip"

    # malformed chunk framing degrades to raw bytes
    badc = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nzz\r\nx"
    )
    assert _split_http_block(badc)[2] == b"zz\r\nx"


def test_read_warc_filters_types_and_strips_http(spark, tmp_path):
    p = tmp_path / "one.warc.gz"
    p.write_bytes(gzip.compress(_container()))
    rows = read_warc(spark, str(tmp_path)).collect()
    assert len(rows) == 1  # only the response record
    r = rows[0]
    assert r.url == "http://x.is/a"
    assert r.http_status == 200
    assert r.content_type.startswith("text/html")
    assert bytes(r.html) == HTML
    assert r.warc_ts == dt.datetime(2026, 1, 2, 3, 4, 5)

    wet = read_wet(spark, str(tmp_path)).collect()
    assert len(wet) == 1 and wet[0].text == "halló heimur"


def test_read_warc_plan_is_map_only(spark, tmp_path):
    (tmp_path / "x.warc").write_bytes(_container())
    plan = read_warc(spark, str(tmp_path))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan  # scan → parse, no shuffle


def test_export_read_round_trip_byte_identity(spark, tmp_path):
    pages = generate_pages(spark, 30, num_partitions=3)
    out = tmp_path / "export"
    n_files = export_warc(pages, str(out))
    assert 1 <= n_files <= 3

    back = read_warc(spark, str(out) + "/*.warc.gz")
    orig = pages.select(
        "url", pages.warc_ts.alias("ts0"), pages.html.alias("html0"))
    joined = back.join(orig, "url", "full").collect()
    assert len(joined) == 30
    for row in joined:
        assert row.html0 is not None and row.html is not None, row.url
        assert bytes(row.html) == bytes(row.html0), row.url
        assert row.warc_ts == row.ts0, row.url


def test_export_determinism(spark, tmp_path):
    pages = generate_pages(spark, 8, num_partitions=1)
    a, b = tmp_path / "a", tmp_path / "b"
    export_warc(pages, str(a))
    export_warc(pages, str(b))
    fa = sorted(p.name for p in a.iterdir())
    fb = sorted(p.name for p in b.iterdir())
    assert fa == fb
    for name in fa:
        assert (a / name).read_bytes() == (b / name).read_bytes()


def test_wet_round_trip(spark, tmp_path):
    pages = generate_pages(spark, 12, num_partitions=2)
    out = tmp_path / "wet"
    export_wet(pages.select("url", "warc_ts", "text"), str(out))
    back = read_wet(spark, str(out)).withColumnRenamed("text", "text1")
    joined = back.join(pages.select("url", "text"), "url", "full").collect()
    assert len(joined) == 12
    for row in joined:
        assert row.text1 == row.text, row.url


def test_warc_to_pages_matches_direct_ingest(spark, tmp_path):
    """WARC round trip + warc_to_pages reproduces the pages table's own
    extracted text (the byte-identity invariant carried through the
    container format), and language ID fills a plausible lang."""
    pages = generate_pages(spark, 20, num_partitions=2)
    out = tmp_path / "rt"
    export_warc(pages, str(out))
    ingested = warc_to_pages(read_warc(spark, str(out)))
    joined = ingested.select("url", ingested.text.alias("text1"),
                             "lang").join(
        pages.select("url", "text"), "url", "full").collect()
    assert len(joined) == 20
    for row in joined:
        assert row.text1 == row.text, row.url
        assert row.lang is not None and row.lang != ""


def test_warc_to_pages_skips_non_2xx(spark, tmp_path):
    bad = _record(
        "response", "http://x.is/missing", "2026-01-02T03:04:05Z",
        b"HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\n"
        b"<html>nope</html>")
    (tmp_path / "m.warc").write_bytes(_container() + bad)
    warc = read_warc(spark, str(tmp_path / "m.warc"))
    assert warc.count() == 2
    ok = warc_to_pages(warc, extract=False, detect_lang=False)
    urls = [r.url for r in ok.collect()]
    assert urls == ["http://x.is/a"]


def test_stream_warc_append_matches_batch(spark, tmp_path):
    """Containers landing in a directory stream into the index store
    (source_format='warc') and yield the same store contents as a
    one-shot batch append of the same parsed pages."""
    from pyspark.sql import functions as F

    from greynirserver_spark.plans.lineage import (
        append_pages,
        build_index_checkpointed,
    )
    from greynirserver_spark.streaming.ingest import stream_append_to_store

    all_pages = generate_pages(spark, 120).cache()
    h = F.pmod(F.xxhash64("url"), F.lit(3))
    base = all_pages.where(h == 0)
    s_stream = build_index_checkpointed(
        spark, base, str(tmp_path / "s_stream"), n_shards=4)
    s_batch = build_index_checkpointed(
        spark, base, str(tmp_path / "s_batch"), n_shards=4)

    landing = str(tmp_path / "landing")
    export_warc(all_pages.where(h != 0).repartition(2), landing)

    q = stream_append_to_store(
        spark, s_stream, landing, str(tmp_path / "ckpt"),
        max_files_per_trigger=1, source_format="warc",
    )
    q.awaitTermination(120)

    ingested = warc_to_pages(read_warc(spark, landing))
    append_pages(spark, s_batch, ingested)

    urls_stream = sorted(
        r.url for r in spark.read.parquet(s_stream.doc_map).collect())
    urls_batch = sorted(
        r.url for r in spark.read.parquet(s_batch.doc_map).collect())
    assert urls_stream == urls_batch
    assert len(urls_stream) > base.where(F.col("lang") == "is").count() - 1


def test_warc_ingest_feeds_index_build(spark, tmp_path):
    """End-to-end: export → read_warc → warc_to_pages rows carry the
    exact (url, warc_ts, html, text, lang) shape the index build
    consumes — schema and a build-side tokenize both succeed."""
    from greynirserver_spark.tokenization import tokenize_plain_text

    pages = generate_pages(spark, 10, num_partitions=1)
    out = tmp_path / "e2e"
    export_warc(pages, str(out))
    ingested = warc_to_pages(read_warc(spark, str(out)))
    assert [f.name for f in ingested.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang"]
    toks = tokenize_plain_text(ingested.selectExpr("url", "text"))
    assert toks.count() > 0


# ---------------------------------------------------------------- property

from hypothesis import given, settings, strategies as st


@settings(max_examples=200, deadline=None)
@given(
    payloads=st.lists(
        st.binary(min_size=0, max_size=400), min_size=1, max_size=8),
    urls=st.lists(
        st.from_regex(r"https?://[a-z]{1,10}\.is/[a-z0-9/]{0,20}",
                      fullmatch=True),
        min_size=8, max_size=8),
    gz=st.booleans(),
)
def test_record_round_trip_property(payloads, urls, gz):
    """Any byte payload — including bodies containing 'WARC/1.0',
    CRLFs, or gzip magic — survives the writer->parser round trip,
    because record framing is Content-Length-delimited, never
    delimiter-scanned."""
    from greynirserver_spark.sources.warc import (
        _response_record,
        _split_http_block,
        parse_warc_bytes,
    )

    ts = dt.datetime(2026, 3, 4, 5, 6, 7)
    recs = [
        _response_record(urls[i % len(urls)] + str(i), ts, body)
        for i, body in enumerate(payloads)
    ]
    raw = b"".join(gzip.compress(r) for r in recs) if gz else b"".join(recs)
    parsed = list(parse_warc_bytes(raw))
    assert len(parsed) == len(payloads)
    for (fields, block), body, i in zip(
            parsed, payloads, range(len(payloads))):
        assert fields["warc-type"] == "response"
        assert fields["warc-target-uri"] == urls[i % len(urls)] + str(i)
        status, ctype, got = _split_http_block(block)
        assert status == 200
        assert got == body


@settings(max_examples=100, deadline=None)
@given(junk=st.binary(min_size=0, max_size=300))
def test_parser_never_raises_on_garbage(junk):
    from greynirserver_spark.sources.warc import parse_warc_bytes

    list(parse_warc_bytes(junk))
    list(parse_warc_bytes(b"WARC/1.0\r\n" + junk))


def test_parse_warc_bytes_corrupt_gzip_layer_degrades():
    """Gzip-layer corruption must END iteration (keeping records parsed
    so far), never propagate — one bad container among 64k CC files
    loses its tail, not the task (round-5 review finding)."""
    good = gzip.compress(
        _record("response", "http://x.is/ok", "2026-01-02T03:04:05Z",
                HTTP_BLOCK))
    # garbage after the last member: BadGzipFile inside the iterator
    recs = list(parse_warc_bytes(good + b"GARBAGE-NOT-GZIP"))
    assert [f["warc-target-uri"] for f, _ in recs] == ["http://x.is/ok"]
    # truncated second member: EOFError inside the iterator
    two = good + gzip.compress(
        _record("response", "http://x.is/cut", "2026-01-02T03:04:05Z",
                HTTP_BLOCK))
    recs = list(parse_warc_bytes(two[:-30]))
    assert [f["warc-target-uri"] for f, _ in recs] == ["http://x.is/ok"]


def test_split_http_block_corrupt_body_encoding_degrades():
    from greynirserver_spark.sources.warc import _split_http_block

    # truncated gzip body raises EOFError from gzip.decompress
    trunc = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Encoding: gzip\r\n\r\n" + gzip.compress(HTML)[:-3]
    )
    status, _, body = _split_http_block(trunc)
    assert status == 200  # degraded to raw bytes, no raise
    # bit-flipped deflate stream inside a valid gzip header
    blob = bytearray(gzip.compress(HTML))
    blob[12] ^= 0xFF
    corrupt = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Encoding: gzip\r\n\r\n" + bytes(blob)
    )
    status, _, body = _split_http_block(corrupt)
    assert status == 200


def test_export_count_ignores_preexisting_files(spark, tmp_path):
    out = str(tmp_path / "warc_out")
    pages = spark.createDataFrame(
        [("http://x.is/a", dt.datetime(2026, 1, 2), b"<html>a</html>")],
        "url string, warc_ts timestamp, html binary",
    ).repartition(1)
    n1 = export_warc(pages, out)
    assert n1 == 1
    # second export into the SAME dir: count reflects THIS call only
    pages2 = pages.withColumn(
        "url", __import__("pyspark").sql.functions.lit("http://x.is/b"))
    n2 = export_warc(pages2, out)
    assert n2 == 1
    # and no .inprogress temp (hidden or not) survives
    import os
    leftovers = [f for f in os.listdir(out) if "inprogress" in f]
    assert leftovers == []


def test_negative_content_length_does_not_swallow_container():
    """A record claiming Content-Length: -1 must be treated as
    malformed (degrade: lose the tail), NOT turn fh.read(-1) into
    read-to-EOF — which would buffer the whole remaining container as
    one body and silently absorb every later record (round-5 review
    finding)."""
    from greynirserver_spark.sources.warc import parse_warc_bytes

    good = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: http://x.is/good\r\n"
        b"Content-Length: 5\r\n\r\n"
        b"hello\r\n\r\n"
    )
    bad = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: http://x.is/bad\r\n"
        b"Content-Length: -1\r\n\r\n"
    )
    tail = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: http://x.is/tail\r\n"
        b"Content-Length: 4\r\n\r\n"
        b"tail\r\n\r\n"
    )
    recs = list(parse_warc_bytes(good + bad + tail))
    # the good record before the malformed one survives intact...
    assert len(recs) == 1
    fields, body = recs[0]
    assert fields["warc-target-uri"] == "http://x.is/good"
    assert body == b"hello"
    # ...and no record absorbed the remaining stream as its body
    assert all(len(b) <= 5 for _, b in recs)


def test_export_into_nonempty_dir_never_clobbers(spark, tmp_path):
    """A later export into the same landing dir must land under a NEW
    filename: overwriting part-00000 both destroys the earlier
    container and hides the new one from the streaming checkpoint,
    which keys on path (round-5 review finding)."""
    from greynirserver_spark.sources.warc import read_warc

    out = str(tmp_path / "landing")
    pages_a = spark.createDataFrame(
        [("http://x.is/a", dt.datetime(2026, 1, 2), b"<html>a</html>")],
        "url string, warc_ts timestamp, html binary",
    ).repartition(1)
    pages_b = pages_a.withColumn(
        "url", __import__("pyspark").sql.functions.lit("http://x.is/b"))
    assert export_warc(pages_a, out) == 1
    assert export_warc(pages_b, out) == 1
    import os

    names = sorted(f for f in os.listdir(out) if f.endswith(".warc.gz"))
    assert len(names) == 2  # two distinct containers on disk
    urls = sorted(
        r.url for r in read_warc(spark, out + "/*.warc.gz").collect()
    )
    assert urls == ["http://x.is/a", "http://x.is/b"]
    # retry idempotence: re-exporting the SAME data lands on the same
    # content-derived name (byte-identical self-overwrite), never a
    # duplicate container the streaming checkpoint would ingest twice
    assert export_warc(pages_a, out) == 1
    assert sorted(
        f for f in os.listdir(out) if f.endswith(".warc.gz")
    ) == names


def test_warc_to_pages_html_guard_is_bytes_not_chars(spark):
    """The MAX_HTML_BYTES oversize guard counts BYTES on every ingest
    path: a multibyte page over the byte cap but under it in characters
    must extract to '' through warc_to_pages exactly as it does through
    the parquet/streaming path (round-5 review finding — a cast to
    string before the UDF silently changed the unit)."""
    from greynirserver_spark.extraction import MAX_HTML_BYTES, extract_document
    from greynirserver_spark.sources.warc import warc_to_pages

    body = "é" * ((MAX_HTML_BYTES // 2) + 1024)  # 2 bytes/char in utf-8
    html = f"<html><body>{body}</body></html>".encode()
    assert len(html) > MAX_HTML_BYTES
    assert len(html.decode()) < MAX_HTML_BYTES
    assert extract_document(html) == ""  # the direct-path ground truth

    df = spark.createDataFrame(
        [("http://x.is/big", dt.datetime(2026, 1, 2), html)],
        "url string, warc_ts timestamp, html binary",
    )
    out = warc_to_pages(df, ok_only=False, detect_lang=False).collect()
    assert len(out) == 1
    assert out[0].text == ""
