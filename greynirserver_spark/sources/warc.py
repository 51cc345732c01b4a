"""WARC / WET ingestion and export — Common Crawl's native container.

The reference acquires its corpus by live HTTP scraping
(``/root/reference/fetcher.py:324-376`` fetches one URL at a time with
requests + BeautifulSoup); at 10^12-document scale the corpus arrives
instead as WARC container files (ISO 28500): Common Crawl publishes
~64,000 ~1 GiB ``.warc.gz`` files per monthly crawl (~100 TB raw),
plus WET siblings holding pre-extracted plain text as ``conversion``
records. This module connects those containers to the canonical pages
schema ``(url, warc_ts, html, text, lang)`` in both directions:

* :func:`read_warc` — DataFrame over ``.warc``/``.warc.gz`` files.
  Spark's ``binaryFile`` source yields one row per container file and
  ``mapInPandas`` streams records out of each, so the parallelism
  grain is the container file — the same unit Common Crawl's own
  published Spark jobs use. 64k files keep 64k tasks busy regardless
  of record count, task memory is bounded by ONE container (CC caps
  them ~1 GiB; ``binaryFile`` itself enforces < 2 GiB), and no shuffle
  happens at all: scan → parse → downstream, a map-only stage.
* :func:`read_wet` — the same over WET extracted-text records.
* :func:`warc_to_pages` — strip the stored HTTP envelope and
  (optionally) run the package's own extraction + language-ID so the
  result lands upsert-ready for :func:`..sources.pages.upsert_pages`
  and :func:`..plans.lineage.build_index`.
* :func:`export_warc` / :func:`export_wet` — the inverse sinks: each
  partition writes one ``.warc.gz`` with one gzip member per record
  (the Common Crawl layout, which lets a reader seek to any record
  boundary), executor-side via ``foreachPartition`` — a corpus slice
  round-trips back out without any driver materialization.

Parsing is pure stdlib (``gzip`` + bytes splitting) — no external WARC
library exists in this environment and none is needed: a WARC record
is a CRLF header block, a ``Content-Length``-delimited body, and a
blank-line trailer.
"""

from __future__ import annotations

import datetime as dt
import gzip
import hashlib
import io
import os
import uuid
from typing import Iterable, Iterator, List, Optional, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = [
    "read_warc",
    "read_wet",
    "warc_to_pages",
    "export_warc",
    "export_wet",
    "parse_warc_bytes",
    "parse_warc_stream",
    "parse_warc_df",
    "BINARYFILE_SCHEMA",
]

# Rows per pandas batch emitted from one container file. Bounds the
# Arrow transfer (and the parser's row buffer) regardless of how many
# records a container holds.
_BATCH_ROWS = 512

_WARC_SCHEMA = (
    "url string, warc_ts timestamp, record_type string, "
    "http_status int, content_type string, html binary, "
    "warc_file string"
)
_WET_SCHEMA = "url string, warc_ts timestamp, text string, warc_file string"


# ---------------------------------------------------------------------------
# record-level parsing (plain Python; unit-testable without Spark)
# ---------------------------------------------------------------------------

def _parse_warc_ts(value: str) -> Optional[dt.datetime]:
    """WARC-Date (ISO 8601, 'Z'-suffixed, optional fraction) → naive
    UTC datetime — the convention of the pages table (session TZ is
    pinned to UTC in session.py)."""
    v = value.strip()
    if v.endswith("Z"):
        v = v[:-1]
    for fmt in ("%Y-%m-%dT%H:%M:%S.%f", "%Y-%m-%dT%H:%M:%S"):
        try:
            return dt.datetime.strptime(v, fmt)
        except ValueError:
            continue
    return None


def _fmt_warc_ts(ts: dt.datetime) -> str:
    if ts.microsecond:
        return ts.strftime("%Y-%m-%dT%H:%M:%S.%fZ")
    return ts.strftime("%Y-%m-%dT%H:%M:%SZ")


def _dechunk(body: bytes) -> bytes:
    """Decode HTTP/1.1 chunked transfer framing (size-in-hex CRLF chunk
    CRLF ... 0 CRLF). Malformed framing returns the body as-is — a
    truncated capture should degrade, not fail the task."""
    out, i, n = [], 0, len(body)
    while i < n:
        eol = body.find(b"\r\n", i)
        if eol < 0:
            return body
        size_tok = body[i:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            return body
        if size == 0:
            break
        start = eol + 2
        if start + size > n:
            return body
        out.append(body[start:start + size])
        i = start + size + 2  # skip chunk-terminating CRLF
    return b"".join(out)


def _split_http_block(block: bytes) -> Tuple[Optional[int], Optional[str], bytes]:
    """(status, content_type, body) from a stored HTTP response.

    WARC ``response`` records store the raw HTTP message; the payload
    starts after the first blank line. Real Common Crawl captures keep
    the wire framing, so ``Transfer-Encoding: chunked`` is de-chunked
    and a gzip/deflate ``Content-Encoding`` is decompressed (falling
    back to the raw bytes if the stream is corrupt). A block that does
    not look like HTTP (no status line) is returned whole with
    (None, None)."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0 or not block.startswith(b"HTTP/"):
        return None, None, block
    head = block[:sep].decode("latin-1", errors="replace")
    lines = head.split("\r\n")
    status: Optional[int] = None
    parts = lines[0].split()
    if len(parts) >= 2 and parts[1].isdigit():
        status = int(parts[1])
    ctype: Optional[str] = None
    t_enc = c_enc = ""
    for line in lines[1:]:
        k, _, v = line.partition(":")
        k = k.strip().lower()
        if k == "content-type" and ctype is None:
            ctype = v.strip()
        elif k == "transfer-encoding":
            t_enc = v.strip().lower()
        elif k == "content-encoding":
            c_enc = v.strip().lower()
    body = block[sep + 4:]
    if "chunked" in t_enc:
        body = _dechunk(body)
    if c_enc in ("gzip", "x-gzip"):
        # BadGzipFile is OSError, truncation is EOFError, corrupt
        # deflate inside a valid gzip header is zlib.error — a capture
        # with a mangled body must degrade to raw bytes, never fail
        # the ingest task.
        import zlib

        try:
            body = gzip.decompress(body)
        except (OSError, EOFError, zlib.error):
            pass
    elif c_enc == "deflate":
        import zlib

        try:
            body = zlib.decompress(body)
        except zlib.error:
            try:
                body = zlib.decompress(body, -zlib.MAX_WBITS)
            except zlib.error:
                pass
    return status, ctype, body


def parse_warc_stream(fh) -> Iterator[Tuple[dict, bytes]]:
    """Yield (header-fields, body-bytes) per record from a binary
    file-like object (plain or already-wrapped gzip stream).

    Header field names are lower-cased. The body is exactly
    ``Content-Length`` bytes; the inter-record CRLF padding is skipped.
    Malformed trailing garbage ends iteration rather than raising —
    a truncated tail file loses its last record, never the whole task.

    STREAMING: memory is bounded by ONE record, never the container.
    A Common Crawl container is ~1 GiB gzipped / 4-5 GiB decompressed;
    decompress-then-scan would spike every task by that much, which is
    exactly the pattern that fell over in the 600k-page scaling
    measurement (BENCH.md) — this reads through ``GzipFile`` line by
    line instead, holding only the current record's body.

    Gzip-layer corruption (a truncated download raising ``EOFError``,
    garbage after the last member raising ``BadGzipFile``, a corrupt
    deflate stream raising ``zlib.error``) ALSO ends iteration instead
    of propagating: one bad container among Common Crawl's ~64k files
    must lose its tail records, not fail the whole Spark task — the
    same degrade-don't-fail contract as the framing checks below.
    """
    import zlib

    try:
        while True:
            # skip inter-record CRLF padding, find the version line
            line = fh.readline()
            while line in (b"\r\n", b"\n"):
                line = fh.readline()
            if not line:
                return
            if not line.startswith(b"WARC/"):
                return  # trailing garbage / truncation
            fields: dict = {}
            while True:
                line = fh.readline()
                if not line:
                    return  # truncated header
                if line in (b"\r\n", b"\n"):
                    break
                k, _, v = line.decode("utf-8", "replace").partition(":")
                fields[k.strip().lower()] = v.strip()
            try:
                length = int(fields.get("content-length", "0"))
            except ValueError:
                return
            if length < 0:
                # a negative Content-Length would turn fh.read(length)
                # into read-to-EOF: one malformed header swallowing the
                # whole remaining container (and its records) into a
                # single body — treat it as malformed like ValueError
                return
            body = fh.read(length)
            if len(body) < length:
                return  # truncated final record
            yield fields, body
    except (EOFError, OSError, zlib.error):
        return  # corrupt gzip layer: keep records parsed so far


class _TolerantGzipReader(io.RawIOBase):
    """Streaming multi-member gzip decoder that turns corruption into
    clean EOF instead of raising.

    ``GzipFile`` cannot provide this: its ``read(size)`` loops across
    member boundaries inside ONE call and, on hitting garbage where the
    next member header should be, raises ``BadGzipFile`` and DISCARDS
    the decompressed bytes it already produced (measured — the whole
    container parses to zero records). Decoding member-by-member with
    ``zlib.decompressobj(31)`` keeps every byte decoded before the
    corrupt region: a garbage tail or truncated download costs the
    records at and after it, never the container. Memory stays bounded
    by one compressed chunk + ``max_length`` of decompressed output."""

    _CHUNK = 1 << 16

    def __init__(self, fh) -> None:
        import zlib

        self._fh = fh  # the COMPRESSED byte stream
        self._zlib = zlib
        self._dec = zlib.decompressobj(31)  # 31 = gzip wrapper
        self._pending = b""  # compressed bytes awaiting the decoder

    def readable(self) -> bool:
        return True

    def readinto(self, b) -> int:
        want = len(b)
        while True:
            chunk = self._pending
            self._pending = b""
            if not chunk:
                chunk = self._fh.read(self._CHUNK)
                if not chunk:
                    return 0  # true EOF
            try:
                out = self._dec.decompress(chunk, want)
            except self._zlib.error:
                return 0  # corrupt member / garbage tail: clean EOF
            if self._dec.eof:
                # member finished: stash the bytes after its trailer
                # and arm a fresh decoder for the next member
                self._pending = self._dec.unused_data
                self._dec = self._zlib.decompressobj(31)
            else:
                self._pending = self._dec.unconsumed_tail
            if out:
                b[: len(out)] = out
                return len(out)
            # header/trailer bytes only — keep feeding


def parse_warc_bytes(raw: bytes) -> Iterator[Tuple[dict, bytes]]:
    """:func:`parse_warc_stream` over in-memory container bytes,
    transparently unwrapping (multi-member) gzip. The gzip stream is
    decompressed INCREMENTALLY — peak memory is the compressed bytes
    plus one record, not the decompressed container. Gzip-layer
    corruption costs the records at and after it, never the ones
    before (see :class:`_TolerantGzipReader`)."""
    if raw[:2] == b"\x1f\x8b":
        fh = io.BufferedReader(
            _TolerantGzipReader(io.BytesIO(raw)), buffer_size=1 << 20
        )
    else:
        fh = io.BufferedReader(io.BytesIO(raw), buffer_size=1 << 20)
    yield from parse_warc_stream(fh)


# ---------------------------------------------------------------------------
# DataFrame readers
# ---------------------------------------------------------------------------

def _warc_rows(path: str, content: bytes,
               record_types: Sequence[str]) -> Iterator[List]:
    wanted = {t.lower() for t in record_types}
    for fields, body in parse_warc_bytes(content):
        rtype = fields.get("warc-type", "").lower()
        if rtype not in wanted:
            continue
        url = fields.get("warc-target-uri")
        ts = _parse_warc_ts(fields.get("warc-date", ""))
        ctype = fields.get("content-type", "")
        if rtype == "response" and ctype.lower().startswith("application/http"):
            status, payload_ctype, payload = _split_http_block(body)
        else:
            status, payload_ctype, payload = None, ctype or None, body
        yield [url, ts, rtype, status, payload_ctype, payload, path]


# the binaryFile source's fixed schema — needed explicitly for the
# STREAMING reader (readStream requires a user-supplied schema)
BINARYFILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def parse_warc_df(
    files: DataFrame,
    record_types: Sequence[str] = ("response",),
) -> DataFrame:
    """WARC records from a ``(path, content)`` DataFrame — the parse
    kernel behind :func:`read_warc`, factored out so the STREAMING
    reader (``readStream.format('binaryFile')`` over a crawl landing
    directory) runs the identical plan on its micro-batches."""

    def parse(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["url", "warc_ts", "record_type", "http_status",
                "content_type", "html", "warc_file"]
        for pdf in batches:
            for p, content in zip(pdf["path"], pdf["content"]):
                # Arrow already hands binary cells as bytes; only copy
                # when it doesn't (memoryview/bytearray) — a gratuitous
                # bytes() on a ~1 GiB container doubles task memory
                if not isinstance(content, bytes):
                    content = bytes(content)
                buf: List[List] = []
                for row in _warc_rows(p, content, record_types):
                    buf.append(row)
                    if len(buf) >= _BATCH_ROWS:
                        yield pd.DataFrame(buf, columns=cols)
                        buf = []
                if buf:
                    yield pd.DataFrame(buf, columns=cols)

    return files.select("path", "content").mapInPandas(parse, _WARC_SCHEMA)


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: Sequence[str] = ("response",),
) -> DataFrame:
    """(url, warc_ts, record_type, http_status, content_type, html,
    warc_file) over every WARC record of the requested types under
    *path* (a file, directory, or glob of ``.warc`` / ``.warc.gz``).

    ``html`` is the record payload with the stored HTTP envelope
    stripped (status and Content-Type are surfaced as their own
    columns); for non-HTTP record types it is the raw block. The plan
    is map-only — one task per container file, no shuffle — so at a
    full-crawl 100 TB input the stage scales linearly with file count
    and an executor never holds more than one container plus one
    emitted Arrow batch.
    """
    files = spark.read.format("binaryFile").load(path)
    return parse_warc_df(files, record_types)


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """(url, warc_ts, text, warc_file) over WET ``conversion`` records
    — Common Crawl's pre-extracted plain text, decoded as UTF-8."""
    warc = read_warc(spark, path, record_types=("conversion",))
    return warc.select(
        "url", "warc_ts",
        F.col("html").cast("string").alias("text"),
        "warc_file",
    )


def warc_to_pages(
    warc: DataFrame,
    extract: bool = True,
    detect_lang: bool = True,
    ok_only: bool = True,
) -> DataFrame:
    """Canonical pages rows (url, warc_ts, html, text, lang) from
    :func:`read_warc` output — the full ingest chain the reference runs
    per-URL at fetch time (fetch → extract → store,
    fetcher.py:324-376), here as three declarative stages:

    * *ok_only*: keep HTTP 2xx responses with a URL (the reference's
      fetch-error skip);
    * *extract*: fill ``text`` via the package's Arrow-vectorized
      extraction UDF (byte-identical to the reference's extractor per
      the round-1 invariant) — else '' for a later extraction pass;
    * *detect_lang*: fill ``lang`` with the n-gram language ID
      (functions/langid.py) over the extracted text — else ''.

    Everything is row-local (no shuffle); at ingest scale this stage
    fuses with the WARC parse into one map-only stage.
    """
    df = warc
    if ok_only:
        df = df.where(
            F.col("url").isNotNull()
            & F.col("http_status").isNotNull()
            & (F.col("http_status") >= 200) & (F.col("http_status") < 300)
        )
    df = df.select("url", "warc_ts", "html")
    if extract:
        from ..extraction import extract_text_udf

        # pass the binary column RAW: extract_text_udf decodes bytes
        # itself and enforces MAX_HTML_BYTES in BYTES — a cast to
        # string here would silently change the guard to characters
        # and diverge from the parquet/streaming ingest path
        df = df.withColumn("text", extract_text_udf()(F.col("html")))
    else:
        df = df.withColumn("text", F.lit(""))
    if detect_lang:
        from ..functions.langid import detect_language

        df = detect_language(df, text_col="text", out_col="lang")
    else:
        df = df.withColumn("lang", F.lit(""))
    return df.select("url", "warc_ts", "html", "text", "lang")


# ---------------------------------------------------------------------------
# writers
# ---------------------------------------------------------------------------

def _record_id(url: str, ts: Optional[dt.datetime]) -> str:
    """Deterministic WARC-Record-ID (uuid from md5(url, ts)) so an
    exported corpus slice is byte-stable across runs — required by the
    repo-wide same-input ⇒ same-bytes testing convention."""
    digest = hashlib.md5(
        (url + "|" + (_fmt_warc_ts(ts) if ts else "")).encode()
    ).hexdigest()
    return f"<urn:uuid:{uuid.UUID(digest)}>"


def _response_record(url: str, ts: Optional[dt.datetime],
                     html: bytes) -> bytes:
    http = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=utf-8\r\n"
        b"Content-Length: " + str(len(html)).encode() + b"\r\n\r\n"
    ) + html
    header = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {_fmt_warc_ts(ts) if ts else ''}\r\n"
        f"WARC-Record-ID: {_record_id(url, ts)}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode()
    return header + http + b"\r\n\r\n"


def _conversion_record(url: str, ts: Optional[dt.datetime],
                       text: str) -> bytes:
    body = text.encode("utf-8")
    header = (
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {_fmt_warc_ts(ts) if ts else ''}\r\n"
        f"WARC-Record-ID: {_record_id(url, ts)}\r\n"
        "Content-Type: text/plain\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode()
    return header + body + b"\r\n\r\n"


def _export(df: DataFrame, out_dir: str, make_record, cols: List[str]) -> int:
    """Per-partition writer: each partition streams its rows into
    ``out_dir/part-<pid>.warc.gz``, one gzip member per record (the CC
    layout). Executor-side and driver-memory-free; on a cluster
    *out_dir* would be shared storage — the task-local write pattern is
    identical. The in-progress temp name starts with ``.`` so Spark's
    file sources (and the streaming ingest glob) never list a
    half-written container. Returns the number of partition files THIS
    call wrote (counted from the successful task attempts, not by
    re-listing the directory — an out_dir that already holds files from
    an earlier export does not inflate the count).

    Final names are ``part-<pid>-<content-digest>.warc.gz`` — derived
    from the container's own (byte-deterministic) bytes. That gives
    both safety properties at once, with no check-then-act race:

    * a later export into the same landing directory (the
      growing-archive pattern — scripts/submit_ingest.py,
      stream_append_to_store) carries different records ⇒ different
      digest ⇒ different name — it can never destroy an earlier
      container, nor hide itself from the streaming ingest (whose
      binaryFile checkpoint keys on path and never re-reads a seen
      file);
    * a RETRIED or speculatively re-run task writes the identical
      bytes ⇒ the same name — the ``os.replace`` is an idempotent
      self-overwrite, never a duplicate container double-ingested by
      the stream."""
    os.makedirs(out_dir, exist_ok=True)

    def write_partition(rows):
        import hashlib

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        tmp = os.path.join(
            out_dir, f".part-{pid:05d}-{os.getpid()}.inprogress"
        )
        digest = hashlib.sha256()
        wrote = False
        with open(tmp, "wb") as fh:
            for row in rows:
                rec = make_record(*[row[c] for c in cols])
                # mtime=0 + no filename: byte-deterministic members
                buf = io.BytesIO()
                with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                    gz.write(rec)
                member = buf.getvalue()
                fh.write(member)
                digest.update(member)
                wrote = True
        if wrote:
            path = os.path.join(
                out_dir,
                f"part-{pid:05d}-{digest.hexdigest()[:12]}.warc.gz",
            )
            os.replace(tmp, path)  # atomic visibility, like runstore
            yield 1
        else:
            os.remove(tmp)  # empty partition → no file

    written = df.select(*cols).rdd.mapPartitions(write_partition).sum()
    return int(written or 0)


def export_warc(pages: DataFrame, out_dir: str) -> int:
    """Write (url, warc_ts, html) rows as ``response`` records wrapped
    in a minimal stored HTTP 200 envelope — re-readable by
    :func:`read_warc` with byte-identical ``html`` per url."""
    def rec(url, ts, html):
        return _response_record(
            url, ts, bytes(html) if html is not None else b""
        )

    return _export(pages, out_dir, rec, ["url", "warc_ts", "html"])


def export_wet(docs: DataFrame, out_dir: str) -> int:
    """Write (url, warc_ts, text) rows as WET ``conversion`` records —
    re-readable by :func:`read_wet`."""
    def rec(url, ts, text):
        return _conversion_record(url, ts, text or "")

    return _export(docs, out_dir, rec, ["url", "warc_ts", "text"])
