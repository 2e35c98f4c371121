"""WARC (ISO 28500) source reader — the container format Common-Crawl-style
page stores are ingested FROM.  The north rule's input is an Iceberg table
of pages; this source is the ingestion edge that produces that table from
raw crawl archives, so the engine covers the pipeline one step upstream of
`extract_pages`.

Pure stdlib.  A WARC file is a sequence of records:

    WARC/1.0\r\n
    WARC-Type: response\r\n
    WARC-Target-URI: <url>\r\n
    WARC-Date: 2024-01-01T00:00:00Z\r\n
    Content-Length: <n>\r\n
    \r\n
    <n payload bytes — for response records an HTTP message:
     status line + headers + \r\n\r\n + body>
    \r\n\r\n

Real crawl archives store each record as its own gzip member, concatenated
(".warc.gz"); `iter_warc_records` transparently handles plain and
member-gzipped input (gzip magic sniff + per-member decompression).

Semantics:
 - Content-Length is authoritative for the payload extent (bodies may
   contain \\r\\n\\r\\n sequences — no delimiter scanning inside payloads);
   a record whose declared length overruns the buffer is dropped as
   truncated rather than mis-framed.
 - only WARC-Type: response records yield pages (request/metadata/warcinfo
   records are skipped, like every crawl consumer does);
 - the HTTP header block is stripped; the body is returned as RAW BYTES —
   charset decoding belongs to the extraction pipeline's D1/D2 operators,
   which must see original bytes (decoding here would corrupt SJIS pages).
 - HTTP Transfer-Encoding: chunked bodies are de-chunked (crawlers store
   the wire form); Content-Encoding gzip/deflate payloads are inflated.

Spark shape: `warc_to_pages` is a flat-map (mapInPandas yielding MORE rows
than input) over a binary column of archive segments — one shuffle-free
narrow stage; the result feeds `extract_pages` unchanged.
"""

from __future__ import annotations

import gzip
import zlib
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_CRLF2 = b"\r\n\r\n"


@dataclass
class WarcRecord:
    warc_type: str
    target_uri: str
    warc_date: str
    http_status: int | None
    payload: bytes  # HTTP body for response records, raw payload otherwise


def _parse_headers(block: bytes) -> dict[str, str]:
    """Header block → {lower-name: value}; duplicate names keep the first
    (sufficient for the framing headers used here)."""
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n"):
        if b":" not in line:
            continue
        name, _, value = line.partition(b":")
        key = name.strip().decode("latin-1").lower()
        if key not in headers:
            headers[key] = value.strip().decode("latin-1")
    return headers


def _dechunk(body: bytes) -> bytes:
    """RFC 7230 chunked transfer decoding; malformed input returns the
    bytes as-is (crawl archives contain plenty of broken servers)."""
    out = bytearray()
    pos = 0
    while True:
        nl = body.find(b"\r\n", pos)
        if nl < 0:
            return bytes(body) if not out else bytes(out)
        size_tok = body[pos:nl].split(b";")[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            return bytes(body) if not out else bytes(out)
        if size < 0:  # int(b'-6', 16) parses — without this guard the
            # cursor walks backwards and the loop never terminates
            return bytes(body) if not out else bytes(out)
        if size == 0:
            return bytes(out)
        start = nl + 2
        out += body[start : start + size]
        pos = start + size + 2  # skip chunk + CRLF
        if pos > len(body):
            return bytes(out)


def _inflate(body: bytes, encoding: str) -> bytes:
    try:
        if encoding == "gzip":
            return gzip.decompress(body)
        if encoding == "deflate":
            try:
                return zlib.decompress(body)
            except zlib.error:  # raw-deflate servers (missing zlib header)
                return zlib.decompress(body, -zlib.MAX_WBITS)
    except (OSError, EOFError, zlib.error):  # EOFError: truncated gzip
        pass
    return body


def _split_http(payload: bytes) -> tuple[int | None, bytes]:
    """HTTP response message → (status, body) with de-chunking and
    content-decoding applied; non-HTTP payloads pass through."""
    if not payload.startswith(b"HTTP/"):
        return None, payload
    sep = payload.find(_CRLF2)
    if sep >= 0:
        head, body = payload[:sep], payload[sep + 4 :]
    else:
        # bare-LF servers exist in crawl archives; better a page with
        # LF-normalized headers than a silently dropped record
        sep = payload.find(b"\n\n")
        if sep < 0:
            return None, b""
        head = payload[:sep].replace(b"\n", b"\r\n")
        body = payload[sep + 2 :]
    status_line = head.split(b"\r\n", 1)[0]
    parts = status_line.split()
    status = int(parts[1]) if len(parts) >= 2 and parts[1].isdigit() else None
    headers = _parse_headers(head.split(b"\r\n", 1)[1] if b"\r\n" in head else b"")
    if "chunked" in headers.get("transfer-encoding", "").lower():
        body = _dechunk(body)
    enc = headers.get("content-encoding", "").strip().lower()
    if enc in ("gzip", "deflate"):
        body = _inflate(body, enc)
    return status, body


def _gunzip_members(data: bytes) -> bytes:
    """Concatenated gzip members → concatenated plaintext (the .warc.gz
    layout).  gzip.decompress walks clean member chains; the fallback
    decompresses member-by-member with decompressobj + unused_data so a
    truncated tail or trailing garbage costs only the broken member, never
    the valid ones (gzip.GzipFile.read() would raise AFTER consuming good
    members, losing everything).  EOFError (truncated stream) is not an
    OSError — both are caught."""
    try:
        return gzip.decompress(data)
    except (OSError, EOFError):
        out = bytearray()
        rest = data
        while rest[:2] == b"\x1f\x8b":
            d = zlib.decompressobj(16 + zlib.MAX_WBITS)  # gzip wrapper
            try:
                out += d.decompress(rest)
            except zlib.error:
                break
            if not d.eof:  # truncated final member — drop it
                break
            rest = d.unused_data
        return bytes(out)


def iter_warc_records(data: bytes) -> Iterator[WarcRecord]:
    """Parse one archive buffer (plain or member-gzipped) into records.
    Content-Length frames each payload; truncated tails are dropped."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start < 0:
            return
        head_end = data.find(_CRLF2, start)
        if head_end < 0:
            return
        head = data[start:head_end]
        headers = _parse_headers(head.split(b"\r\n", 1)[1] if b"\r\n" in head else b"")
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            pos = head_end + 4
            continue
        payload_start = head_end + 4
        payload_end = payload_start + length
        if payload_end > n:  # truncated record — never mis-frame
            return
        payload = data[payload_start:payload_end]
        wtype = headers.get("warc-type", "")
        status: int | None = None
        if wtype == "response":
            status, payload = _split_http(payload)
        yield WarcRecord(
            warc_type=wtype,
            target_uri=headers.get("warc-target-uri", ""),
            warc_date=headers.get("warc-date", ""),
            http_status=status,
            payload=payload,
        )
        pos = payload_end


WARC_PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("http_status", StringType()),
    ]
)


def warc_to_pages(segments: DataFrame, data_col: str = "warc") -> DataFrame:
    """Flat-map archive segments(id, warc:binary) → pages(url, warc_ts,
    html, http_status).  Narrow stage (no shuffle): each segment explodes
    into its response records inside one mapInPandas pass; feed the result
    straight to extract_pages, whose salted repartition is then the
    pipeline's only shuffle.  Only 2xx response records become pages
    (parity with crawl consumers; others carry no usable body)."""
    import pandas as pd

    from ..plans.pipeline import ensure_pyfiles

    ensure_pyfiles(segments.sparkSession)

    def explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "url": [],
                "warc_ts": [],
                "html": [],
                "http_status": [],
            }
            for data in pdf[data_col]:
                if data is None:
                    continue
                for rec in iter_warc_records(bytes(data)):
                    if rec.warc_type != "response":
                        continue
                    if rec.http_status is None or not (
                        200 <= rec.http_status < 300
                    ):
                        continue
                    rows["url"].append(rec.target_uri)
                    ts = pd.to_datetime(
                        rec.warc_date, utc=True, errors="coerce", format="ISO8601"
                    )
                    rows["warc_ts"].append(
                        None if ts is pd.NaT else ts.tz_localize(None)
                    )
                    rows["html"].append(rec.payload)
                    rows["http_status"].append(str(rec.http_status))
            yield pd.DataFrame(rows)

    return segments.select(data_col).mapInPandas(explode, schema=WARC_PAGES_SCHEMA)


def build_warc(
    records: list[tuple[str, str, bytes]],
    gzip_members: bool = False,
    content_type: str = "text/html",
) -> bytes:
    """Deterministic archive builder for tests/fixtures: records =
    [(url, iso_date, body)] → response records with an HTTP/1.1 200
    message.  The Spark-SQL twin in __spark_entry__.py must stay
    byte-compatible (differential-tested)."""
    out = bytearray()
    for url, date, body in records:
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: "
            + content_type.encode("latin-1")
            + b"\r\n\r\n"
            + body
        )
        rec = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Target-URI: " + url.encode("latin-1") + b"\r\n"
            b"WARC-Date: " + date.encode("latin-1") + b"\r\n"
            b"Content-Length: " + str(len(http)).encode("latin-1") + b"\r\n"
            b"\r\n" + http + b"\r\n\r\n"
        )
        if gzip_members:
            out += gzip.compress(rec)
        else:
            out += rec
    return bytes(out)


# --- WET (extracted-text conversion records) ---------------------------------

def to_wet_records(
    docs: "DataFrame",
    url_col: str = "url",
    text_col: str = "text",
    date: str = "2024-01-01T00:00:00Z",
) -> "DataFrame":
    """(url, wet): one WET record string per document — the egress twin of
    the crawl's WET files (WARC-Type: conversion, text payload, no HTTP
    message).  Built in PURE SQL (concat + octet_length), so the writer is
    a codegen'd projection: write the column with the text sink (or
    concat per-partition) and the output is a valid WET file.
    Content-Length counts UTF-8 OCTETS (octet_length), which is what the
    byte-level reader frames on — multi-byte text stays exact."""
    from pyspark.sql import functions as F

    payload = F.col(text_col)
    return docs.select(
        F.col(url_col).alias("url"),
        F.concat(
            F.lit("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: "),
            F.col(url_col),
            F.lit("\r\nWARC-Date: " + date + "\r\nContent-Length: "),
            F.octet_length(payload).cast("string"),
            F.lit("\r\n\r\n"),
            payload,
            F.lit("\r\n\r\n"),
        ).alias("wet"),
    )


def to_wat_records(
    links: "DataFrame",
    url_col: str = "url",
    href_col: str = "href",
    anchor_col: str = "anchor",
    date: str = "2024-01-01T00:00:00Z",
) -> "DataFrame":
    """(url, wat): one WAT metadata record per SOURCE url — the crawl's
    link-metadata sidecar (WARC-Type: metadata, application/json payload
    with the page's outlinks), completing the WARC/WET/WAT egress triple.

    The JSON envelope is built with collect_list(struct) + F.to_json —
    escaping (quotes, backslashes, control chars in anchor text) is the
    JVM JSON writer's job, never a hand-rolled concat that would corrupt
    the first adversarial anchor.  Envelope shape (subset of the Common
    Crawl WAT layout): {"Envelope": {"WARC-Header-Metadata":
    {"WARC-Target-URI": url}, "Payload-Metadata": {"Links": [{"url":
    href, "text": anchor}, ...]}}}.

    Scale: one map-side-combinable collect_list groupBy per page (bounded
    by per-page outlink count), then a codegen'd projection — the record
    header is pure concat with octet_length framing (UTF-8 octets, the
    WET convention)."""
    from pyspark.sql import functions as F

    per_page = links.groupBy(F.col(url_col).alias("url")).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(href_col).alias("url"),
                    F.col(anchor_col).alias("text"),
                )
            )
        ).alias("Links")
    )
    payload = F.to_json(
        F.struct(
            F.struct(
                F.struct(
                    F.col("url").alias("WARC-Target-URI")
                ).alias("WARC-Header-Metadata"),
                F.struct(F.col("Links")).alias("Payload-Metadata"),
            ).alias("Envelope")
        )
    )
    return per_page.select(
        "url",
        F.concat(
            F.lit("WARC/1.0\r\nWARC-Type: metadata\r\nWARC-Target-URI: "),
            F.col("url"),
            F.lit(
                "\r\nWARC-Date: "
                + date
                + "\r\nContent-Type: application/json\r\nContent-Length: "
            ),
            F.octet_length(payload).cast("string"),
            F.lit("\r\n\r\n"),
            payload,
            F.lit("\r\n\r\n"),
        ).alias("wat"),
    )


WAT_LINKS_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("link_url", StringType()),
        StructField("link_text", StringType()),
    ]
)


def wat_to_links(segments: "DataFrame", data_col: str = "wat") -> "DataFrame":
    """Flat-map WAT archive segments(wat:binary) → (url, link_url,
    link_text): the ingestion edge for crawl link metadata.  Content-Length
    framing via iter_warc_records (non-metadata records skipped), JSON
    payloads decoded with a real JSON parser — the escaping roundtrip is
    exact by construction.  Narrow stage, no shuffle."""
    import json
    from typing import Iterator as _Iter

    import pandas as pd

    from ..plans.pipeline import ensure_pyfiles

    ensure_pyfiles(segments.sparkSession)

    def explode(batches: "_Iter[pd.DataFrame]") -> "_Iter[pd.DataFrame]":
        for pdf in batches:
            rows: dict[str, list] = {"url": [], "link_url": [], "link_text": []}
            for data in pdf[data_col]:
                if data is None:
                    continue
                for rec in iter_warc_records(bytes(data)):
                    if rec.warc_type != "metadata":
                        continue
                    env = json.loads(rec.payload.decode("utf-8"))["Envelope"]
                    src = env["WARC-Header-Metadata"]["WARC-Target-URI"]
                    for link in env["Payload-Metadata"]["Links"]:
                        rows["url"].append(src)
                        rows["link_url"].append(link["url"])
                        rows["link_text"].append(link.get("text"))
            yield pd.DataFrame(rows)

    return segments.select(data_col).mapInPandas(explode, schema=WAT_LINKS_SCHEMA)


WET_DOCS_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("text", StringType()),
    ]
)


def wet_to_docs(segments: "DataFrame", data_col: str = "wet") -> "DataFrame":
    """Flat-map WET archive segments(id, wet:binary) → (url, text): the
    ingestion edge for pre-extracted crawl text.  Reuses the WARC
    Content-Length framing (iter_warc_records) — payloads may contain
    'WARC/' look-alikes and header-shaped text; only the length header
    frames.  Narrow stage, no shuffle, same shape as warc_to_pages."""
    from typing import Iterator as _Iter

    import pandas as pd

    from ..plans.pipeline import ensure_pyfiles

    ensure_pyfiles(segments.sparkSession)

    def explode(batches: "_Iter[pd.DataFrame]") -> "_Iter[pd.DataFrame]":
        for pdf in batches:
            rows: dict[str, list] = {"url": [], "text": []}
            for data in pdf[data_col]:
                if data is None:
                    continue
                for rec in iter_warc_records(bytes(data)):
                    if rec.warc_type != "conversion":
                        continue
                    rows["url"].append(rec.target_uri)
                    rows["text"].append(
                        rec.payload.decode("utf-8", errors="replace")
                    )
            yield pd.DataFrame(rows)

    return segments.select(data_col).mapInPandas(explode, schema=WET_DOCS_SCHEMA)
