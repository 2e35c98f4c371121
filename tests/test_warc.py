"""WARC source reader (sources/warc.py): record framing, HTTP payload
handling, gzip member support, the Spark flat-map, and the SQL-builder
differential for the driver row."""

import gzip

from contentextractor_spark.sources.warc import (
    build_warc,
    iter_warc_records,
    warc_to_pages,
)


def _recs(data):
    return list(iter_warc_records(data))


def test_roundtrip_two_records():
    w = build_warc(
        [
            ("http://a/x", "2024-01-01T00:00:00Z", b"<html>hello</html>"),
            ("http://b/y", "2024-02-02T12:30:00Z", b"second body"),
        ]
    )
    recs = _recs(w)
    assert [(r.target_uri, r.http_status, r.payload) for r in recs] == [
        ("http://a/x", 200, b"<html>hello</html>"),
        ("http://b/y", 200, b"second body"),
    ]


def test_content_length_frames_crlf_in_body():
    # a body containing \r\n\r\n (and even 'WARC/1.0') must not split the
    # record — Content-Length is authoritative
    body = b"part one\r\n\r\nWARC/1.0\r\npart two"
    w = build_warc([("u1", "d", body), ("u2", "d", b"after")])
    recs = _recs(w)
    assert [r.payload for r in recs] == [body, b"after"]


def test_gzip_members():
    w = build_warc(
        [("u1", "d", b"alpha"), ("u2", "d", b"beta")], gzip_members=True
    )
    assert w[:2] == b"\x1f\x8b"
    assert [r.payload for r in _recs(w)] == [b"alpha", b"beta"]


def test_truncated_tail_dropped_not_misframed():
    w = build_warc([("u1", "d", b"kept intact"), ("u2", "d", b"cut off body")])
    recs = _recs(w[:-10])
    assert [r.target_uri for r in recs] == ["u1"]
    assert recs[0].payload == b"kept intact"


def test_non_response_records_pass_through_typed():
    rec = (
        b"WARC/1.0\r\nWARC-Type: request\r\nWARC-Target-URI: u\r\n"
        b"WARC-Date: d\r\nContent-Length: 3\r\n\r\nGET\r\n\r\n"
    )
    recs = _recs(rec)
    assert recs[0].warc_type == "request" and recs[0].http_status is None


def test_http_content_encoding_gzip_inflated():
    body = gzip.compress(b"the real page")
    http = b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n" + body
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: u\r\n"
        b"WARC-Date: d\r\nContent-Length: "
        + str(len(http)).encode()
        + b"\r\n\r\n"
        + http
        + b"\r\n\r\n"
    )
    assert _recs(rec)[0].payload == b"the real page"


def test_http_chunked_dechunked():
    chunked = b"5\r\nhello\r\n6\r\n world\r\n0\r\n\r\n"
    http = b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" + chunked
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: u\r\n"
        b"WARC-Date: d\r\nContent-Length: "
        + str(len(http)).encode()
        + b"\r\n\r\n"
        + http
        + b"\r\n\r\n"
    )
    assert _recs(rec)[0].payload == b"hello world"


def test_non_2xx_status_parsed():
    http = b"HTTP/1.1 404 Not Found\r\n\r\nmissing"
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: u\r\n"
        b"WARC-Date: d\r\nContent-Length: "
        + str(len(http)).encode()
        + b"\r\n\r\n"
        + http
        + b"\r\n\r\n"
    )
    r = _recs(rec)[0]
    assert r.http_status == 404 and r.payload == b"missing"


def test_utf8_body_byte_length():
    body = "日本語の本文です".encode("utf-8")
    w = build_warc([("u", "2024-01-01T00:00:00Z", body)])
    assert _recs(w)[0].payload == body


def test_negative_chunk_size_terminates():
    # int(b'-6', 16) parses; without the guard the de-chunk cursor walks
    # backwards forever (r3 review finding — verified hang)
    from contentextractor_spark.sources.warc import _dechunk

    assert _dechunk(b"-6\r\nAAAAAAAAAAAA") == b"-6\r\nAAAAAAAAAAAA"


def test_truncated_gzip_member_no_crash():
    # EOFError (not an OSError) from a cut .warc.gz must not escape the
    # reader; valid earlier members survive
    w = build_warc(
        [("u1", "d", b"alpha"), ("u2", "d", b"beta")], gzip_members=True
    )
    assert [r.target_uri for r in _recs(w[:-5])] == ["u1", "u2"]
    assert _recs(w[: len(w) // 2 - 3])[0].target_uri == "u1"


def test_gzip_members_with_trailing_garbage_salvaged():
    from contentextractor_spark.sources.warc import _gunzip_members

    g = gzip.compress(b"one") + gzip.compress(b"two") + b"NOT GZIP"
    assert _gunzip_members(g) == b"onetwo"


def test_lf_only_http_headers_not_dropped():
    http = b"HTTP/1.1 200 OK\nContent-Type: text/html\n\n<p>lf page</p>"
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: u\r\n"
        b"WARC-Date: d\r\nContent-Length: "
        + str(len(http)).encode()
        + b"\r\n\r\n"
        + http
        + b"\r\n\r\n"
    )
    r = _recs(rec)[0]
    assert r.http_status == 200 and r.payload == b"<p>lf page</p>"


def test_warc_to_pages_spark(spark):
    w1 = build_warc(
        [
            ("http://a/x", "2024-01-01T00:00:00Z", b"<p>one</p>"),
            ("http://b/y", "2024-01-02T00:00:00Z", b"<p>two</p>"),
        ]
    )
    # segment 2: one 404 (filtered) + one good record, gzipped members
    http404 = b"HTTP/1.1 404 NF\r\n\r\ngone"
    bad = (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: u404\r\n"
        b"WARC-Date: 2024-01-03T00:00:00Z\r\nContent-Length: "
        + str(len(http404)).encode()
        + b"\r\n\r\n"
        + http404
        + b"\r\n\r\n"
    )
    w2 = gzip.compress(bad) + gzip.compress(
        build_warc([("http://c/z", "2024-01-04T05:06:07Z", b"<p>three</p>")])
    )
    df = spark.createDataFrame([(1, w1), (2, w2)], "id int, warc binary")
    pages = warc_to_pages(df)
    rows = {r["url"]: r for r in pages.collect()}
    assert set(rows) == {"http://a/x", "http://b/y", "http://c/z"}
    assert bytes(rows["http://a/x"]["html"]) == b"<p>one</p>"
    assert rows["http://c/z"]["warc_ts"].isoformat() == "2024-01-04T05:06:07"
    assert rows["http://b/y"]["http_status"] == "200"
    # narrow stage: no shuffle in the flat-map plan
    plan = pages._jdf.queryExecution().toString()
    assert "Exchange" not in plan


def test_sql_builder_differential(spark):
    """_warc_segments_sql must emit byte-identical archives to build_warc
    over the same records (sorted by record string = doc_id string)."""
    import sys

    sys.path.insert(0, "/root/repo")
    from __spark_entry__ import _WARC_DATE, _warc_segments_sql

    texts = {3: "hello world", 13: "日本語のテキストを確認します", 23: "x" * 200}
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    # n_segments=10 → all three docs share seg_id 3
    got = _warc_segments_sql(df, n_segments=10).collect()
    assert len(got) == 1 and got[0]["seg_id"] == 3
    wrap = "<html><body><div><p>{}</p></div></body></html>"
    expected = build_warc(
        [
            (str(i), _WARC_DATE, wrap.format(texts[i]).encode("utf-8"))
            for i in sorted(texts)  # '13' < '23' < '3' lexicographically?
        ]
    )
    # sort_array orders by the record STRING; replicate exactly
    recs = {
        i: build_warc(
            [(str(i), _WARC_DATE, wrap.format(texts[i]).encode("utf-8"))]
        )
        for i in texts
    }
    expected = b"".join(
        recs[i]
        for i in sorted(texts, key=lambda i: recs[i].decode("utf-8"))
    )
    assert bytes(got[0]["warc"]) == expected


def test_warc_extraction_e2e(spark):
    """Container → pages → full HTML extraction recovers the text."""
    import sys

    sys.path.insert(0, "/root/repo")
    from __spark_entry__ import _warc_segments_sql

    from contentextractor_spark.plans.pipeline import extract_pages

    df = spark.createDataFrame(
        [(7, "alpha beta gamma delta epsilon zeta"), (8, "日本語の記事の本文 " * 3)],
        "doc_id long, text string",
    )
    pages = warc_to_pages(_warc_segments_sql(df, n_segments=2))
    out = {
        r["url"]: r["main_text"]
        for r in extract_pages(pages, num_buckets=2).collect()
    }
    assert out["7"] == "alpha beta gamma delta epsilon zeta"
    assert out["8"] == ("日本語の記事の本文 " * 3).strip()


def test_wat_roundtrip_adversarial_anchors(spark):
    """WAT egress → ingestion recovers anchors containing JSON-hostile
    characters (quote, backslash, newline) and a WARC header look-alike;
    a non-metadata record in the same segment is skipped."""
    from pyspark.sql import functions as F

    from contentextractor_spark.sources.warc import (
        to_wat_records,
        wat_to_links,
    )

    links = spark.createDataFrame(
        [
            ("u1", "https://a.example/1", 'anch"or\\with\nhostiles'),
            ("u1", "https://a.example/2", "plain"),
            ("u2", "https://b.example/", "WARC/1.0 Content-Length: 3"),
        ],
        "url string, href string, anchor string",
    )
    wat = to_wat_records(links)
    decoy = (
        "WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: x\r\n"
        "Content-Length: 5\r\n\r\nhello\r\n\r\n"
    )
    seg = wat.agg(
        F.concat(
            F.lit(decoy), F.array_join(F.array_sort(F.collect_list("wat")), "")
        ).alias("txt")
    ).select(F.encode("txt", "UTF-8").alias("wat"))
    got = {
        (r.url, r.link_url): r.link_text for r in wat_to_links(seg).collect()
    }
    assert got == {
        ("u1", "https://a.example/1"): 'anch"or\\with\nhostiles',
        ("u1", "https://a.example/2"): "plain",
        ("u2", "https://b.example/"): "WARC/1.0 Content-Length: 3",
    }
