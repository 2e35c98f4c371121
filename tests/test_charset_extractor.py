"""D1-D3 charset + end-to-end extract_document archetype goldens
(SURVEY.md §2.2, FIXTURES.md §3)."""

import pytest

from contentextractor_spark.extractor import (
    DocumentExtract,
    decode_html,
    extract_document,
    extract_from_html,
)
from contentextractor_spark.operators.charset import (
    change_charset,
    detect_charset,
    java_decode,
    meta_declared_charset,
)
from contentextractor_spark.operators.dom import parse_xml

L1 = "Hello world this is the main content line one"
L2 = "Second line of dense content here with words"
L3 = "Third dense line with plenty of text content"


# ---------- D1 detection ----------

def test_detect_ascii_returns_none():
    assert detect_charset(b"<html>plain ascii</html>") is None
    assert detect_charset(b"") is None


def test_detect_utf8():
    assert detect_charset("こんにちは世界".encode("utf-8")) == "UTF-8"


def test_detect_shift_jis():
    data = "こんにちは世界、日本語のテキストです。".encode("shift_jis")
    assert detect_charset(data) == "SHIFT_JIS"


def test_detect_euc_jp():
    data = "こんにちは世界、日本語のテキストです。".encode("euc_jp")
    assert detect_charset(data) == "EUC-JP"


def test_java_decode_replacement():
    assert java_decode(b"\xff\xfe abc", "UTF-8") == "�� abc"


def test_java_decode_unknown_charset_raises():
    with pytest.raises(ValueError):
        java_decode(b"x", "NOT-A-CHARSET")


def test_change_charset_identity():
    assert change_charset("あsdf") == "あsdf"
    assert change_charset(None) is None


# ---------- D2 meta sniff ----------

def test_meta_http_equiv_charset():
    doc = parse_xml(
        '<html><head><meta http-equiv="Content-Type" '
        'content="text/html; charset=Shift_JIS"></head></html>'
    )
    assert meta_declared_charset(doc) == "Shift_JIS"


def test_meta_charset_attr():
    doc = parse_xml('<html><head><meta charset="EUC-JP"></head></html>')
    assert meta_declared_charset(doc) == "EUC-JP"


def test_meta_none_declares_utf8():
    doc = parse_xml("<html><head></head></html>")
    assert meta_declared_charset(doc) == "UTF-8"


def test_meta_content_without_charset_part():
    doc = parse_xml('<meta http-equiv="Content-Type" content="text/html">')
    assert meta_declared_charset(doc) == "UTF-8"


# ---------- end-to-end ----------

A1 = (
    '<html><head><title>Test Page</title>'
    '<meta name="description" content="A test page">'
    '<meta name="keywords" content="k1,k2"></head>'
    '<body><div id="header"><a href="/">Home</a></div>'
    f'<div class="content"><p>{L1}</p><p>{L2}</p><p>{L3}</p></div>'
    '<div id="footer"><a href="/about">About</a></div></body></html>'
)


def test_a1_plain_article():
    res = extract_from_html(A1)
    assert res.title == "Test Page"
    assert res.description == "A test page"
    assert res.keywords == "k1,k2"
    assert res.main_text == L1 + "\n" + L2 + "\n" + L3
    assert res.status == "ok"
    # span: lines 1..3 of the preprocessed line array, one block
    assert res.spans == [(1, 4, 0, len(L1) + len(L2) + len(L3) + 3)]
    assert res.keyword_list.startswith("Hello,world,this,is,")
    assert res.keyword_list.endswith(",")


def test_a1_from_bytes():
    res = extract_document(A1.encode("utf-8"))
    assert res.main_text == L1 + "\n" + L2 + "\n" + L3


JP_BODY = "これは日本語の本文でありまして十分な長さの文章を含んでいます"


def _jp_page(cs_decl: str) -> str:
    return (
        f'<html><head><meta http-equiv="Content-Type" '
        f'content="text/html; charset={cs_decl}"><title>日本語ページ</title></head>'
        f"<body><div><p>{JP_BODY}</p><p>{JP_BODY}</p><p>{JP_BODY}</p></div>"
        "</body></html>"
    )


def test_a6_shift_jis_page():
    data = _jp_page("Shift_JIS").encode("shift_jis")
    res = extract_document(data)
    assert res.title == "日本語ページ"
    assert res.main_text == JP_BODY + "\n" + JP_BODY + "\n" + JP_BODY
    assert res.status == "ok"


def test_a6_euc_jp_page():
    data = _jp_page("EUC-JP").encode("euc_jp")
    res = extract_document(data)
    assert res.main_text == JP_BODY + "\n" + JP_BODY + "\n" + JP_BODY


def test_a6_wrong_declared_charset_garbles():
    # declared EUC-JP but actually Shift_JIS bytes: the re-decode (faithfully)
    # produces mojibake — the reference behaves identically
    data = _jp_page("EUC-JP").encode("shift_jis")
    res = extract_document(data)
    assert JP_BODY not in res.main_text


def test_a6_unknown_declared_charset_is_page_error():
    data = _jp_page("KLINGON-8").encode("utf-8")
    res = extract_document(data)
    assert res.status.startswith("error:")
    assert res.main_text == ""


def test_a10_no_body():
    res = extract_document(b"<html><head><title>T</title></head></html>")
    assert res.title == "T"
    assert res.main_text == ""
    assert res.status == "ok"


def test_a10_empty_body():
    res = extract_document(b"<html><body></body></html>")
    assert res.main_text == ""
    assert res.status == "ok"


def test_a10_empty_bytes():
    res = extract_document(b"")
    assert res == DocumentExtract()


def test_a10_entities_nbsp_roundtrip():
    # &nbsp; → U+00A0 in DOM → re-escaped &nbsp; by F9 → unescaped by T8 →
    # stripped by T10's [\s ] class: contributes NO density
    html = f"<body><div><p>{L1}</p><p>&nbsp;&nbsp;&nbsp;</p><p>{L2}</p></div></body>"
    res = extract_from_html(html)
    # the nbsp line is emitted? tokens are empty → line skipped in emit
    assert "\xa0" not in res.main_text.replace(L1, "").replace(L2, "")


def test_error_status_fractional_px():
    html = f'<body><span style="font-size:9.5px">x</span><div><p>{L1}</p></div></body>'
    res = extract_document(html.encode())
    assert res.status == "error:ValueError"
    assert res.main_text == ""


def test_decode_html_fallback_utf8():
    assert decode_html(b"plain") == "plain"


def test_detect_iso2022jp_escape_sniff():
    from contentextractor_spark.operators.charset import detect_charset

    data = "こんにちは世界".encode("iso2022_jp")
    assert data.decode("ascii", errors="strict")  # pure 7-bit on the wire
    assert detect_charset(data) == "ISO-2022-JP"
    assert decode_html(data) == "こんにちは世界"


def test_detect_utf16_bom_both_endians():
    from contentextractor_spark.operators.charset import detect_charset

    s = "日本語 and ascii"
    le = b"\xff\xfe" + s.encode("utf-16-le")
    be = b"\xfe\xff" + s.encode("utf-16-be")
    assert detect_charset(le) == "UTF-16"
    assert detect_charset(be) == "UTF-16"
    # BOM is consumed (Java BOM-aware UnicodeDecoder behavior)
    assert decode_html(le) == s
    assert decode_html(be) == s


def test_java_decode_bomless_utf16_is_big_endian():
    # Java's UTF-16 charset defaults BOM-less input to BIG-endian; Python's
    # utf-16 codec to little-endian (r3 review) — a meta-declared UTF-16
    # page without a BOM must decode like Java, not byte-swap
    from contentextractor_spark.operators.charset import java_decode

    s = "日本語テキスト"
    assert java_decode(s.encode("utf-16-be"), "UTF-16") == s
    # BOM'd input keeps its declared endianness either way
    assert java_decode(b"\xff\xfe" + s.encode("utf-16-le"), "UTF-16") == s
    assert java_decode(b"\xfe\xff" + s.encode("utf-16-be"), "UTF-16") == s


def test_detect_utf8_bom_stays_utf8():
    from contentextractor_spark.operators.charset import detect_charset

    data = b"\xef\xbb\xbf" + "abc".encode("utf-8")
    # juniversalchardet reports UTF-8; Java's UTF-8 decoder KEEPS the BOM
    # char (U+FEFF) — faithful
    assert detect_charset(data) == "UTF-8"
    assert decode_html(data) == "﻿abc"
