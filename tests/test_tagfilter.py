"""F1–F8 goldens (SURVEY.md §2.3; ContentExtractor.java:267-360)."""

import pytest

from contentextractor_spark.operators.dom import parse_xml
from contentextractor_spark.operators.tagfilter import (
    remove_link_blocks,
    remove_small_fonts,
    remove_topic_blocks,
    tag_filtering,
)


def body_of(html: str):
    return parse_xml(html).select_first("body")


# ---------- F1 link blocks ----------

def test_f1_link_farm_removed():
    # ul with 3 links, no free text: a_num=3, getAll=7 (ul+3li+3a),
    # child = max(3, 7-1-0-3+0-0-0=3) → 3/3=1.0 > 0.5 → removed
    b = body_of(
        "<body><ul>"
        '<li><a href="1">one</a></li>'
        '<li><a href="2">two</a></li>'
        '<li><a href="3">three</a></li>'
        "</ul><p>keep</p></body>"
    )
    remove_link_blocks(b)
    assert b.select("ul") == []
    assert len(b.select("p")) == 1


def test_f1_long_text_keep_branch():
    # >= 100 chars of non-link text → kept regardless of link density
    filler = "x" * 120
    b = body_of(f'<body><div><a href="1">l</a>{filler}</div></body>')
    remove_link_blocks(b)
    assert len(b.select("div")) == 1


def test_f1_low_density_kept():
    # div with 1 a and 3 p: getAll=5, child=max(1, 5-1-0-1+1-0-0=4) → 0.25
    b = body_of('<body><div><a href="1">l</a><p>a</p><p>b</p><p>c</p></div></body>')
    remove_link_blocks(b)
    assert len(b.select("div")) == 1


def test_f1_direct_child_a_removed():
    # div with single direct a: getAll=2, child=max(1, 2-1-0-1+1=1) → 1.0 → gone
    b = body_of('<body><div><a href="/">Home</a></div></body>')
    remove_link_blocks(b)
    assert b.select("div") == []


# ---------- F2 topic blocks ----------

def test_f2_topic_parent_removed():
    b = body_of(
        "<body><div id='wrap'><div>トピックス</div><ul><li>x</li></ul></div>"
        "<p>keep</p></body>"
    )
    remove_topic_blocks(b)
    assert b.select("ul") == []
    assert len(b.select("p")) == 1


def test_f2_own_text_must_match_exactly():
    b = body_of("<body><div><div>今週のトピックス</div></div></body>")
    remove_topic_blocks(b)
    assert len(b.select("div")) == 2  # ^トピックス$ anchored — no match


# ---------- F3-F7 via full cascade ----------

def test_f3_id_patterns():
    html = (
        "<body>"
        '<div id="header_x">h</div>'
        '<div id="ad_top">a</div>'
        '<div id="my-ad">m</div>'
        '<div id="myad">keep1</div>'
        '<div id="content">keep2</div>'
        "</body>"
    )
    out = tag_filtering(body_of(html))
    assert "keep1" in out and "keep2" in out
    assert "header_x" not in out and "ad_top" not in out and "my-ad" not in out


def test_f4_class_patterns():
    html = (
        "<body>"
        '<div class="no_display">x</div>'
        '<div class="month-view">y</div>'
        '<div class="article">keep</div>'
        "</body>"
    )
    out = tag_filtering(body_of(html))
    assert "keep" in out
    assert "no_display" not in out and "month-view" not in out


def test_f5_hidden_styles():
    html = (
        "<body>"
        '<div style="display: none">x</div>'
        '<div style="visible : hidden">y</div>'
        '<div style="visibility:hidden">sic-keep</div>'
        "</body>"
    )
    out = tag_filtering(body_of(html))
    # the reference pattern says "visible:hidden" — real visibility:hidden survives
    assert "sic-keep" in out
    assert ">x<" not in out and ">y<" not in out


def test_f6_tag_blacklist():
    html = (
        "<body><script>var x;</script><style>.a{}</style><h1>t</h1>"
        "<small>s</small><form>f</form><iframe>i</iframe>"
        '<span data-tipso="t">tip</span><p>keep</p></body>'
    )
    out = tag_filtering(body_of(html))
    assert "keep" in out
    for gone in ("var x", ".a{}", ">t<", ">s<", ">f<", ">i<", "tip"):
        assert gone not in out


def test_f7_pagination_links():
    html = (
        "<body>"
        '<a href="1">次へ</a><a href="2">42</a><a href="3">前へ進む</a>'
        '<a href="4">normal link text</a>'
        "</body>"
    )
    out = tag_filtering(body_of(html))
    assert "normal link text" in out
    assert "次へ" not in out and ">42<" not in out and "前へ" not in out


def test_f7_fullwidth_digits_not_matched():
    # Java \d is ASCII — a pure full-width-digit link does NOT match ^\d+$
    html = '<body><a href="1">４２</a></body>'
    out = tag_filtering(body_of(html))
    assert "４２" in out


# ---------- F8 font sizes ----------

def test_f8_small_fonts_removed():
    html = (
        "<body>"
        '<span style="font-size:9px">gone-px</span>'
        '<span style="font-size:10px">keep-px</span>'
        '<span style="font-size:7pt">gone-pt</span>'
        '<span style="font-size:7.5pt">keep-pt</span>'
        '<span style="font-size:0.5em">gone-em</span>'
        '<span style="font-size:0.625em">keep-em</span>'
        "</body>"
    )
    b = body_of(html)
    remove_small_fonts(b)
    out = b.outer_html()
    assert "keep-px" in out and "keep-pt" in out and "keep-em" in out
    assert "gone-px" not in out and "gone-pt" not in out and "gone-em" not in out


def test_f8_fractional_px_raises():
    # Integer.parseInt("9.5") throws in the reference → page-level error
    b = body_of('<body><span style="font-size:9.5px">x</span></body>')
    with pytest.raises(ValueError):
        remove_small_fonts(b)


def test_f8_other_units_ignored():
    b = body_of('<body><span style="font-size:50%">x</span></body>')
    remove_small_fonts(b)
    assert len(b.select("span")) == 1


def test_f8_int_overflow_raises_like_java():
    # Integer.parseInt("9999999999") overflows 32-bit int in Java
    # (NumberFormatException → page-level error); Python int() succeeding
    # silently kept the node before the range check (r3 review)
    b = body_of('<body><span style="font-size:9999999999px">x</span></body>')
    with pytest.raises(ValueError):
        remove_small_fonts(b)


def test_f8_hex_float_parses_like_java():
    # Double.parseDouble accepts hex-float literals: 0x1.8p1 == 3.0 < 7.5
    # → node removed (the old decimal-only regex raised a page error)
    b = body_of('<body><span style="font-size:0x1.8p1pt">gone</span>'
                '<span style="font-size:0x1.8p3pt">keep</span></body>')
    remove_small_fonts(b)
    out = b.outer_html()
    assert "gone" not in out and "keep" in out


def test_meta_name_equals_ignore_case_turkish_dotted_i():
    # jsoup [name=description] uses Java equalsIgnoreCase (simple per-char
    # case map): 'DESCRİPTİON' matches; Python .lower() expands İ to two
    # chars and missed (r3 review)
    from contentextractor_spark.extractor import extract_document

    html = (
        '<html><head><title>t</title>'
        '<meta name="DESCRİPTİON" content="found-it">'
        "</head><body><div><p>some body text here for density</p></div>"
        "</body></html>"
    ).encode("utf-8")
    res = extract_document(html)
    assert res.description == "found-it"


# ---------- contract ----------

def test_tagfiltering_null_body():
    assert tag_filtering(None) is None


def test_tagfiltering_returns_serialized_body():
    out = tag_filtering(body_of("<body><p>hi</p></body>"))
    assert out == "<body><p>hi</p></body>"
