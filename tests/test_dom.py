"""DOM parser / selector / serializer goldens (SURVEY.md §2.3, jsoup-1.9.1
XML-mode semantics)."""

import pytest

from contentextractor_spark.operators.dom import (
    Document,
    Element,
    elements_attr,
    escape_attr,
    escape_xml_text,
    parse_xml,
    select,
)


# ---------- parsing ----------

def test_parse_simple_tree():
    doc = parse_xml("<html><body><div id=a>hi</div></body></html>")
    body = doc.select("body")[0]
    div = body.select("div")[0]
    assert div.attr("id") == "a"
    assert div.text() == "hi"


def test_xml_mode_no_implied_elements():
    # XML mode: no implied html/head/body wrapper
    doc = parse_xml("<div>x</div>")
    assert doc.select("body") == []
    assert doc.select("html") == []
    assert len(doc.select("div")) == 1


def test_tag_and_attr_names_lowercased():
    # jsoup 1.9.1 lowercases tag + attribute names at tokenise time
    doc = parse_xml('<DIV CLASS="Big">x</DIV>')
    div = doc.select("div")[0]
    assert div.tag == "div"
    assert div.attr("class") == "Big"  # value case preserved


def test_unmatched_end_tag_ignored():
    doc = parse_xml("<div>a</span>b</div>")
    div = doc.select("div")[0]
    assert div.text() == "ab"


def test_end_tag_pops_through_intermediates():
    # </div> closes the div, implicitly ending the unclosed <span>
    doc = parse_xml("<div><span>a</div><p>b</p>")
    p = doc.select("p")[0]
    assert p.parent is doc  # p is NOT inside span/div
    span = doc.select("span")[0]
    assert span.parent.tag == "div"


def test_void_tag_not_special_in_xml_mode():
    # XML mode pushes <br>: following text becomes br's child
    doc = parse_xml("<div>a<br>b</div>")
    br = doc.select("br")[0]
    assert len(br.children) == 1
    assert br.text() == "b"


def test_self_closing_not_pushed():
    doc = parse_xml("<div>a<br/>b</div>")
    br = doc.select("br")[0]
    assert br.children == []
    assert doc.select("div")[0].text() == "a b"  # br forces a space in text()


def test_entities_decoded_in_text_and_attrs():
    doc = parse_xml('<div title="a&amp;b">x&nbsp;y&#x3042;</div>')
    div = doc.select("div")[0]
    assert div.attr("title") == "a&b"
    assert div.children[0].text == "x\xa0yあ"


def test_unknown_entity_left_verbatim():
    doc = parse_xml("<div>&bogus42;</div>")
    assert doc.select("div")[0].children[0].text == "&bogus42;"


def test_comment_and_doctype_nodes():
    doc = parse_xml("<!DOCTYPE html><!-- hi --><div>x</div>")
    html = doc.outer_html()
    assert html == "<!DOCTYPE html><!-- hi --><div>x</div>"


def test_bare_lt_is_text():
    doc = parse_xml("<div>1 < 2</div>")
    assert doc.select("div")[0].text() == "1 < 2"


def test_attr_quoted_value_with_gt():
    doc = parse_xml('<a onclick="x>y" href="h">t</a>')
    a = doc.select("a")[0]
    assert a.attr("onclick") == "x>y"
    assert a.attr("href") == "h"


def test_boolean_attr():
    doc = parse_xml("<input disabled>")
    assert doc.select("input")[0].attr("disabled") == ""
    assert doc.select("input")[0].has_attr("disabled")


# ---------- text() semantics ----------

def test_text_whitespace_normalised():
    doc = parse_xml("<div>  a\n\t b  <span>c</span>d </div>")
    assert doc.select("div")[0].text() == "a b cd"


def test_text_block_elements_insert_space():
    doc = parse_xml("<div><p>a</p><p>b</p></div>")
    assert doc.select("div")[0].text() == "a b"


def test_text_inline_no_space():
    doc = parse_xml("<div><span>a</span><span>b</span></div>")
    assert doc.select("div")[0].text() == "ab"


def test_text_nbsp_not_whitespace():
    # jsoup isWhitespace excludes U+00A0 — it survives normalization
    doc = parse_xml("<div>a&nbsp;b</div>")
    assert doc.select("div")[0].text() == "a\xa0b"


def test_own_text():
    doc = parse_xml("<div> own <span>nested</span> more </div>")
    assert doc.select("div")[0].own_text() == "own more"


def test_title_preserves_then_normalises():
    doc = parse_xml("<html><head><title> A  Title\n here </title></head></html>")
    assert doc.title() == "A Title here"


# ---------- selectors ----------

FIXTURE = """
<body>
 <div id="header_ad">topad</div>
 <div class="navi-bar"><a href="1">one</a></div>
 <ul><li><a href="2">two</a></li></ul>
 <span data-tipso="x">tip</span>
 <div>トピックス</div>
 <div style="display: none">hidden</div>
 <a href="3">次へ</a>
 <div id="main"><p>content</p><a href="4">four</a></div>
</body>
"""


def test_select_tag_group():
    doc = parse_xml(FIXTURE)
    got = {e.tag for e in doc.select("span, ul")}
    assert got == {"span", "ul"}


def test_select_has():
    doc = parse_xml(FIXTURE)
    divs = doc.select("div:has(a)")
    ids = [e.attr("id") or e.attr("class") for e in divs]
    assert ids == ["navi-bar", "main"]


def test_select_has_excludes_self_match():
    # :has looks at strict descendants only
    doc = parse_xml("<a><a>inner</a></a>")
    root_a = doc.select("a:has(a)")
    assert len(root_a) == 1
    assert root_a[0].children != []


def test_select_attr_regex_find_semantics():
    # [id~=re] is Pattern.find — substring match, per SURVEY F3
    doc = parse_xml(FIXTURE)
    found = doc.select(
        "[id~=(?i)(header|footer|ft|side|links|keywords|calendar|calender|rule"
        "|attention|banner|bn|navi|recommend|plugin|[_-]+ad[_-]+|^ad[_-]+"
        "|[_-]+ad$){1}]"
    )
    assert [e.attr("id") for e in found] == ["header_ad"]


def test_select_class_regex():
    doc = parse_xml(FIXTURE)
    found = doc.select("[class~=(?i)(navi){1}]")
    assert [e.attr("class") for e in found] == ["navi-bar"]


def test_select_style_regex():
    doc = parse_xml(FIXTURE)
    found = doc.select("[style~=(?i)(display[\\s]*:[\\s]*none|visible[\\s]*:[\\s]*hidden){1}]")
    assert len(found) == 1
    assert found[0].text() == "hidden"


def test_select_matches_own():
    doc = parse_xml(FIXTURE)
    found = doc.select("div:matchesOwn(^トピックス$)")
    assert len(found) == 1


def test_select_matches_on_a():
    doc = parse_xml(FIXTURE)
    found = doc.select("a:matches(前\\d+|次\\d+|次へ|戻る)")
    assert len(found) == 1
    assert found[0].attr("href") == "3"


def test_select_attr_value_ci_trim():
    doc = parse_xml('<meta http-equiv=" Content-TYPE " content="text/html; charset=x">')
    # jsoup AttributeWithValue: element value trimmed + case-insensitive
    found = doc.select('meta[http-equiv="content-type"]')
    assert len(found) == 1


def test_select_presence_attr():
    doc = parse_xml(FIXTURE)
    assert len(doc.select("span[data-tipso]")) == 1


def test_select_child_combinator():
    doc = parse_xml('<div><a href=1>d</a><span><a href=2>n</a></span></div>')
    div = doc.select("div")[0]
    direct = div.select(">a")
    assert len(direct) == 1
    assert direct[0].attr("href") == "1"


def test_select_includes_root_if_matching():
    doc = parse_xml("<div id=x><div id=y></div></div>")
    outer = doc.select("div")[0]
    got = [e.attr("id") for e in outer.select("div")]
    assert got == ["x", "y"]  # root included, document order


def test_elements_attr_first_having():
    doc = parse_xml('<meta name="a"><meta name="b" content="C">')
    metas = doc.select("meta")
    assert elements_attr(metas, "content") == "C"
    assert elements_attr(metas, "missing") == ""


def test_get_all_elements_counts_self():
    doc = parse_xml("<div><span><a>x</a></span><p>y</p></div>")
    div = doc.select("div")[0]
    assert len(div.get_all_elements()) == 4  # div, span, a, p


# ---------- removal ----------

def test_remove_node():
    doc = parse_xml("<div><span>a</span>b</div>")
    doc.select("span")[0].remove()
    assert doc.select("div")[0].text() == "b"
    assert doc.select("span") == []


def test_remove_detached_raises():
    doc = parse_xml("<div><span>a</span></div>")
    span = doc.select("span")[0]
    span.remove()
    with pytest.raises(ValueError):
        span.remove()


def test_remove_descendant_of_removed_is_noop_like():
    # snapshot semantics: removing a child of an already-removed subtree
    # works (parent chain intact within the detached subtree)
    doc = parse_xml("<div id=o><div id=i><a>x</a></div></div>")
    outer, inner = doc.select("div")
    outer.remove()
    inner.remove()  # no raise — inner's parent is outer (detached)


# ---------- serialization ----------

def test_serialize_roundtrip_basic():
    src = '<div id="a"><p>hi</p>there</div>'
    assert parse_xml(src).outer_html() == src


def test_serialize_escapes_text():
    doc = Document()
    el = Element("p")
    doc.append(el)
    from contentextractor_spark.operators.dom import TextNode

    el.append(TextNode("a<b & c\xa0d"))
    assert el.outer_html() == "<p>a&lt;b &amp; c&nbsp;d</p>"


def test_serialize_escapes_attr():
    src = '<div title="a&amp;b&quot;c">x</div>'
    assert parse_xml(src).outer_html() == src


def test_serialize_void_tag():
    assert parse_xml("<br/>").outer_html() == "<br>"
    assert parse_xml('<img src="x"/>').outer_html() == '<img src="x">'


def test_serialize_unknown_selfclosing():
    assert parse_xml("<foo/>").outer_html() == "<foo />"


def test_serialize_known_nonvoid_selfclosed():
    assert parse_xml("<div/>").outer_html() == "<div></div>"


def test_serialize_boolean_attr_collapse():
    assert parse_xml("<input disabled>").outer_html() == "<input disabled>"
    # non-boolean attr with empty value keeps `=""`
    assert parse_xml("<div data-x>").outer_html() == '<div data-x=""></div>'


def test_serialize_entity_roundtrip_nbsp():
    # &nbsp; decoded to U+00A0 at parse, re-escaped to &nbsp; at serialize —
    # the F9→T8→T10 interplay from SURVEY.md §3
    src = "<p>a&nbsp;b</p>"
    assert parse_xml(src).outer_html() == src


def test_escape_helpers():
    assert escape_xml_text("<&>\xa0") == "&lt;&amp;&gt;&nbsp;"
    assert escape_attr('"&\xa0<') == "&quot;&amp;&nbsp;<"
