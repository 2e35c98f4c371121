"""Differential: the fused DOM→lines path must be byte-identical to the
serialize (F9) + regex re-lex (T1-T8) path on arbitrary documents.

This is the gate that allows extractor.py to default to the fast path
(SURVEY.md §3: "optimize to direct DOM→lines later only if golden tests
still pass")."""

import numpy as np
from hypothesis import given, settings, strategies as st

from contentextractor_spark.functions.fused import fused_parse
from contentextractor_spark.functions.textextract import parse as serialize_parse
from contentextractor_spark.operators.dom import parse_xml

TAGS = [
    "div", "span", "p", "br", "ul", "li", "meta", "link", "table", "section",
    "dl", "dd", "dt", "ol", "a", "foo", "brx", "broke", "lines", "metadata",
    "linker", "tr", "td", "body", "pre",
]
ATTR_VALUES = ["", "x", "a b", "a\nb", "\xa0", "　", "nav"]
WEIRD_ATTR_VALUES = ["a>b", "a<b", "<", ">"]
TEXTS = [
    "hello world", " ", "　", "\t", "\n", "a&amp;b", "&bogus;", "&#65;",
    "x < y", "1 > 0", "&amp;amp;", "dense line with many words here ok",
    "\xa0", "&nbsp;", "ＡＢ漢字", "&", "&amp", "text&#x3042;more",
]


@st.composite
def fragments(draw):
    kind = draw(st.integers(0, 5))
    tag = draw(st.sampled_from(TAGS))
    if kind == 0:
        attr = draw(st.sampled_from(ATTR_VALUES + WEIRD_ATTR_VALUES))
        if attr:
            return f'<{tag} class="{attr}">'
        return f"<{tag}>"
    if kind == 1:
        return f"</{tag}>"
    if kind == 2:
        return f"<{tag}/>"
    if kind == 3:
        return draw(st.sampled_from(TEXTS))
    if kind == 4:
        return "<!-- a comment -->"
    return "<br>"


@settings(max_examples=400, deadline=None)
@given(st.lists(fragments(), min_size=0, max_size=25))
def test_fused_equals_serialize_path(frags):
    html = "".join(frags)
    doc = parse_xml(html)
    fused = fused_parse(doc)
    if fused is None:
        return  # bail path: weird attrs → serialize path used in prod
    ser = serialize_parse(doc.outer_html())
    assert fused.text == ser.text, html
    assert fused.spans == ser.spans, html
    assert fused.threshold == ser.threshold, html
    assert fused.blocks == ser.blocks, html
    assert np.array_equal(fused.density, ser.density), html


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=300))
def test_fused_never_crashes_on_soup(s):
    doc = parse_xml(s)
    fused = fused_parse(doc)
    if fused is not None:
        ser = serialize_parse(doc.outer_html())
        assert fused.text == ser.text, s


def test_fused_bails_on_weird_attrs():
    doc = parse_xml('<div class="a>b"><p>x</p></div>')
    assert fused_parse(doc) is None


def test_fused_handles_br_chains():
    cases = [
        "a<br><br><br>b",
        "a<br>　<br> \t<br>b",
        "a<br>b<br>c",
        "<div>a<br><!--c--><br>b</div>",
        "<br><meta x><br>dense",
        "x<br></meta><br>y",
        "<broke /><br>z",
        # regression (found by the 30k fuzz): the chain's trailing [ws]*
        # consumes a ws-PREFIX of the following text token
        "<br><br>　dense line with many words here ok",
        "<br> <br>  partially indented text after chain",
        "<br>　 mixed　ws single br keeps prefix",
    ]
    for html in cases:
        doc = parse_xml(html)
        fused = fused_parse(doc)
        assert fused is not None, html
        ser = serialize_parse(doc.outer_html())
        assert fused.text == ser.text, html
        assert list(fused.density) == list(ser.density), html
