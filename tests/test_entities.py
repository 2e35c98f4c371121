"""Unit goldens for javacompat + HTML4 entity unescape (SURVEY.md §2.5 T8)."""

from contentextractor_spark.functions.entities import HTML40_ENTITIES, unescape_html4
from contentextractor_spark.functions.javacompat import java_round, java_trim


def test_entity_table_size():
    # commons-lang 2.6 HTML40: 4 basic + 96 ISO-8859-1 + 152 extended = 252
    assert len(HTML40_ENTITIES) == 252


def test_basic_entities():
    assert unescape_html4("&amp;&lt;&gt;&quot;") == '&<>"'


def test_apos_is_not_html4():
    # HTML 4.0 has no &apos; — commons-lang passes it through verbatim
    assert unescape_html4("a&apos;b") == "a&apos;b"


def test_numeric_refs():
    assert unescape_html4("&#x3042;") == "あ"
    assert unescape_html4("&#12354;") == "あ"
    assert unescape_html4("&#X3042;") == "あ"


def test_numeric_over_bmp_passthrough():
    # commons-lang rejects values > 0xFFFF → verbatim
    assert unescape_html4("&#x1F600;") == "&#x1F600;"


def test_nbsp():
    assert unescape_html4("a&nbsp;b") == "a b"


def test_bare_amp_no_semicolon():
    assert unescape_html4("a & b") == "a & b"
    assert unescape_html4("fish &chips") == "fish &chips"


def test_amp_before_semicolon():
    # &...&...; → first & literal
    assert unescape_html4("&x&amp;") == "&x&"


def test_unknown_entity_passthrough():
    assert unescape_html4("&heartsuit;") == "&heartsuit;"


def test_single_pass_no_rescan():
    # "&amp;copy;" decodes the &amp; then copies "copy;" literally
    assert unescape_html4("&amp;copy;") == "&copy;"


def test_case_sensitive_names():
    assert unescape_html4("&COPY;") == "&COPY;"
    assert unescape_html4("&copy;") == "©"
    assert unescape_html4("&Auml;") == "Ä"
    assert unescape_html4("&auml;") == "ä"


def test_java_trim():
    # Java trim strips <= U+0020 only — not NBSP / ideographic space
    assert java_trim("  \t\nabc\r\n ") == "abc"
    assert java_trim(" abc　") == " abc　"
    assert java_trim("\x00\x1fabc") == "abc"
    assert java_trim("") == ""


def test_java_round_half_up():
    assert java_round(0.5) == 1
    assert java_round(1.5) == 2
    assert java_round(2.5) == 3  # numpy half-even would give 2
    assert java_round(0.25) == 0
    assert java_round(7 / 4.0 + 0.0) == 2  # round(1.75)=2
    assert java_round(0.0) == 0
