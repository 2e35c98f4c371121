"""DOM-level boilerplate removal — tagFiltering (ContentExtractor.java:267-360).

Runs the reference's F1–F8 sub-operators **in order** (each mutates the
tree) and returns the non-pretty serialized body HTML (F9), or None for a
missing body — exactly the reference's contract
(``tagFiltering(Element) -> String`` returning null at :269-271).

Java-regex → Python translations applied here (the reference patterns use
Java ``\\s`` = ASCII-only and ``\\d`` = [0-9]; Python's are Unicode-aware,
e.g. Python ``\\d`` matches full-width ０-９ which would change F7):
every ``\\s`` is spelled ``[ \\t\\n\\x0B\\f\\r]`` and every ``\\d`` is
``[0-9]``.

Error semantics are faithful: conditions that throw in Java (removing an
already-detached node, fractional px font sizes, valueless style
declarations) raise here; the per-document wrapper maps them to a skipped
page just like the reference's per-URL try/catch
(ContentExtractor.java:200-207).
"""

from __future__ import annotations

import re

from ..functions.entities import unescape_html4
from ..functions.javacompat import (
    JAVA_TRIM_CHARS as _JAVA_TRIM,
    java_split_drop_trailing as _java_split_drop_trailing,
)
from .dom import Element

# strip class used by F1 (ContentExtractor.java:282,286): Java \s + a literal
# U+00A0 (byte-verified in the reference source).
_F1_STRIP_RE = re.compile("[ \t\n\x0b\f\r\u00a0]")

# F3 (ContentExtractor.java:307)
ID_REGEX = (
    "(?i)(header|footer|ft|side|links|keywords|calendar|calender|rule"
    "|attention|banner|bn|navi|recommend|plugin|[_-]+ad[_-]+|^ad[_-]+"
    "|[_-]+ad$){1}"
)
# F4 (ContentExtractor.java:309)
CLASS_REGEX = (
    "(?i)(header|footer|links|calendar|calender|no_display|nodisplay|rule"
    "|attention|banner|bn|navi|month|recommend|plugin|[_-]+ad[_-]+|^ad[_-]+"
    "|[_-]+ad$){1}"
)
# F5 (ContentExtractor.java:311) — Java [\s] spelled out
STYLE_HIDDEN_REGEX = (
    "(?i)(display[ \\t\\n\\x0B\\f\\r]*:[ \\t\\n\\x0B\\f\\r]*none"
    "|visible[ \\t\\n\\x0B\\f\\r]*:[ \\t\\n\\x0B\\f\\r]*hidden){1}"
)
# F7 (ContentExtractor.java:332) — Java \d spelled [0-9]
PAGINATION_REGEX = (
    "前[0-9]+|次[0-9]+|最新[0-9]+|^[0-9]+$|前へ|次へ|戻る|トップページ|ホーム"
    "|記事|もっと見る|利用規約|案内|問い合わせ|プライバシー|スマホ版"
)
# F6 blacklists (ContentExtractor.java:313,315-316)
TAG_BLACKLIST_1 = (
    "select, noscript, head, header, script, style, footer, aside, time, "
    "small, h1, h2, h3, h4, h5, h6"
)
TAG_BLACKLIST_2 = "form, iframe, textarea, input"

_INT_RE = re.compile(r"[+-]?[0-9]+")
_DOUBLE_RE = re.compile(
    r"[ \t\n\x0b\f\r]*[+-]?([0-9]+\.?[0-9]*|\.[0-9]+)([eE][+-]?[0-9]+)?[fFdD]?[ \t\n\x0b\f\r]*"
)


def _java_parse_int(s: str) -> int:
    """Integer.parseInt — no whitespace tolerance, no fraction, and the
    32-BIT range check: a font-size of 9999999999px overflows int in Java
    (NumberFormatException → page skipped via the per-URL catch); Python
    int() succeeding would keep the node and silently diverge (r3
    review)."""
    if not _INT_RE.fullmatch(s):
        raise ValueError(f'For input string: "{s}"')
    v = int(s)
    if not (-(2**31) <= v <= 2**31 - 1):
        raise ValueError(f'For input string: "{s}"')
    return v


# Java HexFloatingPointLiteral: 0x hex-digits [. hex-digits] p exponent
_HEX_DOUBLE_RE = re.compile(
    r"[ \t\n\x0b\f\r]*[+-]?0[xX]"
    r"([0-9a-fA-F]+\.?[0-9a-fA-F]*|\.[0-9a-fA-F]+)"
    r"[pP][+-]?[0-9]+[fFdD]?[ \t\n\x0b\f\r]*"
)


def _java_parse_double(s: str) -> float:
    """Double.parseDouble — trims whitespace, allows f/d suffix, and
    accepts Java's hex-float literals (0x1.8p1 == 3.0; r3 review: these
    parsed in Java but raised here, flipping a removable node into a
    page-level error)."""
    if _HEX_DOUBLE_RE.fullmatch(s):
        return float.fromhex(
            s.strip(" \t\n\x0b\f\r").rstrip("fFdD").lower()
        )
    if not _DOUBLE_RE.fullmatch(s):
        raise ValueError(f'For input string: "{s}"')
    return float(s.strip(" \t\n\x0b\f\r").rstrip("fFdD"))


def _strip_f1(s: str) -> str:
    return _F1_STRIP_RE.sub("", s)


def _subtree_stats(node: Element) -> tuple[int, list[Element], int, int]:
    """Single DFS: (descendant element count, a-descendants in preorder,
    br count, span count) — replaces four selects per F1 candidate."""
    n_desc = 0
    a_list: list[Element] = []
    n_br = 0
    n_span = 0
    for el in node.iter_elements():
        if el is node:
            continue
        n_desc += 1
        t = el.tag
        if t == "a":
            a_list.append(el)
        elif t == "br":
            n_br += 1
        elif t == "span":
            n_span += 1
    return n_desc, a_list, n_br, n_span


def remove_link_blocks(body: Element) -> None:
    """F1 (ContentExtractor.java:275-299): link-density block removal.
    Candidate discovery and the :has(a) marking share ONE preorder pass
    (an <a> is visited after its ancestors, so every candidate is already
    collected when its subtree marks it); per-node counts are a fused
    single-pass traversal; the arithmetic is verbatim reference semantics."""
    marked: set[int] = set()
    candidates: list[Element] = []
    for el in body.iter_elements():
        t = el.tag
        if t == "a":
            p = el.parent
            while p is not None and id(p) not in marked:
                marked.add(id(p))
                p = p.parent
        elif t in ("div", "span", "ul"):
            candidates.append(el)
    link_blocks = [el for el in candidates if id(el) in marked]
    for node in link_blocks:
        n_desc, e_a, br_node_num, span_node_num = _subtree_stats(node)
        child_of_a = 0
        a_txt_num = 0
        for a in e_a:
            child_of_a += len(a.get_all_elements()) - 1
            a_txt_num += len(_strip_f1(unescape_html4(a.text())))
        node_txt = _strip_f1(unescape_html4(node.text()))
        # keep blocks with >= 100 chars of non-link text
        if len(node_txt) - a_txt_num >= 100:
            continue
        direct_a_num = sum(
            1 for c in node.children if isinstance(c, Element) and c.tag == "a"
        )
        a_num = len(e_a)
        child_node_num = max(
            float(a_num),
            float(
                n_desc - child_of_a - a_num + direct_a_num
                - br_node_num - span_node_num
            ),
        )
        if a_num / child_node_num > 0.5:
            node.remove()


def remove_topic_blocks(body: Element) -> None:
    """F2 (ContentExtractor.java:302-305): remove the *parent* of a
    div whose own text is exactly トピックス."""
    for node in body.select("div:matchesOwn(^トピックス$)"):
        parent = node.parent
        if parent is None:
            raise ValueError("node.parent() is null (NPE in reference)")
        parent.remove()


def remove_by_selector(body: Element, query: str) -> None:
    for node in body.select(query):
        node.remove()


# Precompiled F3/F4/F5 predicates (Pattern.find semantics).
_ID_RE = re.compile(ID_REGEX)
_CLASS_RE = re.compile(CLASS_REGEX)
_STYLE_HIDDEN_RE = re.compile(STYLE_HIDDEN_REGEX)
_BLACKLIST_TAGS = frozenset(
    t.strip() for t in (TAG_BLACKLIST_1 + ", " + TAG_BLACKLIST_2).split(",")
)


def remove_attr_and_tag_filtered(body: Element) -> None:
    """F3+F4+F5 fused into one traversal, then F6 (two tag blacklists +
    span[data-tipso]) fused into another.

    End-state equivalence with the reference's five sequential selects:
    all predicates here are *intrinsic* (attributes / tag name — never text
    or structure), so no removal can change a later predicate's verdict;
    removing the same node set in any order detaches the same nodes.  The
    reference's later selects simply never revisit already-detached nodes,
    which the single-list dedup reproduces.  (F7 is NOT fused: its
    :matches() reads subtree text, which F6 removals can change.)
    """
    # ONE collection pass: the F3/F4/F5 attribute predicates and the F6 tag
    # blacklist are all intrinsic, so the union set removed in document
    # order detaches exactly the nodes the reference's sequential selects
    # detach (a node matching several predicates is collected once)
    to_remove: list[Element] = []
    for el in body.iter_elements():
        attrs = el.attrs
        if attrs:
            v = attrs.get("id")
            if v is not None and _ID_RE.search(v):
                to_remove.append(el)
                continue
            v = attrs.get("class")
            if v is not None and _CLASS_RE.search(v):
                to_remove.append(el)
                continue
            v = attrs.get("style")
            if v is not None and _STYLE_HIDDEN_RE.search(v):
                to_remove.append(el)
                continue
        if el.tag in _BLACKLIST_TAGS or (
            el.tag == "span" and "data-tipso" in el.attrs
        ):
            to_remove.append(el)
    for el in to_remove:
        el.remove()


def remove_small_fonts(body: Element) -> None:
    """F8 (ContentExtractor.java:334-357): drop nodes with inline
    font-size < 10px / 7.5pt / 0.625em.  Faithful error behavior: a
    fractional px value or a bare `font-size` without a colon raises."""
    for node in body.select("[style~=(?i)(font-size){1}]"):
        declarations = _java_split_drop_trailing(node.attr("style").lower(), ";")
        for style in declarations:
            if "font-size" not in style:
                continue
            key_val = style.split(":")
            if len(key_val) < 2:
                raise IndexError("style declaration has no value (AIOOBE in reference)")
            val = key_val[1].strip(_JAVA_TRIM)  # Java trim
            if len(val) < 2:
                raise IndexError("font-size value shorter than unit (SIOOBE in reference)")
            unit = val[-2:]
            font_size = val[:-2]
            if unit == "px":
                if _java_parse_int(font_size) < 10:
                    node.remove()
            elif unit == "pt":
                if _java_parse_double(font_size) < 7.5:
                    node.remove()
            elif unit == "em":
                if _java_parse_double(font_size) < 0.625:
                    node.remove()


def tag_filtering_dom(body: Element | None) -> Element | None:
    """F1–F8 (ContentExtractor.java:267-357), returning the mutated DOM —
    lets the DOM→lines fused path skip serialization (F9)."""
    if body is None:
        return None
    remove_link_blocks(body)                                   # F1
    remove_topic_blocks(body)                                  # F2
    remove_attr_and_tag_filtered(body)                         # F3-F6 fused
    remove_by_selector(body, f"a:matches({PAGINATION_REGEX})")  # F7
    remove_small_fonts(body)                                   # F8
    return body


def tag_filtering(body: Element | None) -> str | None:
    """The full F1–F9 cascade (ContentExtractor.java:267-360)."""
    body = tag_filtering_dom(body)
    if body is None:
        return None
    return body.outer_html()                                   # F9 (non-pretty)
