"""Lightweight DOM: Jsoup-1.9.1 *XML parser mode* semantics, from scratch.

The reference parses every page with
``Jsoup.parse(html, "", Parser.xmlParser().setTrackErrors(0))``
(ContentExtractor.java:104,220,248).  XML mode means: NO HTML5 tree
correction (no implied <html>/<head>/<body>, no <tbody> insertion, no
foster parenting), unmatched end tags ignored, stray open tags stay where
they are.  Jsoup 1.9.1 lowercases tag and attribute names at tokenise time
(case preservation arrived in jsoup 1.10's ParseSettings).

Implemented surface — exactly what the reference uses:
  * parse_xml(str) -> Document
  * selectors: tag, groups ``a, b``, ``[attr]``, ``[attr=val]`` (ci, trimmed),
    ``[attr~=regex]`` (Pattern.find), ``:has(sel)`` (descendants only),
    ``:matches(re)`` (find on text()), ``:matchesOwn(re)`` (find on ownText()),
    leading ``>tag`` child combinator (ContentExtractor.java:295)
  * Element.text() / own_text() with jsoup whitespace normalization
  * non-pretty outer_html() matching jsoup-1.9.1 serialization
    (ContentExtractor.java:251 sets prettyPrint(false) before tagFiltering —
    the canonical forTest path, SURVEY.md §2.3 F9)

Per-document, pure Python — runs inside Arrow batches on executors.
"""

from __future__ import annotations

import re

# ---------------------------------------------------------------------------
# node model
# ---------------------------------------------------------------------------

# jsoup Tag.isBlock (1.9.1 Tag.blockTags)
_BLOCK_TAGS = frozenset(
    """html head body frameset script noscript style meta link title frame
    noframes section nav aside hgroup header footer p h1 h2 h3 h4 h5 h6
    ul ol pre div blockquote hr address figure figcaption form fieldset ins
    del dl dt dd li table caption thead tfoot tbody colgroup col tr th td
    video audio canvas details menu plaintext template article main svg
    math""".split()
)

# jsoup Tag.emptyTags — always-void elements
_EMPTY_TAGS = frozenset(
    """meta link base frame img br wbr embed hr input keygen col command
    device area basefont bgsound menuitem param source track""".split()
)

# jsoup Tag preserveWhitespace tags
_PRESERVE_WS_TAGS = frozenset(["pre", "plaintext", "title", "textarea"])

# jsoup Attribute.booleanAttributes (collapse `key=""` to `key` in html syntax)
_BOOLEAN_ATTRS = frozenset(
    """allowfullscreen async autofocus checked compact declare default defer
    disabled formnovalidate hidden inert ismap itemscope multiple muted
    nohref noresize noshade novalidate nowrap open readonly required
    reversed seamless selected sortable truespeed typemustmatch""".split()
)

_JSOUP_WS = " \t\n\f\r"  # StringUtil.isWhitespace
from ..functions.javacompat import (  # noqa: E402
    JAVA_TRIM_CHARS as _JAVA_TRIM_CHARS,
    java_equals_ignore_case as _java_equals_ignore_case,
)


class Node:
    __slots__ = ("parent",)

    def __init__(self) -> None:
        self.parent: Element | None = None

    def remove(self) -> None:
        """jsoup Node.remove(): Validate.notNull(parentNode) — a detached
        node raises, which the reference's per-URL try/catch turns into a
        skipped page."""
        if self.parent is None:
            raise ValueError("node has no parent (jsoup Validate.notNull)")
        self.parent.children.remove(self)
        self.parent = None


class TextNode(Node):
    __slots__ = ("text",)

    def __init__(self, text: str) -> None:
        super().__init__()
        self.text = text


class CommentNode(Node):
    __slots__ = ("data",)

    def __init__(self, data: str) -> None:
        super().__init__()
        self.data = data


class DoctypeNode(Node):
    __slots__ = ("data",)

    def __init__(self, data: str) -> None:
        super().__init__()
        self.data = data  # raw text between "<!DOCTYPE" and ">"


class Element(Node):
    __slots__ = ("tag", "attrs", "children", "self_closing_unknown")

    def __init__(self, tag: str, attrs: dict[str, str] | None = None) -> None:
        super().__init__()
        self.tag = tag
        self.attrs: dict[str, str] = attrs if attrs is not None else {}
        self.children: list[Node] = []
        # unknown tag parsed as <foo /> serializes self-closing (jsoup
        # XmlTreeBuilder.insert: tag.setSelfClosing() for !isKnownTag())
        self.self_closing_unknown = False

    # -- structure -----------------------------------------------------
    def append(self, node: Node) -> None:
        node.parent = self
        self.children.append(node)

    def is_block(self) -> bool:
        return self.tag in _BLOCK_TAGS

    def is_empty_tag(self) -> bool:
        return self.tag in _EMPTY_TAGS

    def iter_elements(self):
        """Preorder DFS over descendant elements, self included
        (jsoup getAllElements)."""
        stack = [self]
        while stack:
            node = stack.pop()
            yield node
            # push children reversed so leftmost pops first
            stack.extend(
                [c for c in reversed(node.children) if isinstance(c, Element)]
            )

    def get_all_elements(self) -> list["Element"]:
        return list(self.iter_elements())

    # -- attributes ----------------------------------------------------
    def attr(self, key: str) -> str:
        return self.attrs.get(key, "")

    def has_attr(self, key: str) -> bool:
        return key in self.attrs

    # -- text ----------------------------------------------------------
    def _preserve_ws(self) -> bool:
        # jsoup Element.preserveWhitespace(node): element's tag, or parent's
        if self.tag in _PRESERVE_WS_TAGS:
            return True
        p = self.parent
        return p is not None and p.tag in _PRESERVE_WS_TAGS

    def text(self) -> str:
        """jsoup 1.9.1 Element.text(): preorder; TextNodes whitespace-
        normalized (unless <pre>-ish parent); a space before block/br
        elements; final Java trim."""
        accum: list[str] = []
        last_ws = [False]  # accum ends with ' '

        def append_normalised(s: str, preserve: bool) -> None:
            if preserve:
                if s:
                    accum.append(s)
                    last_ws[0] = s.endswith(" ")
                return
            out = []
            strip_leading = last_ws[0] or not accum
            last_was_white = False
            reached_non_white = False
            for ch in s:
                if ch in _JSOUP_WS:
                    if (strip_leading and not reached_non_white) or last_was_white:
                        continue
                    out.append(" ")
                    last_was_white = True
                else:
                    out.append(ch)
                    last_was_white = False
                    reached_non_white = True
            if out:
                accum.append("".join(out))
                last_ws[0] = out[-1] == " "

        stack: list[Node] = [self]
        while stack:
            node = stack.pop()
            if isinstance(node, TextNode):
                parent = node.parent
                preserve = parent is not None and parent._preserve_ws()
                append_normalised(node.text, preserve)
            elif isinstance(node, Element):
                if accum and (node.is_block() or node.tag == "br") and not last_ws[0]:
                    accum.append(" ")
                    last_ws[0] = True
                stack.extend(reversed(node.children))
        # Java String.trim at the end (jsoup uses .trim())
        return "".join(accum).strip(_JAVA_TRIM_CHARS)

    def own_text(self) -> str:
        """jsoup Element.ownText(): direct text children normalized; a space
        for direct <br> children; trimmed."""
        accum: list[str] = []
        last_ws = [False]
        for child in self.children:
            if isinstance(child, TextNode):
                s = child.text
                if self._preserve_ws():
                    if s:
                        accum.append(s)
                        last_ws[0] = s.endswith(" ")
                    continue
                out = []
                strip_leading = last_ws[0] or not accum
                last_was_white = False
                reached_non_white = False
                for ch in s:
                    if ch in _JSOUP_WS:
                        if (strip_leading and not reached_non_white) or last_was_white:
                            continue
                        out.append(" ")
                        last_was_white = True
                    else:
                        out.append(ch)
                        last_was_white = False
                        reached_non_white = True
                if out:
                    accum.append("".join(out))
                    last_ws[0] = out[-1] == " "
            elif isinstance(child, Element) and child.tag == "br":
                if not last_ws[0] and accum:
                    accum.append(" ")
                    last_ws[0] = True
        return "".join(accum).strip(_JAVA_TRIM_CHARS)

    # -- select ----------------------------------------------------------
    def select(self, query: str) -> list["Element"]:
        return select(self, query)

    def select_first(self, query: str) -> "Element | None":
        found = select(self, query)
        return found[0] if found else None

    # -- serialization ---------------------------------------------------
    def outer_html(self) -> str:
        """Non-pretty jsoup-1.9.1 outerHtml, html output syntax."""
        buf: list[str] = []
        _serialize(self, buf)
        return "".join(buf)

    def __repr__(self) -> str:  # debug aid
        return f"<Element {self.tag} attrs={self.attrs} kids={len(self.children)}>"


class Document(Element):
    __slots__ = ()

    def __init__(self) -> None:
        super().__init__("#root")

    def title(self) -> str:
        """jsoup Document.title(): first <title>, normaliseWhitespace + trim."""
        for el in self.iter_elements():
            if el.tag == "title":
                t = el.text()
                out = []
                last_white = False
                for ch in t:
                    if ch in _JSOUP_WS:
                        if last_white:
                            continue
                        out.append(" ")
                        last_white = True
                    else:
                        out.append(ch)
                        last_white = False
                return "".join(out).strip(_JAVA_TRIM_CHARS)
        return ""


# ---------------------------------------------------------------------------
# serialization (jsoup 1.9.1 non-pretty, html syntax, UTF-8 encoder)
# ---------------------------------------------------------------------------

def escape_xml_text(s: str) -> str:
    """jsoup Entities.escape, base mode, not-in-attribute."""
    return (
        s.replace("&", "&amp;")
        .replace("\xa0", "&nbsp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
    )


def escape_attr(s: str) -> str:
    """jsoup Entities.escape, base mode, in-attribute (no <> escaping)."""
    return s.replace("&", "&amp;").replace("\xa0", "&nbsp;").replace('"', "&quot;")


def _attrs_html(el: Element) -> str:
    parts = []
    for k, v in el.attrs.items():
        parts.append(" ")
        parts.append(k)
        # boolean-attribute collapse (jsoup Attribute.shouldCollapseAttribute)
        if (v == "" or v.lower() == k) and k in _BOOLEAN_ATTRS:
            continue
        parts.append('="')
        parts.append(escape_attr(v))
        parts.append('"')
    return "".join(parts)


def _serialize(root: Node, buf: list[str]) -> None:
    # iterative to survive deeply nested pages at 100 TB scale
    stack: list[tuple[Node, bool]] = [(root, False)]
    while stack:
        node, tail = stack.pop()
        if tail:
            assert isinstance(node, Element)
            buf.append(f"</{node.tag}>")
            continue
        if isinstance(node, TextNode):
            buf.append(escape_xml_text(node.text))
        elif isinstance(node, CommentNode):
            buf.append(f"<!--{node.data}-->")
        elif isinstance(node, DoctypeNode):
            buf.append(f"<!DOCTYPE{node.data}>")
        elif isinstance(node, Element):
            if node.tag == "#root":
                for c in reversed(node.children):
                    stack.append((c, False))
                continue
            buf.append(f"<{node.tag}{_attrs_html(node)}")
            childless = not node.children
            self_closing = node.is_empty_tag() or node.self_closing_unknown
            if childless and self_closing:
                # html syntax: known-empty tag → ">", unknown self-closed → " />"
                buf.append(">" if node.is_empty_tag() else " />")
                continue
            buf.append(">")
            stack.append((node, True))
            for c in reversed(node.children):
                stack.append((c, False))


# ---------------------------------------------------------------------------
# entity decoding at parse time
# ---------------------------------------------------------------------------

from ..functions.entities import HTML40_ENTITIES  # noqa: E402

# jsoup's tokeniser knows the full HTML named-entity set; we carry HTML 4.0
# + apos (present in jsoup's tables, used by XML-ish pages).  Divergence on
# exotic HTML5-only names is documented in SURVEY.md §3 and avoided by
# fixtures.
_PARSE_ENTITIES = dict(HTML40_ENTITIES)
_PARSE_ENTITIES["apos"] = 39

_ENTITY_RE = re.compile(r"&(#[xX][0-9a-fA-F]+|#[0-9]+|[a-zA-Z][a-zA-Z0-9]*);")


def _entity_repl(m: re.Match) -> str:
    body = m.group(1)
    if body[0] == "#":
        try:
            v = int(body[2:], 16) if body[1] in "xX" else int(body[1:], 10)
        except ValueError:
            return m.group(0)
        if 0 < v <= 0x10FFFF and not (0xD800 <= v <= 0xDFFF):
            return chr(v)
        return "�"
    v = _PARSE_ENTITIES.get(body)
    return chr(v) if v is not None else m.group(0)


def decode_entities(s: str) -> str:
    if "&" not in s:
        return s
    return _ENTITY_RE.sub(_entity_repl, s)


# ---------------------------------------------------------------------------
# tokenizer + XML tree builder
# ---------------------------------------------------------------------------

_WS = " \t\n\f\r"
_TAGNAME_END = _WS + "/>"
_ATTRNAME_END = _WS + "/=>"


def parse_xml(source: str) -> Document:
    """Parse with jsoup-1.9.1 XmlTreeBuilder semantics.

    Stack behavior (XmlTreeBuilder.popStackToClose): an end tag pops to the
    nearest matching open element; unmatched end tags are ignored; children
    already appended stay with their parents.  Self-closing start tags are
    never pushed.
    """
    doc = Document()
    stack: list[Element] = [doc]
    i = 0
    n = len(source)
    text_start = 0

    def flush_text(upto: int) -> None:
        if upto > text_start:
            raw = source[text_start:upto]
            stack[-1].append(TextNode(decode_entities(raw)))

    while i < n:
        lt = source.find("<", i)
        if lt == -1:
            break
        i = lt
        if i + 1 >= n:
            break  # trailing '<' at EOF → jsoup emits it as text
        d = source[i + 1]

        if d == "/":
            # --- end tag ---
            j = i + 2
            if j < n and source[j] == ">":
                flush_text(i)
                i = j + 1
                text_start = i
                continue
            if j < n and (source[j].isascii() and source[j].isalpha()):
                flush_text(i)
                k = j
                while k < n and source[k] not in _TAGNAME_END:
                    k += 1
                name = source[j:k].lower()
                # consume (and discard) anything else until '>'
                gt = source.find(">", k)
                if gt == -1:
                    i = n
                    text_start = n
                    break
                i = gt + 1
                text_start = i
                # popStackToClose
                found = -1
                for s_idx in range(len(stack) - 1, 0, -1):
                    if stack[s_idx].tag == name:
                        found = s_idx
                        break
                if found > 0:
                    del stack[found:]
                continue
            # bogus: "</" + non-letter → bogus comment until '>'
            flush_text(i)
            gt = source.find(">", i + 2)
            if gt == -1:
                i = n
                text_start = n
                break
            stack[-1].append(CommentNode(source[i + 2:gt]))
            i = gt + 1
            text_start = i
            continue

        if d == "!":
            if source.startswith("<!--", i):
                flush_text(i)
                close = source.find("-->", i + 4)
                if close == -1:
                    stack[-1].append(CommentNode(source[i + 4:]))
                    i = n
                    text_start = n
                    break
                stack[-1].append(CommentNode(source[i + 4:close]))
                i = close + 3
                text_start = i
                continue
            if source[i + 2:i + 9].upper() == "DOCTYPE":
                flush_text(i)
                gt = source.find(">", i + 9)
                if gt == -1:
                    i = n
                    text_start = n
                    break
                stack[-1].append(DoctypeNode(source[i + 9:gt]))
                i = gt + 1
                text_start = i
                continue
            if source.startswith("<![CDATA[", i):
                flush_text(i)
                close = source.find("]]>", i + 9)
                if close == -1:
                    stack[-1].append(TextNode(source[i + 9:]))
                    i = n
                    text_start = n
                    break
                stack[-1].append(TextNode(source[i + 9:close]))
                i = close + 3
                text_start = i
                continue
            # bogus comment <!xyz>
            flush_text(i)
            gt = source.find(">", i + 2)
            if gt == -1:
                i = n
                text_start = n
                break
            stack[-1].append(CommentNode(source[i + 2:gt]))
            i = gt + 1
            text_start = i
            continue

        if d == "?":
            # processing instruction → bogus comment (data keeps the '?')
            flush_text(i)
            gt = source.find(">", i + 2)
            if gt == -1:
                i = n
                text_start = n
                break
            stack[-1].append(CommentNode(source[i + 1:gt]))
            i = gt + 1
            text_start = i
            continue

        if d.isascii() and d.isalpha():
            # --- start tag ---
            flush_text(i)
            j = i + 1
            k = j
            while k < n and source[k] not in _TAGNAME_END:
                k += 1
            name = source[j:k].lower()
            attrs: dict[str, str] = {}
            self_closing = False
            p = k
            ok = True
            while True:
                while p < n and source[p] in _WS:
                    p += 1
                if p >= n:
                    ok = False
                    break
                c = source[p]
                if c == ">":
                    p += 1
                    break
                if c == "/":
                    if p + 1 < n and source[p + 1] == ">":
                        self_closing = True
                        p += 2
                        break
                    p += 1  # stray '/': reconsume as before-attr-name
                    continue
                # attribute name
                a = p
                while p < n and source[p] not in _ATTRNAME_END:
                    p += 1
                aname = source[a:p].lower()
                while p < n and source[p] in _WS:
                    p += 1
                if p < n and source[p] == "=":
                    p += 1
                    while p < n and source[p] in _WS:
                        p += 1
                    if p < n and source[p] in "\"'":
                        q = source[p]
                        vend = source.find(q, p + 1)
                        if vend == -1:
                            ok = False
                            break
                        aval = decode_entities(source[p + 1:vend])
                        p = vend + 1
                    else:
                        v = p
                        while p < n and source[p] not in _WS and source[p] != ">":
                            p += 1
                        aval = decode_entities(source[v:p])
                    if aname:
                        attrs[aname] = aval
                else:
                    if aname:
                        attrs[aname] = ""  # boolean attribute
            if not ok:
                i = n
                text_start = n
                break
            el = Element(name, attrs)
            stack[-1].append(el)
            if self_closing:
                if not _is_known_tag(name):
                    el.self_closing_unknown = True
            else:
                # XmlTreeBuilder pushes EVERY non-self-closing start tag —
                # even voids like <br>/<img>: in XML mode their following
                # siblings become children until a matching end tag or EOF.
                stack.append(el)
            i = p
            text_start = i
            continue

        # '<' followed by junk → literal text, keep scanning
        i += 1

    # trailing text
    if text_start < n:
        stack[-1].append(TextNode(decode_entities(source[text_start:])))
    return doc


# jsoup "known" tags = its static registry (block + inline + empty lists).
_INLINE_KNOWN = frozenset(
    """object base font tt i b u big small em strong dfn code samp kbd var
    cite abbr time acronym mark ruby rt rp a img br wbr map q sub sup bdo
    iframe embed span input select textarea label button optgroup option
    legend datalist keygen output progress meter area param source track
    summary command device basefont bgsound menuitem data bdi s strike
    nobr rb""".split()
)


def _is_known_tag(name: str) -> bool:
    return name in _BLOCK_TAGS or name in _EMPTY_TAGS or name in _INLINE_KNOWN


# ---------------------------------------------------------------------------
# selector engine (the 8 features of SURVEY.md §2.3)
# ---------------------------------------------------------------------------

class _Evaluator:
    def matches(self, el: Element) -> bool:  # pragma: no cover - abstract
        raise NotImplementedError


class _Tag(_Evaluator):
    def __init__(self, name: str) -> None:
        self.name = name.lower()

    def matches(self, el: Element) -> bool:
        return el.tag == self.name


class _HasAttr(_Evaluator):
    def __init__(self, key: str) -> None:
        self.key = key.lower()

    def matches(self, el: Element) -> bool:
        return el.has_attr(self.key)


class _AttrValue(_Evaluator):
    """[attr=val] — jsoup AttributeWithValue: value compare is
    case-insensitive on the *trimmed* element value."""

    def __init__(self, key: str, value: str) -> None:
        self.key = key.lower()
        self.value = value.strip().lower()

    def matches(self, el: Element) -> bool:
        # Java String.trim (chars <= U+0020), then equalsIgnoreCase —
        # per-char SIMPLE case mapping, not Python full lowercase (Turkish
        # İ expands under .lower() and would miss; r3 review)
        if not el.has_attr(self.key):
            return False
        v = el.attr(self.key).strip(_JAVA_TRIM_CHARS)
        return _java_equals_ignore_case(v, self.value)


class _AttrRegex(_Evaluator):
    """[attr~=re] — jsoup AttributeWithValueMatching: Pattern.find()."""

    def __init__(self, key: str, pattern: str) -> None:
        self.key = key.lower()
        self.re = re.compile(pattern)

    def matches(self, el: Element) -> bool:
        return el.has_attr(self.key) and self.re.search(el.attr(self.key)) is not None


class _Has(_Evaluator):
    """:has(sel) — any strict descendant matches (jsoup Has skips self)."""

    def __init__(self, inner: "_And") -> None:
        self.inner = inner

    def matches(self, el: Element) -> bool:
        for e in el.iter_elements():
            if e is not el and self.inner.matches(e):
                return True
        return False


class _MatchesText(_Evaluator):
    def __init__(self, pattern: str) -> None:
        self.re = re.compile(pattern)

    def matches(self, el: Element) -> bool:
        return self.re.search(el.text()) is not None


class _MatchesOwnText(_Evaluator):
    def __init__(self, pattern: str) -> None:
        self.re = re.compile(pattern)

    def matches(self, el: Element) -> bool:
        return self.re.search(el.own_text()) is not None


class _And(_Evaluator):
    def __init__(self, evals: list[_Evaluator]) -> None:
        self.evals = evals

    def matches(self, el: Element) -> bool:
        return all(e.matches(el) for e in self.evals)


_SEL_TOKEN_RE = re.compile(r"[a-zA-Z][a-zA-Z0-9_-]*|\*")


def _parse_compound(q: str) -> _And:
    """Parse one compound selector: [tag]([attr...] | :pseudo(...))*."""
    evals: list[_Evaluator] = []
    i = 0
    n = len(q)
    while i < n:
        c = q[i]
        if c == "[":
            close = _find_balanced(q, i, "[", "]")
            body = q[i + 1:close]
            i = close + 1
            if "~=" in body:
                key, _, pat = body.partition("~=")
                evals.append(_AttrRegex(key.strip(), pat))
            elif "=" in body:
                key, _, val = body.partition("=")
                val = val.strip()
                if len(val) >= 2 and val[0] in "\"'" and val[-1] == val[0]:
                    val = val[1:-1]
                evals.append(_AttrValue(key.strip(), val))
            else:
                evals.append(_HasAttr(body.strip()))
        elif c == ":":
            m = re.match(r":([a-zA-Z]+)\(", q[i:])
            if not m:
                raise ValueError(f"unsupported pseudo in selector: {q[i:]}")
            name = m.group(1)
            open_paren = i + len(m.group(0)) - 1
            close = _find_balanced(q, open_paren, "(", ")")
            body = q[open_paren + 1:close]
            i = close + 1
            if name == "has":
                evals.append(_Has(_parse_compound(body.strip())))
            elif name == "matches":
                evals.append(_MatchesText(body))
            elif name == "matchesOwn":
                evals.append(_MatchesOwnText(body))
            else:
                raise ValueError(f"unsupported pseudo :{name}")
        else:
            m = _SEL_TOKEN_RE.match(q, i)
            if not m:
                raise ValueError(f"cannot parse selector at: {q[i:]!r}")
            tok = m.group(0)
            i = m.end()
            if tok != "*":
                evals.append(_Tag(tok))
    return _And(evals)


def _find_balanced(s: str, start: int, open_ch: str, close_ch: str) -> int:
    depth = 0
    in_quote: str | None = None
    for i in range(start, len(s)):
        c = s[i]
        if in_quote:
            if c == in_quote:
                in_quote = None
            continue
        if c in "\"'" and open_ch == "[":
            in_quote = c
            continue
        if c == open_ch:
            depth += 1
        elif c == close_ch:
            depth -= 1
            if depth == 0:
                return i
    raise ValueError(f"unbalanced {open_ch}{close_ch} in selector: {s!r}")


def _split_groups(query: str) -> list[str]:
    """Split on top-level commas (commas inside () / [] don't split)."""
    groups: list[str] = []
    depth = 0
    cur: list[str] = []
    for c in query:
        if c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        if c == "," and depth == 0:
            groups.append("".join(cur).strip())
            cur = []
        else:
            cur.append(c)
    groups.append("".join(cur).strip())
    return [g for g in groups if g]


_SELECTOR_CACHE: dict[str, tuple] = {}


def _simplify(ev: _And) -> _Evaluator:
    return ev.evals[0] if len(ev.evals) == 1 else ev


def _compile_query(query: str) -> tuple:
    """Compile + memoize a selector (hot path: the same ~10 reference
    queries run per document; parsing them once per process, not once per
    page, is a large constant-factor win at 100 TB).  Tag-only groups
    (e.g. the F6 blacklists, "a", "br", "span") compile to a frozenset
    membership test instead of evaluator dispatch."""
    cached = _SELECTOR_CACHE.get(query)
    if cached is None:
        q = query.strip()
        if q.startswith(">"):
            inner = _parse_compound(q[1:].strip())
            if len(inner.evals) == 1 and isinstance(inner.evals[0], _Tag):
                cached = ("child_tag", inner.evals[0].name)
            else:
                cached = ("child", _simplify(inner))
        else:
            groups = [_parse_compound(g) for g in _split_groups(q)]
            if all(
                len(g.evals) == 1 and isinstance(g.evals[0], _Tag) for g in groups
            ):
                cached = ("tags", frozenset(g.evals[0].name for g in groups))
            else:
                cached = ("desc", [_simplify(g) for g in groups])
        _SELECTOR_CACHE[query] = cached
    return cached


def select(root: Element, query: str) -> list[Element]:
    """jsoup Element.select: document-order matches within root's subtree,
    root itself included (Collector.collect traverses from root)."""
    kind, compiled = _compile_query(query)
    if kind == "tags":
        return [el for el in root.iter_elements() if el.tag in compiled]
    if kind == "child_tag":
        return [
            c for c in root.children if isinstance(c, Element) and c.tag == compiled
        ]
    if kind == "child":
        # relative child combinator (ContentExtractor.java:295 node.select(">a"))
        inner = compiled
        return [
            c for c in root.children if isinstance(c, Element) and inner.matches(c)
        ]
    evaluators = compiled
    out: list[Element] = []
    for el in root.iter_elements():
        for ev in evaluators:
            if ev.matches(el):
                out.append(el)
                break
    return out


def elements_attr(elements: list[Element], key: str) -> str:
    """jsoup Elements.attr(key): first element *having* the attribute."""
    for el in elements:
        if el.has_attr(key):
            return el.attr(key)
    return ""
