"""Fused DOM→lines fast path (SURVEY.md §3 fusion note).

The reference serializes the filtered DOM back to HTML
(ContentExtractor.java:359) only for TextExtract to immediately re-lex it
with regexes (T1–T8).  This module produces the same post-preprocess string
directly from the DOM in one walk — skipping serialization AND the regex
cascade — with a *provable-equivalence* design:

 - the serialize path's per-node escaping (&<> nbsp) composed with T8's
   HTML4 unescape is the identity on text nodes, and commons-lang's
   single-pass decode cannot span node boundaries (escaped output never
   ends in a bare '&'), so TEXT tokens emit raw;
 - T2 drops comments/doctypes and open tags with name prefix meta|link
   BEFORE the <br>-chain collapse, so those tokens are transparent to
   chains; close tags are not (they survive to T7);
 - <br>-chains: `(<br[^<]*?>[ \\b\\t\\n\\f\\r　]*){2}` to fixpoint then
   `<br…>`→\\n collapses any run of ≥2 br-prefixed tags separated by
   whitespace-only text into ONE "\\n" with all interleaved+trailing chain
   whitespace consumed; a single br keeps its following text.  Post-T1 the
   only whitespace chars text can still contain from that class are
   ' ' and U+3000;
 - T5 opens are name-PREFIX matches (li,dd,dt,div,ol,ul,dl,table,section —
   `<li.*?>` matches `<lines…>` too), T5/T6 closes are EXACT names;
 - any attribute value containing '<' or '>' changes regex behavior in
   reference-specific ways (match leaks) → BAIL OUT to the serialize path
   for that document (rare; correctness preserved by construction).

Byte-equality with the serialize path is enforced by hypothesis
differential tests and the 200-page golden suite.
"""

from __future__ import annotations

from ..operators.dom import CommentNode, DoctypeNode, Element, TextNode
from .textextract import BLOCKS_WIDTH, ExtractResult, get_text, _CTRL_RE, _EMPTY_CHECK_RE

# T5 open-tag prefixes (sub_rule_05) and exact close names (T5+T6)
_T5_OPEN_PREFIXES = ("li", "dd", "dt", "div", "ol", "ul", "dl", "table", "section")
_T5_CLOSE_EXACT = frozenset(["p", "tr"])
_T6_CLOSE_EXACT = frozenset(["ol", "ul", "dl", "div", "table", "section"])
# T2 open-tag prefixes (main_rule <meta.*?> / <link.*?>)
_T2_OPEN_PREFIXES = ("meta", "link")

_CHAIN_WS = frozenset(" 　")

_OPEN, _CLOSE, _TEXT = 0, 1, 2


def _walk_tokens(body: Element):
    """Yield (kind, payload) in serialized order; payload is the tag name
    for OPEN/CLOSE, the T1-stripped raw text for TEXT.  Returns None via
    StopIteration value… instead we raise _Bail for weird attrs."""
    stack: list[tuple[object, bool]] = [(body, False)]
    while stack:
        node, is_close = stack.pop()
        if is_close:
            yield (_CLOSE, node.tag)  # type: ignore[union-attr]
            continue
        if isinstance(node, TextNode):
            yield (_TEXT, _CTRL_RE.sub("", node.text))
        elif isinstance(node, (CommentNode, DoctypeNode)):
            continue  # dropped by T2 before any later rule sees them
        elif isinstance(node, Element):
            for v in node.attrs.values():
                if "<" in v or ">" in v:
                    raise _Bail()
            yield (_OPEN, node.tag)
            childless = not node.children
            self_closing = node.is_empty_tag() or node.self_closing_unknown
            if childless and self_closing:
                continue  # serialized with no close tag
            stack.append((node, True))
            for c in reversed(node.children):
                stack.append((c, False))


class _Bail(Exception):
    pass


def fused_preprocess(body: Element) -> str | None:
    """T1 + preProcess output built straight from the DOM, or None when the
    document needs the serialize path (attr values containing < or >)."""
    out: list[str] = []
    try:
        tokens = [
            t
            for t in _walk_tokens(body)
            # T2: drop open tags with meta*/link* name prefixes
            if not (t[0] == _OPEN and t[1].startswith(_T2_OPEN_PREFIXES))
        ]
    except _Bail:
        return None

    i = 0
    n = len(tokens)
    while i < n:
        kind, payload = tokens[i]
        if kind == _TEXT:
            out.append(payload)
            i += 1
            continue
        if kind == _OPEN:
            if payload.startswith("br"):
                # scan the chain: br-prefixed opens separated by ws-only text
                count = 1
                j = i + 1
                last_br_end = j
                while j < n:
                    k2, p2 = tokens[j]
                    if k2 == _TEXT and all(c in _CHAIN_WS for c in p2):
                        j += 1
                        continue
                    if k2 == _OPEN and p2.startswith("br"):
                        count += 1
                        j += 1
                        last_br_end = j
                        continue
                    break
                out.append("\n")
                if count >= 2:
                    # fixpoint collapse consumed interleaved AND trailing ws:
                    # skip ws-only text tokens after the LAST br, and strip
                    # the leading ws-run of the first non-ws text token —
                    # the regex's [ws]* ends mid-token
                    i = j
                    if i < n and tokens[i][0] == _TEXT:
                        stripped = tokens[i][1].lstrip(" 　")
                        out.append(stripped)
                        i += 1
                else:
                    # single br: its following ws-text survives
                    i = last_br_end
                continue
            if payload.startswith(_T5_OPEN_PREFIXES):
                out.append("\n")
            # else: T7 strips the tag — nothing emitted
            i += 1
            continue
        # _CLOSE
        if payload in _T5_CLOSE_EXACT:
            out.append("\n")
        elif payload in _T6_CLOSE_EXACT:
            out.append("\n" * (BLOCKS_WIDTH - 1))
        # else: T7 — nothing
        i += 1

    out.append("\n" * (BLOCKS_WIDTH - 1))
    return "".join(out)


def fused_parse(body: Element) -> ExtractResult | None:
    """parse() semantics over the fused preprocess; None → use the
    serialize path."""
    html = fused_preprocess(body)
    if html is None:
        return None
    if _EMPTY_CHECK_RE.sub("", html) == "":
        return ExtractResult()
    return get_text(html)
