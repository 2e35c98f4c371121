"""Minimal from-scratch PDF text + layout extraction (north rule: the
extraction pipeline covers "HTML boilerplate strip, PDF/layout parse, DOM
heuristics" — this is the PDF/layout member of that family).

Pure stdlib (zlib for /FlateDecode); no external PDF library exists in the
environment and none is used.  Scope is the classic PDF subset that covers
machine-generated text documents:

 - body objects ``N G obj ... endobj`` with dict / array / name / number /
   string / reference values (recursive-descent parser over PDF syntax);
 - document structure walked properly: ``trailer`` → /Root → /Pages tree
   (/Kids recursion, in order) → per-page /Contents (single ref or array);
 - streams raw or /FlateDecode (zlib);
 - content-stream text operators: BT/ET, Tm, Td, TD, TL, T*, Tj, TJ,
   ' and ", with literal-string escapes (\\n \\t \\( \\) \\\\ \\ddd,
   line continuations) and hex strings; UTF-16BE strings via BOM, else
   Latin-1 (≈ PDFDocEncoding / WinAnsi for the printable range).

Layout reassembly: each text show is recorded as a span at the current
text-line origin (e, f of the line matrix).  Spans are grouped into lines
by y (descending — PDF origin is bottom-left), spans within a line ordered
by x (stream order on exact ties); same-line spans join with a single
space, same-span consecutive shows concatenate.  A TJ kerning adjustment
≤ -180 (thousandths of em) inserts a space — the standard width-free
heuristic for encoded inter-word gaps.  Pages join with form-feed-free
double newline ("\\n\\n") in page-tree order.

Documented limits (status column is honest about them):
 - no font-width modeling (Tw/Tc/Tz advances ignored) — span ORDER is
   layout-true, intra-line gap sizes are not;
 - xref is never read (objects are scanned), so incremental updates that
   shadow an object number resolve to the LAST body occurrence — same
   result as a full-rewrite save;
 - PDF 1.5 cross-reference/object streams (/Type /ObjStm) are not
   unpacked: pages inside object streams are invisible → status
   ``no_pages`` with a best-effort fallback over top-level page objects;
 - encrypted documents → status ``encrypted``, empty text.
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass, field

# ---------------------------------------------------------------------------
# object-level parsing
# ---------------------------------------------------------------------------

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"
_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_TRAILER_RE = re.compile(rb"trailer\b")
_STREAM_RE = re.compile(rb"stream\r?\n?")
_NUMBER_RE = re.compile(rb"[+-]?(?:\d+\.\d*|\.\d+|\d+)")
_REF_TAIL_RE = re.compile(rb"\s+(\d+)\s+R\b")
_OPERATOR_RE = re.compile(rb"[A-Za-z'\"*]{1,3}")


@dataclass
class Ref:
    num: int
    gen: int


@dataclass
class _Lexer:
    data: bytes
    pos: int

    def skip_ws(self) -> None:
        d, n = self.data, len(self.data)
        while self.pos < n:
            c = self.data[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # '%' comment to EOL
                nl = d.find(b"\n", self.pos)
                self.pos = n if nl < 0 else nl + 1
            else:
                return

    def parse_value(self):
        self.skip_ws()
        d, i = self.data, self.pos
        if i >= len(d):
            raise ValueError("eof")
        c = d[i]
        if d.startswith(b"<<", i):
            return self._parse_dict()
        if c == 0x3C:  # '<' hex string
            return self._parse_hex_string()
        if c == 0x28:  # '('
            return self._parse_literal_string()
        if c == 0x5B:  # '['
            return self._parse_array()
        if c == 0x2F:  # '/'
            return self._parse_name()
        if d.startswith(b"true", i):
            self.pos = i + 4
            return True
        if d.startswith(b"false", i):
            self.pos = i + 5
            return False
        if d.startswith(b"null", i):
            self.pos = i + 4
            return None
        return self._parse_number_or_ref()

    def _parse_name(self) -> str:
        d = self.data
        i = self.pos + 1
        out = bytearray()
        while i < len(d) and d[i] not in _WS and d[i] not in _DELIM:
            if d[i] == 0x23 and i + 2 < len(d):  # '#xx' escape
                out.append(int(d[i + 1 : i + 3], 16))
                i += 3
            else:
                out.append(d[i])
                i += 1
        self.pos = i
        return "/" + out.decode("latin-1")

    def _parse_dict(self) -> dict:
        self.pos += 2
        out: dict = {}
        while True:
            self.skip_ws()
            if self.data.startswith(b">>", self.pos):
                self.pos += 2
                return out
            key = self._parse_name()
            out[key] = self.parse_value()

    def _parse_array(self) -> list:
        self.pos += 1
        out: list = []
        while True:
            self.skip_ws()
            if self.pos < len(self.data) and self.data[self.pos] == 0x5D:  # ']'
                self.pos += 1
                return out
            out.append(self.parse_value())

    def _parse_hex_string(self) -> bytes:
        end = self.data.find(b">", self.pos + 1)
        if end < 0:
            raise ValueError("unterminated hex string")
        hx = bytes(
            c for c in self.data[self.pos + 1 : end] if c not in _WS
        ).decode("latin-1")
        self.pos = end + 1
        if len(hx) % 2:
            hx += "0"  # spec: odd final digit implies trailing 0
        return bytes.fromhex(hx)

    def _parse_literal_string(self) -> bytes:
        d = self.data
        i = self.pos + 1
        depth = 1
        out = bytearray()
        esc = {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}  # n r t b f
        while i < len(d):
            c = d[i]
            if c == 0x5C:  # backslash
                i += 1
                if i >= len(d):
                    break
                e = d[i]
                if e in esc:
                    out.append(esc[e])
                    i += 1
                elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                    j = i
                    while j < len(d) and j < i + 3 and 0x30 <= d[j] <= 0x37:
                        j += 1
                    out.append(int(d[i:j], 8) & 0xFF)
                    i = j
                elif e in (0x0A, 0x0D):  # line continuation
                    i += 1
                    if e == 0x0D and i < len(d) and d[i] == 0x0A:
                        i += 1
                else:  # \( \) \\ and unknown → literal next char
                    out.append(e)
                    i += 1
            elif c == 0x28:  # '(' balanced nesting
                depth += 1
                out.append(c)
                i += 1
            elif c == 0x29:  # ')'
                depth -= 1
                if depth == 0:
                    self.pos = i + 1
                    return bytes(out)
                out.append(c)
                i += 1
            else:
                out.append(c)
                i += 1
        raise ValueError("unterminated literal string")

    def _parse_number_or_ref(self):
        # pattern.match(data, pos) — NEVER d[pos:] slices, which copy the
        # remaining buffer per token and turn parsing quadratic (measured:
        # 2× stream size → 6.5× time before this was caught in review)
        d = self.data
        m = _NUMBER_RE.match(d, self.pos)
        if m is None:
            raise ValueError(f"bad token at {self.pos}: {d[self.pos:self.pos+8]!r}")
        tok = m.group(0)
        end = m.end()
        # 'N G R' indirect reference lookahead (only for integer tokens)
        if b"." not in tok:
            m2 = _REF_TAIL_RE.match(d, end)
            if m2 is not None:
                self.pos = m2.end()
                return Ref(int(tok), int(m2.group(1)))
        self.pos = end
        return float(tok) if b"." in tok else int(tok)


def _parse_objects(
    data: bytes,
) -> tuple[dict[int, tuple[object, bytes | None]], list[tuple[int, int]]]:
    """Scan every ``N G obj`` body object → ({num: (value, raw_stream)},
    stream extents).  Later occurrences of an object number win
    (incremental-update order).  Matches that start INSIDE a previously
    captured stream payload are skipped — raw stream bytes (or page text)
    may coincidentally contain ``N G obj`` and must not shadow real
    objects."""
    objects: dict[int, tuple[object, bytes | None]] = {}
    extents: list[tuple[int, int]] = []
    skip_until = 0
    for m in _OBJ_RE.finditer(data):
        if m.start() < skip_until:
            continue
        lex = _Lexer(data, m.end())
        try:
            value = lex.parse_value()
        except ValueError:
            continue
        stream: bytes | None = None
        lex.skip_ws()
        sm = _STREAM_RE.match(data, lex.pos)
        if sm is not None and isinstance(value, dict):
            start = sm.end()
            length = value.get("/Length")
            if isinstance(length, int):
                end = start + length
                if not data.startswith(b"endstream", _skip_eol(data, end)):
                    end = data.find(b"endstream", start)
            else:  # indirect /Length or absent → delimiter scan
                end = data.find(b"endstream", start)
            if end >= 0:
                stream = data[start : _rstrip_eol(data, start, end)]
                extents.append((start, end))
                skip_until = end
        objects[int(m.group(1))] = (value, stream)
    return objects, extents


def _skip_eol(data: bytes, pos: int) -> int:
    while pos < len(data) and data[pos] in b"\r\n":
        pos += 1
    return pos


def _rstrip_eol(data: bytes, start: int, end: int) -> int:
    while end > start and data[end - 1] in b"\r\n":
        end -= 1
    return end


def _decode_stream(meta: dict, raw: bytes) -> bytes | None:
    """Apply /Filter — raw or FlateDecode only; None = unsupported."""
    filt = meta.get("/Filter")
    if filt is None:
        return raw
    filters = filt if isinstance(filt, list) else [filt]
    out = raw
    for f in filters:
        if f == "/FlateDecode":
            try:
                out = zlib.decompress(out)
            except zlib.error:
                return None
        else:
            return None
    return out


# ---------------------------------------------------------------------------
# document structure
# ---------------------------------------------------------------------------


class _Doc:
    def __init__(self, data: bytes):
        self.objects, self._stream_extents = _parse_objects(data)
        self.trailer = self._find_trailer(data)

    def _in_stream(self, pos: int) -> bool:
        return any(s <= pos < e for s, e in self._stream_extents)

    def _find_trailer(self, data: bytes) -> dict:
        # last trailer wins (incremental updates chain /Prev; the final one
        # carries the live /Root); 'trailer' inside a stream payload is data
        trailer: dict = {}
        for m in _TRAILER_RE.finditer(data):
            if self._in_stream(m.start()):
                continue
            lex = _Lexer(data, m.end())
            try:
                value = lex.parse_value()
            except ValueError:
                continue
            if isinstance(value, dict):
                trailer = value
        return trailer

    def resolve(self, v, depth: int = 0):
        while isinstance(v, Ref) and depth < 32:
            entry = self.objects.get(v.num)
            v = entry[0] if entry is not None else None
            depth += 1
        return v

    def page_dicts(self) -> list[dict]:
        """Leaf /Type /Page dicts in /Pages tree order; [] if the
        structure walk fails (caller falls back to a flat scan)."""
        root = self.resolve(self.trailer.get("/Root"))
        if not isinstance(root, dict):
            return []
        pages: list[dict] = []

        def walk(node, depth: int) -> None:
            node = self.resolve(node)
            if not isinstance(node, dict) or depth > 64:
                return
            if node.get("/Type") == "/Page":
                pages.append(node)
                return
            kids = self.resolve(node.get("/Kids"))
            if isinstance(kids, list):
                for kid in kids:
                    walk(kid, depth + 1)

        walk(root.get("/Pages"), 0)
        return pages

    def content_bytes(self, page: dict) -> bytes:
        contents = page.get("/Contents")
        if isinstance(contents, Ref):
            # an indirect /Contents may point at an ARRAY object (real
            # writers emit this); resolve first, keep the Ref only when it
            # names the stream itself
            entry = self.objects.get(contents.num)
            if entry is not None and entry[1] is None and isinstance(entry[0], list):
                contents = entry[0]
        refs = contents if isinstance(contents, list) else [contents]
        parts: list[bytes] = []
        for r in refs:
            if not isinstance(r, Ref):
                continue
            entry = self.objects.get(r.num)
            if entry is None or entry[1] is None:
                continue
            meta, raw = entry
            decoded = _decode_stream(meta if isinstance(meta, dict) else {}, raw)
            if decoded is not None:
                parts.append(decoded)
        # spec: multiple /Contents streams form ONE stream when joined with
        # whitespace
        return b"\n".join(parts)


# ---------------------------------------------------------------------------
# content-stream text interpretation + layout reassembly
# ---------------------------------------------------------------------------

# kerning adjustments ≤ this (thousandths of em, negative = rightward gap)
# are treated as encoded inter-word spaces — the standard width-free
# heuristic (a typical space glyph is 200-300 units wide)
TJ_SPACE_THRESHOLD = -180


@dataclass
class _Span:
    x: float
    y: float
    order: int
    parts: list[str] = field(default_factory=list)

    def text(self) -> str:
        return "".join(self.parts)


def _decode_text(b: bytes) -> str:
    if b.startswith(b"\xfe\xff"):
        return b[2:].decode("utf-16-be", errors="replace")
    return b.decode("latin-1")


def extract_text_spans(content: bytes) -> list[tuple[float, float, str]]:
    """Interpret a content stream → [(x, y, text)] spans in stream order.
    Only the text-positioning subset is modeled; every show op between a
    position change appends to the current span."""
    lex = _Lexer(content, 0)
    spans: list[_Span] = []
    stack: list[object] = []
    # line matrix origin (e, f) and leading; BT resets
    x = y = 0.0
    leading = 0.0
    cur: _Span | None = None

    def new_span() -> None:
        nonlocal cur
        cur = None

    def show(raw) -> None:
        nonlocal cur
        if not isinstance(raw, bytes):
            return
        if cur is None:
            cur = _Span(x, y, len(spans))
            spans.append(cur)
        cur.parts.append(_decode_text(raw))

    n = len(content)
    while True:
        lex.skip_ws()
        if lex.pos >= n:
            break
        c = content[lex.pos]
        # operands
        if c in b"<([/" or c == 0x2B or c == 0x2D or c == 0x2E or 0x30 <= c <= 0x39:
            try:
                stack.append(lex.parse_value())
            except ValueError:
                lex.pos += 1
            continue
        # operator word (position-anchored match — no tail copies)
        m = _OPERATOR_RE.match(content, lex.pos)
        if m is None:
            lex.pos += 1
            stack.clear()
            continue
        op = m.group(0)
        lex.pos = m.end()
        if op == b"BT":
            x = y = 0.0
            leading = 0.0
            new_span()
        elif op == b"ET":
            new_span()
        elif op == b"Tm" and len(stack) >= 6:
            x, y = float(stack[-2]), float(stack[-1])  # e, f
            new_span()
        elif op == b"Td" and len(stack) >= 2:
            x += float(stack[-2])
            y += float(stack[-1])
            new_span()
        elif op == b"TD" and len(stack) >= 2:
            leading = -float(stack[-1])
            x += float(stack[-2])
            y += float(stack[-1])
            new_span()
        elif op == b"TL" and len(stack) >= 1:
            leading = float(stack[-1])
        elif op == b"T*":
            y -= leading
            new_span()
        elif op == b"Tj" and stack:
            show(stack[-1])
        elif op == b"'" and stack:
            y -= leading
            new_span()
            show(stack[-1])
        elif op == b'"' and len(stack) >= 3:
            y -= leading
            new_span()
            show(stack[-1])
        elif op == b"TJ" and stack and isinstance(stack[-1], list):
            for el in stack[-1]:
                if isinstance(el, bytes):
                    show(el)
                elif (
                    isinstance(el, (int, float))
                    and el <= TJ_SPACE_THRESHOLD
                    and cur is not None
                ):
                    # only a gap BETWEEN glyphs is a space; a leading
                    # adjustment (optical alignment) must not open a
                    # whitespace-only span
                    show(b" ")
        stack.clear()
    return [(s.x, s.y, s.text()) for s in spans if s.text()]


def assemble_layout(spans: list[tuple[float, float, str]], y_tol: float = 2.0) -> str:
    """Spans → reading-order text: cluster y into lines (descending — PDF
    origin is bottom-left), sort spans within a line by x (stream order on
    ties), join same-line spans with one space, lines with newline."""
    if not spans:
        return ""
    indexed = sorted(
        ((y, x, i, t) for i, (x, y, t) in enumerate(spans)),
        key=lambda s: (-s[0], s[1], s[2]),
    )
    lines: list[list[tuple[float, int, str]]] = []
    line_y: float | None = None
    for yy, xx, i, t in indexed:
        if line_y is None or line_y - yy > y_tol:
            lines.append([])
            line_y = yy
        lines[-1].append((xx, i, t))
    out_lines = []
    for line in lines:
        line.sort(key=lambda s: (s[0], s[1]))
        out_lines.append(" ".join(t for _, _, t in line))
    return "\n".join(out_lines)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


@dataclass
class PdfResult:
    text: str
    n_pages: int
    n_objects: int
    status: str


def extract_pdf(data: bytes) -> PdfResult:
    """Parse one PDF byte string → layout-ordered text per page, pages
    joined with a blank line.  Never raises: malformed input degrades with
    an explanatory status."""
    if not data.startswith(b"%PDF-"):
        return PdfResult("", 0, 0, "not_pdf")
    try:
        doc = _Doc(data)
    except Exception:  # noqa: BLE001 — any structural failure is terminal
        return PdfResult("", 0, 0, "parse_error")
    if isinstance(doc.resolve(doc.trailer.get("/Encrypt")), dict):
        return PdfResult("", 0, len(doc.objects), "encrypted")
    pages = doc.page_dicts()
    status = "ok"
    if not pages:
        # structure walk failed (e.g. xref/object streams): best-effort
        # flat scan over top-level /Type /Page objects in body order
        pages = [
            v
            for v, _s in doc.objects.values()
            if isinstance(v, dict) and v.get("/Type") == "/Page"
        ]
        status = "no_root_fallback" if pages else "no_pages"
    page_texts = []
    for page in pages:
        try:
            content = doc.content_bytes(page)
            page_texts.append(assemble_layout(extract_text_spans(content)))
        except Exception:  # noqa: BLE001
            page_texts.append("")
            status = "page_error"
    return PdfResult(
        "\n\n".join(page_texts), len(pages), len(doc.objects), status
    )


# ---------------------------------------------------------------------------
# deterministic synthetic builder (tests / fixtures; the Spark-SQL twin in
# __spark_entry__.py must stay byte-compatible — see test_pdfparse.py)
# ---------------------------------------------------------------------------


# fixed object bodies of the synthetic single-page document — shared with
# the Spark-SQL builder twin in __spark_entry__.py (byte-compatibility is
# differential-tested in tests/test_pdfparse.py)
FIXED_OBJS = (
    b"<< /Type /Catalog /Pages 2 0 R >>",
    b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
    b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
    b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
    b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
)


def build_pdf(
    lines: list[str],
    compress: bool = False,
    reverse_stream: bool = False,
    start_y: int = 720,
    line_step: int = 16,
) -> bytes:
    """A valid single-page PDF placing ``lines[i]`` at y = start_y - i*step.
    ``reverse_stream=True`` emits the shows bottom-line-first so only a
    layout-aware extractor recovers the right order.  Offsets in the xref
    are real byte offsets (this builder writes honest PDFs)."""
    shows = []
    for i, line in enumerate(lines):
        esc = (
            line.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        )
        shows.append((start_y - i * line_step, esc))
    if reverse_stream:
        shows = shows[::-1]
    ops = ["BT", "/F1 12 Tf"]
    for yy, esc in shows:
        ops.append(f"1 0 0 1 72 {yy} Tm")
        ops.append(f"({esc}) Tj")
    ops.append("ET")
    stream = "\n".join(ops).encode("latin-1")
    if compress:
        body_stream = zlib.compress(stream)
        filt = " /Filter /FlateDecode"
    else:
        body_stream = stream
        filt = ""
    objs = [
        FIXED_OBJS[0],
        FIXED_OBJS[1],
        FIXED_OBJS[2],
        f"<< /Length {len(body_stream)}{filt} >>".encode("latin-1"),
        FIXED_OBJS[3],
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for num, obj in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode("latin-1")
        out += obj
        if num == 4:
            out += b"\nstream\n" + body_stream + b"\nendstream"
        out += b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode("latin-1")
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode("latin-1")
    out += (
        b"trailer\n<< /Size "
        + str(len(objs) + 1).encode("latin-1")
        + b" /Root 1 0 R >>\nstartxref\n"
        + str(xref_pos).encode("latin-1")
        + b"\n%%EOF\n"
    )
    return bytes(out)
