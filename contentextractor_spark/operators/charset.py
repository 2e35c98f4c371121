"""Charset detection + normalization — D1/D2/D3 (SURVEY.md §2.2).

Reference behavior being reproduced:
 - D1 (ContentExtractor.java:57,376-391): juniversalchardet detection over
   the raw bytes; returns None for pure ASCII (caller falls back to UTF-8).
 - D2 (ContentExtractor.java:227-249): the meta-declared charset overrides;
   NOTE the reference compares against ``doc.charset().name()`` which is the
   *output* charset — constant "UTF-8" — so ANY declared charset that isn't
   the exact string "UTF-8" triggers a re-decode of the original bytes.
 - D3 (ContentExtractor.java:403-413): ``changeCharset(s, "UTF-8")`` is a
   UTF-8 encode/decode round-trip — an identity on decoded strings.

The detector is a from-scratch heuristic covering the fixture encodings
(UTF-8 / Shift_JIS / EUC-JP, FIXTURES.md §1) the way juniversalchardet
behaves on them: strict-validity state machines + a CJK plausibility score.
Vectorization note: the hot path (valid-UTF-8) is a single C-level
``bytes.decode`` attempt per row inside the Arrow batch.
"""

from __future__ import annotations

import codecs

from ..functions.javacompat import (
    JAVA_TRIM_CHARS as _JAVA_TRIM,
    java_split_drop_trailing as _java_split,
)


def detect_charset(data: bytes) -> str | None:
    """D1: juniversalchardet-style detection.  Returns a Java charset name
    or None when nothing is detected (pure ASCII / empty).

    Breadth beyond the JP fixtures (juniversalchardet also reports these,
    ContentExtractor.java:376-391 streams all bytes through it):
     - UTF-16 via BOM ("UTF-16" rather than -LE/-BE so the decoder consumes
       the BOM, matching Java's BOM-aware UnicodeDecoder);
     - ISO-2022-JP via its escape sequences — the encoding is pure 7-bit,
       so without this sniff it would pass the ASCII check and mojibake.
    """
    if not data:
        return None
    if data.startswith(b"\xff\xfe") or data.startswith(b"\xfe\xff"):
        return "UTF-16"
    if b"\x1b$B" in data or b"\x1b$@" in data or b"\x1b(J" in data:
        return "ISO-2022-JP"
    try:
        decoded = data.decode("utf-8", errors="strict")
    except UnicodeDecodeError:
        decoded = None
    if decoded is not None:
        # pure ASCII → juniversalchardet reports nothing
        if decoded.isascii():
            return None
        return "UTF-8"

    sjis_ok, sjis_score = _try_decode_score(data, "shift_jis")
    euc_ok, euc_score = _try_decode_score(data, "euc_jp")
    if sjis_ok and not euc_ok:
        return "SHIFT_JIS"
    if euc_ok and not sjis_ok:
        return "EUC-JP"
    if sjis_ok and euc_ok:
        return "SHIFT_JIS" if sjis_score >= euc_score else "EUC-JP"
    # not valid in any JP encoding → byte-transparent Latin fallback
    return "WINDOWS-1252"


def _try_decode_score(data: bytes, codec: str) -> tuple[bool, int]:
    try:
        s = data.decode(codec, errors="strict")
    except (UnicodeDecodeError, LookupError):
        return False, 0
    # plausibility: count Japanese-script + full-width chars
    score = sum(
        1
        for c in s
        if "぀" <= c <= "ヿ"
        or "一" <= c <= "鿿"
        or "！" <= c <= "｠"
        or c == "　"
    )
    return True, score


def java_decode(data: bytes, java_charset_name: str) -> str:
    """``new String(bytes, cs)``: malformed input → U+FFFD replacement;
    unknown charset name raises (→ page skipped, like the reference's
    per-URL catch)."""
    try:
        codec = codecs.lookup(java_charset_name)
    except LookupError:
        raise ValueError(f"unsupported charset: {java_charset_name}")
    if codec.name == "utf-16" and not data.startswith(
        (b"\xff\xfe", b"\xfe\xff")
    ):
        # endianness default divergence (r3 review): for BOM-less input
        # Java's UTF-16 charset decodes BIG-endian, Python's utf-16 codec
        # LITTLE-endian — a meta-declared charset=UTF-16 page without a
        # BOM would byte-swap into mojibake here
        return data.decode("utf-16-be", errors="replace")
    return data.decode(codec.name, errors="replace")


def change_charset(s: str | None, new_charset: str | None = "UTF-8") -> str | None:
    """D3: ``new String(s.getBytes(cs), cs)`` — identity for UTF-8 on
    already-decoded strings (unmappable chars can't occur)."""
    if s is None:
        return None
    if new_charset is None:
        return s
    return s.encode("utf-8", errors="replace").decode("utf-8")


def meta_declared_charset(doc, metas: list | None = None) -> str:
    """D2 charset sniff from the parsed DOM (ContentExtractor.java:227-243).

    Returns the charset string the reference would adopt, or "UTF-8" (the
    constant ``doc.charset().name()``) when nothing is declared.  Faithful
    quirks: only ``outter[1]`` (the part after the FIRST ';') is examined,
    and only ``inner[1]`` (after the first '=') is taken.

    ``metas``: pre-collected doc.select("meta") result, so callers that
    also read description/keywords traverse the document once.
    """
    from .dom import elements_attr

    if metas is None:
        metas = doc.select("meta")
    # meta[http-equiv="Content-Type"]: attr-value compare is Java-trimmed +
    # case-insensitive (jsoup AttributeWithValue)
    http_equiv = [
        m
        for m in metas
        if m.attrs.get("http-equiv", "").strip(_JAVA_TRIM).lower() == "content-type"
    ]
    detected_cs = "UTF-8"
    page_cs_str = elements_attr(http_equiv, "content")
    if page_cs_str != "":
        outter = _java_split(page_cs_str, ";")
        if len(outter) > 1:
            inner = _java_split(outter[1], "=")
            if len(inner) > 1:
                detected_cs = inner[1].strip(_JAVA_TRIM)
    else:
        page_cs_str_01 = elements_attr(metas, "charset")
        if page_cs_str_01 != "":
            detected_cs = page_cs_str_01.strip(_JAVA_TRIM)
    return detected_cs


