"""Text-density main-content extraction core (reference: TextExtract.java).

Reimplements, line-for-line semantics-faithful, the reference's
preProcess → getText pipeline (SURVEY.md §2.5 operators T1–T15):

  T1  control-char strip                TextExtract.java:56
  T2  head-matter strip (main_rule)     TextExtract.java:65-73,90
  T3  <br>-run collapse (sub_rule_01)   TextExtract.java:75,94-96
  T4  <br>→newline (sub_rule_02)        TextExtract.java:76,101
  T5  block-tag→newline (sub_rule_05)   TextExtract.java:79,103
  T6  block-close→3 newlines (s_r_06)   TextExtract.java:80-81,104-106
  T7  tag strip (sub_rule_04)           TextExtract.java:78,108
  T8  HTML4 entity unescape             TextExtract.java:110
  T9  pad + split to lines              TextExtract.java:121-123,279
  T10 per-line token filter             TextExtract.java:300-301
  T11 sliding-window density            TextExtract.java:296-307
  T12 block segmentation                TextExtract.java:334-409
  T13 adaptive threshold (2nd deriv)    TextExtract.java:126-186,410
  T14 block selection + emit            TextExtract.java:412-438
  T15 final java-trim (forTest path)    ContentExtractor.java:188

Known Java↔Python traps handled (SURVEY.md §7): ASCII-only Java ``\\w`` and
``\\s``; literal U+00A0 in the strip classes (verified byte-level in the
reference source at TextExtract.java:300); U+3000 in sub_rule_01's class
(TextExtract.java:75); ``Math.round`` half-up; ``String.trim`` vs
``str.strip``; ``split(..., -1)`` trailing empties; HTML 4.0 (not HTML5)
entity set; ``String.matches`` full-match semantics.

Everything here is per-document pure Python/numpy — it runs inside Arrow
batches on executors (``mapInPandas``); no Spark imports.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

import numpy as np

from .entities import unescape_html4
from .javacompat import java_trim

# --- constants (TextExtract.java:16-17,34-37) ---
BLOCKS_WIDTH = 4
MIN_TOKENS = 5
MAIN_RATIO = 0.8
MAX_LINES = 100

# T1: Java "[\b\t\r\n\f]" — \b in a Java *string literal* is backspace U+0008.
_CTRL_RE = re.compile("[\x08\t\r\n\f]")
# parse() empty check (TextExtract.java:58): "[\b\t\r\n\f\\s]",
# Java \s = [ \t\n\x0B\f\r].
_EMPTY_CHECK_RE = re.compile("[\x08 \t\n\x0b\f\r]")

# T2 (TextExtract.java:65-73)
_MAIN_RULE = re.compile(r"(<!DOCTYPE.*?>|<!--.*?-->|<meta.*?>|<link.*?>)", re.I | re.S)
# T3 (TextExtract.java:75) — class holds space, backspace, tab, \n, \f, \r, U+3000.
_SUB_RULE_01 = re.compile("(<br[^<]*?>[ \x08\t\n\f\r\u3000]*){2}", re.I | re.S)
# T4 (TextExtract.java:76)
_SUB_RULE_02 = re.compile(r"(<br[^<]*?>|\r\n)", re.I | re.S)
# T7 (TextExtract.java:78)
_SUB_RULE_04 = re.compile(r"<.*?>", re.I | re.S)
# T5 (TextExtract.java:79)
_SUB_RULE_05 = re.compile(
    r"(</p>|</tr>|<li.*?>|<dd.*?>|<dt.*?>|<div.*?>|<ol.*?>|<ul.*?>|<dl.*?>"
    r"|<table.*?>|<section.*?>)",
    re.I | re.S,
)
# T6 (TextExtract.java:80-81)
_SUB_RULE_06 = re.compile(r"(</ol>|</ul>|</dl>|</div>|</table>|</section>)", re.I | re.S)

# T10 (TextExtract.java:300-301): Java \s + literal U+00A0 (byte-verified);
# keep-set = Java \w (ASCII) + full-width digits/upper/lower + CJK + kana.
_TOKEN_STRIP_RE = re.compile("[ \t\n\x0b\f\r\u00a0]")
_TOKEN_KEEP_NEG_RE = re.compile(
    "[^a-zA-Z0-9_"
    "０-９Ａ-Ｚａ-ｚ"
    "一-鿿぀-ゟ゠-ヿ]"
)

# T14 skip regex (TextExtract.java:430) — Java String.matches(".*(...)+.*") is
# a full match over the *filtered token*; tokens contain no line terminators,
# so `contains any of` is exactly equivalent.
_SKIP_LINE_RE = re.compile("(記事一覧|利用規約|Copyright)")


def line_tokens(line: str) -> str:
    """T10: strip Java-\\s + U+00A0, then keep only the density alphabet."""
    t = _TOKEN_STRIP_RE.sub("", line)
    return _TOKEN_KEEP_NEG_RE.sub("", t)


def pre_process(source: str) -> str:
    """T2–T9 regex cascade (TextExtract.java:86-125, debug sinks omitted)."""
    source = _MAIN_RULE.sub("", source)
    # fixpoint loop (TextExtract.java:94-96); bounded for pathological input —
    # each pass strictly shrinks the string, but cap for 100 TB safety.
    for _ in range(1000):
        if not _SUB_RULE_01.search(source):
            break
        source = _SUB_RULE_01.sub("<br>", source)
    source = _SUB_RULE_02.sub("\n", source)
    source = _SUB_RULE_05.sub("\n", source)
    pad = "\n" * (BLOCKS_WIDTH - 1)
    source = _SUB_RULE_06.sub(pad, source)
    source = _SUB_RULE_04.sub("", source)
    source = unescape_html4(source)
    return source + pad


def cal_threshold(maxima: list[int]) -> int:
    """T13 (TextExtract.java:126-186): sort asc; n==1→d[0], n==2→d[1];
    n>=3: f2[i]=d[i-1]-2d[i]+d[i+1], strict-> argmax (init 0 ⇒ idx 0 when all
    f2<=0); idx==n-2 or n==3 ⇒ idx=n-1; floor at MIN_TOKENS."""
    if not maxima:
        return -1
    d = sorted(maxima)
    n = len(d)
    if n == 1:
        return max(MIN_TOKENS, d[0])
    if n == 2:
        return max(MIN_TOKENS, d[1])
    max_f2 = 0
    max_f2_idx = 0
    for i in range(1, n - 1):
        f2 = d[i - 1] - 2 * d[i] + d[i + 1]
        if f2 > max_f2:
            max_f2 = f2
            max_f2_idx = i
    if max_f2_idx == n - 2 or n == 3:
        max_f2_idx = n - 1
    return max(MIN_TOKENS, d[max_f2_idx])


@dataclass
class ExtractResult:
    text: str = ""
    # (start_line, end_line, char_start, char_end) per emitted block, offsets
    # into `text`; end_line is exclusive (Java loop `ii < b_end`).
    spans: list[tuple[int, int, int, int]] = field(default_factory=list)
    threshold: int = -1
    blocks: list[tuple[int, int, int, int]] = field(default_factory=list)
    density: np.ndarray = field(default_factory=lambda: np.zeros(0, dtype=np.int64))


def get_text(html: str) -> ExtractResult:
    """T10–T14 (TextExtract.java:276-470)."""
    lines = html.split("\n")  # Java split("\n",-1): trailing empties kept
    nlines = len(lines)
    if nlines < BLOCKS_WIDTH:
        # unreachable via parse() (pre_process pads 3 newlines); direct calls
        # mirror the Java no-window outcome: empty text.
        return ExtractResult()

    tokens = [line_tokens(ln) for ln in lines]
    token_lens = np.fromiter((len(t) for t in tokens), dtype=np.int64, count=nlines)

    # T11: windowed density, Math.round half-up (TextExtract.java:296-307).
    window_sums = np.convolve(token_lens, np.ones(BLOCKS_WIDTH, dtype=np.int64), mode="valid")
    density = np.floor(window_sums / float(BLOCKS_WIDTH) + 0.5).astype(np.int64)
    line_number = int(density.shape[0])  # == nlines - BLOCKS_WIDTH + 1

    # T12: block segmentation (TextExtract.java:334-409). The start line's
    # density==0 check is skipped (`continue` at :350) — faithful.
    blocks: list[tuple[int, int, int, int]] = []
    maxima: list[int] = []
    start, end = -1, -1
    boolstart = False
    block_max = 0
    block_sum = 0
    for i in range(line_number):
        tl = int(token_lens[i])
        di = int(density[i])
        if tl > 0 and not boolstart:
            boolstart = True
            start = i
            block_sum += tl
            if di > block_max:
                block_max = di
            continue
        if boolstart:
            block_sum += tl
            if di > block_max:
                block_max = di
            if di == 0:
                end = i
                blocks.append((start, end, block_max, block_sum))
                maxima.append(block_max)
                block_max = 0
                block_sum = 0
                boolstart = False
    if start > end:  # trailing open block (TextExtract.java:399-409)
        blocks.append((start, line_number, block_max, block_sum))
        maxima.append(block_max)

    threshold = cal_threshold(maxima)

    # T14: selection + emit (TextExtract.java:412-438).
    parse_max_line = int(math.ceil(nlines * MAIN_RATIO))
    line_count = 0
    pieces: list[str] = []
    spans: list[tuple[int, int, int, int]] = []
    char_pos = 0
    for b_start, b_end, b_max, b_sum in blocks:
        if b_max < threshold:
            continue
        if b_start >= parse_max_line and b_sum < 200:
            continue
        buf: list[str] = []
        for ii in range(b_start, b_end):
            txt = tokens[ii]
            if not txt:
                continue
            if line_count > MAX_LINES:
                break
            if not _SKIP_LINE_RE.search(txt):
                buf.append(java_trim(lines[ii]) + "\n")
                line_count += 1
        s = "".join(buf)
        pieces.append(s)
        spans.append((b_start, b_end, char_pos, char_pos + len(s)))
        char_pos += len(s)

    return ExtractResult(
        text="".join(pieces),
        spans=spans,
        threshold=threshold,
        blocks=blocks,
        density=density,
    )


def parse(html: str) -> ExtractResult:
    """TextExtract.parse (TextExtract.java:48-62): T1 → preProcess → empty
    check → getText.  No final trim here — the forTest caller trims
    (ContentExtractor.java:188); the extract() caller does not (:109)."""
    html = _CTRL_RE.sub("", html)
    html = pre_process(html)
    if _EMPTY_CHECK_RE.sub("", html) == "":
        return ExtractResult()
    return get_text(html)


def parse_main_text(html: str) -> str:
    """forTest path (canonical, ContentExtractor.java:188): parse + java_trim.

    NOTE: span char offsets in ExtractResult are relative to the *untrimmed*
    text; use parse() when spans are needed.
    """
    return java_trim(parse(html).text)
