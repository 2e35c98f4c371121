"""Differential + property tests (SURVEY.md §5.2-3).

The vectorized implementation is checked against a naive, line-for-line
Java-faithful reference loop on randomized inputs; extraction end-to-end is
fuzzed for error isolation and span consistency.
"""

import math

from hypothesis import given, settings, strategies as st

from contentextractor_spark.extractor import extract_document
from contentextractor_spark.functions.entities import unescape_html4
from contentextractor_spark.functions.javacompat import java_round, java_trim
from contentextractor_spark.functions.textextract import (
    BLOCKS_WIDTH,
    cal_threshold,
    get_text,
    line_tokens,
    parse,
)


# ---------- differential: density window (T11) ----------

def _density_reference(token_lens: list[int]) -> list[int]:
    """Naive Java-faithful loop (TextExtract.java:296-307)."""
    out = []
    for i in range(len(token_lens) - BLOCKS_WIDTH + 1):
        words = sum(token_lens[i:i + BLOCKS_WIDTH])
        out.append(int(math.floor(words / 4.0 + 0.5)))
    return out


@given(st.lists(st.integers(min_value=0, max_value=500), min_size=4, max_size=200))
def test_density_vectorized_matches_reference(lens):
    # build synthetic lines whose token count equals lens[i] exactly
    lines = ["x" * n for n in lens]
    res = get_text("\n".join(lines))
    assert list(res.density) == _density_reference(lens)


# ---------- differential: threshold (T13) ----------

def _threshold_reference(maxima: list[int]) -> int:
    """Line-for-line port of calThreshold (TextExtract.java:126-186)."""
    if not maxima:
        return -1
    d = sorted(maxima)
    n = len(d)
    if n == 1:
        return max(5, d[0])
    if n == 2:
        return max(5, d[1])
    max_f2, idx = 0, 0
    for i in range(1, n - 1):
        f2 = d[i - 1] - 2 * d[i] + d[i + 1]
        if f2 > max_f2:
            max_f2, idx = f2, i
    if idx == n - 2 or n == 3:
        idx = n - 1
    return max(5, d[idx])


@given(st.lists(st.integers(min_value=0, max_value=10_000), max_size=50))
def test_threshold_matches_reference(maxima):
    assert cal_threshold(list(maxima)) == _threshold_reference(list(maxima))


# ---------- invariants over random HTML ----------

html_text = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_categories=("Cs",)
    ),
    max_size=400,
)


@settings(max_examples=150, deadline=None)
@given(html_text)
def test_extract_never_raises(s):
    res = extract_document(s.encode("utf-8", errors="ignore"))
    assert res.status == "ok" or res.status.startswith("error:")


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=300))
def test_extract_arbitrary_bytes_never_raises(data):
    res = extract_document(data)
    assert isinstance(res.main_text, str)


@settings(max_examples=150, deadline=None)
@given(html_text)
def test_spans_reconstruct_text(s):
    res = parse(s)
    assert res.text == "".join(
        res.text[cs:ce] for (_, _, cs, ce) in res.spans
    )
    # spans are contiguous over the emitted text
    pos = 0
    for (_, _, cs, ce) in res.spans:
        assert cs == pos
        assert ce >= cs
        pos = ce
    assert pos == len(res.text)


@settings(max_examples=100, deadline=None)
@given(html_text)
def test_emitted_line_cap(s):
    res = parse(s)
    assert res.text.count("\n") <= 101


@settings(max_examples=100, deadline=None)
@given(html_text)
def test_threshold_floor(s):
    res = parse(s)
    assert res.threshold == -1 or res.threshold >= 5


@settings(max_examples=100, deadline=None)
@given(html_text)
def test_blocks_disjoint_and_ordered(s):
    res = parse(s)
    prev_end = -1
    for (bs, be, bm, bsum) in res.blocks:
        assert bs > prev_end or (bs == 0 and prev_end == -1)
        assert be >= bs
        assert bm >= 0 and bsum >= 0
        prev_end = be - 1


# ---------- entity / trim properties ----------

@given(st.text(max_size=200))
def test_unescape_identity_without_amp(s):
    if "&" not in s:
        assert unescape_html4(s) == s


@given(st.text(max_size=100))
def test_java_trim_subset_of_python_strip(s):
    # java_trim strips at most what Python strip() strips... not true in
    # general (python strip only whitespace); assert the precise contract:
    t = java_trim(s)
    assert not t or (ord(t[0]) > 0x20 and ord(t[-1]) > 0x20)


@given(st.floats(min_value=0, max_value=1e6, allow_nan=False))
def test_java_round_half_up_property(x):
    r = java_round(x)
    assert r == math.floor(x + 0.5)


@given(st.text(max_size=200))
def test_line_tokens_only_keep_alphabet(s):
    t = line_tokens(s)
    for c in t:
        assert (
            c.isascii() and (c.isalnum() or c == "_")
            or "０" <= c <= "９" or "Ａ" <= c <= "Ｚ" or "ａ" <= c <= "ｚ"
            or "一" <= c <= "鿿" or "぀" <= c <= "ゟ" or "゠" <= c <= "ヿ"
        )
