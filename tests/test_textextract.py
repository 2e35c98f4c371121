"""Hand-derived unit goldens for TextExtract semantics (SURVEY.md §2.5, §5.2-1).

Every expected value in this file was computed by hand from the reference
algorithm (TextExtract.java), not by running the implementation.
"""

import pytest

from contentextractor_spark.functions.textextract import (
    ExtractResult,
    cal_threshold,
    get_text,
    line_tokens,
    parse,
    parse_main_text,
    pre_process,
)


# ---------- T10 token filter ----------

def test_line_tokens_ascii_word():
    # Java \w is ASCII: accents dropped, underscore kept
    assert line_tokens("ab c_9 é!") == "abc_9"


def test_line_tokens_cjk_and_fullwidth():
    assert line_tokens("漢字 ひらがな カタカナ　ＡＢ０１") == "漢字ひらがなカタカナＡＢ０１"


def test_line_tokens_nbsp_stripped():
    # U+00A0 is in the strip class (byte-verified TextExtract.java:300)
    assert line_tokens("a b") == "ab"


def test_line_tokens_halfwidth_katakana_dropped():
    # U+FF71 halfwidth katakana is NOT in the keep set (ranges end at U+30FF)
    assert line_tokens("ｱｲｳ") == ""


# ---------- T2-T9 pre_process ----------

def test_preprocess_main_rule():
    out = pre_process('<!DOCTYPE html><!-- c --><meta charset="x"><link rel="y">text')
    assert out == "text\n\n\n"


def test_preprocess_br_collapse_fixpoint():
    # T3: runs of >=2 <br> collapse to one, looped to fixpoint; T4: <br> -> \n
    assert pre_process("a<br><br><br>b") == "a\nb\n\n\n"
    assert pre_process("a<br /> <br class=x>　<br>b") == "a\nb\n\n\n"


def test_preprocess_single_br():
    assert pre_process("a<br>b") == "a\nb\n\n\n"


def test_preprocess_block_tags():
    # <div> -> \n (T5), </div> -> \n\n\n (T6), other tags stripped (T7)
    assert pre_process("<div><a href=x>link</a>text</div>") == "\nlinktext\n\n\n\n\n\n"


def test_preprocess_entity_unescape_html4():
    assert pre_process("a&amp;b&apos;c") == "a&b&apos;c\n\n\n"


def test_preprocess_crlf_to_newline():
    # sub_rule_02 maps \r\n -> \n (dead via parse(), live via pre_process)
    assert pre_process("a\r\nb") == "a\nb\n\n\n"


# ---------- T13 threshold ----------

@pytest.mark.parametrize(
    "maxima,expected",
    [
        ([], -1),
        ([7], 7),            # n=1: max(5, d[0])
        ([3], 5),            # min_tokens floor
        ([9, 3], 9),         # n=2: max(5, d[1])
        ([3, 8, 40], 40),    # n=3: forced last
        ([40, 8, 3], 40),    # sorted ascending first
        ([10, 10, 10, 10], 10),  # all f2<=0 -> idx 0 -> d[0]
        ([1, 2, 10, 11], 5),     # argmax f2 at i=1 (7 > -7) -> d[1]=2 -> floor 5
        ([5, 6, 7, 30], 30),     # argmax at n-2 -> promoted to n-1
    ],
)
def test_cal_threshold(maxima, expected):
    assert cal_threshold(list(maxima)) == expected


# ---------- T11/T12/T14 get_text ----------

L1 = "Hello world this is the main content line one"      # 37 tokens
L2 = "Second line of dense content here with words"       # 37 tokens
L3 = "Third dense line with plenty of text content"       # 37 tokens


def test_get_text_single_block():
    html = "\n".join([L1, L2, L3, "", "", "", ""])
    res = get_text(html)
    # density: [28, 19, 9, 0]; one block (0,3,28,111); threshold n=1 -> 28
    assert list(res.density) == [28, 19, 9, 0]
    assert res.blocks == [(0, 3, 28, 111)]
    assert res.threshold == 28
    assert res.text == L1 + "\n" + L2 + "\n" + L3 + "\n"
    assert res.spans == [(0, 3, 0, len(res.text))]


def test_get_text_density_half_up_rounding():
    # window sum 74 -> 74/4=18.5 -> Java Math.round half-up = 19 (not 18)
    html = "\n".join([L1, L2, L3, "", "", "", ""])
    assert get_text(html).density[1] == 19


def test_get_text_start_line_density_zero_continues_block():
    # A block's start line skips the density==0 end check (continue at :350)
    # single char line then empties: d[0]=round(1/4)=0 but block still opens
    html = "\n".join(["a", "", "", "", "", "", ""])
    res = get_text(html)
    # start=0; i=1..3 d=0 -> end=1; block (0,1,0,1); threshold=max(5,0)=5
    assert res.blocks == [(0, 1, 0, 1)]
    assert res.threshold == 5
    assert res.text == ""  # b_max 0 < threshold 5


def test_get_text_trailing_open_block():
    # dense lines at the very end: block never closes in the scan window
    html = "\n".join(["", "", L1, L2, L3])  # no trailing pad beyond 2 lines
    res = get_text(html)
    # nlines=5, line_number=2: d[0]=round(74/4)=19, d[1]=round(111/4)=28
    assert list(res.density) == [19, 28]
    # i=0: tokens[0]=="" no start; i=1: empty too? lines[1]="" -> no block...
    # block starts at i=2? i only goes to line_number-1=1 -> no block opens
    assert res.blocks == []
    assert res.text == ""


def test_get_text_trailing_open_block_recorded():
    html = "\n".join([L1, L2, L3, "x"])  # nlines=4, line_number=1
    res = get_text(html)
    # i=0: tl=37 -> start=0, d[0]=round((37*3+1)/4)=round(28.0)=28, block open
    # loop ends; start(0) > end(-1) -> trailing block (0, 1, 28, 37)
    assert res.blocks == [(0, 1, 28, 37)]
    # threshold n=1 -> 28; emit lines 0..0
    assert res.text == L1 + "\n"


def test_get_text_tail_boilerplate_guard():
    # block starting at >= ceil(0.8*nlines) with token sum < 200 is dropped
    # 20 empty lines, then 3 dense lines at the tail, pad to 26 lines
    lines = [""] * 20 + [L1, L2, L3] + ["", "", ""]
    res = get_text("\n".join(lines))
    # nlines=26, parse_max_line=ceil(20.8)=21... block starts at 20 -> kept!
    assert res.text != ""
    # shift one later: 21 empties -> block start 21 >= ceil(21.6)=22? no, 21<22 kept
    lines = [""] * 22 + [L1, L2, L3] + ["", "", ""]
    res = get_text("\n".join(lines))
    # nlines=28, parse_max_line=ceil(22.4)=23; start=22 < 23 -> kept
    assert res.text != ""
    lines = [""] * 24 + [L1, L2, L3] + ["", "", ""]
    res = get_text("\n".join(lines))
    # nlines=30, parse_max_line=24; start=24 >= 24 and sum 111 < 200 -> dropped
    assert res.text == ""


def test_get_text_tail_guard_large_sum_kept():
    big = "word " * 60  # ~240 tokens in one line
    lines = [""] * 24 + [big, big, ""] + ["", "", ""]
    res = get_text("\n".join(lines))
    # start >= parse_max_line but token sum >= 200 -> kept
    assert res.text != ""


def test_get_text_skip_regex_lines():
    lines = [L1, "Copyright 2016 foo", "利用規約はこちら", L2, L3, "", "", ""]
    res = get_text("\n".join(lines))
    assert "Copyright" not in res.text
    assert "利用規約" not in res.text
    assert L1 in res.text and L2 in res.text


def test_get_text_skip_regex_on_filtered_token():
    # trap: the match is on the *filtered* token, so "Copy right" matches too
    lines = [L1, "Copy right 2016", L2, L3, "", "", ""]
    res = get_text("\n".join(lines))
    assert "Copy right" not in res.text


def test_get_text_max_lines_cap():
    # 105 nonempty lines in one block -> exactly 101 emitted (cap check is
    # line_count > 100 before append)
    lines = [f"line number {i} with some extra words here" for i in range(105)]
    lines += ["", "", ""]
    res = get_text("\n".join(lines))
    assert res.text.count("\n") == 101


def test_get_text_line_trim_is_java_trim():
    # emitted lines are Java-trimmed: U+3000 kept, ASCII space stripped
    line = "  　" + L1 + "　  "
    html = "\n".join([line, L2, L3, "", "", "", ""])
    res = get_text(html)
    assert res.text.startswith("　" + L1 + "　\n")


# ---------- parse / parse_main_text ----------

def test_parse_empty_and_whitespace():
    assert parse("").text == ""
    assert parse("  \t\r\n ").text == ""
    assert parse("<div></div>").text == ""


def test_parse_strips_ctrl_chars_first():
    # T1 removes \n before line building: source newlines don't split lines
    res = parse(L1 + "\n" + L2)
    # both lines fuse into ONE line
    assert res.text == L1 + L2 + "\n"


def test_parse_end_to_end_simple_div():
    html = f"<div><p>{L1}</p><p>{L2}</p><p>{L3}</p></div>"
    # <div> -> \n ; </p> -> \n ; <p> stripped ; </div> -> \n\n\n ; pad \n\n\n
    # lines: ["", L1, L2, L3, "", "", "", "", "", ""]
    res = parse(html)
    assert res.text == L1 + "\n" + L2 + "\n" + L3 + "\n"
    assert parse_main_text(html) == L1 + "\n" + L2 + "\n" + L3  # trailing \n trimmed


def test_parse_result_is_dataclass():
    assert isinstance(parse("x"), ExtractResult)
