"""Bundled mini-lexicon + Kuromoji-style morphological analysis — K1/K2
(SURVEY.md §2.6; ContentExtractor.java:77-80,115-128).

The reference drives ``JapaneseTokenizer(..., Mode.NORMAL)`` (Kuromoji) and
keeps tokens whose part-of-speech contains 名詞 (noun) but not 数 (numeral),
or contains 形容詞 (adjective), folding the BASE FORM when the token is
inflected (BaseFormAttribute).  The full IPADIC/NEologd lexicon is ~400k
entries and unavailable here; this module bundles a small lexicon covering
the fixture/archetype vocabulary and reproduces the *mechanism* exactly:

 - longest-match segmentation against the lexicon (greedy ≈ NORMAL-mode
   Viterbi on a vocabulary this sparse — no competing splits exist);
 - unknown spans grouped by script class (Kuromoji's unknown-word handling
   groups by character category), tagged 名詞 (non-digit) or 名詞-数 (digit
   runs) — matching how Kuromoji tags OOV Latin runs (kept) and numerals
   (dropped) through the reference's filter;
 - the K2 filter verbatim: (POS contains 名詞 and not 数) or POS contains
   形容詞; SURFACE length > 1; emit base form if present else surface.

Documented divergence: vocabulary OUTSIDE this lexicon segments as whole
script runs rather than IPADIC morphemes.  The lexicon is data, not code —
extending it to full IPADIC is a file swap.
"""

from __future__ import annotations

# surface → (part_of_speech, base_form or None)
# POS strings follow IPADIC's comma-joined convention (the reference does
# substring containment checks on them, so prefixes suffice).
LEXICON: dict[str, tuple[str, str | None]] = {
    # --- particles (助詞) — dropped by the K2 filter --------------------
    "は": ("助詞,係助詞", None),
    "が": ("助詞,格助詞", None),
    "を": ("助詞,格助詞", None),
    "に": ("助詞,格助詞", None),
    "で": ("助詞,格助詞", None),
    "と": ("助詞,並立助詞", None),
    "も": ("助詞,係助詞", None),
    "の": ("助詞,連体化", None),
    "へ": ("助詞,格助詞", None),
    "や": ("助詞,並立助詞", None),
    "から": ("助詞,格助詞", None),
    "まで": ("助詞,副助詞", None),
    # --- verbs / auxiliaries — dropped -----------------------------------
    "する": ("動詞,自立", "する"),
    "した": ("動詞,自立", "する"),
    "します": ("動詞,自立", "する"),
    "です": ("助動詞", "です"),
    "ます": ("助動詞", "ます"),
    "ある": ("動詞,自立", "ある"),
    "いる": ("動詞,自立", "いる"),
    # --- adjectives (形容詞) — kept, base-form folded ---------------------
    "高い": ("形容詞,自立", "高い"),
    "高く": ("形容詞,自立", "高い"),
    "新しい": ("形容詞,自立", "新しい"),
    "新しく": ("形容詞,自立", "新しい"),
    "美しい": ("形容詞,自立", "美しい"),
    "美しく": ("形容詞,自立", "美しい"),
    "速い": ("形容詞,自立", "速い"),
    "速く": ("形容詞,自立", "速い"),
    # --- numerals (名詞-数) — dropped by the 数 exclusion ------------------
    "一": ("名詞,数", None),
    "二": ("名詞,数", None),
    "三": ("名詞,数", None),
    # --- nouns (名詞) — kept ----------------------------------------------
    "日本語": ("名詞,一般", None),
    "日本": ("名詞,固有名詞,地域,国", None),
    "本文": ("名詞,一般", None),
    "記事": ("名詞,一般", None),
    "内容": ("名詞,一般", None),
    "情報": ("名詞,一般", None),
    "文化": ("名詞,一般", None),
    "技術": ("名詞,一般", None),
    "経済": ("名詞,一般", None),
    "社会": ("名詞,一般", None),
    "生活": ("名詞,一般", None),
    "旅行": ("名詞,サ変接続", None),
    "音楽": ("名詞,一般", None),
    "歴史": ("名詞,一般", None),
    "科学": ("名詞,一般", None),
    "自然": ("名詞,形容動詞語幹", None),
    "テキスト": ("名詞,一般", None),
    "確認": ("名詞,サ変接続", None),
    "トップページ": ("名詞,一般", None),
    "ホーム": ("名詞,一般", None),
    "案内": ("名詞,サ変接続", None),
    "プライバシー": ("名詞,一般", None),
    "トピックス": ("名詞,一般", None),
    "問い合わせ": ("名詞,サ変接続", None),
    "問い合せ": ("名詞,サ変接続", None),
    "スマホ": ("名詞,一般", None),
    "利用": ("名詞,サ変接続", None),
    "規約": ("名詞,一般", None),
    "一覧": ("名詞,一般", None),
}

_MAX_ENTRY_LEN = max(len(k) for k in LEXICON)

# perf indexes: a random-vocabulary char has no entry starting with it, so
# one set probe replaces _MAX_ENTRY_LEN substring allocations per position
_BY_FIRST: dict[str, list[str]] = {}
for _k in LEXICON:
    _BY_FIRST.setdefault(_k[0], []).append(_k)
for _v in _BY_FIRST.values():
    _v.sort(key=len, reverse=True)
_MULTI_FIRST = frozenset(k[0] for k in LEXICON if len(k) >= 2)
_ALL_FIRST = frozenset(k[0] for k in LEXICON)

import re as _re

# script-class runs for unknown-word grouping (Kuromoji char categories);
# leftmost alternation = class of the run's first char, greedy to class end.
# All scanning is C-level regex — a per-char Python class loop costs ~5µs/char
# and made the fold dominate the extraction hot path (measured).
_ANY_TOKEN_RE = _re.compile(
    r"[A-Za-z0-9_]+"
    r"|[ぁ-ゖー]+"
    r"|[ァ-ヺヽヾー]+"
    r"|[一-鿿々]+"
    r"|[０-９Ａ-Ｚａ-ｚ]+"
)
_MULTI_FIRST_RE = (
    _re.compile("[" + "".join(_re.escape(c) for c in sorted(_MULTI_FIRST)) + "]")
    if _MULTI_FIRST
    else None
)
_PURE_DIGITS_RE = _re.compile(r"[0-9０-９]+\Z")

# master scanner: lexicon entries (longest-first, so alternation = longest
# match) beat script runs at the same position; one C-level search per TOKEN
# instead of any per-char Python work
_LEX_ALT = "|".join(
    _re.escape(k) for k in sorted(LEXICON, key=len, reverse=True)
)
_MASTER_RE = _re.compile(f"(?P<lex>{_LEX_ALT})|(?P<run>{_ANY_TOKEN_RE.pattern})")
# first embedded multi-char entry inside an unknown run, as one C-level scan
_MULTI_ENTRY_RE = _re.compile(
    "|".join(
        _re.escape(k)
        for k in sorted(LEXICON, key=len, reverse=True)
        if len(k) >= 2
    )
)


def analyze(text: str) -> list[tuple[str, str, str | None]]:
    """Segment into (surface, pos, base_form) morphemes: longest lexicon
    match first, else a script-class run that stops where a lexicon match
    (of length >= 2) begins (single-char entries like particles do NOT
    split a run — Kuromoji keeps OOV compounds whole rather than splitting
    on an embedded particle character).  Whitespace and symbols are skipped
    (Kuromoji discards them via its punctuation categories)."""
    out: list[tuple[str, str, str | None]] = []
    pos, n = 0, len(text)
    next_entry = -1  # memoized start of the next embedded multi-char entry;
    # recomputed only when the scan passes it, so the split search costs one
    # amortized pass over the text instead of O(runs × tail) rescans
    while pos < n:
        m = _MASTER_RE.search(text, pos)
        if m is None:
            break
        if m.lastgroup == "lex":
            s = m.group()
            p, b = LEXICON[s]
            out.append((s, p, b))
            pos = m.end()
            continue
        i, run_end = m.start(), m.end()
        if next_entry < i + 1:
            # unbounded search: an embedded entry may CROSS the run's class
            # boundary (問い合わせ = kanji+hiragana); only its START must
            # lie inside this run
            s2 = _MULTI_ENTRY_RE.search(text, i + 1)
            next_entry = s2.start() if s2 is not None else n
        j = next_entry if next_entry < run_end else run_end
        surface = text[i:j]
        if _PURE_DIGITS_RE.match(surface):
            out.append((surface, "名詞,数", None))
        else:
            out.append((surface, "名詞,一般", None))
        pos = j
    return out


def keyword_fold_kuromoji(text: str) -> str:
    """The reference's keyword loop, verbatim semantics
    (ContentExtractor.java:115-128): filter on POS containment, surface
    length > 1, fold base-or-surface with a trailing comma per token."""
    if _ALL_FIRST.isdisjoint(text):
        # pure-OOV text (e.g. Latin-only pages): the analyzer provably
        # degrades to script-run segmentation — take the regex fast path
        from .tokenize import keyword_list_regex

        return keyword_list_regex(text)
    parts: list[str] = []
    for surface, speech, base in analyze(text):
        if ("名詞" in speech and "数" not in speech) or "形容詞" in speech:
            if len(surface) > 1:
                parts.append((base if base is not None else surface) + ",")
    return "".join(parts)
