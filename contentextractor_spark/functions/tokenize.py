"""CJK/Latin tokenizer + keyword fold — K1/K2 (SURVEY.md §2.6).

The reference tokenizes ``main_text`` with Kuromoji-NEologd
(ContentExtractor.java:77-80,110-128) and folds noun/adjective base forms
into a comma-joined keyword string (trailing comma).  Full Kuromoji parity
needs the NEologd lexicon (unavailable, and irrelevant to the density
scorer — see SURVEY.md §2.6 K1); per the north star this stage is a
**vectorized regex tokenizer**, not per-row Python morphology.

Token classes (script-segmented runs):
 - Latin/ASCII word runs  [A-Za-z0-9_]+
 - hiragana runs, katakana runs (with ー prolonged-sound mark)
 - CJK ideograph runs (with 々 iteration mark)
 - full-width alnum runs

K2's filter (names/adjectives, length > 1, not a number) is approximated
deterministically: keep runs of length > 1 that are not pure digits.
"""

from __future__ import annotations

import re

import pandas as pd

TOKEN_RE = re.compile(
    r"[A-Za-z0-9_]+"          # Latin word runs (Java \w)
    r"|[ぁ-ゖー]+"             # hiragana (+ chōonpu)
    r"|[ァ-ヺヽヾー]+"          # katakana (+ marks)
    r"|[一-鿿々]+"             # CJK ideographs (+ iteration mark)
    r"|[０-９Ａ-Ｚａ-ｚ]+"      # full-width alnum
)

_PURE_DIGITS = re.compile(r"[0-9０-９]+")


def tokenize(text: str) -> list[str]:
    """K1: script-segmented token runs, in document order."""
    return TOKEN_RE.findall(text)


def keyword_tokens(text: str) -> list[str]:
    """K2 filter: length > 1, not a pure number (Kuromoji 名詞-not-数 /
    形容詞 approximation), order-preserving with duplicates (the reference
    keeps duplicates — it folds every token occurrence)."""
    return [
        t for t in tokenize(text) if len(t) > 1 and not _PURE_DIGITS.fullmatch(t)
    ]


def keyword_list(text: str) -> str:
    """K2 fold: comma-joined with trailing comma
    (ContentExtractor.java:122-124 builds ``base + ","`` repeatedly)."""
    toks = keyword_tokens(text)
    return "".join(t + "," for t in toks)


def keyword_list_series(texts: pd.Series) -> pd.Series:
    """Vectorized batch form: pandas str.findall at Arrow-batch granularity."""
    found = texts.fillna("").str.findall(TOKEN_RE)
    return found.map(
        lambda toks: "".join(
            t + "," for t in toks if len(t) > 1 and not _PURE_DIGITS.fullmatch(t)
        )
    )
