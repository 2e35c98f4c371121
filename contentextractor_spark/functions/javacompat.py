"""Java semantic-compat helpers.

The reference (ChenHaoyang/ContentExtractor) is Java; several Java string /
math semantics differ from Python's defaults.  Every helper here encodes one
documented trap from SURVEY.md §2.5 / §7, with the reference file:line cited.

These are pure functions — they run inside Arrow/pandas UDF batches on
executors, never on the driver per-row.
"""

from __future__ import annotations

import math

# Java String.trim() strips chars with code point <= U+0020 from both ends
# (reference call site: ContentExtractor.java:188 `te.parse(...).trim()` and
# TextExtract.java:431 `lines.get(ii).trim()`).  Python str.strip() also
# strips U+00A0, U+3000 etc. — must not.
# JAVA_TRIM_CHARS is the ONE shared copy (r3 review: five modules each
# rebuilt it — extractor.py once PER DOCUMENT on the hot path).
JAVA_TRIM_CHARS = "".join(chr(c) for c in range(0x21))
_JAVA_TRIM_CHARS = JAVA_TRIM_CHARS  # back-compat alias


def java_trim(s: str) -> str:
    """Java String.trim(): strip leading/trailing chars <= U+0020."""
    return s.strip(_JAVA_TRIM_CHARS)


def java_round(x: float) -> int:
    """Java Math.round(double) = floor(x + 0.5) — half-up.

    Python round() / numpy round to half-even; the density window at
    TextExtract.java:306 uses `(int)Math.round((double)wordsNum / 4.0)`.
    """
    return int(math.floor(x + 0.5))


def java_split_keep_trailing(s: str, sep: str) -> list[str]:
    """Java String.split(sep, -1): split keeping trailing empty strings.

    Python str.split(sep) already keeps trailing empties, so this is a thin
    documented alias (TextExtract.java:279 `html.split("\\n",-1)`).
    """
    return s.split(sep)


def java_split_drop_trailing(s: str, sep: str) -> list[str]:
    """Java String.split(sep) (limit 0): trailing empty strings removed.
    The one shared copy (r3 review: charset.py and tagfilter.py each had a
    byte-identical private one) — callers pass literal separators only;
    Java's split treats sep as REGEX, so a metachar separator would need
    escaping on the Java side too (none of the reference call sites use
    one: ';' '=' ':').
    """
    parts = s.split(sep)
    while parts and parts[-1] == "":
        parts.pop()
    return parts


def _java_char_upper(c: str) -> str:
    u = c.upper()
    # Python applies FULL case mappings ('ß'.upper() == 'SS'); Java's
    # Character.toUpperCase is the SIMPLE 1:1 map, which leaves such
    # chars unchanged
    return u if len(u) == 1 else c


def _java_char_lower(c: str) -> str:
    l = c.lower()
    if len(l) == 1:
        return l
    # the one BMP char whose full lowercase expands: U+0130 İ → 'i' +
    # combining dot; Java's simple map gives plain 'i'
    return "i" if c == "İ" else c


def java_equals_ignore_case(a: str, b: str) -> bool:
    """Java String.equalsIgnoreCase: per-CHAR simple case comparison —
    upper(c1)==upper(c2) or lower(upper(c1))==lower(upper(c2)).  Differs
    from Python a.lower()==b.lower() on one-to-many mappings: Java matches
    'DESCRİPTİON' (Turkish dotted İ) against 'description', Python's full
    lowercase expands İ to two chars and misses (jsoup attribute-value
    compares use equalsIgnoreCase; reference via ContentExtractor.java
    meta selects)."""
    if a == b:
        return True
    if len(a) != len(b):
        return False
    for c1, c2 in zip(a, b):
        if c1 == c2:
            continue
        u1, u2 = _java_char_upper(c1), _java_char_upper(c2)
        if u1 == u2:
            continue
        if _java_char_lower(u1) != _java_char_lower(u2):
            return False
    return True


# Java regex \s (no UNICODE_CHARACTER_CLASS flag) = [ \t\n\x0B\f\r].
JAVA_WS = " \t\n\x0b\f\r"
JAVA_WS_CLASS = r"[ \t\n\x0B\f\r]"

# Java regex \w (default) = [a-zA-Z0-9_]; Python \w is Unicode-aware.
JAVA_WORD_CLASS = "a-zA-Z0-9_"
