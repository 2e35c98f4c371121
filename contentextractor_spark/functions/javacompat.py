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
_JAVA_TRIM_CHARS = "".join(chr(c) for c in range(0x21))


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


# Java regex \s (no UNICODE_CHARACTER_CLASS flag) = [ \t\n\x0B\f\r].
JAVA_WS = " \t\n\x0b\f\r"
JAVA_WS_CLASS = r"[ \t\n\x0B\f\r]"

# Java regex \w (default) = [a-zA-Z0-9_]; Python \w is Unicode-aware.
JAVA_WORD_CLASS = "a-zA-Z0-9_"
