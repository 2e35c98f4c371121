"""NFC normalization: canonical composition cases, ASCII fast-path
identity, and null tolerance."""

import pytest

from contentextractor_spark.functions import analysis as A


@pytest.fixture(scope="module")
def normed(spark):
    rows = [
        (0, "cafe\u0301"),                 # combining acute -> U+00E9
        (1, "plain ascii only"),            # fast path, unchanged
        (2, "\u212b"),                     # angstrom singleton -> U+00C5
        (3, "\u1100\u1161"),              # Hangul jamo -> U+AC00
        (4, "caf\u00e9 already nfc"),      # non-ascii but already composed
        (5, None),                          # null passthrough
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    return {
        r["doc_id"]: (r["text_nfc"], r["changed"])
        for r in A.nfc_normalize(df).collect()
    }


def test_composition_cases(normed):
    assert normed[0] == ("caf\u00e9", 1)
    assert normed[2] == ("\u00c5", 1)
    assert normed[3] == ("\uac00", 1)


def test_ascii_and_already_nfc_unchanged(normed):
    assert normed[1] == ("plain ascii only", 0)
    assert normed[4] == ("caf\u00e9 already nfc", 0)


def test_null_passthrough(normed):
    assert normed[5] == (None, None)


# ---------------------------------------------------------------------------
# script_profile (r5 session-2) — shares this file's unicode-exactness theme
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def profiled(spark):
    rows = [
        (0, "hello world 42"),
        (1, "日本語 abc"),        # CJK-dominant
        (2, "ab ру"),               # latin==cyrillic tie -> latin
        (3, "   "),                           # whitespace only -> none
        (4, "\U0001F600\U0001F601 hi"),       # non-BMP emoji -> n_other
        (5, "한국어"),            # hangul
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    from contentextractor_spark.functions import analysis as A

    return {r["doc_id"]: r.asDict() for r in A.script_profile(df).collect()}


def test_script_counts(profiled):
    r = profiled[0]
    assert (r["n_latin"], r["n_digit"], r["n_space"], r["n_other"]) == (10, 2, 2, 0)
    assert r["main_script"] == "latin"
    r1 = profiled[1]
    assert (r1["n_cjk"], r1["n_latin"], r1["main_script"]) == (3, 3, "latin")
    # NB: 3-char tie resolves by priority order: latin precedes... no —
    # SCRIPT_CLASSES order is latin first, so a 3-3 tie reports latin.
    r5 = profiled[5]
    assert (r5["n_hangul"], r5["main_script"]) == (3, "hangul")


def test_tie_priority_and_none(profiled):
    assert profiled[2]["main_script"] == "latin"  # 2-2 tie, latin first
    assert profiled[3]["main_script"] == "none"
    assert profiled[3]["n_space"] == 3


def test_non_bmp_counts_as_other_codepoints(profiled):
    r = profiled[4]
    assert r["n_other"] == 2  # two emoji = two codepoints, both engines
    assert r["n_latin"] == 2 and r["main_script"] == "latin"
