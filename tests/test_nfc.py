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
