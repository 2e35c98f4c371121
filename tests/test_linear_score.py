"""Hashed linear scorer: bit-exact parity with a pure-Python replica of
the hashing trick + md5 weight table + offset-trick integer mean, plus
normalization and threshold semantics."""

import hashlib
import re

import pytest

from contentextractor_spark.functions import analysis as A

N_BUCKETS = 4096


def _hex_int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _weight(bucket: int) -> int:
    return _hex_int(f"w:{bucket}") % 2001 - 1000


def _replica(text: str):
    t = re.sub(r"[^A-Za-z0-9]+", " ", text).lower().strip()
    if not t:
        return None
    ws = t.split(" ")
    feats = ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
    s = sum(_weight(_hex_int(g) % N_BUCKETS) for g in feats)
    n = len(feats)
    score = (s + 1000 * n) // n - 1000
    return n, score


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_replica_parity(spark):
    rows = [
        (0, "The quick brown fox jumps over the lazy dog"),
        (1, "Hello, world! 42 times."),
        (2, "one"),
        (3, "unicode éé stripped entirely here"),
        (4, "  spaced   out\ttokens\nnewlines  "),
    ]
    got = {
        r.doc_id: (r.n_feats, r.score_micro)
        for r in A.hashed_linear_score(_docs(spark, rows)).collect()
    }
    want = {i: _replica(t) for i, t in rows}
    assert got == {i: w for i, w in want.items() if w is not None}


def test_empty_normalization_excluded(spark):
    rows = [(0, "!!! ### ..."), (1, "日本語"), (2, "ok doc")]
    got = {r.doc_id for r in A.hashed_linear_score(_docs(spark, rows)).collect()}
    assert got == {2}


def test_bigrams_make_order_matter(spark):
    # same unigram bag, different bigrams -> different score (verified
    # against the replica so the assertion can never go stale)
    a, b = "alpha beta gamma", "gamma beta alpha"
    ra, rb = _replica(a), _replica(b)
    assert ra[1] != rb[1], "fixture strings must differ under the model"
    got = {
        r.doc_id: r.score_micro
        for r in A.hashed_linear_score(_docs(spark, [(0, a), (1, b)])).collect()
    }
    assert got == {0: ra[1], 1: rb[1]}


def test_keep_threshold(spark):
    rows = [(i, f"token{i} filler words here") for i in range(20)]
    out = A.hashed_linear_score(_docs(spark, rows), threshold_micro=0).collect()
    for r in out:
        assert r.keep == (1 if r.score_micro >= 0 else 0)
    scores = sorted(r.score_micro for r in out)
    assert scores[0] < scores[-1]  # the md5 weights actually spread
