"""Exact set-similarity join (AllPairs/PPJoin prefix filter): zero false
negatives vs brute force, integer threshold semantics, the prefix-df cap +
its loud overflow companion."""

import random

import pytest

from contentextractor_spark.functions import analysis as A


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


@pytest.fixture(scope="module")
def planted(spark):
    return _docs(
        spark,
        [
            (0, " ".join(f"t{j}" for j in range(20))),
            (1, " ".join(f"t{j}" for j in range(1, 21))),   # inter 19 / union 21
            (2, " ".join(f"x{j}" for j in range(20))),       # disjoint
            (3, " ".join(f"y{j}" for j in range(20))),
            (4, " ".join(f"y{j}" for j in range(20))),       # identical to 3
            (5, " ".join(f"y{j}" for j in range(10))
                + " " + " ".join(f"z{j}" for j in range(10))),  # J=1/3 vs 3
        ],
    )


def test_planted_pairs_exact(planted):
    got = {
        (r.doc_a, r.doc_b): (r.intersection, r.union_sz)
        for r in A.jaccard_prefix_pairs(planted, (3, 5)).collect()
    }
    assert got == {(0, 1): (19, 21), (3, 4): (20, 20)}


def test_brute_force_parity(spark):
    # dense-overlap corpus: the prefix filter must lose NOTHING vs the
    # all-pairs truth, at a permissive and a strict threshold
    rnd = random.Random(7)
    rows = [
        (i, " ".join(sorted({f"w{rnd.randrange(30)}" for _ in range(25)})))
        for i in range(80)
    ]
    docs = _docs(spark, rows)
    data = {i: set(t.split()) for i, t in rows}
    for num, den in [(3, 10), (1, 2)]:
        got = {
            (r.doc_a, r.doc_b): (r.intersection, r.union_sz)
            for r in A.jaccard_prefix_pairs(docs, (num, den)).collect()
        }
        want = {}
        for a in data:
            for b in data:
                if a < b:
                    i = len(data[a] & data[b])
                    u = len(data[a] | data[b])
                    if den * i >= num * u:
                        want[(a, b)] = (i, u)
        assert got == want
        assert want  # non-vacuous: the fixture must actually produce pairs


def test_prefix_df_cap_discloses_loss(spark):
    # every doc shares the SAME rare-ish prefix token universe, so a tiny
    # cap drops prefix tokens; the overflow companion must list them and
    # the capped output must be a subset of the uncapped truth
    rows = [
        (i, " ".join(f"c{j}" for j in range(15)) + f" u{i} v{i}")
        for i in range(12)
    ]
    docs = _docs(spark, rows)
    full = {(r.doc_a, r.doc_b) for r in A.jaccard_prefix_pairs(docs, (1, 2)).collect()}
    capped = {
        (r.doc_a, r.doc_b)
        for r in A.jaccard_prefix_pairs(docs, (1, 2), max_prefix_df=3).collect()
    }
    overflow = {r.tok for r in A.jaccard_prefix_overflow(docs, (1, 2), 3).collect()}
    assert capped <= full
    assert overflow  # shared tokens exceed df=3 and sit in prefixes
    assert full  # the shared-15-token docs are genuine near-dups (J=15/19)
    # the cap really dropped something here (all prefix tokens are shared)
    assert capped != full


def test_threshold_validation(planted):
    with pytest.raises(ValueError, match="rational"):
        A.jaccard_prefix_pairs(planted, (0, 5))
    with pytest.raises(ValueError, match="rational"):
        A.jaccard_prefix_pairs(planted, (6, 5))
