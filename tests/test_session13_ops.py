"""Session-13 operators: ROC-AUC doubled-midrank exactness (Python
replica differential, degenerate-label NULLs, bound guard) and the
score_reliability band card (clamping, per-band math, lift identity)."""

import pytest

from contentextractor_spark.functions import analysis as A


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )


def _good_text(n_words=45, tag=""):
    # 45 distinct letter-only words: passes every quality_filter rule
    def spell(s):
        return "".join(
            chr(ord("a") + int(c)) if c.isdigit() else c for c in s
        )

    return " ".join(
        f"wd{spell(tag)}{spell(f'{i:03d}')}" for i in range(n_words)
    )


def _mixed_rows(n=40):
    # ~2/3 pass quality_filter, 1/3 fail ("x y z" trips min length)
    return [
        (i, _good_text(tag=str(i)) if i % 3 != 0 else "x y z", "s0")
        for i in range(n)
    ]


def _python_auc(pairs):
    # exact doubled-midrank AUC replica over (score, label) pairs
    from collections import Counter

    hist = Counter()
    for s, y in pairs:
        hist[s] += 1
    n_pos = sum(1 for _, y in pairs if y == 1)
    n_neg = len(pairs) - n_pos
    pos_by_score = Counter(s for s, y in pairs if y == 1)
    prev = 0
    r1_x2 = 0
    for s in sorted(hist):
        t = hist[s]
        rank2 = 2 * prev + t + 1
        r1_x2 += pos_by_score.get(s, 0) * rank2
        prev += t
    u1_x2 = r1_x2 - n_pos * (n_pos + 1)
    if n_pos == 0 or n_neg == 0:
        return n_pos, n_neg, u1_x2, None
    return n_pos, n_neg, u1_x2, (1000 * u1_x2) // (2 * n_pos * n_neg)


# ---------------------------------------------------------------- roc_auc


def test_roc_auc_matches_python_replica(spark):
    d = _docs(spark, _mixed_rows(40))
    row = A.roc_auc(d).collect()[0]

    # rebuild (score, label) pairs from the shipped components
    qf = {
        r["doc_id"]: r["keep"] for r in A.quality_filter(d).collect()
    }
    hls = {
        r["doc_id"]: r["score_micro"]
        for r in A.hashed_linear_score(d).collect()
    }
    pairs = [(hls[i], qf[i]) for i in qf if i in hls]
    n_pos, n_neg, u1_x2, auc = _python_auc(pairs)

    assert row["n_scored"] == len(pairs)
    assert (row["n_pos"], row["n_neg"]) == (n_pos, n_neg)
    assert row["u1_x2"] == u1_x2
    assert row["auc_milli"] == auc
    assert 0 <= row["auc_milli"] <= 1000


def test_roc_auc_degenerate_labels_null(spark):
    # all docs fail quality_filter -> n_pos = 0 -> NULL, never 500
    d = _docs(spark, [(i, "x y z", "s") for i in range(6)])
    row = A.roc_auc(d).collect()[0]
    assert row["n_pos"] == 0
    assert row["auc_milli"] is None

    # all docs pass -> n_neg = 0 -> NULL
    d2 = _docs(
        spark, [(i, _good_text(tag=str(i)), "s") for i in range(6)]
    )
    row2 = A.roc_auc(d2).collect()[0]
    assert row2["n_neg"] == 0
    assert row2["auc_milli"] is None


def test_roc_auc_bound_guard(spark):
    d = _docs(spark, _mixed_rows(9))
    with pytest.raises(Exception) as ei:
        A.roc_auc(d, max_docs=8).collect()
    assert "subsample" in str(ei.value)


# ------------------------------------------------------- score_reliability


def test_score_reliability_matches_python_replica(spark):
    d = _docs(spark, _mixed_rows(40))
    rows = {r["band"]: r for r in A.score_reliability(d).collect()}

    qf = {
        r["doc_id"]: r["keep"] for r in A.quality_filter(d).collect()
    }
    hls = {
        r["doc_id"]: r["score_micro"]
        for r in A.hashed_linear_score(d).collect()
    }
    from collections import defaultdict

    per = defaultdict(lambda: [0, 0])
    for i, s in hls.items():
        band = (max(-250, min(249, s)) + 250) // 50
        per[band][0] += 1
        per[band][1] += qf[i]
    n_total = sum(v[0] for v in per.values())
    pos_total = sum(v[1] for v in per.values())

    assert set(rows) == set(per)
    for band, (n, pos) in per.items():
        r = rows[band]
        assert (r["n"], r["pos"]) == (n, pos)
        assert r["lo_micro"] == -250 + band * 50
        assert r["hi_micro"] == r["lo_micro"] + 50
        assert r["obs_milli"] == (1000 * pos) // n
        expect_lift = (
            None
            if pos_total == 0
            else (1000 * pos * n_total) // (n * pos_total)
        )
        assert r["lift_milli"] == expect_lift


def test_score_reliability_no_positives_null_lift(spark):
    d = _docs(spark, [(i, "x y z", "s") for i in range(6)])
    for r in A.score_reliability(d).collect():
        assert r["pos"] == 0 and r["obs_milli"] == 0
        assert r["lift_milli"] is None


def test_score_reliability_bands_divide_range():
    with pytest.raises(ValueError):
        A.score_reliability(None, lo=0, hi=100, n_bands=7)
