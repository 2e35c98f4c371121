"""Session-12 operators: Mann-Whitney U hand-rank exactness (ties via
doubled midranks, tie-corrected verdict) and Spearman rho monotone /
inverse / constant-column behavior + a float-definition differential."""

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from contentextractor_spark.functions import analysis as A


def _docs(spark, rows):
    # (doc_id, text, source) triples
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )


def _ntok(k, word="w"):
    return " ".join(word for _ in range(k))


# ---------------------------------------------------------------- mann-whitney


def test_mwu_complete_separation(spark):
    # A = lengths {1,2,3}, B = {4,5,6}: every B above every A, so
    # U1 = 0, auc = 0; by hand LHS = 1875*6*5*81 = 4,556,250 vs
    # RHS = 2401*9*210 = 4,537,890 -> reject_95 = 1 (just barely,
    # which is the point of pinning the exact integers)
    rows = [(i, _ntok(i + 1), "a" if i < 3 else "b") for i in range(6)]
    r = A.mann_whitney_u(
        _docs(spark, rows), group_col="source", group_a="a", group_b="b"
    ).collect()[0]
    assert (r["n1"], r["n2"]) == (3, 3)
    assert r["u1_x2"] == 0
    assert r["auc_milli"] == 0
    assert r["reject_95"] == 1


def test_mwu_tied_midranks(spark):
    # A = [1,1], B = [1,2] token lengths: the three tied 1s share
    # midrank 2 (rank2 = 4), the 2 gets rank 4 (rank2 = 8);
    # U1 = #(a>b) + 0.5*#(a=b) = 1 exactly -> u1_x2 = 2
    rows = [
        (0, "x", "a"),
        (1, "x", "a"),
        (2, "x", "b"),
        (3, "x y", "b"),
    ]
    r = A.mann_whitney_u(
        _docs(spark, rows), group_col="source", group_a="a", group_b="b"
    ).collect()[0]
    assert r["u1_x2"] == 2
    assert r["auc_milli"] == 250  # 2*1000 div (2*2*2)
    assert r["reject_95"] == 0


def test_mwu_symmetry(spark):
    # swapping the groups mirrors U: u1_x2(a,b) + u1_x2(b,a) = 2*n1*n2
    rows = [(i, _ntok((i * 7) % 5 + 1), "a" if i % 2 else "b")
            for i in range(20)]
    d = _docs(spark, rows)
    ab = A.mann_whitney_u(d, group_a="a", group_b="b",
                          group_col="source").collect()[0]
    ba = A.mann_whitney_u(d, group_a="b", group_b="a",
                          group_col="source").collect()[0]
    assert ab["u1_x2"] + ba["u1_x2"] == 2 * ab["n1"] * ab["n2"]
    assert ab["reject_95"] == ba["reject_95"]


def test_mwu_bound_guard(spark):
    # n1 + n2 > 650 must refuse loudly, not overflow silently
    rows = [(i, "w", "a" if i % 2 else "b") for i in range(651)]
    with pytest.raises(Exception) as ei:
        A.mann_whitney_u(
            _docs(spark, rows), group_col="source",
            group_a="a", group_b="b",
        ).collect()
    assert "subsample" in str(ei.value)


# ---------------------------------------------------------------- spearman


def test_spearman_perfect_monotone(spark):
    rows = [(i, " ".join(f"t{j}" for j in range(i + 1)), "s")
            for i in range(5)]
    r = A.spearman_corr(_docs(spark, rows)).collect()[0]
    assert r["rho_milli"] == 1000


def test_spearman_perfect_inverse(spark):
    # x = (2, 3), y = (2, 1): longer doc, smaller vocabulary
    rows = [(0, "a b", "s"), (1, "c c c", "s")]
    r = A.spearman_corr(_docs(spark, rows)).collect()[0]
    assert r["rho_milli"] == -1000


def test_spearman_constant_column_null(spark):
    rows = [(i, "a", "s") for i in range(4)]
    r = A.spearman_corr(_docs(spark, rows)).collect()[0]
    assert r["rho_milli"] is None


def test_spearman_matches_float_definition(spark):
    # differential vs a direct float Pearson-on-midranks on a tie-heavy
    # deterministic fixture; truncating div -> within 1 milli
    texts = []
    for i in range(40):
        k = (i * 13) % 7 + 1
        v = (i * 5) % k + 1
        toks = [f"t{j % v}" for j in range(k)]
        texts.append((i, " ".join(toks), "s"))
    r = A.spearman_corr(_docs(spark, texts)).collect()[0]

    xs = [len(t.split(" ")) for _, t, _ in texts]
    ys = [len(set(t.split(" "))) for _, t, _ in texts]

    def midranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        out = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while (j + 1 < len(order)
                   and vals[order[j + 1]] == vals[order[i]]):
                j += 1
            mr = (i + j) / 2 + 1
            for k2 in range(i, j + 1):
                out[order[k2]] = mr
            i = j + 1
        return out

    rx, ry = midranks(xs), midranks(ys)
    n = len(xs)
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = math.sqrt(sum((a - mx) ** 2 for a in rx)
                    * sum((b - my) ** 2 for b in ry))
    rho = num / den
    assert abs(r["rho_milli"] - rho * 1000) <= 1.0


def test_spearman_bound_guard(spark):
    rows = [(i, "a b", "s") for i in range(6)]
    with pytest.raises(Exception) as ei:
        A.spearman_corr(_docs(spark, rows), max_rows=5).collect()
    assert "subsample" in str(ei.value)
