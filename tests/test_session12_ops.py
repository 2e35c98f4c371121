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


# ------------------------------------------------------- community conductance


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _labels(spark, pairs):
    return spark.createDataFrame(pairs, "node long, label long")


def test_conductance_two_triangles_bridge(spark):
    # two sealed triangles joined by one bridge: m = 7, each side
    # vol = 7, cut = 1, denom = min(7, 14-7) = 7 -> 1000 div 7 = 142
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6),
                       (3, 4)])
    lab = _labels(spark, [(1, 10), (2, 10), (3, 10),
                          (4, 20), (5, 20), (6, 20)])
    rows = {r["label"]: r for r in
            A.community_conductance(e, lab).collect()}
    for lb in (10, 20):
        assert rows[lb]["n_nodes"] == 3
        assert rows[lb]["vol"] == 7
        assert rows[lb]["cut"] == 1
        assert rows[lb]["cond_milli"] == 142


def test_conductance_crossing_counts_both_sides(spark):
    # star: center one label, leaves another — every edge crosses, so
    # BOTH communities see cut = 3 and cond_milli = 1000 (fully leaky)
    e = _edges(spark, [(0, 1), (0, 2), (0, 3)])
    lab = _labels(spark, [(0, 1), (1, 2), (2, 2), (3, 2)])
    rows = {r["label"]: r for r in
            A.community_conductance(e, lab).collect()}
    assert rows[1]["cut"] == 3 and rows[1]["cond_milli"] == 1000
    assert rows[2]["cut"] == 3 and rows[2]["cond_milli"] == 1000


def test_conductance_whole_graph_null(spark):
    # a single community holding the whole graph has denom = 0 -> NULL
    e = _edges(spark, [(1, 2), (2, 3)])
    lab = _labels(spark, [(1, 7), (2, 7), (3, 7)])
    r = A.community_conductance(e, lab).collect()
    assert len(r) == 1 and r[0]["cond_milli"] is None


def test_conductance_unlabeled_node_raises(spark):
    e = _edges(spark, [(1, 2), (2, 3)])
    lab = _labels(spark, [(1, 7), (2, 7)])  # node 3 unlabeled
    with pytest.raises(Exception) as ei:
        A.community_conductance(e, lab).collect()
    assert "unlabeled" in str(ei.value)


def test_conductance_dedups_and_drops_self_loops(spark):
    # duplicate + reversed + self-loop edges collapse to the canonical
    # simple graph before any counting
    e = _edges(spark, [(1, 2), (2, 1), (1, 2), (1, 1), (2, 3)])
    lab = _labels(spark, [(1, 7), (2, 7), (3, 9)])
    rows = {r["label"]: r for r in
            A.community_conductance(e, lab).collect()}
    assert rows[7]["vol"] == 3 and rows[7]["cut"] == 1
    assert rows[9]["vol"] == 1 and rows[9]["cut"] == 1


# ----------------------------------------------------------- wilson quality ci


def _good_text(n_words=45, tag=""):
    # 45 distinct letter-only words (digits would trip digit_heavy):
    # passes every quality_filter rule
    def spell(s):
        return "".join(
            chr(ord("a") + int(c)) if c.isdigit() else c for c in s
        )

    return " ".join(
        f"wd{spell(tag)}{spell(f'{i:03d}')}" for i in range(n_words)
    )


def test_wilson_matches_integer_reference(spark):
    # differential vs a math.isqrt replica of the documented formula on
    # a mixed pass/fail fixture (z = 49/25; R = 2401 n^2 + 2500 n k(n-k))
    rows = []
    for i in range(12):
        good = i % 3 != 0
        rows.append((i, _good_text(tag=str(i)) if good else "x y z",
                     f"s{i % 2}"))
    out = {r["source"]: r for r in
           A.wilson_quality_ci(spark.createDataFrame(
               rows, "doc_id long, text string, source string"
           )).collect()}

    import math as _m
    for src in ("s0", "s1"):
        n = sum(1 for i in range(12) if f"s{i % 2}" == src)
        k = sum(1 for i in range(12) if f"s{i % 2}" == src and i % 3 != 0)
        s = _m.isqrt(2401 * n * n + 2500 * n * k * (n - k))
        lo = (1_000_000 * (1250 * n * k + 2401 * n - 49 * s)) // (
            2 * n * (625 * n + 2401))
        hi = (1_000_000 * (1250 * n * k + 2401 * n + 49 * s)) // (
            2 * n * (625 * n + 2401))
        r = out[src]
        assert (r["n"], r["k"]) == (n, k)
        assert r["lo_micro"] == lo and r["hi_micro"] == hi
        assert r["lo_micro"] <= r["p_micro"] <= r["hi_micro"]


def test_wilson_degenerate_endpoints(spark):
    # k = 0: s = isqrt(2401 n^2) = 49n exactly, so lo = 0 exactly;
    # k = n: the hi numerator factors as n(1250n + 4802) and the
    # denominator IS n(1250n + 4802) -> hi_micro = 1_000_000 exactly
    rows = ([(i, "x", "none") for i in range(5)]
            + [(10 + i, _good_text(tag=str(i)), "all") for i in range(5)])
    out = {r["source"]: r for r in
           A.wilson_quality_ci(spark.createDataFrame(
               rows, "doc_id long, text string, source string"
           )).collect()}
    assert out["none"]["k"] == 0 and out["none"]["lo_micro"] == 0
    assert out["none"]["hi_micro"] > 0  # upper bound must NOT collapse
    assert out["all"]["k"] == 5 and out["all"]["hi_micro"] == 1_000_000
    assert out["all"]["lo_micro"] < 1_000_000


def test_wilson_bound_guard(spark):
    rows = [(i, "x", "s") for i in range(7)]
    with pytest.raises(Exception) as ei:
        A.wilson_quality_ci(
            spark.createDataFrame(
                rows, "doc_id long, text string, source string"
            ),
            max_group=6,
        ).collect()
    assert "subsample" in str(ei.value)


def test_quality_filter_carry_rides_through(spark):
    # the carry param must not perturb the keep verdict or base schema
    rows = [(0, _good_text(), "sA"), (1, "x y", "sB")]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, source string")
    base = {r["doc_id"]: r for r in A.quality_filter(d).collect()}
    carried = {r["doc_id"]: r
               for r in A.quality_filter(d, carry=("source",)).collect()}
    for i in (0, 1):
        assert carried[i]["keep"] == base[i]["keep"]
        assert carried[i]["violations"] == base[i]["violations"]
    assert carried[0]["source"] == "sA"
    assert A.quality_filter(d).columns == [
        "doc_id", "n_words", "violations", "keep"]


# ---------------------------------------------------------------- kendall tau


def test_kendall_perfect_monotone(spark):
    rows = [(i, " ".join(f"t{j}" for j in range(i + 1)), "s")
            for i in range(6)]
    r = A.kendall_tau(_docs(spark, rows)).collect()[0]
    assert r["tau_milli"] == 1000
    assert r["d_pairs"] == 0 and r["c_pairs"] == 15  # C(6,2)


def test_kendall_perfect_inverse(spark):
    # x = (2, 3), y = (2, 1): the spearman inverse fixture
    rows = [(0, "a b", "s"), (1, "c c c", "s")]
    r = A.kendall_tau(_docs(spark, rows)).collect()[0]
    assert r["tau_milli"] == -1000


def test_kendall_constant_column_null(spark):
    rows = [(i, "a", "s") for i in range(4)]
    r = A.kendall_tau(_docs(spark, rows)).collect()[0]
    assert r["tau_milli"] is None


def test_kendall_matches_pair_replica(spark):
    # tie-heavy deterministic fixture vs a direct O(n^2) pair loop +
    # math.isqrt replica of the documented tau-b convention
    import math as _m

    texts = []
    for i in range(40):
        k = (i * 13) % 7 + 1
        v = (i * 5) % k + 1
        toks = [f"t{j % v}" for j in range(k)]
        texts.append((i, " ".join(toks), "s"))
    r = A.kendall_tau(_docs(spark, texts)).collect()[0]

    xs = [len(t.split(" ")) for _, t, _ in texts]
    ys = [len(set(t.split(" "))) for _, t, _ in texts]
    n = len(xs)
    C = D = 0
    for i in range(n):
        for j in range(i + 1, n):
            p = (xs[i] - xs[j]) * (ys[i] - ys[j])
            if p > 0:
                C += 1
            elif p < 0:
                D += 1

    def tie_sum(vals):
        from collections import Counter
        return sum(c * (c - 1) // 2 for c in Counter(vals).values())

    tx, ty = tie_sum(xs), tie_sum(ys)
    n0 = n * (n - 1) // 2
    denom = _m.isqrt((n0 - tx) * (n0 - ty))
    num = C - D
    expect = (-((1000 * -num) // denom) if num < 0
              else (1000 * num) // denom)
    assert (r["c_pairs"], r["d_pairs"], r["tx"], r["ty"]) == (C, D, tx, ty)
    assert r["tau_milli"] == expect


def test_kendall_bound_guard(spark):
    rows = [(i, "a b", "s") for i in range(6)]
    with pytest.raises(Exception) as ei:
        A.kendall_tau(_docs(spark, rows), max_rows=5).collect()
    assert "subsample" in str(ei.value)


# ------------------------------------------------------- classifier agreement


def test_agreement_matches_replica(spark):
    # assemble kappa independently from the two shipped verdict streams
    rows = []
    for i in range(30):
        if i % 5 == 0:
            rows.append((i, "x y z", "s"))           # qf drop (short)
        else:
            rows.append((i, _good_text(tag=str(i)), "s"))
    d = _docs(spark, rows)
    qk = {r["doc_id"]: r["keep"] for r in A.quality_filter(d).collect()}
    hk = {r["doc_id"]: r["keep"]
          for r in A.hashed_linear_score(d).collect()}
    n = len(hk)
    a = sum(qk[i] for i in hk)
    b = sum(hk.values())
    agree = sum(1 for i in hk if qk[i] == hk[i])
    pe = a * b + (n - a) * (n - b)
    knum, kden = n * agree - pe, n * n - pe
    expect = (None if kden <= 0
              else (-((1000 * -knum) // kden) if knum < 0
                    else (1000 * knum) // kden))
    r = A.classifier_agreement(d).collect()[0]
    assert (r["n_scored"], r["qf_pos"], r["hls_pos"], r["agree"]) == (
        n, a, b, agree)
    assert r["kappa_milli"] == expect


def test_agreement_counts_unscored_docs(spark):
    # '!!! ???' normalizes to empty -> no model score -> n_excluded
    rows = [(0, _good_text(), "s"), (1, "!!! ???", "s"),
            (2, "x y", "s")]
    r = A.classifier_agreement(_docs(spark, rows)).collect()[0]
    assert r["n_scored"] == 2 and r["n_excluded"] == 1


def test_agreement_degenerate_null(spark):
    # identical docs: both raters constant -> pe = 1 -> kappa NULL
    rows = [(i, "x y z", "s") for i in range(4)]
    r = A.classifier_agreement(_docs(spark, rows)).collect()[0]
    assert r["kappa_milli"] is None


def test_agreement_bound_guard(spark):
    rows = [(i, "x y", "s") for i in range(4)]
    with pytest.raises(Exception) as ei:
        A.classifier_agreement(_docs(spark, rows), max_docs=3).collect()
    assert "subsample" in str(ei.value)


# --------------------------------------------------------------- PR curve


def test_pr_curve_matches_replica(spark):
    rows = []
    for i in range(24):
        if i % 4 == 0:
            rows.append((i, "x y z", "s"))
        else:
            rows.append((i, _good_text(tag=str(i)), "s"))
    d = _docs(spark, rows)
    qk = {r["doc_id"]: r["keep"] for r in A.quality_filter(d).collect()}
    sc = {r["doc_id"]: r["score_micro"]
          for r in A.hashed_linear_score(d).collect()}
    ths = (-100, 0, 100)
    out = {r["threshold_micro"]: r
           for r in A.score_pr_curve(d, thresholds=ths).collect()}
    assert set(out) == set(ths)
    for t in ths:
        tp = sum(1 for i in sc if sc[i] >= t and qk[i] == 1)
        fp = sum(1 for i in sc if sc[i] >= t and qk[i] == 0)
        fn = sum(1 for i in sc if sc[i] < t and qk[i] == 1)
        r = out[t]
        assert (r["tp"], r["fp"], r["fn"]) == (tp, fp, fn)
        if tp + fp:
            assert r["precision_milli"] == (1000 * tp) // (tp + fp)
        else:
            assert r["precision_milli"] is None
        if tp + fn:
            assert r["recall_milli"] == (1000 * tp) // (tp + fn)
        else:
            assert r["recall_milli"] is None


def test_pr_curve_extreme_thresholds(spark):
    rows = [(i, _good_text(tag=str(i)), "s") for i in range(8)]
    out = {r["threshold_micro"]: r
           for r in A.score_pr_curve(
               _docs(spark, rows),
               thresholds=(-2000, 2000)).collect()}
    lo, hi = out[-2000], out[2000]
    # every score is in (-1000, 1000): predict-all at -2000 ->
    # recall 1000, fn 0; predict-none at 2000 -> precision NULL
    assert lo["fn"] == 0 and lo["recall_milli"] == 1000
    assert hi["tp"] == 0 and hi["fp"] == 0
    assert hi["precision_milli"] is None and hi["recall_milli"] == 0
    # predicted-positive count is monotone non-increasing in threshold
    assert lo["pred_pos"] >= hi["pred_pos"]


# --------------------------------------------------------------- mad outliers


def test_mad_hand_computed_even_group(spark):
    # x = [1,2,3,4]: med2 = 2+3 = 5; dev2 = [3,1,1,3] -> mad4 = 1+3 = 4;
    # no dev passes 2*d > 3*4
    rows = [(i, _ntok(i + 1), "s") for i in range(4)]
    r = A.mad_outliers(_docs(spark, rows)).collect()[0]
    assert (r["n"], r["med2"], r["mad4"], r["n_outliers"]) == (4, 5, 4, 0)
    assert r["outlier_milli"] == 0


def test_mad_zero_mad_flags_any_deviation(spark):
    # [5,5,5,5,100]: med2 = 10, over half identical -> mad4 = 0, the
    # single extreme (dev2 = 190) flags
    rows = [(i, _ntok(5), "s") for i in range(4)] + [(9, _ntok(100), "s")]
    r = A.mad_outliers(_docs(spark, rows)).collect()[0]
    assert (r["med2"], r["mad4"], r["n_outliers"]) == (10, 0, 1)
    assert r["outlier_milli"] == 200


def test_mad_groups_are_isolated(spark):
    rows = ([(i, _ntok(3), "a") for i in range(5)]
            + [(10 + i, _ntok(50 + i * 10), "b") for i in range(5)])
    out = {r["source"]: r for r in
           A.mad_outliers(_docs(spark, rows)).collect()}
    assert out["a"]["med2"] == 6      # all 3 -> med 3
    assert out["b"]["med2"] == 140    # [50,60,70,80,90] -> med 70
    assert out["a"]["mad4"] == 0
    # dev2 = [40,20,0,20,40], sorted [0,20,20,40,40]: both middle
    # positions (n odd) hit rank 3 -> mad4 = 20 + 20
    assert out["b"]["mad4"] == 40


def test_mad_k_param(spark):
    # k_mads = 0: any nonzero deviation flags
    rows = [(0, _ntok(3), "s"), (1, _ntok(3), "s"), (2, _ntok(4), "s")]
    r = A.mad_outliers(_docs(spark, rows), k_mads=0).collect()[0]
    assert r["n_outliers"] == 1


# ------------------------------------------------------------------ heaps fit


def test_heaps_matches_python_replica(spark):
    import math as _m

    # deterministic varied corpus: doc i has 3 + i%7 words drawn from a
    # rotating vocabulary so trigram vocab keeps growing
    rows = []
    for i in range(60):
        k = 3 + i % 7
        toks = [f"w{(i * 11 + j * 5) % 37}" for j in range(k)]
        rows.append((i, " ".join(toks), "s"))
    cutoffs = (8, 16, 32, 60)
    r = A.heaps_fit(_docs(spark, rows), cutoffs=cutoffs).collect()[0]

    # python replica of the gram stream + growth curve + OLS
    def grams(text):
        ws = text.split(" ")
        return [" ".join(ws[j:j + 3]) for j in range(len(ws) - 2)]

    pts = []
    for c in cutoffs:
        seen, tokens = set(), 0
        for i, t, _src in rows:
            if i < c:
                gs = grams(t)
                tokens += len(gs)
                seen.update(gs)
        if tokens > 0 and len(seen) > 0:
            pts.append((_m.floor(_m.log(float(tokens)) * 10000),
                        _m.floor(_m.log(float(len(seen))) * 10000)))
    n = len(pts)
    sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts); sxx = sum(x * x for x, _ in pts)
    num = n * sxy - sx * sy
    den = max((n * sxx - sx * sx) // 1000, 1)
    sabs = (abs(num) * 1000) // den
    slope = -sabs if num < 0 else sabs
    B = 2 ** 40
    inner = sy * 100 + ((sabs * sx * 100) // 1000000 if num < 0
                        else -((sabs * sx * 100) // 1000000))
    intercept = (inner + B * n) // n - B
    assert r["n_pts"] == n
    assert r["slope_micro"] == slope
    assert r["intercept_micro"] == intercept
    assert 0 < r["slope_micro"] <= 1_000_000  # a real Heaps exponent


def test_heaps_unigram_saturation_is_flat(spark):
    # a 3-type unigram vocabulary saturates immediately: slope 0
    rows = [(i, " ".join("abc"[j % 3] * 2 for j in range(5)), "s")
            for i in range(40)]
    r = A.heaps_fit(_docs(spark, rows), cutoffs=(5, 10, 20, 40),
                    gram_n=1).collect()[0]
    assert r["slope_micro"] == 0


# --------------------------------------------------------------- trend tests


import datetime as _dt

from contentextractor_spark.functions import events as E


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string"
    )


def _day_counts_events(spark, counts, etype="click", month=1):
    rows, eid = [], 0
    for d, c in enumerate(counts):
        for _ in range(c):
            eid += 1
            rows.append((eid, _dt.datetime(2024, month, d + 1, 10, 0),
                         1, etype, 0.0, ""))
    return _ev(spark, rows)


def test_mk_strict_uptrend_rejects(spark):
    # counts 1..10 strictly increasing: S = C(10,2) = 45, no ties ->
    # var_num = 10*9*25 = 2250; 11250*44^2 >> 2401*2250 -> reject
    ev = _day_counts_events(spark, list(range(1, 11)))
    r = E.mann_kendall_trend(ev).collect()[0]
    assert (r["n_days"], r["s_stat"], r["var_num"]) == (10, 45, 2250)
    assert r["reject_95"] == 1


def test_mk_constant_series_null(spark):
    # all days tied: S = 0 AND var_num = 0 -> verdict NULL
    ev = _day_counts_events(spark, [3] * 8)
    r = E.mann_kendall_trend(ev).collect()[0]
    assert r["s_stat"] == 0 and r["var_num"] == 0
    assert r["reject_95"] is None


def test_mk_matches_python_replica(spark):
    counts = [((i * 7) % 5) + 1 for i in range(20)]
    ev = _day_counts_events(spark, counts)
    r = E.mann_kendall_trend(ev).collect()[0]

    n = len(counts)
    S = sum(
        (1 if counts[j] > counts[i] else -1 if counts[j] < counts[i]
         else 0)
        for i in range(n) for j in range(i + 1, n)
    )
    from collections import Counter
    tie = sum(t * (t - 1) * (2 * t + 5)
              for t in Counter(counts).values())
    var_num = n * (n - 1) * (2 * n + 5) - tie
    expect = int(abs(S) > 0
                 and 11250 * (abs(S) - 1) ** 2 > 2401 * var_num)
    assert (r["s_stat"], r["var_num"], r["reject_95"]) == (
        S, var_num, expect)


def test_mk_types_are_isolated(spark):
    up = _day_counts_events(spark, list(range(1, 11)), etype="up")
    flat = _day_counts_events(spark, [2] * 10, etype="flat")
    out = {r["event_type"]: r
           for r in E.mann_kendall_trend(up.union(flat)).collect()}
    assert out["up"]["reject_95"] == 1
    assert out["flat"]["reject_95"] is None


def test_mk_bound_guard(spark):
    ev = _day_counts_events(spark, [1, 2, 3, 4])
    with pytest.raises(Exception) as ei:
        E.mann_kendall_trend(ev, max_days=3).collect()
    assert "subsample" in str(ei.value)


def test_theil_sen_exact_line(spark):
    # counts 2,5,8,11 (slope exactly 3/day): every pair slope 3000
    ev = _day_counts_events(spark, [2, 5, 8, 11])
    r = E.theil_sen_slope(ev).collect()[0]
    assert (r["n_days"], r["n_pairs"]) == (4, 6)
    assert r["slope_med2_milli"] == 6000


def test_theil_sen_outlier_immune(spark):
    # a line with one spike: the median pairwise slope stays near the
    # line's slope while an OLS slope would be dragged
    ev = _day_counts_events(spark, [2, 4, 6, 100, 10, 12, 14])
    r = E.theil_sen_slope(ev).collect()[0]
    assert abs(r["slope_med2_milli"] - 4000) <= 1400  # ~2/day


def test_theil_sen_matches_python_replica(spark):
    counts = [((i * 11) % 7) + 1 for i in range(15)]
    ev = _day_counts_events(spark, counts)
    r = E.theil_sen_slope(ev).collect()[0]

    slopes = []
    for i in range(len(counts)):
        for j in range(i + 1, len(counts)):
            dc, dd = counts[j] - counts[i], j - i
            slopes.append(-((1000 * -dc) // dd) if dc < 0
                          else (1000 * dc) // dd)
    slopes.sort()
    m = len(slopes)
    med2 = slopes[(m + 1) // 2 - 1] + slopes[(m + 2) // 2 - 1]
    assert r["n_pairs"] == m
    assert r["slope_med2_milli"] == med2


def test_theil_sen_single_day_type_absent(spark):
    one = _day_counts_events(spark, [5], etype="solo")
    multi = _day_counts_events(spark, [1, 2, 3], etype="multi")
    out = {r["event_type"]: r
           for r in E.theil_sen_slope(one.union(multi)).collect()}
    assert "solo" not in out and "multi" in out


# ------------------------------------------------------------------ jsd drift


def test_jsd_identical_halves_exact_zero(spark):
    # identical distributions make every cross-ratio EXACTLY 1
    # (a*B = b*A), so every floor is 0 and jsd_micro is 0 exactly
    rows = [(i, "x x y z", "s") for i in range(8)]
    r = A.jsd_drift(_docs(spark, rows)).collect()[0]
    assert (r["s1"], r["s2"], r["jsd_micro"]) == (0, 0, 0)


def test_jsd_disjoint_vocab_ln2(spark):
    # disjoint vocabularies: every ratio is exactly 2 -> per-term floor
    # 693147; the two truncating halves lose 1 micro between them
    rows = [(i, "aa bb" if i % 2 == 0 else "cc dd", "s")
            for i in range(10)]
    r = A.jsd_drift(_docs(spark, rows)).collect()[0]
    assert r["jsd_micro"] == 693146


def test_jsd_empty_side_null(spark):
    rows = [(2 * i, "x y", "s") for i in range(4)]  # even ids only
    r = A.jsd_drift(_docs(spark, rows)).collect()[0]
    assert r["b_total"] == 0 and r["jsd_micro"] is None


def test_jsd_matches_python_replica(spark):
    import math as _m

    rows = []
    for i in range(30):
        toks = [f"t{(i * 7 + j * 3) % 11}" for j in range(3 + i % 4)]
        rows.append((i, " ".join(toks), "s"))
    r = A.jsd_drift(_docs(spark, rows)).collect()[0]

    from collections import Counter
    ca, cb = Counter(), Counter()
    for i, t, _src in rows:
        (ca if i % 2 == 0 else cb).update(t.split(" "))
    A_, B_ = sum(ca.values()), sum(cb.values())
    terms = set(ca) | set(cb)
    s1 = sum(
        ca[t] * _m.floor(_m.log(
            (2 * ca[t] * B_) / (ca[t] * B_ + cb[t] * A_)) * 1e6)
        for t in terms if ca[t] > 0)
    s2 = sum(
        cb[t] * _m.floor(_m.log(
            (2 * cb[t] * A_) / (ca[t] * B_ + cb[t] * A_)) * 1e6)
        for t in terms if cb[t] > 0)

    def sgn_div(num, den):
        return -((-num) // den) if num < 0 else num // den

    expect = sgn_div(s1, 2 * A_) + sgn_div(s2, 2 * B_)
    assert (r["n_terms"], r["a_total"], r["b_total"]) == (
        len(terms), A_, B_)
    assert (r["s1"], r["s2"], r["jsd_micro"]) == (s1, s2, expect)
    assert 0 <= r["jsd_micro"] <= 693147


def test_jsd_bound_guard(spark):
    rows = [(i, "x y z w", "s") for i in range(4)]
    with pytest.raises(Exception) as ei:
        A.jsd_drift(_docs(spark, rows), max_side=5).collect()
    assert "subsample" in str(ei.value)
