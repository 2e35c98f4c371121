"""Session-10 operators: modularity exactness on a hand graph +
unlabeled-node refusal; RAKE scoring on a hand corpus + the max_len
candidate cap's effect on word statistics."""

import pytest
from pyspark.sql import functions as F

from contentextractor_spark.functions import analysis as A


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _labels(spark, pairs):
    return spark.createDataFrame(pairs, "node long, label long")


def test_modularity_two_triangles_bridge(spark):
    # two triangles {0,1,2} and {3,4,5} joined by the bridge 2-3:
    # m=7; each community has e_c=3 intra edges and degree sum 7
    # (2+2+3), so q_num = 4*7*3 - 49 = 35 per community and
    # Q = 70/196 ~ 0.357
    pairs = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)]
    labels = [(0, 0), (1, 0), (2, 0), (3, 3), (4, 3), (5, 3)]
    out = {
        r["label"]: r
        for r in A.modularity(
            _edges(spark, pairs), _labels(spark, labels)
        ).collect()
    }
    assert set(out) == {0, 3}
    for lbl in (0, 3):
        r = out[lbl]
        assert r["n_nodes"] == 3
        assert r["intra_edges"] == 3
        assert r["deg_sum"] == 7
        assert r["m_edges"] == 7
        assert r["q_num"] == 35


def test_modularity_single_community_is_zero(spark):
    # everything in one community: e_c = m and d_c = 2m, so
    # q_num = 4m^2 - 4m^2 = 0 exactly — the classic Q(trivial) = 0
    pairs = [(0, 1), (1, 2), (2, 0)]
    labels = [(0, 9), (1, 9), (2, 9)]
    rows = A.modularity(
        _edges(spark, pairs), _labels(spark, labels)
    ).collect()
    assert len(rows) == 1
    assert rows[0]["q_num"] == 0


def test_modularity_split_community_negative(spark):
    # a community holding NO intra edge contributes negatively
    pairs = [(0, 1), (1, 2), (2, 0)]
    labels = [(0, 0), (1, 1), (2, 2)]
    rows = A.modularity(
        _edges(spark, pairs), _labels(spark, labels)
    ).collect()
    # m=3; each singleton has e_c=0, d_c=2 -> q_num = 0 - 4 = -4
    assert sorted(r["q_num"] for r in rows) == [-4, -4, -4]


def test_modularity_unlabeled_node_raises(spark):
    pairs = [(0, 1), (1, 2)]
    labels = [(0, 0), (1, 0)]  # node 2 unlabeled
    with pytest.raises(Exception, match="unlabeled graph node"):
        A.modularity(_edges(spark, pairs), _labels(spark, labels)).collect()


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_rake_hand_corpus(spark):
    # runs: [red apple] [green apple juice] [red]
    # freq: red 2, apple 2, green 1, juice 1
    # deg:  red 2+1=3, apple 2+3=5, green 3, juice 3
    # wscore_milli: red 1500, apple 2500, green 3000, juice 3000
    # phrases: 'green apple juice' 8500, 'red apple' 4000, 'red' 1500
    docs = _docs(spark, ["red apple the green apple juice a red"])
    rows = A.rake_keywords(docs, k=10).collect()
    got = {r["phrase"]: r for r in rows}
    assert got["green apple juice"]["score_milli"] == 8500
    assert got["red apple"]["score_milli"] == 4000
    assert got["red"]["score_milli"] == 1500
    assert got["green apple juice"]["rk"] == 1
    assert got["red apple"]["rk"] == 2
    assert got["red apple"]["n_words"] == 2
    assert got["red"]["n_occurrences"] == 1


def test_rake_max_len_drops_run_and_its_word_mass(spark):
    # one 3-token run + one 1-token run of the same word: with
    # max_len=2 the long run is not a candidate AND its occurrences
    # leave the word stats — 'x' keeps freq=1, deg=1, score 1000
    docs = _docs(spark, ["x y z the x"])
    rows = A.rake_keywords(docs, k=10, max_len=2).collect()
    assert [r["phrase"] for r in rows] == ["x"]
    assert rows[0]["score_milli"] == 1000


def test_rake_phrase_type_merges_occurrences(spark):
    # the same phrase in two docs is ONE type with n_occurrences=2
    docs = _docs(spark, ["big data the", "big data a small"])
    rows = A.rake_keywords(docs, k=10).collect()
    got = {r["phrase"]: r for r in rows}
    assert got["big data"]["n_occurrences"] == 2
    # word scores: big freq2 deg4 -> 2000; data freq2 deg4 -> 2000;
    # small freq1 deg1 -> 1000
    assert got["big data"]["score_milli"] == 4000
    assert got["small"]["score_milli"] == 1000


def test_wildcard_search_semantics(spark):
    docs = _docs(spark, ["sort scan query filter", "column vector sort"])
    out = A.wildcard_search(
        docs, patterns=("s*", "*r", "qu*y", "zz*q", "*")
    ).collect()
    got = sorted((r["pattern"], r["term"]) for r in out)
    assert ("s*", "sort") in got and ("s*", "scan") in got
    assert ("*r", "filter") in got and ("*r", "vector") in got
    assert ("qu*y", "query") in got
    assert all(p != "zz*q" for p, _ in got)  # no-match pattern
    # bare '*' matches every term exactly once
    star = [t for p, t in got if p == "*"]
    assert sorted(star) == sorted(set(star))
    assert len(star) == 6  # vocabulary size
    # df is a DOCUMENT count: sort appears in both docs
    df = {r["term"]: r["df"] for r in out if r["pattern"] == "*"}
    assert df["sort"] == 2 and df["query"] == 1


def test_wildcard_search_rejects_multi_star(spark):
    docs = _docs(spark, ["a b"])
    with pytest.raises(ValueError, match="exactly one"):
        A.wildcard_search(docs, patterns=("a*b*c",))


def _src_docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, s) for i, (t, s) in enumerate(rows)],
        "doc_id long, text string, source string",
    )


def test_ks_identical_samples_zero(spark):
    rows = [("a b c", "A"), ("a b c", "B"), ("a", "A"), ("a", "B")]
    r = A.ks_two_sample(
        _src_docs(spark, rows), group_a="A", group_b="B"
    ).collect()[0]
    assert (r["n1"], r["n2"], r["d_num"], r["reject_95"]) == (2, 2, 0, 0)


def test_ks_planted_shift_rejects(spark):
    # group A: 40 docs of 2 tokens; group B: 40 docs of 5 tokens —
    # fully separated CDFs, D = 1, must reject at 95%
    rows = [("a b", "A") for _ in range(40)] + [
        ("a b c d e", "B") for _ in range(40)
    ]
    r = A.ks_two_sample(
        _src_docs(spark, rows), group_a="A", group_b="B"
    ).collect()[0]
    assert r["d_num"] == 40 * 40  # D = 1 exactly
    assert r["d_milli"] == 1000
    assert r["reject_95"] == 1


def test_ks_hand_value(spark):
    # A lengths {1,2,3}, B lengths {2,3,4}: at x=1 diff |3*1-3*0|=3,
    # x=2 |3*2-3*1|=3, x=3 |9-6|=3, x=4 0 -> d_num=3, D=1/3
    rows = [("a", "A"), ("a b", "A"), ("a b c", "A"),
            ("a b", "B"), ("a b c", "B"), ("a b c d", "B")]
    r = A.ks_two_sample(
        _src_docs(spark, rows), group_a="A", group_b="B"
    ).collect()[0]
    assert r["d_num"] == 3
    assert r["d_milli"] == 333
    assert r["reject_95"] == 0


def test_ams_f2_single_type_exact(spark):
    # one type with count N: every estimator is (+-N)^2 = N^2, so the
    # mean equals the exact F2 regardless of signs
    docs = _docs(spark, ["a a a a a"])
    r = A.ams_f2(docs, k=4).collect()[0]
    assert (r["n_tokens"], r["n_types"], r["f2_exact"]) == (5, 1, 25)
    assert r["est_f2"] == 25
    assert r["ratio_milli"] == 1000


def test_ams_f2_python_replica(spark):
    # exact parity with a hashlib replica of the sign rule
    import hashlib

    texts = ["x y x z", "y y w"]
    counts = {}
    for t in texts:
        for tok in t.split(" "):
            counts[tok] = counts.get(tok, 0) + 1
    k = 8
    xs = []
    for j in range(k):
        s = 0
        for tok, c in counts.items():
            h = hashlib.md5(f"{j}:{tok}".encode()).hexdigest()
            s += c if h[0] < "8" else -c
        xs.append(s * s)
    want_est = sum(xs) // k
    f2 = sum(c * c for c in counts.values())
    r = A.ams_f2(_docs(spark, texts), k=k).collect()[0]
    assert r["f2_exact"] == f2
    assert r["est_f2"] == want_est
    assert r["ratio_milli"] == want_est * 1000 // f2


def test_kwic_windows_and_boundaries(spark):
    docs = _docs(spark, ["query b c d query", "e query f"])
    rows = A.kwic_concordance(docs, term="query", window=2).collect()
    got = {(r["doc_id"], r["pos"]): (r["left_ctx"], r["right_ctx"])
           for r in rows}
    assert got[(0, 0)] == ("", "b c")      # doc start: empty left
    assert got[(0, 4)] == ("c d", "")      # doc end: empty right
    assert got[(1, 1)] == ("e", "f")       # short doc clamps both
    assert len(rows) == 3
    assert all(r["term"] == "query" for r in rows)


def test_kmeans_inertia_replica(spark):
    # two well-separated 4-dim blobs, k=2: the eval must reproduce a
    # numpy Huygens replica computed from the SHIPPED assignment, and
    # separation means ss_within << ss_point
    vecs = [
        (0, [1.0, 1.0, 0.0, 0.0]), (1, [0.9, 1.0, 0.0, 0.1]),
        (2, [1.0, 0.9, 0.1, 0.0]), (3, [0.0, 0.0, 1.0, 1.0]),
        (4, [0.1, 0.0, 0.9, 1.0]), (5, [0.0, 0.1, 1.0, 0.9]),
    ]
    emb = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>"
    )
    assigned = {
        r["vec_id"]: r["cluster"]
        for r in A.kmeans_clusters(emb, k=2, iters=2).collect()
    }
    # numpy-free integer replica of _quant_dims + Huygens
    q = A.PQ_Q
    quant = {
        vid: [max(-q, min(q, round(x * q))) for x in v]
        for vid, v in vecs
    }
    import collections

    by_c = collections.defaultdict(list)
    for vid, c in assigned.items():
        by_c[c].append(quant[vid])
    want = {}
    for c, rows in by_c.items():
        n = len(rows)
        ss_point = sum(x * x for r in rows for x in r)
        sumsq = sum(
            sum(r[d] for r in rows) ** 2 for d in range(4)
        )
        pull = sumsq // n
        want[c] = (n, ss_point, pull, ss_point - pull)
    got = {
        r["cluster"]: (
            r["n_vecs"], r["ss_point"], r["pull"], r["ss_within"]
        )
        for r in A.kmeans_inertia(emb, k=2, iters=2).collect()
    }
    assert got == want
    # blobs are separated: within SS is a small fraction of point SS
    for c, (_, ss_point, _, ss_within) in want.items():
        assert ss_within * 10 < ss_point


def test_quality_drift_hand(spark):
    # one source, two batches (doc_id div 2): batch 0 all-alpha docs
    # (~permille 1000*4//5=800 each), batch 1 no-alpha docs (0) —
    # drift 800, flagged at threshold 150 but NOT at 800 (strict >)
    rows = [
        (0, "abcd", "s"), (1, "wxyz", "s"),
        (2, "1234", "s"), (3, "5678", "s"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    r = A.quality_drift(docs, batch=2, flag_permille=150).collect()[0]
    assert (r["source"], r["n_batches"]) == ("s", 2)
    assert (r["min_permille"], r["max_permille"]) == (0, 800)
    assert r["drift_permille"] == 800
    assert r["flagged"] == 1
    r2 = A.quality_drift(docs, batch=2, flag_permille=800).collect()[0]
    assert r2["flagged"] == 0  # strict >


def test_shuffle_eval_python_replica(spark):
    # full parity with a hashlib replica of the epoch order + per-shard
    # adjacency walk, two round-robin sources
    import hashlib

    n, shards, seed = 24, 4, "epoch0"
    rows = [(i, "t", f"s{i % 2}") for i in range(n)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    keyed = []
    for i in range(n):
        k = hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
        keyed.append((int(k[:8], 16) % shards, k, i, f"s{i % 2}"))
    keyed.sort()
    n_pairs = n_same = 0
    for (sh, _, _, src), (sh2, _, _, src2) in zip(keyed, keyed[1:]):
        if sh == sh2:
            n_pairs += 1
            n_same += src == src2
    r = A.shuffle_eval(docs, n_shards=shards, seed=seed).collect()[0]
    assert (r["n_docs"], r["n_pairs"], r["n_same"]) == (n, n_pairs, n_same)
    assert r["same_milli"] == n_same * 1000 // max(n_pairs, 1)
    # two balanced sources: expected rate just under 1/2
    assert r["expected_milli"] == (2 * 12 * 11 * 1000) // (24 * 23)


def test_shuffle_eval_single_source(spark):
    # one source: every adjacent pair matches, expectation is ~1000,
    # so the 2x clump alarm must NOT fire
    docs = spark.createDataFrame(
        [(i, "t", "s") for i in range(10)],
        "doc_id long, text string, source string",
    )
    r = A.shuffle_eval(docs, n_shards=2).collect()[0]
    assert r["same_milli"] == 1000
    assert r["expected_milli"] == 1000
    assert r["clumped"] == 0


def test_dedup_agreement_planted_dups(spark):
    # two planted identical pairs agree in BOTH families; filler docs
    # with disjoint vocab pair with nothing
    dup = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, dup), (1, dup),
        (2, dup.replace("alpha", "iota")),  # near but distinct
        (10, "one two three four five six seven eight"),
        (11, "one two three four five six seven eight"),
        (20, "red green blue cyan magenta yellow black white"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    r = A.dedup_agreement(docs).collect()[0]
    assert r["n_both"] >= 2       # (0,1) and (10,11) in both sets
    assert r["n_jaccard"] >= r["n_both"]
    assert r["n_simhash"] >= r["n_both"]
    assert r["only_jaccard"] == r["n_jaccard"] - r["n_both"]
    assert r["only_simhash"] == r["n_simhash"] - r["n_both"]
    assert r["agreement_milli"] > 0


def test_dedup_agreement_all_distinct_zero(spark):
    rows = [
        (0, "aa bb cc dd ee"),
        (1, "ff gg hh ii jj"),
        (2, "kk ll mm nn oo"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    r = A.dedup_agreement(docs).collect()[0]
    assert (r["n_jaccard"], r["n_both"]) == (0, 0)
    assert r["agreement_milli"] == 0


def _hd_replica(x, y, bits):
    # pure-python xy2d replica of analysis._hilbert_key's per-level CASE
    d = 0
    for lvl in range(bits - 1, -1, -1):
        s = 1 << lvl
        rx, ry = (x // s) % 2, (y // s) % 2
        d += s * s * (0 if rx == 0 and ry == 0 else
                      1 if rx == 0 else 2 if ry == 1 else 3)
        if ry == 1:
            x, y = x % s, y % s
        elif rx == 1:
            x, y = s - 1 - (y % s), s - 1 - (x % s)
        else:
            x, y = y % s, x % s
    return d


def test_hilbert_key_is_hilbert_curve(spark):
    # full 8x8 grid: the Spark key must equal the python replica on
    # every cell, be a bijection onto 0..63, and step to a grid
    # NEIGHBOR at every consecutive distance (the Hilbert property)
    bits, m = 3, 8
    rows = [(x, y, x, y) for x in range(m) for y in range(m)]
    scaled = spark.createDataFrame(
        rows, "__x long, __y long, __xb long, __yb long"
    )
    got = {
        (r["__x"], r["__y"]): r["__k"]
        for r in A._hilbert_key(scaled, bits).collect()
    }
    assert got == {
        (x, y): _hd_replica(x, y, bits)
        for x in range(m) for y in range(m)
    }
    inv = {d: xy for xy, d in got.items()}
    assert sorted(inv) == list(range(m * m))
    for d in range(m * m - 1):
        (x1, y1), (x2, y2) = inv[d], inv[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_layout_locality_ordering(spark):
    # uniform 32x32 grid, 12 files: linear strips pay huge perimeter;
    # at a non-power-of-4 file count Hilbert's area beats Morton's
    rows = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = {
        r["layout"]: r
        for r in A.layout_locality(
            df, "x", "y", bits=5, n_files=12
        ).collect()
    }
    assert set(out) == {"linear", "zorder", "hilbert"}
    assert all(r["n_files_total"] == 12 for r in out.values())
    assert out["linear"]["total_perimeter"] > out["zorder"]["total_perimeter"]
    assert out["linear"]["total_perimeter"] > out["hilbert"]["total_perimeter"]
    assert out["hilbert"]["total_area"] < out["zorder"]["total_area"]


def _stylo_replica(rows, m):
    # pure-python replica of stylometry_delta's integer chain
    import collections
    import math

    toks = [(i, s, t.split(" ")) for i, (t, s) in enumerate(rows)]
    cnt = collections.Counter(w for _, _, ws in toks for w in ws if w)
    feats = sorted(cnt, key=lambda w: (-cnt[w], w))[:m]
    lens = {i: len([w for w in ws if w]) for i, _, ws in toks}
    f = {
        (i, w): ws.count(w) * 1000000 // lens[i]
        for i, _, ws in toks for w in feats
    }
    nd = len(rows)
    out = collections.defaultdict(lambda: collections.defaultdict(list))
    for w in feats:
        mu = sum(f[(i, w)] for i in lens) // nd
        rad = sum((f[(i, w)] - mu) ** 2 for i in lens) // nd
        sigma = math.isqrt(rad)
        for i, s, _ in toks:
            dev = f[(i, w)] - mu
            sg = (dev > 0) - (dev < 0)
            out[s][w].append(sg * (abs(dev) * 1000 // max(sigma, 1)))
    res = {}
    B = 1 << 40
    for s, per in out.items():
        tot = 0
        for w, zs in per.items():
            p = (sum(zs) + B * len(zs)) // len(zs) - B
            tot += abs(p)
        res[s] = (len(next(iter(per.values()))), tot // m)
    return res


def test_stylometry_delta_replica(spark):
    rows = [
        ("x x y q", "A"), ("x z z q", "A"),
        ("y y y x", "B"), ("z x q q", "B"),
        ("q q q q", "C"), ("x y z q", "C"),
    ]
    docs = _src_docs(spark, rows)
    got = {
        r["source"]: (r["n_docs"], r["delta_milli"])
        for r in A.stylometry_delta(docs, m=3).collect()
    }
    assert got == _stylo_replica(rows, 3)


def test_stylometry_distinct_source_stands_out(spark):
    # sources A/B share a style; source C never uses the common words —
    # C's delta must dominate
    rows = (
        [("the of and x", "A") for _ in range(5)]
        + [("the of and y", "B") for _ in range(5)]
        + [("zz ww vv uu", "C") for _ in range(5)]
    )
    got = {
        r["source"]: r["delta_milli"]
        for r in A.stylometry_delta(_src_docs(spark, rows), m=3).collect()
    }
    assert got["C"] > got["A"]
    assert got["C"] > got["B"]


def _lang_docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, g) for i, (t, g) in enumerate(rows)],
        "doc_id long, text string, lang string",
    )


def test_chao1_hand_values(spark):
    # lang A unigrams: a a b c -> counts {a:2, b:1, c:1}: S=3, f1=2,
    # f2=1 -> chao1 = 3 + 4 div 2 = 5
    rows = [("a a b c", "A"), ("x y", "B")]
    got = {
        r["lang"]: (r["n_types"], r["f1"], r["f2"], r["chao1"])
        for r in A.chao1_richness(_lang_docs(spark, rows), n=1).collect()
    }
    assert got["A"] == (3, 2, 1, 5)
    # lang B: all singletons, f2=0 -> corrected form S + f1(f1-1)/2
    assert got["B"] == (2, 2, 0, 3)


def test_markov_eval_hand(spark):
    import datetime

    def t(s):
        return datetime.datetime.fromisoformat(s)

    # user 1: a->b, b->a, a->b ; user 2: a->c
    # from a: b twice, c once -> predict b, hits 2 of 3
    rows = [
        (0, t("2024-01-01T10:00:00"), 1, "a", 0.0, ""),
        (1, t("2024-01-01T10:01:00"), 1, "b", 0.0, ""),
        (2, t("2024-01-01T10:02:00"), 1, "a", 0.0, ""),
        (3, t("2024-01-01T10:03:00"), 1, "b", 0.0, ""),
        (4, t("2024-01-01T10:00:00"), 2, "a", 0.0, ""),
        (5, t("2024-01-01T10:01:00"), 2, "c", 0.0, ""),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string"
    )
    from contentextractor_spark.functions import events as E

    got = {
        r["from_type"]: (r["predicted"], r["n_transitions"],
                         r["n_hits"], r["hit_milli"])
        for r in E.markov_eval(ev).collect()
    }
    assert got["a"] == ("b", 3, 2, 666)
    assert got["b"] == ("a", 1, 1, 1000)


def test_markov_eval_tiebreak_min_name(spark):
    import datetime

    def t(s):
        return datetime.datetime.fromisoformat(s)

    # from 'a': one transition each to 'z' and 'b' -> predict 'b'
    rows = [
        (0, t("2024-01-01T10:00:00"), 1, "a", 0.0, ""),
        (1, t("2024-01-01T10:01:00"), 1, "z", 0.0, ""),
        (2, t("2024-01-01T10:00:00"), 2, "a", 0.0, ""),
        (3, t("2024-01-01T10:01:00"), 2, "b", 0.0, ""),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string"
    )
    from contentextractor_spark.functions import events as E

    got = {r["from_type"]: r["predicted"] for r in E.markov_eval(ev).collect()}
    assert got["a"] == "b"


def test_simpson_diversity_hand(spark):
    # source S: langs (3,1) -> pair_w=6, N=4, lambda = 6e6//12 = 500000
    # source T: one lang, N=3 -> lambda = 1e6 (certain collision)
    # source U: single doc -> N(N-1)=0 -> lambda 0 (no pair to draw)
    rows = (
        [("t", "a", "S")] * 3 + [("t", "b", "S")]
        + [("t", "a", "T")] * 3 + [("t", "a", "U")]
    )
    docs = spark.createDataFrame(
        [(i, t, l, s) for i, (t, l, s) in enumerate(rows)],
        "doc_id long, text string, lang string, source string",
    )
    got = {
        r["source"]: (r["n_items"], r["n_docs"], r["lambda_micro"])
        for r in A.simpson_diversity(docs).collect()
    }
    assert got["S"] == (2, 4, 500000)
    assert got["T"] == (1, 3, 1000000)
    assert got["U"] == (1, 1, 0)


def test_hill_tail_index_replica(spark):
    import math

    xs = [1000, 700, 510, 333, 250, 190, 140, 100, 80, 60, 50, 40, 30]
    counts = spark.createDataFrame([(v,) for v in xs], "x long")
    k = 5
    top = sorted(xs, reverse=True)[: k + 1]
    thr = top[-1]
    s_micro = sum(
        math.floor(math.log(v / thr) * 1000000.0) for v in top if v > thr
    )
    r = A.hill_tail_index(counts, k=k).collect()[0]
    assert r["x_thr"] == thr
    assert r["k_used"] == k
    assert r["s_micro"] == s_micro
    assert r["alpha_milli"] == k * 1000000000 // max(s_micro, 1)


def test_hill_tail_ties_at_threshold(spark):
    # ties equal to the threshold are excluded (x > x_thr), so k_used
    # shrinks — the standard Hill handling, deterministic on values
    xs = [100, 50, 50, 50, 50]
    counts = spark.createDataFrame([(v,) for v in xs], "x long")
    r = A.hill_tail_index(counts, k=3).collect()[0]
    assert r["x_thr"] == 50
    assert r["k_used"] == 1  # only the 100 exceeds the threshold


def test_markov_entropy_rate_hand(spark):
    import datetime
    import math

    def t(s):
        return datetime.datetime.fromisoformat(s)

    # from 'a': b,b,c (H = -(2/3)ln(2/3) - (1/3)ln(1/3)); from 'b' and
    # 'c': deterministic -> exactly 0
    rows = [
        (0, t("2024-01-01T10:00:00"), 1, "a", 0.0, ""),
        (1, t("2024-01-01T10:01:00"), 1, "b", 0.0, ""),
        (2, t("2024-01-01T10:02:00"), 1, "a", 0.0, ""),
        (3, t("2024-01-01T10:03:00"), 1, "b", 0.0, ""),
        (4, t("2024-01-01T10:04:00"), 1, "a", 0.0, ""),
        (5, t("2024-01-01T10:05:00"), 1, "c", 0.0, ""),
        (6, t("2024-01-01T10:06:00"), 1, "a", 0.0, ""),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string"
    )
    from contentextractor_spark.functions import events as E

    got = {
        r["from_type"]: (r["n_transitions"], r["n_branches"], r["h_micro"])
        for r in E.markov_entropy_rate(ev).collect()
    }
    want_a = (
        math.floor((2 / 3) * math.log(3 / 2) * 1000000.0)
        + math.floor((1 / 3) * math.log(3 / 1) * 1000000.0)
    )
    assert got["a"] == (3, 2, want_a)
    assert got["b"] == (2, 1, 0)  # deterministic: exactly zero
    assert got["c"] == (1, 1, 0)
