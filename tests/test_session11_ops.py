"""Session-11 operators: moments-sketch merge parity and bounds,
packing_eval scorecard invariants against a hand replica."""

import math

import pytest
from pyspark.sql import functions as F

from contentextractor_spark.functions import analysis as A
from contentextractor_spark.functions import events as E


def _events(spark, rows):
    # (event_id, event_type, value)
    return spark.createDataFrame(
        [(i, t, float(v)) for i, t, v in rows],
        "event_id long, event_type string, value double",
    )


def test_moments_sketch_hand(spark):
    ev = _events(
        spark,
        [(1, "a", 3.00), (2, "a", 5.99), (3, "a", 10.01), (4, "b", 0.01)],
    )
    out = {r["event_type"]: r for r in E.moments_sketch(ev).collect()}
    # 5.99 -> 599 cents -> 5 units (truncating div); 10.01 -> 10; 0.01 -> 0
    a = out["a"]
    assert (a["s0"], a["s1"], a["s2"], a["s3"], a["s4"]) == (
        3,
        18,
        134,
        1152,
        10706,
    )
    assert a["mean_milli"] == 18 * 1000 // 3
    assert a["var_milli"] == (3 * 134 - 18 * 18) // max(3 * 3 // 1000, 1)
    b = out["b"]
    assert (b["s0"], b["s1"], b["s2"]) == (1, 0, 0)


def test_moments_sketch_merge_parity(spark):
    # power sums are mergeable by plain addition: sketch(even) +
    # sketch(odd) column-wise == sketch(whole) — the property the row
    # exists to provide
    rows = [(i, "t" + str(i % 3), (i * 7) % 200 + 0.25) for i in range(60)]
    ev = _events(spark, rows)
    whole = {r["event_type"]: r for r in E.moments_sketch(ev).collect()}
    even = E.moments_sketch(ev.filter(F.col("event_id") % 2 == 0))
    odd = E.moments_sketch(ev.filter(F.col("event_id") % 2 == 1))
    merged = (
        even.unionByName(odd)
        .groupBy("event_type")
        .agg(*[F.sum(c).alias(c) for c in ("s0", "s1", "s2", "s3", "s4")])
    )
    for r in merged.collect():
        w = whole[r["event_type"]]
        for c in ("s0", "s1", "s2", "s3", "s4"):
            assert r[c] == w[c], (r["event_type"], c)


def test_moments_sketch_bound_raises(spark):
    ev = _events(spark, [(1, "a", 25000.00)])  # 25000 units > 2000
    with pytest.raises(Exception, match="moments_sketch"):
        E.moments_sketch(ev).collect()


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_packing_eval_invariants(spark):
    docs = _docs(
        spark,
        [(i, " ".join(["w"] * ((i * 13) % 90 + 1))) for i in range(120)],
    )
    r = A.packing_eval(docs, capacity=64, n_groups=4).collect()[0]
    assert r["n_docs"] == 120
    total = sum((i * 13) % 90 + 1 for i in range(120))
    assert r["total_tokens"] == total
    # the streaming packer never opens more bins than the per-stream
    # ceil bound (straddling docs overfill instead) — bin_delta <= 0
    assert r["bin_delta"] <= 0
    assert r["n_bins"] == r["lb_bins"] + r["bin_delta"]
    assert r["fill_milli"] == total * 1000 // (r["n_bins"] * 64)
    # a bin exceeds capacity by at most one doc's tokens
    assert r["max_bin_tokens"] < 64 + 90


def test_packing_eval_matches_packed_bins(spark):
    # the scorecard must aggregate exactly the shipped pack_sequences
    # output — recompute from the packed rows directly
    docs = _docs(
        spark,
        [(i, " ".join(["w"] * ((i * 5) % 40 + 1))) for i in range(50)],
    )
    packed = A.pack_sequences(docs, capacity=32, n_groups=2).collect()
    bins = {}
    per_stream_tokens = {}
    for row in packed:
        key = (row["pack_group"], row["bin_id"])
        bins[key] = bins.get(key, 0) + row["n_tokens"]
        per_stream_tokens[row["pack_group"]] = (
            per_stream_tokens.get(row["pack_group"], 0) + row["n_tokens"]
        )
    r = A.packing_eval(docs, capacity=32, n_groups=2).collect()[0]
    assert r["n_bins"] == len(bins)
    assert r["max_bin_tokens"] == max(bins.values())
    assert r["lb_bins"] == sum(
        math.ceil(t / 32) for t in per_stream_tokens.values()
    )


def _ndocs(spark, rows):
    # (doc_id, source, n_chars)
    return spark.createDataFrame(
        rows, "doc_id long, source string, n_chars long"
    )


def test_psi_drift_identical_is_stable(spark):
    # two groups drawn from the SAME length distribution: PSI ~ 0
    rows = []
    for i in range(200):
        rows.append(
            (i, "a" if i % 2 == 0 else "b", ((i // 2) % 10) * 64 + 10)
        )
    out = {
        r["source"]: r
        for r in A.psi_drift(_ndocs(spark, rows)).collect()
    }
    for s in ("a", "b"):
        assert out[s]["verdict"] == "stable"
        # floors can push a true-zero sum slightly negative, never below -B
        assert -10 <= out[s]["psi_micro"] < 100000


def test_psi_drift_planted_shift_flags(spark):
    # group 'big' lives entirely in the top bucket; the corpus
    # reference is dominated by 'ref' in the bottom bucket
    rows = [(i, "ref", 10) for i in range(180)]
    rows += [(1000 + i, "big", 600) for i in range(20)]
    out = {
        r["source"]: r
        for r in A.psi_drift(_ndocs(spark, rows)).collect()
    }
    assert out["big"]["verdict"] == "drifted"
    assert out["big"]["psi_micro"] > out["ref"]["psi_micro"]


def _ldocs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    )


def test_lm_heldout_ppl_hand(spark):
    # train (doc 0): "a a b"; heldout (doc 1): "a c"
    # N=3, V=2 -> denom 6; p(a)=(2+1)/6, p(c OOV)=1/6
    docs = _ldocs(spark, [(0, "xx", "a a b"), (1, "xx", "a c")])
    r = A.lm_heldout_ppl(docs).collect()[0]
    assert r["lang"] == "xx"
    assert r["n_train_tokens"] == 3
    assert r["vocab"] == 2
    assert r["n_heldout_tokens"] == 2
    assert r["oov_tokens"] == 1
    t_a = math.floor(math.log(6 / 3) * 1e6)
    t_c = math.floor(math.log(6 / 1) * 1e6)
    assert r["ce_micro"] == (t_a + t_c) // 2


def test_lm_heldout_ppl_oov_only_unseen(spark):
    # every heldout token seen in training -> zero OOV
    docs = _ldocs(spark, [(0, "yy", "p q r"), (1, "yy", "q r p p")])
    r = A.lm_heldout_ppl(docs).collect()[0]
    assert r["oov_tokens"] == 0
    assert r["n_heldout_tokens"] == 4


def test_item_similarity_hand(spark):
    # users 1,2 do both a and b; user 3 only a; user 4 only c
    ev = spark.createDataFrame(
        [
            (1, "a"), (1, "b"), (2, "a"), (2, "b"),
            (3, "a"), (4, "c"), (1, "a"),  # duplicate (1,a) must not count
        ],
        "user_id long, event_type string",
    )
    out = {
        (r["item_a"], r["item_b"]): r
        for r in E.item_similarity(ev).collect()
    }
    r = out[("a", "b")]
    assert (r["n_a"], r["n_b"], r["inter"]) == (3, 2, 2)
    # cos = 2/sqrt(6); cos_milli = 2e6 // isqrt(6e6)
    assert r["cos_milli"] == 2_000_000 // math.isqrt(6_000_000)
    # c shares no users with a or b -> no pair rows at all
    assert ("a", "c") not in out and ("b", "c") not in out


def test_rrf_fusion_hand(spark):
    # craft docs where bm25 and qlm agree on candidates; check the
    # reciprocal arithmetic against the systems' own ranks
    docs = spark.createDataFrame(
        [
            (0, "query query scan filler filler"),
            (1, "query filler filler filler filler filler"),
            (2, "window filler"),
            (3, "filler filler"),
        ],
        "doc_id long, text string",
    )
    b = {
        r["doc_id"]: r["rank"]
        for r in A.bm25_search(docs, ["query", "scan", "window"], k=10).collect()
    }
    q = {
        r["doc_id"]: r["rank"]
        for r in A.qlm_search(docs, ["query", "scan", "window"], k=10).collect()
    }
    out = {
        r["doc_id"]: r
        for r in A.rrf_fusion(
            docs, ["query", "scan", "window"], k_sys=10
        ).collect()
    }
    assert 3 not in out  # no query terms -> in neither run
    for d in (0, 1, 2):
        expect = 0
        if d in b:
            expect += 1_000_000 // (60 + b[d])
        if d in q:
            expect += 1_000_000 // (60 + q[d])
        assert out[d]["rrf_micro"] == expect
    ranks = [r["fused_rank"] for r in out.values()]
    assert sorted(ranks) == [1, 2, 3]
