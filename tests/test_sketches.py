"""r4 sketch family: HyperLogLog cardinality + count-min heavy hitters.

Property tests (the Spark↔DuckDB parity of the driver rows is covered by
test_entry_oracle): HLL accuracy within the published 3-sigma bound,
register-table mergeability (the reason the sketch exists at 100 TB),
the md5-derived register/rho convention against a hashlib reimplementation,
and CMS's one-sided error (est >= true for every candidate).
"""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from contentextractor_spark.functions import analysis as A


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


@pytest.fixture(scope="module")
def corpus(spark):
    # ~6k distinct 3-grams: enough to exercise most of the 256 registers
    rows = []
    for d in range(80):
        toks = [f"t{(d * 37 + i * (d % 11 + 1)) % 900}" for i in range(80)]
        rows.append((d, " ".join(toks)))
    return _docs(spark, rows)


def _exact_distinct_3grams(corpus) -> int:
    return (
        A.shingles(corpus, n=3, dedup=True)
        .select("shingle")
        .distinct()
        .count()
    )


def test_hll_estimate_within_3_sigma(corpus):
    exact = _exact_distinct_3grams(corpus)
    est = A.hll_estimate(corpus, p=8, n=3).collect()[0]["est"]
    sigma = 1.04 / math.sqrt(256)
    assert abs(est - exact) <= 3 * sigma * exact, (est, exact)


def test_hll_registers_merge(corpus, spark):
    """Union-merge semantics: max-combining the register tables of two
    disjoint halves equals the register table of the whole corpus — the
    property that lets per-crawl sketches aggregate without re-reading
    raw data."""
    full = {
        (r["register"], r["max_rho"])
        for r in A.hll_registers(corpus, p=8, n=3).collect()
    }
    a = A.hll_registers(corpus.filter(F.col("doc_id") % 2 == 0), p=8, n=3)
    b = A.hll_registers(corpus.filter(F.col("doc_id") % 2 == 1), p=8, n=3)
    merged = {
        (r["register"], r["max_rho"])
        for r in a.unionAll(b)
        .groupBy("register")
        .agg(F.max("max_rho").alias("max_rho"))
        .collect()
    }
    assert merged == full


def test_register_rho_convention(spark):
    """Pin the hash convention against a hashlib reimplementation:
    register = first 2 hex digits of md5(g); rho = 33 - bitlength of the
    next 8 hex digits (w = 0 → rho 32, the documented truncated variant)."""
    grams = ["alpha beta gamma", "x y z", "one two three"]
    docs = _docs(spark, [(i, g) for i, g in enumerate(grams)])
    got = {
        r["register"]: r["max_rho"]
        for r in A.hll_registers(docs, p=8, n=3).collect()
    }
    expected: dict[int, int] = {}
    for g in grams:
        h = hashlib.md5(g.encode()).hexdigest()
        reg = int(h[:2], 16)
        w = int(h[2:10], 16)
        rho = 33 - w.bit_length() if w else 32
        expected[reg] = max(expected.get(reg, 0), rho)
    assert got == expected


def test_cms_one_sided_error_and_top1(corpus, spark):
    """est >= true for EVERY candidate (count-min never underestimates)
    on the near-uniform corpus, and on a skewed corpus — where heavy
    hitters actually exist, i.e. the frequency gap exceeds collision
    noise — the sketch's top-1 is the exact top-1."""
    n_vocab = (
        A._gram_stream(corpus, 1).select("g").distinct().count()
    )
    rows = A.cms_topk(corpus, n=1, d=4, w=2048, k=n_vocab).collect()
    assert len(rows) == n_vocab
    assert all(r["est"] >= r["true_cnt"] for r in rows)

    # skewed corpus: "hh" dominates (30 occurrences/doc), tail tokens ~1
    skewed = _docs(
        spark,
        [
            (d, " ".join(["hh"] * 30 + [f"tail{(d * 17 + i) % 400}" for i in range(20)]))
            for d in range(50)
        ],
    )
    top = min(
        A.cms_topk(skewed, n=1, d=4, w=2048, k=5).collect(),
        key=lambda r: r["rank"],
    )
    assert top["gram"] == "hh" and top["true_cnt"] == 1500


def test_cms_sketch_is_fixed_size(corpus):
    d, w = 4, 64
    cells = A.cms_sketch(corpus, n=1, d=d, w=w).count()
    assert cells <= d * w


def test_bloom_decontaminate_never_misses(spark):
    """The bloom guarantee: every document the EXACT decontaminate flags
    (>=1 shared shingle with the bench) must appear in the bloom result
    with exact_hits >= 1 — false positives allowed, false negatives
    never; and bloom_hits >= exact_hits row by row."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(
        120
    )
    from pyspark.sql import functions as F

    bench = docs.filter(F.col("doc_id") < 10)
    exact = {
        r["doc_id"]
        for r in A.decontaminate(docs, bench, n=3, min_overlap=1).collect()
    }
    bloom = {
        r["doc_id"]: (r["bloom_hits"], r["exact_hits"])
        for r in A.bloom_decontaminate(
            docs, bench, n=3, n_hashes=3, n_bits=4096
        ).collect()
    }
    assert exact <= set(bloom), exact - set(bloom)
    assert all(b >= e for b, e in bloom.values())
    assert all(bloom[d][1] >= 1 for d in exact)


def _bpe_docs(spark, texts):
    return _docs(spark, list(enumerate(texts)))


def test_bpe_hand_golden(spark):
    """Hand-computable training: 'aa ab aa' — pair (a,a) has weight 2 and
    wins step 1; after merging, only (a,b) remains for step 2."""
    docs = _bpe_docs(spark, ["aa ab aa"])
    got = [(r["step"], r["left"], r["right"], r["pair_count"])
           for r in A.bpe_merges(docs, n_merges=2).collect()]
    assert got == [(1, "a", "a", 2), (2, "a", "b", 1)]
    counts = {r["doc_id"]: r["n_tokens_bpe"]
              for r in A.bpe_token_counts(docs, n_merges=2).collect()}
    assert counts == {0: 3}  # aa→1, ab→1, aa→1


def test_bpe_greedy_leftmost(spark):
    """'aaa' under merge (a,a) must become [aa, a] (leftmost pair first,
    no overlap), so the step-2 argmax is (aa, a)."""
    docs = _bpe_docs(spark, ["aaa aaa"])
    got = [(r["step"], r["left"], r["right"], r["pair_count"])
           for r in A.bpe_merges(docs, n_merges=2).collect()]
    assert got == [(1, "a", "a", 4), (2, "aa", "a", 2)]
    counts = {r["doc_id"]: r["n_tokens_bpe"]
              for r in A.bpe_token_counts(docs, n_merges=2).collect()}
    assert counts == {0: 2}  # each 'aaa' is one token after both merges


def test_bpe_merge_reduces_token_count(spark):
    """More merges can never increase the corpus token count, and with 0
    merges the count equals the character count of the word stream."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(40)
    c0 = {r["doc_id"]: r["n_tokens_bpe"]
          for r in A.bpe_token_counts(docs, n_merges=0).collect()}
    c4 = {r["doc_id"]: r["n_tokens_bpe"]
          for r in A.bpe_token_counts(docs, n_merges=4).collect()}
    assert set(c0) == set(c4)
    assert all(c4[d] <= c0[d] for d in c0)
    assert any(c4[d] < c0[d] for d in c0)


def test_bpe_refuses_above_merge_bound(spark, monkeypatch):
    """VERDICT r4 #4: the driver-sequenced merge loop must refuse above
    MAX_BPE_MERGES unless force=True (the pagerank-bound pattern)."""
    docs = _bpe_docs(spark, ["aa ab aa"])
    monkeypatch.setattr(A, "MAX_BPE_MERGES", 1)
    with pytest.raises(ValueError, match="bpe_merges refused"):
        A.bpe_merges(docs, n_merges=2)
    with pytest.raises(ValueError, match="bpe_token_counts refused"):
        A.bpe_token_counts(docs, n_merges=2)
    got = [(r["step"], r["left"], r["right"])
           for r in A.bpe_merges(docs, n_merges=2, force=True).collect()]
    assert got == [(1, "a", "a"), (2, "a", "b")]


def test_hll_by_group_accuracy_and_merge(spark):
    """Per-group estimates land within 3 sigma (1.04/sqrt(m)) of each
    group's exact distinct 3-gram count, and the grouped register table
    merges by groupBy(max) exactly like the global one."""
    from pyspark.sql import functions as F

    from contentextractor_spark.functions.analysis import (
        hll_estimate_by_group,
        hll_registers_by_group,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    est = {
        r.lang: r.est
        for r in hll_estimate_by_group(docs, "lang", p=8, n=3).collect()
    }
    exact = {
        r.lang: r.d
        for r in docs.select(
            "lang",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(split(text,' '))-3),"
                    " i -> concat_ws(' ', slice(split(text,' '), i+1, 3)))"
                )
            ).alias("g"),
        )
        .groupBy("lang")
        .agg(F.countDistinct("g").alias("d"))
        .collect()
    }
    assert set(est) == set(exact)
    for lang, d in exact.items():
        sigma = 1.04 / (256 ** 0.5)
        assert abs(est[lang] - d) <= 3 * sigma * d + 3, (lang, est[lang], d)
    # mergeability: register tables from two halves union+max to the whole
    regs_all = hll_registers_by_group(docs, "lang", p=8, n=3)
    lo = hll_registers_by_group(docs.filter("doc_id % 2 = 0"), "lang", p=8, n=3)
    hi = hll_registers_by_group(docs.filter("doc_id % 2 = 1"), "lang", p=8, n=3)
    merged = (
        lo.unionAll(hi)
        .groupBy("lang", "register")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, regs_all.collect())
    )


def test_kmv_exact_on_subk_and_estimator_accuracy(spark):
    """Sub-k groups report exact distinct counts and exact Jaccard (the
    sketch IS the set); a 2000-token vocabulary estimates within the
    KMV error envelope at k=32 (std ~ 1/sqrt(k-2) ~ 18%)."""
    from contentextractor_spark.functions.analysis import (
        kmv_estimate,
        kmv_lang_jaccard,
    )

    small = spark.createDataFrame(
        [
            (0, "en", "a b c d"),
            (1, "ja", "c d e f g h"),
        ],
        "doc_id bigint, lang string, text string",
    )
    est = {r.grp: (r.n_kept, r.distinct_est)
           for r in kmv_estimate(small, k=32).collect()}
    assert est == {"en": (4, 4), "ja": (6, 6)}
    jac = kmv_lang_jaccard(small, k=32).collect()
    assert len(jac) == 1
    r = jac[0]
    # |union|=8, |both|=2 -> exact jaccard 250 milli
    assert (r.grp_a, r.grp_b, r.n_union, r.n_both,
            r.jaccard_est_milli) == ("en", "ja", 8, 2, 250)

    big = spark.createDataFrame(
        [(0, "en", " ".join(f"w{i}" for i in range(2000)))],
        "doc_id bigint, lang string, text string",
    )
    got = kmv_estimate(big, k=32).collect()[0]
    assert got.n_kept == 32
    assert 1000 < got.distinct_est < 4000, got.distinct_est
