"""r4 curation additions: bigram surprisal, overlap-fraction
decontamination, per-host rebalancing, full-dim k-means + SemDeDup.

Property tests — the Spark↔DuckDB value parity of every driver row is
covered by test_entry_oracle; these check the semantics the oracle can't
state (expected-cap behavior, planted-leak teeth, LM ordering,
repartition invariance, planted semantic dups dropping).
"""

import pytest
from pyspark.sql import functions as F

from contentextractor_spark.functions import analysis as A


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


# --------------------------------------------------------------------------
# host_rebalance
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def skewed_urls(spark):
    # one hot host with 600 docs, 40 cold hosts with 10 each
    rows = []
    for d in range(1000):
        host = "big.example.com" if d < 600 else f"h{d % 40}.example.com"
        rows.append((d, f"https://{host}/p/{d}"))
    return spark.createDataFrame(rows, "doc_id bigint, url string")


def test_host_rebalance_caps_hot_host(skewed_urls):
    out = A.host_rebalance(skewed_urls, cap=20)
    hot = out.filter(F.col("host") == "big.example.com")
    kept = hot.filter("keep = 1").count()
    # expected 20 of 600; md5 buckets are uniform so 3-sigma of
    # Binomial(600, 1/30) is ~13.4 — the cap binds, never exact
    assert 5 <= kept <= 40, kept
    # cold hosts (10 docs < cap 20): keep probability 1, no doc dropped
    cold = out.filter(F.col("host") != "big.example.com")
    assert cold.filter("keep = 0").count() == 0


def test_host_rebalance_deterministic_and_repartition_invariant(skewed_urls):
    a = {r["doc_id"]: r["keep"] for r in A.host_rebalance(skewed_urls, cap=20).collect()}
    b = {
        r["doc_id"]: r["keep"]
        for r in A.host_rebalance(skewed_urls.repartition(7), cap=20).collect()
    }
    assert a == b


# --------------------------------------------------------------------------
# decontaminate_fraction
# --------------------------------------------------------------------------


def test_decontaminate_fraction_planted_and_clean(spark):
    bench = _docs(spark, [(100, "alpha beta gamma delta epsilon")])
    docs = _docs(
        spark,
        [
            # doc 0: fully inside the bench item -> 100% of its 3-grams hit
            (0, "alpha beta gamma delta"),
            # doc 1: shares ONE 3-gram out of 8 (12.5% >= 10% -> contaminated)
            (1, "x1 x2 alpha beta gamma x3 x4 x5 x6 x7"),
            # doc 2: no overlap at all
            (2, "p q r s t u v w"),
            # doc 3: too short for any 3-gram
            (3, "one two"),
        ],
    )
    out = {
        r["doc_id"]: (r["n_grams"], r["n_hit"], r["contaminated"])
        for r in A.decontaminate_fraction(docs, bench, n=3, max_pct=10).collect()
    }
    assert out[0] == (2, 2, 1)
    assert out[1] == (8, 1, 1)
    assert out[2] == (6, 0, 0)
    assert out[3] == (0, 0, 0)


def test_decontaminate_fraction_threshold_has_teeth(spark):
    bench = _docs(spark, [(100, "alpha beta gamma delta epsilon")])
    docs = _docs(spark, [(1, "x1 x2 alpha beta gamma x3 x4 x5 x6 x7")])
    strict = A.decontaminate_fraction(docs, bench, n=3, max_pct=20).collect()[0]
    assert strict["contaminated"] == 0  # 1/8 = 12.5% < 20%


# --------------------------------------------------------------------------
# bigram_surprisal
# --------------------------------------------------------------------------


def test_bigram_surprisal_orders_generic_below_noise(spark):
    # a RARE CONTINUATION of a COMMON context is what a bigram model
    # penalizes (a fully-unique bigram with a singleton context has
    # conditional MLE 1.0 and scores LOW — the first version of this test
    # got that wrong): corpus context 'a' almost always continues b/c,
    # the planted doc continues it with q
    rows = [(d, "a b a c a b a c") for d in range(20)]
    rows.append((99, "a q"))
    out = {
        r["doc_id"]: r["mean_micronats"]
        for r in A.bigram_surprisal(_docs(spark, rows)).collect()
    }
    assert out[99] == max(out.values())
    assert out[0] < out[99]


def test_bigram_surprisal_short_docs_absent(spark):
    docs = _docs(spark, [(0, "solo"), (1, "two words")])
    out = {r["doc_id"] for r in A.bigram_surprisal(docs).collect()}
    assert out == {1}  # doc 0 has no bigram -> no row


# --------------------------------------------------------------------------
# kmeans_clusters + semantic_dedup
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def clustered_emb(spark):
    # two tight blobs 2 apart in 8-dim space + exact duplicates of the
    # first 5 vectors (ids 100+)
    import math

    rows = []
    for v in range(40):
        base = 0.5 if v % 2 == 0 else -0.5
        vec = [base + 0.001 * ((v * 7 + d) % 5) for d in range(8)]
        rows.append((v, vec))
    for v in range(5):
        rows.append((100 + v, rows[v][1]))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_kmeans_separates_blobs_and_is_repartition_invariant(clustered_emb):
    out = {r["vec_id"]: r["cluster"] for r in A.kmeans_clusters(clustered_emb, k=2, iters=2).collect()}
    evens = {out[v] for v in range(0, 40, 2)}
    odds = {out[v] for v in range(1, 40, 2)}
    assert len(evens) == 1 and len(odds) == 1 and evens != odds
    out2 = {
        r["vec_id"]: r["cluster"]
        for r in A.kmeans_clusters(clustered_emb.repartition(5), k=2, iters=2).collect()
    }
    assert out == out2


def test_semantic_dedup_drops_planted_duplicates(clustered_emb):
    out = {r["vec_id"]: r["keep"] for r in A.semantic_dedup(clustered_emb, k=2, iters=2, threshold=0.99).collect()}
    # the blobs are TIGHT (±0.001 perturbations -> within-blob cos
    # rounds to 1.0), so at threshold 0.99 each whole blob collapses to
    # its min-id representative: only vec 0 (even blob) and vec 1 (odd
    # blob) survive; every planted copy (id 100+) drops with them
    for v in range(5):
        assert out[100 + v] == 0, (v, out[100 + v])
    assert out[0] == 1 and out[1] == 1
    assert sum(out.values()) == 2 and len(out) == 45


def test_semantic_dedup_cap_skips_and_overflow_reports(clustered_emb):
    # cap below the blob size: no pairs computed anywhere -> all kept,
    # and the overflow twin lists both clusters loudly
    out = A.semantic_dedup(clustered_emb, k=2, iters=2, threshold=0.99, max_cluster_size=10)
    assert out.filter("keep = 0").count() == 0
    over = A.semantic_dedup_overflow(clustered_emb, k=2, iters=2, max_cluster_size=10)
    assert over.count() == 2


# --------------------------------------------------------------------------
# host_anchor_terms + length_percentiles
# --------------------------------------------------------------------------


def test_host_anchor_terms_counts_and_tiebreak(spark):
    links = spark.createDataFrame(
        [
            ("1", "h1.example/x", "spark engine"),
            ("2", "h1.example/y", "spark sql"),
            ("3", "https://H1.example/z", "sql"),   # scheme + case fold
            ("4", "h2.example/a", ""),              # empty anchor -> no terms
            ("5", "h2.example/b", "solo"),
        ],
        "url string, href string, anchor string",
    )
    out = {
        (r["host"], r["term"]): (r["n"], r["rank"])
        for r in A.host_anchor_terms(links, k=2).collect()
    }
    # h1.example: spark=2, sql=2 (tie -> 'spark' < 'sql' lexicographic),
    # engine=1 cut by k=2
    assert out[("h1.example", "spark")] == (2, 1)
    assert out[("h1.example", "sql")] == (2, 2)
    assert ("h1.example", "engine") not in out
    assert out[("h2.example", "solo")] == (1, 1)
    assert len(out) == 3


def test_length_percentiles_nearest_rank(spark):
    # lang 'a': lengths 1..10 -> p50 = ceil(0.5*10)=5th value = 5,
    # p90 = 9, p99 = ceil(9.9)=10th = 10
    rows = [(d, "x", "a", d + 1) for d in range(10)]
    rows.append((99, "x", "b", 7))  # singleton lang: every percentile = 7
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, n_chars bigint"
    )
    out = {
        r["lang"]: (r["n_docs"], r["p50_chars"], r["p90_chars"], r["p99_chars"])
        for r in A.length_percentiles(docs).collect()
    }
    assert out["a"] == (10, 5, 9, 10)
    assert out["b"] == (1, 7, 7, 7)


# --------------------------------------------------------------------------
# DSIR importance resampling
# --------------------------------------------------------------------------


def test_dsir_ranks_target_like_docs_first(spark):
    # target = 'code-like' docs; raw corpus mixes code-like and prose.
    # Every code-like raw doc must out-rank every prose doc.
    code = [
        "def foo return x", "class bar def init", "import os def main",
        "return self value def",
    ]
    prose = [
        "the cat sat on the mat", "a long time ago in town",
        "rain falls softly tonight", "children play in the park",
    ]
    rows = [(i, t) for i, t in enumerate(code + prose)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    target = spark.createDataFrame(
        [(100, "def make thing return it"), (101, "import sys class app")],
        "doc_id bigint, text string",
    )
    w = {r["doc_id"]: r["mean_micronats"] for r in A.dsir_weights(docs, target).collect()}
    assert min(w[i] for i in range(4)) > max(w[i] for i in range(4, 8)), w
    top = [r["doc_id"] for r in A.dsir_topk(docs, target, k=4).collect()]
    assert set(top) == {0, 1, 2, 3}


def test_dsir_signed_mean_division_is_floor(spark):
    # a doc with NEGATIVE total log-ratio exercises the offset-div trick
    # (Spark div truncates toward zero; the offset keeps the numerator
    # non-negative so both engines floor) — mean must equal python's //
    docs = spark.createDataFrame(
        [(0, "zz yy zz xx"), (1, "aa bb aa")], "doc_id bigint, text string"
    )
    target = spark.createDataFrame([(9, "aa bb cc")], "doc_id bigint, text string")
    for r in A.dsir_weights(docs, target).collect():
        assert r["mean_micronats"] == r["logratio_micronats"] // r["n_tokens"], r


# --------------------------------------------------------------------------
# plan audits — pin the scale-bearing shapes of the r4 curation ops
# --------------------------------------------------------------------------


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_curation_r4_plans_are_codegen_hashaggs(spark):
    """Every r4 curation op must plan as codegen'd HashAggregates with
    pruned scans — no sort/object aggregate anywhere, and the only
    single-partition exchanges are the one-row scalar totals (the
    unigram_surprisal shape)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    target = docs.filter(F.col("lang") == "en")
    cases = {
        "bigram_surprisal": A.bigram_surprisal(docs),
        "dsir_weights": A.dsir_weights(docs, target),
        "decontaminate_fraction": A.decontaminate_fraction(
            docs, docs.filter(F.col("doc_id") < 20)
        ),
        "length_percentiles": A.length_percentiles(docs),
    }
    for name, df in cases.items():
        plan = _physical(df)
        assert "SortAggregate" not in plan, (name, plan)
        assert "ObjectHashAggregate" not in plan, (name, plan)
        # scans prune to the columns the op actually reads
        assert "html" not in plan.split("ReadSchema")[0] or True
        for schema in __import__("re").findall(r"ReadSchema: (\S+)", plan):
            assert "html" not in schema and "source" not in schema, (name, schema)


def test_dsir_bench_side_broadcasts(spark):
    """The target-LM and scalar-totals tables must ride as broadcasts —
    the raw-corpus token stream is the only big side."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _physical(A.dsir_weights(docs, docs.filter(F.col("lang") == "en")))
    assert plan.count("BroadcastExchange") >= 2, plan


# --------------------------------------------------------------------------
# robots.txt parse + longest-match filter
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def robots_rules(spark):
    robots = spark.createDataFrame(
        [
            ("h0.example",
             "User-agent: *\nDisallow: /private/\nAllow: /private/ok/\n\n"
             "User-agent: evilbot\nDisallow: /"),
            ("h1.example", "# all welcome\nUser-agent: *\nDisallow:\n"),
            ("h2.example", "User-Agent: *\r\nDisallow: /  # block all\r\n"),
            # RFC 9309 grouped agent lines: '*' FIRST, named bot second —
            # the r4 ADVICE trap (a per-line sectioner binds /grouped/
            # only to somebot and drops the '*' rule)
            ("h4.example",
             "User-agent: *\nUser-agent: somebot\nDisallow: /grouped/\n\n"
             "User-agent: nostar\nUser-agent: alsonostar\nDisallow: /x/"),
            # mixed-case host must come out lowercased (fail-open guard)
            ("H5.Example", "User-agent: *\nDisallow: /cased/"),
        ],
        "host string, robots_txt string",
    )
    return A.parse_robots(robots)


def test_parse_robots_sections_comments_crlf(robots_rules):
    rules = {(r["host"], r["path_prefix"]): r["allow"] for r in robots_rules.collect()}
    # the evilbot section must not leak; empty Disallow emits no rule;
    # CRLF + trailing comment + case-insensitive field all parse; a
    # grouped-UA section containing '*' keeps its rules while an all-named
    # group drops them; hosts are lowercased
    assert rules == {
        ("h0.example", "/private/"): 0,
        ("h0.example", "/private/ok/"): 1,
        ("h2.example", "/"): 0,
        ("h4.example", "/grouped/"): 0,
        ("h5.example", "/cased/"): 0,
    }


def test_apply_robots_longest_match_and_defaults(spark, robots_rules):
    urls = spark.createDataFrame(
        [
            (0, "https://h0.example/private/x"),       # blocked
            (1, "https://h0.example/private/ok/y"),    # longer Allow wins
            (2, "https://h0.example/public"),          # no rule -> allow
            (3, "https://h1.example/anything"),        # empty Disallow host
            (4, "https://h2.example/whatever"),        # block-all host
            (5, "https://h3.example/no-robots"),       # unknown host
            (6, "https://h2.example"),                 # bare host -> path '/'
            (7, "https://h4.example/grouped/page"),    # grouped-'*' rule blocks
            (8, "https://h4.example/x/page"),          # named-bots-only rule ignored
            (9, "https://H5.Example/cased/q"),         # case-folded host match
        ],
        "doc_id bigint, url string",
    )
    out = {r["doc_id"]: r["allowed"] for r in A.apply_robots(urls, robots_rules).collect()}
    assert out == {0: 0, 1: 1, 2: 1, 3: 1, 4: 0, 5: 1, 6: 0, 7: 0, 8: 1, 9: 0}


# --------------------------------------------------------------------------
# C4 line filter + CCNet perplexity buckets
# --------------------------------------------------------------------------


def test_c4_line_filter_all_four_gates(spark):
    docs = _docs(
        spark,
        [
            # doc 0: one unpunctuated line + one short line are dropped,
            # three good lines survive
            (0, "good line one two three.\nno punct line here at all\n"
                "another fine line four five!\nthird good line is here.\n"
                "short one."),
            # doc 1: the javascript line is punctuated and long — only the
            # content rule can drop it; three others survive
            (1, "uses javascript library here today.\n"
                "solid line one two three four.\nfine line two three four "
                "five.\nmore line two three four five."),
            # doc 2: page gate — lorem ipsum kills the whole page
            (2, "lorem ipsum dolor sit amet.\ngood line one two three "
                "four.\nsecond fine line here today.\nthird fine line here "
                "today."),
            # doc 3: fewer than 3 surviving lines -> page dropped
            (3, "only one good line here today.\nnothing else survives"),
        ],
    )
    out = {(r["doc_id"], r["pos"]) for r in A.c4_line_filter(docs).collect()}
    assert out == {(0, 0), (0, 2), (0, 3), (1, 1), (1, 2), (1, 3)}


def test_ccnet_buckets_are_balanced_terciles(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = A.ccnet_buckets(docs)
    sizes = {
        (r["lang"], r["bucket"]): r["cnt"]
        for r in out.groupBy("lang", "bucket").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    langs = {k[0] for k in sizes}
    for lang in langs:
        h, m, t = (sizes.get((lang, b), 0) for b in ("head", "middle", "tail"))
        n = h + m + t
        # nearest-rank terciles: each bucket within 1 of n/3 (ties on
        # equal scores can shift more, but the fixture scores are distinct)
        assert abs(h - n / 3) <= 1 and abs(m - n / 3) <= 1 and abs(t - n / 3) <= 1, (lang, h, m, t)
    # head = LOWEST surprisal by construction
    rows = out.filter(F.col("lang") == "en").collect()
    hmax = max(r["mean_micronats"] for r in rows if r["bucket"] == "head")
    tmin = min(r["mean_micronats"] for r in rows if r["bucket"] == "tail")
    assert hmax < tmin


# --------------------------------------------------------------------------
# content-defined chunking + sitemap parse
# --------------------------------------------------------------------------


def test_cdc_chunks_are_shift_tolerant(spark):
    # doc 1 = doc 0 with ONE token inserted at the front: only the first
    # chunk may differ; every later chunk re-aligns at the next
    # content-defined boundary with an identical fingerprint
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon")
    docs = _docs(spark, [(0, base), (1, "INSERTED " + base)])
    ch = {(r["doc_id"], r["chunk_id"]): (r["fp"], r["n_tokens"])
          for r in A.cdc_chunks(docs, mask_bits=2).collect()}
    n0 = max(k[1] for k in ch if k[0] == 0) + 1
    n1 = max(k[1] for k in ch if k[0] == 1) + 1
    assert n0 == n1
    for c in range(1, n0):
        assert ch[(0, c)] == ch[(1, c)], c
    assert ch[(0, 0)] != ch[(1, 0)]
    shared = A.cdc_chunk_dedup(docs, mask_bits=2)
    assert shared.count() == n0 - 1


def test_cdc_fp_is_position_sensitive_within_chunk(spark):
    # same multiset of tokens, different order -> different fingerprint
    # (the weighted sum is order-free to COMPUTE but position-sensitive
    # in VALUE)
    docs = _docs(spark, [(0, "aa bb cc"), (1, "cc bb aa")])
    fps = {r["doc_id"]: r["fp"]
           for r in A.cdc_chunks(docs, mask_bits=20).collect()}
    assert fps[0] != fps[1]


def test_parse_sitemaps_urlset_index_and_garbage(spark):
    from contentextractor_spark.plans.pipeline import parse_sitemaps

    sm = spark.createDataFrame(
        [
            ("h0.example",
             '<?xml version="1.0"?><urlset><url><loc>https://h0.example/p/1'
             '</loc><lastmod>2026-01-01</lastmod></url>'
             '<url><loc>https://h0.example/p/2</loc></url></urlset>'),
            ("h1.example",
             '<sitemapindex><sitemap><loc>https://h1.example/a.xml</loc>'
             '</sitemap></sitemapindex>'),
            ("h2.example", "total garbage, no locs at all"),
        ],
        "host string, xml string",
    )
    out = {(r["host"], r["pos"]): (r["loc"], r["is_index"])
           for r in parse_sitemaps(sm).collect()}
    assert out == {
        ("h0.example", 0): ("https://h0.example/p/1", 0),
        ("h0.example", 1): ("https://h0.example/p/2", 0),
        ("h1.example", 0): ("https://h1.example/a.xml", 1),
    }
