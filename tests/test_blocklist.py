"""UT1-style domain blocklist gate: label-suffix semantics, longest-match
specificity, normalization, the no-row-multiplication guarantee, the deep-
entry refusal, and the broadcast-only join plan."""

import pytest
from pyspark.sql import functions as F

from contentextractor_spark.functions import analysis as A


def _urls(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, url string")


def _bl(spark, domains):
    return spark.createDataFrame([(d,) for d in domains], "domain string")


@pytest.fixture(scope="module")
def gated(spark):
    urls = _urls(
        spark,
        [
            (0, "https://example.org/a"),            # exact match
            (1, "https://a.b.example.org/x?q=1"),    # deep subdomain match
            (2, "https://notexample.org/"),          # endswith trap: clean
            (3, "https://Ads.Example.ORG:443/x"),    # case+port, deeper entry
            (4, "https://clean.example.net/"),       # no entry at any depth
            (5, "https://user@example.org./"),       # userinfo + trailing dot
        ],
    )
    bl = _bl(
        spark,
        [
            "example.org",
            "EXAMPLE.ORG.",        # duplicate after normalization
            "ads.example.org",     # deeper -> must win specificity on (3)
            "xample.org",          # endswith trap entry
        ],
    )
    return {
        r["doc_id"]: (r["blocked"], r["matched_domain"])
        for r in A.domain_blocklist(urls, bl).collect()
    }


def test_label_suffix_semantics(gated):
    assert gated[0] == (1, "example.org")
    assert gated[1] == (1, "example.org")
    # 'notexample.org'.endswith('xample.org') is true — label-boundary
    # matching must keep it clean
    assert gated[2] == (0, None)
    assert gated[4] == (0, None)


def test_longest_match_wins_and_normalization(gated):
    # ads.example.org matches BOTH entries; the deeper one is reported
    assert gated[3] == (1, "ads.example.org")
    # userinfo stripped, trailing host dot stripped -> still matches
    assert gated[5] == (1, "example.org")


def test_duplicate_entries_do_not_multiply_rows(spark):
    urls = _urls(spark, [(i, f"https://h{i}.example.org/") for i in range(8)])
    bl = _bl(spark, ["example.org", "EXAMPLE.ORG", "example.org."])
    out = A.domain_blocklist(urls, bl)
    assert out.count() == 8  # one row per input row, always


def test_deep_entry_refused(spark):
    urls = _urls(spark, [(0, "https://x.example.org/")])
    bl = _bl(spark, ["a.b.c.d.e.f.example.org"])  # 8 labels > max_levels=6
    with pytest.raises(ValueError, match="could never match"):
        A.domain_blocklist(urls, bl)


def test_plan_is_broadcast_only(spark):
    # the URL stream must never shuffle: every depth join is a broadcast
    # hash join (the only Exchanges allowed are the tiny blocklist-side
    # distinct feeding BroadcastExchange)
    urls = _urls(spark, [(0, "https://x.example.org/")])
    bl = _bl(spark, ["example.org"])
    plan = A.domain_blocklist(urls, bl)._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") == A.MAX_BLOCKLIST_LEVELS, plan


# ---------------------------------------------------------------------------
# SURT / CDX index (r5 session-2) — same host-normalization family
# ---------------------------------------------------------------------------


def test_surt_key_cases(spark):
    from pyspark.sql import functions as F

    rows = [
        (0, "https://WWW.Example.ORG/Path/X?q=1#frag"),
        (1, "http://user@a.b.example.com.:8080/"),
        (2, "https://example.net"),          # empty path -> '/'
        (3, "not a url"),                    # schemeless -> NULL
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, url string")
    got = {r["doc_id"]: r["s"] for r in df.select("doc_id", A.surt_key().alias("s")).collect()}
    assert got[0] == "org,example,www)/Path/X?q=1"   # path case kept
    assert got[1] == "com,example,b,a)/"             # userinfo/port/trailing dot stripped
    assert got[2] == "net,example)/"
    assert got[3] is None


def test_cdx_index_sharded_layout(spark):
    rows = [(i, f"https://h{i % 3}.example.org/p/{i}", i * 7 % 50, f"dg{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id bigint, url string, ts bigint, digest string")
    out = A.cdx_index(df, shards=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower(), plan  # the CDX shard layout
    # shard-local sortedness: rows within each partition are (surt, ts)-ordered
    parts = out.select("surt", "ts").rdd.glom().collect()
    for p in parts:
        keys = [(r["surt"], r["ts"]) for r in p]
        assert keys == sorted(keys)
    # no layout job when shards omitted
    plan2 = A.cdx_index(df)._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan2.lower(), plan2


def test_url_templates_mining(spark):
    """Digit runs collapse to {n} in path AND query; host case-folds with
    userinfo stripped and port kept; schemeless rows get host NULL and are
    never merged with the real host; min_count drops singletons;
    example_url is min(url)."""
    from contentextractor_spark.functions.analysis import url_templates

    urls = spark.createDataFrame(
        [("https://a.example/p/123",),
         ("https://a.example/p/456?ref=9",),   # query digit differs -> new tpl
         ("https://a.example/p/7",),
         ("https://u@A.Example:8080/p/88",),   # userinfo+case+port
         ("a.example/p/55",),                   # schemeless
         ("a.example/p/66",),
         ("https://b.example/one-off-3",)],     # singleton
        "url string",
    )
    rows = {(r["host"], r["template"]): (r["n_urls"], r["example_url"])
            for r in url_templates(urls, min_count=2).collect()}
    assert rows == {
        ("a.example", "/p/{n}"): (2, "https://a.example/p/123"),
        (None, "a.example/p/{n}"): (2, "a.example/p/55"),
    }
    # min_count=1 keeps the query-digit, ported-host and singleton groups
    all_rows = {(r["host"], r["template"]): r["n_urls"]
                for r in url_templates(urls, min_count=1).collect()}
    assert all_rows[("a.example", "/p/{n}?ref={n}")] == 1
    assert all_rows[("a.example:8080", "/p/{n}")] == 1
    assert all_rows[("b.example", "/one-off-{n}")] == 1
