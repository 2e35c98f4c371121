"""Unit tests for the r5 session-6 operators: compaction_plan (small-file
bin-packing), rendezvous_shards (HRW placement + removal stability),
postings_gap_stats (delta-encoded index sizing), domain_quality_prior
(empirical-Bayes source prior)."""

import pytest

from contentextractor_spark.functions import analysis as A


def _files(spark, rows):
    return spark.createDataFrame(rows, "part string, file_id long, size long")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ----------------------------------------------------------- compaction


def test_compaction_bins_hand_case(spark):
    # one partition, target 100: order by (size desc, id) =
    # 90(f1) 60(f2) 60(f3) 10(f4); cum-before = 0, 90, 150, 210
    # → bins 0, 0, 1, 2
    files = _files(
        spark,
        [("p", 1, 90), ("p", 2, 60), ("p", 3, 60), ("p", 4, 10)],
    )
    out = {r.file_id: r.bin for r in A.compaction_plan(files, 100).collect()}
    assert out == {1: 0, 2: 0, 3: 1, 4: 2}


def test_compaction_oversized_file_leads_own_bin(spark):
    # a file >= target: nothing later joins ITS bin start boundary
    files = _files(spark, [("p", 1, 250), ("p", 2, 10), ("p", 3, 10)])
    out = {r.file_id: r.bin for r in A.compaction_plan(files, 100).collect()}
    # cum-before: 0, 250, 260 → bins 0, 2, 2
    assert out == {1: 0, 2: 2, 3: 2}


def test_compaction_partitions_independent(spark):
    files = _files(spark, [("a", 1, 50), ("b", 2, 50), ("a", 3, 60)])
    rows = A.compaction_plan(files, 100).collect()
    by_part = {(r.part, r.file_id): r.bin for r in rows}
    # each partition restarts at bin 0
    assert by_part[("a", 3)] == 0 and by_part[("b", 2)] == 0
    # within a: 60(f3) first (cum-before 0 → bin 0), 50(f1) cum-before 60
    assert by_part[("a", 1)] == 0


def test_compaction_bin_fill_property(spark):
    # every non-last bin in a partition must have total >= a positive
    # fraction of target: by construction total >= target - overhang,
    # and the STRONGER invariant is that the bin's cum range covers
    # [b*T, (b+1)*T) — check totals against that
    import random

    rng = random.Random(7)
    rows = [("p", i, rng.randrange(1, 400)) for i in range(200)]
    files = _files(spark, rows)
    plan = A.compaction_plan(files, 1000).collect()
    totals = {}
    for r in plan:
        totals[r.bin] = totals.get(r.bin, 0) + r.size
    last = max(totals)
    for b, tot in totals.items():
        if b != last:
            # a bin ends only once cumsum crosses its upper boundary,
            # so bin total > T - max_file_size is guaranteed; with
            # sizes < 400 and T=1000 that means > 600
            assert tot > 600, (b, tot)


def test_compaction_rejects_bad_target(spark):
    files = _files(spark, [("p", 1, 10)])
    with pytest.raises(ValueError):
        A.compaction_plan(files, 0)


# ----------------------------------------------------------- rendezvous


def test_rendezvous_stability_default_removed(spark):
    docs = _docs(spark, [(i, "x") for i in range(300)])
    rows = A.rendezvous_shards(docs, n_shards=8).collect()
    assert len(rows) == 300
    for r in rows:
        assert 0 <= r.shard < 8
        assert 0 <= r.shard_after < 7  # shard 7 removed
        # THE rendezvous property: only the removed shard's keys move
        assert (r.moved == 1) == (r.shard == 7), r
    # sane spread: every shard should win something at n=300
    assert len({r.shard for r in rows}) == 8


def test_rendezvous_explicit_removed_shard(spark):
    docs = _docs(spark, [(i, "x") for i in range(200)])
    rows = A.rendezvous_shards(docs, n_shards=5, removed=2).collect()
    for r in rows:
        assert (r.moved == 1) == (r.shard == 2)
        assert r.shard_after != 2


def test_rendezvous_unmoved_keep_exact_shard(spark):
    docs = _docs(spark, [(i, "x") for i in range(200)])
    rows = A.rendezvous_shards(docs, n_shards=8).collect()
    for r in rows:
        if r.moved == 0:
            assert r.shard_after == r.shard


def test_rendezvous_bounds(spark):
    docs = _docs(spark, [(0, "x")])
    with pytest.raises(ValueError):
        A.rendezvous_shards(docs, n_shards=1)
    with pytest.raises(ValueError):
        A.rendezvous_shards(docs, n_shards=17)
    with pytest.raises(ValueError):
        A.rendezvous_shards(docs, n_shards=4, removed=4)


# ------------------------------------------------------------- postings


def test_postings_gaps_hand_case(spark):
    # term 'a' in docs 0, 2, 5: gaps 1 (=0+1), 2, 3 → bits 1+2+2 = 5,
    # vbyte 1+1+1 = 3; term 'b' in doc 3 only: gap 4 → bits 3
    docs = _docs(spark, [(0, "a"), (2, "a a"), (3, "b"), (5, "a")])
    out = {
        r.term: (r.df, r.bits_delta, r.bytes_vbyte)
        for r in A.postings_gap_stats(docs).collect()
    }
    assert out["a"] == (3, 5, 3)
    assert out["b"] == (1, 3, 1)


def test_postings_min_df_prunes(spark):
    docs = _docs(spark, [(0, "a b"), (1, "a")])
    out = {r.term for r in A.postings_gap_stats(docs, min_df=2).collect()}
    assert out == {"a"}


def test_postings_large_gap_bits(spark):
    # doc_id 1023 alone: first gap 1024 → bitlen 11
    docs = _docs(spark, [(1023, "z")])
    r = A.postings_gap_stats(docs).collect()[0]
    assert (r.bits_delta, r.bytes_vbyte) == (11, 2)


# ---------------------------------------------------------------- prior


def test_prior_k0_is_mean(spark):
    docs = spark.createDataFrame(
        [(0, "abcd", "s1"), (1, "a1b2", "s1"), (2, "1234", "s2")],
        "doc_id long, text string, source string",
    )
    out = {
        r.source: (r.n_docs, r.mean_micro, r.prior_micro)
        for r in A.domain_quality_prior(docs, k=0).collect()
    }
    # q = alpha*1000 div (len+1): s1 docs → 4000 div 5 = 800,
    # 2000 div 5 = 400 (permille); micro outputs = mean * 1000
    assert out["s1"] == (2, 600_000, 600_000)
    assert out["s2"] == (1, 0, 0)


def test_prior_shrinks_toward_corpus_mean(spark):
    # tiny domain with extreme score must land between its own mean and
    # the corpus mean
    rows = [(i, "1111", "big") for i in range(50)] + [(99, "aaaa", "tiny")]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    out = {r.source: r for r in A.domain_quality_prior(docs, k=20).collect()}
    gm_micro = 800 * 1000 // 51  # corpus q sum = 800 permille over 51 docs
    assert out["tiny"].mean_micro == 800_000
    assert gm_micro < out["tiny"].prior_micro < 800_000
    # exact: (800*1000 + 20*15686) div 21
    assert out["tiny"].prior_micro == (800_000 + 20 * gm_micro) // 21
    with pytest.raises(ValueError):
        A.domain_quality_prior(docs, k=-1)


# --------------------------------------------------------------- textrank


def test_textrank_hub_token_wins(spark):
    # 'x' co-occurs with every other token; star graphs rank the hub first
    docs = _docs(
        spark,
        [(0, "x a"), (1, "x b"), (2, "x c"), (3, "x d"), (4, "x e")],
    )
    rows = A.textrank_keywords(docs, iters=2, k=3).collect()
    assert rows[0].term == "x" and rows[0].rk == 1
    assert len(rows) == 3
    # rk is dense 1..k over the survivors
    assert [r.rk for r in rows] == [1, 2, 3]


def test_textrank_self_loops_and_single_token_docs_ignored(spark):
    # 'z z' contributes no edge (self-loop dropped); one-token docs have
    # no bigrams at all — only the a-b edge remains
    docs = _docs(spark, [(0, "z z"), (1, "q"), (2, "a b")])
    rows = A.textrank_keywords(docs, iters=1, k=10).collect()
    assert {r.term for r in rows} == {"a", "b"}
    # symmetric 2-node graph: equal ranks, tie broken by term
    assert rows[0].term == "a" and rows[0].rank_micro == rows[1].rank_micro


def test_textrank_trailing_empty_token_gram(spark):
    # regression: text ending in a space yields an empty trailing token;
    # the incomplete tail gram must not ERROR under ANSI (F.get fix) —
    # full evaluation, not .count()
    docs = _docs(spark, [(0, "a b "), (1, "a b")])
    rows = A.textrank_keywords(docs, iters=1, k=10).collect()
    terms = {r.term for r in rows}
    assert "a" in terms and "b" in terms and "" in terms


# -------------------------------------------------------------- anomalies


def test_hourly_anomalies_flags_spike_only(spark):
    from datetime import datetime

    from contentextractor_spark.functions import events as E

    # type 'a': five quiet hours of 1 + one hour of 10 →
    # dev² = 45² = 2025 > z²·varn2 = 4·405 = 1620 → flagged, side +1
    rows = []
    for h in range(5):
        rows.append((datetime(2024, 1, 1, h), "a"))
    rows += [(datetime(2024, 1, 1, 5), "a")] * 10
    ev = spark.createDataFrame(rows, "ts timestamp, event_type string")
    out = E.hourly_anomalies(ev, z=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_events, r.n_hours, r.side) == (10, 6, 1)
    assert r.hour.hour == 5


def test_hourly_anomalies_trough_side_and_uniform_silent(spark):
    from datetime import datetime

    from contentextractor_spark.functions import events as E

    rows = []
    for h in range(6):
        rows += [(datetime(2024, 1, 2, h), "b")] * 10
    rows += [(datetime(2024, 1, 2, 6), "b")] * 1  # trough hour
    ev = spark.createDataFrame(rows, "ts timestamp, event_type string")
    out = E.hourly_anomalies(ev, z=2).collect()
    assert [(r.n_events, r.side) for r in out] == [(1, -1)]
    # perfectly uniform type: zero variance, zero deviation → no rows
    ev2 = spark.createDataFrame(
        [(datetime(2024, 1, 3, h), "c") for h in range(4)],
        "ts timestamp, event_type string",
    )
    assert E.hourly_anomalies(ev2, z=2).count() == 0
    with pytest.raises(ValueError):
        E.hourly_anomalies(ev2, z=0)


# -------------------------------------------------------------------- oov


def test_oov_rate_differential(spark):
    # every doc = shared token 'x' + a doc-unique token: recompute the
    # expected OOV per (split, lang) in plain python over the SAME
    # md5-bucket split and compare exactly
    docs = spark.createDataFrame(
        [(i, f"x u{i} x", "en" if i % 2 else "de") for i in range(40)],
        "doc_id long, text string, lang string",
    )
    splits = {
        r.doc_id: r.split
        for r in A.train_split_assign(docs).select("doc_id", "split").collect()
    }
    train_vocab = {"x"} | {
        f"u{i}" for i in range(40) if splits[i] == "train"
    }
    expected = {}
    for i in range(40):
        sp = splits[i]
        if sp == "train":
            continue
        lang = "en" if i % 2 else "de"
        toks = ["x", f"u{i}", "x"]
        nt, no = expected.get((sp, lang), (0, 0))
        expected[(sp, lang)] = (
            nt + len(toks),
            no + sum(1 for t in toks if t not in train_vocab),
        )
    got = {
        (r.split, r.lang): (r.n_tokens, r.n_oov, r.oov_permille)
        for r in A.oov_rate(docs).collect()
    }
    assert set(got) == set(expected)
    for key, (nt, no) in expected.items():
        assert got[key] == (nt, no, no * 1000 // nt), key
