"""Unit tests for the r5 session-5 operators: phrase_search (positional
retrieval), bfs_levels (crawl-depth BFS), weighted_sample (deterministic
weighted Bernoulli subsampling)."""

import pytest

from contentextractor_spark.functions import analysis as A


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------- phrase


def test_phrase_basic_and_counts(spark):
    docs = _docs(
        spark,
        [
            (0, "a b c a b"),       # "a b" at 0 and 3
            (1, "b a b a"),         # "a b" at 1
            (2, "c c c"),           # no hit
            (3, "a b"),             # hit at 0 exactly
        ],
    )
    out = {
        r.doc_id: (r.n_hits, r.first_pos)
        for r in A.phrase_search(docs, ["a", "b"]).collect()
    }
    assert out == {0: (2, 0), 1: (1, 1), 3: (1, 0)}


def test_phrase_repeated_terms(spark):
    # phrase with a repeated token: "a a" must need two ADJACENT a's
    docs = _docs(
        spark,
        [
            (0, "a a a"),    # anchors 0 and 1 (overlapping occurrences)
            (1, "a b a"),    # no adjacent pair
            (2, "b a a b"),  # anchor 1
        ],
    )
    out = {
        r.doc_id: (r.n_hits, r.first_pos)
        for r in A.phrase_search(docs, ["a", "a"]).collect()
    }
    assert out == {0: (2, 0), 2: (1, 1)}


def test_phrase_three_terms_and_boundary(spark):
    # match must not wrap: trailing prefix of the phrase is not a hit
    docs = _docs(spark, [(0, "x y z"), (1, "y z x y")])
    out = {r.doc_id: r.first_pos for r in
           A.phrase_search(docs, ["x", "y", "z"]).collect()}
    assert out == {0: 0}


def test_phrase_empty_raises(spark):
    with pytest.raises(ValueError):
        A.phrase_search(_docs(spark, [(0, "a")]), [])


# ---------------------------------------------------------------- BFS


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_bfs_levels_shortest_path_wins(spark):
    # 0->1->2->3 chain plus a shortcut 0->3: dist(3) must be 1, not 3
    edges = _edges(spark, [(0, 1), (1, 2), (2, 3), (0, 3)])
    seeds = spark.createDataFrame([(0,)], "node long")
    out = {r.node: r.dist for r in
           A.bfs_levels(edges, seeds, max_depth=3).collect()}
    assert out == {0: 0, 1: 1, 2: 2, 3: 1}


def test_bfs_levels_depth_bound_and_unreachable(spark):
    # chain 0..5; max_depth=2 keeps nodes within 2 hops only; node 9 is
    # disconnected and must be absent (not null)
    edges = _edges(
        spark, [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (9, 9)]
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    out = {r.node: r.dist for r in
           A.bfs_levels(edges, seeds, max_depth=2).collect()}
    assert out == {0: 0, 1: 1, 2: 2}


def test_bfs_levels_multi_seed_min(spark):
    # two seeds; each node takes the closer one
    edges = _edges(spark, [(0, 1), (1, 2), (5, 4), (4, 2)])
    seeds = spark.createDataFrame([(0,), (5,)], "node long")
    out = {r.node: r.dist for r in
           A.bfs_levels(edges, seeds, max_depth=4).collect()}
    assert out == {0: 0, 5: 0, 1: 1, 4: 1, 2: 2}


def test_bfs_seed_dedup(spark):
    # duplicate seed rows must not duplicate output rows
    edges = _edges(spark, [(0, 1)])
    seeds = spark.createDataFrame([(0,), (0,)], "node long")
    rows = A.bfs_levels(edges, seeds, max_depth=1).collect()
    assert sorted((r.node, r.dist) for r in rows) == [(0, 0), (1, 1)]


# ------------------------------------------------------------- sampling


def _wdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, n_chars long")


def test_weighted_sample_full_weight_always_kept(spark):
    # w >= w_max => P(keep) = 1: every such doc survives
    docs = _wdocs(spark, [(i, 300 + i) for i in range(50)])
    assert A.weighted_sample(docs, w_max=300).count() == 50


def test_weighted_sample_zero_weight_never_kept(spark):
    docs = _wdocs(spark, [(i, 0) for i in range(50)])
    assert A.weighted_sample(docs, w_max=300).count() == 0


def test_weighted_sample_deterministic_and_salted(spark):
    docs = _wdocs(spark, [(i, 150) for i in range(200)])  # P = 1/2
    a = {r.doc_id for r in A.weighted_sample(docs, w_max=300).collect()}
    b = {r.doc_id for r in A.weighted_sample(docs, w_max=300).collect()}
    assert a == b  # same salt => identical sample
    c = {r.doc_id for r in
         A.weighted_sample(docs, w_max=300, salt="ws1").collect()}
    assert a != c  # independent draw
    # P=1/2 over 200 docs: expect ~100, allow wide deterministic band
    assert 60 <= len(a) <= 140


def test_weighted_sample_monotone_in_weight(spark):
    # raising every weight can only ADD docs (same salt, same hash)
    lo = _wdocs(spark, [(i, 100) for i in range(200)])
    hi = _wdocs(spark, [(i, 200) for i in range(200)])
    a = {r.doc_id for r in A.weighted_sample(lo, w_max=300).collect()}
    b = {r.doc_id for r in A.weighted_sample(hi, w_max=300).collect()}
    assert a <= b


# -------------------------------------------------- embedding LSH eval


def test_embedding_lsh_eval_identical_vectors_full_recall(spark):
    # 6 identical vectors: 15 truth pairs at cos 1.0; identical vectors
    # share every band key, so ALL truth pairs must be candidates
    # 6 copies of `base` (15 pairs) + 3 colinear [0,0,0,k] vectors (3
    # pairs, cos exactly 1.0) = 18 truth pairs at t=0.99; each clone/
    # colinear group shares every band key, so all 18 must be candidates
    base = [1.0, 0.5, -0.25, 0.125]
    rows = [(i, base) for i in range(6)] + [
        (10 + i, [0.0, 0.0, 0.0, float(i + 1)]) for i in range(3)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    r = A.embedding_lsh_eval(emb, threshold=0.99).collect()[0]
    assert r.n_true == 18 and r.n_hit == 18 and r.recall_milli == 1000


def test_embedding_lsh_eval_refuses_oversize(spark):
    big = spark.range(A.MAX_EXACT_PAIR_ROWS + 1).selectExpr(
        "id AS vec_id", "array(cast(id as double)) AS embedding"
    )
    with pytest.raises(ValueError, match="embedding_lsh_eval refused"):
        A.embedding_lsh_eval(big)


# ------------------------------------------------------- simhash eval


def test_simhash_eval_uncapped_is_total(spark):
    # 10 clones (45 hamming-0 truth pairs) + 20 distinct docs; cap far
    # above any bucket: cand == truth => 1000/1000
    docs = _docs(
        spark,
        [(i, "same text for every doc") for i in range(10)]
        + [(100 + i, f"tok{i} tok{i+1} tok{i+2}") for i in range(20)],
    )
    r = A.simhash_eval(docs, max_bucket_size=10_000).collect()[0]
    assert r.n_true >= 45 and r.n_cand == r.n_true == r.n_hit
    assert r.recall_milli == 1000 and r.precision_milli == 1000


def test_simhash_eval_cap_drops_pairs(spark):
    # 40 identical docs = one 40-member bucket per band; cap 10 drops all
    # of them from the candidate side while truth keeps the 780 pairs
    docs = _docs(spark, [(i, "same text for every doc") for i in range(40)])
    r = A.simhash_eval(docs, max_bucket_size=10).collect()[0]
    assert r.n_true == 780 and r.n_cand == 0 and r.n_hit == 0
    assert r.recall_milli == 0


# --------------------------------------------------- recrawl priority


def test_recrawl_priority_counts_transitions(spark):
    snaps = spark.createDataFrame(
        [
            # u0: d a a b  -> 2 changes over 3 transitions
            (0, "u0", 1, "d"), (1, "u0", 2, "a"),
            (2, "u0", 3, "a"), (3, "u0", 4, "b"),
            # u1: static
            (4, "u1", 1, "x"), (5, "u1", 2, "x"),
            # u2: single fetch -> 0 changes, denominator clamps to 1
            (6, "u2", 1, "z"),
        ],
        "doc_id long, url string, ts long, digest string",
    )
    out = {r.url: (r.n_fetches, r.n_changes, r.change_milli)
           for r in A.recrawl_priority(snaps).collect()}
    assert out == {"u0": (4, 2, 666), "u1": (2, 0, 0), "u2": (1, 0, 0)}


def test_recrawl_priority_tie_order_deterministic(spark):
    # two fetches at the SAME ts: doc_id breaks the tie, so the sequence
    # is a(1) -> b(2,id=10) -> c(2,id=11) => 2 changes, regardless of
    # input row order
    rows = [
        (10, "u", 2, "b"), (1, "u", 1, "a"), (11, "u", 2, "c"),
    ]
    for perm in (rows, rows[::-1]):
        snaps = spark.createDataFrame(
            perm, "doc_id long, url string, ts long, digest string"
        )
        r = A.recrawl_priority(snaps).collect()[0]
        assert (r.n_fetches, r.n_changes, r.change_milli) == (3, 2, 1000)


# ------------------------------------------------- personalized PPR


def test_personalized_ppr_chain_exact(spark):
    # seed -> a -> b, 2 rounds of the integer convention:
    # p1 = (150000, 850000, 0); p2 = (150000, 127500, 722500)
    edges = _edges(spark, [(0, 1), (1, 2)])
    seeds = spark.createDataFrame([(0,)], "node long")
    out = {r.node: r.rank_micro for r in
           A.personalized_pagerank(edges, seeds, iters=2).collect()}
    assert out == {0: 150000, 1: 127500, 2: 722500}


def test_personalized_ppr_no_teleport_to_nonseeds(spark):
    # a node with no in-edges and no seed status must end at exactly 0
    edges = _edges(spark, [(5, 6), (0, 6)])
    seeds = spark.createDataFrame([(0,)], "node long")
    out = {r.node: r.rank_micro for r in
           A.personalized_pagerank(edges, seeds, iters=2).collect()}
    assert out[5] == 0
    assert out[0] == 150000  # seed keeps only its teleport (no in-edges)
    assert out[6] > 0


def test_personalized_ppr_damping_100_no_divzero(spark):
    # review finding: deriving the seed flag back from tele divided by
    # zero at damping_pct=100 (teleport term is 0 there); the flag is
    # now carried explicitly — pure-damping PPR must run and conserve
    # only propagated mass
    edges = _edges(spark, [(0, 1)])
    seeds = spark.createDataFrame([(0,)], "node long")
    out = {r.node: r.rank_micro for r in
           A.personalized_pagerank(edges, seeds, iters=1,
                                   damping_pct=100).collect()}
    assert out == {0: 0, 1: 1_000_000}


def test_personalized_ppr_duplicate_seed_rows(spark):
    # duplicated seed rows must not double the teleport mass
    edges = _edges(spark, [(0, 1)])
    s1 = spark.createDataFrame([(0,)], "node long")
    s2 = spark.createDataFrame([(0,), (0,)], "node long")
    a = {r.node: r.rank_micro for r in
         A.personalized_pagerank(edges, s1, iters=1).collect()}
    b = {r.node: r.rank_micro for r in
         A.personalized_pagerank(edges, s2, iters=1).collect()}
    assert a == b


# ------------------------------------------------------- index merge


def test_index_merge_equals_one_pass_build(spark):
    docs = _docs(
        spark,
        [(i, f"w{i % 3} w{i % 5} common") for i in range(20)],
    )
    from pyspark.sql import functions as F

    full = {
        (r.term, r.df, tuple(r.postings))
        for r in A.inverted_index(docs).collect()
    }
    even = A.inverted_index(docs.filter(F.col("doc_id") % 2 == 0))
    odd = A.inverted_index(docs.filter(F.col("doc_id") % 2 == 1))
    merged = {
        (r.term, r.df, tuple(r.postings))
        for r in A.inverted_index_merge(even, odd).collect()
    }
    assert merged == full


def test_index_merge_truncates_postings_keeps_df(spark):
    docs = _docs(spark, [(i, "common") for i in range(10)])
    from pyspark.sql import functions as F

    even = A.inverted_index(docs.filter(F.col("doc_id") % 2 == 0))
    odd = A.inverted_index(docs.filter(F.col("doc_id") % 2 == 1))
    r = A.inverted_index_merge(even, odd, max_postings=3).collect()[0]
    assert r.df == 10                      # true frequency survives
    assert list(r.postings) == [0, 1, 2]   # array truncated, sorted


# ------------------------------------------------------ BPE fertility


def test_bpe_fertility_counts(spark):
    # 2 langs, trained on the combined corpus; fertility must be the
    # exact integer ratio of subtokens to words per lang
    docs = spark.createDataFrame(
        [(0, "aa bb aa", "x"), (1, "aa aa", "x"), (2, "cc dd", "y")],
        "doc_id long, text string, lang string",
    )
    out = {r.lang: (r.n_tokens_bpe, r.n_words, r.fertility_milli)
           for r in A.bpe_fertility(docs, n_merges=2).collect()}
    assert set(out) == {"x", "y"}
    for lang, (nb, nw, fm) in out.items():
        assert nb >= nw  # a word is at least one token
        assert fm == nb * 1000 // nw


def test_bpe_fertility_refuses_oversize_merges(spark):
    docs = _docs(spark, [(0, "a b")])
    with pytest.raises(ValueError, match="bpe_fertility refused"):
        A.bpe_fertility(docs, n_merges=A.MAX_BPE_MERGES + 1)


# ---------------------------------------------------- positional index


def test_positional_index_positions_and_df(spark):
    docs = _docs(spark, [(0, "a b a"), (1, "b b"), (2, "c")])
    rows = {(r.term, r.doc_id): (r.df, list(r.positions))
            for r in A.positional_index(docs).collect()}
    assert rows[("a", 0)] == (1, [0, 2])
    assert rows[("b", 0)] == (2, [1])
    assert rows[("b", 1)] == (2, [0, 1])
    assert rows[("c", 2)] == (1, [0])


def test_positional_index_min_df_keeps_true_df(spark):
    docs = _docs(spark, [(0, "a b"), (1, "b")])
    rows = A.positional_index(docs, min_df=2).collect()
    assert {r.term for r in rows} == {"b"}
    assert all(r.df == 2 for r in rows)  # true df survives the filter


# ---------------------------------------------------- proximity search


def test_proximity_counts_pairs_and_min_gap(spark):
    docs = _docs(
        spark,
        [
            (0, "a x b x x a"),   # pairs within 3: (0,2) gap2, (2,5) gap3
            (1, "a x x x b"),     # gap 4 > 3: no hit
            (2, "b a"),           # gap 1
        ],
    )
    out = {r.doc_id: (r.n_pairs, r.min_gap)
           for r in A.proximity_search(docs, "a", "b", window=3).collect()}
    assert out == {0: (2, 2), 2: (1, 1)}


def test_proximity_rejects_same_term_and_bad_window(spark):
    docs = _docs(spark, [(0, "a a")])
    with pytest.raises(ValueError, match="distinct terms"):
        A.proximity_search(docs, "a", "a")
    with pytest.raises(ValueError, match="window"):
        A.proximity_search(docs, "a", "b", window=0)


# ------------------------------------------------------------ snippets


def test_search_snippets_window_and_clamp(spark):
    docs = _docs(
        spark,
        [
            (0, "a b c q d e f"),   # hit at 3: snippet = full ±3 window
            (1, "q x y z w v u"),   # hit at 0: head clamps to start
            (2, "a b q"),           # hit at 2: tail clamps to end
            (3, "no hit here"),     # absent from output
        ],
    )
    out = {r.doc_id: (r.first_pos, r.snippet)
           for r in A.search_snippets(docs, "q", window=3).collect()}
    assert out == {
        0: (3, "a b c q d e f"),
        1: (0, "q x y z"),
        2: (2, "a b q"),
    }


def test_search_snippets_first_hit_only(spark):
    docs = _docs(spark, [(0, "q a a a a q b")])
    out = A.search_snippets(docs, "q", window=1).collect()[0]
    assert (out.first_pos, out.snippet) == (0, "q a")
