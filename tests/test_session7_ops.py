"""Unit tests for the r5 session-7 operators: events attribution
(first/last-touch before the first conversion) and k_anonymity
(quasi-identifier cell audit)."""

import datetime as dt

import pytest

from contentextractor_spark.functions import analysis as A
from contentextractor_spark.functions import events as E


def _ev(spark, rows):
    # rows: (event_id, ts_minute, user_id, event_type, value)
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    data = [
        (eid, base + dt.timedelta(minutes=m), uid, et, val)
        for (eid, m, uid, et, val) in rows
    ]
    return spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )


# ---------------------------------------------------------- attribution


def test_attribution_first_and_last_touch(spark):
    ev = _ev(
        spark,
        [
            (1, 0, 1, "view", 0.0),
            (2, 1, 1, "click", 0.0),
            (3, 2, 1, "purchase", 10.00),
            (4, 3, 1, "purchase", 99.0),  # second purchase: not counted
        ],
    )
    rows = E.attribution(ev).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.first_type, r.last_type) == ("view", "click")
    assert r.n_users == 1
    assert r.sum_value_c == 1000  # only the FIRST purchase's value


def test_attribution_excludes_no_touch_and_no_conversion_users(spark):
    ev = _ev(
        spark,
        [
            (1, 0, 1, "purchase", 5.0),  # converts with no prior touch
            (2, 0, 2, "click", 0.0),  # never converts
        ],
    )
    assert E.attribution(ev).count() == 0


def test_attribution_single_touch_is_both_first_and_last(spark):
    ev = _ev(
        spark,
        [(1, 0, 1, "signup", 0.0), (2, 1, 1, "purchase", 2.50)],
    )
    r = E.attribution(ev).collect()[0]
    assert (r.first_type, r.last_type) == ("signup", "signup")
    assert r.sum_value_c == 250


def test_attribution_ts_tie_breaks_by_event_id(spark):
    # two touches at the SAME ts: event_id orders them (the recrawl
    # convention) — first = lower id, last = higher id
    ev = _ev(
        spark,
        [
            (7, 0, 1, "error", 0.0),
            (3, 0, 1, "view", 0.0),
            (9, 1, 1, "purchase", 1.0),
        ],
    )
    r = E.attribution(ev).collect()[0]
    assert (r.first_type, r.last_type) == ("view", "error")


def test_attribution_touches_after_first_purchase_ignored(spark):
    ev = _ev(
        spark,
        [
            (1, 0, 1, "view", 0.0),
            (2, 1, 1, "purchase", 1.0),
            (3, 2, 1, "click", 0.0),  # post-conversion: must not count
        ],
    )
    r = E.attribution(ev).collect()[0]
    assert (r.first_type, r.last_type) == ("view", "view")


# ---------------------------------------------------------- k_anonymity


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, lang string, source string, n_chars long"
    )


def test_k_anonymity_flags_small_cells(spark):
    docs = _docs(
        spark,
        [(i, "en", "web", 100) for i in range(5)]
        + [(10, "ja", "web", 100), (11, "ja", "web", 100)],
    )
    out = {
        (r.lang, r.source, r.len_band): (r.n_docs, r.risky)
        for r in A.k_anonymity(docs, k=5, band=500).collect()
    }
    assert out == {
        ("en", "web", 0): (5, 0),
        ("ja", "web", 0): (2, 1),
    }


def test_k_anonymity_band_splits_cells(spark):
    docs = _docs(
        spark,
        [(1, "en", "web", 499), (2, "en", "web", 500), (3, "en", "web", 999)],
    )
    out = {
        r.len_band: r.n_docs
        for r in A.k_anonymity(docs, k=2, band=500).collect()
    }
    assert out == {0: 1, 1: 2}


def test_k_anonymity_validates_args(spark):
    docs = _docs(spark, [(1, "en", "web", 10)])
    with pytest.raises(ValueError):
        A.k_anonymity(docs, k=0)
    with pytest.raises(ValueError):
        A.k_anonymity(docs, band=0)


# ---------------------------------------------------- token-stream cards


def _tdocs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )


def test_good_turing_hand_case(spark):
    # counts: a=3 b=2 c=1 → N_1=N_2=N_3=1
    docs = _tdocs(spark, [(0, "a a a b b c", "en")])
    out = {r.r: (r.n_r, r.r_star_micro) for r in A.good_turing(docs).collect()}
    assert out == {
        1: (1, 2_000_000),  # (1+1)*N_2/N_1 = 2
        2: (1, 3_000_000),  # (2+1)*N_3/N_2 = 3
        3: (1, 0),          # N_4 = 0
    }


def test_good_turing_max_r_cut(spark):
    docs = _tdocs(spark, [(0, " ".join(["x"] * 20) + " y", "en")])
    rs = {r.r for r in A.good_turing(docs, max_r=5).collect()}
    assert rs == {1}  # x's r=20 is cut, y's r=1 kept


def test_distinct_ngrams_hand_case(spark):
    docs = _tdocs(spark, [(0, "a b a b", "en")])
    r = A.distinct_ngrams(docs, n=2).collect()[0]
    # bigrams: "a b", "b a", "a b" → 3 occurrences, 2 types
    assert (r.n_grams, r.n_distinct, r.distinct_permille) == (3, 2, 666)


def test_ngram_novelty_duplicate_doc_contributes_nothing(spark):
    docs = _tdocs(
        spark, [(0, "a b c d", "en"), (1, "a b c d", "en")]
    )
    out = {
        r.bucket: (r.n_occ, r.n_novel, r.novelty_permille)
        for r in A.ngram_novelty(docs, n=3, n_buckets=2).collect()
    }
    # each doc has 2 trigrams; doc 1 repeats doc 0's exactly
    assert out == {0: (2, 2, 1000), 1: (2, 0, 0)}


def test_ngram_novelty_repeats_inside_first_doc_count_novel(spark):
    docs = _tdocs(spark, [(0, "a b c a b c a b", "en")])
    out = A.ngram_novelty(docs, n=3, n_buckets=1).collect()[0]
    # 6 trigram occurrences, all in the min doc → all novel
    assert (out.n_occ, out.n_novel, out.novelty_permille) == (6, 6, 1000)


# ------------------------------------------------------------ qlm_search


def test_qlm_exact_micro_nats(spark):
    import math

    docs = _tdocs(
        spark, [(0, "a b c d", "en"), (1, "a a b b", "en")]
    )
    out = {r.doc_id: r.score_micro for r in A.qlm_search(docs, ["a"]).collect()}
    n_tok, mu = 8, 2000
    cf = 3

    def score(tf, dl):
        return (
            math.floor(math.log(tf * n_tok + mu * cf) * 1e6)
            - math.floor(math.log(dl + mu) * 1e6)
            - math.floor(math.log(n_tok) * 1e6)
        )

    assert out == {0: score(1, 4), 1: score(2, 4)}
    assert out[1] > out[0]  # higher tf, same length → higher likelihood


def test_qlm_missing_term_still_contributes_smoothed_mass(spark):
    # both docs contain 'a'; only doc 0 contains 'b' → doc 0 must rank
    # first even though tf_a is equal (the smoothing-only 'b' term on
    # doc 1 is worth less than doc 0's observed one)
    docs = _tdocs(spark, [(0, "a b", "en"), (1, "a c", "en")])
    rows = A.qlm_search(docs, ["a", "b"]).collect()
    top = min(rows, key=lambda r: r.rank)
    assert top.doc_id == 0
    assert len(rows) == 2  # doc 1 is still a candidate (has 'a')


def test_qlm_corpus_absent_term_is_dropped(spark):
    docs = _tdocs(spark, [(0, "a b", "en"), (1, "a c", "en")])
    with_ghost = {
        r.doc_id: r.score_micro
        for r in A.qlm_search(docs, ["a", "zzz"]).collect()
    }
    without = {
        r.doc_id: r.score_micro for r in A.qlm_search(docs, ["a"]).collect()
    }
    assert with_ghost == without


def test_qlm_validates_args(spark):
    docs = _tdocs(spark, [(0, "a", "en")])
    with pytest.raises(ValueError):
        A.qlm_search(docs, [])
    with pytest.raises(ValueError):
        A.qlm_search(docs, ["a"], mu=0)


# ---------------------------------------------------------- extract_lists


def _run_list_walker(html_bytes, url="1"):
    import pandas as pd

    from contentextractor_spark.plans.pipeline import _extract_list_batches

    pdf = pd.DataFrame({"url": [url], "html": [html_bytes], "bucket_id": [0]})
    frames = list(_extract_list_batches(iter([pdf])))
    if not frames:
        return []
    out = pd.concat(frames)
    return list(
        out[["list_idx", "list_type", "item_idx", "item"]].itertuples(
            index=False, name=None
        )
    )


def test_list_walker_nested_list_gets_own_idx_and_text_rides_up():
    rows = _run_list_walker(
        b"<html><body><ul><li>alpha one</li>"
        b"<li>beta <ul><li>nested x</li></ul></li></ul>"
        b"<ol><li>first</li><li>second</li></ol></body></html>"
    )
    assert rows == [
        (0, "ul", 0, "alpha one"),
        # enclosing item text INCLUDES nested list text (jsoup rule)
        (0, "ul", 1, "beta nested x"),
        # nested list is its own list_idx, in preorder BEFORE the <ol>
        (1, "ul", 0, "nested x"),
        (2, "ol", 0, "first"),
        (2, "ol", 1, "second"),
    ]


def test_list_walker_empty_list_contributes_no_rows():
    rows = _run_list_walker(b"<html><body><ul></ul><ol><li>a</li></ol></body></html>")
    # the empty <ul> still consumes list_idx 0 (preorder numbering)
    assert rows == [(1, "ol", 0, "a")]


def test_list_walker_poison_page_zero_rows():
    assert _run_list_walker(b"\xff\xfe\x00 garbage \x00") in ([],)


# ------------------------------------------------------- curriculum_order


def test_curriculum_bands_by_alpha_ratio(spark):
    docs = _tdocs(
        spark,
        [
            (0, "abcdefgh", "en"),      # q = 8000/9 = 888 → band 0
            (1, "ab 12 345 678 9", "en"),  # q = 2000/16 = 125 → band 3
        ],
    )
    out = {r.doc_id: r.band for r in A.curriculum_order(docs).collect()}
    assert out == {0: 0, 1: 3}


def test_curriculum_pos_contiguous_within_band_shard(spark):
    docs = _tdocs(spark, [(i, "alpha beta", "en") for i in range(40)])
    rows = A.curriculum_order(docs, n_shards=4).collect()
    groups = {}
    for r in rows:
        groups.setdefault((r.band, r.shard), []).append(r.pos)
    for poss in groups.values():
        assert sorted(poss) == list(range(len(poss)))


def test_curriculum_seed_changes_permutation_not_bands(spark):
    docs = _tdocs(spark, [(i, "alpha beta", "en") for i in range(60)])
    a = {r.doc_id: (r.band, r.shard, r.pos)
         for r in A.curriculum_order(docs, seed="cur0").collect()}
    b = {r.doc_id: (r.band, r.shard, r.pos)
         for r in A.curriculum_order(docs, seed="cur1").collect()}
    assert {k: v[0] for k, v in a.items()} == {k: v[0] for k, v in b.items()}
    assert a != b  # the shard/pos permutation moved
    # same seed reproduces exactly
    c = {r.doc_id: (r.band, r.shard, r.pos)
         for r in A.curriculum_order(docs, seed="cur0").collect()}
    assert a == c


# ---------------------------------------------------- batched retrieval


def _qdf(spark, rows):
    return spark.createDataFrame(rows, "query_id long, term string")


def test_bm25_batch_matches_single_query_ranking(spark):
    docs = _tdocs(
        spark,
        [
            (0, "x x y filler filler", "en"),
            (1, "x filler filler filler filler", "en"),
            (2, "filler filler filler filler filler", "en"),
            (3, "y y x x filler", "en"),
        ],
    )
    batch = {
        (r.query_id, r.doc_id): r.rank
        for r in A.bm25_batch(docs, _qdf(spark, [(9, "x"), (9, "y")])).collect()
    }
    single = {
        r.doc_id: r.rank for r in A.bm25_search(docs, ["x", "y"]).collect()
    }
    assert {d: rk for (q, d), rk in batch.items()} == single


def test_bm25_batch_scores_queries_independently(spark):
    docs = _tdocs(
        spark, [(0, "a b filler", "en"), (1, "c d filler", "en")]
    )
    out = A.bm25_batch(
        docs, _qdf(spark, [(10, "a"), (11, "c")])
    ).collect()
    got = {(r.query_id, r.doc_id, r.rank) for r in out}
    assert got == {(10, 0, 1), (11, 1, 1)}  # no cross-query leakage


def test_retrieval_eval_perfect_corpus(spark):
    # each query's terms are unique to its truth doc → every hit at rank 1
    docs = _tdocs(
        spark,
        [(i, f"tok{i}a tok{i}b filler filler", "en") for i in range(4)],
    )
    qs = _qdf(
        spark,
        [(i, f"tok{i}a") for i in range(4)]
        + [(i, f"tok{i}b") for i in range(4)],
    )
    r = A.retrieval_eval(docs, qs, k=3).collect()[0]
    assert (r.n_queries, r.n_hits, r.hits_at_1, r.rr_milli_sum) == (4, 4, 4, 4000)


def test_retrieval_eval_zero_hits_row_is_zeros(spark):
    docs = _tdocs(spark, [(0, "a b", "en"), (1, "a c", "en")])
    # query 99's terms match docs, but truth doc 99 doesn't exist
    r = A.retrieval_eval(docs, _qdf(spark, [(99, "a")]), k=2).collect()[0]
    assert (r.n_queries, r.n_hits, r.hits_at_1, r.rr_milli_sum) == (1, 0, 0, 0)


# ------------------------------------------------- langid_eval / dup card


def test_langid_eval_confusion_cells(spark):
    docs = spark.createDataFrame(
        [
            (0, "hello plain words", "en", "web"),
            (1, "more latin text", "en", "web"),
            (2, "こんにちは世界です", "ja", "web"),
            (3, "short", "ja", "web"),  # ja-labeled but latin-pred
        ],
        "doc_id long, text string, lang string, source string",
    )
    out = {
        (r.true_lang, r.pred_lang): (r.n_docs, r.cell_permille)
        for r in A.langid_eval(docs).collect()
    }
    assert out == {
        ("en", "latin"): (2, 1000),
        ("ja", "cjk"): (1, 500),
        ("ja", "latin"): (1, 500),
    }


def test_dup_rate_by_source(spark):
    docs = spark.createDataFrame(
        [
            (0, "same", "en", "a"),
            (1, "same", "en", "a"),
            (2, "other", "en", "a"),
            (3, "same", "en", "b"),  # cross-source copy is NOT a dup here
            (4, None, "en", "b"),    # null text excluded
        ],
        "doc_id long, text string, lang string, source string",
    )
    out = {
        r.source: (r.n_docs, r.n_unique, r.dup_permille)
        for r in A.dup_rate_by_source(docs).collect()
    }
    assert out == {"a": (3, 2, 333), "b": (1, 1, 0)}


# --------------------------------------------------------- badwords gate


def test_badwords_word_boundary_and_case(spark):
    docs = _tdocs(
        spark,
        [
            (0, "clean text here", "en"),
            (1, "has ZetaFlag! twice zetaflag", "en"),  # case + punct
            (2, "zetaflagged compound", "en"),  # substring must NOT hit
            (3, "omegaflag and zetaflag", "en"),
        ],
    )
    out = {
        r.doc_id: (r.n_flagged_types, r.kept)
        for r in A.badwords_filter(docs, ["zetaflag", "OMEGAFLAG"]).collect()
    }
    assert out == {
        0: (0, 1),
        1: (1, 0),  # distinct types, not occurrences
        2: (0, 1),
        3: (2, 0),
    }


def test_badwords_refuses_oversized_list(spark):
    docs = _tdocs(spark, [(0, "a", "en")])
    with pytest.raises(ValueError):
        A.badwords_filter(docs, [f"w{i}" for i in range(A.MAX_BADWORDS + 1)])
    with pytest.raises(ValueError):
        A.badwords_filter(docs, [])


# ----------------------------------------------------------- hybrid RRF


def _edf(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_hybrid_rrf_fuses_both_sides(spark):
    docs = _tdocs(
        spark,
        [
            (0, "alpha beta filler", "en"),
            (1, "alpha gamma filler", "en"),
            (2, "delta epsilon filler", "en"),
        ],
    )
    emb = _edf(
        spark,
        [
            (0, [1.0, 0.0], 0),
            (1, [0.9, 0.1], 0),  # closest to vec 0
            (2, [0.0, 1.0], 0),
        ],
    )
    qs = _qdf(spark, [(0, "alpha")])
    out = {r.doc_id: r for r in A.hybrid_search(docs, emb, qs, k=3).collect()}
    # doc 1: text hit (has 'alpha', rank 2 behind doc 0? doc 0 is the
    # query itself and also matches text) AND vector rank 1 → must fuse
    assert 1 in out and out[1].text_rank > 0 and out[1].vec_rank == 1
    # doc 2: no 'alpha' → text_rank 0, but still ranked by vector side
    assert out[2].text_rank == 0 and out[2].vec_rank > 0
    # rrf of doc 1 = 1e6//(60+text) + 1e6//(60+1)
    assert out[1].rrf_micro == 1000000 // (60 + out[1].text_rank) + 1000000 // 61


def test_hybrid_missing_vector_side_is_text_only(spark):
    docs = _tdocs(spark, [(0, "alpha x", "en"), (1, "alpha y", "en")])
    emb = _edf(spark, [(5, [1.0, 0.0], 0), (6, [0.0, 1.0], 0)])
    qs = _qdf(spark, [(0, "alpha")])  # query 0 has no embedding
    out = {r.doc_id: r for r in A.hybrid_search(docs, emb, qs, k=5).collect()}
    assert all(r.vec_rank == 0 for r in out.values())
    assert {d for d in out} == {0, 1}


# ----------------------------------------------------------- KN bigram LM


def test_kn_surprisal_exact_hand_case(spark):
    import math

    # corpus: one doc "a b a b a c" → bigrams: ab, ba, ab, ba, ac
    # c12: ab=2, ba=2, ac=1; c1: a=3 (ab+ac), b=2; N1p(a·)=2, N1p(b·)=1
    # N1p(·b)=1, N1p(·a)=1, N1p(·c)=1, N1p(··)=3
    docs = _tdocs(spark, [(0, "a b a b a c", "en")])
    out = A.kn_surprisal(docs).collect()[0]
    D = 0.75

    def p(c12, c1, n1p_l, n1p_r):
        return max(c12 - D, 0.0) / c1 + D * n1p_l / c1 * n1p_r / 3

    def nll(c12, c1, n1p_l, n1p_r):
        return -math.floor(math.log(p(c12, c1, n1p_l, n1p_r)) * 1e6)

    want = (
        2 * nll(2, 3, 2, 1)  # ab ×2
        + 2 * nll(2, 2, 1, 1)  # ba ×2
        + 1 * nll(1, 3, 2, 1)  # ac
    )
    assert (out.n_bigrams, out.kn_micro) == (5, want)


def test_kn_surprisal_repetitive_doc_scores_lower(spark):
    # two docs, same length: the templated one must carry less surprisal
    docs = _tdocs(
        spark,
        [
            (0, "x y x y x y x y", "en"),
            (1, "x q y r x s y t", "en"),
        ],
    )
    out = {r.doc_id: r.kn_micro for r in A.kn_surprisal(docs).collect()}
    assert out[0] < out[1]


def test_kn_surprisal_validates_discount(spark):
    docs = _tdocs(spark, [(0, "a b", "en")])
    with pytest.raises(ValueError):
        A.kn_surprisal(docs, discount_milli=0)
    with pytest.raises(ValueError):
        A.kn_surprisal(docs, discount_milli=1000)


# ------------------------------------------------------------- PRF terms


def test_prf_terms_mines_feedback_docs_excluding_query(spark):
    docs = _tdocs(
        spark,
        [
            (0, "alpha beta beta gamma", "en"),
            (1, "alpha beta delta", "en"),
            (2, "zzz yyy xxx", "en"),  # no 'alpha' → not feedback
        ],
    )
    qs = _qdf(spark, [(9, "alpha")])
    out = {(r.term): (r.tf_sum, r.rk)
           for r in A.prf_terms(docs, qs, fb_docs=5, k_terms=3).collect()}
    # feedback docs are 0 and 1; 'alpha' excluded (query term)
    assert "alpha" not in out
    assert out["beta"] == (3, 1)
    # gamma/delta tie at 1 → term ASC ranks delta before gamma
    assert out["delta"] == (1, 2) and out["gamma"] == (1, 3)
    assert "zzz" not in out


def test_prf_terms_validates_args(spark):
    docs = _tdocs(spark, [(0, "a b", "en")])
    qs = _qdf(spark, [(0, "a")])
    with pytest.raises(ValueError):
        A.prf_terms(docs, qs, fb_docs=0)
    with pytest.raises(ValueError):
        A.prf_terms(docs, qs, k_terms=0)
