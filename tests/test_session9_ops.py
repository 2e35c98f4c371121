"""Session-9 operators: interval join boundary semantics + plan shape,
NDCG discount-table exactness and range."""

import datetime
import math

from pyspark.sql import functions as F

from contentextractor_spark.functions import analysis as A
from contentextractor_spark.functions import events as E


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string"
    )


def _t(s):
    return datetime.datetime.fromisoformat(s)


def test_interval_join_boundaries(spark):
    # anchor event 0 at 10:00; window [10:00, 11:30): the 11:30:00.000000
    # event is EXCLUDED (end-exclusive), 10:00 itself (the anchor) and
    # 11:29:59.999999 are INCLUDED; other-user events never match
    rows = [
        (0, _t("2024-01-01T10:00:00"), 1, "a", 0.0, ""),
        (1, _t("2024-01-01T11:29:59.999999"), 1, "b", 0.0, ""),
        (2, _t("2024-01-01T11:30:00"), 1, "c", 0.0, ""),
        (3, _t("2024-01-01T10:30:00"), 2, "a", 0.0, ""),
        (4, _t("2024-01-01T09:59:59.999999"), 1, "a", 0.0, ""),
    ]
    out = E.interval_count_join(
        _ev(spark, rows), anchor_mod=50, window_s=5400
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["anchor_id"], r["user_id"]) == (0, 1)
    assert r["n_events"] == 2  # events 0 and 1
    assert r["n_types"] == 2   # a, b


def test_interval_join_chunk_invariance(spark):
    # the chunked equi-join is an implementation detail: shrinking the
    # chunk (more fanout) must not change the result
    rows = [
        (0, _t("2024-01-01T10:00:00"), 1, "a", 0.0, ""),
        (1, _t("2024-01-01T10:59:00"), 1, "b", 0.0, ""),
        (2, _t("2024-01-01T11:20:00"), 1, "b", 0.0, ""),
        (50, _t("2024-01-01T10:40:00"), 1, "c", 0.0, ""),
    ]
    df = _ev(spark, rows)
    a = sorted(
        map(tuple, E.interval_count_join(df, chunk_s=3600).collect())
    )
    b = sorted(
        map(tuple, E.interval_count_join(df, chunk_s=600).collect())
    )
    assert a == b and len(a) == 2


def test_interval_join_no_bnlj(spark):
    rows = [(0, _t("2024-01-01T10:00:00"), 1, "a", 0.0, "")]
    plan = E.interval_count_join(_ev(spark, rows))._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_ndcg_discounts_are_floor_of_log2():
    d = dict(A.ndcg_discounts(10))
    assert d[1] == 1_000_000
    for r, w in d.items():
        exact = 1_000_000.0 / math.log2(r + 1)
        assert w == math.floor(exact)
        assert 0 < w <= 1_000_000


def test_ndcg_perfect_ranking_is_1000(spark):
    # two docs; the query's terms all come from doc 0, which therefore
    # ranks first AND is the unique ideal head -> ndcg_milli == 1000
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma", "en", "s", 16),
         (1, "delta epsilon zeta", "en", "s", 18)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    queries = spark.createDataFrame(
        [(0, "alpha"), (0, "beta")], "query_id long, term string"
    )
    out = {r["query_id"]: r for r in A.ndcg_eval(docs, queries, k=10).collect()}
    assert out[0]["ndcg_milli"] == 1000
    assert out[0]["dcg_micro"] == out[0]["idcg_micro"] > 0


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_adamic_adar_path_graph(spark):
    # path 1-2-3: only candidate pair is (1,3) via center 2 (deg 2);
    # score = floor(1e6 / ln(2)); edges (1,2)/(2,3) are NOT emitted
    out = A.adamic_adar(_edges(spark, [(1, 2), (2, 3)]), max_deg=8).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["a"], r["b"], r["n_common"]) == (1, 3, 1)
    assert r["score_micro"] == math.floor(1_000_000.0 / math.log(2.0))


def test_adamic_adar_excludes_existing_edges(spark):
    # triangle 1-2-3: every candidate pair is already an edge -> empty
    out = A.adamic_adar(
        _edges(spark, [(1, 2), (2, 3), (1, 3)]), max_deg=8
    ).collect()
    assert out == []


def test_adamic_adar_cap_drops_hub_center(spark):
    # star: center 0 with 5 leaves; max_deg=4 excludes the only possible
    # wedge center -> no pairs, and the overflow twin reports node 0
    star = [(0, i) for i in range(1, 6)]
    assert A.adamic_adar(_edges(spark, star), max_deg=4).count() == 0
    ov = A.adamic_adar_overflow(_edges(spark, star), max_deg=4).collect()
    assert [(r["node"], r["deg"]) for r in ov] == [(0, 5)]
    # uncapped, the star yields C(5,2)=10 pairs each weighted by deg 5
    up = A.adamic_adar(_edges(spark, star), max_deg=8)
    rows = up.collect()
    assert len(rows) == 10
    w5 = math.floor(1_000_000.0 / math.log(5.0))
    assert all(r["score_micro"] == w5 and r["n_common"] == 1 for r in rows)


def test_l_diversity_risky_flag(spark):
    rows = [
        # hour 10, type a: 3 users -> not risky at l=3
        (0, _t("2024-01-01T10:00:00"), 1, "a", 0.0, ""),
        (1, _t("2024-01-02T10:30:00"), 2, "a", 0.0, ""),
        (2, _t("2024-01-03T10:59:00"), 3, "a", 0.0, ""),
        # hour 11, type a: 1 user, 2 events -> risky
        (3, _t("2024-01-01T11:00:00"), 7, "a", 0.0, ""),
        (4, _t("2024-01-01T11:30:00"), 7, "a", 0.0, ""),
    ]
    out = {
        (r["event_type"], r["hod"]): r
        for r in A.l_diversity(_ev(spark, rows), l=3).collect()
    }
    assert out[("a", 10)]["n_users"] == 3 and out[("a", 10)]["risky"] == 0
    assert out[("a", 11)]["n_users"] == 1 and out[("a", 11)]["risky"] == 1
    assert out[("a", 11)]["n_events"] == 2


def test_ndcg_bounded(spark):
    docs = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2} common", "en", "s", 10) for i in range(8)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    queries = spark.createDataFrame(
        [(0, "common"), (0, "w1"), (4, "common")],
        "query_id long, term string",
    )
    for r in A.ndcg_eval(docs, queries, k=10).collect():
        assert 0 <= r["ndcg_milli"] <= 1000
        assert r["dcg_micro"] <= r["idcg_micro"]


# ---------------------------------------------------------- t_closeness


def _docs_tc(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    )


def test_t_closeness_identical_cell_is_zero(spark):
    # two cells with the SAME band distribution as the global one →
    # t_micro 0 for both (EMD of identical distributions)
    rows = [
        (i, "x", "en", "s%d" % (i % 2), 25 + 100 * (i % 3))
        for i in range(60)
    ]
    out = {
        (r["lang"], r["source"]): r["t_micro"]
        for r in A.t_closeness(_docs_tc(spark, rows), band=50).collect()
    }
    assert out[("en", "s0")] == 0
    assert out[("en", "s1")] == 0


def test_t_closeness_concentrated_cell_is_risky(spark):
    # two big 50/50 cells dominate the global split; a small cell of
    # ONLY huge docs drifts ~0.476 from it (risky), while the big cells
    # sit ~0.024 away (the small cell's own pull on the global) — note
    # a concentrated cell shifts the GLOBAL distribution too, so the
    # majority cells are never exactly 0 here
    rows = [
        (i, "x", "en", "big%d" % (i % 2), 25 if (i // 2) % 2 else 925)
        for i in range(80)
    ]
    rows += [(100 + i, "x", "en", "skew", 925) for i in range(4)]
    got = {
        r["source"]: (r["t_micro"], r["risky"])
        for r in A.t_closeness(
            _docs_tc(spark, rows), band=50, t_micro_max=200000
        ).collect()
    }
    assert got["skew"][1] == 1 and got["skew"][0] > 400000
    assert got["big0"][1] == 0 and got["big0"][0] < 50000
    assert got["big1"][1] == 0


def test_t_closeness_validates_args(spark):
    import pytest

    docs = _docs_tc(spark, [(1, "x", "en", "s", 10)])
    with pytest.raises(ValueError):
        A.t_closeness(docs, band=0)
    with pytest.raises(ValueError):
        A.t_closeness(docs, t_micro_max=-1)


# ---------------------------------------------------------- readability


def test_readability_hand_computed(spark):
    # "the cat sat" = 3 monosyllables -> 20000 - 15000 = 5000 (floor);
    # "beautiful examination notwithstanding" = 0 monosyllables -> 20000
    # ("beautiful" = eau+i+u... vowel groups: eau,i,u = 3; all >= 2)
    docs = spark.createDataFrame(
        [
            (1, "the cat sat", "en", "s", 11),
            (2, "beautiful examination notwithstanding", "en", "s", 38),
            (3, "a big cat ran away today", "en", "s", 24),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r["doc_id"]: r for r in A.readability(docs).collect()}
    assert got[1]["n_words"] == 3 and got[1]["n_mono"] == 3
    assert got[1]["forcast_milli"] == 5000
    assert got[2]["n_mono"] == 0 and got[2]["forcast_milli"] == 20000
    # doc 3: a(1) big(1) cat(1) ran(1) away(2: a, ay) today(2: o, ay)
    assert got[3]["n_words"] == 6 and got[3]["n_mono"] == 4
    assert got[3]["n_syllables"] == 8
    assert got[3]["forcast_milli"] == 20000 - 4 * 15000 // 6


def test_readability_cjk_hits_ceiling(spark):
    docs = spark.createDataFrame(
        [(1, "中文 文本", "zh", "s", 5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    r = A.readability(docs).collect()[0]
    assert r["n_mono"] == 0 and r["n_syllables"] == 0
    assert r["forcast_milli"] == 20000


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_bowtie_handcrafted(spark):
    # 1<->2 core (pivot 1), 0 -> 1 in, 2 -> 3 out, 4 -> 5 island,
    # 0 -> 6 tendril off IN (reachable from in, never from core)
    edges = _edges(
        spark, [(1, 2), (2, 1), (0, 1), (2, 3), (4, 5), (0, 6)]
    )
    got = {
        r["node"]: r["component"]
        for r in A.bowtie_components(edges, pivot=1, max_depth=5).collect()
    }
    assert got == {
        0: "in", 1: "core", 2: "core", 3: "out",
        4: "other", 5: "other", 6: "other",
    }


def test_bowtie_shallow_depth_degrades_to_other(spark):
    # a too-shallow BFS must move unreached nodes to 'other', never
    # into core/in/out (the conservative-degradation contract)
    chain = _edges(spark, [(0, 1), (1, 0), (1, 2), (2, 3), (3, 4)])
    got = {
        r["node"]: r["component"]
        for r in A.bowtie_components(chain, pivot=0, max_depth=1).collect()
    }
    assert got[4] == "other" and got[1] == "core"
    full = {
        r["node"]: r["component"]
        for r in A.bowtie_components(chain, pivot=0, max_depth=4).collect()
    }
    assert full[4] == "out"


def test_bowtie_fixture_census(spark):
    # the planted 500-node bow-tie: 100 core / 150 in / 150 out /
    # 100 other (tendril + disconnected cycle)
    import __spark_entry__ as entry

    q = entry.queries()["bowtie_components"]
    out = q(spark, "/root/testdata/sf0.001").groupBy("component").count()
    got = {r["component"]: r["count"] for r in out.collect()}
    assert got == {"core": 100, "in": 150, "out": 150, "other": 100}


def _snaps(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, url string, ts long, digest string"
    )


def test_scd2_aba_opens_new_version(spark):
    # digest A at ts 0-1, B at 2, A again at 3: the returning A must be
    # version 3, NOT merged into version 1 (true SCD-2)
    rows = [(0, "u", 0, "A"), (1, "u", 1, "A"),
            (2, "u", 2, "B"), (3, "u", 3, "A")]
    out = sorted(
        A.scd2_intervals(_snaps(spark, rows)).collect(),
        key=lambda r: r["version"],
    )
    assert [(r["version"], r["digest"], r["valid_from"], r["valid_to"],
             r["n_fetches"], r["is_current"]) for r in out] == [
        (1, "A", 0, 2, 2, 0),
        (2, "B", 2, 3, 1, 0),
        (3, "A", 3, None, 1, 1),
    ]


def test_scd2_ts_tie_breaks_on_id(spark):
    # two fetches at the SAME ts with different digests: fetch order is
    # (ts, doc_id), so id 0's digest opens v1 and id 1's opens v2
    rows = [(1, "u", 5, "B"), (0, "u", 5, "A")]
    out = {r["version"]: r["digest"]
           for r in A.scd2_intervals(_snaps(spark, rows)).collect()}
    assert out == {1: "A", 2: "B"}


def test_scd2_refuses_null_digest(spark):
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    rows = [(0, "u", 0, "A"), (1, "u", 1, None)]
    with pytest.raises((Py4JJavaError, SparkRuntimeException, Exception),
                       match="scd2_intervals: NULL"):
        A.scd2_intervals(_snaps(spark, rows)).collect()


def test_rfm_hand_computed(spark):
    # 3 users, distinct metric values -> each tercile has one user:
    #   u1: last day 0, 1 event,  $1   -> r=3? (recency 2 days) ...
    # anchor = 2024-01-03. recencies: u1=2, u2=1, u3=0 -> cuts t1=0,t2=1
    #   -> scores u3=3, u2=2, u1=1
    # freqs: u1=1, u2=2, u3=3 -> t1=1, t2=2 -> scores 1, 2, 3
    # money: u1=100, u2=300, u3=600 -> scores 1, 2, 3
    rows = [
        (0, _t("2024-01-01T10:00:00"), 1, "a", 1.00, ""),
        (1, _t("2024-01-02T10:00:00"), 2, "a", 1.50, ""),
        (2, _t("2024-01-02T11:00:00"), 2, "a", 1.50, ""),
        (3, _t("2024-01-03T10:00:00"), 3, "a", 2.00, ""),
        (4, _t("2024-01-03T11:00:00"), 3, "a", 2.00, ""),
        (5, _t("2024-01-03T12:00:00"), 3, "a", 2.00, ""),
    ]
    out = {r["user_id"]: r for r in E.rfm_segments(_ev(spark, rows)).collect()}
    assert (out[1]["r_score"], out[1]["f_score"], out[1]["m_score"],
            out[1]["rfm"]) == (1, 1, 1, 111)
    assert (out[2]["r_score"], out[2]["f_score"], out[2]["m_score"],
            out[2]["rfm"]) == (2, 2, 2, 222)
    assert (out[3]["r_score"], out[3]["f_score"], out[3]["m_score"],
            out[3]["rfm"]) == (3, 3, 3, 333)
    assert out[1]["money_cents"] == 100 and out[3]["money_cents"] == 600
    assert out[1]["recency_days"] == 2 and out[3]["recency_days"] == 0


def test_rfm_single_user_degenerate(spark):
    # one user: n=1 -> both cuts at its own value -> r=3, f=1, m=1
    rows = [(0, _t("2024-01-01T10:00:00"), 7, "a", 5.00, "")]
    r = E.rfm_segments(_ev(spark, rows)).collect()[0]
    assert (r["r_score"], r["f_score"], r["m_score"]) == (3, 1, 1)


def _xy(spark, rows):
    return spark.createDataFrame(rows, "x long, y long")


def test_zorder_morton_known_codes(spark):
    # domain pinned to 0..255 so bucket == raw value; z(3,5) = 39 ->
    # file 0 of 16; z(255,255) = 65535 -> file 15
    rows = [(0, 0), (255, 255), (3, 5)]
    man = {r["file_id"]: r
           for r in A.zorder_layout(_xy(spark, rows), "x", "y").collect()}
    assert set(man) == {0, 15}
    assert man[0]["n_rows"] == 2 and man[0]["max_x"] == 3
    assert man[0]["max_y"] == 5 and man[15]["n_rows"] == 1


def test_zorder_linear_layout_is_x_ranges(spark):
    rows = [(i, 255 - i) for i in range(0, 256, 16)]
    man = A.zorder_layout(
        _xy(spark, rows), "x", "y", linear=True
    ).collect()
    # 16 files, one row each, file_id = x // 16; every file spans its
    # x slice but y maps are wide open only across files
    assert len(man) == 16
    for r in man:
        assert r["n_rows"] == 1 and r["min_x"] // 16 == r["file_id"]


def test_zorder_prunes_y_where_linear_cannot(spark):
    # full 16x16 grid: a y-only-selective box forces linear to hit ALL
    # files (each spans all y); z-order isolates low-y cells
    rows = [(x, y) for x in range(0, 256, 16) for y in range(0, 256, 16)]
    out = {r["layout"]: r for r in A.zorder_pruning(
        _xy(spark, rows), "x", "y", box=(0, 255, 0, 15)
    ).collect()}
    assert out["linear"]["files_hit"] == out["linear"]["n_files_total"]
    assert out["zorder"]["files_hit"] < out["linear"]["files_hit"]
    assert out["zorder"]["hit_milli"] < 1000


def test_zorder_validates_args(spark):
    import pytest
    df = _xy(spark, [(0, 0)])
    with pytest.raises(ValueError):
        A.zorder_layout(df, "x", "y", bits=0)
    with pytest.raises(ValueError):
        A.zorder_layout(df, "x", "y", bits=8, n_files=0)
    with pytest.raises(ValueError):
        A.zorder_layout(df, "x", "y", bits=2, n_files=17)


def _docs_txt(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_champion_lists_rank_and_ties(spark):
    # term 'a': tf d0=3, d1=3, d2=1 -> r=2 keeps d0 (rank 1, tie ->
    # min doc_id) and d1; d2 pruned
    rows = [(0, "a a a"), (1, "a a a b"), (2, "a b b")]
    out = A.champion_lists(_docs_txt(spark, rows), r=2).collect()
    a = sorted((r["rank"], r["doc_id"], r["tf"])
               for r in out if r["term"] == "a")
    assert a == [(1, 0, 3), (2, 1, 3)]
    b = sorted((r["rank"], r["doc_id"]) for r in out if r["term"] == "b")
    assert b == [(1, 2), (2, 1)]


def test_champion_eval_detects_pruning_loss(spark):
    # 4 docs score >0 for the query; r=1 champions keep only the single
    # best doc per term -> top-k misses docs, recall < 1000
    rows = [(0, "q q q"), (1, "q q"), (2, "q"), (3, "q z"), (4, "z z")]
    r = A.champion_search_eval(
        _docs_txt(spark, rows), ["q"], r=1, k=3
    ).collect()[0]
    assert r["n_exact"] == 3 and r["n_champ"] == 1
    assert r["n_common"] == 1 and r["recall_milli"] == 333


def test_champion_eval_full_r_is_exact(spark):
    rows = [(0, "q q"), (1, "q"), (2, "z")]
    r = A.champion_search_eval(
        _docs_txt(spark, rows), ["q", "z"], r=10, k=5
    ).collect()[0]
    assert r["n_exact"] == r["n_champ"] == r["n_common"]
    assert r["recall_milli"] == 1000


def test_min_cost_supplier_argmin_and_tie(spark):
    from contentextractor_spark.functions import relational as R

    li = spark.createDataFrame(
        # part 1: supp 5 unit 2.00, supp 3 unit 2.00 (tie -> supp 3),
        # supp 9 unit 1.50 -> winner supp 9 @ 150c
        [(1, 1, 5, 1, 2.0, 4.00, 0.0, 0.0, "N", "O", None),
         (2, 1, 3, 1, 3.0, 6.00, 0.0, 0.0, "N", "O", None),
         (3, 1, 9, 1, 2.0, 3.00, 0.0, 0.0, "N", "O", None),
         (4, 2, 3, 1, 1.0, 9.00, 0.0, 0.0, "N", "O", None)],
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp",
    )
    supp = spark.createDataFrame(
        [(3, "s3", 0, 0.0), (5, "s5", 0, 0.0), (9, "s9", 1, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    nat = spark.createDataFrame(
        [(0, "ALPHA", 0), (1, "BETA", 0)],
        "n_nationkey long, n_name string, n_regionkey long",
    )
    part = spark.createDataFrame(
        [(1, "p1", "b", "t", 1, 1.0), (2, "p2", "b", "t", 1, 1.0)],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    out = {r["p_partkey"]: r for r in
           R.min_cost_supplier(li, supp, nat, part).collect()}
    assert out[1]["s_suppkey"] == 9 and out[1]["unit_cost_c"] == 150
    assert out[1]["nation_name"] == "BETA"
    assert out[2]["s_suppkey"] == 3 and out[2]["unit_cost_c"] == 900


def test_important_parts_threshold(spark):
    from contentextractor_spark.functions import relational as R

    # values 10, 10, 10, 70 (cents) over 4 parts: total 100, avg 25;
    # keep value*4 > 2*100 -> only the 70 part
    li = spark.createDataFrame(
        [(i, p, 0, 1, 1.0, v, 0.0, 0.0, "N", "O", None)
         for i, (p, v) in enumerate(
             [(1, 0.10), (2, 0.10), (3, 0.10), (4, 0.70)])],
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp",
    )
    out = R.important_parts(li).collect()
    assert len(out) == 1
    r = out[0]
    assert r["l_partkey"] == 4 and r["value_c"] == 70
    assert r["share_micro"] == 700000


def test_ktruss_cascade(spark):
    # K4 on 0..3 (edge support 2, survives k=4) + triangle strip
    # 10-11-12-13 (chords support 1 -> die, then naked path dies):
    # a 2-round cascade
    edges = _edges(spark, (
        [(a, b) for a in range(4) for b in range(4) if a < b]
        + [(10, 11), (11, 12), (12, 13), (10, 12), (11, 13)]
    ))
    out = sorted(map(tuple, A.ktruss(edges, k=4, rounds=4).collect()))
    assert out == [(a, b) for a in range(4) for b in range(4) if a < b]


def test_ktruss_k3_keeps_triangles_only(spark):
    edges = _edges(spark, [(0, 1), (1, 2), (0, 2), (2, 3)])
    out = sorted(map(tuple, A.ktruss(edges, k=3, rounds=2).collect()))
    assert out == [(0, 1), (0, 2), (1, 2)]


def test_ktruss_validates_k(spark):
    import pytest
    with pytest.raises(ValueError):
        A.ktruss(_edges(spark, [(0, 1)]), k=2)


def _embs(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in rows],
        "vec_id long, embedding array<float>, label int",
    )


def test_kcenter_picks_farthest_first(spark):
    # seed = min id (0 at origin); farthest is id 3 at (10,0), then the
    # point farthest from {0, 3} is id 2 at (4, 4) (md 32e6 vs id 1's 4e6)
    rows = [(0, [0.0, 0.0]), (1, [2.0, 0.0]), (2, [4.0, 4.0]),
            (3, [10.0, 0.0])]
    out = sorted(
        map(tuple, A.kcenter_coreset(_embs(spark, rows), k=3).collect())
    )
    assert out[0] == (1, 0, None)
    assert out[1] == (2, 3, 100_000_000)   # 10^2 * 1000^2
    assert out[2] == (3, 2, 32_000_000)    # min(32, 52) e6
    # coverage curve monotone non-increasing
    assert out[1][2] >= out[2][2]


def test_kcenter_tie_breaks_to_min_id(spark):
    # ids 1 and 2 both at distance 1 from the seed -> rank 2 picks id 1
    rows = [(0, [0.0]), (1, [1.0]), (2, [-1.0])]
    out = {r["rank"]: r["vec_id"]
           for r in A.kcenter_coreset(_embs(spark, rows), k=2).collect()}
    assert out[2] == 1


def test_kcenter_validates(spark):
    import pytest
    with pytest.raises(ValueError):
        A.kcenter_coreset(_embs(spark, [(0, [0.0])]), k=0)


def test_rolling_active_users_window(spark):
    # user 1 active day 0 only; user 2 active days 0 and 6; user 3 day 8.
    # day 0: dau 2, wau 2.  day 6: dau 1 (user 2), wau 2 (1 and 2 in
    # trailing 7).  day 8: dau 1, wau 2 (user 2's day-6 still covers 8,
    # user 1's day-0 does NOT).  Repeated same-day activity dedups.
    rows = [
        (0, _t("2024-01-01T10:00:00"), 1, "a", 0.0, ""),
        (1, _t("2024-01-01T11:00:00"), 1, "a", 0.0, ""),  # same-day dup
        (2, _t("2024-01-01T12:00:00"), 2, "a", 0.0, ""),
        (3, _t("2024-01-07T09:00:00"), 2, "a", 0.0, ""),
        (4, _t("2024-01-09T09:00:00"), 3, "a", 0.0, ""),
    ]
    out = {r["day"]: r for r in
           E.rolling_active_users(_ev(spark, rows)).collect()}
    assert set(out) == {0, 6, 8}
    assert (out[0]["dau"], out[0]["wau"]) == (2, 2)
    assert (out[6]["dau"], out[6]["wau"]) == (1, 2)
    assert (out[8]["dau"], out[8]["wau"]) == (1, 2)
    assert out[6]["stickiness_milli"] == 500
    assert out[0]["stickiness_milli"] == 1000


def test_rolling_active_users_validates(spark):
    import pytest as _pt
    with _pt.raises(ValueError):
        E.rolling_active_users(_ev(spark, []), window_days=0)


def test_chi2_terms_hand_computed(spark):
    # 4 docs, 2 langs; 'xx' only in lang A docs, 'zz' everywhere.
    # For ('xx', A): a=2 b=0 c=0 d=2 -> chi2 = 4*(4-0)^2/(2*2*2*2) = 4.0
    docs = spark.createDataFrame(
        [
            (1, "xx zz common", "A"),
            (2, "xx zz common", "A"),
            (3, "yy zz common", "B"),
            (4, "yy zz common", "B"),
        ],
        "doc_id long, text string, lang string",
    )
    out = {(r.lang, r.term): r for r in
           A.chi2_terms(docs, min_df=1, k=10).collect()}
    assert out[("A", "xx")].chi2_micro == 4_000_000
    assert out[("B", "yy")].chi2_micro == 4_000_000
    # 'zz' is in every doc -> excluded (b+d = 0), 'common' too
    assert ("A", "zz") not in out and ("A", "common") not in out
    # ranks: per-lang rank 1 is the perfectly-separating term
    assert out[("A", "xx")].rank == 1
    assert out[("B", "yy")].rank == 1


def test_chi2_terms_validates(spark):
    import pytest as _pt
    docs = spark.createDataFrame(
        [(1, "a", "A")], "doc_id long, text string, lang string"
    )
    with _pt.raises(ValueError):
        A.chi2_terms(docs, min_df=0)


def _seeds(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "doc_id long")


def test_random_walks_forced_chain(spark):
    # out-degree 1 everywhere: the walk is forced 0->1->2->3 and
    # terminates early at the sink (no step 4 despite walk_len=4)
    edges = _edges(spark, [(0, 1), (1, 2), (2, 3)])
    out = sorted(
        (r.step, r.node)
        for r in A.random_walks(edges, _seeds(spark, [0]), 4).collect()
    )
    assert out == [(0, 0), (1, 1), (2, 2), (3, 3)]


def test_random_walks_matches_python_argmin(spark):
    # fan-out node: step 1 from seed 7 must pick the neighbor minimizing
    # (first-7-hex-digits-of-md5("7:1:dst"))*2^32 + dst — replicated here
    import hashlib

    nbrs = [11, 12, 13, 14]
    edges = _edges(spark, [(7, d) for d in nbrs])
    want = min(
        nbrs,
        key=lambda d: (
            int(hashlib.md5(f"7:1:{d}".encode()).hexdigest()[:7], 16)
            * 2**32
            + d
        ),
    )
    rows = {r.step: r.node for r in
            A.random_walks(edges, _seeds(spark, [7]), 1).collect()}
    assert rows == {0: 7, 1: want}


def test_random_walks_deterministic_and_per_walk(spark):
    # two seeds walk independently (walk_id keys the hash) and a rerun
    # is bit-identical
    edges = _edges(
        spark, [(a, b) for a in range(5) for b in range(5) if a != b]
    )
    r1 = sorted(map(tuple,
                    A.random_walks(edges, _seeds(spark, [0, 1]), 3)
                    .collect()))
    r2 = sorted(map(tuple,
                    A.random_walks(edges, _seeds(spark, [0, 1]), 3)
                    .collect()))
    assert r1 == r2
    assert {t[0] for t in r1} == {0, 1}
    assert sum(1 for t in r1 if t[0] == 0) == 4  # steps 0..3


def test_random_walks_validates_and_guards(spark):
    import pytest as _pt

    edges = _edges(spark, [(0, 1)])
    with _pt.raises(ValueError):
        A.random_walks(edges, _seeds(spark, [0]), 0)
    with _pt.raises(ValueError):
        A.random_walks(edges, _seeds(spark, [0]), 33)
    # dst outside the 2^32 packing bound must raise, not silently drop
    bad = _edges(spark, [(0, 2**32)])
    with _pt.raises(Exception, match="packing bound"):
        A.random_walks(bad, _seeds(spark, [0]), 1).collect()


def _docs_tl(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_skipgram_pairs_hand_computed(spark):
    # "a b c", window 2: every ordered pair within distance 2, once
    out = {(r.center, r.context): r.n_pairs for r in
           A.skipgram_pairs(_docs_tl(spark, [(1, "a b c")]),
                            window=2, min_count=1).collect()}
    assert out == {("a", "b"): 1, ("b", "a"): 1, ("a", "c"): 1,
                   ("c", "a"): 1, ("b", "c"): 1, ("c", "b"): 1}


def test_skipgram_pairs_repeated_token(spark):
    # "a a a": 3 positions, 6 ordered within-window pairs, all (a, a)
    out = A.skipgram_pairs(_docs_tl(spark, [(1, "a a a")]),
                           window=2, min_count=1).collect()
    assert [(r.center, r.context, r.n_pairs) for r in out] == [
        ("a", "a", 6)
    ]


def test_skipgram_pairs_window_1_is_adjacency(spark):
    out = {(r.center, r.context) for r in
           A.skipgram_pairs(_docs_tl(spark, [(1, "a b c")]),
                            window=1, min_count=1).collect()}
    assert out == {("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")}


def test_skipgram_pairs_min_count_and_validation(spark):
    import pytest as _pt
    docs = _docs_tl(spark, [(1, "a b"), (2, "a b"), (3, "a c")])
    out = {(r.center, r.context): r.n_pairs for r in
           A.skipgram_pairs(docs, window=2, min_count=2).collect()}
    assert out == {("a", "b"): 2, ("b", "a"): 2}
    with _pt.raises(ValueError):
        A.skipgram_pairs(docs, window=0)


def test_frequent_pairs_apriori_prune(spark):
    # z is infrequent (df 1) so (x, z) can never surface even in-doc
    docs = _docs_tl(spark, [(1, "x y"), (2, "x y"), (3, "x z")])
    out = [(r.tok_a, r.tok_b, r.support) for r in
           A.frequent_pairs(docs, min_support=2,
                            max_doc_tokens=10).collect()]
    assert out == [("x", "y", 2)]


def test_frequent_pairs_cap_drops_doc_and_overflow_lists_it(spark):
    # d2 carries 3 frequent tokens > cap 2: dropped from supports
    # (x,y support falls to 1 < 2 -> no pairs) and listed loudly
    docs = _docs_tl(spark, [(1, "x y"), (2, "x y q"), (3, "q")])
    assert A.frequent_pairs(docs, min_support=2,
                            max_doc_tokens=2).collect() == []
    ov = [(r.doc_id, r.n_freq) for r in
          A.frequent_pairs_overflow(docs, min_support=2,
                                    max_doc_tokens=2).collect()]
    assert ov == [(2, 3)]


def test_frequent_pairs_duplicate_tokens_count_once(spark):
    # presence is per distinct token: "x x y" contributes support 1
    docs = _docs_tl(spark, [(1, "x x y"), (2, "y x")])
    out = [(r.tok_a, r.tok_b, r.support) for r in
           A.frequent_pairs(docs, min_support=2,
                            max_doc_tokens=10).collect()]
    assert out == [("x", "y", 2)]


def test_gini_activity_hand_computed(spark):
    # counts (1, 1, 2) ascending: S1 = 1+2+6 = 9, S0 = 4, n = 3
    # G = (18 - 16) / 12 = 0.1666.. -> 166666 micro
    ev = _ev(spark, [
        (1, _t("2024-01-01T00:00:00"), 10, "click", 0.0, ""),
        (2, _t("2024-01-01T00:01:00"), 11, "click", 0.0, ""),
        (3, _t("2024-01-01T00:02:00"), 12, "click", 0.0, ""),
        (4, _t("2024-01-01T00:03:00"), 12, "click", 0.0, ""),
    ])
    r = A.gini_activity(ev).collect()[0]
    assert (r.event_type, r.n_users, r.total_events, r.gini_micro) == (
        "click", 3, 4, 166666)


def test_gini_activity_uniform_is_zero_and_tie_stable(spark):
    # equal per-user counts: Gini exactly 0 regardless of tie order
    ev = _ev(spark, [
        (i, _t("2024-01-01T00:00:00"), 100 + i, "view", 0.0, "")
        for i in range(5)
    ])
    r = A.gini_activity(ev).collect()[0]
    assert (r.n_users, r.gini_micro) == (5, 0)


def test_hhi_sources_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "A", "x"), (2, "A", "x"), (3, "A", "x"), (4, "A", "y"),
         (5, "B", "z")],
        "doc_id long, lang string, source string",
    )
    out = {r.lang: r for r in A.hhi_sources(docs).collect()}
    # A: counts (3,1), total 4: HHI = 10*1e6 // 16 = 625000, top 750000
    assert (out["A"].n_sources, out["A"].total_docs,
            out["A"].hhi_micro, out["A"].top_share_micro) == (
        2, 4, 625000, 750000)
    # B: single source -> both exactly 1e6
    assert (out["B"].hhi_micro, out["B"].top_share_micro) == (
        1_000_000, 1_000_000)


def test_weighted_sample_eval_full_weight_is_exact(spark):
    # every doc at w >= w_max has p = 1: all kept, HT == exact, ratio
    # exactly 1000
    docs = spark.createDataFrame(
        [(1, 300), (2, 400), (3, 1000)], "doc_id long, n_chars long"
    )
    r = A.weighted_sample_eval(docs, w_max=300).collect()[0]
    assert (r.n_docs, r.n_kept, r.exact_chars) == (3, 3, 1700)
    assert r.ht_est_milli == 1700 * 1000
    assert r.ratio_milli == 1000


def test_weighted_sample_eval_short_docs_telescope(spark):
    # kept short docs contribute exactly w_max*1000 milli-chars each
    docs = spark.createDataFrame(
        [(i, 150) for i in range(40)], "doc_id long, n_chars long"
    )
    r = A.weighted_sample_eval(docs, w_max=300).collect()[0]
    assert r.ht_est_milli == r.n_kept * 300_000
    assert 0 < r.n_kept < 40  # p = 0.5 sample really thins


def test_lang_entropy_by_source_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "en", "s1"), (2, "en", "s1"), (3, "fr", "s1"),
         (4, "fr", "s1"), (5, "en", "s2")],
        "doc_id long, lang string, source string",
    )
    out = {r.source: r for r in A.lang_entropy_by_source(docs).collect()}
    # s1: 50/50 -> 2*floor(0.5*ln(2)*1e6) = 693146 micro-nats
    assert (out["s1"].n_langs, out["s1"].n_docs,
            out["s1"].entropy_micro) == (2, 4, 693146)
    # s2: monolingual -> exactly 0
    assert (out["s2"].n_langs, out["s2"].entropy_micro) == (1, 0)


def test_walk_skipgrams_hand_computed(spark):
    walks = spark.createDataFrame(
        [(5, 0, 7), (5, 1, 8), (5, 2, 9)],
        "walk_id long, step int, node long",
    )
    out = {(r.center, r.context): r.n_pairs for r in
           A.walk_skipgrams(walks, window=2).collect()}
    assert out == {(7, 8): 1, (8, 7): 1, (7, 9): 1, (9, 7): 1,
                   (8, 9): 1, (9, 8): 1}


def test_walk_skipgrams_window_and_cross_walk_isolation(spark):
    # window 1 drops the distance-2 pair; two walks never pair up
    walks = spark.createDataFrame(
        [(1, 0, 7), (1, 1, 8), (1, 2, 9), (2, 0, 7), (2, 1, 8)],
        "walk_id long, step int, node long",
    )
    out = {(r.center, r.context): r.n_pairs for r in
           A.walk_skipgrams(walks, window=1).collect()}
    assert out == {(7, 8): 2, (8, 7): 2, (8, 9): 1, (9, 8): 1}
    import pytest as _pt
    with _pt.raises(ValueError):
        A.walk_skipgrams(walks, window=0)


def test_bootstrap_ci_matches_python_replica(spark):
    import hashlib

    n, B = 30, 16
    vals = [100 + 7 * i for i in range(n)]
    docs = spark.createDataFrame(
        [(i, vals[i]) for i in range(n)], "doc_id long, n_chars long"
    )
    r = A.bootstrap_ci(docs, b_reps=B).collect()[0]

    def mult(b, i):
        u = int(hashlib.md5(f"bs:{b}:{i}".encode()).hexdigest()[:8], 16)
        return sum(1 for t in A._POISSON1_CDF_U32 if u >= t)

    means = []
    for b in range(B):
        ms = [mult(b, i) for i in range(n)]
        if sum(ms) > 0:
            means.append(
                sum(m * x for m, x in zip(ms, vals)) * 1000 // sum(ms)
            )
    means.sort()
    lo_rk, hi_rk = max(1, B // 10), B - B // 10 + 1
    assert r.n_docs == n and r.b_reps == B
    assert r.mean_milli == sum(vals) * 1000 // n
    assert r.lo_milli == means[lo_rk - 1]
    assert r.hi_milli == means[hi_rk - 1]
    assert r.lo_milli <= r.mean_milli <= r.hi_milli


def test_bootstrap_ci_validates(spark):
    import pytest as _pt
    docs = spark.createDataFrame([(1, 10)], "doc_id long, n_chars long")
    with _pt.raises(ValueError):
        A.bootstrap_ci(docs, b_reps=5)


def test_cusum_anomaly_hand_computed(spark):
    # counts (1,1,1,5): scaled devs (4x-8) = (-4,-4,-4,12), prefix
    # (-4,-8,-12,0), runmin (-4,-8,-12,-12) -> S' = (0,0,0,12);
    # S_true = 3 = 1.5 means -> 1500 milli; flag at h=1 (12 > 8), not h=2
    rows = []
    eid = 0
    for d, c in enumerate([1, 1, 1, 5]):
        for _ in range(c):
            eid += 1
            rows.append((eid, _t(f"2024-01-0{d+1}T10:00:00"),
                         1, "click", 0.0, ""))
    ev = _ev(spark, rows)
    out = {r.day: r for r in E.cusum_anomaly(ev, h_means=2).collect()}
    assert [out[d].cusum_milli for d in range(4)] == [0, 0, 0, 1500]
    assert out[3].flagged == 0
    out1 = {r.day: r for r in E.cusum_anomaly(ev, h_means=1).collect()}
    assert out1[3].flagged == 1


def test_cusum_closed_form_equals_recursion(spark):
    # the window form (prefix sum - running min) must equal the
    # textbook recursion S_t = max(0, S_{t-1} + (x_t - k)) in the
    # n_days-scaled integer space
    counts = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]
    rows = []
    eid = 0
    for d, c in enumerate(counts):
        for _ in range(c):
            eid += 1
            rows.append((eid, _t(f"2024-01-{d+1:02d}T00:00:00"),
                         1, "view", 0.0, ""))
    ev = _ev(spark, rows)
    n, total = len(counts), sum(counts)
    s, expect = 0, []
    for c in counts:
        s = max(0, s + (n * c - total))
        expect.append(s * 1000 // total)
    out = {r.day: r.cusum_milli for r in E.cusum_anomaly(ev).collect()}
    assert [out[d] for d in range(n)] == expect


def test_weekday_profile_hand_computed(spark):
    # all 7 events on one weekday: chi2 = 36 + 6*1 = 42 exactly
    rows = [(i, _t("2024-01-01T10:00:00"), 1, "click", 0.0, "")
            for i in range(7)]
    r = E.weekday_profile(_ev(spark, rows)).collect()[0]
    assert (r.total_events, r.n_dows, r.chi2_micro) == (7, 1, 42_000_000)


def test_weekday_profile_uniform_is_zero(spark):
    # one event per weekday (Mon 2024-01-01 .. Sun 2024-01-07)
    rows = [(d, _t(f"2024-01-{d+1:02d}T10:00:00"), 1, "view", 0.0, "")
            for d in range(7)]
    r = E.weekday_profile(_ev(spark, rows)).collect()[0]
    assert (r.total_events, r.n_dows, r.chi2_micro) == (7, 7, 0)


def test_dispersion_report_hand_computed(spark):
    # counts (2, 4): n=2, S=6, Q=20: fano = (40-36)/(6*1) = 0.666 ->
    # 666 milli.  devs (2*2-6, 2*4-6) = (-2, 2): num = -4, den = 8 ->
    # acf1 = -500 milli (sign peeled before division)
    rows = []
    eid = 0
    for d, c in enumerate([2, 4]):
        for _ in range(c):
            eid += 1
            rows.append((eid, _t(f"2024-01-0{d+1}T00:00:00"),
                         1, "click", 0.0, ""))
    r = E.dispersion_report(_ev(spark, rows)).collect()[0]
    assert (r.n_days, r.total_events, r.mean_milli) == (2, 6, 3000)
    assert r.fano_milli == 666
    assert r.acf1_milli == -500


def test_dispersion_report_degenerate_guards(spark):
    # constant series: fano 0 and acf1 0 (den = 0 guard);
    # single day: fano 0 (n = 1 guard)
    rows = [(1, _t("2024-01-01T00:00:00"), 1, "view", 0.0, ""),
            (2, _t("2024-01-02T00:00:00"), 1, "view", 0.0, ""),
            (3, _t("2024-01-01T00:00:00"), 1, "click", 0.0, "")]
    out = {r.event_type: r for r in
           E.dispersion_report(_ev(spark, rows)).collect()}
    assert (out["view"].fano_milli, out["view"].acf1_milli) == (0, 0)
    assert (out["click"].n_days, out["click"].fano_milli) == (1, 0)


def test_rich_club_hand_computed(spark):
    # K4 on 0..3 (deg 3 each) + pendants 4-5 off nodes 0,1 (deg 4
    # for 0,1; deg 1 pendants).  k=3: club {0,1} (deg>3), E=1 edge
    # (0,1) -> phi = 2*1/(2*1) = 1000 milli.  k=0: whole graph.
    edges = _edges(spark, (
        [(a, b) for a in range(4) for b in range(4) if a < b]
        + [(0, 4), (1, 5)]
    ))
    out = {r.k: r for r in A.rich_club(edges, ks=(0, 3)).collect()}
    assert (out[3].n_nodes, out[3].n_edges, out[3].phi_milli) == (2, 1, 1000)
    # k=0: 6 nodes, 8 edges: phi = 16000 // 30 = 533
    assert (out[0].n_nodes, out[0].n_edges, out[0].phi_milli) == (6, 8, 533)


def test_rich_club_empty_club_and_validation(spark):
    import pytest as _pt
    edges = _edges(spark, [(0, 1)])
    out = {r.k: r for r in A.rich_club(edges, ks=(5,)).collect()}
    assert (out[5].n_nodes, out[5].phi_milli) == (0, 0)
    with _pt.raises(ValueError):
        A.rich_club(edges, ks=())


def test_bloom_eval_counts_and_no_false_negatives(spark):
    # bench = first doc; its shingles must all be positives (bloom has
    # no false negatives), so n_pos >= n_members == bench shingle count
    docs = _docs_tl(spark, [
        (1, "a b c d e"), (2, "f g h i j"), (3, "a b c x y")])
    r = A.bloom_eval(docs, docs.filter("doc_id = 1"),
                     n=3, n_hashes=3, n_bits=4096).collect()[0]
    # corpus distinct 3-shingles: 3 per doc, doc3 shares 'a b c' -> 8
    assert r.n_probe == 8
    assert r.n_members == 3
    assert r.n_pos >= r.n_members
    assert r.n_fp == r.n_pos - r.n_members
    # <= 9 set cells of 12288: milli fill floors to exactly 0
    assert r.fill_milli == 0


def test_benford_values_hand_computed(spark):
    # 9 values, first digits exactly one of each 1..9: O_d = 1, t = 9
    rows = [(d, _t("2024-01-01T00:00:00"), 1, "click", d * 1.0, "")
            for d in range(1, 10)]
    r = E.benford_values(_ev(spark, rows)).collect()[0]
    import math as _m
    exp = 0
    for p in E._BENFORD_P_MICRO:
        e = 9.0 * p / 1000000.0
        exp += _m.floor((1.0 - e) * (1.0 - e) / e * 1000.0)
    assert (r.event_type, r.n_values, r.chi2_milli) == ("click", 9, exp)


def test_benford_values_drops_zero_cents_type(spark):
    rows = [(1, _t("2024-01-01T00:00:00"), 1, "free", 0.0, ""),
            (2, _t("2024-01-01T00:00:00"), 1, "paid", 5.0, "")]
    out = {r.event_type for r in E.benford_values(_ev(spark, rows)).collect()}
    assert out == {"paid"}


def test_neyman_allocation_hand_computed(spark):
    # stratum A: values (1,3) -> N=2, S=4, Q=10: rad = 2*(20-16)//1 = 8,
    # w = isqrt(8) = 2 (N*sigma = 2*sqrt(2) = 2.83, floored radicand).
    # stratum B: constant values -> rad 0, weight 0 -> all budget to A.
    docs = spark.createDataFrame(
        [(1, "A", 1), (2, "A", 3), (3, "B", 5), (4, "B", 5)],
        "doc_id long, lang string, n_chars long",
    )
    out = {r.grp: r for r in
           A.neyman_allocation(docs, total_n=10).collect()}
    assert (out["A"].weight, out["A"].alloc) == (2, 10)
    assert (out["B"].weight, out["B"].alloc) == (0, 0)


def test_neyman_allocation_degenerate_single_doc(spark):
    docs = spark.createDataFrame(
        [(1, "A", 7)], "doc_id long, lang string, n_chars long"
    )
    r = A.neyman_allocation(docs, total_n=10).collect()[0]
    assert (r.weight, r.alloc) == (0, 0)


def test_neyman_allocation_budget_never_exceeded(spark):
    docs = spark.createDataFrame(
        [(i, f"L{i % 3}", (i * 37) % 100 + 1) for i in range(60)],
        "doc_id long, lang string, n_chars long",
    )
    rows = A.neyman_allocation(docs, total_n=17).collect()
    assert sum(r.alloc for r in rows) <= 17
    assert all(r.alloc >= 0 for r in rows)


def test_ab_null_check_hand_computed(spark):
    # pin arms from the same hash the operator uses, then verify z^2
    # against a pure-python replica of the identical float tree
    import hashlib
    import math as _m

    rows = []
    for uid in range(1, 21):
        rows.append((uid * 10, _t("2024-01-01T10:00:00"), uid,
                     "purchase" if uid % 3 == 0 else "view", 1.0, ""))
    r = E.ab_null_check(_ev(spark, rows)).collect()[0]

    def arm(uid):
        return int(hashlib.md5(f"ab:{uid}".encode()).hexdigest()[:8],
                   16) % 2

    n = {0: 0, 1: 0}
    c = {0: 0, 1: 0}
    for uid in range(1, 21):
        a = arm(uid)
        n[a] += 1
        c[a] += 1 if uid % 3 == 0 else 0
    assert (r.n_a, r.n_b, r.conv_a, r.conv_b) == (n[0], n[1], c[0], c[1])
    p1, p2 = c[0] / n[0], c[1] / n[1]
    p = (c[0] + c[1]) / (n[0] + n[1])
    z2 = (p1 - p2) * (p1 - p2) / (p * (1.0 - p) * (1.0 / n[0] + 1.0 / n[1]))
    assert r.z2_milli == _m.floor(z2 * 1000.0)


def test_ab_null_check_degenerate_is_zero(spark):
    # nobody converts -> z2 must be 0, not a division by zero
    rows = [(i, _t("2024-01-01T10:00:00"), i, "view", 0.0, "")
            for i in range(1, 9)]
    assert E.ab_null_check(_ev(spark, rows)).collect()[0].z2_milli == 0


def test_forecast_baselines_hand_computed(spark):
    # days 0..7 counts (2,4,2,4,2,4,2,4): lag1 scores days 1..7 with
    # |diff| = 2 each -> ae 14, act 22 -> wape1 = 14000//22 = 636;
    # lag7 scores day 7 only: |4-2| = 2, act 4 -> wape7 = 500
    rows = []
    eid = 0
    counts = [2, 4, 2, 4, 2, 4, 2, 4]
    for d, c in enumerate(counts):
        for _ in range(c):
            eid += 1
            rows.append((eid, _t(f"2024-01-{d+1:02d}T00:00:00"),
                         1, "click", 0.0, ""))
    r = E.forecast_baselines(_ev(spark, rows)).collect()[0]
    assert (r.n_lag1, r.wape1_milli) == (7, 636)
    assert (r.n_lag7, r.wape7_milli) == (1, 500)


def test_forecast_baselines_gap_breaks_pair_and_single_day_survives(spark):
    # days 0 and 2 (gap at 1): lag1 must score NOTHING (calendar-
    # correct, not row-lag); a single-day type still appears with zeros
    rows = [(1, _t("2024-01-01T00:00:00"), 1, "view", 0.0, ""),
            (2, _t("2024-01-03T00:00:00"), 1, "view", 0.0, ""),
            (3, _t("2024-01-01T00:00:00"), 1, "solo", 0.0, "")]
    out = {r.event_type: r for r in
           E.forecast_baselines(_ev(spark, rows)).collect()}
    assert (out["view"].n_lag1, out["view"].wape1_milli) == (0, 0)
    assert (out["solo"].n_lag1, out["solo"].n_lag7,
            out["solo"].wape1_milli) == (0, 0, 0)


def test_lang_source_mi_independent_is_zero(spark):
    # perfectly independent 2x2 (every cell = product of margins / n):
    # every cell term is ln(1) = 0 -> MI exactly 0
    rows = []
    i = 0
    for lang in ("A", "B"):
        for src in ("x", "y"):
            for _ in range(5):
                i += 1
                rows.append((i, lang, src))
    docs = spark.createDataFrame(rows, "doc_id long, lang string, source string")
    r = A.lang_source_mi(docs).collect()[0]
    assert (r.n_docs, r.n_langs, r.n_sources) == (20, 2, 2)
    assert r.mi_micro == 0
    # uniform 2-way margins: H = ln(2) floored to micro = 693147
    assert r.h_lang_micro == r.h_source_micro == 693146


def test_lang_source_mi_deterministic_association(spark):
    # source determines language exactly: MI == H(lang) cellwise
    # (identical per-cell float trees -> identical floors)
    rows = [(1, "A", "x"), (2, "A", "x"), (3, "B", "y"), (4, "B", "y")]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, source string")
    r = A.lang_source_mi(docs).collect()[0]
    assert r.mi_micro == r.h_lang_micro == 693146
