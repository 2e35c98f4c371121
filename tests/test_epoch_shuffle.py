"""Seeded epoch shuffle + fixed-k group sampling: python-replica parity,
seed/repartition determinism, shard coverage, and exact-k semantics."""

import hashlib

from contentextractor_spark.functions import analysis as A


def _key(seed, doc_id):
    return hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()


def _docs(spark, n):
    return spark.createDataFrame(
        [(i, "abcde"[i % 5]) for i in range(n)], "doc_id bigint, lang string"
    )


def test_epoch_shuffle_replica_parity(spark):
    n, shards = 100, 8
    got = {
        r.doc_id: (r.shard, r.pos)
        for r in A.epoch_shuffle_plan(_docs(spark, n), n_shards=shards).collect()
    }
    rows = [(i, _key("epoch0", i)) for i in range(n)]
    by_shard = {}
    for i, k in rows:
        by_shard.setdefault(int(k[:8], 16) % shards, []).append((k, i))
    want = {}
    for s, members in by_shard.items():
        for pos, (_, i) in enumerate(sorted(members)):
            want[i] = (s, pos)
    assert got == want
    assert len({s for s, _ in got.values()}) == shards  # every shard hit


def test_epoch_shuffle_seed_changes_order(spark):
    docs = _docs(spark, 60)
    a = {r.doc_id: (r.shard, r.pos) for r in A.epoch_shuffle_plan(docs, 4, "epoch0").collect()}
    b = {r.doc_id: (r.shard, r.pos) for r in A.epoch_shuffle_plan(docs, 4, "epoch1").collect()}
    assert a != b
    # positions within each shard are a contiguous 0..m-1 range both times
    for plan in (a, b):
        by_shard = {}
        for s, p in plan.values():
            by_shard.setdefault(s, []).append(p)
        for ps in by_shard.values():
            assert sorted(ps) == list(range(len(ps)))


def test_epoch_shuffle_repartition_invariant(spark):
    docs = _docs(spark, 80)
    a = {(r.doc_id, r.shard, r.pos) for r in A.epoch_shuffle_plan(docs, 4).collect()}
    b = {
        (r.doc_id, r.shard, r.pos)
        for r in A.epoch_shuffle_plan(docs.repartition(13), 4).collect()
    }
    assert a == b


def test_group_sample_exact_k(spark):
    docs = _docs(spark, 100)  # 20 docs per lang letter
    out = A.group_topk_sample(docs, k=7).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append((r.rk, r.doc_id))
    assert set(by_lang) == set("abcde")
    for lang, members in by_lang.items():
        assert sorted(rk for rk, _ in members) == list(range(1, 8))
        # replica: the 7 smallest md5 keys of that lang's docs
        ids = [i for i in range(100) if "abcde"[i % 5] == lang]
        want = [i for _, i in sorted((_key("sample0", i), i) for i in ids)[:7]]
        got = [i for _, i in sorted(members)]
        assert got == want


def test_group_sample_small_group_kept_whole(spark):
    docs = spark.createDataFrame(
        [(0, "x"), (1, "x"), (2, "y")], "doc_id bigint, lang string"
    )
    out = {(r.doc_id, r.lang) for r in A.group_topk_sample(docs, k=5).collect()}
    assert out == {(0, "x"), (1, "x"), (2, "y")}


def test_component_histogram(spark):
    labels = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 3), (4, 4), (5, 5), (6, 5)],
        "doc_id bigint, component bigint",
    )
    got = {
        r.size: r.n_components
        for r in A.component_histogram(labels).collect()
    }
    assert got == {3: 1, 1: 2, 2: 1}


def test_vocab_growth_plateau_and_monotone(spark):
    docs = spark.createDataFrame(
        [(i, f"w{i % 4} common") for i in range(10)],
        "doc_id bigint, text string",
    )
    rows = {r.cutoff: (r.vocab, r.tokens)
            for r in A.vocab_growth(docs, cutoffs=(2, 5, 100)).collect()}
    # cutoff 2: docs 0,1 -> tokens {w0, w1, common} = 3 vocab, 4 tokens
    assert rows[2] == (3, 4)
    # cutoff 5: docs 0..4 -> {w0..w3, common} = 5 vocab, 10 tokens
    assert rows[5] == (5, 10)
    # beyond-corpus cutoff plateaus at the full corpus
    assert rows[100] == (5, 20)
