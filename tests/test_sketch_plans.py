"""Plan audits for the r4 sketch/PQ operators — pin the scale-bearing
physical shapes so a refactor that silently de-broadcasts the sketch or
un-partitions a window is loud.
"""

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_hll_registers_map_side_combine(docs):
    """The register agg must partial-max BEFORE its exchange (each mapper
    ships at most m rows) and scan only the text column."""
    from contentextractor_spark.functions import analysis as A

    plan = _physical(A.hll_registers(docs, p=8, n=3))
    assert "partial_max" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "ReadSchema: struct<text:string>" in plan, plan


def test_cms_topk_broadcast_sketch_and_distributed_topk(docs):
    """The d*w sketch must ride as a BroadcastExchange (never shuffle the
    candidate stream against it), the min-agg must map-side combine, and
    the top-k must be TakeOrderedAndProject with the rank window above
    the k-row limit — no Exchange SinglePartition anywhere."""
    from contentextractor_spark.functions import analysis as A

    plan = _physical(A.cms_topk(docs, n=1, d=4, w=512, k=20))
    assert "BroadcastExchange" in plan, plan
    assert "partial_min" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange SinglePartition" not in plan, plan


def test_pq_topk_broadcasts_and_partitioned_windows(emb):
    """Codebook, ADC tables, and the query side must broadcast (the only
    corpus-sized exchanges are the (vec_id, sub) argmin and the per-query
    shortlist); every window is partitioned (rank pushdown via
    WindowGroupLimit); no single-partition funnel."""
    from contentextractor_spark.functions import analysis as A

    plan = _physical(
        A.pq_topk(emb, n_queries=5, k=3, m=8, n_centroids=16,
                  iters=1, shortlist=20)
    )
    assert plan.count("BroadcastExchange") >= 3, plan
    # the only tolerated SinglePartition is Spark's own injected
    # bloom-filter runtime filter (a scalar subquery building a bloom
    # bitmap — not a data funnel); every occurrence must be one
    n_sp = plan.count("Exchange SinglePartition")
    n_bloom_sp = sum(
        1
        for i, ln in enumerate(plan.splitlines())
        if "Exchange SinglePartition" in ln
        and any(
            "bloom_filter_agg" in nb
            for nb in plan.splitlines()[max(0, i - 2): i + 3]
        )
    )
    assert n_sp == n_bloom_sp, plan
    assert "WindowGroupLimit" in plan, plan


def test_pq_train_global_rank_is_init_only(emb):
    """pq_train_codebook's ONE global window (the rank-spread init over
    the training set) is documented sample-sized; the trained codebook
    itself must come back m*K rows so downstream joins stay broadcast."""
    from contentextractor_spark.functions import analysis as A

    cb = A.pq_train_codebook(emb, m=8, n_centroids=16, iters=1)
    assert cb.count() == 8 * 16


def test_pq_assign_argmin_is_codegen_hashagg(emb):
    """The packed-bigint argmin must plan as a codegen'd HashAggregate
    with a map-side partial combine — min(struct) planned as
    SortAggregate and first(array) as ObjectHashAggregate (measured r4:
    9 Sorts in the ivfpq plan, 2.6x wall); the centroid side rides a
    BroadcastExchange."""
    from contentextractor_spark.functions import analysis as A

    cen = A.pq_train_codebook(emb, m=8, n_centroids=16, iters=1)
    sublen = A._ndim(emb) // 8
    plan = _physical(A._pq_assign(A._pq_subq(emb, 8, sublen), cen, sublen))
    assert "SortAggregate" not in plan, plan
    assert "ObjectHashAggregate" not in plan, plan
    assert "partial_min" in plan, plan
    assert "BroadcastExchange" in plan, plan


def test_kmeans_final_assign_plan_shape(emb):
    """kmeans_clusters' returned plan (training already materialized via
    localCheckpoint) must be: dims explode -> broadcast centroid join ->
    two codegen'd hashaggs (d2 sum, packed argmin) — no sort-based
    aggregate, no single-partition funnel.  The explode form exists
    precisely because the explicit full-dim Add chain provokes
    combinatorial optimizer canonicalization (documented in the
    docstring); this pins the replacement's shape."""
    from contentextractor_spark.functions import analysis as A

    plan = _physical(A.kmeans_clusters(emb, k=4, iters=1))
    assert "SortAggregate" not in plan, plan
    assert "ObjectHashAggregate" not in plan, plan
    assert "partial_min" in plan, plan
    assert "partial_sum" in plan, plan
    assert "BroadcastExchange" in plan, plan
    assert "Exchange SinglePartition" not in plan, plan
