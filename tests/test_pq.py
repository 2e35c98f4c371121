"""Product quantization (r4): deterministic integer-Lloyd training, ADC
shortlist + exact rescore.

Spark↔DuckDB parity of the driver rows is covered by test_entry_oracle;
here: bit-parity of the whole training pipeline against an independent
numpy replica, recall on clustered data, and the empty-cluster guard.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from contentextractor_spark.functions import analysis as A

DIM = 64


def _clustered(n_clusters=10, per=20, dim=DIM):
    """Deterministic clustered vectors: center per cluster + small offset
    — real neighborhood structure, unlike the near-uniform fixture."""
    rng = np.random.RandomState(42)
    centers = rng.uniform(-0.5, 0.5, (n_clusters, dim))
    vecs = []
    for c in range(n_clusters):
        for j in range(per):
            vecs.append(centers[c] + rng.uniform(-0.05, 0.05, dim))
    return np.array(vecs)


@pytest.fixture(scope="module")
def emb(spark):
    M = _clustered()
    rows = [(i, [float(x) for x in M[i]], int(i // 20)) for i in range(len(M))]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    return df, M


def _numpy_replica(M, m, K, iters, q=4096):
    N, D = M.shape
    sub = D // m
    Mq = np.clip(np.round(M * q), -q, q).astype(np.int64)
    cb = [Mq[[(c * N) // K for c in range(K)], s * sub:(s + 1) * sub].copy()
          for s in range(m)]
    for _ in range(iters):
        for s in range(m):
            X = Mq[:, s * sub:(s + 1) * sub]
            a = np.argmin(((X[:, None, :] - cb[s][None, :, :]) ** 2).sum(-1), axis=1)
            for c in range(K):
                pts = X[a == c]
                if len(pts):
                    cb[s][c] = (pts.sum(0) + q * len(pts)) // len(pts) - q
    codes = np.stack(
        [np.argmin(((Mq[:, s * sub:(s + 1) * sub][:, None, :]
                     - cb[s][None, :, :]) ** 2).sum(-1), axis=1)
         for s in range(m)], 1)
    return codes


def test_codes_match_numpy_replica(emb):
    """The whole integer training pipeline (clamped quantize, rank-spread
    init, floor-div offset means, (d2, cid) argmin) is bit-identical to
    an independent numpy implementation — the determinism the oracle
    depends on."""
    df, M = emb
    m, K, iters = 8, 16, 2
    expected = _numpy_replica(M, m, K, iters)
    got = {(r["vec_id"], r["sub"]): r["code"]
           for r in A.pq_codes(df, m=m, n_centroids=K, iters=iters).collect()}
    assert len(got) == len(M) * m
    assert all(got[(v, s)] == expected[v, s]
               for v in range(len(M)) for s in range(m))


def test_topk_recall_on_clustered(emb):
    """On data with real neighborhood structure the two-stage search
    recovers the exact top-k nearly perfectly (the fixture corpus, being
    near-uniform, measures 0.94 at the entry defaults — see the module
    docstring in analysis.py)."""
    df, M = emb
    res = A.pq_topk(df, n_queries=10, k=5, m=8, n_centroids=16,
                    iters=2, shortlist=50).collect()
    byq = {}
    for r in res:
        byq.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = tot = 0
    for q in range(10):
        d = ((M - M[q]) ** 2).sum(-1)
        true = [i for i in np.argsort(d, kind="stable") if i != q][:5]
        hits += len(byq[q] & set(true))
        tot += 5
    assert hits / tot >= 0.9, hits / tot


def test_empty_clusters_keep_init_centroid(spark):
    """K larger than the corpus: unmatched centroids must survive via the
    left-join coalesce and encoding must still produce m codes/vector."""
    rows = [(i, [float((i * 7 + d) % 5) / 10 for d in range(8)], 0)
            for i in range(4)]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    cb = A.pq_train_codebook(df, m=2, n_centroids=8, iters=2).collect()
    assert len(cb) == 2 * 8  # no centroid lost to an empty cluster
    codes = A.pq_codes(df, m=2, n_centroids=8, iters=2).collect()
    assert len(codes) == 4 * 2


def test_rank_spread_init_uses_data_points(spark):
    """iters=0 codebook must equal the rank-spread quantized subvectors
    (init is data-dependent, not random)."""
    rows = [(i, [float(i) / 10] * 8, 0) for i in range(10)]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    cb = {(r["sub"], r["cid"]): r["cen"]
          for r in A.pq_train_codebook(df, m=2, n_centroids=5, iters=0).collect()}
    for c in range(5):
        src_vec = (c * 10) // 5  # rank-spread pick
        want = [round(src_vec / 10 * 4096)] * 4
        assert cb[(0, c)] == want and cb[(1, c)] == want


def test_ivfpq_recall_on_clustered(emb):
    """IVF routing composed over the PQ codes: on clustered data the
    nprobe lists contain the true neighbors (same-cluster vectors land in
    the same coarse list), so composed recall stays high."""
    df, M = emb
    res = A.ivfpq_topk(df, n_queries=10, k=5, n_lists=4, nprobe=2,
                       m=8, n_centroids=16, iters=2, shortlist=50).collect()
    byq = {}
    for r in res:
        byq.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = tot = 0
    for q in range(10):
        d = ((M - M[q]) ** 2).sum(-1)
        true = [i for i in np.argsort(d, kind="stable") if i != q][:5]
        hits += len(byq.get(q, set()) & set(true))
        tot += 5
    assert hits / tot >= 0.8, hits / tot
