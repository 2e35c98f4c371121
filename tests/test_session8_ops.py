"""Unit tests for the r5 session-8 graph-analytics operators:
clustering_coefficients (Watts-Strogatz local cc in milli-units),
link_reciprocity (per-source mutual-edge fraction), and
degree_assortativity (Newman r as the exact symmetric-orientation
integer OLS slope)."""

from contentextractor_spark.functions import analysis as A


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


# --------------------------------------------- clustering_coefficients


def test_cc_complete_graph_is_1000(spark):
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    rows = A.clustering_coefficients(_edges(spark, k4)).collect()
    assert len(rows) == 4
    for r in rows:
        assert (r.deg, r.triangles, r.cc_milli) == (3, 3, 1000)


def test_cc_path_graph_middle_node_zero(spark):
    rows = A.clustering_coefficients(_edges(spark, [(1, 2), (2, 3)])).collect()
    # only node 2 has deg >= 2; no triangles anywhere
    assert [(r.node, r.deg, r.triangles, r.cc_milli) for r in rows] == [
        (2, 2, 0, 0)
    ]


def test_cc_triangle_plus_pendant(spark):
    # triangle 1-2-3 plus pendant 3-4: node 3 has deg 3, one triangle
    # -> cc = 2*1/(3*2) = 333 milli; nodes 1,2 -> 1000; node 4 excluded
    g = [(1, 2), (2, 3), (1, 3), (3, 4)]
    rows = {r.node: r for r in A.clustering_coefficients(_edges(spark, g)).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1].cc_milli == 1000 and rows[2].cc_milli == 1000
    assert (rows[3].deg, rows[3].triangles, rows[3].cc_milli) == (3, 1, 333)


def test_cc_direction_and_duplicates_ignored(spark):
    # both orientations + duplicates of the same triangle collapse
    g = [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (1, 3), (1, 1)]
    rows = A.clustering_coefficients(_edges(spark, g)).collect()
    assert all((r.deg, r.triangles, r.cc_milli) == (2, 1, 1000) for r in rows)
    assert len(rows) == 3


# -------------------------------------------------- link_reciprocity


def test_reciprocity_hand_graph(spark):
    # 1->2, 2->1 mutual; 1->3 one-way; 4->4 self-loop dropped
    g = [(1, 2), (2, 1), (1, 3), (4, 4)]
    rows = {r.node: r for r in A.link_reciprocity(_edges(spark, g)).collect()}
    assert set(rows) == {1, 2}
    assert (rows[1].outdeg, rows[1].mutual, rows[1].recip_milli) == (2, 1, 500)
    assert (rows[2].outdeg, rows[2].mutual, rows[2].recip_milli) == (1, 1, 1000)


def test_reciprocity_duplicate_edges_count_once(spark):
    g = [(1, 2), (1, 2), (2, 1)]
    rows = {r.node: r for r in A.link_reciprocity(_edges(spark, g)).collect()}
    assert (rows[1].outdeg, rows[1].mutual, rows[1].recip_milli) == (1, 1, 1000)


def test_reciprocity_no_mutual_edges(spark):
    g = [(1, 2), (2, 3), (3, 1)]  # directed 3-cycle: zero reciprocity
    rows = A.link_reciprocity(_edges(spark, g)).collect()
    assert all(r.mutual == 0 and r.recip_milli == 0 for r in rows)


# --------------------------------------------- degree_assortativity


def test_assortativity_star_is_exactly_minus_one(spark):
    # K_{1,100}: num = -den exactly (integer identity), full-precision
    # branch -> -1000000 with zero truncation error
    g = [(0, i) for i in range(1, 101)]
    row = A.degree_assortativity(_edges(spark, g)).collect()[0]
    assert row.n_endpoints == 200
    assert row.assort_micro == -1000000


def test_assortativity_regular_ring_is_zero(spark):
    # 2-regular ring: zero degree variance -> num = den = 0 -> 0
    n = 12
    g = [(i, (i + 1) % n) for i in range(n)]
    row = A.degree_assortativity(_edges(spark, g)).collect()[0]
    assert row.assort_micro == 0


def test_assortativity_two_cliques_bridged_positive(spark):
    # two K4s joined by one bridge: like-degrees attach -> r > 0 is NOT
    # guaranteed (bridge endpoints have higher degree than clique mates)
    # — assert the exact integer instead of a sign heuristic
    k = [(a, b) for a in range(4) for b in range(4) if a < b]
    g = k + [(a + 4, b + 4) for a, b in k] + [(0, 4)]
    row = A.degree_assortativity(_edges(spark, g)).collect()[0]
    # hand check: 13 und edges, degrees: nodes 0,4 -> 4; others -> 3
    # pairs (x,y) over both orientations; verified against numpy pearson
    import numpy as np

    deg = {n: 0 for n in range(8)}
    for a, b in k + [(a + 4, b + 4) for a, b in k] + [(0, 4)]:
        deg[a] += 1
        deg[b] += 1
    xs, ys = [], []
    for a, b in k + [(a + 4, b + 4) for a, b in k] + [(0, 4)]:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    r = np.corrcoef(xs, ys)[0, 1]
    assert abs(row.assort_micro - int(r * 1_000_000)) <= 1
