"""LPA fixtures: the reference's own deterministic cases
(igraph_community_label_propagation.c:66-83, FIXTURES.md §3.3) plus the
karate invariant test (<=4 communities, :56-62)."""

from igraph_spark.graph import Graph
from igraph_spark.algorithms.lpa import label_propagation, modularity
from igraph_spark.generators import famous

LPA6 = [(0, 1), (0, 2), (0, 3), (0, 4), (0, 5),
        (2, 3), (2, 4), (3, 4), (3, 5), (4, 5)]
LPA6_W = [5.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]


def _labels(df, n):
    rows = {r["id"]: r["label"] for r in df.collect()}
    return [rows[i] for i in range(n)]


def test_weighted_fixed_labels_exact(spark):
    g = Graph.from_edge_list(spark, LPA6, n=6, directed=False,
                             weights=LPA6_W)
    got = _labels(label_propagation(
        g, weights=True,
        initial={0: 0, 1: 0, 2: 1, 3: 1, 4: 1, 5: 1},
        fixed={3, 4, 5}), 6)
    assert got == [0, 0, 1, 1, 1, 1]


def test_unweighted_fixed_all_zero(spark):
    g = Graph.from_edge_list(spark, LPA6, n=6, directed=False)
    got = _labels(label_propagation(
        g, weights=False,
        initial={0: 0, 1: 0, 2: 1, 3: 1, 4: 1, 5: 1},
        fixed={3, 4, 5}), 6)
    # unweighted: label 0's heavy edge is gone; everything flows to 0
    # via the hub — the reference asserts all labels equal
    assert len(set(got)) == 1


def test_karate_invariant(spark):
    g = famous(spark, "Zachary")
    mem = label_propagation(g, seed=42)
    labels = _labels(mem, 34)
    n_comm = len(set(labels))
    assert 1 <= n_comm <= 4            # reference invariant (:56-62)
    assert all(v >= 0 for v in labels)
    # labels densely numbered in first-appearance order
    assert labels[0] == 0
    assert set(labels) == set(range(n_comm))


def test_unlabeled_stay_minus_one(spark):
    # two disconnected pairs; only one pair is seeded
    g = Graph.from_edge_list(spark, [(0, 1), (2, 3)], n=4, directed=False)
    got = _labels(label_propagation(g, initial={0: 7}), 4)
    assert got[0] == 0 and got[1] == 0
    assert got[2] == -1 and got[3] == -1


def test_modularity_karate_two_split(spark):
    # the classic factions split has modularity ~0.371 (public result)
    g = famous(spark, "Zachary")
    faction2 = {8, 9, 14, 15, 18, 20, 22, 23, 24, 25, 26, 27, 28, 29,
                30, 31, 32, 33}
    mem = [(i, 1 if i in faction2 else 0) for i in range(34)]
    mdf = spark.createDataFrame(mem, "id long, label long")
    q = modularity(g, mdf)
    assert abs(q - 0.3715) < 0.01


def test_modularity_all_one_community(spark):
    g = famous(spark, "Zachary")
    mdf = spark.createDataFrame([(i, 0) for i in range(34)],
                                "id long, label long")
    assert abs(modularity(g, mdf)) < 1e-12


def test_lpa_csr_kernel_matches_join(spark):
    from igraph_spark.generators import famous
    from igraph_spark.algorithms.lpa import label_propagation
    g = famous(spark, "Zachary")
    a = label_propagation(g, max_iter=12, seed=5)
    b = label_propagation(g, max_iter=12, seed=5, kernel="csr")
    ra = sorted((r.id, r.label) for r in a.collect())
    rb = sorted((r.id, r.label) for r in b.collect())
    assert ra == rb


def test_lpa_fixed_dataframe_flag(spark):
    from igraph_spark.generators import famous
    from igraph_spark.algorithms.lpa import label_propagation
    g = famous(spark, "Zachary")
    fixed_df = g.edges.sparkSession.createDataFrame([(0,), (33,)], "id long")
    out = label_propagation(g, initial={0: 100, 33: 200},
                            fixed=fixed_df, max_iter=8, seed=5)
    # the two pinned hubs keep their distinct seed labels, so they must
    # land in different communities; everyone gets some label
    labs = {r.id: r.label for r in out.collect()}
    assert labs[0] != labs[33]
    assert all(v >= 0 for v in labs.values())
