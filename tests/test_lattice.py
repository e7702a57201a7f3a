"""N-D lattice generator vs the reference's LAT_TEST expectations
(examples/simple/igraph_lattice.c)."""

from igraph_spark.generators import lattice


def _edges(g):
    return sorted((r["src"], r["dst"]) for r in g.edges.collect())


def test_lattice_2x2(spark):
    # LAT_TEST u_2x2: dims 2,2 -> (0,1),(0,2),(1,3),(2,3)
    g = lattice(spark, [2, 2])
    assert _edges(g) == [(0, 1), (0, 2), (1, 3), (2, 3)]
    assert g.vcount() == 4


def test_lattice_2x1_and_degenerate(spark):
    # LAT_TEST u_2x1: dims 2,1 -> single edge (0,1); 1x1 and 0-dim empty
    assert _edges(lattice(spark, [2, 1])) == [(0, 1)]
    assert _edges(lattice(spark, [1, 1])) == []
    assert lattice(spark, [1, 1]).vcount() == 1


def test_lattice_circular_2x2_dedupes(spark):
    # LAT_TEST uc_2x2: circular dims 2,2 has the SAME 4 edges (the
    # size-2 wrap would duplicate, reference guard drops it)
    g = lattice(spark, [2, 2], circular=True)
    assert _edges(g) == [(0, 1), (0, 2), (1, 3), (2, 3)]


def test_lattice_circular_ring(spark):
    # circular 1-D lattice of 5 == C5
    g = lattice(spark, [5], circular=True)
    # undirected Graph stores canonical (min, max): wrap edge is (0, 4)
    assert _edges(g) == [(0, 1), (0, 4), (1, 2), (2, 3), (3, 4)]


def test_lattice_3d_degrees(spark):
    # 3x3x3 non-circular: corner degree 3, center degree 6, 54 edges
    g = lattice(spark, [3, 3, 3])
    assert g.ecount() == 54
    deg = {r["id"]: r["degree"] for r in g.degree().collect()}
    assert deg[0] == 3 and deg[13] == 6


def test_lattice_directed_mutual(spark):
    g = lattice(spark, [3], directed=True, mutual=True)
    assert _edges(g) == [(0, 1), (1, 0), (1, 2), (2, 1)]
    gc = lattice(spark, [2], directed=True, circular=True)
    assert _edges(gc) == [(0, 1), (1, 0)]
