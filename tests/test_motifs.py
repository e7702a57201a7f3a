"""Triad census parity vs the reference's own golden fixture
(/root/reference/examples/simple/triad_census.c and .out, run by
tests/motifs.at:30-33)."""

from igraph_spark.graph import Graph
from igraph_spark.algorithms.motifs import triad_census, TRIAD_ORDER

# the 10-vertex / 20-edge directed graph from triad_census.c:14-17
FIXTURE_EDGES = [(0, 2), (1, 4), (2, 5), (2, 7), (3, 7), (3, 8), (4, 2),
                 (5, 8), (6, 0), (6, 1), (6, 2), (7, 0), (8, 0), (8, 2),
                 (8, 3), (8, 5), (9, 2), (9, 3), (9, 4), (9, 5)]

# golden vectors from triad_census.out
GOLD_DIRECTED = [25, 45, 7, 7, 12, 11, 2, 4, 4, 1, 1, 0, 0, 1, 0, 0]
GOLD_UNDIRECTED = [25, 0, 52, 0, 0, 0, 0, 0, 0, 0, 37, 0, 0, 0, 0, 6]


def _census_vector(graph):
    rows = {r["triad"]: int(r["count"]) for r in triad_census(graph).collect()}
    return [rows[t] for t in TRIAD_ORDER]


def test_triad_census_directed_golden(spark):
    g = Graph.from_edge_list(spark, FIXTURE_EDGES, n=10, directed=True)
    assert _census_vector(g) == GOLD_DIRECTED


def test_triad_census_undirected_golden(spark):
    g = Graph.from_edge_list(spark, FIXTURE_EDGES, n=10, directed=False)
    assert _census_vector(g) == GOLD_UNDIRECTED


def test_triad_census_total_is_n_choose_3(spark):
    g = Graph.from_edge_list(spark, FIXTURE_EDGES, n=10, directed=True)
    assert sum(_census_vector(g)) == 10 * 9 * 8 // 6


def test_triad_census_empty_graph(spark):
    g = Graph.from_edge_list(spark, [], n=5, directed=True)
    vec = _census_vector(g)
    assert vec[0] == 5 * 4 * 3 // 6 and sum(vec[1:]) == 0


def test_motifs_randesu_mutual_ring(spark):
    # igraph_motifs_randesu.out: a mutual directed ring puts all mass
    # on isoclass 10 (two mutual edges at a shared vertex = triad 201)
    from igraph_spark.algorithms.motifs import motifs_randesu
    n = 50
    edges = [(i, (i + 1) % n) for i in range(n)] + \
            [((i + 1) % n, i) for i in range(n)]
    g = Graph.from_edge_list(spark, edges, n=n, directed=True)
    hist = {r.isoclass: r["count"] for r in motifs_randesu(g).collect()}
    assert hist[10] == n
    assert hist[0] is None and hist[1] is None and hist[3] is None
    assert all(v == 0 for k, v in hist.items() if k not in (0, 1, 3, 10))


def test_motifs_randesu_bull_undirected(spark):
    # motifs_randesu_callback fixture on the bull graph: 4 paths
    # (class 2) + 1 triangle (class 3)
    from igraph_spark.algorithms.motifs import motifs_randesu
    bull = Graph.from_edge_list(
        spark, [(0, 1), (0, 2), (1, 2), (1, 3), (2, 4)], n=5,
        directed=False)
    hist = {r.isoclass: r["count"] for r in motifs_randesu(bull).collect()}
    assert hist == {0: None, 1: None, 2: 4, 3: 1}
