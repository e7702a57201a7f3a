"""Spinglass communities (pottsmodel_2.cpp analog): planted-structure
recovery, karate quality, weighted pull, gamma resolution knob,
determinism, hybrid path."""

import collections
import itertools

from igraph_spark.algorithms.lpa import modularity
from igraph_spark.algorithms.spinglass import spinglass_communities
from igraph_spark.generators import famous
from igraph_spark.graph import Graph


def _labels(df):
    return {r["id"]: r["label"] for r in df.collect()}


def _clique_pair_edges():
    e = [(i, j) for i, j in itertools.combinations(range(5), 2)]
    e += [(i + 5, j + 5) for i, j in itertools.combinations(range(5), 2)]
    e += [(4, 5)]
    return e


def test_two_cliques_split_exactly(spark):
    g = Graph(spark.createDataFrame(_clique_pair_edges(),
                                    "src long, dst long"), directed=False)
    lab = _labels(spinglass_communities(g))
    assert {lab[i] for i in range(5)} == {0}
    assert {lab[i] for i in range(5, 10)} == {1}


def test_ring_of_cliques(spark):
    e = []
    for c in range(4):
        base = 4 * c
        e += [(base + i, base + j)
              for i, j in itertools.combinations(range(4), 2)]
        e.append((base + 3, (base + 4) % 16))
    g = Graph(spark.createDataFrame(e, "src long, dst long"),
              directed=False)
    lab = _labels(spinglass_communities(g))
    assert len(set(lab.values())) == 4
    for c in range(4):
        assert len({lab[4 * c + i] for i in range(4)}) == 1


def test_karate_quality_and_determinism(spark):
    g = famous(spark, "Zachary")
    m1 = spinglass_communities(g)
    lab = _labels(m1)
    # gamma=1 == modularity optimization; the known optimum is 4
    # communities at Q = 0.4198
    k = len(set(lab.values()))
    assert 2 <= k <= 6
    assert modularity(g, m1) > 0.38
    assert _labels(spinglass_communities(g)) == lab


def test_weighted_pull(spark):
    e = [(0, 1, 1.0), (1, 2, 20.0), (2, 3, 1.0), (3, 0, 1.0),
         (0, 2, 1.0)]
    g = Graph(spark.createDataFrame(e, "src long, dst long, weight double"),
              directed=False)
    lab = _labels(spinglass_communities(g))
    assert lab[1] == lab[2]


def test_gamma_resolution(spark):
    # small gamma weakens the null-model penalty -> coarser partition
    g = Graph(spark.createDataFrame(_clique_pair_edges(),
                                    "src long, dst long"), directed=False)
    # crossing the merge barrier (breaking a clique vertex out costs
    # +4 before the gain) needs a hot start, as in any annealer
    lab_lo = _labels(spinglass_communities(g, gamma=0.05, start_temp=5.0))
    lab_hi = _labels(spinglass_communities(g, gamma=1.0))
    assert len(set(lab_lo.values())) <= len(set(lab_hi.values()))
    assert len(set(lab_lo.values())) == 1


def test_hybrid_path_matches_planted(spark):
    g = Graph(spark.createDataFrame(_clique_pair_edges(),
                                    "src long, dst long"), directed=False)
    lab = _labels(spinglass_communities(g, vertex_threshold=0))
    assert {lab[i] for i in range(5)} == {0}
    assert {lab[i] for i in range(5, 10)} == {1}
