"""isoclass / isoclass_create / graph_count (topology.c analogs):
class counts, round-trips, agreement with the motif tables and the
validated directed-3 numbering."""

import itertools

import pytest

from igraph_spark.graph import Graph
from igraph_spark.operators.isoclass import (graph_count, isoclass,
                                             isoclass_create, _tables)


def test_graph_counts():
    assert graph_count(3, directed=False) == 4
    assert graph_count(3, directed=True) == 16
    assert graph_count(4, directed=False) == 11
    assert graph_count(4, directed=True) == 218


def test_tables_agree_with_motif_census_tables():
    from igraph_spark.algorithms.motifs import _dir4_tables
    code2cls, _, _ = _dir4_tables()
    assert _tables(4, True)[1] == code2cls


def test_known_directed3_classes(spark):
    # validated numbering (motifs.c:1062-1078): mutual dyad = 3,
    # cyclic triple = 11, transitive triple = 7, full = 15
    cases = [([(0, 1), (1, 0)], 3),
             ([(0, 1), (1, 2), (2, 0)], 11),
             ([(0, 1), (1, 2), (0, 2)], 7)]
    for edges, expect in cases:
        g = Graph(spark.createDataFrame(edges, "src long, dst long"),
                  spark.range(3).toDF("id"), directed=True)
        assert isoclass(g) == expect, edges


def test_known_undirected4_classes(spark):
    # claw=4, P4=6, C4=8, K4=10 (igraph_motifs_randesu.out numbering)
    cases = [([(0, 1), (0, 2), (0, 3)], 4),
             ([(0, 1), (1, 2), (2, 3)], 6),
             ([(0, 1), (1, 2), (2, 3), (0, 3)], 8),
             (list(itertools.combinations(range(4), 2)), 10)]
    for edges, expect in cases:
        g = Graph(spark.createDataFrame(edges, "src long, dst long"),
                  spark.range(4).toDF("id"), directed=False)
        assert isoclass(g) == expect, edges


@pytest.mark.parametrize("size,directed", [(3, False), (3, True),
                                           (4, False), (4, True)])
def test_create_round_trip(spark, size, directed):
    n = graph_count(size, directed)
    # every 8th class for directed-4 (218 round trips would be slow)
    step = 8 if n > 50 else 1
    for c in range(0, n, step):
        g = isoclass_create(spark, size, c, directed)
        assert isoclass(g) == c, c


def test_isoclass_relabeling_invariant(spark):
    # class is invariant under vertex relabeling
    e1 = [(0, 1), (1, 2), (2, 3)]
    e2 = [(3, 2), (2, 0), (0, 1)]  # same path, different labels
    g1 = Graph(spark.createDataFrame(e1, "src long, dst long"),
               spark.range(4).toDF("id"), directed=False)
    g2 = Graph(spark.createDataFrame(e2, "src long, dst long"),
               spark.range(4).toDF("id"), directed=False)
    assert isoclass(g1) == isoclass(g2) == 6
