"""Cohesive blocking family (flow.c / separators.c /
cohesive_blocks.c analogs): all_st_mincuts, minimum_size_separators,
is_separator, cohesive_blocks — golden against the reference's own
cohesive_blocks.out fixtures (Moody-White, the tricky separator-block
graph, the science-camp graph, karate)."""

import pytest

from igraph_spark.algorithms.flow import (
    all_st_mincuts, cohesive_blocks, is_separator,
    minimum_size_separators)
from igraph_spark.generators import famous, ring
from igraph_spark.graph import Graph

MW = [(0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (1, 2), (1, 3), (1, 4),
      (1, 6), (2, 3), (2, 5), (2, 6), (3, 4), (3, 5), (3, 6), (4, 5),
      (4, 6), (4, 20), (5, 6), (6, 7), (6, 10), (6, 13), (6, 18),
      (7, 8), (7, 10), (7, 13), (8, 9), (9, 11), (9, 12), (10, 11),
      (10, 13), (11, 15), (12, 15), (13, 14), (14, 15), (16, 17),
      (16, 18), (16, 19), (17, 19), (17, 20), (18, 19), (18, 21),
      (18, 22), (19, 20), (20, 21), (20, 22), (21, 22)]

TRICKY = [(0, 1), (0, 4), (0, 5), (1, 2), (1, 4), (1, 5), (1, 6),
          (2, 3), (2, 5), (2, 6), (2, 7), (3, 6), (3, 7), (4, 5),
          (5, 6), (6, 7)]

SCIENCE = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (1, 16), (1, 17),
           (2, 3), (3, 17), (4, 5), (4, 6), (4, 7), (4, 8), (5, 6),
           (5, 7), (6, 7), (6, 8), (7, 8), (7, 16), (8, 9), (8, 10),
           (9, 11), (9, 12), (9, 13), (9, 14), (10, 11), (10, 12),
           (10, 13), (11, 14), (12, 13), (12, 14), (12, 15), (15, 16),
           (15, 17), (16, 17)]


def test_all_st_mincuts_path(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 3)], n=4,
                             directed=True)
    r = all_st_mincuts(g, 0, 3)
    assert r["value"] == 1.0
    assert sorted(map(tuple, (c[0] for c in r["cuts"]))) == \
        [(0, 1), (1, 2), (2, 3)]
    assert sorted(map(tuple, r["partitions"])) == \
        [(0,), (0, 1), (0, 1, 2)]


def test_minimum_size_separators_rings(spark):
    assert sorted(map(tuple, minimum_size_separators(ring(spark, 4)))) \
        == [(0, 2), (1, 3)]
    # C5: every non-adjacent pair is a minimum separator
    assert sorted(map(tuple, minimum_size_separators(ring(spark, 5)))) \
        == [(0, 2), (0, 3), (1, 3), (1, 4), (2, 4)]


def test_is_separator(spark):
    g = Graph.from_edge_list(
        spark, [(0, 1), (0, 2), (1, 2), (2, 3), (2, 4), (3, 4)],
        n=5, directed=False)  # bowtie, cut vertex 2
    assert is_separator(g, [2])
    assert not is_separator(g, [0])
    assert not is_separator(g, [0, 1, 3, 4])  # leaves single vertex


def test_cohesive_blocks_moody_white(spark):
    # reference fixture cohesive_blocks.out, first graph
    g = Graph.from_edge_list(spark, MW, n=23, directed=False)
    r = cohesive_blocks(g)
    assert r["blocks"] == [
        list(range(23)),
        [0, 1, 2, 3, 4, 5, 6, 16, 17, 18, 19, 20, 21, 22],
        [6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
        [0, 1, 2, 3, 4, 5, 6],
        [6, 7, 10, 13]]
    assert r["cohesion"] == [1, 2, 2, 5, 3]
    assert r["parents"] == [-1, 0, 0, 1, 2]
    assert sorted(r["block_tree"]) == [(0, 1), (0, 2), (1, 3), (2, 4)]


def test_cohesive_blocks_tricky_separator_block(spark):
    # second fixture: the separators themselves form a (non-reported)
    # block; the reference reports exactly these four
    g = Graph.from_edge_list(spark, TRICKY, n=8, directed=False)
    r = cohesive_blocks(g)
    assert r["blocks"] == [[0, 1, 2, 3, 4, 5, 6, 7], [0, 1, 4, 5],
                           [2, 3, 6, 7], [1, 2, 5, 6]]
    assert r["cohesion"] == [2, 3, 3, 3]
    assert r["parents"] == [-1, 0, 0, 0]


def test_cohesive_blocks_science_camp(spark):
    g = Graph.from_edge_list(spark, SCIENCE, n=18, directed=False)
    r = cohesive_blocks(g)
    assert r["blocks"] == [list(range(18)), [0, 1, 2, 3],
                           [4, 5, 6, 7, 8], [9, 10, 11, 12, 13, 14]]
    assert r["cohesion"] == [2, 3, 3, 3]
    assert r["parents"] == [-1, 0, 0, 0]


def test_cohesive_blocks_karate(spark):
    r = cohesive_blocks(famous(spark, "Zachary"))
    assert r["cohesion"] == [1, 2, 2, 4, 3, 3, 4, 3]
    assert r["blocks"][3] == [0, 1, 2, 3, 7]
    assert r["blocks"][7] == [2, 23, 24, 25, 27, 28, 29, 31, 32, 33]


def test_distributed_path_agrees(spark):
    # force the distributed-primitive queue loop on the tricky fixture
    from igraph_spark.algorithms.flow import _cohesive_blocks_distributed
    g = Graph.from_edge_list(spark, TRICKY, n=8, directed=False)
    r = _cohesive_blocks_distributed(g)
    assert r["cohesion"] == [2, 3, 3, 3]
    assert r["blocks"][1:] == [[0, 1, 4, 5], [2, 3, 6, 7], [1, 2, 5, 6]]
