"""Hierarchical random graphs (reference src/igraph_hrg.cc): fit
likelihood structure, deterministic sampling, missing-link ranking."""

from pyspark.sql import functions as F

import pytest

from igraph_spark.graph import Graph
from igraph_spark.algorithms.hrg import (hrg_fit, hrg_game, hrg_predict,
                                         hrg_sample)


def _two_cliques(spark, k=5, bridge=True):
    rows = [(i, j) for i in range(k) for j in range(i + 1, k)]
    rows += [(i, j) for i in range(k, 2 * k) for j in range(i + 1, 2 * k)]
    if bridge:
        rows.append((0, k))
    e = spark.createDataFrame(rows, "src long, dst long")
    return Graph(e, spark.range(2 * k), directed=False)


def test_fit_shape_and_root(spark):
    g = _two_cliques(spark)
    d = hrg_fit(g, steps=4000, seed=1)
    rows = d.collect()
    n = 10
    assert len(rows) == n - 1
    assert sorted(r.node for r in rows) == list(range(n - 1))
    # every leaf appears exactly once across left/right
    leaves = [x for r in rows for x in (r.left, r.right) if x >= 0]
    assert sorted(leaves) == list(range(n))
    internals = [-(x + 1) for r in rows for x in (r.left, r.right) if x < 0]
    assert sorted(internals) == list(range(1, n - 1))
    for r in rows:
        assert 0.0 <= r.prob <= 1.0


def test_fit_separates_cliques(spark):
    g = _two_cliques(spark)
    d = hrg_fit(g, steps=6000, seed=3).collect()
    # find each leaf's clique-mates' LCA probabilities: the root split
    # of a well-fit model separates the cliques -> root prob small
    root = [r for r in d if r.node == 0][0]
    assert root.prob <= 0.5


def test_fit_deterministic(spark):
    g = _two_cliques(spark)
    a = sorted(map(tuple, hrg_fit(g, steps=1500, seed=9).collect()))
    b = sorted(map(tuple, hrg_fit(g, steps=1500, seed=9).collect()))
    assert a == b


def test_game_deterministic_extremes(spark):
    # dendrogram: root (p=0) over two p=1 pairs -> exactly 2 edges
    rows = [(0, -2, -3, 0.0), (1, 0, 1, 1.0), (2, 2, 3, 1.0)]
    d = spark.createDataFrame(rows, "node long, left long, right long, "
                                    "prob double")
    g = hrg_game(spark, d, seed=5)
    got = sorted((r.src, r.dst) for r in g.edges.collect())
    assert got == [(0, 1), (2, 3)]
    assert g.vcount() == 4


def test_game_probability_mean(spark):
    # single internal node, 30x30 split at p=0.5
    rows = [(0, -2, -3, 0.5),
            (1, *(-4, -5), 1.0), (3, 0, 1, 1.0), (4, 2, 3, 1.0),
            (2, *(-6, -7), 1.0), (5, 10, 11, 1.0), (6, 12, 13, 1.0)]
    d = spark.createDataFrame(rows, "node long, left long, right long, "
                                    "prob double")
    g = hrg_game(spark, d, seed=6)
    # root block is leaves{0,1,2,3} x leaves{10,11,12,13}: 16 pairs at .5
    cross = [r for r in g.edges.collect()
             if (r.src < 10) != (r.dst < 10)]
    assert 2 <= len(cross) <= 14


def test_sample_roundtrip(spark):
    g = _two_cliques(spark, k=4)
    s = hrg_sample(g, seed=11, steps=2000)
    assert s.vcount() == 8


def test_predict_ranks_missing_clique_edge_first(spark):
    # two 4-cliques, one in-clique edge removed: it must outrank
    # every cross-clique non-edge
    k = 4
    rows = [(i, j) for i in range(k) for j in range(i + 1, k)
            if (i, j) != (1, 2)]
    rows += [(i, j) for i in range(k, 2 * k) for j in range(i + 1, 2 * k)]
    e = spark.createDataFrame(rows, "src long, dst long")
    g = Graph(e, spark.range(2 * k), directed=False)
    pred = hrg_predict(g, num_samples=15, seed=13).collect()
    top = (pred[0].src, pred[0].dst)
    assert top == (1, 2)


def test_driver_gate(spark):
    g = _two_cliques(spark)
    with pytest.raises(ValueError, match="sequential"):
        hrg_fit(g, max_driver_vertices=5)
