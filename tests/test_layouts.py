"""Layouts (layout.c analogs): coordinate goldens + force-directed
separation invariant."""

import math

from igraph_spark.graph import Graph
from igraph_spark.generators import ring
from igraph_spark.layouts import (
    layout_circle, layout_fruchterman_reingold, layout_grid,
    layout_random)


def test_circle_coordinates(spark):
    c = {r.id: (r.x, r.y) for r in layout_circle(ring(spark, 8)).collect()}
    assert abs(c[0][0] - 1.0) < 1e-12 and abs(c[0][1]) < 1e-12
    assert abs(c[2][0]) < 1e-12 and abs(c[2][1] - 1.0) < 1e-12
    assert abs(c[4][0] + 1.0) < 1e-12


def test_grid_row_major(spark):
    g = {r.id: (r.x, r.y) for r in layout_grid(ring(spark, 8)).collect()}
    assert g[0] == (0.0, 0.0) and g[2] == (2.0, 0.0) and g[3] == (0.0, 1.0)


def test_random_layout_deterministic_in_range(spark):
    g = ring(spark, 100)
    a = sorted((r.id, r.x, r.y) for r in layout_random(g, 7).collect())
    b = sorted((r.id, r.x, r.y) for r in layout_random(g, 7).collect())
    assert a == b
    assert all(-1 <= x <= 1 and -1 <= y <= 1 for _, x, y in a)


def test_fr_separates_disconnected_cliques(spark):
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5)]
    g = Graph.from_edge_list(spark, edges, n=6, directed=False)
    pos = {r.id: (r.x, r.y)
           for r in layout_fruchterman_reingold(g, iterations=25).collect()}

    def dist(a, b):
        return math.dist(pos[a], pos[b])

    intra = (dist(0, 1) + dist(1, 2) + dist(0, 2)
             + dist(3, 4) + dist(4, 5) + dist(3, 5)) / 6
    inter = sum(dist(a, b) for a in (0, 1, 2) for b in (3, 4, 5)) / 9
    assert inter > 1.5 * intra, (intra, inter)
