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


# ---------------------------------------------------------------- KK


def test_kk_triangle_is_equilateral(spark):
    from igraph_spark.layouts import layout_kamada_kawai
    e = [(0, 1), (1, 2), (2, 0)]
    g = Graph(spark.createDataFrame(e, "src long, dst long"),
              directed=False)
    pos = {r["id"]: (r["x"], r["y"])
           for r in layout_kamada_kawai(g).collect()}
    import math
    d = []
    for a, b in e:
        (xa, ya), (xb, yb) = pos[a], pos[b]
        d.append(math.hypot(xa - xb, ya - yb))
    # stress 0 is achievable: all sides == graph distance 1
    for x in d:
        assert abs(x - 1.0) < 1e-6


def test_kk_deterministic_and_separates_components(spark):
    from igraph_spark.layouts import layout_kamada_kawai
    e = [(0, 1), (1, 2), (3, 4)]
    g = Graph(spark.createDataFrame(e, "src long, dst long"),
              directed=False)
    p1 = sorted(layout_kamada_kawai(g).collect())
    p2 = sorted(layout_kamada_kawai(g).collect())
    assert p1 == p2
    pos = {r["id"]: (r["x"], r["y"]) for r in p1}
    import math
    # the two components end up farther apart than any intra distance
    intra = math.hypot(pos[0][0] - pos[1][0], pos[0][1] - pos[1][1])
    inter = math.hypot(pos[0][0] - pos[3][0], pos[0][1] - pos[3][1])
    assert inter > intra


def test_kk_threshold_guard(spark):
    from igraph_spark.layouts import layout_kamada_kawai
    import pytest
    e = [(i, i + 1) for i in range(10)]
    g = Graph(spark.createDataFrame(e, "src long, dst long"),
              directed=False)
    with pytest.raises(ValueError):
        layout_kamada_kawai(g, vertex_threshold=5)


# ----------------------------------------------------------- sugiyama


def test_sugiyama_path_layers(spark):
    from igraph_spark.layouts import layout_sugiyama
    e = [(0, 1), (1, 2), (2, 3)]
    g = Graph(spark.createDataFrame(e, "src long, dst long"),
              directed=True)
    rows = {r["id"]: r for r in layout_sugiyama(g).collect()}
    assert [rows[i]["layer"] for i in range(4)] == [0, 1, 2, 3]
    assert [rows[i]["y"] for i in range(4)] == [0.0, 1.0, 2.0, 3.0]


def test_sugiyama_longest_path_and_dummies(spark):
    from igraph_spark.layouts import layout_sugiyama
    # diamond with a long edge 0->3: layer(3) must be 2 (longest path)
    e = [(0, 1), (1, 3), (0, 3), (0, 2), (2, 3)]
    g = Graph(spark.createDataFrame(e, "src long, dst long"),
              directed=True)
    rows = {r["id"]: r for r in layout_sugiyama(g).collect()}
    assert rows[0]["layer"] == 0
    assert rows[1]["layer"] == 1 and rows[2]["layer"] == 1
    assert rows[3]["layer"] == 2
    assert len(rows) == 4          # dummies not in the output


def test_sugiyama_same_layer_distinct_x(spark):
    from igraph_spark.layouts import layout_sugiyama
    e = [(0, i) for i in range(1, 6)]
    g = Graph(spark.createDataFrame(e, "src long, dst long"),
              directed=True)
    rows = layout_sugiyama(g).collect()
    xs = [r["x"] for r in rows if r["layer"] == 1]
    assert len(xs) == len(set(xs)) == 5
    # centered around the root
    assert abs(sum(xs)) < 1e-9


def test_sugiyama_cycle_breaks(spark):
    from igraph_spark.layouts import layout_sugiyama
    e = [(0, 1), (1, 2), (2, 0)]
    g = Graph(spark.createDataFrame(e, "src long, dst long"),
              directed=True)
    rows = layout_sugiyama(g).collect()
    assert len(rows) == 3
    assert len({r["layer"] for r in rows}) == 3   # a 3-chain after FAS


def test_sugiyama_explicit_layers(spark):
    from igraph_spark.layouts import layout_sugiyama
    e = [(0, 1), (1, 2)]
    g = Graph(spark.createDataFrame(e, "src long, dst long"),
              directed=True)
    lay = spark.createDataFrame([(0, 0), (1, 5), (2, 6)],
                                "id long, layer long")
    rows = {r["id"]: r for r in layout_sugiyama(g, layers=lay).collect()}
    assert rows[1]["layer"] == 5 and rows[1]["y"] == 5.0


def test_drl_deterministic_and_finite(spark):
    from igraph_spark.layouts import layout_drl
    from igraph_spark.generators import famous
    g = famous(spark, "bull")
    a = sorted(map(tuple, layout_drl(g, iterations=8, seed=3).collect()))
    b = sorted(map(tuple, layout_drl(g, iterations=8, seed=3).collect()))
    assert a == b and len(a) == 5
    assert all(math.isfinite(x) and math.isfinite(y) for _, x, y in a)


def test_gem_pulls_toward_connected(spark):
    from igraph_spark.layouts import layout_gem
    from igraph_spark.graph import Graph
    # two disjoint triangles: in-triangle distances < cross distances
    rows = [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5)]
    e = spark.createDataFrame(rows, "src long, dst long")
    g = Graph(e, spark.range(6), directed=False)
    pos = {r.id: (r.x, r.y) for r in
           layout_gem(g, iterations=25, seed=5).collect()}

    def dist(u, v):
        return math.dist(pos[u], pos[v])

    intra = (dist(0, 1) + dist(0, 2) + dist(1, 2)
             + dist(3, 4) + dist(3, 5) + dist(4, 5)) / 6
    cross = sum(dist(u, v) for u in (0, 1, 2) for v in (3, 4, 5)) / 9
    assert intra < cross


def test_davidson_harel_deterministic_spread(spark):
    from igraph_spark.layouts import layout_davidson_harel
    from igraph_spark.generators import famous
    g = famous(spark, "house")
    a = sorted(map(tuple, layout_davidson_harel(g, seed=7).collect()))
    b = sorted(map(tuple, layout_davidson_harel(g, seed=7).collect()))
    assert a == b and len(a) == 5
    # annealing with node-repulsion must not collapse vertices
    for i in range(len(a)):
        for j in range(i + 1, len(a)):
            assert math.dist(a[i][1:], a[j][1:]) > 1e-3


def test_davidson_harel_gate(spark):
    import pytest
    from igraph_spark.layouts import layout_davidson_harel
    from igraph_spark.generators import famous
    g = famous(spark, "petersen")
    with pytest.raises(ValueError, match="sequential"):
        layout_davidson_harel(g, vertex_threshold=5)


# ------------------------------------------------- grid repulsion


def test_fr_grid_degenerates_to_exact_with_huge_cells(spark):
    """cell_factor large enough that the 3x3 neighborhood covers the
    whole layout -> the grid path computes the same pair set as exact;
    coordinates must agree to float-sum tolerance."""
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    g = Graph.from_edge_list(spark, edges, n=6, directed=False)
    ex = {r.id: (r.x, r.y)
          for r in layout_fruchterman_reingold(
              g, iterations=12, repulsion="exact").collect()}
    gr = {r.id: (r.x, r.y)
          for r in layout_fruchterman_reingold(
              g, iterations=12, repulsion="grid",
              cell_factor=1e6).collect()}
    assert ex.keys() == gr.keys()
    for v in ex:
        assert math.dist(ex[v], gr[v]) < 1e-6, (v, ex[v], gr[v])


def test_fr_grid_default_cells_separates_cliques(spark):
    """The production grid (cell_factor=2, short-range repulsion only)
    still pushes disconnected cliques apart."""
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5)]
    g = Graph.from_edge_list(spark, edges, n=6, directed=False)
    pos = {r.id: (r.x, r.y)
           for r in layout_fruchterman_reingold(
               g, iterations=25, repulsion="grid").collect()}

    def dist(a, b):
        return math.dist(pos[a], pos[b])

    intra = (dist(0, 1) + dist(1, 2) + dist(0, 2)
             + dist(3, 4) + dist(4, 5) + dist(3, 5)) / 6
    inter = sum(dist(a, b) for a in (0, 1, 2) for b in (3, 4, 5)) / 9
    assert inter > 1.5 * intra, (intra, inter)


def test_drl_grid_runs_and_is_finite(spark):
    from igraph_spark.layouts import layout_drl
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    g = Graph.from_edge_list(spark, edges, n=4, directed=False)
    rows = layout_drl(g, iterations=8, repulsion="grid").collect()
    assert len(rows) == 4
    assert all(math.isfinite(r.x) and math.isfinite(r.y) for r in rows)


def test_fr_grid_scale_smoke(spark):
    """The 100x path: a 50k-vertex ring runs bounded grid rounds (the
    exact path at this size would be 2.5e9 pairs per round)."""
    g = ring(spark, 50_000)
    rows = (layout_fruchterman_reingold(g, iterations=2, repulsion="grid")
            .count())
    assert rows == 50_000


# ------------------------------------------------- 3-D layouts


def test_sphere_matches_reference_recurrence(spark):
    """Driver replication of layout.c:246-280 (Saff-Kuijlaars) vs the
    distributed window-cumsum implementation."""
    from igraph_spark.layouts import layout_sphere
    n = 10
    g = ring(spark, n)
    theta = [0.0] * n
    phi = [0.0] * n
    theta[0], phi[0] = math.pi, 0.0
    for i in range(1, n - 1):
        h = -1 + 2 * i / (n - 1)
        theta[i] = math.acos(h)
        phi[i] = math.fmod(phi[i - 1] + 3.6 / math.sqrt(n * (1 - h * h)),
                           2 * math.pi)
    theta[n - 1], phi[n - 1] = 0.0, 0.0
    want = {i: (math.cos(phi[i]) * math.sin(theta[i]),
                math.sin(phi[i]) * math.sin(theta[i]),
                math.cos(theta[i])) for i in range(n)}
    got = {r.id: (r.x, r.y, r.z) for r in layout_sphere(g).collect()}
    for i in range(n):
        assert math.dist(want[i], got[i]) < 1e-9, (i, want[i], got[i])
        assert abs(math.hypot(*got[i]) - 1.0) < 1e-9


def test_grid_3d_row_major(spark):
    from igraph_spark.layouts import layout_grid_3d
    g = {r.id: (r.x, r.y, r.z)
         for r in layout_grid_3d(ring(spark, 10)).collect()}
    # auto width = height = ceil(10^(1/3)) = 3
    assert g[0] == (0.0, 0.0, 0.0)
    assert g[2] == (2.0, 0.0, 0.0)
    assert g[3] == (0.0, 1.0, 0.0)
    assert g[9] == (0.0, 0.0, 1.0)


def test_random_3d_deterministic_in_range(spark):
    from igraph_spark.layouts import layout_random_3d
    g = ring(spark, 50)
    a = sorted((r.id, r.x, r.y, r.z) for r in layout_random_3d(g, 7).collect())
    b = sorted((r.id, r.x, r.y, r.z) for r in layout_random_3d(g, 7).collect())
    assert a == b
    assert all(-1 <= v <= 1 for _, x, y, z in a for v in (x, y, z))


def test_fr_3d_separates_cliques_and_grid_degenerates(spark):
    from igraph_spark.layouts import layout_fruchterman_reingold_3d
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5)]
    g = Graph.from_edge_list(spark, edges, n=6, directed=False)
    ex = {r.id: (r.x, r.y, r.z)
          for r in layout_fruchterman_reingold_3d(
              g, iterations=15, repulsion="exact").collect()}

    def dist(a, b):
        return math.dist(ex[a], ex[b])

    intra = (dist(0, 1) + dist(1, 2) + dist(0, 2)
             + dist(3, 4) + dist(4, 5) + dist(3, 5)) / 6
    inter = sum(dist(a, b) for a in (0, 1, 2) for b in (3, 4, 5)) / 9
    assert inter > 1.5 * intra, (intra, inter)
    gr = {r.id: (r.x, r.y, r.z)
          for r in layout_fruchterman_reingold_3d(
              g, iterations=15, repulsion="grid",
              cell_factor=1e6).collect()}
    for v in ex:
        assert math.dist(ex[v], gr[v]) < 1e-6


def test_gem_grid_runs_and_separates(spark):
    from igraph_spark.layouts import layout_gem
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5)]
    g = Graph.from_edge_list(spark, edges, n=6, directed=False)
    pos = {r.id: (r.x, r.y)
           for r in layout_gem(g, iterations=20, repulsion="grid").collect()}

    def dist(a, b):
        return math.dist(pos[a], pos[b])

    intra = (dist(0, 1) + dist(1, 2) + dist(0, 2)
             + dist(3, 4) + dist(4, 5) + dist(3, 5)) / 6
    inter = sum(dist(a, b) for a in (0, 1, 2) for b in (3, 4, 5)) / 9
    assert inter > 1.2 * intra, (intra, inter)
