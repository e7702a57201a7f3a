"""Forest fire game (reference src/forestfire.c): growth invariants,
densification with fw_prob, determinism, empty-graph edge cases."""

import pytest

from igraph_spark.algorithms.components import connected_components
from igraph_spark.generators import forest_fire_game


def test_empty_when_no_fire(spark):
    g = forest_fire_game(spark, 20, fw_prob=0.0, ambs=2, seed=1)
    assert g.ecount() == 0 and g.vcount() == 20
    g2 = forest_fire_game(spark, 20, fw_prob=0.3, ambs=0, seed=1)
    assert g2.ecount() == 0


def test_basic_growth_connected(spark):
    g = forest_fire_game(spark, 60, fw_prob=0.2, bw_factor=0.5,
                         ambs=1, seed=3)
    # every vertex t>=1 cites at least its ambassador -> >= n-1 edges,
    # and the graph is weakly connected
    assert g.ecount() >= 59
    assert g.vcount() == 60
    comp = connected_components(g, mode="weak")
    assert comp.select("component").distinct().count() == 1


def test_densification_with_fw_prob(spark):
    lo = forest_fire_game(spark, 80, fw_prob=0.1, ambs=1, seed=5).ecount()
    hi = forest_fire_game(spark, 80, fw_prob=0.45, ambs=1, seed=5).ecount()
    assert hi > lo


def test_no_self_or_forward_edges_directed(spark):
    g = forest_fire_game(spark, 50, fw_prob=0.3, ambs=2, seed=7)
    rows = g.edges.collect()
    # citations always point from the new vertex to an older one
    assert all(r.src > r.dst for r in rows)
    # burn marks prevent duplicate citations from one vertex
    assert len({(r.src, r.dst) for r in rows}) == len(rows)


def test_deterministic(spark):
    a = sorted((r.src, r.dst) for r in
               forest_fire_game(spark, 40, 0.25, 1.0, 1, seed=11)
               .edges.collect())
    b = sorted((r.src, r.dst) for r in
               forest_fire_game(spark, 40, 0.25, 1.0, 1, seed=11)
               .edges.collect())
    assert a == b and len(a) >= 39


def test_driver_gate(spark):
    with pytest.raises(ValueError, match="sequential"):
        forest_fire_game(spark, 100, 0.2, max_driver_nodes=50)
