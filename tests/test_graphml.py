"""GraphML reader/writer round trips (foreign-graphml.c analog)."""

import os

from igraph_spark.graph import Graph
from igraph_spark.generators import famous
from igraph_spark.sources.readers import read_graphml, write_graphml


def test_karate_round_trip(spark, tmp_path):
    k = famous(spark, "Zachary")
    p = os.path.join(str(tmp_path), "karate.graphml")
    write_graphml(k, None, p)
    g2, names = read_graphml(spark, p)
    assert not g2.directed
    nm = {r["id"]: int(r["name"]) for r in names.collect()}
    back = sorted(tuple(sorted((nm[r.src], nm[r.dst])))
                  for r in g2.edges.collect())
    orig = sorted(tuple(sorted((r.src, r.dst))) for r in k.edges.collect())
    assert back == orig


def test_weighted_directed_round_trip(spark, tmp_path):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 0)], n=3,
                             directed=True, weights=[1.5, 2.0, 0.25])
    p = os.path.join(str(tmp_path), "w.graphml")
    write_graphml(g, None, p)
    g2, names = read_graphml(spark, p)
    assert g2.directed
    nm = {r["id"]: int(r["name"]) for r in names.collect()}
    got = sorted((nm[r.src], nm[r.dst], r.weight)
                 for r in g2.edges.collect())
    assert got == [(0, 1, 1.5), (1, 2, 2.0), (2, 0, 0.25)]


def test_external_fixture_with_names(spark, tmp_path):
    xml = """<?xml version="1.0" encoding="UTF-8"?>
<graphml xmlns="http://graphml.graphdrawing.org/xmlns">
  <graph id="G" edgedefault="directed">
    <node id="alice"/><node id="bob"/><node id="carol"/>
    <edge source="alice" target="bob"/>
    <edge source="bob" target="carol"/>
  </graph>
</graphml>"""
    p = os.path.join(str(tmp_path), "named.graphml")
    with open(p, "w") as fh:
        fh.write(xml)
    g, names = read_graphml(spark, p)
    assert g.directed
    nm = {r["name"]: r["id"] for r in names.collect()}
    assert nm == {"alice": 0, "bob": 1, "carol": 2}  # sorted-name ranks
    assert sorted((r.src, r.dst) for r in g.edges.collect()) == \
        [(nm["alice"], nm["bob"]), (nm["bob"], nm["carol"])]
