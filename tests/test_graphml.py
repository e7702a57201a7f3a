"""GraphML/GML reader/writer round trips (foreign-graphml.c,
foreign.c:1096 analogs) + NCOL first-seen-order ids (the trie
semantics, foreign.c:193)."""

import os

from igraph_spark.graph import Graph
from igraph_spark.generators import famous
from igraph_spark.sources.readers import (
    read_gml, read_graphml, read_ncol, write_gml, write_graphml)


def test_gml_karate_round_trip(spark, tmp_path):
    k = famous(spark, "Zachary")
    p = os.path.join(str(tmp_path), "k.gml")
    write_gml(k, None, p)
    g2, names = read_gml(spark, p)
    assert not g2.directed
    nm = {r["id"]: int(r["name"]) for r in names.collect()}
    back = sorted(tuple(sorted((nm[r.src], nm[r.dst])))
                  for r in g2.edges.collect())
    orig = sorted(tuple(sorted((r.src, r.dst))) for r in k.edges.collect())
    assert back == orig


def test_gml_weighted_directed_and_labels(spark, tmp_path):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2)], n=3, directed=True,
                             weights=[2.5, 0.125])
    p = os.path.join(str(tmp_path), "w.gml")
    write_gml(g, None, p)
    g2, _ = read_gml(spark, p)
    assert g2.directed
    assert sorted((r.src, r.dst, r.weight) for r in g2.edges.collect()) \
        == [(0, 1, 2.5), (1, 2, 0.125)]
    ext = os.path.join(str(tmp_path), "ext.gml")
    with open(ext, "w") as fh:
        fh.write('graph [\n directed 0\n node [ id 5 label "alpha" ]\n'
                 ' node [ id 9 label "beta" ]\n'
                 ' edge [ source 5 target 9 ]\n]\n')
    g3, n3 = read_gml(spark, ext)
    assert sorted((r.id, r.name) for r in n3.collect()) \
        == [(0, "alpha"), (1, "beta")]
    assert [(r.src, r.dst) for r in g3.edges.collect()] == [(0, 1)]


def test_ncol_first_seen_trie_order(spark, tmp_path):
    p = os.path.join(str(tmp_path), "g.ncol")
    with open(p, "w") as fh:
        fh.write("zeta alpha 1.0\nalpha beta 2.0\ngamma zeta 0.5\n")
    _, names = read_ncol(spark, p, id_order="first_seen")
    assert sorted((r.id, r.name) for r in names.collect()) == \
        [(0, "zeta"), (1, "alpha"), (2, "beta"), (3, "gamma")]


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
