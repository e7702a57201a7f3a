"""Round-3 defect fixes: contract_vertices restoration, directed
mincut both-direction probing (igraph_i_mincut_directed, flow.c),
writer escaping, barabasi B-B self-attachment slot."""

from pyspark.sql import functions as F

from igraph_spark import Graph, contract_vertices, mincut
from igraph_spark.generators import barabasi


def test_contract_vertices_quotient(spark):
    # igraph_contract_vertices (structural_properties.c:6306): K4 on
    # {0,1,2,3} contracted by parity -> quotient on {0,1} with
    # multiplicities preserved (2 loops each side, 4 cross edges)
    pairs = [(a, b) for a in range(4) for b in range(4) if a < b]
    g = Graph.from_edge_list(spark, pairs, n=4, directed=False)
    m = spark.createDataFrame([(i, i % 2) for i in range(4)],
                              "id long, group long")
    q = contract_vertices(g, m)
    assert not q.directed
    assert q.vcount() == 2
    counts = {(r.src, r.dst): r.c for r in
              q.edges.groupBy("src", "dst").agg(F.count("*").alias("c"))
              .collect()}
    assert counts == {(0, 0): 1, (1, 1): 1, (0, 1): 4}


def test_contract_vertices_isolated_groups(spark):
    # groups with no internal/external edges still appear as vertices
    g = Graph.from_edge_list(spark, [(0, 1)], n=4, directed=True)
    m = spark.createDataFrame([(0, 10), (1, 10), (2, 20), (3, 30)],
                              "id long, group long")
    q = contract_vertices(g, m)
    assert q.vcount() == 3
    rows = q.edges.select("src", "dst").collect()
    assert [(r.src, r.dst) for r in rows] == [(10, 10)]


def test_mincut_directed_probes_both_directions(spark):
    # directed 2-cycle with caps 3 (0->1) and 1 (1->0): the global
    # mincut is 1 (cut the 1->0 arc); a source-side-only probe from
    # s=0 would report 3 (the round-2 defect)
    g = Graph.from_edge_list(spark, [(0, 1), (1, 0)], n=2,
                             directed=True, weights=[3.0, 1.0])
    r = mincut(g)
    assert r["value"] == 1.0


def test_write_read_escaped_names(spark, tmp_path):
    from igraph_spark.sources.readers import (
        read_gml, read_graphml, write_gml, write_graphml)
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2)], n=3, directed=False)
    names = spark.createDataFrame(
        [(0, 'a&b'), (1, 'c<d>"e"'), (2, "plain")], "id long, name string")

    p = str(tmp_path / "esc.graphml")
    write_graphml(g, names, p)
    g2, names2 = read_graphml(spark, p)
    assert sorted(r.name for r in names2.collect()) == \
        sorted(['a&b', 'c<d>"e"', "plain"])
    assert g2.ecount() == 2

    p = str(tmp_path / "esc.gml")
    write_gml(g, names, p)
    g3, names3 = read_gml(spark, p)
    assert sorted(r.name for r in names3.collect()) == \
        sorted(['a&b', 'c<d>"e"', "plain"])
    assert g3.ecount() == 2


def test_write_pajek_quote_substitution(spark, tmp_path):
    from igraph_spark.sources.readers import read_pajek, write_pajek
    g = Graph.from_edge_list(spark, [(0, 1)], n=2, directed=False)
    names = spark.createDataFrame(
        [(0, 'say "hi"'), (1, "x")], "id long, name string")
    p = str(tmp_path / "esc.net")
    write_pajek(g, names, p)
    g2, names2 = read_pajek(spark, p)
    got = {r.id: r.name for r in names2.collect()}
    assert got[0] == "say ''hi''"  # documented lossy substitution
    assert g2.ecount() == 1


def test_barabasi_self_attachment_slot(spark):
    # pmod(hash, 2t+1): degree sum invariant holds and chains resolve;
    # ecount is exact at (n-1)*m regardless of the slot-width change
    g = barabasi(spark, 60, m=2, seed=7)
    assert g.ecount() == 59 * 2
    assert g.edges.where(F.col("dst").isNull()).isEmpty()
    # every dst must be a valid vertex id
    mx = g.edges.agg(F.max("dst"), F.min("dst")).first()
    assert 0 <= mx[1] and mx[0] < 60
