"""Edge betweenness + Girvan-Newman (community.c:373,
centrality.c:2065) — hand goldens and community recovery."""

from pyspark.sql import functions as F

from igraph_spark.graph import Graph
from igraph_spark.algorithms.betweenness import (
    edge_betweenness, girvan_newman)
from igraph_spark.algorithms.community_metrics import compare_communities


def test_path_graph_edge_betweenness_golden(spark):
    # path 0-1-2-3: pair dependencies through each edge
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 3)], n=4,
                             directed=False)
    got = {(r.src, r.dst): r.betweenness
           for r in edge_betweenness(g).collect()}
    assert got == {(0, 1): 3.0, (1, 2): 4.0, (2, 3): 3.0}


def test_directed_cycle_uniform(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 0)], n=3,
                             directed=True)
    vals = [r.betweenness for r in edge_betweenness(g).collect()]
    assert len(vals) == 3 and all(v == vals[0] for v in vals)


def test_girvan_newman_splits_barbell(spark):
    edges = [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3)]
    g = Graph.from_edge_list(spark, edges, n=6, directed=False)
    mem = {r.id: r.label for r in girvan_newman(g, 2).collect()}
    assert mem[0] == mem[1] == mem[2]
    assert mem[3] == mem[4] == mem[5]
    assert mem[0] != mem[3]


def test_girvan_newman_recovers_planted_blocks(spark):
    from igraph_spark.generators import sbm
    g = sbm(spark, n=24, blocks=2, p_in=0.7, p_out=0.03, seed=5)
    mem = girvan_newman(g, 2)
    truth = g.vertices.select("id", (F.col("id") % 2).alias("label"))
    nmi = compare_communities(mem, truth, "nmi")
    assert nmi >= 0.8, nmi
