"""are_connected / get_eids probes (igraph_are_connected,
igraph_get_eids — type_indexededgelist.c)."""

import pytest

from igraph_spark.graph import Graph
from igraph_spark.operators.structure import (are_connected, get_eids,
                                              with_eids)


def _g(spark, directed):
    e = [(0, 1), (1, 2), (2, 0), (3, 1)]
    return Graph(spark.createDataFrame(e, "src long, dst long"),
                 directed=directed)


def test_are_connected_directed(spark):
    g = _g(spark, True)
    assert are_connected(g, 0, 1) is True
    assert are_connected(g, 1, 0) is False
    assert are_connected(g, 3, 1) is True


def test_are_connected_undirected(spark):
    g = _g(spark, False)
    assert are_connected(g, 1, 0) is True
    assert are_connected(g, 0, 3) is False


def test_with_eids_lexicographic(spark):
    g = _g(spark, True)
    rows = with_eids(g).orderBy("eid").collect()
    assert [(r["src"], r["dst"]) for r in rows] == \
        [(0, 1), (1, 2), (2, 0), (3, 1)]
    assert [r["eid"] for r in rows] == [0, 1, 2, 3]


def test_get_eids_probe(spark):
    g = _g(spark, True)
    probes = spark.createDataFrame([(1, 2), (3, 1)], "src long, dst long")
    got = {(r["src"], r["dst"]): r["eid"]
           for r in get_eids(g, probes).collect()}
    assert got == {(1, 2): 1, (3, 1): 3}


def test_get_eids_undirected_reverse_and_missing(spark):
    g = _g(spark, False)
    probes = spark.createDataFrame([(1, 0), (0, 2)], "src long, dst long")
    got = {(r["src"], r["dst"]): r["eid"]
           for r in get_eids(g, probes).collect()}
    # undirected Graph canonicalizes stored edges to (min, max), so the
    # lexicographic eids are over {(0,1),(0,2),(1,2),(1,3)}
    assert got == {(1, 0): 0, (0, 2): 1}
    bad = spark.createDataFrame([(0, 3)], "src long, dst long")
    with pytest.raises(ValueError, match="no such edge"):
        get_eids(g, bad)
    out = get_eids(g, bad, error=False).collect()
    assert out[0]["eid"] is None
