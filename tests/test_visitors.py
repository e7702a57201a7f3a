"""BFS/DFS visitor orders vs the reference fixtures
(igraph_bfs.out: path-10 ring + complete binary tree) and DFS
invariants."""

import pytest

from igraph_spark.algorithms.visitors import bfs_order, dfs_order
from igraph_spark.generators import tree
from igraph_spark.graph import Graph


def test_bfs_path10_matches_fixture(spark):
    # igraph_ring(10, UNDIRECTED, 0, /*circular=*/0) -> path graph;
    # igraph_bfs.out: vids 0..9, parents 0,0,1,...,8
    g = Graph(spark.createDataFrame([(i, i + 1) for i in range(9)],
                                    "src long, dst long"), directed=False)
    rows = bfs_order(g, 0).orderBy("order").collect()
    assert [r["id"] for r in rows] == list(range(10))
    assert rows[0]["parent"] is None
    assert [r["parent"] for r in rows[1:]] == list(range(9))
    assert [r["dist"] for r in rows] == list(range(10))


def test_bfs_binary_tree_matches_fixture(spark):
    # igraph_tree(20, 2): igraph_bfs.out vids 0..19 in order,
    # parents 0,0,1,1,2,2,...
    g = tree(spark, 20, children=2)
    rows = bfs_order(g, 0).orderBy("order").collect()
    assert [r["id"] for r in rows] == list(range(20))
    assert [r["parent"] for r in rows[1:]] == [(i - 1) // 2
                                               for i in range(1, 20)]


def test_bfs_first_discoverer_parent(spark):
    # diamond 0-1, 0-2, 1-3, 2-3: 3 discovered via 1 (min-order parent)
    e = [(0, 1), (0, 2), (1, 3), (2, 3)]
    g = Graph(spark.createDataFrame(e, "src long, dst long"),
              directed=False)
    rows = {r["id"]: r for r in bfs_order(g, 0).collect()}
    assert rows[3]["parent"] == 1 and rows[3]["dist"] == 2
    assert rows[1]["order"] < rows[2]["order"]


def test_bfs_all_components_restarts_at_min_id(spark):
    e = [(0, 1), (5, 6)]
    g = Graph(spark.createDataFrame(e, "src long, dst long"),
              directed=False)
    rows = bfs_order(g, 5, all_components=True).orderBy("order").collect()
    assert [r["id"] for r in rows] == [5, 6, 0, 1]
    assert rows[2]["parent"] is None and rows[2]["dist"] == 0


def test_dfs_preorder_postorder(spark):
    # binary tree of 7: preorder 0,1,3,4,2,5,6; postorder 3,4,1,5,6,2,0
    g = tree(spark, 7, children=2)
    rows = dfs_order(g, 0).orderBy("order").collect()
    assert [r["id"] for r in rows] == [0, 1, 3, 4, 2, 5, 6]
    out_rank = {r["id"]: r["order_out"] for r in rows}
    assert [v for v, _ in sorted(out_rank.items(),
                                 key=lambda kv: kv[1])] == \
        [3, 4, 1, 5, 6, 2, 0]
    parents = {r["id"]: r["parent"] for r in rows}
    assert parents == {0: None, 1: 0, 2: 0, 3: 1, 4: 1, 5: 2, 6: 2}


def test_dfs_directed_out_mode(spark):
    e = [(0, 1), (1, 2), (0, 2), (2, 0)]
    g = Graph(spark.createDataFrame(e, "src long, dst long"),
              directed=True)
    rows = dfs_order(g, 0, mode="out").orderBy("order").collect()
    assert [r["id"] for r in rows] == [0, 1, 2]


def test_visit_gate(spark):
    e = [(0, 1), (1, 2)]
    g = Graph(spark.createDataFrame(e, "src long, dst long"),
              directed=False)
    with pytest.raises(ValueError, match="max_driver_edges"):
        bfs_order(g, 0, max_driver_edges=1)
