"""Scale-safe dense relabel (plans/ranking.py, round 6).

The round-5 relabel ranked the distinct-label table with a
no-partitionBy window (single-partition sort) and broadcast the map
unconditionally — Θ(V) components (a singleton forest, a dedup cluster
graph) funneled O(V) rows through one task.  These tests pin the new
shape: correct dense ranks, no single-partition exchange over the
label table, and broadcast-vs-shuffle switching on the mapping size.
"""

from pyspark.sql import functions as F

from igraph_spark import Graph
from igraph_spark.algorithms.components import connected_components
from igraph_spark.plans import ranking


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_dense_rank_map_matches_naive_window(spark):
    df = spark.range(500).select(
        (F.col("id") * 7 % 1000).alias("k")).distinct()
    mapping, n = ranking.dense_rank_map(df, "k", "k", "r")
    rows = sorted((r["k"], r["r"]) for r in mapping.collect())
    assert n == len(rows)
    # rank = position in ascending key order, 0-based dense
    for i, (_k, r) in enumerate(rows):
        assert r == i


def test_dense_rank_map_order_col_differs(spark):
    df = spark.createDataFrame(
        [(10, 5), (11, 1), (12, 9)], "k long, o long")
    mapping, n = ranking.dense_rank_map(df, "k", "o", "r")
    assert n == 3
    got = {r["k"]: r["r"] for r in mapping.collect()}
    assert got == {11: 0, 10: 1, 12: 2}


def test_dense_rank_map_empty(spark):
    df = spark.range(0).select(F.col("id").alias("k"))
    mapping, n = ranking.dense_rank_map(df, "k", "k", "r")
    assert n == 0 and mapping.count() == 0


def test_relabel_plan_has_no_single_partition_exchange(spark):
    # many-components regression: every vertex is its own component,
    # so #labels == V and a single-partition window would funnel all
    # of them through one task
    edges = spark.range(0).select(F.col("id").alias("src"),
                                  F.col("id").alias("dst"))
    verts = spark.range(5000).toDF("id")
    g = Graph(edges, verts, directed=False)
    cc = connected_components(g, "weak")
    assert "SinglePartition" not in _plan(cc), _plan(cc)
    # labels are the dense rank of the (singleton) component min ids
    rows = cc.orderBy("id").limit(5).collect()
    assert [(r["id"], r["component"]) for r in rows] == \
        [(i, i) for i in range(5)]
    assert cc.select("component").distinct().count() == 5000


def test_rank_join_switches_to_shuffle_above_threshold(spark):
    df = spark.range(64).select(F.col("id").alias("k"))
    mapping, n = ranking.dense_rank_map(df, "k", "k", "r")
    state = spark.range(64).select(F.col("id").alias("k"),
                                   F.col("id").alias("v"))
    small = ranking.rank_join(state, mapping, n, "k")
    assert "BroadcastHashJoin" in _plan(small)
    # simulate a mapping the size estimate forbids broadcasting: the
    # MAPPING (right side) must not be the broadcast build side — at
    # toy sizes the planner may still broadcast the tiny state side,
    # which is fine (it is the size-aware choice rank_join defers to)
    big = ranking.rank_join(state, mapping, ranking.BROADCAST_ROWS + 1,
                            "k")
    bplan = _plan(big)
    assert ("BroadcastHashJoin" not in bplan
            or "BuildLeft" in bplan), bplan
    assert sorted(map(tuple, small.select("k", "r").collect())) == \
        sorted(map(tuple, big.select("k", "r").collect()))
