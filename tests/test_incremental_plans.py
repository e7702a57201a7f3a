"""Physical-plan audits for the incremental operators: the O(V)/O(E)
state must only ever stream map-side — every membership probe against
it broadcasts the batch-derived side, so no SortMergeJoin (and hence
no Exchange over the big table) appears anywhere in the merge plans."""

from pyspark.sql import functions as F

from igraph_spark.generators import gnm
from igraph_spark.streaming.incremental import (
    _batch_minus_state_plan, _closing_probe_plan, canonical_edges,
    components_state, merge_components)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_merge_components_is_broadcast_only(spark):
    g = gnm(spark, n=500, m=1500, seed=11, directed=True)
    state = components_state(g).localCheckpoint(eager=True)
    batch = spark.createDataFrame(
        [(1, 2), (3, 9999), (7000, 7001)], "src long, dst long")
    plan = _plan(merge_components(state, batch))
    assert "BroadcastHashJoin" in plan, plan
    # a SortMergeJoin here would mean the O(V) state was exchanged to
    # satisfy a batch-sized probe (the LeftAnti-on-big-right trap)
    assert "SortMergeJoin" not in plan, plan


def test_batch_minus_state_streams_the_big_side(spark):
    g = gnm(spark, n=500, m=1500, seed=11, directed=False)
    edges = canonical_edges(g.edges).localCheckpoint(eager=True)
    cb = canonical_edges(spark.createDataFrame(
        [(1, 2), (400, 401)], "src long, dst long"))
    plan = _plan(_batch_minus_state_plan(cb, edges))
    assert "BroadcastHashJoin" in plan and "LeftSemi, BuildRight" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_closing_probe_broadcasts_the_candidates(spark):
    # the REAL fused c1+c2 probe: accumulated canonical set scans once
    # against broadcast normalized pairs — no big-right-side LeftSemi
    g = gnm(spark, n=500, m=1500, seed=11, directed=False)
    edges = canonical_edges(g.edges).localCheckpoint(eager=True)
    probes = spark.createDataFrame([(0, 1), (3, 4)], "a long, b long")
    plan = _plan(_closing_probe_plan(edges, probes))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
