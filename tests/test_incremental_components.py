"""Incremental WCC maintenance: merge_components == batch recompute."""

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from igraph_spark.graph import Graph
from igraph_spark.generators import famous
from igraph_spark.algorithms.components import connected_components
from igraph_spark.streaming.incremental import (
    components_from_state, components_state, incremental_components_ingest,
    merge_components)

from tests.oracle import components_oracle

KARATE_SPLITS = 3


def _dense(state):
    return {r["id"]: r["component"]
            for r in components_from_state(state).collect()}


def _batch_labels(spark, edges, n):
    g = Graph.from_edge_list(spark, edges, n=n, directed=False)
    return {r["id"]: r["component"]
            for r in connected_components(g, "weak").collect()}


def test_merge_matches_batch_on_karate(spark):
    g = famous(spark, "Zachary")
    edges = [(r["src"], r["dst"]) for r in g.edges.collect()]
    n = g.vcount()
    # seed state from the first third, fold the rest in two batches
    k = len(edges) // KARATE_SPLITS
    state = components_state(
        Graph.from_edge_list(spark, edges[:k], n=n, directed=False))
    state = merge_components(state, spark.createDataFrame(
        edges[k:2 * k], "src long, dst long"))
    state = merge_components(state, spark.createDataFrame(
        edges[2 * k:], "src long, dst long"))
    assert _dense(state) == _batch_labels(spark, edges, n)


def test_merge_handles_new_vertices_and_chains(spark):
    # state knows components {0,1} and {2,3}; one batch both bridges
    # them AND attaches brand-new vertices transitively: 1-2 merges the
    # two, 3-7 and 7-8 pull unseen 7,8 into the same component, 9-10 is
    # a new isolated pair
    state = components_state(
        Graph.from_edge_list(spark, [(0, 1), (2, 3)], directed=False))
    batch = spark.createDataFrame(
        [(1, 2), (3, 7), (7, 8), (9, 10)], "src long, dst long")
    got = {r["id"]: r["comp"] for r in merge_components(state, batch).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 7: 0, 8: 0, 9: 9, 10: 9}


def test_merge_noop_batch_preserves_state(spark):
    state = components_state(
        Graph.from_edge_list(spark, [(0, 1), (1, 2)], directed=False))
    # intra-component edges and loops must not change labels
    batch = spark.createDataFrame([(0, 2), (1, 1)], "src long, dst long")
    got = {r["id"]: r["comp"] for r in merge_components(state, batch).collect()}
    assert got == {0: 0, 1: 0, 2: 0}


def test_merge_empty_state_bootstrap(spark):
    empty = spark.createDataFrame([], "id long, comp long")
    batch = spark.createDataFrame([(5, 6), (6, 7)], "src long, dst long")
    got = {r["id"]: r["comp"] for r in merge_components(empty, batch).collect()}
    assert got == {5: 5, 6: 5, 7: 5}


def test_streaming_ingest_maintains_state(spark, tmp_path):
    g = famous(spark, "Zachary")
    edges = [(r["src"], r["dst"]) for r in g.edges.collect()]
    n = g.vcount()
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    # two parquet files -> the file source delivers them as batches
    half = len(edges) // 2
    for i, chunk in enumerate((edges[:half], edges[half:])):
        (spark.createDataFrame(chunk, "src long, dst long")
         .coalesce(1).write.parquet(f"{feed}/b{i}"))
    stream = (spark.readStream.schema("src long, dst long")
              .option("maxFilesPerTrigger", 1)
              .parquet(f"{feed}/b*"))
    state_path = str(tmp_path / "state")
    q = incremental_components_ingest(
        stream, state_path, str(tmp_path / "ckpt"), num_partitions=2)
    q.awaitTermination(180)
    q.stop()
    with open(os.path.join(state_path, "_LATEST")) as fh:
        epoch = json.load(fh)["epoch"]
    final = spark.read.parquet(os.path.join(state_path, f"epoch={epoch}"))
    want = _batch_labels(spark, edges, n)
    # ids never seen by the feed (isolated in the split) are absent from
    # the maintained state; karate has none isolated, so exact match
    assert _dense(final) == want
    # the oracle agrees too (independent union-find)
    labels = components_oracle(n, edges)
    dense = _dense(final)
    assert [dense[i] for i in range(n)] == labels


def test_driver_and_distributed_label_merges_agree(spark):
    # the driver union-find gate and the distributed hash-min kernel
    # must produce the identical state (comp = component min id)
    g = famous(spark, "Zachary")
    edges = [(r["src"], r["dst"]) for r in g.edges.collect()]
    n = g.vcount()
    k = len(edges) // 2
    seed = components_state(
        Graph.from_edge_list(spark, edges[:k], n=n, directed=False))
    seed = seed.localCheckpoint(eager=True)
    batch = spark.createDataFrame(edges[k:], "src long, dst long")
    via_driver = merge_components(seed, batch)              # default gate
    via_kernel = merge_components(seed, batch, driver_threshold=0)
    assert (via_driver.exceptAll(via_kernel).count() == 0
            and via_kernel.exceptAll(via_driver).count() == 0)


def test_replayed_epoch_is_noop(spark, tmp_path):
    """foreachBatch at-least-once redelivery: a crash after the
    _LATEST pointer flips but before the streaming checkpoint records
    the batch redelivers the SAME epoch_id.  The fold must detect the
    committed epoch and no-op — the old code re-read epoch=N and
    overwrote the same directory its merge plan was lazily scanning,
    wedging the stream on every restart."""
    from igraph_spark.streaming.incremental import fold_components_epoch
    state_path = str(tmp_path / "state")
    os.makedirs(state_path)
    b0 = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    b1 = spark.createDataFrame([(2, 3), (5, 6)], "src long, dst long")
    assert fold_components_epoch(b0, 0, state_path, num_partitions=2)
    assert fold_components_epoch(b1, 1, state_path, num_partitions=2)
    before = _dense(spark.read.parquet(f"{state_path}/epoch=1"))
    # redeliver epoch 1 (and an older epoch 0, the stale-replay shape)
    assert fold_components_epoch(b1, 1, state_path,
                                 num_partitions=2) is False
    assert fold_components_epoch(b0, 0, state_path,
                                 num_partitions=2) is False
    with open(os.path.join(state_path, "_LATEST")) as fh:
        assert json.load(fh)["epoch"] == 1
    after = _dense(spark.read.parquet(f"{state_path}/epoch=1"))
    assert after == before == {0: 0, 1: 0, 2: 0, 3: 0, 5: 1, 6: 1}
