"""Incremental triangle counting: merge == batch recount per batch."""

import json
import os

from igraph_spark.graph import Graph
from igraph_spark.generators import famous
from igraph_spark.algorithms.triangles import triangle_count
from igraph_spark.streaming.incremental import (
    canonical_edges, incremental_triangles_ingest, merge_triangle_count)

from tests.oracle import triangle_oracle


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long") if pairs \
        else spark.createDataFrame([], "src long, dst long")


def _empty_state(spark):
    return spark.createDataFrame([], "u long, v long")


def test_single_new_edge_closes_old_wedge(spark):
    e0 = canonical_edges(_df(spark, [(0, 1), (1, 2)]))
    e1, c = merge_triangle_count(e0, 0, _df(spark, [(2, 0)]))
    assert c == 1 and e1.count() == 3


def test_two_new_edges_share_center(spark):
    e0 = canonical_edges(_df(spark, [(0, 1)]))
    _, c = merge_triangle_count(e0, 0, _df(spark, [(1, 2), (2, 0)]))
    assert c == 1


def test_batch_only_triangle(spark):
    _, c = merge_triangle_count(_empty_state(spark), 0,
                                _df(spark, [(0, 1), (1, 2), (2, 0)]))
    assert c == 1


def test_mixed_batch_all_three_classes(spark):
    # accumulated: wedge 0-1-2 and edge 5-6.
    # batch: (0,2)  -> c1 (closes the old wedge)
    #        (5,7),(6,7) -> c2 (two new edges over old (5,6))
    #        (8,9),(9,10),(8,10) -> c3 (entirely new)
    # plus a duplicate of an old edge and a loop, both no-ops
    e0 = canonical_edges(_df(spark, [(0, 1), (1, 2), (5, 6)]))
    _, c = merge_triangle_count(
        e0, 0, _df(spark, [(0, 2), (5, 7), (6, 7),
                           (8, 9), (9, 10), (8, 10), (1, 0), (4, 4)]))
    assert c == 3


def test_duplicate_and_empty_batches_are_noops(spark):
    e0 = canonical_edges(_df(spark, [(0, 1), (1, 2), (2, 0)]))
    e1, c = merge_triangle_count(e0, 1, _df(spark, [(0, 1), (2, 1)]))
    assert c == 1 and e1.count() == 3
    e2, c2 = merge_triangle_count(e1, c, _df(spark, []))
    assert c2 == 1 and e2.count() == 3


def test_karate_in_three_batches_tracks_batch_recount(spark):
    g = famous(spark, "Zachary")
    edges = [(r["src"], r["dst"]) for r in g.edges.collect()]
    k = len(edges) // 3
    batches = [edges[:k], edges[k:2 * k], edges[2 * k:]]
    state, count = _empty_state(spark), 0
    seen = []
    for b in batches:
        seen += b
        state, count = merge_triangle_count(state, count, _df(spark, b))
        assert count == triangle_oracle(seen)[0]
        assert count == triangle_count(
            Graph(_df(spark, seen), directed=False))
    assert count == 45


def test_streaming_triangle_ingest(spark, tmp_path):
    g = famous(spark, "Zachary")
    edges = [(r["src"], r["dst"]) for r in g.edges.collect()]
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    half = len(edges) // 2
    for i, chunk in enumerate((edges[:half], edges[half:])):
        _df(spark, chunk).coalesce(1).write.parquet(f"{feed}/b{i}")
    stream = (spark.readStream.schema("src long, dst long")
              .option("maxFilesPerTrigger", 1)
              .parquet(f"{feed}/b*"))
    state_path = str(tmp_path / "tstate")
    q = incremental_triangles_ingest(
        stream, state_path, str(tmp_path / "ckpt"), num_partitions=2)
    q.awaitTermination(180)
    q.stop()
    with open(os.path.join(state_path, "_LATEST")) as fh:
        ptr = json.load(fh)
    assert ptr["count"] == 45
    acc = spark.read.parquet(
        *[os.path.join(state_path, f"delta={i}") for i in ptr["epochs"]])
    assert acc.count() == 78  # karate's simple undirected edge count


def test_driver_and_distributed_c3_agree(spark):
    # local adjacency-intersection c3 vs the distributed wedge join
    g = famous(spark, "Zachary")
    half = [(r["src"], r["dst"]) for r in g.edges.collect()][:39]
    e0 = canonical_edges(_df(spark, half[:20]))
    batch = _df(spark, half[20:])
    _, c_driver = merge_triangle_count(e0, 0, batch)        # default gate
    _, c_kernel = merge_triangle_count(e0, 0, batch, driver_threshold=0)
    assert c_driver == c_kernel
