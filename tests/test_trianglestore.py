"""BucketedEdgeStore (round 6): the triangle fold's accumulated-set
reads must be bucket-pruned (inputFiles ⊆ probed bucket dirs), the
running count must equal a from-scratch triangle_count on the union
graph after every fold, and replay/compaction must keep both."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from igraph_spark.graph import Graph
from igraph_spark.algorithms.triangles import triangle_count
from igraph_spark.streaming.trianglestore import BucketedEdgeStore


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _full_count(spark, all_pairs):
    g = Graph(_edges(spark, all_pairs), directed=False)
    return triangle_count(g)


@pytest.fixture()
def store_path():
    d = tempfile.mkdtemp(prefix="tristore_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _batches():
    # batch 1: a triangle + a path; batch 2 closes new triangles via
    # c1 (one new edge + two old), c2 (two new + one old), c3 (all
    # new); batch 3 adds a duplicate edge (no-op) + one more closure
    b1 = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5)]
    b2 = [(3, 5),              # c1: closes 3-4-5
          (0, 6), (1, 6),      # c2 via old (0,1)
          (7, 8), (8, 9), (9, 7)]  # c3
    b3 = [(0, 1),              # duplicate
          (2, 6)]              # closes 0-2-6? only if (0,6): yes c1
    return b1, b2, b3


def test_fold_matches_full_recount(spark, store_path):
    st = BucketedEdgeStore(spark, store_path, n_buckets=8)
    seen = []
    for i, b in enumerate(_batches()):
        assert st.fold_epoch(_edges(spark, b), i)
        seen += b
        assert st.triangle_count() == _full_count(spark, seen), (
            f"after batch {i}")
    # accumulated edge set round-trips exactly
    got = sorted(map(tuple, st.edges().collect()))
    want = sorted({(min(a, b), max(a, b)) for a, b in seen})
    assert got == want


def test_replayed_epoch_is_noop(spark, store_path):
    st = BucketedEdgeStore(spark, store_path, n_buckets=8)
    b1, b2, _ = _batches()
    assert st.fold_epoch(_edges(spark, b1), 0)
    c = st.triangle_count()
    assert not st.fold_epoch(_edges(spark, b1), 0)   # replay
    assert st.triangle_count() == c
    assert st.fold_epoch(_edges(spark, b2), 1)


def test_fold_reads_only_probed_buckets(spark, store_path):
    # large vertex ids spread over many buckets; the batch touches few
    st = BucketedEdgeStore(spark, store_path, n_buckets=32)
    base = [(i * 97, i * 97 + 1) for i in range(200)]
    st.fold_epoch(_edges(spark, base), 0)
    st.fold_epoch(_edges(spark, [(0, 97 * 50)]), 1)
    touched = {f.split("bucket=")[1].split("/")[0]
               for f in st._pruned_input_files}
    assert touched, "fold must have read at least one bucket"
    assert len(touched) < 32, (
        f"fold read {len(touched)} of 32 buckets — not pruned")
    assert st.triangle_count() == _full_count(
        spark, base + [(0, 97 * 50)])


def test_streaming_ingest_bucketed(spark, store_path, tmp_path):
    import os

    from igraph_spark.generators import famous
    g = famous(spark, "Zachary")
    edges = [(r["src"], r["dst"]) for r in g.edges.collect()]
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    half = len(edges) // 2
    for i, chunk in enumerate((edges[:half], edges[half:])):
        (_edges(spark, chunk).coalesce(1)
         .write.parquet(f"{feed}/b{i}"))
    stream = (spark.readStream.schema("src long, dst long")
              .option("maxFilesPerTrigger", 1)
              .parquet(f"{feed}/b*"))
    st = BucketedEdgeStore(spark, store_path, n_buckets=8)
    q = st.ingest(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(180)
    q.stop()
    assert st.triangle_count() == 45
    assert st.edges().count() == 78  # karate simple undirected edges


def test_compact_preserves_state(spark, store_path):
    st = BucketedEdgeStore(spark, store_path, n_buckets=8)
    seen = []
    for i, b in enumerate(_batches()):
        st.fold_epoch(_edges(spark, b), i)
        seen += b
    assert st.compact(max_deltas=1)
    assert st.triangle_count() == _full_count(spark, seen)
    got = sorted(map(tuple, st.edges().collect()))
    want = sorted({(min(a, b), max(a, b)) for a, b in seen})
    assert got == want
    # folds keep working after compaction
    st.fold_epoch(_edges(spark, [(5, 0), (3, 0)]), 99)
    seen += [(5, 0), (3, 0)]
    assert st.triangle_count() == _full_count(spark, seen)
