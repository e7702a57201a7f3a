"""BucketedComponentStore: batch-proportional durable folds.

The contract under test: (1) the maintained state is bit-identical to
a from-scratch WCC on the union graph after every fold; (2) a fold
READS only the affected buckets (inputFiles ⊆ affected leaf dirs) and
WRITES only them (untouched bucket files byte-identical, same path);
(3) the manifest commit survives replays and drops emptied buckets;
(4) vacuum removes exactly the superseded directories.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from igraph_spark.graph import Graph
from igraph_spark.algorithms.components import _weak_components_raw
from igraph_spark.streaming.statestore import (BucketedComponentStore,
                                               bucketed_components_ingest)


def _edges(spark, pairs):
    return spark.createDataFrame([(int(a), int(b)) for a, b in pairs],
                                 "src long, dst long")


def _full_wcc(spark, pairs):
    return {r["id"]: r["comp"] for r in
            _weak_components_raw(Graph(_edges(spark, pairs),
                                       directed=False)).collect()}


def _state_dict(store):
    return {r["id"]: r["comp"] for r in store.state().collect()}


@pytest.fixture()
def seeded(spark, tmp_path):
    """Store seeded with 4 chains of 25 vertices (0-24, 100-124, ...)."""
    base = [(s + i, s + i + 1) for s in (0, 100, 200, 300)
            for i in range(24)]
    store = BucketedComponentStore(spark, str(tmp_path / "st"),
                                   n_buckets=16)
    store.initialize(_weak_components_raw(
        Graph(_edges(spark, base), directed=False)))
    return store, base


def test_fold_matches_full_recompute(spark, seeded):
    store, base = seeded
    batches = [[(24, 100)],                  # merge two chains
               [(500, 501), (501, 502)],     # brand-new component
               [(502, 200), (300, 0)]]       # chain new into old, old-old
    acc = list(base)
    for i, b in enumerate(batches, start=1):
        stats = store.apply_batch(_edges(spark, b), epoch_id=i)
        assert stats is not False
        acc += b
        assert _state_dict(store) == _full_wcc(spark, acc), f"batch {i}"


def test_fold_reads_and_writes_only_affected_buckets(spark, seeded):
    store, base = seeded
    before = {}
    for leaf in store._current_leaves():
        for f in os.listdir(leaf):
            if f.endswith(".parquet"):
                p = os.path.join(leaf, f)
                before[p] = os.path.getmtime(p)
    pre_buckets = {int(b) for b in
                   json.load(open(store._manifest_path()))["bucket_epoch"]}

    stats = store.apply_batch(_edges(spark, [(24, 100)]), epoch_id=1)
    touched = set(stats["buckets"])
    assert 0 < len(touched) < store.n_buckets   # genuinely pruned

    # the rewrite read listed only pre-fold leaf dirs of affected
    # buckets — a strict subset of the store
    read_buckets = {int(p.split("bucket=")[1].split("/")[0])
                    for p in store._pruned_input_files}
    assert read_buckets and read_buckets <= pre_buckets
    assert len(read_buckets) < len(pre_buckets)
    # old labels 0 and 100 must be among the read buckets; nothing read
    # outside the affected set
    aff = {r[0] for r in spark.range(1).select(
        F.pmod(F.xxhash64(F.lit(0).cast("long")), F.lit(16))
        .cast("int")).collect()} | \
        {r[0] for r in spark.range(1).select(
            F.pmod(F.xxhash64(F.lit(100).cast("long")), F.lit(16))
            .cast("int")).collect()}
    assert aff <= read_buckets

    # untouched epoch-0 files byte-stable AND still the manifest's
    # current version for their buckets
    manifest = json.load(open(store._manifest_path()))
    for b, es in manifest["bucket_epoch"].items():
        if int(b) not in touched:
            assert es == [0], f"untouched bucket {b} re-pointed"
    for p, mt in before.items():
        assert os.path.getmtime(p) == mt, f"epoch-0 file rewritten: {p}"


def test_emptied_bucket_is_dropped(spark, tmp_path):
    """Merge every component into one: buckets whose labels all moved
    away must leave the manifest (their rows live in the winner's
    bucket), and the state stays exact."""
    comps = [(0, 1), (10, 11), (20, 21), (30, 31)]
    store = BucketedComponentStore(spark, str(tmp_path / "st"),
                                   n_buckets=8)
    store.initialize(_weak_components_raw(
        Graph(_edges(spark, comps), directed=False)))
    n0 = len(json.load(open(store._manifest_path()))["bucket_epoch"])
    batch = [(1, 10), (11, 20), (21, 30)]
    store.apply_batch(_edges(spark, batch), epoch_id=1)
    manifest = json.load(open(store._manifest_path()))
    assert _state_dict(store) == _full_wcc(spark, comps + batch)
    assert set(_state_dict(store).values()) == {0}
    assert len(manifest["bucket_epoch"]) <= n0


def test_replay_gate_and_noop_batch(spark, seeded):
    store, base = seeded
    assert store.apply_batch(_edges(spark, [(24, 100)]), epoch_id=1)
    snap = _state_dict(store)
    assert store.apply_batch(_edges(spark, [(24, 100)]),
                             epoch_id=1) is False   # replayed
    # already-connected edge: zero rewrites, epoch still advances
    stats = store.apply_batch(_edges(spark, [(0, 1)]), epoch_id=2)
    assert stats["n_buckets_rewritten"] == 0
    assert store.committed_epoch() == 2
    assert _state_dict(store) == snap


def test_arrival_only_fold_appends_delta_leaves(spark, seeded):
    """A batch of brand-new vertices (no relabels) must not read or
    rewrite any existing bucket: zero rewrites, delta leaves appended,
    and the next MERGE fold compacts base + deltas back to one leaf —
    state exact throughout."""
    store, base = seeded
    pre = json.load(open(store._manifest_path()))["bucket_epoch"]
    arrivals = [(1000 + i, 1001 + i) for i in range(0, 10, 2)]
    stats = store.apply_batch(_edges(spark, arrivals), epoch_id=1)
    assert stats["n_buckets_rewritten"] == 0
    assert stats["shared_delta_rows"] == 10
    assert store._pruned_input_files == []       # nothing read back
    assert _state_dict(store) == _full_wcc(spark, base + arrivals)
    m1 = json.load(open(store._manifest_path()))
    assert m1["bucket_epoch"] == pre             # buckets untouched
    assert m1["shared"] == [1]                   # one shared leaf
    assert os.path.isdir(store._shared_dir(1))

    # a second arrival batch appends another shared leaf
    arrivals2 = [(1100 + i, 1101 + i) for i in range(0, 6, 2)]
    s2 = store.apply_batch(_edges(spark, arrivals2), epoch_id=2)
    assert s2["n_buckets_rewritten"] == 0 and s2["shared_delta_rows"] == 6
    assert json.load(open(store._manifest_path()))["shared"] == [1, 2]
    assert _state_dict(store) == _full_wcc(spark, base + arrivals
                                           + arrivals2)

    # a merge that relabels stored rows consumes ALL shared leaves:
    # affected rows fold into the compacted buckets, the remainder is
    # rewritten as one fresh shared leaf — no row lost or duplicated
    merge = [(1000, 1002)]
    s3 = store.apply_batch(_edges(spark, merge), epoch_id=3)
    assert s3["n_buckets_rewritten"] > 0
    assert _state_dict(store) == _full_wcc(spark, base + arrivals
                                           + arrivals2 + merge)
    m3 = json.load(open(store._manifest_path()))
    assert m3["shared"] == ["3m"]                # the rewritten rest
    for b in s3["buckets"]:
        assert m3["bucket_epoch"][str(b)] == [3], f"bucket {b}"


def test_compact_bounds_delta_growth(spark, seeded):
    """Repeated arrival folds accumulate shared leaves; compact()
    folds them back into bucket leaves (appending, never replacing a
    base leaf) without changing the state, consuming a stream epoch
    id, or breaking vacuum — and repeated compactions collapse any
    bucket list that outgrows max_leaves."""
    store, base = seeded
    acc = list(base)
    for e in range(1, 5):                    # 4 arrival-only folds
        arr = [(10_000 * e + 2 * j, 10_000 * e + 2 * j + 1)
               for j in range(6)]
        stats = store.apply_batch(_edges(spark, arr), epoch_id=e)
        assert stats["n_buckets_rewritten"] == 0
        acc += arr
    want = _full_wcc(spark, acc)
    assert _state_dict(store) == want
    assert len(json.load(open(store._manifest_path()))["shared"]) == 4
    assert store.compact(max_shared=2) > 0
    manifest = json.load(open(store._manifest_path()))
    assert manifest["shared"] == []          # all folded in
    assert store.committed_epoch() == 4      # no stream id consumed
    assert _state_dict(store) == want        # state unchanged
    assert store.compact(max_shared=2) == 0  # idempotent
    store.vacuum()
    assert _state_dict(store) == want
    assert not any(d.startswith("shared=")   # shared dirs reclaimed
                   for d in os.listdir(store.path))
    # a bucket list grown past max_leaves collapses on the next pass
    for e in range(5, 10):
        arr = [(10_000 * e + 2 * j, 10_000 * e + 2 * j + 1)
               for j in range(4)]
        store.apply_batch(_edges(spark, arr), epoch_id=e)
        acc += arr
        store.compact(max_shared=0)          # force a fold each time
    want = _full_wcc(spark, acc)
    assert _state_dict(store) == want
    assert store.compact(max_shared=99, max_leaves=1) > 0
    manifest = json.load(open(store._manifest_path()))
    assert all(len(es) <= 2 for es in manifest["bucket_epoch"].values())
    assert _state_dict(store) == want
    # the store still folds after compaction
    store.apply_batch(_edges(spark, [(0, 100)]), epoch_id=10)
    assert _state_dict(store) == _full_wcc(spark, acc + [(0, 100)])


def test_vacuum_removes_only_superseded(spark, seeded):
    store, base = seeded
    store.apply_batch(_edges(spark, [(24, 100)]), epoch_id=1)
    want = _state_dict(store)
    removed = store.vacuum()
    assert removed > 0                     # epoch-0 copies of rewritten
    assert _state_dict(store) == want      # live data untouched
    assert store.vacuum() == 0             # idempotent


def test_streaming_ingest_bucketed(spark, tmp_path):
    import time
    src = tmp_path / "feed"
    src.mkdir()
    b0 = [(i, i + 1) for i in range(10)]
    b1 = [(10, 50), (50, 51)]
    _edges(spark, b0).write.parquet(str(src / "b0"))
    stream = (spark.readStream.schema("src long, dst long")
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src) + "/*"))
    q = bucketed_components_ingest(stream, str(tmp_path / "state"),
                                   str(tmp_path / "ckpt"), n_buckets=8)
    q.awaitTermination(120)
    _edges(spark, b1).write.parquet(str(src / "b1"))
    q2 = bucketed_components_ingest(stream, str(tmp_path / "state"),
                                    str(tmp_path / "ckpt"), n_buckets=8)
    q2.awaitTermination(120)
    time.sleep(0.2)
    store = BucketedComponentStore(spark, str(tmp_path / "state"))
    assert _state_dict(store) == _full_wcc(spark, b0 + b1)
