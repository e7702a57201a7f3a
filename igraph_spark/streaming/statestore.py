"""Bucketed on-disk component state: batch-proportional durable folds.

``fold_components_epoch`` (incremental.py) rewrites the WHOLE ``(id,
comp)`` table per micro-batch — correct, but the durable write is
O(V) per batch no matter how small the batch (the "full-scan floor"
measured in BENCH/BASELINE.md's incremental section).  This store
makes the per-batch durable cost proportional to the AFFECTED
COMPONENTS instead:

* state lives in ``n_buckets`` hash partitions of the **label**
  (``bucket = pmod(xxhash64(comp), B)``) — a merge relabels whole
  components, so the set of rows a batch can touch is exactly the
  buckets of the labels in its (batch-sized) relabel mapping;
* a fold computes the delta with ``_merge_delta`` (one map-side probe
  of the state, like the in-memory fold), derives the affected bucket
  set FROM THE MAPPING (old labels, new labels, and the new singleton
  labels — closed under row movement, so dynamic overwrite can never
  clobber an unlisted bucket's rows), reads ONLY those partitions
  back (partition-pruned scan, asserted via ``inputFiles`` in
  tests/test_statestore.py), relabels them, and writes them to the
  new epoch's directory;
* commit is the manifest flip (``os.replace``, written LAST): a
  per-bucket leaf list ``{bucket: [epoch, ...]}`` — copy-on-write at
  bucket granularity.  A crash mid-write leaves orphan files in an
  uncommitted ``epoch=N`` directory that no manifest references, and
  a replayed epoch (``epoch_id <= committed``) is a no-op, the same
  at-least-once contract as ``fold_components_epoch``.  A bucket
  whose rows all merged away is dropped from the manifest (its stale
  directory is superseded, not read);
* arrivals-only folds (new vertices, nothing relabeled) skip the
  read-rewrite entirely: the new rows land in ONE unpartitioned
  SHARED delta leaf (``shared=<epoch>``, LSM-lite) — O(|batch|)
  durable bytes AND O(1) files, no matter how the labels hash (a
  per-bucket delta layout would write B files per arrival batch:
  pathological at B = 65536).  Every merge fold consumes ALL shared
  leaves — they are arrival-batch-sized — folding rows of affected
  buckets into the compaction output and rewriting the remainder as
  one fresh shared leaf; ``compact()`` folds them fully back into
  bucket leaves.

At 10^9 vertices and B = 4096, a 10k-edge batch touching ~10
components rewrites ~10 buckets (~250k rows each) instead of 10^9
rows — the durable write scales with what changed.  Reads for
analytics (``state()``) union the current bucket directories with
``basePath`` so the partition columns prune downstream filters too.

Manifest I/O is local-fs like the ``_LATEST`` pointers in
incremental.py; a cluster deployment routes both through the same DFS
as the streaming checkpoint.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from igraph_spark.graph import ID
from igraph_spark.streaming.incremental import _apply_mapping, _merge_delta

_MANIFEST = "_MANIFEST"


def _bucket(col, n_buckets: int):
    return F.pmod(F.xxhash64(col), F.lit(n_buckets)).cast("int")


class BucketedComponentStore:
    """Durable ``(id, comp)`` state with per-bucket copy-on-write."""

    def __init__(self, spark: SparkSession, path: str,
                 n_buckets: int = 64):
        self.spark = spark
        self.path = path
        self.n_buckets = n_buckets
        m = self._read_manifest()
        if m is not None:
            self.n_buckets = int(m["n_buckets"])

    # ------------------------------------------------------------ manifest

    def _manifest_path(self) -> str:
        return os.path.join(self.path, _MANIFEST)

    def _read_manifest(self):
        p = self._manifest_path()
        if not os.path.exists(p):
            return None
        with open(p) as fh:
            return json.load(fh)

    def _commit(self, bucket_epoch: dict, epoch: int,
                compactions: int | None = None,
                shared: list | None = None) -> None:
        """``bucket_epoch``: {bucket: [epoch, ...]} — each bucket's
        rows are the UNION of its listed epoch leaves (a compacted
        base plus any arrival deltas, oldest first)."""
        if compactions is None:
            m = self._read_manifest()
            compactions = 0 if m is None else int(m.get("compactions", 0))
        if shared is None:
            m = self._read_manifest()
            shared = [] if m is None else list(m.get("shared", []))
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"epoch": epoch, "n_buckets": self.n_buckets,
                       "compactions": compactions,
                       "shared": list(shared),
                       "bucket_epoch": {str(b): list(es) for b, es
                                        in sorted(bucket_epoch.items())}},
                      fh)
        os.replace(tmp, self._manifest_path())

    def _shared_tags(self) -> list:
        m = self._read_manifest()
        return [] if m is None else list(m.get("shared", []))

    def _shared_dir(self, tag) -> str:
        return os.path.join(self.path, f"shared={tag}")

    def _read_shared(self) -> DataFrame | None:
        """Union of the shared arrival-delta leaves, or None if none."""
        tags = self._shared_tags()
        if not tags:
            return None
        return (self.spark.read
                .parquet(*[self._shared_dir(t) for t in tags])
                .select(ID, "comp"))

    def _bucket_epochs(self) -> dict:
        """Leaf epochs per bucket; stream epochs are ints, compaction
        epochs are ``c<k>`` string tags (they never collide with the
        stream's monotonically increasing ids or its replay gate)."""
        m = self._read_manifest()
        if m is None:
            raise ValueError(f"no committed state at {self.path}")
        return {int(b): [e if isinstance(e, str) else int(e) for e in es]
                for b, es in m["bucket_epoch"].items()}

    def committed_epoch(self):
        m = self._read_manifest()
        return None if m is None else int(m["epoch"])

    # ------------------------------------------------------------- layout

    def _leaf(self, epoch: int, bucket: int) -> str:
        return os.path.join(self.path, f"epoch={epoch}", f"bucket={bucket}")

    def _current_leaves(self, buckets=None) -> list[str]:
        be = self._bucket_epochs()
        if buckets is not None:
            be = {b: es for b, es in be.items() if b in buckets}
        return [self._leaf(e, b) for b, es in sorted(be.items())
                for e in es]

    def _read(self, buckets=None) -> DataFrame:
        leaves = self._current_leaves(buckets)
        if not leaves:
            return self.spark.createDataFrame([], "id long, comp long")
        return (self.spark.read.option("basePath", self.path)
                .parquet(*leaves).select(ID, "comp"))

    def state(self) -> DataFrame:
        """The committed ``(id, comp)`` table (all current bucket
        leaves plus any shared arrival-delta leaves)."""
        base = self._read()
        sh = self._read_shared()
        return base if sh is None else base.unionByName(sh)

    # -------------------------------------------------------------- writes

    def _write_epoch(self, rows: DataFrame, epoch) -> list[int]:
        """Write ``rows`` to ``epoch=<epoch>`` (stream int or ``c<k>``
        compaction tag) partitioned by the label bucket; -> the bucket
        ids that actually materialized."""
        out = rows.withColumn("bucket", _bucket(F.col("comp"),
                                                self.n_buckets))
        dest = os.path.join(self.path, f"epoch={epoch}")
        (out.repartition("bucket")
            .write.mode("overwrite").partitionBy("bucket").parquet(dest))
        return [int(d.split("=", 1)[1]) for d in os.listdir(dest)
                if d.startswith("bucket=")]

    def initialize(self, state: DataFrame, epoch: int = 0) -> None:
        """Seed the store from a converged label table (full write —
        the one O(V) durable pass; every later fold is bucket-pruned)."""
        got = self._write_epoch(state.select(ID, "comp"), epoch)
        self._commit({b: [epoch] for b in got}, epoch)

    def apply_batch(self, new_edges: DataFrame, epoch_id: int,
                    max_iter: int = 200,
                    driver_threshold: int = 1 << 21) -> dict | bool:
        """Fold one micro-batch; -> stats dict, or False for a
        replayed (already-committed) epoch."""
        committed = self.committed_epoch()
        if committed is None:
            raise ValueError("initialize() the store before folding")
        if epoch_id <= committed:
            return False
        newv_raw, mapping = _merge_delta(self.state(), new_edges,
                                         max_iter, driver_threshold)
        newv_raw = newv_raw.localCheckpoint(eager=True)
        newv = (_apply_mapping(newv_raw, mapping) if mapping is not None
                else newv_raw).localCheckpoint(eager=True)
        bucket_epoch = self._bucket_epochs()

        # mapping entries whose old_lbl is a brand-new singleton id
        # relabel only rows of THIS batch (already applied to newv
        # above) — no stored row carries such a label.  Only the rest
        # ("stored" relabels) force a read-rewrite.
        stored = None
        if mapping is not None:
            stored = mapping.join(
                F.broadcast(newv_raw.select(
                    F.col(ID).alias("old_lbl"))), "old_lbl", "left_anti"
                ).localCheckpoint(eager=True)

        if stored is None or stored.isEmpty():
            # arrivals-only fold (incl. new-new merges): no stored row
            # relabels, so nothing is read or rewritten — the new rows
            # land in ONE unpartitioned SHARED delta leaf (LSM-lite):
            # O(|batch|) durable bytes and O(1) files, however the
            # labels hash.
            n_new = newv.count()
            shared = self._shared_tags()
            if n_new:
                (newv.select(ID, "comp").coalesce(1)
                 .write.mode("overwrite")
                 .parquet(self._shared_dir(epoch_id)))
                shared = shared + [epoch_id]
            self._pruned_input_files = []
            self._commit(bucket_epoch, epoch_id, shared=shared)
            return {"n_buckets_rewritten": 0, "buckets": [],
                    "shared_delta_rows": n_new,
                    "n_new_vertices": n_new}

        # merge fold: affected buckets, closed under row movement —
        # every bucket a STORED row can leave (old labels present in
        # state) or enter (their new labels, plus the new rows' final
        # labels) is COMPACTED this epoch: all its leaves read back
        # pruned, relabeled, rewritten as one leaf.  The shared
        # arrival leaves (each batch-sized) are consumed whole: their
        # affected rows fold into the compaction output, the rest are
        # rewritten as one fresh shared leaf.
        aff_lbl = (newv.select(F.col("comp").alias("l"))
                   .unionByName(stored.select(F.col("old_lbl").alias("l")))
                   .unionByName(stored.select(F.col("new_lbl").alias("l"))))
        affected = sorted(
            r[0] for r in aff_lbl.select(
                _bucket(F.col("l"), self.n_buckets).alias("b"))
            .distinct().collect())

        cur = self._read(buckets=set(affected))   # partition-pruned
        self._pruned_input_files = cur.inputFiles()   # test hook
        rows = _apply_mapping(cur, mapping).unionByName(
            newv.select(ID, "comp"))

        shared = []
        sh = self._read_shared()
        if sh is not None:
            shb = (_apply_mapping(sh, mapping)
                   .withColumn("b", _bucket(F.col("comp"),
                                            self.n_buckets))
                   .localCheckpoint(eager=True))
            rows = rows.unionByName(
                shb.where(F.col("b").isin(affected)).select(ID, "comp"))
            sh_out = (shb.where(~F.col("b").isin(affected))
                      .select(ID, "comp"))
            if not sh_out.isEmpty():
                tag = f"{epoch_id}m"
                (sh_out.coalesce(1).write.mode("overwrite")
                 .parquet(self._shared_dir(tag)))
                shared = [tag]

        got = set(self._write_epoch(rows, epoch_id))
        # closure invariant: every materialized bucket was declared
        # affected (its rows' labels all came from aff_lbl or were
        # filtered to affected buckets), so no unread bucket can be
        # silently superseded
        stray = got - set(affected)
        assert not stray, f"rows landed in undeclared buckets {stray}"
        for b in affected:
            if b in got:
                bucket_epoch[b] = [epoch_id]   # compacted
            else:                 # every row merged away: drop bucket
                bucket_epoch.pop(b, None)
        self._commit(bucket_epoch, epoch_id, shared=shared)
        return {"n_buckets_rewritten": len(got),
                "buckets": sorted(got),
                "shared_delta_rows": 0,
                "n_new_vertices": newv.count()}

    def compact(self, max_shared: int = 8, max_leaves: int = 4) -> int:
        """Maintenance pass, two jobs in one tagged write: (a) fold
        the shared arrival-delta leaves back into bucket leaves once
        more than ``max_shared`` have accumulated, and (b) collapse
        any bucket whose leaf list outgrew ``max_leaves`` (appending
        compactions would otherwise regrow lists one leaf per pass) —
        bounding LSM-lite growth between merge folds, which consume
        both anyway.  Compaction leaves carry a ``c<k>`` epoch tag so
        they never consume (or collide with) a stream epoch id and
        the replay gate is untouched.  -> shared leaves folded +
        buckets collapsed."""
        m = self._read_manifest()
        if m is None:
            return 0
        tags = self._shared_tags()
        be = self._bucket_epochs()
        fold_shared = len(tags) > max_shared
        over = {b for b, es in be.items() if len(es) > max_leaves}
        if not fold_shared and not over:
            return 0
        rows = None
        if over:
            rows = self._read(buckets=over)
        if fold_shared:
            sh = self._read_shared()
            rows = sh if rows is None else rows.unionByName(sh)
        k = int(m.get("compactions", 0)) + 1
        tag = f"c{k}"
        got = set(self._write_epoch(rows, tag))
        for b in got:
            if b in over:
                be[b] = [tag]                 # collapsed
            else:
                # shared rows are ADDITIONAL rows for their buckets —
                # append the compaction leaf, never replace the base
                be.setdefault(b, []).append(tag)
        for b in over - got:                  # read but nothing left
            be.pop(b, None)
        self._commit(be, int(m["epoch"]), compactions=k,
                     shared=self._shared_tags() if not fold_shared
                     else [])
        return (len(tags) if fold_shared else 0) + len(over)

    def vacuum(self) -> int:
        """Delete superseded epoch/bucket directories (anything the
        manifest no longer references); -> number removed."""
        m = self._read_manifest()
        if m is None:
            return 0
        live = {(str(e), b) for b, es in self._bucket_epochs().items()
                for e in es}
        removed = 0
        for ed in os.listdir(self.path):
            if not ed.startswith("epoch="):
                continue
            e = ed.split("=", 1)[1]
            edir = os.path.join(self.path, ed)
            for bd in os.listdir(edir):
                if bd.startswith("bucket=") and \
                        (e, int(bd.split("=", 1)[1])) not in live:
                    shutil.rmtree(os.path.join(edir, bd))
                    removed += 1
            if not any(d.startswith("bucket=") for d in os.listdir(edir)):
                shutil.rmtree(edir)
        live_shared = {str(t) for t in self._shared_tags()}
        for sd in os.listdir(self.path):
            if sd.startswith("shared=") and \
                    sd.split("=", 1)[1] not in live_shared:
                shutil.rmtree(os.path.join(self.path, sd))
                removed += 1
        return removed


def bucketed_components_ingest(edge_stream: DataFrame, state_path: str,
                               checkpoint_path: str,
                               n_buckets: int = 64):
    """Streaming twin of ``incremental_components_ingest`` over the
    bucketed store: same foreachBatch + replay-gate contract, but each
    epoch's durable write touches only the affected buckets.  An empty
    store is seeded by the first batch."""

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        store = BucketedComponentStore(spark, state_path, n_buckets)
        if store.committed_epoch() is None:
            from igraph_spark.streaming.incremental import merge_components
            empty = spark.createDataFrame([], "id long, comp long")
            store.initialize(merge_components(empty, batch_df),
                             epoch=epoch_id)
        else:
            store.apply_batch(batch_df, epoch_id)

    return (edge_stream.writeStream
            .foreachBatch(write_batch)
            .option("checkpointLocation", checkpoint_path)
            .trigger(availableNow=True)
            .start())
