"""Incremental weak-component maintenance over an edge stream.

The reference computes components from scratch per call
(igraph_clusters, /root/reference/src/components.c:75) — fine
in-memory, wrong at 10^12 edges where the graph grows by micro-batches
and a full recompute per batch would re-shuffle every edge ever seen.
This module keeps the converged ``(id, comp)`` label table as the
persistent state and folds each batch in with work proportional to the
BATCH, not the graph:

1. endpoints unseen so far enter as singleton labels (the batch ids
   broadcast into one map-side probe of the state; the anti-join for
   brand-new ids then runs batch-vs-batch);
2. each batch edge is mapped to its endpoints' CURRENT labels,
   producing a **label graph** of at most ``2·|batch|`` nodes — all
   merging (including transitive chains within the batch) is a weak-
   components run on that tiny graph, reusing the engine's own
   distributed hash-min kernel;
3. the winning label per merged group comes back to the big state as
   a broadcast hash join — two map-side passes total per batch, zero
   Exchange over the O(V) table (plan-asserted).

Invariant maintained: ``comp`` equals the minimum member id of the
component — each old label was its component's min id, and the label-
graph WCC assigns the min of those mins — so a dense relabel of the
maintained state is bit-identical to a from-scratch
``connected_components`` on the union graph (tested, and driver query
``wcc_incremental`` shares the batch oracle SQL).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from igraph_spark.graph import Graph, SRC, DST, ID
from igraph_spark.algorithms.components import (_dense_relabel,
                                                _weak_components_raw)


def components_state(graph: Graph) -> DataFrame:
    """Converged raw label table ``(id, comp)`` with comp = component
    min id — the state ``merge_components`` maintains.  (The public
    ``connected_components`` dense-ranks this; keep the raw form as
    state so labels are stable as new vertices arrive.)"""
    return _weak_components_raw(graph)


def components_from_state(state: DataFrame) -> DataFrame:
    """Dense-rank a maintained state into igraph's discovery-order
    labels — identical to ``connected_components`` on the full graph."""
    return _dense_relabel(state)


def merge_components(state: DataFrame, new_edges: DataFrame,
                     max_iter: int = 200) -> DataFrame:
    """Fold one micro-batch of edges into a converged label table.

    ``state``: DataFrame(id, comp) with comp = component min id (from
    ``components_state`` or a previous merge).  ``new_edges``: any
    DataFrame with src/dst columns; direction and weights are ignored
    (weak connectivity).  Returns the updated DataFrame(id, comp).

    Cost model (the point of the operator): the iterative part runs on
    the label graph — O(|batch|) rows regardless of |V| or |E| — and
    the big state is touched by exactly two map-side passes (a
    broadcast-inner label lookup and the broadcast-mapping update);
    no Exchange ever lands on the O(V) table (plan-asserted in
    test_incremental_plans.py), so a 1000-executor deployment pays two
    scans of its state partitions per batch instead of a full WCC over
    10^12 edges.
    """
    e = (new_edges.select(F.col(SRC).cast("long").alias(SRC),
                          F.col(DST).cast("long").alias(DST))
         .where(F.col(SRC) != F.col(DST))
         .select(F.least(SRC, DST).alias(SRC),
                 F.greatest(SRC, DST).alias(DST))
         .distinct())

    base = state.select(ID, "comp")
    ids = (e.select(F.col(SRC).alias(ID))
           .unionByName(e.select(F.col(DST).alias(ID)))
           .distinct())
    # membership probes are flipped so the O(V) state only ever
    # STREAMS map-side: a plain ids-anti-state join would sort-merge
    # (Spark cannot build a broadcast hash table from the big right
    # side of a LeftAnti), shuffling all of state per batch.  Instead
    # the batch ids broadcast into one inner join over the state scan
    # (test_incremental_plans asserts no Exchange lands above it), and
    # the anti-join for brand-new ids runs batch-vs-batch.
    hit = (base.join(F.broadcast(ids), ID)
           .localCheckpoint(eager=True))
    newv = (ids.join(F.broadcast(hit.select(ID)), ID, "left_anti")
            .select(ID, F.col(ID).alias("comp")))
    lab = hit.unionByName(newv)  # labels of every batch endpoint

    # label graph: current labels of the two endpoints of each batch
    # edge; |nodes| <= 2|batch| so the WCC below is batch-sized work
    sa = lab.select(F.col(ID).alias(SRC), F.col("comp").alias("ca"))
    sb = lab.select(F.col(ID).alias(DST), F.col("comp").alias("cb"))
    le = (e.join(F.broadcast(sa), SRC).join(F.broadcast(sb), DST)
          .where(F.col("ca") != F.col("cb"))
          .select(F.col("ca").alias(SRC), F.col("cb").alias(DST))
          .distinct())
    full = base.unionByName(newv)
    if le.isEmpty():
        return full

    m = _weak_components_raw(Graph(le, directed=False))
    mapping = (m.where(F.col(ID) != F.col("comp"))
               .select(F.col(ID).alias("old_lbl"),
                       F.col("comp").alias("new_lbl")))
    return (full.join(F.broadcast(mapping),
                      full["comp"] == mapping["old_lbl"], "left")
            .select(full[ID],
                    F.coalesce("new_lbl", full["comp"]).alias("comp")))


def merge_triangle_count(edges: DataFrame, count: int,
                         new_edges: DataFrame,
                         broadcast: bool = True) -> tuple[DataFrame, int]:
    """Fold one micro-batch into a running global triangle count.

    ``edges``: the accumulated CANONICAL simple edge set (u < v, no
    loops, distinct) — what ``canonical_edges`` returns.  ``count``:
    triangles in it.  Returns ``(edges ∪ batch, updated count)``.

    A new triangle has 1, 2 or 3 batch edges; each class is counted
    exactly once (reference decomposition, vs triangles.c recount):

    * c1 — one batch edge (u,v), third vertex w with both (u,w),(v,w)
      already accumulated: anchor at u's neighbors, close against the
      canonical set.
    * c2 — two batch edges sharing a center, closing edge accumulated:
      a batch-wedge join (p < q kills the mirror), one wedge per such
      triangle.
    * c3 — all three in the batch: the engine's own degree-ordered
      wedge join on the batch graph.

    Scale shape: the batch-derived side of every join is broadcast
    (the accumulated set is only scanned map-side, never shuffled —
    bucket it on u via the edge store to keep even the scan
    exchange-free), so a batch costs O(|E|) scan + O(|batch|·deg) join
    work instead of a full recount's shuffle.  Pass ``broadcast=False``
    for hub-heavy batches whose candidate set outgrows a broadcast
    table: the probes fall back to whatever join AQE picks.
    """
    b = _batch_minus_state(canonical_edges(new_edges), edges)
    if b.isEmpty():
        return edges, count
    return edges.unionByName(b), count + _new_triangles(edges, b, broadcast)


def _batch_minus_state(cb: DataFrame, edges: DataFrame) -> DataFrame:
    """Batch edges not yet accumulated, WITHOUT shuffling the big set:
    a direct cb-anti-edges join would sort-merge-exchange all of
    ``edges`` (no broadcast build from a big LeftAnti right side), so
    probe the other way — broadcast the batch into a semi-join that
    streams the accumulated set map-side, then anti-join batch-vs-
    batch against the (small) duplicates found."""
    return _batch_minus_state_plan(cb, edges).localCheckpoint(eager=True)


def _batch_minus_state_plan(cb: DataFrame, edges: DataFrame) -> DataFrame:
    dup = edges.join(F.broadcast(cb), ["u", "v"], "left_semi")
    return cb.join(F.broadcast(dup), ["u", "v"], "left_anti")


def _new_triangles(edges: DataFrame, b: DataFrame,
                   broadcast: bool = True) -> int:
    """Triangles gained by adding the canonical, state-disjoint batch
    ``b`` to the canonical set ``edges`` (the c1+c2+c3 decomposition
    documented on merge_triangle_count)."""
    from igraph_spark.algorithms.triangles import triangle_count as _tc

    # every membership probe below broadcasts the batch-derived side
    # and streams the accumulated set: b/cand/wedge rows are unique and
    # each matches at most one canonical edge, so an inner-join count
    # with the big side probing equals the semi-join count — without
    # the Exchange a big-right-side LeftSemi would force.
    hint = F.broadcast if broadcast else (lambda df: df)
    adj = (edges.select(F.col("u").alias("x"), F.col("v").alias("w"))
           .unionByName(
               edges.select(F.col("v").alias("x"), F.col("u").alias("w"))))
    cand = (F.broadcast(b).join(adj, b["u"] == adj["x"])
            .select("u", "v", "w").where(F.col("w") != F.col("v"))
            .localCheckpoint(eager=True))
    closing = edges.select(F.col("u").alias("cu"), F.col("v").alias("cv"))
    c1 = (closing.join(hint(cand),
                       (F.least("v", "w") == F.col("cu"))
                       & (F.greatest("v", "w") == F.col("cv")))
          .count())

    bsym = (b.select(F.col("u").alias("c"), F.col("v").alias("p"))
            .unionByName(b.select(F.col("v").alias("c"),
                                  F.col("u").alias("p"))))
    wedge = (bsym.join(bsym.withColumnRenamed("p", "q"), "c")
             .where(F.col("p") < F.col("q")))
    c2 = (closing.join(hint(wedge),
                       (F.col("p") == F.col("cu"))
                       & (F.col("q") == F.col("cv")))
          .count())

    c3 = _tc(Graph(b.select(F.col("u").alias(SRC), F.col("v").alias(DST)),
                   directed=False))
    return c1 + c2 + c3


def canonical_edges(df: DataFrame) -> DataFrame:
    """Canonical simple undirected edge set (u < v, loops dropped,
    distinct) from any src/dst DataFrame — the state representation
    ``merge_triangle_count`` accumulates."""
    e = df.select(F.least(F.col(SRC).cast("long"),
                          F.col(DST).cast("long")).alias("u"),
                  F.greatest(F.col(SRC).cast("long"),
                             F.col(DST).cast("long")).alias("v"))
    return e.where(F.col("u") != F.col("v")).distinct()


def incremental_components_ingest(edge_stream: DataFrame, state_path: str,
                                  checkpoint_path: str,
                                  num_partitions: int = 32):
    """Maintain the component state under a streaming edge feed.

    Each micro-batch is folded in with ``merge_components`` and the
    state written to ``state_path/epoch=<n>`` with a ``_LATEST``
    pointer written last (write-then-point, so a crash mid-write leaves
    the previous epoch intact; the streaming checkpoint replays the
    failed epoch into the same directory — idempotent).  Local-fs
    pointer I/O; a cluster deployment would route it through the same
    DFS as ``checkpoint_path``.  Returns the StreamingQuery; drain with
    ``trigger(availableNow=True)``.
    """

    def _latest(spark: SparkSession) -> DataFrame | None:
        ptr = os.path.join(state_path, "_LATEST")
        if not os.path.exists(ptr):
            return None
        with open(ptr) as fh:
            epoch = json.load(fh)["epoch"]
        return spark.read.parquet(os.path.join(state_path, f"epoch={epoch}"))

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        state = _latest(spark)
        if state is None:
            state = spark.createDataFrame([], "id long, comp long")
        out = merge_components(state, batch_df)
        dest = os.path.join(state_path, f"epoch={epoch_id}")
        (out.repartition(num_partitions, ID)
            .write.mode("overwrite").parquet(dest))
        tmp = os.path.join(state_path, "_LATEST.tmp")
        with open(tmp, "w") as fh:
            json.dump({"epoch": epoch_id}, fh)
        os.replace(tmp, os.path.join(state_path, "_LATEST"))

    return (edge_stream.writeStream
            .foreachBatch(write_batch)
            .option("checkpointLocation", checkpoint_path)
            .trigger(availableNow=True)
            .start())


def incremental_triangles_ingest(edge_stream: DataFrame, state_path: str,
                                 checkpoint_path: str,
                                 num_partitions: int = 32):
    """Maintain a running global triangle count under a streaming edge
    feed.  State layout: each epoch's NEW canonical edges land in
    ``state_path/delta=<n>`` (overwrite — replay-idempotent) and the
    ``_LATEST`` pointer (written last) records the committed epoch list
    plus the running count, so the accumulated edge set is the union of
    the committed deltas only; a crashed epoch's orphan delta is
    invisible until its pointer commit.  Returns the StreamingQuery."""

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        ptr_path = os.path.join(state_path, "_LATEST")
        ptr = {"epochs": [], "count": 0}
        if os.path.exists(ptr_path):
            with open(ptr_path) as fh:
                ptr = json.load(fh)
        paths = [os.path.join(state_path, f"delta={i}")
                 for i in ptr["epochs"]]
        edges = (spark.read.parquet(*paths) if paths
                 else spark.createDataFrame([], "u long, v long"))
        b = (canonical_edges(batch_df)
             .join(edges, ["u", "v"], "left_anti")
             .localCheckpoint(eager=True))
        epochs, count = list(ptr["epochs"]), int(ptr["count"])
        if not b.isEmpty():
            count += _new_triangles(edges, b)
            (b.repartition(num_partitions, "u")
             .write.mode("overwrite")
             .parquet(os.path.join(state_path, f"delta={epoch_id}")))
            epochs.append(epoch_id)
        tmp = os.path.join(state_path, "_LATEST.tmp")
        with open(tmp, "w") as fh:
            json.dump({"epochs": epochs, "count": count}, fh)
        os.replace(tmp, ptr_path)

    return (edge_stream.writeStream
            .foreachBatch(write_batch)
            .option("checkpointLocation", checkpoint_path)
            .trigger(availableNow=True)
            .start())
