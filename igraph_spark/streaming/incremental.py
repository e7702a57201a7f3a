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
                     max_iter: int = 200,
                     driver_threshold: int = 1 << 21) -> DataFrame:
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

    The label-graph merge itself is union-find on the DRIVER while the
    label graph holds ≤ ``driver_threshold`` edges (it is batch-sized
    by construction, and a distributed BSP round costs ~0.5 s of fixed
    job overhead versus microseconds of union-find — measured 6.6 s
    kernel → instant on a 500-edge label graph); batches large enough
    to break the gate fall back to the distributed hash-min kernel.
    """
    newv, mapping = _merge_delta(state, new_edges, max_iter,
                                 driver_threshold)
    full = state.select(ID, "comp").unionByName(newv)
    if mapping is None:
        return full
    return _apply_mapping(full, mapping)


def _merge_delta(state: DataFrame, new_edges: DataFrame,
                 max_iter: int = 200,
                 driver_threshold: int = 1 << 21):
    """The batch-sized delta of a component fold, WITHOUT touching the
    O(V) state beyond its one map-side probe: -> (``newv`` —
    singleton ``(id, comp)`` rows for endpoints unseen so far, and
    ``mapping`` — the ``(old_lbl, new_lbl)`` relabel table, or None
    when the batch merges nothing).  ``merge_components`` applies the
    delta to the full in-memory state; ``BucketedComponentStore``
    applies it to the affected PARTITIONS only."""
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
          .distinct()
          .localCheckpoint(eager=True))
    n_le = le.count()
    if n_le == 0:
        return newv, None

    if n_le <= driver_threshold:
        pairs = _union_find_min((r[0], r[1]) for r in le.collect())
        mapping = le.sparkSession.createDataFrame(
            [(o, c) for o, c in pairs.items() if o != c],
            "old_lbl long, new_lbl long")
    else:
        m = _weak_components_raw(Graph(le, directed=False),
                                 max_iter=max_iter)
        mapping = (m.where(F.col(ID) != F.col("comp"))
                   .select(F.col(ID).alias("old_lbl"),
                           F.col("comp").alias("new_lbl")))
    return newv, mapping


def _apply_mapping(rows: DataFrame, mapping: DataFrame) -> DataFrame:
    """Relabel ``(id, comp)`` rows by the broadcast old->new mapping."""
    return (rows.join(F.broadcast(mapping),
                      rows["comp"] == mapping["old_lbl"], "left")
            .select(rows[ID],
                    F.coalesce("new_lbl", rows["comp"]).alias("comp")))


def _union_find_min(pairs) -> dict[int, int]:
    """Union-find with min-id roots: {node -> min id of its group}.
    Keeps the state invariant (comp = component min id) because union
    always attaches the larger root under the smaller."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra == rb:
            continue
        if rb < ra:
            ra, rb = rb, ra
        parent[rb] = ra
    return {x: find(x) for x in parent}


def merge_triangle_count(edges: DataFrame, count: int,
                         new_edges: DataFrame,
                         broadcast: bool = True,
                         driver_threshold: int = 1 << 21
                         ) -> tuple[DataFrame, int]:
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
    work instead of a full recount's shuffle.  Three scans of the
    accumulated set total: the seen-before probe, the one-pass
    (exploded) adjacency that feeds the candidate wedges, and ONE
    fused closing probe serving both c1 and c2; c3 is union-find-free
    local counting on the driver while the batch graph is under
    ``driver_threshold`` edges (distributed wedge join above it).
    Pass ``broadcast=False`` for hub-heavy batches whose candidate set
    outgrows a broadcast table: the probes fall back to whatever join
    AQE picks.
    """
    b = _batch_minus_state(canonical_edges(new_edges), edges)
    if b.isEmpty():
        return edges, count
    return (edges.unionByName(b),
            count + _new_triangles(edges, b, broadcast, driver_threshold))


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
                   broadcast: bool = True,
                   driver_threshold: int = 1 << 21) -> int:
    """Triangles gained by adding the canonical, state-disjoint batch
    ``b`` to the canonical set ``edges`` (the c1+c2+c3 decomposition
    documented on merge_triangle_count)."""
    # every membership probe below broadcasts the batch-derived side
    # and streams the accumulated set: b/cand/wedge rows are unique and
    # each matches at most one canonical edge, so an inner-join count
    # with the big side probing equals the semi-join count — without
    # the Exchange a big-right-side LeftSemi would force.
    hint = F.broadcast if broadcast else (lambda df: df)
    # one scan of the accumulated set feeds both adjacency directions
    adj = (edges.select(F.explode(F.array(
               F.struct(F.col("u").alias("x"), F.col("v").alias("w")),
               F.struct(F.col("v").alias("x"), F.col("u").alias("w"))))
           .alias("s"))
           .select("s.x", "s.w"))
    cand = (F.broadcast(b).join(adj, b["u"] == adj["x"])
            .select("u", "v", "w").where(F.col("w") != F.col("v"))
            .localCheckpoint(eager=True))

    bsym = (b.select(F.col("u").alias("c"), F.col("v").alias("p"))
            .unionByName(b.select(F.col("v").alias("c"),
                                  F.col("u").alias("p"))))
    wedge = (bsym.join(bsym.withColumnRenamed("p", "q"), "c")
             .where(F.col("p") < F.col("q")))

    # c1 and c2 fused into ONE closing probe (one scan of the big set):
    # both reduce to "is (a, b) an accumulated edge" after normalizing
    # the pair; multiplicity is preserved (no distinct) because each
    # candidate row is one potential triangle
    probes = (cand.select(F.least("v", "w").alias("a"),
                          F.greatest("v", "w").alias("b"))
              .unionAll(wedge.select(F.col("p").alias("a"),
                                     F.col("q").alias("b"))))
    c12 = _closing_probe_plan(edges, probes, hint).count()

    return c12 + _batch_triangles(b, driver_threshold)


def _closing_probe_plan(edges: DataFrame, probes: DataFrame,
                        hint=F.broadcast) -> DataFrame:
    """The fused c1+c2 probe: one scan of the accumulated canonical
    set against the broadcast (a, b) candidate pairs."""
    closing = edges.select(F.col("u").alias("cu"), F.col("v").alias("cv"))
    return closing.join(hint(probes),
                        (F.col("a") == F.col("cu"))
                        & (F.col("b") == F.col("cv")))


def _batch_triangles(b: DataFrame, driver_threshold: int) -> int:
    """Triangles entirely inside the canonical batch ``b`` (c3): local
    adjacency-set intersection on the driver while the batch fits
    ``driver_threshold`` (a micro-batch always does — collecting
    O(|batch|) rows is batch-sized by definition, and the distributed
    wedge join costs seconds of fixed job overhead either way); the
    engine's degree-ordered wedge join handles oversized batches."""
    if b.count() <= driver_threshold:
        rows = b.collect()
        nbr: dict[int, set[int]] = {}
        for r in rows:
            nbr.setdefault(r[0], set()).add(r[1])
            nbr.setdefault(r[1], set()).add(r[0])
        total = 0
        for r in rows:  # u < v canonical; count w > v once per triangle
            u, v = r[0], r[1]
            total += sum(1 for w in nbr[u] & nbr[v] if w > v)
        return total
    from igraph_spark.algorithms.triangles import triangle_count as _tc
    return _tc(Graph(b.select(F.col("u").alias(SRC), F.col("v").alias(DST)),
                     directed=False))


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
    pointer written last.  The pointer IS the commit record, and the
    at-least-once replay contract hangs on it from both sides:

    * crash BEFORE the pointer flips (mid-parquet or just after):
      ``_LATEST`` still names epoch N-1, so the replayed epoch N reads
      N-1 and overwrites only the orphaned, uncommitted ``epoch=N``
      directory — never a directory its own plan is reading;
    * crash AFTER the pointer flips but before the streaming
      checkpoint records batch N (the standard foreachBatch
      redelivery window): the replayed epoch finds
      ``_LATEST.epoch >= epoch_id`` and is a NO-OP.  Without that
      gate the merge plan would lazily scan ``epoch=N`` while
      ``mode("overwrite")`` deletes it underneath — Spark's
      "cannot overwrite a path that is also being read from", wedging
      the stream on every restart (``fold_components_epoch`` is
      module-level so the replay test drives exactly this case).

    Local-fs pointer I/O; a cluster deployment would route it through
    the same DFS as ``checkpoint_path``.  Returns the StreamingQuery;
    drain with ``trigger(availableNow=True)``.
    """

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        fold_components_epoch(batch_df, epoch_id, state_path,
                              num_partitions)

    return (edge_stream.writeStream
            .foreachBatch(write_batch)
            .option("checkpointLocation", checkpoint_path)
            .trigger(availableNow=True)
            .start())


def fold_components_epoch(batch_df: DataFrame, epoch_id: int,
                          state_path: str,
                          num_partitions: int = 32) -> bool:
    """One foreachBatch body of ``incremental_components_ingest``:
    fold ``batch_df`` into the persisted state as epoch ``epoch_id``.
    Returns False (no-op) when the epoch is already committed — the
    redelivery gate documented there."""
    spark = batch_df.sparkSession
    ptr_path = os.path.join(state_path, "_LATEST")
    committed = None
    if os.path.exists(ptr_path):
        with open(ptr_path) as fh:
            committed = json.load(fh)["epoch"]
        if committed >= epoch_id:
            return False  # replayed, already-committed epoch
    if committed is None:
        state = spark.createDataFrame([], "id long, comp long")
    else:
        state = spark.read.parquet(
            os.path.join(state_path, f"epoch={committed}"))
    out = merge_components(state, batch_df)
    dest = os.path.join(state_path, f"epoch={epoch_id}")
    (out.repartition(num_partitions, ID)
        .write.mode("overwrite").parquet(dest))
    tmp = os.path.join(state_path, "_LATEST.tmp")
    with open(tmp, "w") as fh:
        json.dump({"epoch": epoch_id}, fh)
    os.replace(tmp, ptr_path)
    return True


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
        b = _batch_minus_state(canonical_edges(batch_df), edges)
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
