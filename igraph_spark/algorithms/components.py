"""Connected components: weak (hash-min + pointer jumping) and strong
(trim + forward-coloring / backward-membership), per SURVEY.md §2.0.

Reference: igraph_clusters (/root/reference/src/components.c:75-316).

Weak-label parity is exact: igraph scans BFS seeds in ascending vertex
id (components.c:120), so a component's label equals the dense rank of
its minimum vertex id.  Our fixpoint drives every vertex's label to the
component minimum, then dense-ranks — identical labels by construction.

Strong labels in igraph follow Kosaraju reverse finish order
(components.c:254-262) — inherently sequential.  We return the same
*partition* with a canonical relabel (dense rank of each SCC's minimum
member id); tests compare partitions (SURVEY §2.0 parity strategy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from igraph_spark.graph import Graph, SRC, DST, ID
from igraph_spark.checkpointing import SuperstepRunner

# frontier size at or below which the pointer-jump map (one (mid, mc)
# row per frontier vertex, 16 B framed) is broadcast instead of
# shuffle-joined: 2**19 rows is ~8 MB — well inside guide §3.1's
# comfortable-broadcast band, and small enough that the driver
# round-trip beats two O(V) exchanges at any graph size
JUMP_BCAST_ROWS = 1 << 19


def _dense_relabel(state: DataFrame, label_col: str = "comp",
                   out_col: str = "component") -> DataFrame:
    """Map raw labels (= component min id) to 0-based dense ranks in
    ascending min-id order — igraph's discovery-order labels.

    Scale-safe (round 6): #components is Θ(V) on mostly-disconnected
    graphs, so the rank is assigned by the range-partitioned
    dense_rank_map (no single-partition window) and the join
    broadcasts only below the size threshold (plans/ranking.py)."""
    from igraph_spark.plans.ranking import dense_rank_map, rank_join
    labels = state.select(label_col).distinct()
    mapping, n = dense_rank_map(labels, label_col, label_col, out_col)
    return rank_join(state, mapping, n, label_col).select(ID, out_col)


def _weak_components_raw(graph: Graph, max_iter: int = 200,
                         checkpoint_every: int = 5,
                         jump_every: int = 3) -> DataFrame:
    """Fixpoint: comp(v) = min over {comp(v)} ∪ {comp(u): u ~ v}.

    Round-6 shape (guide §2.3/§2.4 — shuffle fewer bytes, remove
    exchanges):

    * **Frontier messaging**: only vertices whose label CHANGED last
      round rebroadcast.  Exact: labels only decrease, and a label is
      rebroadcast on every decrease, so every neighbor has already
      folded in any label that is not rebroadcast this round.  The
      O(m) join probe emits only frontier-incident edges, and the
      groupBy(dst) exchange shrinks with the frontier instead of
      carrying O(V) messages every round.
    * **State stays hash(id)-partitioned** through every messaging
      round: frontier (a filter of state) joins the src-partitioned
      sym table with zero exchange, and nbrmin (hash(dst) from its
      aggregation) joins back with zero exchange — the only per-round
      exchange is the partial-aggregated message flow.
    * **Pointer jumping** (comp(v) <- prev_comp(comp(v)), near-log
      convergence on high-diameter graphs) is frontier-adaptive:
      while the frontier is SMALL the jump map (labels owned by
      frontier vertices — exactly the labels that can compress) is
      broadcast, so compression runs EVERY round with zero exchanges
      and the hash(id) layout intact — the high-diameter (path-like)
      regime lives here and keeps its geometric convergence.  While
      the frontier is large the full jump join is keyed on the LABEL
      — two O(V) exchanges (out to hash(comp), back to hash(id)) —
      and runs only every ``jump_every`` rounds, keeping the common
      big round at one exchange.
    * One Spark job per round: the runner's lazy localCheckpoint
      (fused_eval) is materialized by the changed-count aggregate.

    Returns DataFrame(id, comp) where comp = component min id.
    """
    spark = graph.edges.sparkSession
    num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # ONE exchange for the setup: hash-partition the symmetrized view on
    # src, then dedup (src,dst) inside partitions — hash(src) already
    # clusters every duplicate, so dropDuplicates adds no exchange
    # (the old distinct-then-repartition paid two full O(2m) exchanges).
    # On a graph whose edges already carry the requested hash(src)
    # layout (Graph.hash_partition marker) the forward half needs NO
    # exchange at all — only the reversed half is shuffled, halving
    # even that one setup exchange.  min() is idempotent, so the
    # split tables not deduplicating ACROSS halves (a reciprocal
    # input pair) costs at most a duplicate message, never a wrong
    # label.  Each round then probes both cached halves and unions
    # the flows into the same partial-aggregated exchange.
    base = graph.edges.select(SRC, DST).where(F.col(SRC) != F.col(DST))
    rev = base.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
    if getattr(graph, "_src_partitions", None) == num_partitions:
        sym_parts = [
            base.dropDuplicates([SRC, DST])
                .persist(StorageLevel.MEMORY_AND_DISK),
            rev.repartition(num_partitions, SRC)
               .dropDuplicates([SRC, DST])
               .persist(StorageLevel.MEMORY_AND_DISK)]
    else:
        sym_parts = [
            (base.unionByName(rev)
             .repartition(num_partitions, SRC)
             .dropDuplicates([SRC, DST])
             .persist(StorageLevel.MEMORY_AND_DISK))]

    runner = SuperstepRunner(spark, checkpoint_every=checkpoint_every,
                             fused_eval=True)
    state0 = graph.vertices.select(ID, F.col(ID).alias("comp"),
                                   F.lit(True).alias("chg"))
    state, start, _ = runner.start(state0, params={"algo": "wcc",
                                                   "state": 2})

    changed_prev: int | None = None
    for step in range(start, max_iter):
        frontier = (state.where(F.col("chg"))
                    .select(F.col(ID).alias(SRC), F.col("comp").alias("fc")))
        # SHUFFLE_HASH hints: under autoBroadcastJoinThreshold=-1 the
        # planner can only pick sort-merge, which re-sorts the cached
        # O(m) sym table every round (guide §3.1); the hinted sides
        # build bounded per-partition hash maps instead
        flows = [p.join(frontier.hint("shuffle_hash"), SRC)
                 .select(DST, "fc") for p in sym_parts]
        msgs = flows[0] if len(flows) == 1 else \
            flows[0].unionByName(flows[1])
        nbrmin = msgs.groupBy(DST).agg(F.min("fc").alias("nbr_comp"))
        half = (state.join(nbrmin.hint("shuffle_hash"),
                           state[ID] == nbrmin[DST], "left")
                .select(state[ID], F.col("comp").alias("old"),
                        F.least(F.col("comp"),
                                F.coalesce("nbr_comp", F.col("comp")))
                        .alias("c1")))
        if changed_prev is not None and changed_prev <= JUMP_BCAST_ROWS:
            # small frontier: only labels owned by frontier vertices
            # can compress — broadcast exactly those and jump every
            # round with zero exchanges (the broadcast join preserves
            # the streamed side's hash(id) partitioning)
            m = (state.where(F.col("chg"))
                 .select(F.col(ID).alias("mid"), F.col("comp").alias("mc")))
            new = (half.join(F.broadcast(m), half["c1"] == m["mid"], "left")
                   .select(half[ID], "old",
                           F.least("c1", F.coalesce("mc", "c1"))
                           .alias("comp")))
        elif jump_every and (step - start) % jump_every == jump_every - 1:
            # large frontier: full compression through the previous
            # mapping, then restore the hash(id) layout the messaging
            # rounds rely on (the jump join is keyed on the label)
            m = state.select(F.col(ID).alias("mid"),
                             F.col("comp").alias("mc"))
            new = (half.join(m.hint("shuffle_hash"),
                             half["c1"] == m["mid"], "left")
                   .select(half[ID], "old",
                           F.least("c1", F.coalesce("mc", "c1"))
                           .alias("comp"))
                   .repartition(num_partitions, ID))
        else:
            new = half.select(ID, "old", F.col("c1").alias("comp"))
        new = new.select(ID, "comp",
                         (F.col("comp") < F.col("old")).alias("chg"))
        # advance registers a LAZY checkpoint; the changed-count
        # aggregate right after is the round's one materializing job
        state = runner.advance(step, new, metrics={})
        changed = int(state.agg(
            F.sum(F.col("chg").cast("long"))).first()[0] or 0)
        runner.update_metrics(step, {"changed": changed})
        changed_prev = changed
        if changed == 0:
            break
    for p_ in sym_parts:
        p_.unpersist()
    return state.select(ID, "comp")


def _strong_components_raw(graph: Graph, max_outer: int = 100,
                           max_inner: int = 200) -> DataFrame:
    """Trim + forward-coloring SCC (Orzan-style), deterministic.

    Per outer round: (1) trim — peel vertices with zero in- or
    out-degree inside the active subgraph (each is a singleton SCC);
    (2) propagate max vertex id forward to a fixpoint (colors);
    (3) vertices whose color equals their own id are roots; propagate
    root membership *backward* within equal-color vertices; members
    form the root's SCC and leave the active set.
    Returns DataFrame(id, comp) with comp = SCC min member id.
    """
    edges = (graph.edges.select(SRC, DST)
             .where(F.col(SRC) != F.col(DST)).distinct()
             .persist(StorageLevel.MEMORY_AND_DISK))
    active = graph.vertices.select(ID).localCheckpoint(eager=False)
    n_active = active.count()
    done_parts: list[DataFrame] = []

    for _outer in range(max_outer):
        # ---- trim singleton SCCs (zero in/out degree within active);
        # one action per pass: materialize the surviving core + count
        while n_active > 0:
            e_act = (edges
                     .join(active.withColumnRenamed(ID, SRC), SRC, "left_semi")
                     .join(active.withColumnRenamed(ID, DST), DST, "left_semi"))
            # lazy checkpoint materialized by the count: per-round
            # lineage truncation (see checkpointing.py on why rotating
            # persists recompute)
            core = (active
                    .join(e_act.select(F.col(SRC).alias(ID)).distinct(),
                          ID, "left_semi")
                    .join(e_act.select(F.col(DST).alias(ID)).distinct(),
                          ID, "left_semi")
                    .localCheckpoint(eager=False))
            n_core = core.count()
            if n_core < n_active:
                done_parts.append(active.join(core, ID, "left_anti")
                                  .select(ID, F.col(ID).alias("comp"))
                                  .localCheckpoint(eager=True))
                active, n_active = core, n_core
                continue
            break
        if n_active == 0:
            break
        e_core = (edges
                  .join(active.withColumnRenamed(ID, SRC), SRC, "left_semi")
                  .join(active.withColumnRenamed(ID, DST), DST, "left_semi")
                  .persist(StorageLevel.MEMORY_AND_DISK))

        # ---- forward max-color propagation to fixpoint
        # (one fused action per round: changed-count carried in-plan)
        color = active.select(ID, F.col(ID).alias("color")) \
            .localCheckpoint(eager=True)
        for _ in range(max_inner):
            push = (e_core.join(color, e_core[SRC] == color[ID])
                    .groupBy(DST).agg(F.max("color").alias("in_color")))
            new = (color.join(push, color[ID] == push[DST], "left")
                   .select(color[ID], F.col("color").alias("old"),
                           F.greatest(F.col("color"),
                                      F.coalesce("in_color", F.col("color")))
                           .alias("color"))
                   .localCheckpoint(eager=False))
            changed = int(new.agg(F.sum(
                (F.col("color") != F.col("old")).cast("long"))).first()[0] or 0)
            color = new
            if changed == 0:
                break

        # ---- backward membership from roots within same color
        member = color.select(ID, "color",
                              (F.col(ID) == F.col("color")).alias("m")) \
            .localCheckpoint(eager=True)
        n_mem = member.where("m").count()
        for _ in range(max_inner):
            # u joins if some out-edge (u->w) has member w of u's color;
            # dedup to (id, color) pairs and join on BOTH keys so a
            # vertex reaching members of several colors cannot fan out
            # the state row
            reach = (e_core
                     .join(member.select(F.col(ID).alias(DST),
                                         F.col("color").alias("wc"),
                                         F.col("m").alias("wm")), DST)
                     .where(F.col("wm"))
                     .select(F.col(SRC).alias(ID), F.col("wc").alias("color"))
                     .distinct()
                     .withColumn("hit", F.lit(True)))
            new = (member.join(reach, [ID, "color"], "left")
                   .select(member[ID], "color",
                           (F.col("m") | F.coalesce("hit", F.lit(False)))
                           .alias("m")).localCheckpoint(eager=False))
            n_new = int(new.agg(F.sum(F.col("m").cast("long"))).first()[0] or 0)
            member = new
            if n_new == n_mem:
                break
            n_mem = n_new

        scc = member.where("m").select(ID, "color")
        comp_min = scc.groupBy("color").agg(F.min(ID).alias("comp"))
        done_parts.append(scc.join(comp_min, "color").select(ID, "comp")
                          .localCheckpoint(eager=True))

        remaining = member.where(~F.col("m")).select(ID) \
            .localCheckpoint(eager=False)
        n_active = remaining.count()
        e_core.unpersist()
        active = remaining
        if n_active == 0:
            break

    edges.unpersist()
    if not done_parts:  # empty vertex set: no components at all
        return graph.edges.sparkSession.createDataFrame(
            [], "id long, comp long")
    out = done_parts[0]
    for p in done_parts[1:]:
        out = out.unionByName(p)
    return out


def connected_components(graph: Graph, mode: str = "weak",
                         max_iter: int = 200) -> DataFrame:
    """igraph_clusters analog -> DataFrame(id, component), 0-based dense
    labels.  Weak labels match igraph exactly (see module docstring);
    strong labels are the canonical min-id relabel of the same partition."""
    if mode == "weak":
        raw = _weak_components_raw(graph, max_iter=max_iter)
    elif mode == "strong":
        if not graph.directed:
            raw = _weak_components_raw(graph, max_iter=max_iter)
        else:
            raw = _strong_components_raw(graph)
    else:
        raise ValueError(f"bad mode {mode!r}")
    return _dense_relabel(raw)


def component_sizes(graph: Graph, mode: str = "weak") -> DataFrame:
    """csize in label order (components.c:147-149) ->
    DataFrame(component, size)."""
    return (connected_components(graph, mode)
            .groupBy("component").agg(F.count("*").alias("size"))
            .orderBy("component"))


def is_connected(graph: Graph, mode: str = "weak") -> bool:
    """igraph_is_connected (components.c:343)."""
    distinct = (connected_components(graph, mode)
                .select("component").distinct().count())
    return distinct <= 1


def decompose_membership(graph: Graph, mode: str = "weak") -> DataFrame:
    """igraph_decompose (components.c:493) expressed as membership:
    DataFrame(id, component) — callers materialize per-component
    subgraphs with ``graph.induced_subgraph`` filtered by label."""
    return connected_components(graph, mode)
