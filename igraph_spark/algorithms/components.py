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

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.storagelevel import StorageLevel

from igraph_spark.graph import Graph, SRC, DST, ID
from igraph_spark.checkpointing import SuperstepRunner


def _dense_relabel(state: DataFrame, label_col: str = "comp",
                   out_col: str = "component") -> DataFrame:
    """Map raw labels (= component min id) to 0-based dense ranks in
    ascending min-id order — igraph's discovery-order labels.  The
    window runs over the *distinct label table* (size = #components),
    not over vertices, so the single-partition sort is tiny."""
    labels = state.select(label_col).distinct()
    mapping = labels.select(
        F.col(label_col),
        (F.dense_rank().over(Window.orderBy(label_col)) - 1)
        .cast("long").alias(out_col))
    return (state.join(F.broadcast(mapping), label_col)
            .select(ID, out_col))


def _weak_components_raw(graph: Graph, max_iter: int = 200,
                         checkpoint_every: int = 5) -> DataFrame:
    """Fixpoint: comp(v) = min over {comp(v)} ∪ {comp(u): u ~ v}, with a
    pointer-jumping compression step (comp(v) <- comp(comp(v))) each
    round, giving near-logarithmic convergence on high-diameter graphs
    (the scale story; plain hash-min needs O(diameter) rounds).
    Returns DataFrame(id, comp) where comp = component min id."""
    spark = graph.edges.sparkSession
    sym = (graph.sym_edges()
           .where(F.col(SRC) != F.col(DST))
           .distinct()
           .persist(StorageLevel.MEMORY_AND_DISK))

    runner = SuperstepRunner(spark, checkpoint_every=checkpoint_every)
    state0 = graph.vertices.select(ID, F.col(ID).alias("comp"))
    state, start, _ = runner.start(state0, params={"algo": "wcc"})

    for step in range(start, max_iter):
        nbrmin = (sym.join(state, sym[SRC] == state[ID])
                  .groupBy(DST).agg(F.min("comp").alias("nbr_comp")))
        new = (state.join(nbrmin, state[ID] == nbrmin[DST], "left")
               .select(state[ID],
                       F.least(F.col("comp"), F.coalesce("nbr_comp", F.col("comp")))
                       .alias("comp")))
        # pointer jumping: comp(v) <- comp(comp(v))
        m = new.select(F.col(ID).alias("mid"), F.col("comp").alias("mcomp"))
        new = (new.join(m, new["comp"] == m["mid"], "left")
               .select(new[ID], F.coalesce("mcomp", "comp").alias("comp")))
        new = new.persist()
        changed = (new.join(state.withColumnRenamed("comp", "old"), ID)
                   .where(F.col("comp") != F.col("old")).count())
        state = runner.advance(step, new, metrics={"changed": changed})
        if changed == 0:
            break
    sym.unpersist()
    return state


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
    active = graph.vertices.select(ID).persist()
    done_parts: list[DataFrame] = []

    for _outer in range(max_outer):
        # ---- trim singleton SCCs (zero in/out degree within active)
        while True:
            e_act = (edges.join(active.withColumnRenamed(ID, SRC), SRC, "left_semi")
                     .join(active.withColumnRenamed(ID, DST), DST, "left_semi"))
            e_act = e_act.persist()
            has_out = e_act.select(F.col(SRC).alias(ID)).distinct()
            has_in = e_act.select(F.col(DST).alias(ID)).distinct()
            core = active.join(has_out, ID, "left_semi") \
                         .join(has_in, ID, "left_semi").persist()
            n_core, n_active = core.count(), active.count()
            trimmed = active.join(core, ID, "left_anti")
            if n_core < n_active:
                done_parts.append(
                    trimmed.select(ID, F.col(ID).alias("comp")))
                active.unpersist()
                active = core
                e_act.unpersist()
                continue
            break
        if n_core == 0:
            break
        e_core = (e_act.join(core.withColumnRenamed(ID, SRC), SRC, "left_semi")
                  .join(core.withColumnRenamed(ID, DST), DST, "left_semi")
                  .persist(StorageLevel.MEMORY_AND_DISK))
        e_act.unpersist()

        # ---- forward max-color propagation to fixpoint
        color = core.select(ID, F.col(ID).alias("color")).persist()
        for _ in range(max_inner):
            push = (e_core.join(color, e_core[SRC] == color[ID])
                    .groupBy(DST).agg(F.max("color").alias("in_color")))
            new = (color.join(push, color[ID] == push[DST], "left")
                   .select(color[ID],
                           F.greatest(F.col("color"),
                                      F.coalesce("in_color", F.col("color")))
                           .alias("color")).persist())
            changed = (new.join(color.withColumnRenamed("color", "old"), ID)
                       .where(F.col("color") != F.col("old")).count())
            color.unpersist()
            color = new
            if changed == 0:
                break

        # ---- backward membership from roots within same color
        member = color.select(ID, "color",
                              (F.col(ID) == F.col("color")).alias("m")).persist()
        for _ in range(max_inner):
            # u joins if some out-edge (u->w) has member w of same color
            reach = (e_core
                     .join(member.select(F.col(ID).alias(DST),
                                         F.col("color").alias("wc"),
                                         F.col("m").alias("wm")), DST)
                     .where(F.col("wm"))
                     .select(F.col(SRC).alias(ID), F.col("wc"))
                     .distinct())
            new = (member.join(reach.withColumnRenamed("wc", "rc"),
                               [ID], "left")
                   .select(member[ID], "color",
                           (F.col("m") | (F.col("rc").isNotNull()
                                          & (F.col("rc") == F.col("color"))))
                           .alias("m")).persist())
            grew = (new.where("m").count() - member.where("m").count())
            member.unpersist()
            member = new
            if grew == 0:
                break

        scc = member.where("m").select(ID, "color")
        comp_min = scc.groupBy("color").agg(F.min(ID).alias("comp"))
        done_parts.append(scc.join(comp_min, "color").select(ID, "comp"))

        remaining = member.where(~F.col("m")).select(ID).persist()
        active.unpersist()
        core.unpersist()
        e_core.unpersist()
        member.unpersist()
        color.unpersist()
        active = remaining
        if active.count() == 0:
            break

    out = done_parts[0]
    for p in done_parts[1:]:
        out = out.unionByName(p)
    edges.unpersist()
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
