"""Biconnected components + articulation points.

Reference: igraph_articulation_points
(/root/reference/src/components.c:596) and
igraph_biconnected_components (:666), test fixture
examples/simple/igraph_biconnected_components.c/.out — sequential
Hopcroft-Tarjan DFS low-points.

Spark-native design (no DFS): fundamental-cycle union over a BFS
spanning forest.

  1. BFS forest: per weak component, root = minimum vertex id; each
     non-root vertex gets (parent, depth), parent = minimum neighbor
     one level up (deterministic at any parallelism).  A tree edge is
     identified by its child vertex — a plain long id.
  2. Every non-tree edge (u, w) closes exactly one fundamental cycle:
     the tree paths u..lca and w..lca plus (u, w).  Two tree edges are
     in the same biconnected component iff they lie on a common cycle
     (transitively).  The cycle's tree edges are discovered by climbing
     both endpoints toward the lca one level per BSP round (the deeper
     front moves; ties move both), emitting links between consecutive
     tree edges and joining the two sides where they meet.  Rounds =
     O(max BFS depth) — small for link graphs.
  3. Blocks = weak components of the link graph over tree-edge ids
     (reusing the WCC fixpoint); bridges fall out as singleton blocks.
     A non-tree edge belongs to the block of its deeper endpoint's tree
     edge (always on its cycle).
  4. Articulation point = vertex incident (as child or parent of a
     tree edge) to >= 2 distinct blocks — the block-cut-tree
     definition, equivalent to the reference's low-point test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from igraph_spark.graph import Graph, SRC, DST, ID


def _bfs_forest(graph: Graph, max_depth: int = 10000
                ) -> tuple[DataFrame, DataFrame]:
    """-> (tree(child, parent, depth), dist(id, dist)) spanning forest
    rooted at each weak component's minimum vertex id."""
    sym = (graph.sym_edges()
           .where(F.col(SRC) != F.col(DST)).distinct()
           .persist(StorageLevel.MEMORY_AND_DISK))
    from igraph_spark.algorithms.components import _weak_components_raw
    comp = _weak_components_raw(graph)
    roots = comp.where(F.col(ID) == F.col("comp")).select(ID)

    visited = roots.select(
        ID, F.lit(0).cast("long").alias("dist"),
        F.lit(None).cast("long").alias("parent")).localCheckpoint(eager=True)
    frontier = visited.select(ID)
    for depth in range(1, max_depth + 1):
        nxt = (frontier.join(sym, frontier[ID] == sym[SRC])
               .select(F.col(DST).alias(ID), F.col(SRC).alias("cand"))
               .join(visited.select(ID), ID, "left_anti")
               .groupBy(ID).agg(F.min("cand").alias("parent"))
               .withColumn("dist", F.lit(depth).cast("long"))
               .select(ID, "dist", "parent")
               .localCheckpoint(eager=True))
        if nxt.count() == 0:
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt.select(ID)
    sym.unpersist()
    tree = (visited.where(F.col("parent").isNotNull())
            .select(F.col(ID).alias("child"), "parent", F.col("dist")
                    .alias("depth")))
    return tree, visited.select(ID, "dist")


def _blocks(graph: Graph, max_rounds: int = 10000) -> tuple[DataFrame,
                                                            DataFrame]:
    """-> (tree_blocks(child, parent, block), edge_blocks(u, v, block))
    with block = min tree-edge child id in the biconnected component."""
    spark = graph.edges.sparkSession
    tree, dist = _bfs_forest(graph)
    tree = tree.persist(StorageLevel.MEMORY_AND_DISK)
    dist = dist.persist(StorageLevel.MEMORY_AND_DISK)

    simple = (graph.edges.select(F.least(SRC, DST).alias("u"),
                                 F.greatest(SRC, DST).alias("v"))
              .where(F.col("u") != F.col("v")).distinct()
              .persist(StorageLevel.MEMORY_AND_DISK))
    tree_pairs = tree.select(F.least("child", "parent").alias("u"),
                             F.greatest("child", "parent").alias("v"))
    nontree = simple.join(tree_pairs, ["u", "v"], "left_anti")

    # climb state: one row per unresolved fundamental cycle
    du = dist.select(F.col(ID).alias("u"), F.col("dist").alias("dx"))
    dw = dist.select(F.col(ID).alias("v"), F.col("dist").alias("dy"))
    state = (nontree.join(du, "u").join(dw, "v")
             .select(F.col("u").alias("x"), "dx",
                     F.lit(None).cast("long").alias("lastx"),
                     F.col("v").alias("y"), "dy",
                     F.lit(None).cast("long").alias("lasty"))
             .localCheckpoint(eager=True))
    parent = tree.select(F.col("child").alias("c"), F.col("parent").alias("p"))
    link_parts: list[DataFrame] = []
    # one Spark action per round (the emptiness probe); the state plan
    # grows one join per round and is truncated every few rounds —
    # emitted link pieces stay lazy (each is one join off a truncated
    # state), unioned and materialized once at the end
    for rnd in range(max_rounds):
        if state.isEmpty():
            break
        move_x = F.col("dx") >= F.col("dy")   # ties move both fronts
        move_y = F.col("dy") >= F.col("dx")
        stepped = (state
                   .join(parent.withColumnRenamed("c", "x")
                         .withColumnRenamed("p", "px"), "x", "left")
                   .join(parent.withColumnRenamed("c", "y")
                         .withColumnRenamed("p", "py"), "y", "left"))
        # emitted links: consecutive tree edges along each side
        links = (stepped.where(move_x & F.col("lastx").isNotNull())
                 .select(F.col("lastx").alias("a"), F.col("x").alias("b")))
        links = links.unionByName(
            stepped.where(move_y & F.col("lasty").isNotNull())
            .select(F.col("lasty").alias("a"), F.col("y").alias("b")))
        nxt = stepped.select(
            F.when(move_x, F.col("px")).otherwise(F.col("x")).alias("x"),
            F.when(move_x, F.col("dx") - 1).otherwise(F.col("dx")).alias("dx"),
            F.when(move_x, F.col("x")).otherwise(F.col("lastx")).alias("lastx"),
            F.when(move_y, F.col("py")).otherwise(F.col("y")).alias("y"),
            F.when(move_y, F.col("dy") - 1).otherwise(F.col("dy")).alias("dy"),
            F.when(move_y, F.col("y")).otherwise(F.col("lasty")).alias("lasty"),
        )
        # truncate every round: the next round's isEmpty probe then
        # reads materialized partitions instead of re-running the join
        # chain since the last periodic checkpoint (see checkpointing.py)
        nxt = nxt.localCheckpoint(eager=True)
        # fronts that met: join the two sides' last tree edges
        met = nxt.where(F.col("x") == F.col("y"))
        links = links.unionByName(
            met.where(F.col("lastx").isNotNull() & F.col("lasty").isNotNull())
            .select(F.col("lastx").alias("a"), F.col("lasty").alias("b")))
        link_parts.append(links)
        state = nxt.where(F.col("x") != F.col("y"))

    if link_parts:
        all_links = link_parts[0]
        for p in link_parts[1:]:
            all_links = all_links.unionByName(p)
        # materialize the lazy per-round pieces exactly once — the WCC
        # fixpoint below runs many actions and must not re-execute them
        all_links = all_links.localCheckpoint(eager=True)
    else:
        all_links = spark.createDataFrame([], "a long, b long")
    aux = Graph(all_links.select(F.col("a").alias(SRC),
                                 F.col("b").alias(DST)),
                tree.select(F.col("child").alias(ID)), directed=False)
    from igraph_spark.algorithms.components import _weak_components_raw
    grp = _weak_components_raw(aux).select(F.col(ID).alias("child"),
                                           F.col("comp").alias("block"))
    tree_blocks = tree.join(grp, "child").persist()

    # edge membership: tree edges by their child; non-tree edges by the
    # deeper endpoint's tree edge (always on the fundamental cycle)
    tb_edges = tree_blocks.select(
        F.least("child", "parent").alias("u"),
        F.greatest("child", "parent").alias("v"), "block")
    deeper = (nontree.join(du, "u").join(dw, "v")
              .select("u", "v",
                      F.when(F.col("dx") >= F.col("dy"), F.col("u"))
                       .otherwise(F.col("v")).alias("dc")))
    nt_edges = (deeper.join(grp.withColumnRenamed("child", "dc"), "dc")
                .select("u", "v", "block"))
    edge_blocks = tb_edges.unionByName(nt_edges)
    tree.unpersist()
    dist.unpersist()
    simple.unpersist()
    return tree_blocks, edge_blocks


def biconnected_components(graph: Graph) -> DataFrame:
    """Edge membership -> DataFrame(u, v, block): every simple
    undirected edge labeled with its biconnected component (block =
    minimum tree-edge child id; bridges are singleton blocks).
    Vertex sets per block are ``groupBy(block)`` over exploded
    endpoints (the reference's `components` output)."""
    _, edge_blocks = _blocks(graph)
    return edge_blocks


def articulation_points(graph: Graph) -> DataFrame:
    """igraph_articulation_points analog -> DataFrame(id), vertices
    whose removal disconnects their component (= incident to >= 2
    blocks in the block-cut tree)."""
    tree_blocks, _ = _blocks(graph)
    incid = (tree_blocks.select(F.col("child").alias(ID), "block")
             .unionByName(tree_blocks.select(F.col("parent").alias(ID),
                                             "block"))
             .distinct())
    return (incid.groupBy(ID).agg(F.countDistinct("block").alias("nb"))
            .where(F.col("nb") >= 2).select(ID))
