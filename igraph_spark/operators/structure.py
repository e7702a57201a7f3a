"""Structural scalar measures and predicates (SURVEY.md §2.3, §2.5).

Each maps an igraph routine (file:line cited per function) onto a
short declarative DataFrame program — Catalyst handles pushdown,
broadcast selection and partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from igraph_spark.graph import Graph, SRC, DST, WEIGHT, ID


def density(graph: Graph, loops: bool = False) -> float:
    """igraph_density (/root/reference/src/structural_properties.c:2845):
    m / possible-edges.  Multi-edges make the result meaningless, as in
    the reference (documented there)."""
    n = graph.vcount()
    m = graph.ecount()
    if n == 0:
        return float("nan")
    if loops:
        possible = n * n if graph.directed else n * (n + 1) / 2
    else:
        possible = n * (n - 1) if graph.directed else n * (n - 1) / 2
    return float("nan") if possible == 0 else m / float(possible)


def reciprocity(graph: Graph, ignore_loops: bool = True) -> float:
    """igraph_reciprocity (structural_properties.c:2417), default mode:
    fraction of non-loop directed edge pairs (u,v) with both u->v and
    v->u present (computed over the distinct simple edge set)."""
    if not graph.directed:
        return 1.0
    e = graph.edges.select(SRC, DST).distinct()
    if ignore_loops:
        e = e.where(F.col(SRC) != F.col(DST))
    total = e.count()
    if total == 0:
        return float("nan")
    rev = e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
    mutual = e.intersect(rev).count()
    return mutual / float(total)


def is_mutual(graph: Graph) -> DataFrame:
    """Per-edge mutuality flag (igraph_is_mutual,
    structural_properties.c:5684) -> edges + boolean ``mutual``
    (loops are mutual by convention)."""
    e = graph.edges
    rev = (e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
           .distinct().withColumn("mutual", F.lit(True)))
    return (e.join(rev, [SRC, DST], "left")
            .withColumn("mutual",
                        F.coalesce("mutual", F.col(SRC) == F.col(DST))))


def count_multiple(graph: Graph) -> DataFrame:
    """Edge multiplicities (igraph_count_multiple,
    structural_properties.c:3695) -> DataFrame(src, dst, multiplicity)."""
    return (graph.edges.groupBy(SRC, DST)
            .agg(F.count("*").alias("multiplicity")))


def is_simple(graph: Graph) -> bool:
    """igraph_is_simple (structural_properties.c:3475): no loops, no
    multi-edges."""
    e = graph.edges
    loops = e.where(F.col(SRC) == F.col(DST)).limit(1).count()
    if loops:
        return False
    multi = (e.groupBy(SRC, DST).agg(F.count("*").alias("c"))
             .where("c > 1").limit(1).count())
    return multi == 0


def has_loops(graph: Graph) -> bool:
    return graph.edges.where(F.col(SRC) == F.col(DST)).limit(1).count() > 0


def is_dag(graph: Graph, max_iter: int = 100000) -> bool:
    """igraph_is_dag (structural_properties.c:3396): iterative
    zero-in-degree peel; a DAG empties, a cycle leaves a residue."""
    if not graph.directed:
        return graph.ecount() == 0
    return topological_order(graph) is not None


def topological_order(graph: Graph, max_iter: int = 100000) -> DataFrame | None:
    """igraph_topological_sorting (structural_properties.c:3318):
    BSP Kahn peel.  Returns DataFrame(id, layer) where ``layer`` is the
    peel round (a valid topo order sorted by (layer, id)), or None if
    the graph has a cycle."""
    e = (graph.edges.select(SRC, DST)
         .where(F.col(SRC) != F.col(DST)).distinct().persist())
    remaining = graph.vertices.select(ID).persist()
    layers: list[DataFrame] = []
    layer = 0
    while True:
        n_rem = remaining.count()
        if n_rem == 0:
            break
        e_rem = (e.join(remaining.withColumnRenamed(ID, SRC), SRC, "left_semi")
                 .join(remaining.withColumnRenamed(ID, DST), DST, "left_semi"))
        has_in = e_rem.select(F.col(DST).alias(ID)).distinct()
        zero_in = remaining.join(has_in, ID, "left_anti").persist()
        n_zero = zero_in.count()
        if n_zero == 0:  # cycle
            e.unpersist(); remaining.unpersist()
            return None
        layers.append(zero_in.select(ID, F.lit(layer).cast("long").alias("layer"))
                      .localCheckpoint(eager=True))
        nxt = remaining.join(zero_in, ID, "left_anti").persist()
        remaining.unpersist()
        remaining = nxt
        layer += 1
        if layer > max_iter:
            raise RuntimeError("topological_order: too many layers")
    e.unpersist()
    out = layers[0] if layers else \
        graph.edges.sparkSession.createDataFrame([], "id long, layer long")
    for p in layers[1:]:
        out = out.unionByName(p)
    return out


def get_stochastic(graph: Graph, column_wise: bool = False) -> DataFrame:
    """Row- (or column-) normalized weighted adjacency
    (igraph_get_stochastic, /root/reference/src/conversion.c:741) ->
    DataFrame(src, dst, prob).  Window sum partitioned by the
    normalizing endpoint — no self-join needed."""
    from pyspark.sql import Window
    e = graph.weighted_edges()
    key = DST if column_wise else SRC
    w = Window.partitionBy(key)
    return e.select(SRC, DST,
                    (F.col(WEIGHT) / F.sum(WEIGHT).over(w)).alias("prob"))


def linegraph(graph: Graph, ids: str = "struct") -> DataFrame:
    """igraph_linegraph (structural_properties.c:4029): vertices are
    edges of g; for directed g, edge (e1, e2) iff e1.dst == e2.src.
    Returns DataFrame(src, dst) of line-graph edges.

    ids='struct' (default, scale-safe): each line-graph vertex is the
    edge's own identity struct(u, v, k) with k the multiplicity rank
    within the (u, v) group — a keyed window, so no operator ever moves
    the full edge set to one partition.  ids='dense' additionally maps
    the structs to igraph-style 0-based longs ranked by (src, dst); the
    rank is two-level (keyed window within each src run + a prefix-sum
    offset over per-src counts), so the only global sort is over the
    distinct-src table — fine at test scale, O(V)-bottlenecked beyond.
    """
    from pyspark.sql import Window
    base = graph.edges.select(SRC, DST)
    kwin = Window.partitionBy(SRC, DST).orderBy(F.lit(1))
    e = base.withColumn(
        "eid", F.struct(F.col(SRC).alias("u"), F.col(DST).alias("v"),
                        (F.row_number().over(kwin) - 1).alias("k")))
    if ids == "dense":
        per_src = base.groupBy(SRC).agg(F.count("*").alias("cnt"))
        offs = per_src.select(
            SRC, (F.sum("cnt").over(Window.orderBy(SRC))
                  - F.col("cnt")).alias("off"))
        e = (e.join(offs, SRC)
             .withColumn("eid", (F.col("off")
                                 + F.row_number().over(
                                     Window.partitionBy(SRC)
                                     .orderBy(DST, "eid.k"))
                                 - 1).cast("long")))
    e = e.select(SRC, DST, "eid")
    if graph.directed:
        a = e.select(F.col("eid").alias("e1"), F.col(DST).alias("mid"))
        b = e.select(F.col("eid").alias("e2"), F.col(SRC).alias("mid"))
        out = a.join(b, "mid").where(F.col("e1") != F.col("e2"))
    else:
        # undirected: edges sharing any endpoint
        ends = (e.select("eid", F.col(SRC).alias("x"))
                .unionByName(e.select("eid", F.col(DST).alias("x"))))
        a = ends.withColumnRenamed("eid", "e1")
        b = ends.withColumnRenamed("eid", "e2")
        out = (a.join(b, "x").where(F.col("e1") < F.col("e2")).distinct())
    return out.select(F.col("e1").alias(SRC), F.col("e2").alias(DST))


def local_scan_1(graph: Graph) -> DataFrame:
    """Scan-1 statistic (igraph_local_scan_1_ecount,
    /root/reference/src/scan.c:331-408): per-vertex edge count of the
    closed 1-neighborhood -> DataFrame(id, scan1).

    For a simple undirected graph the edges inside N[v] are exactly the
    deg(v) incident edges plus one edge per triangle at v, so scan-1 =
    degree + adjacent_triangles — a composition of existing operators
    (both already distributed)."""
    from igraph_spark.algorithms.triangles import adjacent_triangles
    deg = graph.degree("all", loops=False)
    tri = adjacent_triangles(graph)
    return (deg.join(tri, ID)
            .select(ID, (F.col("degree") + F.col("triangles"))
                    .cast("long").alias("scan1")))


def get_adjacency(graph: Graph, sparse: bool = True,
                  weighted: bool = False) -> DataFrame:
    """igraph_get_adjacency (/root/reference/src/conversion.c:69).

    sparse=True (scale path): DataFrame(src, dst, value) with value =
    edge multiplicity (or summed weight); undirected graphs emit both
    triangle halves like the reference's symmetric matrix (loops count
    2 on the diagonal, matching GET_ADJACENCY_BOTH).
    sparse=False: a dense pivoted DataFrame(id, c0..c{n-1}) — test
    scale only (n columns)."""
    if weighted:
        e = graph.weighted_edges()
        val = F.sum(WEIGHT)
    else:
        e = graph.edges.select(SRC, DST).withColumn(WEIGHT, F.lit(1.0))
        val = F.sum(WEIGHT)
    if not graph.directed:
        loops = e.where(F.col(SRC) == F.col(DST))
        e = (e.where(F.col(SRC) != F.col(DST))
             .unionByName(e.where(F.col(SRC) != F.col(DST))
                          .select(F.col(DST).alias(SRC),
                                  F.col(SRC).alias(DST), WEIGHT))
             .unionByName(loops).unionByName(loops))  # diagonal counts 2
    sp = e.groupBy(SRC, DST).agg(val.alias("value"))
    if sparse:
        return sp
    ids = [r[0] for r in graph.vertices.select(ID).orderBy(ID).collect()]
    dense = (graph.vertices.select(F.col(ID))
             .join(sp, F.col(ID) == sp[SRC], "left")
             .groupBy(ID)
             .pivot(DST, ids)
             .agg(F.coalesce(F.first("value"), F.lit(0.0)))
             .na.fill(0.0)
             .orderBy(ID))
    return dense


def from_adjacency(spark, matrix, directed: bool = True) -> Graph:
    """igraph_adjacency ctor (structure_generators.c:265): a_ij parallel
    edges i->j (directed) / max(a_ij, a_ji) undirected-collapse.
    ``matrix``: list of rows (test scale) — melted via posexplode."""
    n = len(matrix)
    rows = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(matrix)],
        "i long, row array<double>")
    cells = rows.select("i", F.posexplode("row").alias("j", "a")) \
        .where(F.col("a") > 0)
    if directed:
        e = cells.select(F.col("i").alias(SRC), F.col("j").alias(DST),
                         F.col("a").cast("int").alias("mult"))
    else:
        e = (cells.select(F.least("i", "j").alias(SRC),
                          F.greatest("i", "j").alias(DST),
                          F.col("a").cast("int").alias("mult"))
             .groupBy(SRC, DST).agg(F.max("mult").alias("mult")))
    e = e.select(SRC, DST, F.explode(F.sequence(F.lit(1), F.col("mult")))
                 .alias("_k")).drop("_k")
    return Graph(e, spark.range(n).toDF(ID), directed=directed,
                 _canonical=not directed)


def contract_vertices(graph: Graph, mapping) -> Graph:
    """igraph_contract_vertices (structural_properties.c:6306): quotient
    graph under ``mapping`` DataFrame(id, group)."""
    m = mapping.select(F.col(mapping.columns[0]).alias(ID),
                       F.col(mapping.columns[1]).alias("g"))
    e = (graph.edges
         .join(m.select(F.col(ID).alias(SRC), F.col("g").alias("gs")), SRC)
         .join(m.select(F.col(ID).alias(DST), F.col("g").alias("gd")), DST)
         .select(F.col("gs").alias(SRC), F.col("gd").alias(DST),
                 *[c for c in graph.edges.columns if c not in (SRC, DST)]))
    verts = m.select(F.col("g").alias(ID)).distinct()
    return Graph(e, verts, graph.directed)


def path_length_hist(graph: Graph, max_rounds: int = 10000) -> DataFrame:
    """Histogram of finite shortest-path lengths over all (ordered)
    vertex pairs (igraph_path_length_hist,
    structural_properties.c:319) -> DataFrame(dist, count).

    BSP multi-source BFS carrying (source, vertex) frontier pairs —
    O(V*E) work; intended for test/moderate scale like the reference's
    O(n*(V+E)) loop.  Undirected pairs are counted once.
    """
    sym = (graph.edges.select(SRC, DST) if graph.directed
           else graph.sym_edges()).where(F.col(SRC) != F.col(DST)).distinct()
    sym = sym.persist()
    verts = graph.vertices.select(ID)
    visited = verts.select(F.col(ID).alias("s"), F.col(ID).alias("v")).persist()
    frontier = visited
    rows = []
    dist = 0
    while True:
        nxt = (frontier.join(sym, frontier["v"] == sym[SRC])
               .select("s", F.col(DST).alias("v")).distinct()
               .join(visited, ["s", "v"], "left_anti").persist())
        cnt = nxt.count()
        dist += 1
        if cnt == 0 or dist > max_rounds:
            nxt.unpersist()
            break
        rows.append((dist, cnt))
        # localCheckpoint breaks the visited-referenced-twice lineage
        # (anti-join + union): without it the plan doubles per round
        # and the driver OOMs at ~15 BFS rounds (ring graphs)
        new_visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        visited.unpersist()
        if frontier is not visited:
            frontier.unpersist()
        visited = new_visited
        frontier = nxt
    sym.unpersist()
    spark = graph.edges.sparkSession
    out = spark.createDataFrame(
        [(int(d), int(c)) for d, c in rows], "dist long, count long")
    if not graph.directed:
        out = out.select("dist", (F.col("count") / 2).cast("long").alias("count"))
    return out


def avg_nearest_neighbor_degree(graph: Graph) -> DataFrame:
    """knn (igraph_avg_nearest_neighbor_degree,
    structural_properties.c:5870), unweighted undirected view ->
    DataFrame(id, knn)."""
    sym = graph.sym_edges().where(F.col(SRC) != F.col(DST)).distinct()
    deg = sym.groupBy(SRC).agg(F.count("*").alias("deg"))
    j = (sym.join(deg.select(F.col(SRC).alias(DST), F.col("deg").alias("nbr_deg")),
                  DST)
         .groupBy(SRC).agg(F.avg("nbr_deg").alias("knn")))
    return j.withColumnRenamed(SRC, ID)


def assortativity_degree(graph: Graph) -> float:
    """Degree assortativity (reference /root/reference/src/mixing.c):
    Pearson correlation of (excess) degrees over edge endpoints, both
    edge directions counted for undirected graphs."""
    sym = (graph.edges.select(SRC, DST) if graph.directed
           else graph.sym_edges()).where(F.col(SRC) != F.col(DST))
    if graph.directed:
        dout = sym.groupBy(SRC).agg(F.count("*").alias("d_s"))
        din = sym.groupBy(DST).agg(F.count("*").alias("d_d"))
        j = sym.join(dout, SRC).join(din, DST)
        row = j.agg(F.corr("d_s", "d_d")).first()
        return float(row[0]) if row[0] is not None else float("nan")
    deg = sym.groupBy(SRC).agg(F.count("*").alias("deg"))
    j = (sym.join(deg.withColumnRenamed(SRC, "a").withColumnRenamed("deg", "d_s"),
                  sym[SRC] == F.col("a"))
         .join(deg.withColumnRenamed(SRC, "b").withColumnRenamed("deg", "d_d"),
               sym[DST] == F.col("b")))
    row = j.agg(F.corr("d_s", "d_d")).first()
    return float(row[0]) if row[0] is not None else float("nan")


def assortativity_nominal(graph: Graph, types: DataFrame) -> float:
    """igraph_assortativity_nominal (/root/reference/src/mixing.c):
    (sum_i e_ii - sum_i a_i b_i) / (1 - sum_i a_i b_i) over the
    type-mixing matrix e (fraction of edges between type pairs;
    undirected edges counted in both directions).  ``types``:
    DataFrame(id, type)."""
    sym = (graph.edges.select(SRC, DST) if graph.directed
           else graph.sym_edges()).where(F.col(SRC) != F.col(DST))
    t_s = types.select(F.col(ID).alias(SRC), F.col("type").alias("ts"))
    t_d = types.select(F.col(ID).alias(DST), F.col("type").alias("td"))
    j = sym.join(t_s, SRC).join(t_d, DST).persist()
    m = j.count()
    if m == 0:
        j.unpersist()
        return float("nan")
    eii = (j.where(F.col("ts") == F.col("td")).count()) / m
    a = j.groupBy("ts").agg((F.count("*") / m).alias("a"))
    b = j.groupBy("td").agg((F.count("*") / m).alias("b"))
    ab = (a.join(b, a["ts"] == b["td"])
          .agg(F.sum(F.col("a") * F.col("b"))).first()[0] or 0.0)
    j.unpersist()
    if ab == 1.0:
        return float("nan")
    return (eii - ab) / (1.0 - ab)


def diversity(graph: Graph) -> DataFrame:
    """igraph_diversity (structural_properties.c): Shannon entropy of
    a vertex's incident edge weights over log(degree) ->
    DataFrame(id, diversity); degree-0 vertices get NaN, degree-1
    vertices 0 (the reference's conventions).  Undirected simple
    weighted graphs."""
    if graph.directed:
        raise ValueError("diversity: undirected graphs only")
    e = graph.weighted_edges().where(F.col(SRC) != F.col(DST))
    inc = (e.select(F.col(SRC).alias(ID), WEIGHT)
           .unionByName(e.select(F.col(DST).alias(ID), WEIGHT)))
    tot = inc.groupBy(ID).agg(F.sum(WEIGHT).alias("tw"),
                              F.count("*").alias("k"))
    p = (inc.join(tot, ID)
         .select(ID, "k", (F.col(WEIGHT) / F.col("tw")).alias("p")))
    h = (p.groupBy(ID, "k")
         .agg((-F.sum(F.col("p") * F.log("p"))).alias("h"))
         .select(ID, F.when(F.col("k") == 1, F.lit(0.0))
                 .otherwise(F.col("h") / F.log(F.col("k").cast("double")))
                 .alias("diversity")))
    return (graph.vertices.join(h, ID, "left")
            .select(ID, F.coalesce("diversity", F.lit(float("nan")))
                    .alias("diversity")))


def neighborhood(graph: Graph, order: int, mode: str = "all",
                 mindist: int = 0) -> DataFrame:
    """igraph_neighborhood (structural_properties.c): vertices within
    ``order`` hops of each vertex -> DataFrame(id, nbr, dist); the ego
    graph is an induced_subgraph over one id's rows.  Bounded
    multi-source BFS (every vertex a source) — O(V * E_local); at
    cluster scale the frontier join is the same keyed exchange as one
    BSP superstep per hop, ``order`` hops total."""
    from igraph_spark.algorithms.paths import bfs_distances
    d = bfs_distances(graph, graph.vertices.select(ID), mode,
                      max_hops=order)
    return (d.where(F.col("dist") >= mindist)
            .select(F.col("source").alias(ID), F.col(ID).alias("nbr"),
                    "dist"))


def neighborhood_size(graph: Graph, order: int, mode: str = "all",
                      mindist: int = 0) -> DataFrame:
    """igraph_neighborhood_size -> DataFrame(id, size)."""
    return (neighborhood(graph, order, mode, mindist)
            .groupBy(ID).agg(F.count("*").cast("long").alias("size")))


def radius(graph: Graph, mode: str = "out") -> float:
    """igraph_radius (structural_properties.c): min eccentricity over
    vertices; empty graph -> NaN like the reference."""
    from igraph_spark.algorithms.paths import eccentricity
    row = eccentricity(graph, mode).agg(F.min("ecc")).first()
    return float(row[0]) if row and row[0] is not None else float("nan")


def are_connected(graph: Graph, v1: int, v2: int) -> bool:
    """igraph_are_connected (/root/reference/src/type_indexededgelist.c
    igraph_are_connected): does the edge v1->v2 (either orientation
    when undirected) exist?  One predicate-pushed probe scan."""
    cond = (F.col(SRC) == v1) & (F.col(DST) == v2)
    if not graph.directed:
        cond = cond | ((F.col(SRC) == v2) & (F.col(DST) == v1))
    return graph.edges.where(cond).limit(1).count() > 0


def with_eids(graph: Graph) -> DataFrame:
    """Edges with a dense edge id -> DataFrame(eid, src, dst, ...).

    The reference's eids are edge-insertion positions
    (type_indexededgelist.c); a DataFrame edge set has no insertion
    order, so the canonical id here is the (src, dst) lexicographic
    rank — assigned scalably by a range-partitioned sort plus
    ``zipWithIndex`` (per-partition offsets, no single-partition
    global window)."""
    e = graph.edges
    cols = e.columns
    sorted_e = e.repartitionByRange(F.col(SRC), F.col(DST)) \
                .sortWithinPartitions(SRC, DST)
    schema = "eid long, " + ", ".join(
        f"`{c}` {e.schema[c].dataType.simpleString()}" for c in cols)
    indexed = sorted_e.rdd.zipWithIndex().map(
        lambda t: (t[1], *[t[0][c] for c in cols]))
    return graph.edges.sparkSession.createDataFrame(indexed, schema)


def get_eids(graph: Graph, pairs: DataFrame, error: bool = True) -> DataFrame:
    """igraph_get_eids (type_indexededgelist.c): resolve (src, dst)
    probe pairs to edge ids -> DataFrame(src, dst, eid); eid null for
    missing pairs when ``error=False``, otherwise missing pairs raise.
    Undirected graphs match either orientation (the smaller eid wins
    for duplicated probes, matching the reference's first-match)."""
    eids = with_eids(graph).select("eid", SRC, DST)
    probes = pairs.select(F.col(SRC).cast("long"), F.col(DST).cast("long"))
    j = probes.join(eids, [SRC, DST], "left")
    if not graph.directed:
        rev = eids.select("eid", F.col(SRC).alias(DST),
                          F.col(DST).alias(SRC))
        j2 = probes.join(rev, [SRC, DST], "left")
        j = j.unionByName(j2)
    out = (j.groupBy(SRC, DST)
           .agg(F.min("eid").alias("eid")))
    if error and out.where(F.col("eid").isNull()).limit(1).count() > 0:
        missing = out.where(F.col("eid").isNull()).limit(3).collect()
        raise ValueError(f"no such edge(s): "
                         f"{[(r[SRC], r[DST]) for r in missing]}")
    return out


def assortativity_values(graph: Graph, values: DataFrame,
                         values_in: DataFrame | None = None) -> float:
    """igraph_assortativity (/root/reference/src/mixing.c): Pearson
    correlation of arbitrary vertex values over edge endpoints —
    ``values`` DataFrame(id, value); ``values_in`` optionally supplies
    the incoming-end values for directed graphs (the reference's
    types2).  Undirected edges are counted in both directions.  Two
    broadcast-able joins + one correlation aggregate."""
    sym = (graph.edges.select(SRC, DST) if graph.directed
           else graph.sym_edges()).where(F.col(SRC) != F.col(DST))
    vcol = values.columns[-1]
    v_out = values.select(F.col(ID).alias(SRC),
                          F.col(vcol).cast("double").alias("x_s"))
    vin = values_in if values_in is not None else values
    vicol = vin.columns[-1]
    v_in = vin.select(F.col(ID).alias(DST),
                      F.col(vicol).cast("double").alias("x_d"))
    row = (sym.join(v_out, SRC).join(v_in, DST)
           .agg(F.corr("x_s", "x_d")).first())
    return float(row[0]) if row[0] is not None else float("nan")


def transitive_closure_dag(graph: Graph, max_rounds: int = 40) -> Graph:
    """igraph_transitive_closure_dag
    (/root/reference/src/structural_properties.c:6411): edge u->w for
    every pair with a directed path u ~> w in a DAG.

    Iterative path doubling — reach_(2k) = reach_k UNION
    (reach_k JOIN reach_k) — so a depth-D DAG converges in ceil(log2 D)
    keyed self-joins instead of D relational steps; every round is
    dedup'd and localCheckpointed to keep the plan linear.  The OUTPUT
    can be Theta(V^2) edges (the closure of a path is the full order)
    — the same blowup as the reference's per-vertex reachability scan;
    partition counts size to the output, not the input."""
    from igraph_spark.operators.structure import is_dag
    if not graph.directed:
        raise ValueError("transitive closure is defined on directed DAGs")
    if not is_dag(graph):
        raise ValueError("input has a directed cycle — not a DAG")
    reach = (graph.edges.select(SRC, DST)
             .where(F.col(SRC) != F.col(DST)).distinct()
             .localCheckpoint(eager=True))
    n = reach.count()
    for _ in range(max_rounds):
        hop = (reach.alias("a")
               .join(reach.alias("b"),
                     F.col(f"a.{DST}") == F.col(f"b.{SRC}"))
               .select(F.col(f"a.{SRC}").alias(SRC),
                       F.col(f"b.{DST}").alias(DST)))
        nxt = reach.unionByName(hop).distinct().localCheckpoint(eager=True)
        n2 = nxt.count()
        reach = nxt
        if n2 == n:
            break
        n = n2
    return Graph(reach, graph._vertices, directed=True)


def permute_vertices(graph: Graph, mapping: DataFrame) -> Graph:
    """igraph_permute_vertices (/root/reference/src/topology.c:3009):
    relabel every vertex through a bijective ``mapping``
    DataFrame(id, new_id) — two broadcast-able joins, attributes
    preserved."""
    new = mapping.select(F.col(ID).alias("__old"),
                         F.col(mapping.columns[-1]).alias("__new"))
    e = (graph.edges
         .join(new.withColumnRenamed("__old", SRC), SRC)
         .withColumn(SRC, F.col("__new")).drop("__new")
         .join(new.withColumnRenamed("__old", DST), DST)
         .withColumn(DST, F.col("__new")).drop("__new"))
    vs = None
    if graph._vertices is not None:
        vs = (graph._vertices
              .join(new.withColumnRenamed("__old", ID), ID)
              .withColumn(ID, F.col("__new")).drop("__new"))
    return Graph(e, vs, directed=graph.directed)
