"""Spectral coarse graining (SCG) — igraph_scg_grouping /
igraph_scg_semiprojectors / igraph_scg_adjacency / _laplacian /
_stochastic (/root/reference/src/scg.c:349,807,1427,1697,
src/scg_optimal_method.c:45, src/scg_approximate_methods.c:94,
src/scg_exact_scg.c:36; Morton de Lachapelle et al., "Shrinking
Matrices while Preserving their Eigenpairs").

SCG partitions vertices so that the coarse-grained matrix
``Mt = L M R^T`` preserves chosen eigenpairs of M.  Spark shapes:

* **Grouping** is a per-eigenvector 1-D clustering of the component
  values.  ``exact`` (equal components) is a plain groupBy; ``interv``
  (constant bins) is column arithmetic; ``interv_km`` is Lloyd's 1-D
  k-means with the nt centers broadcast each sweep (one shuffle per
  sweep, centers are tiny).  ``optimum`` is the reference's exact
  O(nt*n^2) contiguous-partition DP — quadratic state BY DEFINITION,
  so like the reference it is a driver core, gated by
  ``max_driver_n``.  Multi-eigenvector grouping intersects the
  per-vector partitions (glabels struct groupBy, scg.c:449-470).
* **Semi-projectors** are sparse by construction — one row per vertex
  — and are returned as (group, id, value) DataFrames.
* **Coarse matrices** never materialize L/R densely: Mt's entry
  (a, b) aggregates the edges between group a and group b with the
  projector scaling folded in — a two-way broadcast-join of the edge
  table with the O(V)-row group map plus one groupBy.  This is the
  same shuffle shape as contract_vertices and survives arbitrary
  scale; eigenvectors come from the distributed block solver in
  algorithms/embedding.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from igraph_spark.graph import Graph, ID, SRC, DST, WEIGHT

_TOL = 1e-14  # scg_exact_scg.c:57 — equality tolerance on components


def _ev_cols(V: DataFrame) -> list:
    return [c for c in V.columns if c != ID]


def _exact_labels(V: DataFrame, col: str) -> DataFrame:
    """IGRAPH_SCG_EXACT (scg_exact_scg.c:36): vertices with equal
    components share a group.  Equality is exact on the double value
    (the reference chains a 1e-14 tolerance along the sorted order;
    identical-by-symmetry components are bit-equal in practice)."""
    return V.select(ID, F.col(col).alias("val")) \
            .withColumn("lab", F.col("val")).drop("val")


def _interv_breaks(V: DataFrame, col: str, nt: int) -> tuple:
    row = V.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).first()
    return float(row["lo"]), float(row["hi"])


def _interv_labels(V: DataFrame, col: str, nt: int) -> DataFrame:
    """IGRAPH_SCG_INTERV (scg_approximate_methods.c:94): nt constant
    bins over [min, max], left-closed, max included in the last bin."""
    lo, hi = _interv_breaks(V, col, nt)
    if hi <= lo:
        return V.select(ID, F.lit(0.0).alias("lab"))
    width = (hi - lo) / nt
    lab = F.least(F.floor((F.col(col) - F.lit(lo)) / F.lit(width)),
                  F.lit(nt - 1)).cast("double")
    return V.select(ID, lab.alias("lab"))


def _interv_km_labels(V: DataFrame, col: str, nt: int,
                      maxiter: int = 100) -> DataFrame:
    """IGRAPH_SCG_INTERV_KM: Lloyd k-means on one dimension, seeded
    with equidistant centers (scg_approximate_methods.c:75-92).  The
    nt centers live on the driver (nt << V); assignment is a broadcast
    argmin, update is one groupBy per sweep."""
    lo, hi = _interv_breaks(V, col, nt)
    if hi <= lo:
        return V.select(ID, F.lit(0.0).alias("lab"))
    width = (hi - lo) / nt
    centers = [lo + (i + 0.5) * width for i in range(nt)]
    vals = V.select(ID, F.col(col).alias("v")).persist()
    vals.count()
    assign = None
    for _ in range(maxiter):
        arr = F.array(*[F.lit(c) for c in centers])
        lab = F.expr(
            "array_position(transform(ctr, c -> abs(v - c)), "
            "array_min(transform(ctr, c -> abs(v - c)))) - 1")
        assign = vals.withColumn("ctr", arr).select(
            ID, "v", lab.cast("double").alias("lab")).drop("ctr")
        upd = (assign.groupBy("lab").agg(F.avg("v").alias("c"))
               .collect())
        new_centers = list(centers)
        for r in upd:
            new_centers[int(r["lab"])] = float(r["c"])
        if all(abs(a - b) < 1e-12 for a, b in zip(centers, new_centers)):
            break
        centers = new_centers
    vals.unpersist()
    return assign.select(ID, "lab")


def _optimum_labels(V: DataFrame, col: str, nt: int, mtype: str,
                    p: DataFrame | None,
                    max_driver_n: int = 10_000) -> DataFrame:
    """IGRAPH_SCG_OPTIMUM (scg_optimal_method.c:45): exact minimal
    sum-of-squares contiguous partition of the sorted components via
    dynamic programming — O(nt*n^2) time and O(n^2) cost matrix BY
    DEFINITION, driver-gated like the reference's own dense solver."""
    import numpy as np

    spark = V.sparkSession
    if p is not None:
        rows = (V.select(ID, F.col(col).alias("v"))
                .join(p.select(ID, F.col(p.columns[-1]).alias("p")), ID)
                .collect())
        ids = [int(r[ID]) for r in rows]
        v = np.array([float(r["v"]) for r in rows])
        pv = np.array([float(r["p"]) for r in rows])
    else:
        rows = V.select(ID, F.col(col).alias("v")).collect()
        ids = [int(r[ID]) for r in rows]
        v = np.array([float(r["v"]) for r in rows])
        pv = None
    n = len(ids)
    if n > max_driver_n:
        raise ValueError(
            f"optimum SCG is an O(n^2) dense DP: n={n} > "
            f"max_driver_n={max_driver_n}; use algo='interv_km'")
    order = np.argsort(v, kind="stable")
    vs = v[order]
    non_ties = 1 + int(np.sum(np.abs(np.diff(vs)) > _TOL))
    if nt >= non_ties:
        raise ValueError("nt must be smaller than the number of unique "
                         "values in the eigenvector")
    # cost matrix: within-[i..j] sum of squared deviations
    # (scg_optimal_method.c:173; stochastic uses p-weighted means)
    C = np.zeros((n, n))
    if mtype == "stochastic":
        ps = pv[order]
        for i in range(n):
            t1 = np.cumsum(ps[i:])
            t2 = np.cumsum(ps[i:] * vs[i:])
            mean = t2 / t1
            sq = np.cumsum(vs[i:] ** 2)  # unweighted squares, ref l.242
            for j in range(i + 1, n):
                seg = vs[i:j + 1] - mean[j - i]
                C[i, j] = float(np.dot(seg, seg))
    else:
        w = np.concatenate([[0.0], np.cumsum(vs)])
        w2 = np.concatenate([[0.0], np.cumsum(vs * vs)])
        for i in range(n):
            ln = np.arange(1, n - i + 1)
            s = w[i + 1:n + 1] - w[i]
            s2 = w2[i + 1:n + 1] - w2[i]
            C[i, i:] = s2 - s * s / ln
    FM = np.zeros((nt, n))
    Q = np.zeros((nt, n), dtype=np.int64)
    FM[0, :] = C[0, :]
    Q[np.arange(nt), np.arange(nt)] = np.arange(nt)  # scg_optimal_method.c:150
    for i in range(1, nt):
        for j in range(i + 1, n):
            cand = FM[i - 1, i - 1:j] + C[i:j + 1, j]
            q = int(np.argmin(cand))
            FM[i, j] = float(cand[q])
            Q[i, j] = i + q  # first index of the last group
    gr = np.zeros(n, dtype=np.int64)
    col_j = n - 1
    part = nt - 1
    for lev in range(nt - 1, 0, -1):
        start = Q[lev, col_j]
        gr[start:col_j + 1] = part
        col_j = start - 1
        part -= 1
    gr[:col_j + 1] = 0
    out = [(ids[order[i]], float(gr[i])) for i in range(n)]
    return spark.createDataFrame(out, f"{ID} long, lab double")


def scg_grouping(V: DataFrame, nt: int = 2, mtype: str = "symmetric",
                 algo: str = "optimum", p: DataFrame | None = None,
                 maxiter: int = 100) -> DataFrame:
    """igraph_scg_grouping (scg.c:349) -> DataFrame(id, group).

    ``V``: DataFrame(id, e0, e1, ...) — one column per eigenvector to
    preserve (the shape produced by algorithms/embedding.py).  Vertices
    grouped together in EVERY per-eigenvector minimizing partition
    share a final group; groups are dense ints ordered by the sorted
    per-vector label tuples (scg.c:449-470)."""
    if mtype not in ("symmetric", "laplacian", "stochastic"):
        raise ValueError(f"unknown mtype {mtype!r}")
    if mtype == "stochastic" and p is None and algo == "optimum":
        raise ValueError("stochastic optimum SCG needs the stationary "
                         "distribution p")
    evs = _ev_cols(V)
    labelled = None
    for k, c in enumerate(evs):
        if algo == "exact":
            lab = _exact_labels(V, c)
        elif algo == "interv":
            lab = _interv_labels(V, c, nt)
        elif algo == "interv_km":
            lab = _interv_km_labels(V, c, nt, maxiter)
        elif algo == "optimum":
            lab = _optimum_labels(V, c, nt, mtype, p)
        else:
            raise ValueError(f"unknown algo {algo!r}")
        lab = lab.withColumnRenamed("lab", f"lab{k}")
        labelled = lab if labelled is None else labelled.join(lab, ID)
    labcols = [f"lab{k}" for k in range(len(evs))]
    distinct = (labelled.select(*labcols).distinct()
                .orderBy(*labcols).collect())
    mapping = {tuple(r[c] for c in labcols): g
               for g, r in enumerate(distinct)}
    spark = V.sparkSession
    mdf = spark.createDataFrame(
        [tuple(list(k) + [g]) for k, g in mapping.items()],
        ", ".join(f"{c} double" for c in labcols) + ", group long")
    return (labelled.join(F.broadcast(mdf), labcols)
            .select(ID, "group"))


def scg_semiprojectors(groups: DataFrame, mtype: str = "symmetric",
                       p: DataFrame | None = None,
                       norm: str = "row") -> tuple:
    """igraph_scg_semiprojectors (scg.c:807) -> (L, R) sparse
    DataFrames(group, id, value).

    symmetric:  L = R = 1/sqrt(|a|) * indicator
    laplacian:  L = 1/|a| * indicator,  R = indicator     (row norm)
    stochastic: L = p_i / p(gamma(i)) * indicator, R = indicator
    ``norm='col'`` swaps the normalized side (scg.c:744-770)."""
    sizes = groups.groupBy("group").agg(F.count("*").alias("gn"))
    g = groups.join(F.broadcast(sizes), "group")
    if mtype == "symmetric":
        val = 1.0 / F.sqrt(F.col("gn"))
        L = g.select("group", ID, val.alias("value"))
        return L, L
    if mtype == "laplacian":
        lv, rv = (1.0 / F.col("gn"), F.lit(1.0))
    elif mtype == "stochastic":
        if p is None:
            raise ValueError("stochastic semi-projectors need p")
        g = g.join(p.select(ID, F.col(p.columns[-1]).alias("p")), ID)
        pg = g.groupBy("group").agg(F.sum("p").alias("pg"))
        g = g.join(F.broadcast(pg), "group")
        lv, rv = (F.col("p") / F.col("pg"), F.lit(1.0))
    else:
        raise ValueError(f"unknown mtype {mtype!r}")
    if norm == "col":
        lv, rv = rv, lv
    L = g.select("group", ID, lv.alias("value"))
    R = g.select("group", ID, rv.alias("value"))
    return L, R


def _coarse_matrix(entries: DataFrame, L: DataFrame, R: DataFrame
                   ) -> DataFrame:
    """Mt = L M R^T without densifying: entries (src,dst,w) joined to
    the group maps, one groupBy on (gsrc, gdst)."""
    lm = L.select(F.col(ID).alias(SRC), F.col("group").alias("gsrc"),
                  F.col("value").alias("lv"))
    rm = R.select(F.col(ID).alias(DST), F.col("group").alias("gdst"),
                  F.col("value").alias("rv"))
    # lm/rm are O(V)-row maps: a plain shuffle join (AQE may still
    # broadcast them when small) — no forced broadcast, they can be huge
    return (entries.join(lm, SRC)
            .join(rm, DST)
            .groupBy("gsrc", "gdst")
            .agg(F.sum(F.col("w") * F.col("lv") * F.col("rv"))
                 .alias(WEIGHT))
            .select(F.col("gsrc").alias(SRC), F.col("gdst").alias(DST),
                    WEIGHT))


def scg_adjacency(graph: Graph, no: int = 2, nt: int = 2,
                  algo: str = "optimum", groups: DataFrame | None = None
                  ) -> tuple:
    """igraph_scg_adjacency (scg.c:1427): preserve the ``no`` largest-
    magnitude adjacency eigenpairs -> (groups DF(id, group),
    coarse edge DF(src, dst, weight))."""
    from igraph_spark.algorithms.embedding import \
        adjacency_spectral_embedding

    if groups is None:
        _, V = adjacency_spectral_embedding(graph, no, scaled=False)
        groups = scg_grouping(V, nt, "symmetric", algo)
    groups = groups.persist()
    groups.count()
    L, R = scg_semiprojectors(groups, "symmetric")
    entries = graph.sym_edges(weighted=True) if not graph.directed \
        else graph.weighted_edges()
    entries = entries.select(SRC, DST, F.col(WEIGHT).alias("w"))
    coarse = _coarse_matrix(entries, L, R)
    return groups, coarse


def scg_laplacian(graph: Graph, no: int = 2, nt: int = 2,
                  algo: str = "optimum", norm: str = "row",
                  groups: DataFrame | None = None) -> tuple:
    """igraph_scg_laplacian (scg.c:1900-ish semantics): coarse-grain
    the Laplacian L = D - A -> (groups, coarse entries).  Coarse rows
    (norm='row') sum to zero by construction."""
    from igraph_spark.algorithms.embedding import \
        laplacian_spectral_embedding

    if groups is None:
        _, V = laplacian_spectral_embedding(graph, no, scaled=False)
        groups = scg_grouping(V, nt, "laplacian", algo)
    groups = groups.persist()
    groups.count()
    L, R = scg_semiprojectors(groups, "laplacian", norm=norm)
    adj = graph.sym_edges(weighted=True).select(
        SRC, DST, (-F.col(WEIGHT)).alias("w"))
    deg = (graph.sym_edges(weighted=True).groupBy(SRC)
           .agg(F.sum(WEIGHT).alias("w"))
           .select(SRC, F.col(SRC).alias(DST), "w"))
    entries = adj.unionByName(deg)
    coarse = _coarse_matrix(entries, L, R)
    return groups, coarse


def scg_stochastic(graph: Graph, no: int = 2, nt: int = 2,
                   algo: str = "optimum", norm: str = "row",
                   p: DataFrame | None = None,
                   groups: DataFrame | None = None) -> tuple:
    """igraph_scg_stochastic (scg.c:1697): coarse-grain the random-walk
    matrix P = D^-1 A -> (groups, coarse entries).  ``p`` is the
    stationary distribution; for undirected graphs it defaults to
    deg/2m (the exact stationary law of the unbiased walk), for
    directed graphs it must be supplied (e.g. pagerank with damping
    1.0).  Coarse rows (norm='row') sum to one."""
    spark = graph.edges.sparkSession
    se = graph.sym_edges(weighted=True) if not graph.directed \
        else graph.weighted_edges()
    deg = se.groupBy(SRC).agg(F.sum(WEIGHT).alias("deg"))
    if p is None:
        if graph.directed:
            raise ValueError("directed stochastic SCG needs p")
        tot = se.agg(F.sum(WEIGHT)).first()[0]
        p = deg.select(F.col(SRC).alias(ID),
                       (F.col("deg") / F.lit(float(tot))).alias("p"))
    p = p.persist()
    p.count()
    if groups is None:
        from igraph_spark.algorithms.embedding import \
            adjacency_spectral_embedding
        _, V = adjacency_spectral_embedding(graph, no, scaled=False)
        groups = scg_grouping(V, nt, "stochastic", algo, p=p)
    groups = groups.persist()
    groups.count()
    L, R = scg_semiprojectors(groups, "stochastic", p=p, norm=norm)
    entries = (se.join(deg, SRC)
               .select(SRC, DST, (F.col(WEIGHT) / F.col("deg"))
                       .alias("w")))
    coarse = _coarse_matrix(entries, L, R)
    return groups, coarse
