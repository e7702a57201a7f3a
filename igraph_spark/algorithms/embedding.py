"""Adjacency / Laplacian spectral embeddings (ASE / LSE).

Reference: igraph_adjacency_spectral_embedding /
igraph_laplacian_spectral_embedding
(/root/reference/src/embedding.c:807,760-1050): a no-dimensional
latent-position estimate from the top eigenpairs of an augmented
adjacency operator — ``A + diag(cvec)`` for ASE (the RDPG estimator),
and for LSE the types ``D_A`` (= D - A), ``DAD``
(= D^-1/2 A D^-1/2) and ``I_DAD`` (= I - DAD)
(include/igraph_embedding.h:56-59; the 1/sqrt(deg) augmentation is
embedding.c:874-886).  ``which`` selects largest-magnitude (LM),
algebraic-largest (LA) or algebraic-smallest (SA) eigenvalues;
``scaled`` multiplies eigenvector columns by sqrt(|lambda|)
(embedding.c:700-706).

Physical strategy (the reference runs ARPACK on a driver-resident
CSR; a 10^12-vertex graph has no such thing):

* **Distributed path** — matrix-free block subspace iteration.  The
  k-column eigenvector state lives LONG (id, d, v) so every kernel is
  a Catalyst join + hash aggregate: the matvec is one shuffle on the
  symmetrized edge table, Gram matrices are k(k+1)/2-cell aggregates
  collected to the driver (k x k only — never O(n)), Cholesky /
  Rayleigh-Ritz rotations are k x k numpy ops broadcast back as tiny
  coefficient tables.  LA/SA run the Gershgorin-shifted operator so
  plain power iteration converges to the right end of the spectrum,
  and eigenvalues are recovered from a final Rayleigh-Ritz on the
  UNshifted operator.
* **Driver path** (vcount <= ``vertex_threshold``, and any directed
  graph): exact dense numpy eigh/SVD — the output contract for both
  paths, asserted equal in tests/test_embedding.py.

Column signs are canonicalized (largest-|entry| coordinate positive)
so both paths and repeated runs agree; with eigenvalue ties the
subspace is determined but individual columns may rotate — tests pin
ties via the projector.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from igraph_spark.graph import Graph, SRC, DST, WEIGHT, ID

_WHICH = ("lm", "la", "sa")


# ------------------------------------------------------------ driver path
def _driver_eigs(n, idx_edges, diag, no, which):
    import numpy as np

    A = np.zeros((n, n))
    for u, v, w in idx_edges:
        A[u, v] += w
        if u != v:
            A[v, u] += w
    A[np.arange(n), np.arange(n)] += diag
    vals, vecs = np.linalg.eigh(A)
    if which == "lm":
        order = np.argsort(-np.abs(vals), kind="stable")
    elif which == "la":
        order = np.argsort(-vals, kind="stable")
    else:
        order = np.argsort(vals, kind="stable")
    sel = order[:no]
    return vals[sel], vecs[:, sel]


def _canon_signs_np(vecs):
    import numpy as np
    for c in range(vecs.shape[1]):
        i = int(np.argmax(np.abs(vecs[:, c])))
        if vecs[i, c] < 0:
            vecs[:, c] = -vecs[:, c]
    return vecs


# ------------------------------------------------------ distributed path
def _long_state(spark, vertices, k, seed=7):
    """deterministic pseudo-random start block, long (id, d, v)."""
    dims = spark.range(k).select(F.col("id").alias("d"))
    return (vertices.select(ID).crossJoin(F.broadcast(dims))
            .select(ID, "d",
                    ((F.pmod(F.xxhash64(ID, "d", F.lit(seed)),
                             F.lit(10_000_000)) / 5_000_000.0) - 1.0)
                    .alias("v")))


def _rotate(state, mat, k):
    """state (id,d,v) x (k x kc) ``mat`` -> new state: v'_c = sum_d
    v_d * mat[d][c].  ``mat`` is a python list-of-lists."""
    spark = state.sparkSession
    kc = len(mat[0])
    coefs = spark.createDataFrame(
        [(d, c, float(mat[d][c])) for d in range(k) for c in range(kc)
         if mat[d][c] != 0.0],
        "d long, c long, coef double")
    return (state.join(F.broadcast(coefs), "d")
            .groupBy(ID, F.col("c").alias("dd"))
            .agg(F.sum(F.col("v") * F.col("coef")).alias("v"))
            .select(ID, F.col("dd").alias("d"), "v"))


def _gram(state_a, state_b, k):
    """k x k matrix  G[da][db] = sum_i a_i,da * b_i,db."""
    a = state_a.select(ID, F.col("d").alias("da"), F.col("v").alias("va"))
    b = state_b.select(ID, F.col("d").alias("db"), F.col("v").alias("vb"))
    rows = (a.join(b, ID)
            .groupBy("da", "db")
            .agg(F.sum(F.col("va") * F.col("vb")).alias("g"))
            .collect())
    G = [[0.0] * k for _ in range(k)]
    for r in rows:
        G[r["da"]][r["db"]] = r["g"]
    return G


def _apply_op(state, sym_e, diag_df):
    """y = A_sym x + diag .* x  (diag_df: id, c)."""
    mat = (sym_e.join(state.select(F.col(ID).alias(DST), "d", "v"), DST)
           .groupBy(F.col(SRC).alias(ID), "d")
           .agg(F.sum(F.col(WEIGHT) * F.col("v")).alias("v")))
    dia = (state.join(diag_df, ID)
           .select(ID, "d", (F.col("v") * F.col("c")).alias("v")))
    return (mat.unionByName(dia)
            .groupBy(ID, "d").agg(F.sum("v").alias("v")))


def _distributed_eigs(graph, sym_e, diag_df, no, which, max_iter, seed):
    import numpy as np

    spark = graph.edges.sparkSession
    k = min(no + 2, graph.vcount())          # oversampled block
    # Gershgorin radius bounds |lambda|; shift makes the wanted end
    # of the spectrum the largest-magnitude one for LA/SA
    row_r = (sym_e.groupBy(SRC).agg(F.sum(F.abs(WEIGHT)).alias("r"))
             .withColumnRenamed(SRC, ID))
    bound_row = (graph.vertices.select(ID).join(row_r, ID, "left")
                 .join(diag_df, ID, "left")
                 .select((F.coalesce("r", F.lit(0.0))
                          + F.abs(F.coalesce("c", F.lit(0.0)))).alias("b"))
                 .agg(F.max("b")).collect()[0][0]) or 1.0
    shift = float(bound_row) + 1.0

    if which == "la":
        shifted_diag = diag_df.select(ID, (F.col("c") + shift).alias("c"))
        sgn = 1.0
    elif which == "sa":
        shifted_diag = diag_df.select(ID, (-F.col("c") + shift).alias("c"))
        sgn = -1.0
    else:
        shifted_diag = diag_df
        sgn = 1.0
    sym_use = sym_e if sgn > 0 else \
        sym_e.select(SRC, DST, (-F.col(WEIGHT)).alias(WEIGHT))

    full_diag = (graph.vertices.select(ID)
                 .join(shifted_diag, ID, "left")
                 .select(ID, F.coalesce("c", F.lit(0.0)).alias("c")))
    sym_use = sym_use.persist()
    state = _long_state(spark, graph.vertices, k, seed)
    for it in range(max_iter):
        state = _apply_op(state, sym_use, full_diag)
        # every iteration runs a k x k Gram collect; the lazy local
        # checkpoint materializes the state exactly once (at that
        # collect) AND truncates lineage, so per-round work is flat
        state = state.localCheckpoint(eager=False)
        G = _gram(state, state, k)
        L = np.linalg.cholesky(np.array(G) + 1e-12 * np.eye(k))
        Linv_t = np.linalg.inv(L).T        # X <- X L^-T orthonormalizes
        state = _rotate(state, Linv_t.tolist(), k)

    # Rayleigh-Ritz on the UNSHIFTED operator for true eigenvalues
    orig_diag = (graph.vertices.select(ID).join(diag_df, ID, "left")
                 .select(ID, F.coalesce("c", F.lit(0.0)).alias("c")))
    mx = _apply_op(state, sym_e, orig_diag)
    H = np.array(_gram(state, mx, k))
    H = (H + H.T) / 2.0
    vals, rot = np.linalg.eigh(H)
    if which == "lm":
        order = np.argsort(-np.abs(vals), kind="stable")
    elif which == "la":
        order = np.argsort(-vals, kind="stable")
    else:
        order = np.argsort(vals, kind="stable")
    sel = order[:no]
    state = _rotate(state, rot[:, sel].tolist(), k)
    state = state.where(F.col("d") < no)
    return [float(vals[i]) for i in sel], state


def _finish(spark, vals, state, no, scaled, vertices):
    """sign-canonicalize, scale, pivot wide -> DataFrame(id, e0..)."""
    # sign: the row with max |v| per column gets positive v
    m = (state.groupBy("d")
         .agg(F.max(F.abs(F.col("v"))).alias("mx")))
    pick = (state.join(m, "d")
            .where(F.abs(F.col("v")) == F.col("mx"))
            .groupBy("d").agg(F.min(F.when(F.col("v") >= 0, 1.0)
                                    .otherwise(-1.0)).alias("sgn")))
    state = (state.join(F.broadcast(pick), "d")
             .select(ID, "d", (F.col("v") * F.col("sgn")).alias("v")))
    if scaled:
        sc = spark.createDataFrame(
            [(d, math.sqrt(abs(vals[d]))) for d in range(no)],
            "d long, s double")
        state = (state.join(F.broadcast(sc), "d")
                 .select(ID, "d", (F.col("v") * F.col("s")).alias("v")))
    wide = (state.groupBy(ID)
            .pivot("d", list(range(no)))
            .agg(F.first("v")))
    for d in range(no):
        wide = wide.withColumnRenamed(str(d), f"e{d}")
    out = vertices.select(ID).join(wide, ID, "left")
    for d in range(no):
        out = out.withColumn(f"e{d}", F.coalesce(f"e{d}", F.lit(0.0)))
    return out


def _embed(graph: Graph, no: int, diag_df, which: str, scaled: bool,
           weights, vertex_threshold: int, max_iter: int,
           seed: int):
    spark = graph.edges.sparkSession
    if which not in _WHICH:
        raise ValueError(f"which must be one of {_WHICH}")
    nv = graph.vcount()
    if not 0 < no <= nv:
        raise ValueError("embedding dimension out of range")
    use_w = graph.has_weights if weights is None else bool(weights)
    e = graph.weighted_edges() if use_w else \
        graph.edges.select(SRC, DST).withColumn(WEIGHT, F.lit(1.0))
    # symmetric view, each undirected edge in both directions
    canon = (e.select(F.least(SRC, DST).alias(SRC),
                      F.greatest(SRC, DST).alias(DST), WEIGHT)
             .groupBy(SRC, DST).agg(F.sum(WEIGHT).alias(WEIGHT)))
    sym_e = canon.unionByName(
        canon.where(F.col(SRC) != F.col(DST))
        .select(F.col(DST).alias(SRC), F.col(SRC).alias(DST), WEIGHT))

    if nv <= vertex_threshold:
        import numpy as np
        vids = sorted(int(r[0])
                      for r in graph.vertices.select(ID).collect())
        idx = {v: i for i, v in enumerate(vids)}
        ed = [(idx[int(r[SRC])], idx[int(r[DST])], float(r[WEIGHT]))
              for r in canon.collect()]
        dvals = {int(r[ID]): float(r["c"]) for r in diag_df.collect()}
        diag = np.array([dvals.get(v, 0.0) for v in vids])
        vals, vecs = _driver_eigs(len(vids), ed, diag, no, which)
        vecs = _canon_signs_np(vecs)
        if scaled:
            vecs = vecs * np.sqrt(np.abs(vals))[None, :]
        rows = [(vids[i], *[float(x) for x in vecs[i]])
                for i in range(len(vids))]
        schema = f"{ID} long, " + ", ".join(
            f"e{d} double" for d in range(no))
        return [float(x) for x in vals], spark.createDataFrame(rows, schema)

    vals, state = _distributed_eigs(graph, sym_e, diag_df, no, which,
                                    max_iter, seed)
    return vals, _finish(spark, vals, state, no, scaled, graph.vertices)


def adjacency_spectral_embedding(graph: Graph, no: int,
                                 weights: bool | None = None,
                                 which: str = "lm", scaled: bool = True,
                                 cvec: DataFrame | None = None,
                                 vertex_threshold: int = 2000,
                                 max_iter: int = 48, seed: int = 7):
    """ASE -> (eigenvalues list, DataFrame(id, e0..e{no-1})).

    ``cvec``: optional (id, c) diagonal augmentation; defaults to
    degree/(n-1), the standard RDPG augmentation (the reference's C
    API takes cvec explicitly; its high-level wrappers default to
    this).  Directed graphs use the undirected collapse in this
    build (the reference embeds directed graphs via SVD; the
    symmetric eigen path is the supported surface here)."""
    g = graph if not graph.directed else graph.to_undirected("collapse")
    nv = g.vcount()
    if cvec is None:
        denom = float(max(nv - 1, 1))
        cvec = (g.degree("all")
                .select(ID, (F.col("degree") / denom).alias("c")))
    else:
        cvec = cvec.select(ID, F.col(cvec.columns[1]).alias("c"))
    return _embed(g, no, cvec, which, scaled, weights,
                  vertex_threshold, max_iter, seed)


def laplacian_spectral_embedding(graph: Graph, no: int,
                                 weights: bool | None = None,
                                 type: str = "dad", which: str = "lm",
                                 scaled: bool = True,
                                 vertex_threshold: int = 2000,
                                 max_iter: int = 48, seed: int = 7):
    """LSE -> (eigenvalues list, DataFrame(id, e0..e{no-1})).

    ``type``: "d_a" (D - A), "dad" (D^-1/2 A D^-1/2) or "i_dad"
    (I - DAD), matching IGRAPH_EMBEDDING_* (igraph_embedding.h:56).
    """
    g = graph if not graph.directed else graph.to_undirected("collapse")
    use_w = g.has_weights if weights is None else bool(weights)
    st = g.strength("all") if use_w else \
        g.degree("all").select(ID, F.col("degree").alias("strength"))
    if type == "d_a":
        # operator = diag(deg) - A: negate edges, diag = +deg
        diag = st.select(ID, F.col("strength").alias("c"))
        gg = Graph(
            (g.weighted_edges() if use_w else
             g.edges.select(SRC, DST).withColumn(WEIGHT, F.lit(1.0)))
            .select(SRC, DST, (-F.col(WEIGHT)).alias(WEIGHT)),
            g._vertices, directed=False)
        return _embed(gg, no, diag, which, scaled, True,
                      vertex_threshold, max_iter, seed)
    if type not in ("dad", "i_dad"):
        raise ValueError("type must be d_a, dad or i_dad")
    # scale edges by 1/sqrt(deg) on both endpoints (embedding.c:880)
    inv = st.select(ID, F.when(F.col("strength") > 0,
                               1.0 / F.sqrt("strength"))
                    .otherwise(F.lit(0.0)).alias("is_"))
    e = g.weighted_edges() if use_w else \
        g.edges.select(SRC, DST).withColumn(WEIGHT, F.lit(1.0))
    scaled_e = (e.join(inv.select(F.col(ID).alias(SRC),
                                  F.col("is_").alias("s1")), SRC)
                .join(inv.select(F.col(ID).alias(DST),
                                 F.col("is_").alias("s2")), DST)
                .select(SRC, DST,
                        (F.col(WEIGHT) * F.col("s1") * F.col("s2"))
                        .alias(WEIGHT)))
    if type == "i_dad":
        scaled_e = scaled_e.select(
            SRC, DST, (-F.col(WEIGHT)).alias(WEIGHT))
        diag = g.vertices.select(ID, F.lit(1.0).alias("c"))
    else:
        diag = g.vertices.select(ID, F.lit(0.0).alias("c"))
    gg = Graph(scaled_e, g._vertices, directed=False)
    return _embed(gg, no, diag, which, scaled, True,
                  vertex_threshold, max_iter, seed)
