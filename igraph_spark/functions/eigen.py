"""Generic eigenproblem interface — the igraph_eigen family
(/root/reference/src/eigen.c: igraph_eigen_matrix_symmetric :1136,
igraph_eigen_adjacency :1374, igraph_eigen_laplacian :1440; which-spec
enum include/igraph_eigen.h:50-61).

The matrix is a symmetric COO DataFrame ``(i long, j long, x double)``
(both triangles present).  Two execution paths, mirroring the
reference's LAPACK/ARPACK split:

  * ``algorithm="lapack"`` (auto below ``driver_threshold`` vertices):
    dense ``numpy.linalg.eigh`` in the driver — every which-spec
    (lm/sm/la/sa/be/all/interval/select) supported, like the
    reference's LAPACK route which always computes the full spectrum
    and selects (eigen.c:259-398).
  * ``algorithm="arpack"`` (auto above the threshold): distributed
    power iteration with Hotelling deflation over the COO table — the
    matvec is one equi-join + hash aggregate per step, the same BSP
    shape as PageRank.  Supports ``lm`` (and ``la`` when the dominant
    eigenvalue is the algebraic maximum, e.g. PSD matrices such as the
    Laplacian); other which-specs need shift-invert solves and raise
    with a pointer to the driver path, honestly gated rather than
    silently approximated.

Returns ``(values, vectors)``: a Python list of eigenvalues (ordered
by the which-spec, reference ordering) and a DataFrame
``(i, k, v)`` — component i of eigenvector k, k aligned to values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from igraph_spark.graph import Graph, SRC, DST, WEIGHT, ID

DRIVER_THRESHOLD = 4096


def _which_select(vals, which: str, nev: int, vfrom: float, vto: float,
                  idx) -> list:
    """Order/select positions into ``vals`` per the which-spec
    (eigen.c LAPACK route: full spectrum then selection)."""
    import numpy as np
    order_asc = np.argsort(vals)            # algebraic ascending
    w = which.lower()
    if w == "lm":
        pos = sorted(range(len(vals)), key=lambda p: -abs(vals[p]))[:nev]
    elif w == "sm":
        pos = sorted(range(len(vals)), key=lambda p: abs(vals[p]))[:nev]
    elif w == "la":
        pos = list(order_asc[::-1][:nev])
    elif w == "sa":
        pos = list(order_asc[:nev])
    elif w == "be":
        # both ends, largest algebraic first, alternating (eigen.c:328)
        lo, hi = 0, len(vals) - 1
        pos = []
        take_hi = True
        while len(pos) < min(nev, len(vals)):
            if take_hi:
                pos.append(int(order_asc[hi]))
                hi -= 1
            else:
                pos.append(int(order_asc[lo]))
                lo += 1
            take_hi = not take_hi
    elif w == "all":
        pos = list(order_asc[::-1])
    elif w == "interval":
        pos = [int(p) for p in order_asc[::-1]
               if vfrom <= vals[p] <= vto]
    elif w == "select":
        if idx is None:
            raise ValueError("which='select' needs idx (positions in "
                             "the algebraic-descending order)")
        desc = list(order_asc[::-1])
        pos = [int(desc[i]) for i in idx]
    else:
        raise ValueError(f"unknown which-spec {which!r}")
    return [int(p) for p in pos]


def eigen_matrix_symmetric(mat: DataFrame, n: int | None = None,
                           which: str = "lm", nev: int = 1,
                           algorithm: str = "auto",
                           vfrom: float = float("-inf"),
                           vto: float = float("inf"),
                           idx=None,
                           driver_threshold: int = DRIVER_THRESHOLD,
                           max_iter: int = 300, tol: float = 1e-10,
                           seed: int = 42):
    """igraph_eigen_matrix_symmetric analog.  ``mat``: symmetric COO
    DataFrame (i, j, x).  See the module docstring for semantics."""
    spark = mat.sparkSession
    mat = mat.select(F.col(mat.columns[0]).cast("long").alias("i"),
                     F.col(mat.columns[1]).cast("long").alias("j"),
                     F.col(mat.columns[2]).cast("double").alias("x"))
    if n is None:
        mn = mat.agg(F.max("i").alias("a"), F.max("j").alias("b")).first()
        n = int(max(mn.a if mn.a is not None else -1,
                    mn.b if mn.b is not None else -1)) + 1
    if algorithm == "auto":
        algorithm = "lapack" if n <= driver_threshold else "arpack"

    if algorithm == "lapack":
        import numpy as np
        A = np.zeros((n, n))
        for r in mat.collect():
            A[r.i, r.j] = r.x
        if not np.allclose(A, A.T, atol=1e-12):
            raise ValueError("matrix is not symmetric")
        vals, vecs = np.linalg.eigh(A)
        pos = _which_select(vals, which, nev, vfrom, vto, idx)
        values = [float(vals[p]) for p in pos]
        rows = [(int(i), int(k), float(vecs[i, p]))
                for k, p in enumerate(pos) for i in range(n)]
        vectors = spark.createDataFrame(rows or [],
                                        "i long, k long, v double")
        return values, vectors

    if algorithm != "arpack":
        raise ValueError(f"unknown algorithm {algorithm!r}")
    w = which.lower()
    if w not in ("lm", "la"):
        raise ValueError(
            f"which={which!r} at distributed scale needs shift-invert "
            f"solves; use algorithm='lapack' (driver) or raise "
            f"driver_threshold")

    # distributed power iteration + Hotelling deflation: after each
    # converged pair (lambda_p, u_p), iterate on A - lambda_p u_p u_p^T
    # (the rank-one correction is a broadcast join, never materialized)
    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    m = mat.repartition(parts, "j").persist()
    m.count()
    # 'la': shift by the Gershgorin bound so the algebraic maximum is
    # also the magnitude maximum — iterate on A + cI, report lambda - c
    shift = 0.0
    if w == "la":
        shift = float(
            m.groupBy("i").agg(F.sum(F.abs("x")).alias("s"))
            .agg(F.max("s")).first()[0] or 0.0)
    found: list[tuple[float, DataFrame]] = []
    values: list[float] = []
    for p in range(nev):
        x = spark.range(n).select(
            F.col("id").alias("i"),
            (F.xxhash64("id", F.lit(seed), F.lit(p)).cast("double")
             / F.lit(2.0 ** 63)).alias("v")).localCheckpoint(eager=True)
        lam = 0.0
        for it in range(max_iter):
            y = (m.join(x.select(F.col("i").alias("j"),
                                 F.col("v").alias("xv")), "j")
                 .groupBy("i").agg(F.sum(F.col("x") * F.col("xv"))
                                   .alias("v")))
            if shift:
                y = (x.join(y, "i", "left")
                     .select("i", (F.coalesce(y["v"], F.lit(0.0))
                                   + F.lit(shift) * x["v"]).alias("v")))
            # deflation: y -= lambda_q * u_q * (u_q . x) for each found q
            for lam_q, u_q in found:
                dot = (u_q.join(x, "i")
                       .agg(F.sum(F.col("u") * F.col("v"))).first()[0]
                       or 0.0)
                y = (spark.range(n).select(F.col("id").alias("i"))
                     .join(y, "i", "left")
                     .join(u_q, "i", "left")
                     .select("i", (F.coalesce("v", F.lit(0.0))
                                   - F.lit(float(lam_q * dot))
                                   * F.coalesce("u", F.lit(0.0)))
                             .alias("v")))
            y = y.localCheckpoint(eager=False)
            st = y.agg(F.sqrt(F.sum(F.col("v") * F.col("v")))
                       .alias("nrm")).first()
            nrm = float(st.nrm or 0.0)
            if nrm == 0.0:
                lam = 0.0
                break
            x_new = y.select("i", (F.col("v") / F.lit(nrm)).alias("v")) \
                .localCheckpoint(eager=True)
            # SIGNED Rayleigh quotient lambda = x . (A x) = x . y with
            # the PRE-update unit x (x_new . y = ||y|| loses the sign
            # for negative eigenvalues)
            rq = (x.join(y.select(F.col("i"), F.col("v").alias("yv")), "i")
                  .agg(F.sum(F.col("v") * F.col("yv")).alias("xy"),
                       F.sum(F.col("v") * F.col("v")).alias("xx")).first())
            lam_new = float((rq.xy or 0.0) / rq.xx) if rq.xx else 0.0
            delta = abs(lam_new - lam)
            x, lam = x_new, lam_new
            if it > 0 and delta < tol * max(1.0, abs(lam)):
                break
        values.append(lam - shift)
        # deflation runs in the SHIFTED spectrum (u is an eigenvector
        # of A + cI with eigenvalue lam)
        found.append((lam, x.select("i", F.col("v").alias("u"))
                      .localCheckpoint(eager=True)))
    m.unpersist()
    vectors = None
    for k, (_, u_q) in enumerate(found):
        part = u_q.select("i", F.lit(k).alias("k"),
                          F.col("u").alias("v"))
        vectors = part if vectors is None else vectors.unionByName(part)
    return values, vectors


def eigen_adjacency(graph: Graph, **kw):
    """igraph_eigen_adjacency (eigen.c:1374): eigenpairs of the
    symmetric adjacency matrix (undirected; weights when present)."""
    if graph.directed:
        raise ValueError("eigen_adjacency needs an undirected graph")
    e = graph.sym_edges(weighted=graph.has_weights)
    if WEIGHT not in e.columns:
        e = e.withColumn(WEIGHT, F.lit(1.0))
    mat = e.select(F.col(SRC).alias("i"), F.col(DST).alias("j"),
                   F.col(WEIGHT).alias("x"))
    kw.setdefault("n", graph.vcount())
    return eigen_matrix_symmetric(mat, **kw)


def eigen_laplacian(graph: Graph, normalized: bool = False, **kw):
    """igraph_eigen_laplacian (eigen.c:1440): eigenpairs of the
    (optionally symmetric-normalized) Laplacian L = D - A."""
    if graph.directed:
        raise ValueError("eigen_laplacian needs an undirected graph")
    e = graph.sym_edges(weighted=graph.has_weights)
    if WEIGHT not in e.columns:
        e = e.withColumn(WEIGHT, F.lit(1.0))
    deg = e.groupBy(SRC).agg(F.sum(WEIGHT).alias("d"))
    off = e.select(F.col(SRC).alias("i"), F.col(DST).alias("j"),
                   (-F.col(WEIGHT)).alias("x"))
    dia = (graph.vertices.select(F.col(ID).alias("i"))
           .join(deg.withColumnRenamed(SRC, "i"), "i", "left")
           .select("i", F.col("i").alias("j"),
                   F.coalesce("d", F.lit(0.0)).alias("x")))
    mat = off.unionByName(dia)
    if normalized:
        dd = dia.select("i", F.sqrt(F.greatest("x", F.lit(0.0)))
                        .alias("sq"))
        mat = (mat.join(dd.select(F.col("i"), F.col("sq").alias("si")), "i")
               .join(dd.select(F.col("i").alias("j"),
                               F.col("sq").alias("sj")), "j")
               .select("i", "j",
                       F.when((F.col("si") > 0) & (F.col("sj") > 0),
                              F.col("x") / (F.col("si") * F.col("sj")))
                       .otherwise(F.when(F.col("i") == F.col("j"),
                                         F.lit(0.0)).otherwise(F.lit(0.0)))
                       .alias("x")))
    kw.setdefault("n", graph.vcount())
    return eigen_matrix_symmetric(mat, **kw)
