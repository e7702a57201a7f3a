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
    shape as PageRank.  ``lm`` iterates on A directly; ``la``/``sa``
    shift by the Gershgorin row-sum bound (A + cI / A - cI) so the
    wanted end of the spectrum is also the magnitude maximum; ``be``
    composes la + sa, interleaved largest-first (eigen.c:328 order);
    ``sm``/``interval`` use the folded-spectrum method (power
    iteration on cI - (A - sigma*I)^2 — two matvecs per superstep, no
    nested solves) with a 2x2 Rayleigh-Ritz polish that also splits
    fold-degenerate +/- pairs; see ``_arpack_folded``.  Only
    ``all``/``select`` remain LAPACK-only — they want the full
    spectrum, which is inherently dense output.

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
    if w not in ("lm", "la", "sa", "sm", "be", "interval"):
        # 'all'/'select' want the FULL spectrum / arbitrary interior
        # positions — inherently dense output, LAPACK-only (as in the
        # reference, eigen.c LAPACK route computes everything then
        # selects).  This is a DOCUMENTED gate, not a missing feature:
        # see SURVEY.md §2.12 ("Documented gate (r6)") for the
        # rationale and the distributed workarounds.
        raise ValueError(
            f"which={which!r} needs the full spectrum — a documented "
            f"driver-only gate (SURVEY.md §2.12): use "
            f"algorithm='lapack' below driver_threshold, or a "
            f"distributed which-spec (lm/sm/la/sa/be/interval)")

    if w == "be":
        # both ends = compose 'la' + 'sa' runs, interleaved largest
        # algebraic first (eigen.c:328 ordering)
        kw = dict(n=n, algorithm="arpack",
                  driver_threshold=driver_threshold, max_iter=max_iter,
                  tol=tol, seed=seed)
        hi_vals, hi_vecs = eigen_matrix_symmetric(
            mat, which="la", nev=(nev + 1) // 2, **kw)
        lo_vals, lo_vecs = eigen_matrix_symmetric(
            mat, which="sa", nev=nev // 2, **kw)
        values, vectors, take_hi, ih, il = [], None, True, 0, 0
        while len(values) < min(nev, len(hi_vals) + len(lo_vals)):
            src_vals, src_vecs, pos = (
                (hi_vals, hi_vecs, ih) if take_hi
                else (lo_vals, lo_vecs, il))
            values.append(src_vals[pos])
            part = (src_vecs.where(F.col("k") == pos)
                    .select("i", F.lit(len(values) - 1).alias("k"), "v"))
            vectors = part if vectors is None else vectors.unionByName(part)
            if take_hi:
                ih += 1
            else:
                il += 1
            take_hi = not take_hi
        return values, vectors

    # distributed power iteration + Hotelling deflation: after each
    # converged pair (lambda_p, u_p), iterate on A - lambda_p u_p u_p^T
    # (the rank-one correction is a broadcast join, never materialized)
    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    m = mat.repartition(parts, "j").persist()
    m.count()

    if w in ("sm", "interval"):
        return _arpack_folded(spark, m, n, w, nev, vfrom, vto,
                              parts, max_iter, tol, seed)

    # 'la': shift by the Gershgorin bound so the algebraic maximum is
    # also the magnitude maximum — iterate on A + cI, report lambda - c.
    # 'sa': the mirror — iterate on A - cI (all eigenvalues <= 0, the
    # magnitude maximum is the algebraic minimum).
    shift = 0.0
    if w in ("la", "sa"):
        g_bound = float(
            m.groupBy("i").agg(F.sum(F.abs("x")).alias("s"))
            .agg(F.max("s")).first()[0] or 0.0)
        shift = g_bound if w == "la" else -g_bound
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


def _arpack_folded(spark, m, n: int, w: str, nev: int,
                   vfrom: float, vto: float, parts: int,
                   max_iter: int, tol: float, seed: int):
    """Interior which-specs ('sm', 'interval') at distributed scale via
    the folded-spectrum method (Wang & Zunger, J. Chem. Phys. 100:2394,
    1994): power-iterate on B = cI - (A - sigma*I)^2, whose dominant
    eigenvector is the eigenvector of A whose eigenvalue lies NEAREST
    sigma.  One B-application is two COO matvecs (join + hash agg) and
    one axpy — the same BSP superstep shape as PageRank, with no nested
    linear solves (the classical shift-invert route would need a
    distributed solve per outer step).  Hotelling deflation peels pairs
    outward from sigma, so values emerge ordered by |lambda - sigma|.

    The trade is stated honestly: folding SQUARES the spectrum, so
    the relative gap at the folded top is roughly (gap * |spread|)/c —
    interior pairs in a wide spectrum converge in more supersteps than
    an equivalent end-of-spectrum run (each superstep stays two O(nnz)
    shuffles; nothing grows with iteration count thanks to per-round
    truncation).  When an end formulation exists (e.g. the Laplacian
    Fiedler pair via 'sa'), prefer it; 'sm'/'interval' are for
    genuinely interior targets, where the classical alternative —
    shift-invert — would need a nested distributed linear solve per
    outer step.

    Folding squares the spectrum, so a +/- pair equidistant from sigma
    shares one folded eigenvalue and power iteration lands anywhere in
    the 2-D invariant subspace.  Every converged vector therefore gets
    a 2x2 Rayleigh-Ritz refinement in span{x, Ax} (three scalar
    aggregates + one 2x2 dense solve in the driver): non-degenerate
    vectors come out polished, degenerate pairs split into both
    eigenpairs.  'interval' stops when the next-nearest value leaves
    [vfrom, vto] — by the outward ordering that proves completeness —
    and raises if the nev budget is exhausted first."""
    import numpy as np

    if w == "interval":
        if not (vfrom > float("-inf") and vto < float("inf")):
            raise ValueError("which='interval' needs finite vfrom/vto")
        sigma = (vfrom + vto) / 2.0
    else:
        sigma = 0.0

    # ms = A - sigma*I as COO (absent diagonal entries become -sigma)
    if sigma != 0.0:
        dia = spark.range(n).select(
            F.col("id").alias("i"), F.col("id").alias("j"),
            F.lit(-sigma).alias("x"))
        ms = (m.unionByName(dia).groupBy("i", "j")
              .agg(F.sum("x").alias("x"))
              .repartition(parts, "j").persist())
    else:
        ms = m
    ms.count()
    g_bound = float(ms.groupBy("i").agg(F.sum(F.abs("x")).alias("s"))
                    .agg(F.max("s")).first()[0] or 0.0)
    # 25% headroom above the Gershgorin square: with c = G^2 exactly,
    # an eigenvalue AT the bound folds to 0 and could never be
    # power-iterated out after nearer pairs are deflated
    c = 1.25 * g_bound * g_bound if g_bound > 0 else 1.0

    def mv(mdf, x):
        # COO matvec; rows absent from the result are exact zeros and
        # every consumer left-joins back onto the full index
        return (mdf.join(x.select(F.col("i").alias("j"),
                                  F.col("v").alias("xv")), "j")
                .groupBy("i").agg(F.sum(F.col("x") * F.col("xv"))
                                  .alias("v")))

    values: list[float] = []
    vecs: list[DataFrame] = []
    found_f: list[tuple[float, DataFrame]] = []   # folded-space pairs
    outer = 0
    stop = False          # interval: next-nearest value left [vfrom,vto]
    exhausted = False     # all n eigenpairs deflated (operator is zero)
    while len(values) < nev and len(values) < n:
        x = spark.range(n).select(
            F.col("id").alias("i"),
            (F.xxhash64("id", F.lit(seed), F.lit(outer)).cast("double")
             / F.lit(2.0 ** 63)).alias("v")).localCheckpoint(eager=True)
        nrm0 = float(x.agg(F.sqrt(F.sum(F.col("v") * F.col("v"))))
                     .first()[0])
        x = x.select("i", (F.col("v") / F.lit(nrm0)).alias("v")) \
            .localCheckpoint(eager=True)
        lam_f = 0.0
        for it in range(max_iter):
            t = mv(ms, x)
            s = mv(ms, t)
            y = (x.join(s.withColumnRenamed("v", "sv"), "i", "left")
                 .select("i", (F.lit(c) * F.col("v")
                               - F.coalesce("sv", F.lit(0.0)))
                         .alias("v")))
            for mu_q, u_q in found_f:
                dot = (u_q.join(x, "i")
                       .agg(F.sum(F.col("u") * F.col("v"))).first()[0]
                       or 0.0)
                y = (y.join(u_q, "i", "left")
                     .select("i", (F.col("v") - F.lit(float(mu_q * dot))
                                   * F.coalesce("u", F.lit(0.0)))
                             .alias("v")))
            y = y.localCheckpoint(eager=True)
            st = y.join(x.withColumnRenamed("v", "xv"), "i").agg(
                F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nrm"),
                F.sum(F.col("v") * F.col("xv")).alias("xy")).first()
            nrm = float(st.nrm or 0.0)
            lam_new = float(st.xy or 0.0)       # x unit => Rayleigh of B
            if nrm <= 1e-300:
                exhausted = True                # deflated operator is 0
                break
            x = y.select("i", (F.col("v") / F.lit(nrm)).alias("v")) \
                .localCheckpoint(eager=True)
            delta = abs(lam_new - lam_f)
            lam_f = lam_new
            if it > 0 and delta < tol * max(1.0, abs(lam_f)):
                break

        if exhausted:
            break
        # Rayleigh-Ritz refinement / degenerate split in span{x, Ax}
        wv = mv(m, x).localCheckpoint(eager=True)
        sv = mv(m, wv)
        stats = (x.join(wv.withColumnRenamed("v", "wv"), "i", "left")
                 .join(sv.withColumnRenamed("v", "sv"), "i", "left")
                 .select("v", F.coalesce("wv", F.lit(0.0)).alias("wv"),
                         F.coalesce("sv", F.lit(0.0)).alias("sv"))
                 .agg(F.sum(F.col("v") * F.col("wv")).alias("xw"),
                      F.sum(F.col("wv") * F.col("wv")).alias("ww"),
                      F.sum(F.col("wv") * F.col("sv")).alias("ws"),
                      F.sum(F.col("sv") * F.col("sv")).alias("ss"))
                 .first())
        lam = float(stats.xw or 0.0)
        ww = float(stats.ww or 0.0)
        ws = float(stats.ws or 0.0)
        ss = float(stats.ss or 0.0)
        basis_det = ww - lam * lam              # ||Ax - lam*x||^2
        cands = []                              # (theta, z0, z1, res2)
        if basis_det > 1e-12 * max(1.0, ww):
            G2 = np.array([[1.0, lam], [lam, ww]])
            H2 = np.array([[lam, ww], [ww, ws]])
            L = np.linalg.cholesky(G2)
            Li = np.linalg.inv(L)
            th, Z = np.linalg.eigh(Li @ H2 @ Li.T)
            Z = Li.T @ Z                         # columns: G2-orthonormal
            for r in range(2):
                theta = float(th[r])
                z0, z1 = float(Z[0, r]), float(Z[1, r])
                au2 = z0 * z0 * ww + 2 * z0 * z1 * ws + z1 * z1 * ss
                res2 = max(au2 - theta * theta, 0.0)
                cands.append((theta, z0, z1, res2))
            # keep Ritz pairs that are true eigenpairs; a slowly
            # converged single vector yields one good pair + one bad
            good = [cd for cd in cands
                    if cd[3] <= (1e-5 * max(1.0, abs(cd[0]))) ** 2]
            if not good:
                good = [min(cands, key=lambda cd: cd[3])]
            cands = sorted(good, key=lambda cd: abs(cd[0] - sigma))
            if len(cands) == 2:
                # keep the second pair only when genuinely
                # fold-degenerate (a +/- pair equidistant from sigma);
                # otherwise it is a contamination direction and taking
                # it would break the outward |lambda-sigma| ordering
                # that 'sm' selection and the 'interval' stop rely on
                f0 = (cands[0][0] - sigma) ** 2
                f1 = (cands[1][0] - sigma) ** 2
                if abs(f0 - f1) > 1e-6 * max(1.0, c):
                    cands = cands[:1]
        else:
            cands = [(lam, 1.0, 0.0, 0.0)]

        stop = False
        for theta, z0, z1, _res2 in cands:
            if len(values) >= nev:
                break
            if w == "interval" and not (vfrom <= theta <= vto):
                stop = True                      # outward order => done
                break
            if abs(z1) < 1e-14:
                u = x
            else:
                u = (x.join(wv.withColumnRenamed("v", "wv"), "i", "left")
                     .select("i", (F.lit(z0) * F.col("v") + F.lit(z1)
                                   * F.coalesce("wv", F.lit(0.0)))
                             .alias("v")))
                un = float(u.agg(F.sqrt(F.sum(F.col("v") * F.col("v"))))
                           .first()[0] or 1.0)
                u = u.select("i", (F.col("v") / F.lit(un)).alias("v")) \
                    .localCheckpoint(eager=True)
            values.append(theta)
            vecs.append(u)
            mu = c - (theta - sigma) ** 2
            found_f.append((mu, u.select("i", F.col("v").alias("u"))))
        if stop:
            break
        outer += 1
        if outer > 2 * nev + 4:                  # no-progress backstop
            break

    if ms is not m:
        ms.unpersist()
    m.unpersist()

    if w == "interval":
        # complete iff the outward-ordered search LEFT the interval,
        # or the whole spectrum was enumerated
        if not (stop or exhausted or len(values) >= n):
            raise RuntimeError(
                f"interval [{vfrom}, {vto}] not exhausted within "
                f"nev={nev} eigenpairs; raise nev")
        order = sorted(range(len(values)), key=lambda p: -values[p])
    else:
        values = values[:nev]
        order = sorted(range(len(values)),
                       key=lambda p: abs(values[p] - sigma))
    out_vals = [values[p] for p in order]
    vectors = None
    for k, p in enumerate(order):
        part = vecs[p].select("i", F.lit(k).alias("k"), "v")
        vectors = part if vectors is None else vectors.unionByName(part)
    if vectors is None:
        vectors = spark.createDataFrame([], "i long, k long, v double")
    return out_vals, vectors


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
