"""Similarity search over an embedding column (array<float>).

Two tiers:

  * brute-force cosine top-k — the exactness baseline; one cross/block
    join + window top-k.  Dot products stay JVM-side via
    ``F.zip_with`` + ``F.aggregate`` (no Python).
  * LSH-bucketed (random-hyperplane signatures) — the scale path:
    candidates only within matching sign-pattern buckets, then exact
    cosine re-rank.  Hyperplanes are deterministic (hash-derived), so
    results are reproducible at any parallelism.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame, Window, functions as F


def _norm(col) -> F.Column:
    return F.sqrt(F.aggregate(col, F.lit(0.0),
                              lambda a, x: a + x.cast("double") * x))


def _dot(a, b) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def cosine_topk_bruteforce(embeddings: DataFrame, queries: DataFrame,
                           k: int = 10, id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors for each query ->
    (query_id, neighbor_id, cosine, rank).

    ``queries`` rows are broadcast against the embedding table — at
    cluster scale this is the classic "small probe set vs huge corpus"
    shape; for all-pairs use the LSH variant.
    """
    base = embeddings.select(F.col(id_col).alias("neighbor_id"),
                             F.col(vec_col).alias("v"),
                             _norm(F.col(vec_col)).alias("nv"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"),
                       _norm(F.col(vec_col)).alias("nq"))
    scored = (base.join(F.broadcast(q),
                        F.col("neighbor_id") != F.col("query_id"))
              .select("query_id", "neighbor_id",
                      (_dot(F.col("v"), F.col("qv"))
                       / (F.col("nv") * F.col("nq"))).alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def cosine_near_dup_pairs(embeddings: DataFrame, threshold: float = 0.95,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the dedup tier over
    vectors) -> (a, b, cosine) with a < b and cosine >= threshold.

    Brute force O(n^2) — the exactness baseline; block with
    ``rhp_signature`` buckets first at corpus scale (same re-rank)."""
    base = embeddings.select(F.col(id_col).alias("a"),
                             F.col(vec_col).alias("va"),
                             _norm(F.col(vec_col)).alias("na"))
    other = embeddings.select(F.col(id_col).alias("b"),
                              F.col(vec_col).alias("vb"),
                              _norm(F.col(vec_col)).alias("nb"))
    return (base.join(other, F.col("a") < F.col("b"))
            .select("a", "b",
                    (_dot(F.col("va"), F.col("vb"))
                     / (F.col("na") * F.col("nb"))).alias("cosine"))
            .where(F.col("cosine") >= threshold))


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-gaussian hyperplanes via sha256 counters
    (Box-Muller on hash-uniform pairs)."""
    planes = []
    for p in range(n_planes):
        vec = []
        for d in range(0, dim, 2):
            h = hashlib.sha256(f"{seed}:{p}:{d}".encode()).digest()
            u1 = (int.from_bytes(h[:8], "big") + 1) / (2.0 ** 64 + 2)
            u2 = int.from_bytes(h[8:16], "big") / (2.0 ** 64)
            r = math.sqrt(-2.0 * math.log(u1))
            vec.append(r * math.cos(2 * math.pi * u2))
            if d + 1 < dim:
                vec.append(r * math.sin(2 * math.pi * u2))
        planes.append(vec[:dim])
    return planes


def rhp_signature(embeddings: DataFrame, dim: int, n_planes: int = 16,
                  seed: int = 42, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Random-hyperplane (SimHash-for-cosine) signature ->
    (vec_id, bucket) where bucket packs the n_planes sign bits."""
    planes = _hyperplanes(dim, n_planes, seed)
    sig = F.lit(0).cast("long")
    for i, pl in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in pl])
        dot = _dot(F.col(vec_col), plane)
        sig = sig.bitwiseOR(
            F.when(dot >= 0, F.shiftleft(F.lit(1).cast("long"), i))
             .otherwise(F.lit(0).cast("long")))
    return embeddings.select(F.col(id_col).alias("vec_id"),
                             sig.alias("bucket"))


def rhp_near_dup_pairs(embeddings: DataFrame, dim: int,
                       threshold: float = 0.95,
                       planes_per_band: int = 3, n_bands: int = 24,
                       seed: int = 42, id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       max_bucket: int | str | None = "auto") -> DataFrame:
    """LSH-fronted near-duplicate pairs -> (a, b, cosine), a < b.

    OR-amplified random-hyperplane blocking: ``n_bands`` independent
    bands of ``planes_per_band`` sign bits each; a pair becomes a
    candidate if it agrees on ALL bits of ANY band, then candidates are
    exactly re-ranked by cosine and filtered at ``threshold``.  Miss
    probability for a pair at angle theta is
    (1 - (1 - theta/pi)^b)^bands — with b=3, bands=24 it is < 0.2% even
    at cosine 0.4 and vanishes for closer pairs, so at test scale the
    result equals the brute-force pair set (the driver oracle asserts
    exactly that); at corpus scale the same knobs trade recall for
    candidate volume.  This is the scale path the brute-force
    ``cosine_near_dup_pairs`` is the exactness baseline for.

    ``max_bucket``: per-(band, bucket) cap — the hot-bucket skew
    guardrail.  Default "auto" = 4096, ON (benign corpora never reach
    it; see dedup.minhash_lsh_pairs for the recall trade when it
    bites).  Pass an int to tune or None for uncapped candidates.
    """
    from igraph_spark.functions.dedup import _resolve_max_bucket
    max_bucket = _resolve_max_bucket(max_bucket)
    planes = _hyperplanes(dim, planes_per_band * n_bands, seed)
    base = embeddings.select(F.col(id_col).alias("vec_id"),
                             F.col(vec_col).alias("v"),
                             _norm(F.col(vec_col)).alias("nv"))
    band_sigs = []
    for bi in range(n_bands):
        sig = F.lit(0).cast("long")
        for j in range(planes_per_band):
            pl = planes[bi * planes_per_band + j]
            plane = F.array(*[F.lit(float(x)) for x in pl])
            sig = sig.bitwiseOR(
                F.when(_dot(F.col("v"), plane) >= 0,
                       F.shiftleft(F.lit(1).cast("long"), j))
                 .otherwise(F.lit(0).cast("long")))
        band_sigs.append(F.struct(F.lit(bi).alias("band"),
                                  sig.alias("sig")))
    buckets = (base.select("vec_id",
                           F.explode(F.array(*band_sigs)).alias("bk"))
               .select("vec_id", "bk.band", "bk.sig"))
    if max_bucket is not None:
        # skew guardrail: per-(band, sig) membership cap with per-band
        # rotated ordering — see dedup._cap_hot_buckets for semantics
        from igraph_spark.functions.dedup import _cap_hot_buckets
        buckets = _cap_hot_buckets(buckets, "vec_id", "band", "sig",
                                   max_bucket)
    cand = (buckets.alias("x").join(
                buckets.alias("y"),
                (F.col("x.band") == F.col("y.band"))
                & (F.col("x.sig") == F.col("y.sig"))
                & (F.col("x.vec_id") < F.col("y.vec_id")))
            .select(F.col("x.vec_id").alias("a"),
                    F.col("y.vec_id").alias("b"))
            .distinct())
    return (cand
            .join(base.select(F.col("vec_id").alias("a"),
                              F.col("v").alias("va"),
                              F.col("nv").alias("na")), "a")
            .join(base.select(F.col("vec_id").alias("b"),
                              F.col("v").alias("vb"),
                              F.col("nv").alias("nb")), "b")
            .select("a", "b",
                    (_dot(F.col("va"), F.col("vb"))
                     / (F.col("na") * F.col("nb"))).alias("cosine"))
            .where(F.col("cosine") >= threshold))


def cosine_topk_lsh(embeddings: DataFrame, dim: int, k: int = 10,
                    n_planes: int = 12, seed: int = 42,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Approximate all-pairs top-k: candidates share an RHP bucket,
    exact cosine re-rank inside buckets ->
    (query_id, neighbor_id, cosine, rank).  Recall grows with fewer
    planes (bigger buckets); scale knob is n_planes."""
    sigs = rhp_signature(embeddings, dim, n_planes, seed, id_col, vec_col)
    base = embeddings.select(F.col(id_col).alias("vec_id"),
                             F.col(vec_col).alias("v"),
                             _norm(F.col(vec_col)).alias("nv")) \
                     .join(sigs, "vec_id")
    a = base.select(F.col("vec_id").alias("query_id"),
                    F.col("v").alias("qv"), F.col("nv").alias("nq"),
                    "bucket")
    b = base.select(F.col("vec_id").alias("neighbor_id"),
                    F.col("v"), F.col("nv"), "bucket")
    scored = (a.join(b, "bucket")
              .where(F.col("query_id") != F.col("neighbor_id"))
              .select("query_id", "neighbor_id",
                      (_dot(F.col("qv"), F.col("v"))
                       / (F.col("nq") * F.col("nv"))).alias("cosine"))
              .groupBy("query_id", "neighbor_id")
              .agg(F.max("cosine").alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


# --------------------------------------------------------------- IVF

# centroid count at or below which assignment/probing stay pure
# Catalyst expressions (greatest over per-centroid dot structs).
# Above it the O(n_clusters * dim) expression tree per operator makes
# Catalyst ANALYSIS the bottleneck (at 4096 cells the old literal plan
# could not even be built), so the argmax switches to one vectorized
# numpy matvec per Arrow batch (guide §4.2: hand whole batches to
# native code; §4.5: the centroid matrix is materialized once per
# task, amortized over every batch).
IVF_LITERAL_MAX_CLUSTERS = 64


def _cent_matrix(centroids: list[list[float]]):
    import numpy as np
    return np.asarray(centroids, dtype=np.float64)


def _assign_clusters_arrow(df: DataFrame, centroids: list[list[float]],
                           vec_col: str,
                           out_col: str = "cluster") -> DataFrame:
    """Append the argmax-dot cluster via one ``V @ C.T`` per Arrow
    batch.  Tie-break matches the literal path exactly: the HIGHEST
    cluster index wins a dot-product tie (greatest over
    struct(dot, cluster) semantics).  Assumes a dense, null-free
    fixed-width embedding column (the corpus contract)."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    cents = [list(map(float, c)) for c in centroids]
    # fresh StructType — StructType.add mutates in place, and df.schema
    # hands back the DataFrame's cached schema object
    schema = StructType(df.schema.fields
                        + [StructField(out_col, IntegerType())])

    def fn(batches):
        import numpy as np
        import pyarrow as pa
        C = np.asarray(cents, dtype=np.float64).T     # (dim, k), per task
        k = C.shape[1]
        for b in batches:
            n = b.num_rows
            if n == 0:
                yield b.append_column(out_col, pa.array([], type=pa.int32()))
                continue
            idx = b.schema.get_field_index(vec_col)
            flat = (b.column(idx).flatten()
                    .to_numpy(zero_copy_only=False).astype(np.float64))
            dots = flat.reshape(n, -1) @ C
            # reversed argmax -> LAST max index = highest cluster on ties
            cl = (k - 1) - np.argmax(dots[:, ::-1], axis=1)
            yield b.append_column(out_col,
                                  pa.array(cl.astype("int32"),
                                           type=pa.int32()))

    return df.mapInArrow(fn, schema)


def _probe_cells(queries: DataFrame, centroids: list[list[float]],
                 n_probe: int, id_col: str,
                 vec_col: str) -> DataFrame:
    """(query_id, qv, nq, cluster) — the ``n_probe`` best cells per
    query, literal expressions below IVF_LITERAL_MAX_CLUSTERS, Arrow
    matvec above (cell order: dot desc, then cluster desc — identical
    on both paths)."""
    qv = F.col(vec_col)
    base = queries.select(F.col(id_col).alias("query_id"),
                          qv.alias("qv"), _norm(qv).alias("nq"),
                          vec_col)
    if len(centroids) <= IVF_LITERAL_MAX_CLUSTERS:
        probe_structs = [
            F.struct(_dot(qv, F.array(*[F.lit(x) for x in c])).alias("dot"),
                     F.lit(ci).alias("cluster"))
            for ci, c in enumerate(centroids)]
        return (base.select(
            "query_id", "qv", "nq",
            F.slice(F.reverse(F.array_sort(F.array(*probe_structs))),
                    1, n_probe).alias("cells"))
            .select("query_id", "qv", "nq",
                    F.explode("cells.cluster").alias("cluster")))
    from pyspark.sql.types import ArrayType, IntegerType, StructField, \
        StructType

    cents = [list(map(float, c)) for c in centroids]
    schema = StructType(base.schema.fields
                        + [StructField("cells", ArrayType(IntegerType()))])

    def fn(batches):
        import numpy as np
        import pyarrow as pa
        C = np.asarray(cents, dtype=np.float64).T
        k = C.shape[1]
        neg_cluster = -np.arange(k)
        for b in batches:
            n = b.num_rows
            if n == 0:
                yield b.append_column(
                    "cells", pa.array([], type=pa.list_(pa.int32())))
                continue
            idx = b.schema.get_field_index(vec_col)
            flat = (b.column(idx).flatten()
                    .to_numpy(zero_copy_only=False).astype(np.float64))
            dots = flat.reshape(n, -1) @ C
            cells = [np.lexsort((neg_cluster, -dots[i]))[:n_probe]
                     .astype("int32").tolist() for i in range(n)]
            yield b.append_column(
                "cells", pa.array(cells, type=pa.list_(pa.int32())))

    return (base.mapInArrow(fn, schema)
            .select("query_id", "qv", "nq",
                    F.explode("cells").alias("cluster")))


def ivf_train_centroids(embeddings: DataFrame, dim: int,
                        n_clusters: int = 16, max_iter: int = 8,
                        seed: int = 42, id_col: str = "vec_id",
                        vec_col: str = "embedding") -> list[list[float]]:
    """Spherical k-means coarse quantizer (the IVF training step).

    Deterministic init: the ``n_clusters`` rows ranked first by
    ``xxhash64(id, seed)``.  Lloyd rounds are distributed — the
    assignment is the shared argmax path (Catalyst literals for small
    cell counts, Arrow matvec above IVF_LITERAL_MAX_CLUSTERS) and the
    update is ``dim`` column means per cluster; only the
    (n_clusters x dim) mean matrix crosses to the driver per round.
    Centroids are L2-normalized each round (spherical k-means), so
    assignment by dot product equals assignment by cosine.
    """
    rows = (embeddings
            .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)), F.col(id_col))
            .limit(n_clusters).select(vec_col).collect())
    cents = [[float(x) for x in r[0]] for r in rows]

    def _unit(c):
        n = math.sqrt(sum(x * x for x in c)) or 1.0
        return [x / n for x in c]

    cents = [_unit(c) for c in cents]
    v = F.col(vec_col)
    for _ in range(max_iter):
        assigned = (ivf_assign(embeddings.select(vec_col), cents, dim,
                               id_col=None, vec_col=vec_col)
                    .withColumnRenamed("cluster", "c"))
        means = (assigned.groupBy("c")
                 .agg(*[F.avg(v[i].cast("double")).alias(f"m{i}")
                        for i in range(dim)])
                 .collect())
        new = list(cents)
        for r in means:
            new[r["c"]] = _unit([r[f"m{i}"] for i in range(dim)])
        if new == cents:
            break
        cents = new
    return cents


def ivf_assign(embeddings: DataFrame, centroids: list[list[float]],
               dim: int, id_col: str | None = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """Attach the coarse-quantizer cell -> (id_col, vec_col..., cluster).
    At corpus scale the result is written bucketed by ``cluster`` so a
    probe reads only the probed cells (``ivf_write_corpus`` /
    ``ivf_probe_corpus``).  Assignment is pure Catalyst below
    IVF_LITERAL_MAX_CLUSTERS and one numpy matvec per Arrow batch
    above (at 4096+ cells the literal expression tree is unplannable;
    see the module constant)."""
    if len(centroids) > IVF_LITERAL_MAX_CLUSTERS:
        return _assign_clusters_arrow(embeddings, centroids, vec_col)
    v = F.col(vec_col)
    structs = [
        F.struct(_dot(v, F.array(*[F.lit(x) for x in c])).alias("dot"),
                 F.lit(ci).alias("cluster"))
        for ci, c in enumerate(centroids)]
    return embeddings.withColumn(
        "cluster", F.greatest(*structs).getField("cluster"))


def ivf_write_corpus(embeddings: DataFrame, centroids: list[list[float]],
                     path: str, dim: int, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> None:
    """Assign and persist the corpus PARTITIONED BY cluster (one
    directory per coarse cell) — the on-disk layout that makes a probe
    read only its probed cells (guide §6: partitioning on write
    determines how well readers skip data)."""
    assigned = ivf_assign(embeddings, centroids, dim, id_col, vec_col)
    (assigned.write.mode("overwrite")
     .partitionBy("cluster").parquet(path))


def ivf_probe_corpus(spark, path: str, queries: DataFrame,
                     centroids: list[list[float]], dim: int, k: int = 10,
                     n_probe: int = 4, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Top-k probe against an ``ivf_write_corpus`` layout: the scan is
    filtered to the union of the queries' probe cells, so partition
    pruning keeps unprobed cell directories unread (inputFiles-
    asserted in tests/test_ann_ivf_corpus.py).  Same scoring and
    ranking semantics as ``ivf_topk``."""
    import os as _os
    probes = _probe_cells(queries, centroids, n_probe, id_col, vec_col)
    cells = sorted({r["cluster"] for r in
                    probes.select("cluster").distinct().collect()})
    # read ONLY the probed cell directories (the statestore pattern —
    # explicit leaf dirs, not a filter the reader may or may not prune
    # by); basePath keeps the cluster partition column in the schema
    cell_dirs = [p for p in
                 (_os.path.join(path, f"cluster={c}") for c in cells)
                 if _os.path.isdir(p)]
    if not cell_dirs:
        cell_dirs = [path]  # degenerate: nothing probed exists
    corpus = (spark.read.option("basePath", path).parquet(*cell_dirs)
              .select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("v"),
                      _norm(F.col(vec_col)).alias("nv"), "cluster"))
    scored = (corpus.join(F.broadcast(probes), "cluster")
              .where(F.col("neighbor_id") != F.col("query_id"))
              .select("query_id", "neighbor_id",
                      (_dot(F.col("v"), F.col("qv"))
                       / (F.col("nv") * F.col("nq"))).alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def ivf_topk(embeddings: DataFrame, queries: DataFrame, dim: int,
             k: int = 10, n_clusters: int = 16, n_probe: int = 4,
             max_iter: int = 8, seed: int = 42, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """IVF approximate top-k cosine -> (query_id, neighbor_id, cosine,
    rank): train the coarse quantizer, assign the corpus, probe the
    ``n_probe`` nearest cells per query, exact cosine re-rank inside
    the probed cells only.

    ``n_probe = n_clusters`` degenerates to exact brute force (every
    cell probed -> full candidate set), which is the oracle identity
    the driver gate checks; recall at partial probe is measured by
    ``ann_ivf_recall``.
    """
    cents = ivf_train_centroids(embeddings, dim, n_clusters, max_iter,
                                seed, id_col, vec_col)
    corpus = ivf_assign(embeddings, cents, dim, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v"),
        _norm(F.col(vec_col)).alias("nv"), "cluster")
    qv = F.col(vec_col)
    probe_structs = [
        F.struct(_dot(qv, F.array(*[F.lit(x) for x in c])).alias("dot"),
                 F.lit(ci).alias("cluster"))
        for ci, c in enumerate(cents)]
    probes = (queries.select(
        F.col(id_col).alias("query_id"), qv.alias("qv"),
        _norm(qv).alias("nq"),
        F.slice(F.reverse(F.array_sort(F.array(*probe_structs))),
                1, n_probe).alias("cells"))
        .select("query_id", "qv", "nq",
                F.explode("cells.cluster").alias("cluster")))
    scored = (corpus.join(F.broadcast(probes), "cluster")
              .where(F.col("neighbor_id") != F.col("query_id"))
              .select("query_id", "neighbor_id",
                      (_dot(F.col("v"), F.col("qv"))
                       / (F.col("nv") * F.col("nq"))).alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))
