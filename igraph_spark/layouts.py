"""Layouts — igraph_layout_circle / _grid / _random /
_fruchterman_reingold (/root/reference/src/layout.c).

Deterministic coordinate generators (pure column arithmetic) plus a
BSP force-directed layout: one Fruchterman-Reingold iteration is an
all-pairs repulsion aggregate (a cross join, O(n^2) per round — the
reference's own complexity) + an edge-attraction aggregate + a
temperature-capped displacement.  Hash-seeded initial positions make
every layout reproducible at any parallelism.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

from igraph_spark.graph import Graph, SRC, DST, ID


def _ranked(graph: Graph) -> DataFrame:
    """(id, rank) with rank = 0-based position in ascending id order
    (the reference places vertices in vertex-id order).  The global
    window runs over the vertex table — fine for layout-sized outputs
    (a layout is inherently collected for rendering)."""
    return graph.vertices.select(
        ID, (F.row_number().over(Window.orderBy(ID)) - 1).alias("rank"))


def layout_circle(graph: Graph) -> DataFrame:
    """igraph_layout_circle: vertex k at angle 2*pi*k/n."""
    n = graph.vcount()
    ang = F.col("rank") * (2.0 * math.pi / max(n, 1))
    return _ranked(graph).select(ID, F.cos(ang).alias("x"),
                                 F.sin(ang).alias("y"))


def layout_grid(graph: Graph, width: int = 0) -> DataFrame:
    """igraph_layout_grid: row-major grid, auto width = ceil(sqrt(n))."""
    n = graph.vcount()
    w = width if width > 0 else int(math.ceil(math.sqrt(max(n, 1))))
    return _ranked(graph).select(
        ID, (F.col("rank") % w).cast("double").alias("x"),
        F.floor(F.col("rank") / w).cast("double").alias("y"))


def layout_random(graph: Graph, seed: int = 42) -> DataFrame:
    """igraph_layout_random on [-1, 1]^2, hash-uniform (scale-free:
    no ranking, no shuffle)."""
    def u(salt: int) -> F.Column:
        h = F.xxhash64(F.col(ID), F.lit(seed), F.lit(salt))
        return (h.cast("double") / F.lit(2.0 ** 63))
    return graph.vertices.select(ID, u(0).alias("x"), u(1).alias("y"))


def layout_fruchterman_reingold(graph: Graph, iterations: int = 50,
                                seed: int = 42) -> DataFrame:
    """igraph_layout_fruchterman_reingold -> DataFrame(id, x, y).

    Classic FR: repulsion k^2/d between all pairs, attraction d^2/k
    along edges, displacement capped by a linearly cooling temperature.
    Each iteration = one cross-join aggregate + one edge aggregate —
    O(n^2) work per round exactly like the reference; test/moderate
    scale by nature (layouts are for graphs you can draw).
    """
    from igraph_spark.checkpointing import SuperstepRunner
    spark = graph.edges.sparkSession
    n = max(graph.vcount(), 1)
    k = math.sqrt(1.0 / n)
    e = (graph.edges.select(SRC, DST).where(F.col(SRC) != F.col(DST))
         .distinct())
    sym = (e.unionByName(e.select(F.col(DST).alias(SRC),
                                  F.col(SRC).alias(DST)))
           .select(F.col(SRC).alias("i"), F.col(DST).alias("j"),
                   F.lit(True).alias("is_e"))
           .localCheckpoint(eager=True))

    runner = SuperstepRunner(spark, checkpoint_every=5)
    pos, start, _ = runner.start(
        layout_random(graph, seed),
        params={"algo": "fr", "seed": seed, "iters": iterations})
    for it in range(start, iterations):
        temp = 0.1 * (1.0 - it / iterations) + 1e-6
        # ONE all-pairs pass per round: repulsion for every pair plus
        # attraction where the pair is an edge; the move is applied in
        # the same projection over aggregated force columns, and the
        # runner owns persist/rotation + lineage truncation (the same
        # discipline every BSP loop here uses — ad-hoc per-round
        # localCheckpoint chains measured super-linear growth after
        # ~15 rounds)
        a = pos.select(F.col(ID).alias("i"), F.col("x").alias("xi"),
                       F.col("y").alias("yi"))
        b = pos.select(F.col(ID).alias("j"), F.col("x").alias("xj"),
                       F.col("y").alias("yj"))
        dx, dy = F.col("xi") - F.col("xj"), F.col("yi") - F.col("yj")
        d2 = dx * dx + dy * dy + F.lit(1e-9)
        d = F.sqrt(d2)
        fpx = (dx / d2 * (k * k)
               + F.when(F.col("is_e"), -dx * d / k).otherwise(0.0))
        fpy = (dy / d2 * (k * k)
               + F.when(F.col("is_e"), -dy * d / k).otherwise(0.0))
        forces = (a.crossJoin(b).where(F.col("i") != F.col("j"))
                  .join(sym, ["i", "j"], "left")
                  .withColumn("is_e", F.coalesce("is_e", F.lit(False)))
                  .groupBy("i")
                  .agg(F.sum(fpx).alias("fx"), F.sum(fpy).alias("fy")))
        mag = F.sqrt(F.col("fx") * F.col("fx")
                     + F.col("fy") * F.col("fy")) + F.lit(1e-12)
        step = F.least(mag, F.lit(temp))
        new = (pos.join(forces, pos[ID] == forces["i"], "left").drop("i")
               .select(ID,
                       (F.col("x") + F.coalesce(F.col("fx") / mag * step,
                                                F.lit(0.0))).alias("x"),
                       (F.col("y") + F.coalesce(F.col("fy") / mag * step,
                                                F.lit(0.0))).alias("y")))
        new = new.persist()
        new.count()
        pos = runner.advance(it, new)
    return pos
