"""Non-graph utilities: convex hull, running mean, random sample.

Reference: igraph_convex_hull (/root/reference/src/other.c:121, Graham
scan, CLRS §33.3), igraph_running_mean (other.c:57), and
igraph_random_sample (random.c:1015).

Hull output order replicates the reference exactly (verified against
all four examples/simple/igraph_convex_hull.out fixtures): start at
the pivot (lowest y, then lowest x), then walk the remaining points in
DECREASING atan2 angle around the pivot — i.e. clockwise — keeping
only right turns (cross product < 0; collinear points are dropped,
the farthest of an equal-angle run survives).

Scale shape: the hull of a union is the hull of the per-part hulls, so
a mapInPandas pass reduces each partition to its own (numpy monotone
chain) hull first — 100 TB of points compact to O(parts * hull-size)
candidates — and only those candidates reach the driver's
reference-convention scan.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["convex_hull", "running_mean", "random_sample"]


def _graham_scan_reference(pts: np.ndarray) -> list[int]:
    """Reference-convention Graham scan -> stack of row indices
    (other.c:151-218).  Pop order: pivot first (sentinel angle 10),
    then angle descending; equal angles near-to-far so the farthest
    collinear point is pushed last and survives the pop loop."""
    n = len(pts)
    if n == 0:
        return []
    piv = 0
    for i in range(1, n):
        if (pts[i][1], pts[i][0]) < (pts[piv][1], pts[piv][0]):
            piv = i
    px, py = float(pts[piv][0]), float(pts[piv][1])

    def key(i: int):
        if i == piv:
            return (-10.0, 0.0, i)
        a = math.atan2(pts[i][1] - py, pts[i][0] - px)
        d = (pts[i][0] - px) ** 2 + (pts[i][1] - py) ** 2
        return (-a, d, i)

    order = sorted(range(n), key=key)
    stack: list[int] = []
    last = bl = -1
    k = 0
    while k < len(order):
        nxt = order[k]
        if len(stack) < 2:
            cp = -1.0
        else:
            cp = ((pts[last][0] - pts[bl][0]) * (pts[nxt][1] - pts[bl][1])
                  - (pts[nxt][0] - pts[bl][0]) * (pts[last][1] - pts[bl][1]))
        if cp < 0:
            k += 1
            stack.append(nxt)
            bl, last = last, nxt
        else:
            stack.pop()
            last = bl
            bl = stack[-2] if len(stack) >= 2 else -1
    return stack


def _monotone_chain_mask(xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Boolean mask of the rows on the convex hull (corners only) —
    Andrew's monotone chain, vectorized sort + O(n) stack walk."""
    n = len(xs)
    if n <= 2:
        return np.ones(n, dtype=bool)
    order = np.lexsort((ys, xs))

    def half(indices):
        hull = []
        for i in indices:
            while len(hull) >= 2:
                ox, oy = xs[hull[-2]], ys[hull[-2]]
                ax, ay = xs[hull[-1]], ys[hull[-1]]
                if (ax - ox) * (ys[i] - oy) - (xs[i] - ox) * (ay - oy) <= 0:
                    hull.pop()
                else:
                    break
            hull.append(i)
        return hull

    keep = np.zeros(n, dtype=bool)
    keep[half(order)] = True
    keep[half(order[::-1])] = True
    return keep


def convex_hull(points: DataFrame, id_col: str = "id", x: str = "x",
                y: str = "y", prefilter: bool = True) -> DataFrame:
    """igraph_convex_hull analog over DataFrame(id, x, y) ->
    DataFrame(ord, id, x, y): the hull corners in the reference's
    clockwise-from-pivot order, ``ord`` = 0-based position (the
    reference's resverts rank; ids play the role of row indices).

    ``prefilter`` runs the distributed per-partition hull reduction
    before the driver-side reference-convention scan (exact — the
    global hull is a subset of the union of partition hulls); disable
    only for tiny inputs/tests.
    """
    pts = points.select(F.col(id_col).alias("id"),
                        F.col(x).cast("double").alias("x"),
                        F.col(y).cast("double").alias("y"))
    if prefilter:
        def _part_hull(batches: Iterator[pd.DataFrame]
                       ) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                mask = _monotone_chain_mask(
                    pdf["x"].to_numpy(np.float64),
                    pdf["y"].to_numpy(np.float64))
                yield pdf[mask]
        pts = pts.mapInPandas(_part_hull, schema="id long, x double, y double")
    cand = pts.toPandas().sort_values("id").reset_index(drop=True)
    coords = cand[["x", "y"]].to_numpy(np.float64)
    hull = _graham_scan_reference(coords)
    spark = points.sparkSession
    rows = [(o, int(cand["id"][i]), float(cand["x"][i]), float(cand["y"][i]))
            for o, i in enumerate(hull)]
    return spark.createDataFrame(rows if rows else [],
                                 "ord long, id long, x double, y double")


def running_mean(data: DataFrame, col: str, binwidth: int,
                 order_col: str) -> DataFrame:
    """igraph_running_mean (other.c:57): mean of each ``binwidth``-wide
    sliding window over the sequence ordered by ``order_col`` ->
    DataFrame(idx, mean), idx 0-based like the reference's result
    vector (length n - binwidth + 1).

    A total-order sliding window is inherently sequential output (the
    reference's O(n) loop); the Spark plan is one window pass — for
    at-scale use, key the frame by a partition column first."""
    if binwidth < 1:
        raise ValueError("binwidth must be >= 1")
    w = Window.orderBy(order_col)
    out = (data.select(
        (F.row_number().over(w) - binwidth).alias("idx"),
        F.avg(F.col(col)).over(
            w.rowsBetween(-(binwidth - 1), 0)).alias("mean"))
        .where(F.col("idx") >= 0))
    if data.count() < binwidth:
        raise ValueError("vector too short for this binwidth")
    return out


def random_sample(spark, l: int, h: int, length: int,
                  seed: int = 42) -> DataFrame:
    """igraph_random_sample (random.c:1015, Vitter 1987): ``length``
    distinct integers drawn uniformly from [l, h] -> DataFrame(value),
    increasing under ``orderBy("value")``.

    Vitter's sequential skip-sampling is O(length) regardless of the
    interval size; the distributed deterministic analog draws hashed
    candidates per slot (O(length) work, any parallelism), dedups, and
    keeps ``length`` survivors by hash priority — exchangeability of
    the priorities makes the kept subset uniform without replacement.
    """
    n_pool = h - l + 1
    if l > h:
        raise ValueError("lower limit greater than upper limit")
    if length > n_pool:
        raise ValueError("sample size exceeds candidate pool")
    over = int(length * 1.25) + 16
    for _attempt in range(12):
        cand = (spark.range(over)
                .select((F.pmod(F.xxhash64("id", F.lit(seed), F.lit(3)),
                                F.lit(n_pool)) + F.lit(l)).alias("value"))
                .distinct())
        if cand.count() >= length:
            return (cand
                    .orderBy(F.xxhash64("value", F.lit(seed), F.lit(5)),
                             "value")
                    .limit(length)
                    .select("value"))
        over *= 2
    raise ValueError(f"random_sample: undersampled after {over} draws")
