"""Spectral coarse graining (reference src/scg*.c): grouping methods
vs brute force, semi-projector identities, coarse-matrix invariants."""

import itertools
import math

import pytest
from pyspark.sql import functions as F

from igraph_spark.graph import Graph
from igraph_spark.algorithms.scg import (scg_adjacency, scg_grouping,
                                         scg_laplacian,
                                         scg_semiprojectors,
                                         scg_stochastic)


def _vdf(spark, vals, name="e0"):
    return spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], f"id long, {name} double")


def _brute_optimum(vals, nt):
    """min sum of within-group squared deviations over contiguous
    partitions of the sorted values."""
    vs = sorted(vals)
    n = len(vs)
    best = math.inf

    def cost(seg):
        m = sum(seg) / len(seg)
        return sum((x - m) ** 2 for x in seg)

    for cuts in itertools.combinations(range(1, n), nt - 1):
        bounds = [0, *cuts, n]
        c = sum(cost(vs[bounds[i]:bounds[i + 1]]) for i in range(nt))
        best = min(best, c)
    return best


def _group_cost(vals, groups):
    by = {}
    for v, g in zip(vals, groups):
        by.setdefault(g, []).append(v)
    return sum(sum((x - sum(seg) / len(seg)) ** 2 for x in seg)
               for seg in by.values() for _ in [0])


def test_optimum_matches_brute_force(spark):
    vals = [0.1, 0.15, 0.5, 0.52, 0.9, 1.4, 1.45, 2.0]
    V = _vdf(spark, vals)
    for nt in (2, 3, 4):
        out = {r.id: r.group for r in
               scg_grouping(V, nt=nt, algo="optimum").collect()}
        groups = [out[i] for i in range(len(vals))]
        assert len(set(groups)) == nt
        assert abs(_group_cost(vals, groups)
                   - _brute_optimum(vals, nt)) < 1e-12


def test_optimum_groups_contiguous_in_value_order(spark):
    vals = [3.0, 1.0, 2.0, 0.0]
    out = {r.id: r.group for r in
           scg_grouping(_vdf(spark, vals), nt=2, algo="optimum").collect()}
    # sorted values 0,1,2,3 -> the split must separate {0,1} from {2,3}
    assert out[3] == out[1] and out[2] == out[0] and out[3] != out[0]


def test_exact_groups_equal_components(spark):
    vals = [0.5, 0.25, 0.5, 0.25, 1.0]
    out = {r.id: r.group for r in
           scg_grouping(_vdf(spark, vals), algo="exact").collect()}
    assert out[0] == out[2] and out[1] == out[3]
    assert len({out[0], out[1], out[4]}) == 3


def test_interv_bins_monotone(spark):
    vals = [0.0, 0.1, 0.45, 0.55, 0.9, 1.0]
    out = {r.id: r.group for r in
           scg_grouping(_vdf(spark, vals), nt=2, algo="interv").collect()}
    assert out[0] == out[1] == out[2]
    assert out[3] == out[4] == out[5]
    assert out[0] != out[5]


def test_interv_km_separates_clusters(spark):
    vals = [0.0, 0.01, 0.02, 5.0, 5.01, 5.02]
    out = {r.id: r.group for r in
           scg_grouping(_vdf(spark, vals), nt=2, algo="interv_km",
                        maxiter=20).collect()}
    assert out[0] == out[1] == out[2]
    assert out[3] == out[4] == out[5]
    assert out[0] != out[3]


def test_multi_eigenvector_intersection(spark):
    a = _vdf(spark, [0.0, 0.0, 1.0, 1.0], "e0")
    b = _vdf(spark, [0.0, 1.0, 0.0, 1.0], "e1")
    V = a.join(b, "id")
    out = {r.id: r.group for r in scg_grouping(V, algo="exact").collect()}
    assert len(set(out.values())) == 4


def test_symmetric_semiprojector_identity(spark):
    groups = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 1), (4, 1)], "id long, group long")
    L, R = scg_semiprojectors(groups, "symmetric")
    # L R^T = identity on groups
    lr = (L.select(F.col("group").alias("ga"), "id",
                   F.col("value").alias("lv"))
          .join(R.select(F.col("group").alias("gb"), "id",
                         F.col("value").alias("rv")), "id")
          .groupBy("ga", "gb").agg(F.sum(F.col("lv") * F.col("rv"))
                                   .alias("x")).collect())
    for r in lr:
        expect = 1.0 if r.ga == r.gb else 0.0
        assert abs(r.x - expect) < 1e-12


def _two_triangles(spark):
    rows = [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5)]
    e = spark.createDataFrame(rows, "src long, dst long")
    return Graph(e, spark.range(6), directed=False)


def test_scg_adjacency_two_triangles(spark):
    g = _two_triangles(spark)
    groups = spark.createDataFrame(
        [(i, 0 if i < 3 else 1) for i in range(6)], "id long, group long")
    _, coarse = scg_adjacency(g, groups=groups)
    vals = {(r.src, r.dst): r.weight for r in coarse.collect()}
    # within-group: sum_{i,j in a} A_ij / |a| = 6/3 = 2; across: 0
    assert abs(vals[(0, 0)] - 2.0) < 1e-12
    assert abs(vals[(1, 1)] - 2.0) < 1e-12
    assert (0, 1) not in vals or abs(vals[(0, 1)]) < 1e-12


def test_scg_laplacian_rows_sum_zero(spark):
    g = _two_triangles(spark)
    groups = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 1), (4, 2), (5, 2)],
        "id long, group long")
    _, coarse = scg_laplacian(g, groups=groups)
    sums = coarse.groupBy("src").agg(F.sum("weight").alias("s")).collect()
    for r in sums:
        assert abs(r.s) < 1e-12


def test_scg_stochastic_rows_sum_one(spark):
    g = _two_triangles(spark)
    groups = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 1), (4, 2), (5, 2)],
        "id long, group long")
    _, coarse = scg_stochastic(g, groups=groups)
    sums = coarse.groupBy("src").agg(F.sum("weight").alias("s")).collect()
    assert len(sums) == 3
    for r in sums:
        assert abs(r.s - 1.0) < 1e-12


def test_scg_adjacency_from_spectrum(spark):
    # two disconnected triangles: the leading eigenvector grouping
    # must coarse-grain to >= 1 group per component without error
    g = _two_triangles(spark)
    groups, coarse = scg_adjacency(g, no=2, nt=2, algo="exact")
    assert groups.count() == 6
    assert coarse.count() >= 1


def test_optimum_rejects_too_many_groups(spark):
    V = _vdf(spark, [1.0, 1.0, 2.0])
    with pytest.raises(ValueError, match="unique"):
        scg_grouping(V, nt=2, algo="optimum")
