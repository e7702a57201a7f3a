"""Dot-product game + latent samplers (reference src/dotproduct.c):
distribution invariants, clamp semantics, partition determinism."""

import math

from pyspark.sql import functions as F

from igraph_spark.generators import (dot_product_game, sample_dirichlet,
                                     sample_sphere_surface,
                                     sample_sphere_volume)


def _norms(df):
    return [math.sqrt(sum(x * x for x in r.vec))
            for r in df.select("vec").collect()]


def test_sphere_surface_norms_and_dim(spark):
    df = sample_sphere_surface(spark, dim=3, n=50, radius=2.0, seed=1)
    assert df.count() == 50
    for nrm in _norms(df):
        assert abs(nrm - 2.0) < 1e-9
    assert all(len(r.vec) == 3 for r in df.collect())


def test_sphere_surface_positive_orthant(spark):
    df = sample_sphere_surface(spark, dim=4, n=30, positive=True, seed=2)
    assert all(x >= 0 for r in df.collect() for x in r.vec)


def test_sphere_volume_inside_and_nonuniform_radius(spark):
    df = sample_sphere_volume(spark, dim=3, n=80, radius=1.5, seed=3)
    ns = _norms(df)
    assert all(n <= 1.5 + 1e-9 for n in ns)
    # with U^(1/3) scaling some samples must be clearly interior
    assert min(ns) < 1.2


def test_dirichlet_simplex(spark):
    df = sample_dirichlet(spark, n=40, alpha=[1.0, 2.0, 0.5], seed=4)
    rows = df.collect()
    assert len(rows) == 40
    for r in rows:
        assert len(r.vec) == 3
        assert all(x > 0 for x in r.vec)
        assert abs(sum(r.vec) - 1.0) < 1e-9


def test_dirichlet_partition_deterministic(spark):
    a = sorted(map(tuple, (r.vec for r in
               sample_dirichlet(spark, 25, [2.0, 2.0], seed=9).collect())))
    b = sorted(map(tuple, (r.vec for r in
               sample_dirichlet(spark, 25, [2.0, 2.0], seed=9)
               .repartition(7).collect())))
    assert a == b


def test_dot_product_game_extremes(spark):
    # vec = [1,0]: <v,v> = 1 for every pair -> complete graph (prob>=1
    # always adds the edge, reference dotproduct.c:92-96)
    n = 12
    ones = spark.range(n).select(
        "id", F.array(F.lit(1.0), F.lit(0.0)).alias("vec"))
    g = dot_product_game(ones, directed=False, seed=5)
    assert g.ecount() == n * (n - 1) // 2
    # orthogonal pattern scaled to zero -> empty graph
    zeros = spark.range(n).select(
        "id", F.array(F.lit(0.0), F.lit(0.0)).alias("vec"))
    assert dot_product_game(zeros, seed=5).ecount() == 0


def test_dot_product_game_negative_never(spark):
    neg = spark.range(10).select(
        "id",
        F.array(F.when(F.col("id") % 2 == 0, 1.0).otherwise(-1.0),
                F.lit(0.0)).alias("vec"))
    # mixed pairs have dot=-1 (never); same-parity pairs dot=1 (always)
    g = dot_product_game(neg, seed=6)
    got = {(r.src, r.dst) for r in g.edges.collect()}
    for (u, v) in got:
        assert (u % 2) == (v % 2)
    assert len(got) == 2 * (5 * 4 // 2)


def test_dot_product_game_probabilistic_mean(spark):
    # all pairs prob 0.5 -> edge count near Binomial(n(n-1)/2, .5) mean
    n = 60
    half = spark.range(n).select(
        "id", F.array(F.lit(math.sqrt(0.5)), F.lit(0.0)).alias("vec"))
    m = dot_product_game(half, seed=7).ecount()
    pairs = n * (n - 1) / 2
    assert abs(m - 0.5 * pairs) < 5 * math.sqrt(pairs * 0.25)


def test_dot_product_game_directed(spark):
    n = 8
    ones = spark.range(n).select(
        "id", F.array(F.lit(1.0)).alias("vec"))
    g = dot_product_game(ones, directed=True, seed=8)
    assert g.directed and g.ecount() == n * (n - 1)
