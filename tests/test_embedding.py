"""ASE / LSE spectral embeddings (embedding.c analog): driver path
vs a numpy oracle, distributed subspace iteration vs the driver path,
and the Laplacian-type relationships."""

import math

import numpy as np
import pytest

from igraph_spark.algorithms.embedding import (
    adjacency_spectral_embedding,
    laplacian_spectral_embedding,
)
from igraph_spark.generators import famous
from igraph_spark.graph import Graph


def _karate_np(spark):
    g = famous(spark, "Zachary")
    edges = [(int(r["src"]), int(r["dst"]))
             for r in g.edges.select("src", "dst").collect()]
    n = 34
    A = np.zeros((n, n))
    for u, v in edges:
        A[u, v] += 1
        A[v, u] += 1
    return g, A


def _mat(df, no):
    rows = sorted(df.collect(), key=lambda r: r["id"])
    return np.array([[r[f"e{d}"] for d in range(no)] for r in rows])


def test_ase_driver_matches_numpy(spark):
    g, A = _karate_np(spark)
    deg = A.sum(axis=1)
    M = A + np.diag(deg / 33.0)
    vals_np, vecs_np = np.linalg.eigh(M)
    order = np.argsort(-np.abs(vals_np))[:3]
    vals, X = adjacency_spectral_embedding(g, 3, scaled=False)
    assert np.allclose(sorted(vals), sorted(vals_np[order]), atol=1e-9)
    Xm = _mat(X, 3)
    for c in range(3):
        ref = vecs_np[:, order[c]]
        assert abs(abs(Xm[:, c] @ ref) - 1.0) < 1e-9


def test_ase_scaled_and_orthonormal(spark):
    g, _ = _karate_np(spark)
    vals, X = adjacency_spectral_embedding(g, 2, scaled=False)
    Xm = _mat(X, 2)
    assert np.allclose(Xm.T @ Xm, np.eye(2), atol=1e-9)
    vals2, Xs = adjacency_spectral_embedding(g, 2, scaled=True)
    Xsm = _mat(Xs, 2)
    assert np.allclose(Xsm, Xm * np.sqrt(np.abs(vals))[None, :],
                       atol=1e-9)


def test_distributed_matches_driver(spark):
    g, _ = _karate_np(spark)
    vals_d, Xd = adjacency_spectral_embedding(g, 2, scaled=False)
    vals_s, Xs = adjacency_spectral_embedding(
        g, 2, scaled=False, vertex_threshold=0, max_iter=40)
    assert np.allclose(vals_d, vals_s, rtol=1e-3)
    A, B = _mat(Xd, 2), _mat(Xs, 2)
    for c in range(2):
        cos = abs(A[:, c] @ B[:, c]) / (
            np.linalg.norm(A[:, c]) * np.linalg.norm(B[:, c]))
        assert cos > 0.995


def test_lse_dad_top_eigenvalue_is_one(spark):
    # normalized adjacency of a connected non-bipartite graph has
    # lambda_max == 1 with the sqrt-degree eigenvector
    g, A = _karate_np(spark)
    vals, X = laplacian_spectral_embedding(g, 1, type="dad",
                                           which="la", scaled=False)
    assert math.isclose(vals[0], 1.0, abs_tol=1e-9)
    deg = A.sum(axis=1)
    ref = np.sqrt(deg) / np.linalg.norm(np.sqrt(deg))
    Xm = _mat(X, 1)[:, 0]
    assert abs(abs(Xm @ ref) - 1.0) < 1e-9


def test_lse_d_a_nullvector_per_component(spark):
    # D - A: smallest eigenvalue 0, eigenvector constant on components
    e = [(0, 1), (1, 2), (3, 4)]
    g = Graph(spark.createDataFrame(e, "src long, dst long"),
              vertices=spark.range(5).toDF("id"), directed=False)
    vals, X = laplacian_spectral_embedding(g, 2, type="d_a",
                                           which="sa", scaled=False)
    assert np.allclose(vals, [0.0, 0.0], atol=1e-9)
    Xm = _mat(X, 2)
    # each column lies in the span of the two component indicators
    for c in range(2):
        col = Xm[:, c]
        assert np.std(col[:3]) < 1e-9 and np.std(col[3:]) < 1e-9


def test_lse_i_dad_complements_dad(spark):
    g, _ = _karate_np(spark)
    v_dad, _X1 = laplacian_spectral_embedding(g, 3, type="dad",
                                              which="la", scaled=False)
    v_idad, _X2 = laplacian_spectral_embedding(g, 3, type="i_dad",
                                               which="sa", scaled=False)
    assert np.allclose(sorted(1.0 - np.array(v_dad)), sorted(v_idad),
                       atol=1e-9)


def test_weighted_ase(spark):
    e = [(0, 1, 2.0), (1, 2, 2.0), (2, 0, 2.0)]
    g = Graph(spark.createDataFrame(e, "src long, dst long, weight double"),
              directed=False)
    zero = spark.createDataFrame([(i, 0.0) for i in range(3)],
                                 "id long, c double")
    vals, X = adjacency_spectral_embedding(g, 1, cvec=zero, scaled=False)
    # 2 * K3: top eigenvalue 4 with the constant eigenvector
    assert math.isclose(vals[0], 4.0, abs_tol=1e-9)
