"""Generic eigen interface (igraph_eigen family, src/eigen.c)."""

import math

import pytest

from igraph_spark.graph import Graph
from igraph_spark.functions.eigen import (
    eigen_adjacency, eigen_laplacian, eigen_matrix_symmetric)
from igraph_spark.generators import ring, famous


def _coo(spark, entries):
    return spark.createDataFrame(entries, "i long, j long, x double")


def _dense_eigs(entries, n):
    import numpy as np
    A = np.zeros((n, n))
    for i, j, x in entries:
        A[i, j] = x
    return np.linalg.eigvalsh(A)


FIX = [(0, 0, 2.0), (0, 1, -1.0), (1, 0, -1.0), (1, 1, 2.0),
       (1, 2, -1.0), (2, 1, -1.0), (2, 2, 2.0), (3, 3, -5.0)]


def test_lapack_which_specs(spark):
    import numpy as np
    mat = _coo(spark, FIX)
    full = _dense_eigs(FIX, 4)             # ascending
    vals, _ = eigen_matrix_symmetric(mat, which="all")
    assert np.allclose(vals, full[::-1])
    vals, _ = eigen_matrix_symmetric(mat, which="lm", nev=1)
    assert np.isclose(abs(vals[0]), np.abs(full).max())
    vals, _ = eigen_matrix_symmetric(mat, which="sa", nev=1)
    assert np.isclose(vals[0], full[0])
    vals, _ = eigen_matrix_symmetric(mat, which="la", nev=2)
    assert np.allclose(vals, full[::-1][:2])
    vals, _ = eigen_matrix_symmetric(mat, which="be", nev=2)
    assert np.isclose(vals[0], full[-1]) and np.isclose(vals[1], full[0])
    vals, _ = eigen_matrix_symmetric(mat, which="interval",
                                     vfrom=0.0, vto=3.0)
    assert all(0.0 <= v <= 3.0 for v in vals)
    vals, _ = eigen_matrix_symmetric(mat, which="select", idx=[1])
    assert np.isclose(vals[0], full[::-1][1])


def test_lapack_vectors_satisfy_Av_eq_lv(spark):
    import numpy as np
    mat = _coo(spark, FIX)
    vals, vecs = eigen_matrix_symmetric(mat, which="la", nev=2)
    A = np.zeros((4, 4))
    for i, j, x in FIX:
        A[i, j] = x
    for k in (0, 1):
        v = np.zeros(4)
        for r in vecs.where(f"k = {k}").collect():
            v[r.i] = r.v
        assert np.allclose(A @ v, vals[k] * v, atol=1e-9)


def test_arpack_lm_matches_lapack(spark):
    import numpy as np
    mat = _coo(spark, FIX)
    ref, _ = eigen_matrix_symmetric(mat, which="lm", nev=1)
    got, vecs = eigen_matrix_symmetric(mat, which="lm", nev=1,
                                       algorithm="arpack", max_iter=500)
    assert np.isclose(got[0], ref[0], atol=1e-6)
    assert vecs.count() == 4


def test_arpack_la_uses_gershgorin_shift(spark):
    """FIX's largest-magnitude eigenvalue is -5 but the algebraic max
    is ~3.41 — 'la' must return the latter on the distributed path."""
    import numpy as np
    mat = _coo(spark, FIX)
    full = _dense_eigs(FIX, 4)
    got, _ = eigen_matrix_symmetric(mat, which="la", nev=1,
                                    algorithm="arpack", max_iter=500)
    assert np.isclose(got[0], full[-1], atol=1e-6)


def test_arpack_deflation_two_values(spark):
    import numpy as np
    mat = _coo(spark, FIX)
    full = _dense_eigs(FIX, 4)
    got, _ = eigen_matrix_symmetric(mat, which="la", nev=2,
                                    algorithm="arpack", max_iter=500)
    assert np.allclose(sorted(got, reverse=True), full[::-1][:2],
                       atol=1e-5)


def test_eigen_adjacency_ring(spark):
    """Ring adjacency eigenvalues are 2*cos(2*pi*k/n); max = 2."""
    import numpy as np
    vals, _ = eigen_adjacency(ring(spark, 8), which="la", nev=1)
    assert np.isclose(vals[0], 2.0, atol=1e-9)


def test_eigen_laplacian_smallest_is_zero(spark):
    import numpy as np
    vals, _ = eigen_laplacian(famous(spark, "Zachary"), which="sa", nev=1)
    assert np.isclose(vals[0], 0.0, atol=1e-9)
    # normalized Laplacian spectrum lives in [0, 2]
    vals, _ = eigen_laplacian(famous(spark, "Zachary"), normalized=True,
                              which="all")
    assert all(-1e-9 <= v <= 2.0 + 1e-9 for v in vals)


def test_arpack_rejects_full_spectrum_specs(spark):
    mat = _coo(spark, FIX)
    with pytest.raises(ValueError, match="full spectrum"):
        eigen_matrix_symmetric(mat, which="select", idx=[1],
                               algorithm="arpack")


def _vec(vecs, k, n):
    import numpy as np
    v = np.zeros(n)
    for r in vecs.where(f"k = {k}").collect():
        v[r.i] = r.v
    return v


def _dense(entries, n):
    import numpy as np
    A = np.zeros((n, n))
    for i, j, x in entries:
        A[i, j] = x
    return A


def test_arpack_sa_gershgorin_mirror(spark):
    """'sa' on the distributed path: iterate on A - cI so the
    algebraic minimum is the magnitude maximum."""
    import numpy as np
    mat = _coo(spark, FIX)
    full = _dense_eigs(FIX, 4)
    got, _ = eigen_matrix_symmetric(mat, which="sa", nev=2,
                                    algorithm="arpack", max_iter=500)
    assert np.allclose(got, full[:2], atol=1e-5)


def test_arpack_sm_folded_spectrum(spark):
    """'sm' via folding: FIX's two smallest-magnitude eigenvalues are
    2-sqrt(2) and 2 — NOT spectrum endpoints, unreachable by any
    shift of plain power iteration."""
    import numpy as np
    mat = _coo(spark, FIX)
    full = _dense_eigs(FIX, 4)        # [-5, 0.5858, 2, 3.4142]
    got, vecs = eigen_matrix_symmetric(mat, which="sm", nev=2,
                                       algorithm="arpack", max_iter=800)
    assert np.allclose(got, [full[1], full[2]], atol=1e-5)
    A = _dense(FIX, 4)
    for k in (0, 1):
        v = _vec(vecs, k, 4)
        assert np.isclose(np.linalg.norm(v), 1.0, atol=1e-6)
        assert np.allclose(A @ v, got[k] * v, atol=1e-4)


def test_arpack_sm_degenerate_pair_ritz_split(spark):
    """A +/-3 pair folds to ONE eigenvalue of cI - A^2; the 2x2
    Rayleigh-Ritz step must split the 2-D invariant subspace into
    both true eigenpairs."""
    import numpy as np
    ent = [(0, 1, 3.0), (1, 0, 3.0), (2, 2, 1.0)]
    mat = _coo(spark, ent)
    got, vecs = eigen_matrix_symmetric(mat, which="sm", nev=3,
                                       algorithm="arpack", max_iter=800)
    assert np.isclose(got[0], 1.0, atol=1e-5)
    assert np.isclose(got[1] * got[2], -9.0, atol=1e-3)  # +3 AND -3
    A = _dense(ent, 3)
    for k in range(3):
        v = _vec(vecs, k, 3)
        assert np.allclose(A @ v, got[k] * v, atol=1e-4)


def test_arpack_be_interleaves_both_ends(spark):
    import numpy as np
    mat = _coo(spark, FIX)
    full = _dense_eigs(FIX, 4)
    got, vecs = eigen_matrix_symmetric(mat, which="be", nev=3,
                                       algorithm="arpack", max_iter=500)
    # eigen.c:328 order: largest, smallest, 2nd-largest
    assert np.allclose(got, [full[-1], full[0], full[-2]], atol=1e-5)
    assert vecs.groupBy("k").count().count() == 3


def test_arpack_interval_stops_outward(spark):
    """Folding at the interval midpoint finds values ordered by
    distance from it; the first value OUTSIDE [vfrom, vto] proves the
    enumeration complete."""
    import numpy as np
    mat = _coo(spark, FIX)
    full = _dense_eigs(FIX, 4)
    got, vecs = eigen_matrix_symmetric(
        mat, which="interval", vfrom=0.0, vto=3.0, nev=4,
        algorithm="arpack", max_iter=800)
    # algebraic-descending, exactly the two values in [0, 3]
    assert np.allclose(got, [full[2], full[1]], atol=1e-5)
    A = _dense(FIX, 4)
    for k in (0, 1):
        v = _vec(vecs, k, 4)
        assert np.allclose(A @ v, got[k] * v, atol=1e-4)


def test_arpack_interval_budget_error(spark):
    mat = _coo(spark, FIX)
    with pytest.raises(RuntimeError, match="raise nev"):
        eigen_matrix_symmetric(mat, which="interval", vfrom=-6.0,
                               vto=4.0, nev=2, algorithm="arpack",
                               max_iter=800)
