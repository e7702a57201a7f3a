"""LSAP Hungarian solver (reference src/lsap.c) vs brute-force
permutation minimum, including negative costs and random matrices."""

import itertools
import random

import pytest

from igraph_spark.algorithms.lsap import _hungarian, solve_lsap


def _brute(a):
    n = len(a)
    return min(sum(a[i][p[i]] for i in range(n))
               for p in itertools.permutations(range(n)))


def _cost(a, ans):
    return sum(a[i][c] for i, c in enumerate(ans))


def test_known_small():
    import numpy as np
    a = np.array([[4.0, 1.0, 3.0], [2.0, 0.0, 5.0], [3.0, 2.0, 2.0]])
    ans = _hungarian(a)
    assert sorted(ans) == [0, 1, 2]
    assert _cost(a, ans) == _brute(a.tolist()) == 5.0


def test_random_matrices_match_brute_force():
    import numpy as np
    rnd = random.Random(7)
    for n in (2, 3, 4, 5, 6):
        for _ in range(8):
            a = np.array([[rnd.uniform(-5, 5) for _ in range(n)]
                          for _ in range(n)])
            ans = _hungarian(a)
            assert sorted(ans) == list(range(n))
            assert abs(_cost(a, ans) - _brute(a.tolist())) < 1e-9


def test_solve_lsap_dataframe(spark):
    rows = [(0, 0, 4.0), (0, 1, 1.0), (0, 2, 3.0),
            (1, 0, 2.0), (1, 1, 0.0), (1, 2, 5.0),
            (2, 0, 3.0), (2, 1, 2.0), (2, 2, 2.0)]
    costs = spark.createDataFrame(rows, "row long, col long, cost double")
    out = {r.row: r.col for r in solve_lsap(costs).collect()}
    assert sorted(out.values()) == [0, 1, 2]
    total = sum(dict(((r, c), v) for r, c, v in rows)[(i, out[i])]
                for i in range(3))
    assert total == 5.0


def test_solve_lsap_sparse_fill(spark):
    # only the diagonal is cheap; off-diagonal entries default to fill
    rows = [(i, i, -1.0) for i in range(4)]
    costs = spark.createDataFrame(rows, "row long, col long, cost double")
    out = {r.row: r.col for r in solve_lsap(costs, n=4, fill=10.0).collect()}
    assert out == {0: 0, 1: 1, 2: 2, 3: 3}


def test_driver_gate(spark):
    costs = spark.createDataFrame([(0, 0, 1.0)],
                                  "row long, col long, cost double")
    with pytest.raises(ValueError, match="dense"):
        solve_lsap(costs, n=10, max_driver_n=5)
