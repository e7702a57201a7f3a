"""compare_communities (community.c:3071-3500) — identity axioms plus
hand-computed contingency checks."""

import math

import pytest

from igraph_spark.algorithms.community_metrics import compare_communities


def _mem(spark, labels):
    return spark.createDataFrame(list(enumerate(labels)), "id long, label long")


def test_identical_partitions(spark):
    m = _mem(spark, [0, 0, 1, 1, 2, 2])
    assert compare_communities(m, m, "nmi") == pytest.approx(1.0)
    assert compare_communities(m, m, "vi") == pytest.approx(0.0, abs=1e-12)
    assert compare_communities(m, m, "rand") == pytest.approx(1.0)
    assert compare_communities(m, m, "adjusted_rand") == pytest.approx(1.0)
    assert compare_communities(m, m, "split_join") == 0.0


def test_label_renaming_invariant(spark):
    m1 = _mem(spark, [0, 0, 1, 1, 2, 2])
    m2 = _mem(spark, [5, 5, 9, 9, 7, 7])  # same partition, new names
    assert compare_communities(m1, m2, "nmi") == pytest.approx(1.0)
    assert compare_communities(m1, m2, "split_join") == 0.0


def test_hand_computed_nmi_and_rand(spark):
    # partition X: {0,1,2}{3,4,5}; partition Y: {0,1}{2,3}{4,5}
    m1 = _mem(spark, [0, 0, 0, 1, 1, 1])
    m2 = _mem(spark, [0, 0, 1, 1, 2, 2])
    n = 6
    cont = {(0, 0): 2, (0, 1): 1, (1, 1): 1, (1, 2): 2}
    ai = {0: 3, 1: 3}
    bj = {0: 2, 1: 2, 2: 2}
    h1 = -sum(c / n * math.log(c / n) for c in ai.values())
    h2 = -sum(c / n * math.log(c / n) for c in bj.values())
    mi = sum(c / n * math.log(c * n / (ai[i] * bj[j]))
             for (i, j), c in cont.items())
    assert compare_communities(m1, m2, "nmi") == \
        pytest.approx(2 * mi / (h1 + h2))
    assert compare_communities(m1, m2, "vi") == \
        pytest.approx(h1 + h2 - 2 * mi)
    sum_ij = sum(c * (c - 1) / 2 for c in cont.values())
    sum_a = sum(c * (c - 1) / 2 for c in ai.values())
    sum_b = sum(c * (c - 1) / 2 for c in bj.values())
    total = n * (n - 1) / 2
    assert compare_communities(m1, m2, "rand") == \
        pytest.approx((total + 2 * sum_ij - sum_a - sum_b) / total)
    exp = sum_a * sum_b / total
    assert compare_communities(m1, m2, "adjusted_rand") == \
        pytest.approx((sum_ij - exp) / (0.5 * (sum_a + sum_b) - exp))
    # split-join: 2*6 - (2+2) - (2+1+2)
    assert compare_communities(m1, m2, "split_join") == 12 - 4 - 5


def test_single_block_partitions(spark):
    m1 = _mem(spark, [0, 0, 0, 0])
    m2 = _mem(spark, [7, 7, 7, 7])
    assert compare_communities(m1, m2, "nmi") == 1.0  # zero-entropy case
    assert compare_communities(m1, m2, "rand") == 1.0
