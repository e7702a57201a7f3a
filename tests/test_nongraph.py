"""convex_hull / running_mean (igraph other.c) — all four reference
igraph_convex_hull.out fixtures exact, prefilter equivalence, brute
running mean."""

import numpy as np
import pytest

from igraph_spark.functions.nongraph import convex_hull, running_mean

SIMPLE = [(3, 2), (5, 1), (4, 4), (6, 4), (4, 3),
          (2, 5), (1, 3), (2, 4), (6, 3), (9, 2)]
COLLINEAR = [(3, 2), (5, 1), (7, 0), (9, -1), (11, -2)]
BUG805 = [(0, 0), (1, 0), (0.707, 0.707), (0, 1), (-0.707, 0.707), (-1, 0),
          (-0.707, -0.707), (0, -1), (0.707, -0.707), (2, 0),
          (1.414, 1.414), (0, 2), (-1.414, 1.414), (-2, 0),
          (-1.414, -1.414), (0, -2), (1.414, -1.414), (3, 0),
          (2.121, 2.121), (0, 3), (-2.121, 2.121), (-3, 0),
          (-2.121, -2.121), (0, -3), (2.121, -2.121), (4, 0),
          (2.828, 2.828), (0, 4), (-2.828, 2.828), (-4, 0),
          (-2.828, -2.828), (0, -4), (2.828, -2.828)]


def _df(spark, pts):
    return spark.createDataFrame(
        [(i, float(px), float(py)) for i, (px, py) in enumerate(pts)],
        "id long, x double, y double")


def _ids(df):
    return [r["id"] for r in df.orderBy("ord").collect()]


@pytest.mark.parametrize("pts,expected", [
    (SIMPLE, [1, 6, 5, 3, 9]),                      # test_simple
    (COLLINEAR, [4, 0]),                            # test_collinear
    ([(3, 2), (5, 1)], [1, 0]),                     # test_degenerate
    ([(3, 2)], [0]),                                # test_degenerate
    (BUG805, [31, 30, 29, 28, 27, 26, 25, 32]),     # test_bug_805
])
def test_convex_hull_reference_fixtures(spark, pts, expected):
    assert _ids(convex_hull(_df(spark, pts))) == expected
    assert _ids(convex_hull(_df(spark, pts), prefilter=False)) == expected


def test_convex_hull_prefilter_equivalent_on_cloud(spark):
    rng = np.random.default_rng(17)
    pts = [(float(a), float(b)) for a, b in rng.normal(size=(500, 2))]
    df = _df(spark, pts).repartition(8)
    with_pf = _ids(convex_hull(df))
    without = _ids(convex_hull(_df(spark, pts), prefilter=False))
    assert with_pf == without
    # sanity: every input point is inside or on the hull polygon
    hull = [pts[i] for i in with_pf]
    for px, py in pts:
        inside = all(
            (bx - ax) * (py - ay) - (px - ax) * (by - ay) <= 1e-9
            for (ax, ay), (bx, by) in zip(hull, hull[1:] + hull[:1]))
        assert inside


def test_running_mean_matches_reference_loop(spark):
    data = [2.0, 5.0, 3.0, 1.0, 8.0, 4.0]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(data)], "pos long, v double")
    for bw in (1, 2, 3, 6):
        got = {r["idx"]: r["mean"]
               for r in running_mean(df, "v", bw, "pos").collect()}
        expect = {i: sum(data[i:i + bw]) / bw
                  for i in range(len(data) - bw + 1)}
        assert got == pytest.approx(expect)


def test_running_mean_too_short(spark):
    df = spark.createDataFrame([(0, 1.0)], "pos long, v double")
    with pytest.raises(ValueError):
        running_mean(df, "v", 5, "pos")


def test_random_sample(spark):
    from igraph_spark.functions.nongraph import random_sample
    vals = [r["value"] for r in
            random_sample(spark, 10, 10009, 100, seed=3)
            .orderBy("value").collect()]
    assert len(vals) == len(set(vals)) == 100
    assert all(10 <= v <= 10009 for v in vals)
    assert vals == sorted(vals)
    # deterministic
    again = [r["value"] for r in
             random_sample(spark, 10, 10009, 100, seed=3)
             .orderBy("value").collect()]
    assert vals == again
    # exhaustive case: sample size == pool size
    full = [r["value"] for r in
            random_sample(spark, 5, 14, 10).orderBy("value").collect()]
    assert full == list(range(5, 15))
    with pytest.raises(ValueError):
        random_sample(spark, 5, 6, 10)
