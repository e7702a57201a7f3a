"""power_law_fit (igraph_power_law_fit / plfit semantics) and the
static fitness / power-law games (games.c:3523,3747)."""

import math

import numpy as np
import pytest

from igraph_spark.functions.powerlaw import (hurwitz_zeta, kolmogorov_p,
                                             power_law_fit)
from igraph_spark.generators import (static_fitness_game,
                                     static_power_law_game)


def _brute_fit_continuous(xs, xmin):
    """Pure-python CSN continuous fit at fixed xmin (plfit formulas)."""
    tail = sorted(x for x in xs if x >= xmin)
    n = len(tail)
    lr = sum(math.log(x / xmin) for x in tail)
    alpha = 1.0 + n / lr
    d = max(abs(1 - (xmin / x) ** (alpha - 1) - m / n)
            for m, x in enumerate(tail))
    return alpha, d, n


def test_hurwitz_zeta_matches_series():
    # dense direct summation + integral tail as the oracle
    for alpha in (1.5, 2.0, 2.5, 3.5):
        for q in (1.0, 2.0, 7.0, 25.0):
            big = 200000
            direct = (sum((q + k) ** -alpha for k in range(big))
                      + (q + big) ** (1 - alpha) / (alpha - 1)
                      + 0.5 * (q + big) ** -alpha)
            got = float(hurwitz_zeta(alpha, np.array([q]))[0])
            assert got == pytest.approx(direct, rel=1e-9)
    # known closed forms
    assert float(hurwitz_zeta(2.0, np.array([1.0]))[0]) == \
        pytest.approx(math.pi ** 2 / 6, rel=1e-11)
    assert float(hurwitz_zeta(2.0, np.array([2.0]))[0]) == \
        pytest.approx(math.pi ** 2 / 6 - 1.0, rel=1e-11)


def test_kolmogorov_p_limits():
    assert kolmogorov_p(1e-6, 100) == 1.0
    assert kolmogorov_p(0.5, 1000) == pytest.approx(0.0, abs=1e-12)
    # one interior reference value computed from the series definition
    z = 1.0
    q = 2 * sum((-1) ** (k - 1) * math.exp(-2 * k * k * z * z)
                for k in range(1, 60))
    assert kolmogorov_p(z / math.sqrt(400), 400) == pytest.approx(q, rel=1e-4)


def test_continuous_fit_fixed_xmin(spark):
    # Pareto(alpha=2.5, xmin=1) samples via inverse transform,
    # deterministic seed; continuous path forced
    rng = np.random.default_rng(7)
    xs = (1.0 / np.power(rng.random(4000), 1.0 / 1.5))  # alpha = 2.5
    df = spark.createDataFrame([(float(x),) for x in xs], "value double")
    res = power_law_fit(df, "value", xmin=1.0, force_continuous=True)
    alpha_b, d_b, n_b = _brute_fit_continuous(xs, 1.0)
    assert res["continuous"] is True
    assert res["n_tail"] == n_b == 4000
    assert res["alpha"] == pytest.approx(alpha_b, rel=1e-9)
    assert res["D"] == pytest.approx(d_b, rel=1e-9)
    assert res["alpha"] == pytest.approx(2.5, abs=0.1)
    assert res["p"] > 0.05  # the data IS power-law


def test_continuous_fit_auto_xmin(spark):
    # power law only above xmin=4: uniform noise below, Pareto above
    rng = np.random.default_rng(11)
    body = rng.uniform(0.5, 4.0, 1500)
    tail = 4.0 / np.power(rng.random(2500), 1.0 / 1.8)  # alpha 2.8
    xs = np.concatenate([body, tail])
    df = spark.createDataFrame([(float(x),) for x in xs], "value double")
    res = power_law_fit(df, "value", force_continuous=True)
    assert 3.0 <= res["xmin"] <= 5.5
    assert res["alpha"] == pytest.approx(2.8, abs=0.25)


def test_finite_size_correction_gates_on_total_n(spark):
    """igraph gates the correction on TOTAL n < 50 (other.c:321), uses
    the tail size in the formula (plfit.c:118), and recomputes L from
    the corrected alpha (plfit.c:258-262)."""
    rng = np.random.default_rng(5)
    # large total sample, small tail above a forced xmin: NO correction
    xs = 1.0 / np.power(rng.random(400), 1.0 / 1.5)
    df = spark.createDataFrame([(float(x),) for x in xs], "value double")
    big_xmin = float(np.sort(xs)[-30])  # tail of 30 < 50, total 400 >= 50
    res = power_law_fit(df, "value", xmin=big_xmin, force_continuous=True)
    assert res["n_tail"] < 50
    alpha_b, _, n_b = _brute_fit_continuous(xs, big_xmin)
    assert res["alpha"] == pytest.approx(alpha_b, rel=1e-9)  # uncorrected

    # small total sample: correction applied, L recomputed post-hoc
    xs2 = 1.0 / np.power(rng.random(30), 1.0 / 1.5)
    df2 = spark.createDataFrame([(float(x),) for x in xs2], "value double")
    res2 = power_law_fit(df2, "value", xmin=1.0, force_continuous=True)
    alpha_raw, _, n2 = _brute_fit_continuous(xs2, 1.0)
    alpha_corr = alpha_raw * (n2 - 1) / n2 + 1.0 / n2
    assert res2["alpha"] == pytest.approx(alpha_corr, rel=1e-9)
    lr = float(np.log(xs2 / 1.0).sum())
    l_corr = n2 * np.log((alpha_corr - 1.0) / 1.0) - alpha_corr * lr
    assert res2["L"] == pytest.approx(l_corr, rel=1e-9)


def test_discrete_fit_zeta_mle(spark):
    # zeta(alpha=2.5) samples via rejection-free inverse CDF on a
    # truncated support, deterministic
    rng = np.random.default_rng(3)
    support = np.arange(1, 2000, dtype=np.float64)
    pmf = support ** -2.5
    pmf /= pmf.sum()
    xs = rng.choice(support, size=5000, p=pmf)
    df = spark.createDataFrame([(int(x),) for x in xs], "value long")
    res = power_law_fit(df, "value", xmin=1)
    assert res["continuous"] is False
    assert res["alpha"] == pytest.approx(2.5, abs=0.1)
    assert res["p"] > 0.01


def test_fit_degree_distribution_of_power_law_game(spark):
    g = static_power_law_game(spark, n=3000, m=9000, exponent_out=2.5,
                              multiple=True, loops=True, seed=5)
    deg = g.degree()
    res = power_law_fit(deg.where("degree > 0"), "degree")
    # expected degree exponent ~2.5; the MLE over the full sweep is
    # noisy on 3k vertices -- assert the ballpark
    assert 1.8 <= res["alpha"] <= 4.0
    assert res["continuous"] is False


def test_static_fitness_game_degree_proportional(spark):
    # expected degree proportional to fitness (games.c doc): give one
    # vertex 10x the fitness of the others and check the ratio
    fit = [1.0] * 200
    fit[0] = 10.0
    g = static_fitness_game(spark, fit, m=4000, multiple=True,
                            loops=True, seed=9)
    assert g.ecount() == 4000
    rows = {r["id"]: r["degree"] for r in g.degree().collect()}
    mean_rest = np.mean([rows.get(i, 0) for i in range(1, 200)])
    assert rows[0] / mean_rest == pytest.approx(10.0, rel=0.35)


def test_static_fitness_game_simple_undirected(spark):
    g = static_fitness_game(spark, [1.0] * 50, m=100, multiple=False,
                            loops=False, seed=4)
    e = g.edges.collect()
    assert len(e) == 100
    pairs = [(r["src"], r["dst"]) for r in e]
    assert len(set(pairs)) == 100          # no multi-edges
    assert all(s < d for s, d in pairs)    # canonical, no loops


def test_static_fitness_game_directed(spark):
    g = static_fitness_game(spark, [1.0] * 40, [1.0] * 40, m=120,
                            multiple=False, loops=False, seed=8)
    assert g.directed
    assert g.ecount() == 120
    assert g.edges.where("src = dst").count() == 0


def test_static_power_law_game_validation(spark):
    with pytest.raises(ValueError):
        static_power_law_game(spark, 10, 5, exponent_out=1.5)
    with pytest.raises(ValueError):
        static_power_law_game(spark, 10, 5, exponent_out=2.5,
                              exponent_in=1.0)


def test_fitness_game_determinism(spark):
    a = static_fitness_game(spark, [1.0, 2.0, 3.0, 4.0], m=6,
                            multiple=False, seed=13)
    b = static_fitness_game(spark, [1.0, 2.0, 3.0, 4.0], m=6,
                            multiple=False, seed=13)
    assert sorted(map(tuple, a.edges.collect())) == \
        sorted(map(tuple, b.edges.collect()))
