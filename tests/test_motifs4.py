"""Size-4 undirected motif census (ESCAPE-style closed forms) vs
brute-force induced enumeration, + RAND-ESU cut-probability sampling
estimator (motifs.c:121 analogs)."""

import collections
import itertools

import pytest

from igraph_spark.algorithms.motifs import (
    motifs4_undirected, motifs_randesu, motifs_randesu_sampled,
    _UND4_CLASSES, _UND4_DISCONNECTED)
from igraph_spark.generators import famous
from igraph_spark.graph import Graph


def brute4(n, edges):
    E = set(frozenset(e) for e in edges)
    cnt = collections.Counter()
    for S in itertools.combinations(range(n), 4):
        es = [frozenset((a, b)) for a, b in itertools.combinations(S, 2)
              if frozenset((a, b)) in E]
        k = len(es)
        par = {v: v for v in S}

        def find(x):
            while par[x] != x:
                par[x] = par[par[x]]
                x = par[x]
            return x
        for e in es:
            a, b = tuple(e)
            ra, rb = find(a), find(b)
            if ra != rb:
                par[ra] = rb
        if len({find(v) for v in S}) > 1:
            continue
        degs = sorted(collections.Counter(
            itertools.chain.from_iterable(es)).values())
        if k == 3 and degs == [1, 1, 1, 3]:
            cnt["claw"] += 1
        elif k == 3:
            cnt["P4"] += 1
        elif k == 4 and degs == [1, 2, 2, 3]:
            cnt["paw"] += 1
        elif k == 4:
            cnt["C4"] += 1
        elif k == 5:
            cnt["diamond"] += 1
        elif k == 6:
            cnt["K4"] += 1
    return cnt


BULL = (5, [(0, 1), (0, 2), (1, 2), (1, 3), (2, 4)])
PETERSEN = (10, [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (0, 5), (1, 6),
                 (2, 7), (3, 8), (4, 9), (5, 7), (7, 9), (9, 6), (6, 8),
                 (8, 5)])


@pytest.mark.parametrize("name,fix", [
    ("bull", BULL), ("petersen", PETERSEN),
    ("k4", (4, [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)])),
    ("c4", (4, [(0, 1), (1, 2), (2, 3), (3, 0)])),
])
def test_motifs4_vs_bruteforce(spark, name, fix):
    n, edges = fix
    g = Graph.from_edge_list(spark, edges, n=n, directed=False)
    got = {r["isoclass"]: r["count"]
           for r in motifs4_undirected(g).collect()}
    want = brute4(n, edges)
    for cname, j in _UND4_CLASSES.items():
        assert got[j] == want.get(cname, 0), (name, cname)
    for j in _UND4_DISCONNECTED:
        assert got[j] is None


def test_motifs4_bull_matches_reference_callback(spark):
    # reference fixture igraph_motifs_randesu.out: bull has two class-7
    # (paw) and one class-6 (P4) connected 4-subgraphs
    g = Graph.from_edge_list(spark, BULL[1], n=5, directed=False)
    got = {r["isoclass"]: r["count"]
           for r in motifs4_undirected(g).collect()}
    assert got[7] == 2 and got[6] == 1
    assert sum(v for j, v in got.items() if v is not None) == 3


def test_motifs4_karate(spark):
    k = famous(spark, "Zachary")
    got = {r["isoclass"]: r["count"]
           for r in motifs4_undirected(k).collect()}
    want = brute4(34, [(r.src, r.dst) for r in k.edges.collect()])
    for cname, j in _UND4_CLASSES.items():
        assert got[j] == want.get(cname, 0), cname


def test_sampled_census_exact_at_zero_cut(spark):
    k = famous(spark, "Zachary")
    exact = {r["isoclass"]: r["count"]
             for r in motifs_randesu(k, 3).collect()}
    s = {r["isoclass"]: r["count"]
         for r in motifs_randesu_sampled(k, 3, [0.0, 0.0, 0.0]).collect()}
    assert s[2] == float(exact[2]) and s[3] == float(exact[3])


def test_sampled_census_estimates_and_determinism(spark):
    k = famous(spark, "Zachary")
    exact = {r["isoclass"]: r["count"]
             for r in motifs_randesu(k, 3).collect()}
    cp = [0.0, 0.0, 0.5]
    s1 = {r["isoclass"]: r["count"]
          for r in motifs_randesu_sampled(k, 3, cp, seed=9).collect()}
    s2 = {r["isoclass"]: r["count"]
          for r in motifs_randesu_sampled(k, 3, cp, seed=9).collect()}
    assert s1 == s2  # deterministic
    # unbiased estimator, tolerance ~4 sigma at q=0.5 on karate sizes
    assert abs(s1[2] - exact[2]) < 0.35 * exact[2]
    assert abs(s1[3] - exact[3]) < 0.6 * exact[3]
    # triangle estimate is exactly divisible by the shared-coin design
    assert (s1[3] * 0.5 * 3) % 1 == pytest.approx(0, abs=1e-9)
