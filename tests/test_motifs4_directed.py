"""Directed size-4 motif census (218 isoclasses) — table derivation
invariants, the reference's bit-order convention, and the census vs
brute-force induced enumeration (motifs.c:121 size=4 directed;
igraph_subisomorphic_lad.c:95 fixes n=218)."""

import itertools
import random

import pytest

from igraph_spark.algorithms.motifs import (
    motifs4_directed, motifs4_undirected, _dir4_tables, _DIR4_PAIRS,
    _UND4_CLASSES)
from igraph_spark.graph import Graph


def test_dir4_bit_order_matches_reference():
    # igraph_i_isoclass_4_idx (topology.c:364): edge (1,0) -> 2^0,
    # (0,1) -> 2^3, (2,3) -> 2^11 — column-major, LSB first
    assert _DIR4_PAIRS[0] == (1, 0)
    assert _DIR4_PAIRS[3] == (0, 1)
    assert _DIR4_PAIRS[11] == (2, 3)
    assert len(_DIR4_PAIRS) == 12


def test_dir4_table_invariants():
    code2cls, tau, conn = _dir4_tables()
    assert len(code2cls) == 4096
    assert len(tau) == len(conn) == 218
    assert code2cls[0] == 0          # empty graph is class 0
    assert code2cls[4095] == 217     # complete digraph is the last class
    assert sum(conn) == 199          # weakly connected classes
    # tau of the complete digraph's skeleton (K4) is 16 = Cayley 4^2
    assert tau[217] == 16
    # disconnected classes carry tau 0
    assert all((t == 0) == (not c) for t, c in zip(tau, conn))


def test_dir4_numbering_consistent_with_directed3():
    """The same canonical-min ascending convention must reproduce the
    validated directed size-3 numbering (motifs.c:1062-1078): mutual
    dyad = isoclass 3, mutual path '201' = isoclass 10 (the
    igraph_motifs_randesu.out mutual-ring fixture's only live class)."""
    pairs3 = [(r, c) for c in range(3) for r in range(3) if r != c]
    pos = {p: i for i, p in enumerate(pairs3)}

    def canon3(adj):
        best = None
        for pm in itertools.permutations(range(3)):
            v = 0
            for i, j in adj:
                v |= 1 << pos[(pm[i], pm[j])]
            if best is None or v < best:
                best = v
        return best

    allg = []
    for bits in itertools.product([0, 1], repeat=6):
        adj = frozenset(p for p, b in zip(pairs3, bits) if b)
        allg.append(canon3(adj))
    classes = sorted(set(allg))
    assert len(classes) == 16
    idx = {c: i for i, c in enumerate(classes)}
    # mutual dyad (0<->1, 2 isolated) = isoclass 3
    assert idx[canon3({(0, 1), (1, 0)})] == 3
    # mutual path 0<->1<->2 ('201') = isoclass 10
    assert idx[canon3({(0, 1), (1, 0), (1, 2), (2, 1)})] == 10
    # cyclic triple '030C' = isoclass 11, transitive '030T' = 7
    assert idx[canon3({(0, 1), (1, 2), (2, 0)})] == 11
    assert idx[canon3({(0, 1), (1, 2), (0, 2)})] == 7


def _brute(n, edges):
    code2cls, tau, conn = _dir4_tables()
    es = set(edges)
    out = [0] * 218
    for quad in itertools.combinations(range(n), 4):
        code = 0
        for k, (r, c) in enumerate(_DIR4_PAIRS):
            if (quad[r], quad[c]) in es:
                code |= 1 << k
        out[code2cls[code]] += 1
    return out


@pytest.mark.parametrize("seed,n,prob", [(1, 11, 0.18), (4, 8, 0.6)])
def test_census_matches_brute_force(spark, seed, n, prob):
    rng = random.Random(seed)
    edges = [(i, j) for i in range(n) for j in range(n)
             if i != j and rng.random() < prob]
    g = Graph(spark.createDataFrame(edges, "src long, dst long"),
              directed=True)
    got = {int(r["isoclass"]): r["count"]
           for r in motifs4_directed(g).collect()}
    brute = _brute(n, edges)
    _, _, conn = _dir4_tables()
    for cls in range(218):
        expect = brute[cls] if conn[cls] else None
        assert got[cls] == expect, f"class {cls}"


def test_mutual_symmetrization_matches_undirected_census(spark):
    """Symmetrizing an undirected graph into mutual arcs must land
    every 4-set in the all-mutual directed class of its undirected
    isoclass, with identical counts."""
    code2cls, _, _ = _dir4_tables()
    pos = {p: i for i, p in enumerate(_DIR4_PAIRS)}
    reps = {"claw": [(0, 1), (0, 2), (0, 3)],
            "P4": [(0, 1), (1, 2), (2, 3)],
            "paw": [(0, 1), (1, 2), (0, 2), (2, 3)],
            "C4": [(0, 1), (1, 2), (2, 3), (0, 3)],
            "diamond": [(0, 1), (1, 2), (0, 2), (1, 3), (2, 3)],
            "K4": [(i, j) for i, j in itertools.combinations(range(4), 2)]}
    dir_of = {}
    for name, es in reps.items():
        code = 0
        for i, j in es:
            code |= 1 << pos[(i, j)]
            code |= 1 << pos[(j, i)]
        dir_of[_UND4_CLASSES[name]] = code2cls[code]

    rng = random.Random(7)
    und = [(i, j) for i, j in itertools.combinations(range(10), 2)
           if rng.random() < 0.35]
    gu = Graph(spark.createDataFrame(und, "src long, dst long"),
               directed=False)
    both = und + [(j, i) for i, j in und]
    gd = Graph(spark.createDataFrame(both, "src long, dst long"),
               directed=True)
    u_counts = {int(r["isoclass"]): r["count"]
                for r in motifs4_undirected(gu).collect()
                if r["count"] is not None}
    d_counts = {int(r["isoclass"]): r["count"]
                for r in motifs4_directed(gd).collect()}
    for ucls, dcls in dir_of.items():
        assert d_counts[dcls] == u_counts[ucls], (ucls, dcls)
    # and everything else is zero on the directed side
    live = set(dir_of.values())
    assert all(v in (0, None) for k, v in d_counts.items()
               if k not in live)
