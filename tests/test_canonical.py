"""Canonical labeling (bliss analog) + distributed WL fingerprint.

Correctness contracts tested:
  * canonical_form is relabeling-invariant (random permutations of the
    same graph yield identical forms) and separates non-isomorphic
    graphs with equal degree sequences;
  * discovered automorphisms generate the full group (closure order ==
    the VF2 automorphism count) on named fixtures with known |Aut|;
  * symmetric graphs (K7, C8, Petersen) complete under the node budget
    (orbit pruning works);
  * wl_fingerprint is isomorphism-invariant and partition-invariant.
"""

import pytest

from igraph_spark.graph import Graph
from igraph_spark.generators import famous
from igraph_spark.algorithms.canonical import (
    canonical_form, canonical_permutation, isomorphic_canonical,
    automorphism_generators, group_order, wl_fingerprint)
from igraph_spark.algorithms.isomorphism import count_automorphisms


def _perm_graph(spark, edges, n, directed, perm):
    return Graph.from_edge_list(
        spark, [(perm[u], perm[v]) for u, v in edges], n=n,
        directed=directed)


PETERSEN = ([(i, (i + 1) % 5) for i in range(5)]          # outer C5
            + [(i, i + 5) for i in range(5)]              # spokes
            + [(5 + i, 5 + (i + 2) % 5) for i in range(5)])  # pentagram


def test_canonical_form_relabeling_invariant(spark):
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (2, 4)]
    g = Graph.from_edge_list(spark, edges, n=5, directed=False)
    base = canonical_form(g)
    # a few deterministic permutations
    for shift in (1, 2, 3):
        perm = [(v * shift + 1) % 5 for v in range(5)]
        if len(set(perm)) < 5:
            continue
        gp = _perm_graph(spark, edges, 5, False, perm)
        assert canonical_form(gp) == base, perm


def test_canonical_separates_same_degree_sequence(spark):
    # C6 vs two triangles: both 2-regular on 6 vertices
    c6 = Graph.from_edge_list(spark, [(i, (i + 1) % 6) for i in range(6)],
                              n=6, directed=False)
    tt = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 0),
                                      (3, 4), (4, 5), (5, 3)],
                              n=6, directed=False)
    assert not isomorphic_canonical(c6, tt)
    assert canonical_form(c6) != canonical_form(tt)


def test_canonical_directed_orientation_matters(spark):
    # directed path vs its reversal composed with a relabeling that
    # preserves degree sequences: P3 ->  0->1->2  vs  0->1<-2
    a = Graph.from_edge_list(spark, [(0, 1), (1, 2)], n=3, directed=True)
    b = Graph.from_edge_list(spark, [(0, 1), (2, 1)], n=3, directed=True)
    assert not isomorphic_canonical(a, b)
    # but reversal relabeled IS isomorphic to the original path
    c = Graph.from_edge_list(spark, [(2, 1), (1, 0)], n=3, directed=True)
    assert isomorphic_canonical(a, c)


def test_canonical_permutation_relabels_to_same_edges(spark):
    g = Graph.from_edge_list(spark, PETERSEN, n=10, directed=False)
    rank = {r.id: r.rank for r in canonical_permutation(g).collect()}
    assert sorted(rank.values()) == list(range(10))
    perm = [(3 * v + 7) % 10 for v in range(10)]
    gp = _perm_graph(spark, PETERSEN, 10, False, perm)
    rank_p = {r.id: r.rank for r in canonical_permutation(gp).collect()}
    canon = sorted((min(rank[u], rank[v]), max(rank[u], rank[v]))
                   for u, v in PETERSEN)
    canon_p = sorted((min(rank_p[perm[u]], rank_p[perm[v]]),
                      max(rank_p[perm[u]], rank_p[perm[v]]))
                     for u, v in PETERSEN)
    assert canon == canon_p


@pytest.mark.parametrize("edges,n,expected_aut", [
    ([(0, 1), (1, 2), (2, 3)], 4, 2),                      # path P4
    ([(i, (i + 1) % 5) for i in range(5)], 5, 10),         # C5 dihedral
    ([(u, v) for u in range(4) for v in range(u + 1, 4)], 4, 24),  # K4
    (PETERSEN, 10, 120),                                   # Petersen
])
def test_automorphism_generators_close_to_full_group(
        spark, edges, n, expected_aut):
    g = Graph.from_edge_list(spark, edges, n=n, directed=False)
    gens = automorphism_generators(g)
    assert group_order(gens, list(range(n))) == expected_aut
    if n <= 10:
        assert count_automorphisms(g) == expected_aut


def test_symmetric_graphs_within_budget(spark):
    # K7: |Aut| = 5040 — naive search is 7! leaves; orbit pruning
    # must keep this tiny
    k7 = [(u, v) for u in range(7) for v in range(u + 1, 7)]
    g = Graph.from_edge_list(spark, k7, n=7, directed=False)
    gens = automorphism_generators(g, max_nodes=5_000)
    assert group_order(gens, list(range(7))) == 5040
    # C8
    c8 = Graph.from_edge_list(spark, [(i, (i + 1) % 8) for i in range(8)],
                              n=8, directed=False)
    assert group_order(automorphism_generators(c8, max_nodes=5_000),
                       list(range(8))) == 16


def test_karate_canonical_roundtrip(spark):
    g = famous(spark, "Zachary")
    base = canonical_form(g)
    edges = [(int(r["src"]), int(r["dst"]))
             for r in g.edges.select("src", "dst").collect()]
    perm = [(11 * v + 5) % 34 for v in range(34)]
    assert len(set(perm)) == 34
    gp = _perm_graph(spark, edges, 34, False, perm)
    assert canonical_form(gp) == base


def test_wl_fingerprint_invariance(spark):
    g = Graph.from_edge_list(spark, PETERSEN, n=10, directed=False)
    perm = [(7 * v + 3) % 10 for v in range(10)]
    gp = _perm_graph(spark, PETERSEN, 10, False, perm)
    assert wl_fingerprint(g) == wl_fingerprint(gp)
    # partition-invariance: same graph, adversarial repartition
    g2 = Graph(g.edges.repartition(13), g.vertices.repartition(7),
               directed=False)
    assert wl_fingerprint(g2) == wl_fingerprint(g)
    # separates C6 from 2xC3 (different WL histograms at round >= 2)
    c6 = Graph.from_edge_list(spark, [(i, (i + 1) % 6) for i in range(6)],
                              n=6, directed=False)
    tt = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 0),
                                      (3, 4), (4, 5), (5, 3)],
                              n=6, directed=False)
    # NOTE: C6 vs 2xC3 are 1-WL-EQUIVALENT (both 2-regular) — the
    # fingerprint must NOT separate them; assert the documented
    # necessary-not-sufficient contract both ways
    assert wl_fingerprint(c6) == wl_fingerprint(tt)
    star = Graph.from_edge_list(spark, [(0, i) for i in range(1, 6)],
                                n=6, directed=False)
    assert wl_fingerprint(star) != wl_fingerprint(c6)


def test_budget_raises_honestly(spark):
    k7 = [(u, v) for u in range(7) for v in range(u + 1, 7)]
    g = Graph.from_edge_list(spark, k7, n=7, directed=False)
    with pytest.raises(ValueError, match="max_nodes"):
        canonical_form(g, max_nodes=3)


def test_isomorphic_canonical_multigraph_consistency(spark):
    """The precheck must agree with what canonical_form compares:
    collapsed simple edges. A raw ecount() gate returned False for a
    multigraph vs its collapsed twin even though their forms (the
    documented contract) are equal."""
    from igraph_spark.algorithms.canonical import (canonical_form,
                                                   isomorphic_canonical)
    g1 = Graph.from_edge_list(spark, [(0, 1), (0, 1), (1, 2)], n=3,
                              directed=False)
    g2 = Graph.from_edge_list(spark, [(0, 1), (1, 2)], n=3,
                              directed=False)
    assert canonical_form(g1) == canonical_form(g2)
    assert isomorphic_canonical(g1, g2)
    # and the precheck still rejects genuinely different graphs fast
    g3 = Graph.from_edge_list(spark, [(0, 1)], n=3, directed=False)
    assert not isomorphic_canonical(g1, g3)
    # loop multiset: looped-vertex COUNT differs -> not isomorphic
    g4 = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 2)], n=3,
                              directed=False)
    assert not isomorphic_canonical(g2, g4)
