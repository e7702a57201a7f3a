"""LAD subgraph isomorphism (lad.c analog): parity with the VF2-analog
counts, brute-force oracles for domains/induced/isolated vertices, and
the motif identity from the reference's own example
(examples/simple/igraph_subisomorphic_lad.c: sum over the 3-vertex
directed isoclasses of induced LAD maps / automorphisms = C(n,3))."""

import itertools
import random

from igraph_spark.graph import Graph
from igraph_spark.generators import famous, gnm
from igraph_spark.algorithms.isomorphism import count_subisomorphisms
from igraph_spark.algorithms.lad import (
    count_subisomorphisms_lad, lad_domains, subisomorphic_lad)


def _brute(edges, n, pattern, k, directed, domains=None, induced=False):
    """Driver-side oracle: enumerate injective maps by brute force."""
    eset = set(edges)
    if not directed:
        eset |= {(b, a) for a, b in edges}
    eset -= {(a, a) for a, _ in eset}
    pat = {(a, b) for a, b in pattern if a != b}
    if not directed:
        pat |= {(b, a) for a, b in pat}
    count = 0
    for img in itertools.permutations(range(n), k):
        if domains and any(img[u] not in domains[u]
                           for u in domains if u < k):
            continue
        ok = all((img[a], img[b]) in eset for a, b in pat)
        if ok and induced:
            ok = all(((img[i], img[j]) in eset) == ((i, j) in pat)
                     for i in range(k) for j in range(k) if i != j)
        count += ok
    return count


def test_lad_matches_vf2_analog_karate(spark):
    k = famous(spark, "Zachary")
    tri = [(0, 1), (1, 2), (0, 2)]
    assert count_subisomorphisms_lad(k, tri) == \
        count_subisomorphisms(k, tri) == 270
    wedge = [(0, 1), (1, 2)]
    assert count_subisomorphisms_lad(k, wedge, induced=True) == \
        count_subisomorphisms(k, wedge, induced=True)


def test_lad_domains_and_induced_brute_force(spark):
    rng = random.Random(7)
    n = 9
    edges = sorted({(rng.randrange(n), rng.randrange(n))
                    for _ in range(18)})
    edges = [(a, b) for a, b in edges if a != b]
    for directed in (False, True):
        g = Graph.from_edge_list(spark, edges, n=n, directed=directed)
        pattern = [(0, 1), (1, 2)]
        doms = {0: [0, 1, 2, 3], 2: [4, 5, 6, 7, 8]}
        for induced in (False, True):
            got = count_subisomorphisms_lad(
                g, pattern, domains=doms, induced=induced)
            want = _brute(edges, n, pattern, 3, directed,
                          domains=doms, induced=induced)
            assert got == want, (directed, induced, got, want)


def test_lad_isolated_pattern_vertex(spark):
    # pattern = one edge + one isolated vertex (VF2 analog raises;
    # LAD supports it, lad.c handles empty-adjacency pattern nodes)
    edges = [(0, 1), (1, 2), (2, 3)]
    g = Graph.from_edge_list(spark, edges, n=5, directed=False)
    # v2 isolated, restricted to {4} (vertex 4 is itself isolated)
    got = subisomorphic_lad(g, [(0, 1)], n=3, domains={2: [4]})
    rows = {(r.v0, r.v1, r.v2) for r in got.collect()}
    want = {(a, b, 4) for a, b in
            [(0, 1), (1, 0), (1, 2), (2, 1), (2, 3), (3, 2)]}
    assert rows == want


def test_lad_dataframe_domains_match_dict_domains(spark):
    # the distributed domain form (DataFrame(pu, tv)) must agree with
    # the reference-shaped driver lists on the same constraint
    rng = random.Random(11)
    n = 10
    edges = sorted({(rng.randrange(n), rng.randrange(n))
                    for _ in range(22)})
    edges = [(a, b) for a, b in edges if a != b]
    g = Graph.from_edge_list(spark, edges, n=n, directed=True)
    pattern = [(0, 1), (1, 2)]
    doms = {0: [v for v in range(n) if v % 2 == 0],
            1: list(range(n)),
            2: [v for v in range(n) if v % 3 == 1]}
    df_dom = spark.createDataFrame(
        [(u, t) for u, ts in doms.items() for t in ts],
        "pu int, tv long")
    got_df = count_subisomorphisms_lad(g, pattern, domains=df_dom)
    got_dict = count_subisomorphisms_lad(g, pattern, domains=doms)
    want = _brute(edges, n, pattern, 3, True, domains=doms)
    assert got_df == got_dict == want


def test_lad_empty_domain_short_circuits(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2)], n=3,
                             directed=False)
    assert count_subisomorphisms_lad(g, [(0, 1)], domains={0: []}) == 0


def test_lad_matching_filter_prunes_star_center(spark):
    # out-star with 3 leaves; center candidate `a`=0 has 3 neighbours
    # {1,2,3} but the leaf domains only allow {1,2}: per-edge arc
    # consistency keeps (center,0), the all-different matching filter
    # (checkLAD analog) must kill it -> zero mappings
    edges = [(0, 1), (0, 2), (0, 3)]
    g = Graph.from_edge_list(spark, edges, n=4, directed=True)
    star = [(0, 1), (0, 2), (0, 3)]
    doms = {1: [1, 2], 2: [1, 2], 3: [1, 2]}
    dom = lad_domains(g, star, domains=doms)
    assert dom.where("pu = 0").count() == 1  # AC alone keeps the center
    assert count_subisomorphisms_lad(g, star, domains=doms) == 0
    # and without the domain restriction the star embeds 3! ways
    assert count_subisomorphisms_lad(g, star) == 6


def test_lad_reference_motif_identity(spark):
    # examples/simple/igraph_subisomorphic_lad.c test_motifs(), shrunk:
    # over all 16 directed 3-vertex isoclasses, sum of induced LAD
    # mappings / automorphisms == C(n,3)
    from igraph_spark.operators.isoclass import isoclass_create
    from math import comb
    n, m = 12, 30
    g = gnm(spark, n=n, m=m, directed=True, seed=5)
    edges = [(int(r.src), int(r.dst))
             for r in g.edges.select("src", "dst").collect()]
    total = 0
    for cls in range(16):
        rep = isoclass_create(spark, 3, cls, directed=True)
        pat = [(int(r.src), int(r.dst))
               for r in rep.edges.select("src", "dst").collect()]
        n_maps = count_subisomorphisms_lad(g, pat, n=3, induced=True)
        auts = _brute(pat, 3, pat, 3, True, induced=True)
        assert auts > 0 and n_maps % auts == 0, cls
        assert n_maps == _brute(edges, n, pat, 3, True, induced=True)
        total += n_maps // auts
    assert total == comb(n, 3)


def test_lad_loop_pattern_requires_looped_image(spark):
    """A looped pattern vertex binds only to looped target vertices
    (lad.c initDomains checks the loop bit).  The old code silently
    dropped loop edges and returned every degree-compatible vertex."""
    # loop-free graph: [(0,0)] must match nothing
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2)], n=3, directed=True)
    assert count_subisomorphisms_lad(g, [(0, 0)], n=1) == 0
    # loops at 0 and 2: exactly those two singleton matches
    g2 = Graph.from_edge_list(
        spark, [(0, 0), (0, 1), (1, 2), (2, 2)], n=3, directed=True)
    got = {r["v0"] for r in subisomorphic_lad(g2, [(0, 0)], n=1).collect()}
    assert got == {0, 2}
    # mixed pattern: edge (a, b) with a loop at the image of b.
    # 1->2 works (loop at 2); 0->1 fails (no loop at 1); the 0->0
    # loop edge would need v0 == v1, killed by injectivity.
    got = {(r["v0"], r["v1"])
           for r in subisomorphic_lad(g2, [(0, 1), (1, 1)]).collect()}
    assert got == {(1, 2)}


def test_lad_induced_forbids_loop_at_loopfree_image(spark):
    """induced=True: the image of a loop-FREE pattern vertex must be
    loop-free too (the induced subgraph includes loops)."""
    g = Graph.from_edge_list(
        spark, [(0, 1), (1, 1), (2, 3)], n=4, directed=True)
    # non-induced: both edges match the single-edge pattern
    got = {(r["v0"], r["v1"])
           for r in subisomorphic_lad(g, [(0, 1)], induced=False).collect()}
    assert got == {(0, 1), (2, 3)}
    # induced: (0, 1) is out because image vertex 1 carries a loop
    got = {(r["v0"], r["v1"])
           for r in subisomorphic_lad(g, [(0, 1)], induced=True).collect()}
    assert got == {(2, 3)}
    # and a looped pattern edge under induced keeps its match
    got = {(r["v0"], r["v1"])
           for r in subisomorphic_lad(g, [(0, 1), (1, 1)],
                                      induced=True).collect()}
    assert got == {(0, 1)}
