"""Property-based randomized parity (hypothesis): the distributed
engine vs the independent NumPy/brute-force oracles on arbitrary small
graphs, not just the curated golden fixtures.

Each property draws a random edge multiset over <=10 vertices (loops
and multi-edges allowed — the reference tolerates both and several
conventions hinge on them) and asserts the same parity contract the
fixture tests assert:

* PageRank allclose 1e-6 vs tests/oracle.pagerank_oracle (the
  reference semantics of centrality.c:913-1035 — dangling mass to the
  jump pool, loops excluded from unweighted out-degree).
* Weak-component partition == union-find oracle (exact).
* Triangle count == brute-force oracle (exact; directed input counted
  on the simplified undirected projection like triangles.py does).
* canonical_form / wl_fingerprint invariance under a random vertex
  relabeling (the bliss-analog contract: isomorphic inputs must hash
  identically).

hypothesis settings: derandomized (stable across CI runs), small
example counts — each example spins real Spark jobs, so the value is
the structured search space, not volume; deadline disabled because JVM
warm-up makes first-example timing meaningless.
"""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, assume, given, settings, strategies as st

from igraph_spark.graph import Graph
from igraph_spark.algorithms.pagerank import pagerank
from igraph_spark.algorithms.components import connected_components
from igraph_spark.algorithms.triangles import triangle_count
from igraph_spark.algorithms.canonical import canonical_form, wl_fingerprint

from tests.oracle import (pagerank_oracle, components_oracle,
                          triangle_oracle)

PROP = settings(
    max_examples=8,
    derandomize=True,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _edges(max_n=10, max_m=18):
    """Strategy: (n, [(u, v), ...]) with loops/multi-edges allowed."""
    return st.integers(min_value=2, max_value=max_n).flatmap(
        lambda n: st.tuples(
            st.just(n),
            st.lists(
                st.tuples(st.integers(0, n - 1), st.integers(0, n - 1)),
                min_size=1, max_size=max_m,
            ),
        )
    )


@PROP
@given(data=_edges(), directed=st.booleans())
def test_pagerank_matches_numpy_oracle(spark, data, directed):
    n, edges = data
    g = Graph.from_edge_list(spark, edges, n=n, directed=directed)
    got = {r["id"]: r["pagerank"]
           for r in pagerank(g, tol=1e-12).collect()}
    want = pagerank_oracle(n, edges, directed=directed)
    assert sorted(got) == list(range(n))
    np.testing.assert_allclose(
        [got[i] for i in range(n)], want, atol=1e-6)


@PROP
@given(data=_edges(), weighted=st.booleans())
def test_weighted_pagerank_matches_numpy_oracle(spark, data, weighted):
    n, edges = data
    weights = [((i * 7 + 3) % 5) + 0.5 for i in range(len(edges))] \
        if weighted else None
    g = Graph.from_edge_list(spark, edges, n=n, directed=True,
                             weights=weights)
    got = {r["id"]: r["pagerank"]
           for r in pagerank(g, tol=1e-12).collect()}
    want = pagerank_oracle(n, edges, directed=True, weights=weights)
    np.testing.assert_allclose(
        [got[i] for i in range(n)], want, atol=1e-6)


@PROP
@given(data=_edges())
def test_weak_components_match_union_find(spark, data):
    n, edges = data
    g = Graph.from_edge_list(spark, edges, n=n, directed=True)
    got = {r["id"]: r["component"]
           for r in connected_components(g, mode="weak").collect()}
    want = components_oracle(n, edges)
    # weak labels are exact igraph labels (components.py docstring)
    assert [got[i] for i in range(n)] == want


@PROP
@given(data=_edges(), directed=st.booleans())
def test_triangle_count_matches_bruteforce(spark, data, directed):
    n, edges = data
    g = Graph.from_edge_list(spark, edges, n=n, directed=directed)
    assert triangle_count(g) == triangle_oracle(edges)[0]


@PROP
@given(data=_edges(max_n=8, max_m=14), directed=st.booleans(),
       seed=st.integers(0, 2**16))
def test_canonical_form_and_wl_are_relabel_invariant(
        spark, data, directed, seed):
    n, edges = data
    rng = np.random.RandomState(seed)
    perm = rng.permutation(n)
    relabeled = [(int(perm[u]), int(perm[v])) for u, v in edges]
    g1 = Graph.from_edge_list(spark, edges, n=n, directed=directed)
    g2 = Graph.from_edge_list(spark, relabeled, n=n, directed=directed)
    assert canonical_form(g1) == canonical_form(g2)
    assert wl_fingerprint(g1, rounds=2) == wl_fingerprint(g2, rounds=2)


@PROP
@given(data=_edges(max_n=8, max_m=12))
def test_canonical_form_detects_edge_flip(spark, data):
    """Soundness direction on a non-isomorphic pair: removing one
    distinct undirected edge from a simple projection must change the
    canonical form (edge counts differ -> forms must differ)."""
    n, edges = data
    simple = sorted({(min(u, v), max(u, v)) for u, v in edges if u != v})
    assume(simple)
    g1 = Graph.from_edge_list(spark, simple, n=n, directed=False)
    g2 = Graph.from_edge_list(spark, simple[:-1], n=n, directed=False)
    assert canonical_form(g1) != canonical_form(g2)
