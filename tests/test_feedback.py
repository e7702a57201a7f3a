"""Feedback arc set (Eades-Lin-Smyth analog): removal leaves a DAG,
DAGs need nothing, the ELS bound holds, weights steer the choice."""

import pytest

from igraph_spark.algorithms.feedback import feedback_arc_set
from igraph_spark.graph import Graph
from igraph_spark.operators.structure import is_dag


def _g(spark, edges, schema="src long, dst long"):
    return Graph(spark.createDataFrame(edges, schema), directed=True)


def test_dag_needs_no_arcs(spark):
    g = _g(spark, [(0, 1), (1, 2), (0, 2), (2, 3)])
    assert feedback_arc_set(g).count() == 0


def test_cycle_breaks_with_one_arc(spark):
    g = _g(spark, [(0, 1), (1, 2), (2, 0)])
    fas = [(r["src"], r["dst"]) for r in feedback_arc_set(g).collect()]
    assert len(fas) == 1
    rest = _g(spark, [e for e in [(0, 1), (1, 2), (2, 0)]
                      if e not in fas])
    assert is_dag(rest) is True


def test_removal_always_leaves_dag(spark):
    import random
    rng = random.Random(11)
    edges = [(i, j) for i in range(9) for j in range(9)
             if i != j and rng.random() < 0.3]
    g = _g(spark, edges)
    fas = {(r["src"], r["dst"]) for r in feedback_arc_set(g).collect()}
    # ELS bound on simple digraphs: |FAS| <= m/2 - n/6
    assert len(fas) <= len(edges) / 2
    rest = _g(spark, [e for e in edges if e not in fas])
    assert is_dag(rest) is True


def test_weights_steer_the_break(spark):
    # 2-cycle with asymmetric weights: drop the light arc
    g = _g(spark, [(0, 1, 10.0), (1, 0, 0.1)],
           "src long, dst long, weight double")
    fas = [(r["src"], r["dst"]) for r in feedback_arc_set(g).collect()]
    assert fas == [(1, 0)]


def test_undirected_rejected(spark):
    g = Graph(spark.createDataFrame([(0, 1)], "src long, dst long"),
              directed=False)
    with pytest.raises(ValueError, match="directed"):
        feedback_arc_set(g)


# ------------------------------------------------- exact (Held-Karp)


def _fas_exact(spark, edges, n, weights=None, directed=True):
    from igraph_spark.graph import Graph
    from igraph_spark.algorithms.feedback import feedback_arc_set
    if weights:
        df = spark.createDataFrame(
            [(a, b, w) for (a, b), w in zip(edges, weights)],
            "src long, dst long, weight double")
    else:
        df = spark.createDataFrame(edges, "src long, dst long")
    g = Graph(df, spark.range(n).withColumnRenamed("id", "id"),
              directed=directed)
    return feedback_arc_set(g, method="exact_ip")


def test_exact_fas_single_cycle_removes_one_arc(spark):
    out = _fas_exact(spark, [(0, 1), (1, 2), (2, 0)], 3).collect()
    assert len(out) == 1


def test_exact_fas_weighted_picks_cheapest_arc(spark):
    # 3-cycle with weights 5, 1, 5: the minimum FAS is the weight-1 arc
    out = _fas_exact(spark, [(0, 1), (1, 2), (2, 0)], 3,
                     weights=[5.0, 1.0, 5.0]).collect()
    assert [(r.src, r.dst) for r in out] == [(1, 2)]


def test_exact_fas_includes_self_loops_and_beats_els_never(spark):
    # two 2-cycles sharing vertex 1 + a self-loop; exact min = 2 arcs
    # (one per 2-cycle) + the loop
    edges = [(0, 1), (1, 0), (1, 2), (2, 1), (3, 3)]
    out = _fas_exact(spark, edges, 4).collect()
    assert len(out) == 3
    assert (3, 3) in {(r.src, r.dst) for r in out}


def test_exact_fas_is_optimal_vs_bruteforce(spark):
    """Random 6-vertex digraph: DP min weight == brute-force min over
    all 720 orderings."""
    import itertools
    import random
    rnd = random.Random(3)
    edges = [(a, b) for a in range(6) for b in range(6)
             if a != b and rnd.random() < 0.4]
    w = {e: rnd.randint(1, 9) for e in edges}
    best = min(
        sum(w[(a, b)] for (a, b) in edges if perm.index(a) > perm.index(b))
        for perm in itertools.permutations(range(6)))
    out = _fas_exact(spark, edges, 6,
                     weights=[float(w[e]) for e in edges]).collect()
    assert sum(r.weight for r in out) == best


def test_exact_fas_leaves_a_dag(spark):
    import random
    rnd = random.Random(11)
    edges = list({(rnd.randint(0, 7), rnd.randint(0, 7))
                  for _ in range(20)})
    edges = [e for e in edges if e[0] != e[1]]
    out = {(r.src, r.dst) for r in _fas_exact(spark, edges, 8).collect()}
    kept = [e for e in edges if e not in out]
    # Kahn: the remainder must topologically sort completely
    from collections import defaultdict
    indeg = defaultdict(int)
    adj = defaultdict(list)
    nodes = set(range(8))
    for a, b in kept:
        adj[a].append(b)
        indeg[b] += 1
    q = [v for v in nodes if indeg[v] == 0]
    seen = 0
    while q:
        v = q.pop()
        seen += 1
        for t in adj[v]:
            indeg[t] -= 1
            if indeg[t] == 0:
                q.append(t)
    assert seen == len(nodes)


def test_exact_fas_gates_large_components(spark):
    import pytest
    edges = [(i, (i + 1) % 20) for i in range(20)]
    with pytest.raises(ValueError, match="max_exact_vertices"):
        _fas_exact(spark, edges, 20)
