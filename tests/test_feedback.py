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
