"""degree_sequence_game + rewire (games.c degree-sequence methods and
igraph_rewire analogs): exact-degree-sequence and simplicity
invariants, determinism at different parallelism."""

import pytest
from pyspark.sql import functions as F

from igraph_spark.generators import degree_sequence_game, famous, rewire


def _degrees(g):
    und = g.edges.select("src", "dst")
    both = und.select(F.col("src").alias("id")).unionByName(
        und.select(F.col("dst").alias("id")))
    d = {r["id"]: r["c"] for r in
         both.groupBy("id").agg(F.count("*").alias("c")).collect()}
    return [d.get(i, 0) for i in range(g.vcount())]


def test_configuration_exact_degrees(spark):
    seq = [3, 2, 2, 1, 1, 1, 2]  # sum 12 -> 6 edges
    g = degree_sequence_game(spark, seq, seed=7)
    assert not g.directed
    assert g.ecount() == 6
    assert _degrees(g) == seq


def test_configuration_directed(spark):
    out_seq = [2, 1, 0, 1]
    in_seq = [0, 1, 2, 1]
    g = degree_sequence_game(spark, out_seq, in_seq, seed=3)
    assert g.directed
    outs = {r["src"]: r["c"] for r in g.edges.groupBy("src")
            .agg(F.count("*").alias("c")).collect()}
    ins = {r["dst"]: r["c"] for r in g.edges.groupBy("dst")
           .agg(F.count("*").alias("c")).collect()}
    assert [outs.get(i, 0) for i in range(4)] == out_seq
    assert [ins.get(i, 0) for i in range(4)] == in_seq


def test_configuration_odd_sum_raises(spark):
    with pytest.raises(ValueError):
        degree_sequence_game(spark, [3, 2], seed=1)


def test_simple_method_repairs_to_simple(spark):
    # regular-ish sequence on 12 vertices; configuration pairing will
    # typically produce a few loops/dupes, simple must remove them all
    seq = [4, 4, 4, 4, 3, 3, 3, 3, 2, 2, 2, 2]  # sum 36 -> 18 edges
    g = degree_sequence_game(spark, seq, seed=11, method="simple")
    assert _degrees(g) == seq
    e = g.edges
    assert e.where(F.col("src") == F.col("dst")).count() == 0
    assert e.groupBy("src", "dst").count().where("count > 1").count() == 0
    assert g.ecount() == 18


def test_degseq_deterministic_across_parallelism(spark):
    seq = [2, 2, 2, 2, 2, 2]
    g1 = degree_sequence_game(spark, seq, seed=5)
    g2 = degree_sequence_game(spark, seq, seed=5)
    assert sorted(map(tuple, g1.edges.collect())) == \
        sorted(map(tuple, g2.edges.collect()))
    g3 = degree_sequence_game(spark, seq, seed=6)
    # different seed -> (almost surely) different pairing
    assert sorted(map(tuple, g1.edges.collect())) != \
        sorted(map(tuple, g3.edges.collect()))


def test_rewire_preserves_degrees_and_simplicity(spark):
    k = famous(spark, "Zachary")
    before = _degrees(k)
    r = rewire(k, n_rounds=8, seed=13)
    assert _degrees(r) == before
    assert r.ecount() == 78
    e = r.edges.select(F.least("src", "dst").alias("a"),
                       F.greatest("src", "dst").alias("b"))
    assert e.where(F.col("a") == F.col("b")).count() == 0
    assert e.groupBy("a", "b").count().where("count > 1").count() == 0
    # and it actually moved edges
    orig = set(tuple(sorted((r_.src, r_.dst))) for r_ in k.edges.collect())
    new = set(tuple(sorted((r_.a, r_.b))) for r_ in e.collect())
    assert orig != new
