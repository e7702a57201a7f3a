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


# ------------------------------------------------- Viger-Latapy (vl)


def _vl_graph(spark, degs, seed=42):
    from igraph_spark.generators import degree_sequence_game
    return degree_sequence_game(spark, degs, seed=seed, method="vl")


def test_vl_exact_degrees_simple_connected(spark):
    degs = [3, 3, 2, 2, 2, 2, 1, 1, 2, 2]
    g = _vl_graph(spark, degs)
    rows = g.edges.collect()
    # simple: no loops, no multi-edges
    pairs = [tuple(sorted((r.src, r.dst))) for r in rows]
    assert len(pairs) == len(set(pairs))
    assert all(a != b for a, b in pairs)
    # exact degree sequence
    from collections import Counter
    c = Counter()
    for a, b in pairs:
        c[a] += 1
        c[b] += 1
    assert [c[i] for i in range(len(degs))] == degs
    # connected
    from igraph_spark.algorithms.components import connected_components
    ncomp = (connected_components(g, "weak")
             .select("component").distinct().count())
    assert ncomp == 1


def test_vl_deterministic_and_seed_sensitive(spark):
    degs = [2, 2, 2, 2, 3, 3, 2, 2]
    a = sorted((r.src, r.dst) for r in _vl_graph(spark, degs, 7).edges.collect())
    b = sorted((r.src, r.dst) for r in _vl_graph(spark, degs, 7).edges.collect())
    assert a == b
    # a different seed should (with overwhelming probability) differ
    c = sorted((r.src, r.dst) for r in _vl_graph(spark, degs, 8).edges.collect())
    assert a != c


def test_vl_rejects_bad_sequences(spark):
    import pytest
    from igraph_spark.generators import degree_sequence_game
    with pytest.raises(ValueError):  # odd sum
        _vl_graph(spark, [3, 2])
    with pytest.raises(ValueError):  # not graphical
        _vl_graph(spark, [5, 1, 1, 1])
    with pytest.raises(ValueError):  # zero degree can't connect
        _vl_graph(spark, [2, 2, 2, 0])
    with pytest.raises(ValueError):  # too sparse for connectivity
        _vl_graph(spark, [1, 1, 1, 1])
    with pytest.raises(ValueError):  # directed
        degree_sequence_game(spark, [1, 1], in_deg=[1, 1], method="vl")


def test_vl_larger_ba_sequence(spark):
    """A heavier-tailed 200-vertex sequence stays exact + connected."""
    from igraph_spark.generators import barabasi
    from igraph_spark.algorithms.components import connected_components
    base = barabasi(spark, n=200, m=2, seed=5)
    degs = {r.id: 0 for r in base.vertices.collect()}
    for r in base.edges.collect():
        degs[r.src] += 1
        degs[r.dst] += 1
    seq = [max(1, degs[i]) for i in range(200)]
    if sum(seq) % 2:
        seq[0] += 1
    g = _vl_graph(spark, seq)
    from collections import Counter
    c = Counter()
    for r in g.edges.collect():
        c[r.src] += 1
        c[r.dst] += 1
    assert [c[i] for i in range(200)] == seq
    assert (connected_components(g, "weak")
            .select("component").distinct().count()) == 1
