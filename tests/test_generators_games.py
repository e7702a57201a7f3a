"""Random-graph games: G(n,p) and Barabasi-Albert (games.c:486,573) —
distribution invariants + partition-count determinism, plus
get_shortest_paths witness validation."""

from pyspark.sql import functions as F

from igraph_spark.generators import barabasi, gnp, gnm
from igraph_spark.algorithms.paths import get_shortest_paths, bfs_distances


def test_gnp_edge_count_near_expectation(spark):
    g = gnp(spark, 200, 0.05, seed=3)
    expected = 0.05 * 200 * 199 / 2
    assert abs(g.ecount() - expected) < 4 * (expected ** 0.5) + 20


def test_gnp_deterministic_any_parallelism(spark):
    a = sorted((r.src, r.dst) for r in gnp(spark, 100, 0.1, seed=5)
               .edges.collect())
    b = sorted((r.src, r.dst) for r in gnp(spark, 100, 0.1, seed=5)
               .edges.repartition(13).collect())
    assert a == b and len(a) > 0


def test_barabasi_slot_count_and_skew(spark):
    g = barabasi(spark, n=2000, m=3, seed=7)
    assert g.ecount() == 1999 * 3
    deg = g.sym_edges().groupBy("src").count()
    row = deg.agg(F.max("count").alias("mx"), F.avg("count").alias("av")) \
        .first()
    # preferential attachment: heavy tail (max degree >> average)
    assert row.mx > 10 * row.av


def test_barabasi_early_vertices_dominate(spark):
    # rich-get-richer: the 10 earliest vertices hold far more degree
    # mass than the 10 latest
    g = barabasi(spark, n=300, m=2, seed=11)
    deg = g.sym_edges().groupBy("src").count()
    early = deg.where(F.col("src") < 10).agg(F.sum("count")).first()[0]
    late = deg.where(F.col("src") >= 290).agg(F.sum("count")).first()[0]
    assert early > 3 * (late or 1)


def test_barabasi_deterministic(spark):
    a = sorted((r.src, r.dst) for r in barabasi(spark, 500, 2, seed=9)
               .edges.collect())
    b = sorted((r.src, r.dst) for r in barabasi(spark, 500, 2, seed=9)
               .edges.repartition(7).collect())
    assert a == b


def test_gnm_exact_edge_count_dense(spark):
    # dense n/m combination exercises the oversample-retry path
    g = gnm(spark, n=30, m=400, seed=1, directed=False)
    assert g.ecount() == 400
    assert g.edges.select("src", "dst").distinct().count() == 400


def test_watts_strogatz_degree_and_determinism(spark):
    from igraph_spark.generators import watts_strogatz
    g = watts_strogatz(spark, 500, k=4, p=0.1, seed=3)
    deg = g.sym_edges().groupBy("src").count()
    row = deg.agg(F.avg("count").alias("av")).first()
    assert abs(float(row.av) - 4.0) < 0.2  # mean degree ~ k
    a = sorted((r.src, r.dst) for r in g.edges.collect())
    b = sorted((r.src, r.dst)
               for r in watts_strogatz(spark, 500, 4, 0.1, 3)
               .edges.repartition(9).collect())
    assert a == b


def test_geometric_edge_count_near_expectation(spark):
    from igraph_spark.generators import geometric
    g = geometric(spark, 300, 0.12, seed=8)
    # pi*r^2 pair probability, minus border effects => a loose band
    expected = 300 * 299 / 2 * 3.14159 * 0.12 ** 2
    assert 0.6 * expected < g.ecount() < 1.1 * expected


def test_get_shortest_paths_witnesses(spark):
    g = gnm(spark, n=60, m=150, seed=21, directed=True)
    p = get_shortest_paths(g, [0, 1], mode="out")
    d = bfs_distances(g, [0, 1], mode="out")
    assert p.select("source", "id", "dist") \
        .exceptAll(d.select("source", "id", "dist")).count() == 0
    edges = {(r.src, r.dst) for r in g.edges.collect()}
    for r in p.collect():
        path = list(r.path)
        assert path[0] == r.source and path[-1] == r.id
        assert len(path) == r.dist + 1
        assert all((a, b) in edges for a, b in zip(path, path[1:]))
