"""SURVEY §5 determinism contract: identical results at different
partition counts (replaces the reference's single-threaded
determinism), and a resumed run matching an uninterrupted one."""

import numpy as np

from igraph_spark.graph import Graph
from igraph_spark.algorithms.pagerank import pagerank
from igraph_spark.algorithms.components import connected_components
from igraph_spark.algorithms.lpa import label_propagation
from igraph_spark.functions import dedup
from igraph_spark.generators import famous

from tests.test_pagerank import PR8, _scores


def test_pagerank_partition_invariance(spark):
    g = famous(spark, "Zachary")
    a = _scores(pagerank(g, tol=1e-9, num_partitions=2), 34)
    b = _scores(pagerank(g, tol=1e-9, num_partitions=7), 34)
    # FP sums are tree-shaped per partitioning: equality is to
    # accumulation noise, far below the 1e-6 parity bar
    assert np.allclose(a, b, atol=1e-12)


def test_wcc_partition_invariance(spark):
    edges = [(0, 2), (2, 4), (1, 3), (5, 5)]
    g = Graph.from_edge_list(spark, edges, n=7, directed=False)
    for parts in ("2", "5"):
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        labels = {r["id"]: r["component"]
                  for r in connected_components(g).collect()}
        assert labels == {0: 0, 2: 0, 4: 0, 1: 1, 3: 1, 5: 2, 6: 3}
    spark.conf.set("spark.sql.shuffle.partitions", "1")


def test_lpa_seed_determinism(spark):
    g = famous(spark, "Zachary")
    a = sorted((r["id"], r["label"])
               for r in label_propagation(g, seed=7).collect())
    b = sorted((r["id"], r["label"])
               for r in label_propagation(g, seed=7).collect())
    assert a == b


def test_minhash_partition_invariance(spark):
    docs = spark.createDataFrame(
        [(i, f"common prefix text number {i % 3} with shared shingles")
         for i in range(12)],
        "doc_id long, text string")
    a = sorted(map(tuple, dedup.minhash_lsh_pairs(
        docs, threshold=0.3).collect()))
    b = sorted(map(tuple, dedup.minhash_lsh_pairs(
        docs.repartition(5), threshold=0.3).collect()))
    assert a == b and len(a) > 0


def test_resume_matches_uninterrupted(spark, tmp_path):
    g = Graph.from_edge_list(spark, PR8, n=8, directed=True)
    straight = _scores(pagerank(g, tol=0.0, max_iter=40, check_every=5), 8)

    run_dir = str(tmp_path / "resume_run")
    partial = pagerank(g, tol=0.0, max_iter=20, check_every=5,
                       run_dir=run_dir)
    partial.collect()
    resumed = _scores(pagerank(g, tol=0.0, max_iter=40, check_every=5,
                               run_dir=run_dir), 8)
    # resumed run replays supersteps 20..39 from the durable manifest;
    # the state round-trips through parquet (exact doubles), so the
    # composition is the same arithmetic
    assert np.allclose(straight, resumed, atol=1e-15, rtol=0.0)
