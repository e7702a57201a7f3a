"""IVF at corpus scale: bucketed-by-cluster layout + partition-pruned
probe, and the Arrow matvec assignment path used above
IVF_LITERAL_MAX_CLUSTERS (round 6; the literal expression tree is
unplannable at 4096 cells)."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from igraph_spark.functions import ann


@pytest.fixture(scope="module")
def emb(spark):
    rows = [(i, [float((i * 7 + j * 13) % 19) - 9.0 + 0.01 * i
                 for j in range(8)]) for i in range(400)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_arrow_assignment_matches_literal(spark, emb):
    """The Arrow matvec argmax must agree with the Catalyst literal
    path (same centroids, same tie-break) — the paths are selected by
    cluster count, so their agreement is the correctness contract."""
    cents = ann.ivf_train_centroids(emb, dim=8, n_clusters=8, max_iter=3)
    lit = ann.ivf_assign(emb, cents, dim=8)
    arrow = ann._assign_clusters_arrow(emb, cents, "embedding")
    a = {r["vec_id"]: r["cluster"] for r in lit.collect()}
    b = {r["vec_id"]: r["cluster"] for r in arrow.collect()}
    assert a == b


def test_large_cluster_count_plans_and_runs(spark, emb):
    """Above IVF_LITERAL_MAX_CLUSTERS the assignment and probe must
    still plan and run (the round-5 literal path could not) and assign
    every row a valid cell."""
    cents = [[1.0 if j == (i % 8) else 0.01 * ((i * 3 + j) % 5)
              for j in range(8)] for i in range(96)]
    assigned = ann.ivf_assign(emb, cents, dim=8)
    got = assigned.groupBy().agg(
        F.count("*").alias("n"), F.min("cluster").alias("lo"),
        F.max("cluster").alias("hi")).first()
    assert got["n"] == 400 and 0 <= got["lo"] and got["hi"] < 96


def test_corpus_write_prunes_probe_scan(spark, emb):
    """ivf_probe_corpus must read ONLY the probed cell directories
    (partition pruning on the cluster column) and return exactly
    ivf_topk's ranking for the same centroids."""
    cents = ann.ivf_train_centroids(emb, dim=8, n_clusters=8, max_iter=4)
    d = tempfile.mkdtemp(prefix="ivf_corpus_")
    try:
        path = os.path.join(d, "corpus")
        ann.ivf_write_corpus(emb, cents, path, dim=8)
        queries = emb.where("vec_id < 3")
        probed = ann.ivf_probe_corpus(spark, path, queries, cents,
                                      dim=8, k=5, n_probe=2)
        rows = probed.collect()
        assert rows and all(r["rank"] <= 5 for r in rows)
        # the scan behind the probe touches only probed cell dirs
        probe_cells = {
            r["cluster"] for r in ann._probe_cells(
                queries, cents, 2, "vec_id", "embedding")
            .select("cluster").distinct().collect()}
        cell_dirs = [os.path.join(path, f"cluster={c}")
                     for c in sorted(probe_cells)
                     if os.path.isdir(os.path.join(path, f"cluster={c}"))]
        pruned = spark.read.option("basePath", path).parquet(*cell_dirs)
        touched = {f.split("cluster=")[1].split("/")[0]
                   for f in pruned.inputFiles()}
        assert touched == {str(c) for c in probe_cells}
        assert len(touched) < 8  # strictly fewer than all cells
        # ranking parity with the in-memory probe path
        mem = ann.ivf_topk(emb, queries, dim=8, k=5, n_clusters=8,
                           n_probe=2, max_iter=4)
        assert sorted(map(tuple, probed.collect())) == \
            sorted(map(tuple, mem.collect()))
    finally:
        shutil.rmtree(d, ignore_errors=True)
