"""Repos-table synthesis + edge extraction (north rule / input_hint):
sha256 row invariant vs the pandas/hashlib oracle, Arrow-UDF vs
Catalyst regex agreement, co-commit/import graph shape."""

import hashlib

import pytest
from pyspark.sql import functions as F

from igraph_spark.sources.repos import synth_repos, with_content_sha
from igraph_spark.sources.extract import (
    file_vertices, import_edges, cocommit_edges, assert_no_id_collisions)
from igraph_spark.graph import Graph
from igraph_spark.algorithms.pagerank import pagerank


def _repos(spark):
    return synth_repos(spark, n_repos=3, files_per_repo=20,
                       commits_per_file=3, imports_per_file=4, seed=42)


def test_sha256_row_invariant(spark):
    """input_hint: Spark sha2(content,256) == hashlib oracle per row."""
    df = with_content_sha(_repos(spark)).select("content", "content_sha")
    for row in df.limit(50).collect():
        want = hashlib.sha256(row["content"].encode()).hexdigest()
        assert row["content_sha"] == want


def test_determinism_across_partitionings(spark):
    a = _repos(spark).orderBy("repo", "path", "commit").collect()
    b = (_repos(spark).repartition(7).orderBy("repo", "path", "commit")
         .collect())
    assert a == b


def test_arrow_udf_matches_builtin(spark):
    e_builtin = import_edges(_repos(spark), use_arrow_udf=False)
    e_arrow = import_edges(_repos(spark), use_arrow_udf=True)
    sa = sorted((r["src"], r["dst"]) for r in e_builtin.collect())
    sb = sorted((r["src"], r["dst"]) for r in e_arrow.collect())
    assert sa == sb and len(sa) > 0


def test_vertex_dictionary(spark):
    v = file_vertices(_repos(spark))
    assert v.count() == 60
    assert_no_id_collisions(v)


def test_cocommit_graph(spark):
    e = cocommit_edges(_repos(spark))
    rows = e.collect()
    assert len(rows) > 0
    # canonical src <= dst, positive integer weights
    assert all(r["src"] < r["dst"] and r["weight"] >= 1.0 for r in rows)


def test_import_graph_pagerank_end_to_end(spark):
    """M2 flagship slice: repos table -> import graph -> PageRank."""
    repos = _repos(spark)
    g = Graph(import_edges(repos), file_vertices(repos).select("id"),
              directed=True)
    pr = pagerank(g, tol=1e-8, max_iter=120)
    rows = pr.collect()
    assert len(rows) == 60
    total = sum(r["pagerank"] for r in rows)
    assert abs(total - 1.0) < 1e-6
    # repo hub files (f0 of each repo) should be high-rank
    top = sorted(rows, key=lambda r: -r["pagerank"])[:3]
    hubs = {r["id"] for r in
            file_vertices(repos).where("path like '%/f0.%'").collect()}
    assert any(r["id"] in hubs for r in top)


def test_read_repos_parquet_and_table(spark, tmp_path):
    """read_repos: parquet path and catalog-identifier routes both
    land on the validated (repo, path, commit, lang, content)
    projection; a mis-shaped source fails eagerly."""
    from igraph_spark.sources.repos import REPOS_COLUMNS, read_repos
    src = synth_repos(spark, n_repos=2, files_per_repo=5)
    p = str(tmp_path / "repos.parquet")
    src.withColumn("extra", F.lit(1)).write.parquet(p)
    via_path = read_repos(spark, p)
    assert via_path.columns == list(REPOS_COLUMNS)
    assert via_path.count() == src.count()
    # catalog-identifier route (temp view stands in for an Iceberg
    # table identifier; both resolve through spark.read.table)
    src.createOrReplaceTempView("repos_tbl")
    via_table = read_repos(spark, "repos_tbl")
    assert via_table.columns == list(REPOS_COLUMNS)
    assert via_table.count() == src.count()
    spark.range(3).createOrReplaceTempView("not_repos")
    with pytest.raises(ValueError, match="lacks columns"):
        read_repos(spark, "not_repos")
