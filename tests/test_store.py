"""Bucketed edge store: src-keyed aggregation over a bucketed table
plans with NO Exchange (the write-time shuffle replaces every
read-time one — the on-disk analog of hash_partition)."""

from pyspark.sql import functions as F

from igraph_spark.generators import gnm
from igraph_spark.sources.store import read_bucketed, write_bucketed


def test_bucketed_degree_no_exchange(spark):
    g = gnm(spark, 200, 600, seed=9, directed=True)
    spark.sql("DROP TABLE IF EXISTS e_bucketed")
    write_bucketed(g, "e_bucketed", buckets=4)
    try:
        g2 = read_bucketed(spark, "e_bucketed", directed=True)
        deg = g2.edges.groupBy("src").agg(F.count("*").alias("d"))
        plan = deg._jdf.queryExecution().toString()
        assert "Exchange" not in plan, plan
        # result parity with the unbucketed path
        want = sorted((r.src, r.d) for r in
                      g.edges.groupBy("src").agg(
                          F.count("*").alias("d")).collect())
        got = sorted((r.src, r.d) for r in deg.collect())
        assert got == want
        # src-keyed self-join also exchange-free on the bucketed side
        j = g2.edges.alias("a").join(
            spark.table("e_bucketed").alias("b"),
            F.col("a.src") == F.col("b.src"))
        jplan = j._jdf.queryExecution().toString()
        n_exchanges = jplan.count("Exchange hashpartitioning")
        assert n_exchanges == 0, jplan
    finally:
        spark.sql("DROP TABLE IF EXISTS e_bucketed")
