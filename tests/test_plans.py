"""Physical-plan audits: assert the plan shapes PLANS.md documents —
no single-partition exchanges on edge-sized data, parquet pushdown
reaching the scan."""

from pyspark.sql import functions as F

from igraph_spark.generators import gnm
from igraph_spark.operators.structure import linegraph


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_linegraph_struct_ids_no_single_partition_exchange(spark):
    g = gnm(spark, n=200, m=600, seed=4, directed=True)
    plan = _plan(linegraph(g))
    # struct edge identity keeps every window keyed: a partition-less
    # window would insert `Exchange SinglePartition` over the edge set
    assert "SinglePartition" not in plan, plan


def test_lpa_sweep_has_no_single_partition_exchange(spark):
    # one synthetic sweep fragment: tally + struct-max argmax
    g = gnm(spark, n=200, m=600, seed=4, directed=True)
    inc = g.edges.select("src", "dst").withColumn("weight", F.lit(1.0))
    state = g.vertices.select("id", F.col("id").alias("label"))
    tally = (inc.join(state.select(F.col("id").alias("src"),
                                   F.col("label").alias("nbr_label")),
                      "src")
             .groupBy("dst", "nbr_label").agg(F.sum("weight").alias("w")))
    best = (tally.groupBy("dst")
            .agg(F.max(F.struct(F.col("w"),
                                (-F.col("nbr_label")).alias("negl")))
                 .alias("m")))
    assert "SinglePartition" not in _plan(best)


def test_parquet_filter_and_projection_pushdown(spark, sf_dir):
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = (l.where(F.col("l_quantity") > 30.0)
         .select("l_orderkey", "l_quantity"))
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)]" in plan
    # column pruning: the scan schema carries only the two needed columns
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan
