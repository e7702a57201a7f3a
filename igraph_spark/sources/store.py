"""Bucketed edge store — the on-disk analog of the reference's sorted
CSR index (igraph_datatype.h:62-76 keeps `oi`/`os` sorted index
vectors; we keep a parquet table bucketed + sorted on ``src``).

`Graph.hash_partition` pays ONE exchange per session to lay edges out
by key; a bucketed table moves that exchange to write time: every
later session's `src`-keyed join or aggregation reads the buckets
directly with NO Exchange in the plan (asserted by
tests/test_store.py).  At 10^12-file scale this is the difference
between an O(m) network shuffle per job and zero — the job starts from
co-located state, exactly like the reference mmap-ing its CSR.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

from igraph_spark.graph import Graph, SRC, DST


def write_bucketed(graph: Graph, table: str, buckets: int = 64,
                   path: str | None = None) -> None:
    """Persist the edge table bucketed by ``src`` and sorted by
    (src, dst) within each bucket.  ``buckets`` should match (or
    divide) the cluster's target parallelism."""
    w = (graph.edges.write.format("parquet")
         .bucketBy(buckets, SRC).sortBy(SRC, DST)
         .mode("overwrite"))
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str,
                  directed: bool = True) -> Graph:
    """Load a bucketed edge table as a Graph; downstream src-keyed
    operations use the bucket layout instead of shuffling."""
    e = spark.table(table)
    verts = (e.select(F.col(SRC).alias("id"))
             .unionByName(e.select(F.col(DST).alias("id"))).distinct())
    return Graph(e, verts, directed=directed, _canonical=True)
