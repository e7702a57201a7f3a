"""k-core decomposition (igraph_coreness,
/root/reference/src/cores.c:58-159).

The reference peels vertices in increasing degree order with a bucket
queue (single-node O(V+E)).  Distributed version: BSP peel — at level
k, repeatedly drop every vertex whose degree within the remaining
subgraph is <= k; dropped vertices have coreness k.  Each wave is a
degree aggregation + semi-join filter; the number of waves is bounded
by the degeneracy, which is small for real link graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from igraph_spark.graph import Graph, SRC, DST, ID


def coreness(graph: Graph, mode: str = "all", max_waves: int = 10000) -> DataFrame:
    """-> DataFrame(id, coreness).

    mode: 'all' (default, undirected view), 'in', 'out' — like
    igraph_coreness.  Loops are ignored (a loop never keeps a vertex in
    a core by itself; matches reference behavior on simple graphs).
    """
    spark = graph.edges.sparkSession
    e = graph.edges.select(SRC, DST).where(F.col(SRC) != F.col(DST))
    if mode == "all" or not graph.directed:
        rev = e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
        inc = e.unionByName(rev)          # deg(v) = rows with SRC = v
    elif mode == "out":
        inc = e
    elif mode == "in":
        inc = e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
    else:
        raise ValueError(f"bad mode {mode!r}")
    inc = inc.persist(StorageLevel.MEMORY_AND_DISK)

    remaining = graph.vertices.select(ID).localCheckpoint(eager=False)
    n_rem = remaining.count()
    results: list[DataFrame] = []
    k = 0
    for _ in range(max_waves):
        if n_rem == 0:
            break
        e_rem = (inc.join(remaining.withColumnRenamed(ID, SRC), SRC, "left_semi")
                 .join(remaining.withColumnRenamed(ID, DST), DST, "left_semi"))
        deg = (remaining.join(
            e_rem.groupBy(SRC).agg(F.count("*").alias("deg"))
                 .withColumnRenamed(SRC, ID), ID, "left")
            .select(ID, F.coalesce("deg", F.lit(0)).alias("deg"))
            .persist())
        min_deg = int(deg.agg(F.min("deg")).first()[0] or 0)
        k = max(k, min_deg)
        # min_deg <= k guarantees a non-empty peel: every wave makes
        # progress, so no separate emptiness probe is needed
        peel = deg.where(F.col("deg") <= k).select(ID)
        # truncate lineage: the accumulated parts must survive the
        # unpersist of this wave's deg/remaining without replaying
        results.append(peel.select(ID, F.lit(k).cast("long").alias("coreness"))
                       .localCheckpoint(eager=True))
        # lazy checkpoint materialized by the count: per-wave lineage
        # truncation (rotating persists recompute, see checkpointing.py)
        nxt = deg.where(F.col("deg") > k).select(ID) \
            .localCheckpoint(eager=False)
        n_rem = nxt.count()
        deg.unpersist()
        remaining = nxt
    inc.unpersist()

    if not results:
        return spark.createDataFrame([], "id long, coreness long")
    out = results[0]
    for p in results[1:]:
        out = out.unionByName(p)
    return out
