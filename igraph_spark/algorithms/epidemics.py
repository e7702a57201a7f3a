"""SIR epidemic simulation — igraph_sir analog
(/root/reference/src/sir.c).

The reference runs continuous-time Gillespie draws; the Spark-native
analog is a DISCRETE-TIME synchronous SIR over BSP supersteps (one
keyed join per step), with deterministic hash coins — reproducible at
any parallelism, like every other sampler here (documented semantic
deviation: step counts, not exponential waiting times; infection
probability per S-I contact per step is ``beta``, recovery per step
``gamma``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from igraph_spark.graph import Graph, SRC, DST, ID


def sir(graph: Graph, beta: float, gamma: float,
        initial_infected=None, seed: int = 42,
        max_steps: int = 1000) -> DataFrame:
    """-> DataFrame(step, s, i, r): compartment counts per step, until
    no infectious vertices remain (or max_steps).

    ``initial_infected``: iterable of vertex ids (default: the minimum
    vertex id, deterministic).  Per step, every S vertex with an
    infectious neighbour flips a per-(step, edge) coin at probability
    ``beta`` per contact; every I vertex flips a per-(step, vertex)
    coin at ``gamma`` to recover.  New infections cannot recover in
    the same step (synchronous update)."""
    spark = graph.edges.sparkSession
    sym = (graph.sym_edges() if not graph.directed
           else graph.edges.select(SRC, DST)) \
        .where(F.col(SRC) != F.col(DST)).distinct()
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    sym = sym.repartition(nparts, SRC).persist(StorageLevel.MEMORY_AND_DISK)

    if initial_infected is None:
        first = graph.vertices.agg(F.min(ID)).first()[0]
        init = {int(first)} if first is not None else set()
    else:
        init = {int(x) for x in initial_infected}
    state = graph.vertices.select(
        ID, F.when(F.col(ID).isin(list(init)), 1).otherwise(0)
        .cast("int").alias("st")).localCheckpoint(eager=True)

    def u01(*cols):
        return (F.xxhash64(F.lit(seed), *cols).cast("double")
                / F.lit(2.0 ** 64) + F.lit(0.5))

    counts = []
    for step in range(max_steps):
        agg = state.groupBy("st").count().collect()
        by = {int(r["st"]): int(r["count"]) for r in agg}
        counts.append((step, by.get(0, 0), by.get(1, 0), by.get(2, 0)))
        if by.get(1, 0) == 0:
            break
        if gamma == 0.0 and by.get(0, 0) == 0:
            break  # absorbing: everyone infected, nobody recovers
        inf = state.where(F.col("st") == 1).select(F.col(ID).alias(SRC))
        # S vertices receiving at least one successful contact coin
        hits = (sym.join(inf, SRC, "left_semi")
                .where(u01(F.lit(step), SRC, DST) < F.lit(beta))
                .select(F.col(DST).alias(ID)).distinct())
        newly = (state.where(F.col("st") == 0)
                 .join(hits, ID, "left_semi").select(ID))
        recovering = (state.where(F.col("st") == 1)
                      .where(u01(F.lit(step), F.col(ID)) < F.lit(gamma))
                      .select(ID))
        state = (state
                 .join(newly.withColumn("ni", F.lit(1)), ID, "left")
                 .join(recovering.withColumn("rc", F.lit(1)), ID, "left")
                 .select(ID, F.when(F.col("rc").isNotNull(), 2)
                         .when(F.col("ni").isNotNull(), 1)
                         .otherwise(F.col("st")).cast("int").alias("st"))
                 .localCheckpoint(eager=True))
    sym.unpersist()
    return spark.createDataFrame(
        counts, "step long, s long, i long, r long")
