"""Scale-safe dense ranking of a distinct-key table.

The naive relabel pattern — ``dense_rank().over(Window.orderBy(col))``
over the distinct-label table, then an unconditional broadcast join —
funnels the whole table through ONE task (a no-partitionBy window is a
single-partition sort) and broadcasts an O(#labels) map.  Fine when
#labels is tiny (mesh-like graphs), wrong in exactly the 100-TB cases
this engine targets: a mostly-disconnected web/file graph or a dedup
cluster graph has Θ(V) components.

``dense_rank_map`` assigns the same 0-based ranks with no
single-partition stage:

  1. range-partition the distinct keys (parallel, bounded
     per-partition size),
  2. count rows per range partition (the only data that crosses to the
     driver — #partitions scalars),
  3. rank inside each partition with a per-partition window, offset by
     the cumulative counts folded in as literals.

The mapping is materialized (localCheckpoint) so callers can reuse it
and decide broadcast-vs-shuffle from the returned exact size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# above this many mapping rows the relabel join switches from broadcast
# to a plain (shuffled) join: 2**22 rows of (long, long) is ~64 MB
# framed — the upper edge of a comfortable broadcast (guide §3.1)
BROADCAST_ROWS = 1 << 22


def dense_rank_map(df: DataFrame, key_col: str, order_col: str,
                   out_col: str) -> tuple[DataFrame, int]:
    """Rank the rows of ``df`` by ``order_col`` ascending ->
    (mapping DataFrame(key_col, out_col) with out_col = 0-based dense
    rank, exact row count).  ``df`` must be key-distinct (one row per
    key, unique order values); ``order_col`` may equal ``key_col``.
    The mapping is eagerly materialized (localCheckpoint)."""
    spark = df.sparkSession
    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    binned = (df.select(key_col) if key_col == order_col
              else df.select(key_col, order_col))
    binned = (binned
              .repartitionByRange(parts, F.col(order_col))
              .withColumn("_pid", F.spark_partition_id())
              .persist())
    try:
        sizes = {int(r["_pid"]): int(r["n"]) for r in
                 binned.groupBy("_pid").agg(F.count("*").alias("n"))
                 .collect()}
        total = sum(sizes.values())
        if total == 0:
            mapping = (binned.select(key_col,
                                     F.lit(0).cast("long").alias(out_col))
                       .localCheckpoint(eager=True))
            return mapping, 0
        offs, acc = {}, 0
        for pid in sorted(sizes):
            offs[pid] = acc
            acc += sizes[pid]
        # cumulative offsets as a literal int->long map: #partitions
        # entries, so the expression stays O(parts) regardless of V
        off_expr = F.element_at(
            F.create_map(*[F.lit(x) for pid in sorted(offs)
                           for x in (pid, offs[pid])]),
            F.col("_pid"))
        w = Window.partitionBy("_pid").orderBy(order_col)
        mapping = (binned
                   .select(key_col,
                           (off_expr + F.row_number().over(w) - 1)
                           .cast("long").alias(out_col))
                   .localCheckpoint(eager=True))
        return mapping, total
    finally:
        binned.unpersist()


def rank_join(state: DataFrame, mapping: DataFrame, n_rows: int,
              key_col: str, how: str = "inner") -> DataFrame:
    """Join ``state`` with a ``dense_rank_map`` mapping on ``key_col``,
    broadcasting only when the mapping is small enough (guide §3.1:
    pick the strategy deliberately; an O(V)-row broadcast is a driver
    and executor memory wall, not a win)."""
    m = F.broadcast(mapping) if n_rows <= BROADCAST_ROWS else mapping
    return state.join(m, key_col, how)
