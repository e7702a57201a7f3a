"""Structured Streaming operators.

The reference has no streaming surface (SURVEY.md §2.10) — igraph is
batch/in-memory.  What a production deployment of this engine needs,
and what lives here:

  * windowed event aggregation with watermarked late-data handling,
  * session windows,
  * a custom stateful operator (running per-user counters) via
    ``applyInPandasWithState``,
  * incremental edge ingestion: micro-batches appended to the
    partitioned edge store via ``foreachBatch``, so the iterative
    algorithms (whose state checkpointing already supports resume)
    can be re-run incrementally between batches.

Tests drive these with the file source + ``availableNow`` trigger and
a memory sink — the documented local pattern for exactly-once batch
draining.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENT_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                "event_type string, value double, props string")


def read_event_stream(spark: SparkSession, path: str,
                      schema: str = EVENT_SCHEMA) -> DataFrame:
    """File-source event stream (parquet directory)."""
    return spark.readStream.schema(schema).parquet(path)


def windowed_event_counts(events: DataFrame, window: str = "5 minutes",
                          slide: str | None = None,
                          watermark: str = "10 minutes") -> DataFrame:
    """Watermarked tumbling/sliding window aggregation ->
    (window, event_type, n, total_value)."""
    win = (F.window("ts", window, slide) if slide
           else F.window("ts", window))
    return (events
            .withWatermark("ts", watermark)
            .groupBy(win.alias("window"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.sum("value").alias("total_value")))


def sessionized(events: DataFrame, gap: str = "30 minutes",
                watermark: str = "10 minutes") -> DataFrame:
    """Session windows per user -> (session, user_id, n_events)."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.session_window("ts", gap).alias("session"),
                     "user_id")
            .agg(F.count("*").alias("n_events")))


def running_user_counts(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user running event count + value
    sum, kept in explicit group state (applyInPandasWithState) ->
    update-mode stream of (user_id, n_events, total_value)."""
    import pandas as pd

    def update(key, pdf_iter, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "total_value": [total]})

    return (events.groupBy("user_id")
            .applyInPandasWithState(
                update,
                outputStructType="user_id long, n_events long, "
                                 "total_value double",
                stateStructType="n long, total double",
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


def incremental_edge_ingest(edge_stream: DataFrame, store_path: str,
                            checkpoint_path: str, num_partitions: int = 32):
    """Append micro-batches of (src, dst, weight) into the partitioned
    edge store (parquet, hash-layout on src preserved per batch) —
    exactly-once via foreachBatch + streaming checkpoint.  Returns the
    StreamingQuery; run with trigger(availableNow=True) to drain."""

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        (batch_df
         .repartition(num_partitions, "src")
         .write.mode("append").parquet(store_path))

    return (edge_stream.writeStream
            .foreachBatch(write_batch)
            .option("checkpointLocation", checkpoint_path)
            .trigger(availableNow=True)
            .start())
