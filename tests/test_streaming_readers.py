"""Streaming operators (availableNow + memory sink) and file readers."""

import os
import shutil

from pyspark.sql import functions as F

from igraph_spark.streaming import stream as st
from igraph_spark.sources.readers import (
    read_edgelist, read_ncol, write_edgelist, read_graph)
from igraph_spark.graph import Graph

import pytest


@pytest.fixture(scope="module")
def event_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("events_stream"))
    shutil.copy("/root/testdata/sf0.001/events.parquet",
                os.path.join(d, "part-0.parquet"))
    return d


def _drain(q):
    q.awaitTermination(120)
    q.stop()


def test_windowed_counts(spark, event_dir):
    events = st.read_event_stream(spark, event_dir)
    agg = st.windowed_event_counts(events, window="1 hour",
                                   watermark="1 hour")
    q = (agg.writeStream.outputMode("append").format("memory")
         .queryName("win_out").trigger(availableNow=True).start())
    _drain(q)
    out = spark.sql("SELECT * FROM win_out")
    # append mode emits only watermark-closed windows; compare those
    # against the batch equivalent
    batch = (spark.read.parquet(f"{event_dir}/part-0.parquet")
             .groupBy(F.window("ts", "1 hour").alias("window"), "event_type")
             .agg(F.count("*").alias("n")))
    got = {(str(r["window"]), r["event_type"]): r["n"] for r in out.collect()}
    want = {(str(r["window"]), r["event_type"]): r["n"]
            for r in batch.collect()}
    assert got
    for k, v in got.items():
        assert want[k] == v


def test_running_user_counts(spark, event_dir):
    events = st.read_event_stream(spark, event_dir)
    out = st.running_user_counts(events)
    q = (out.writeStream.outputMode("update").format("memory")
         .queryName("state_out").trigger(availableNow=True).start())
    _drain(q)
    got = {r["user_id"]: r["n_events"]
           for r in spark.sql(
               "SELECT user_id, max(n_events) AS n_events FROM state_out "
               "GROUP BY user_id").collect()}
    want = {r["user_id"]: r["n"]
            for r in spark.read.parquet(f"{event_dir}/part-0.parquet")
            .groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    assert got == want


def test_incremental_edge_ingest(spark, event_dir, tmp_path):
    store = str(tmp_path / "edge_store")
    ckpt = str(tmp_path / "ckpt")
    events = st.read_event_stream(spark, event_dir)
    edges = events.select(F.col("user_id").alias("src"),
                          F.pmod(F.col("event_id"), F.lit(50)).alias("dst"),
                          F.lit(1.0).alias("weight"))
    q = st.incremental_edge_ingest(edges, store, ckpt, num_partitions=4)
    _drain(q)
    stored = spark.read.parquet(store)
    n_events = spark.read.parquet(f"{event_dir}/part-0.parquet").count()
    assert stored.count() == n_events
    # the ingested store feeds the batch engine directly
    g = Graph(stored, directed=True)
    assert g.degree("out").count() > 0


def test_edgelist_roundtrip(spark, tmp_path):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 0)], n=3,
                             directed=True)
    path = str(tmp_path / "el")
    write_edgelist(g, path)
    g2 = read_edgelist(spark, path, directed=True)
    assert sorted((r.src, r.dst) for r in g2.edges.collect()) == \
        [(0, 1), (1, 2), (2, 0)]


def test_ncol_reader(spark, tmp_path):
    p = tmp_path / "g.ncol"
    p.write_text("alice bob 2.0\nbob carol 1.5\ncarol alice 1.0\n")
    g, names = read_ncol(spark, str(p), directed=False, weights=True)
    nm = {r["name"]: r["id"] for r in names.collect()}
    assert nm == {"alice": 0, "bob": 1, "carol": 2}  # sorted dense rank
    assert g.ecount() == 3
    s = {r["id"]: r["strength"] for r in g.strength().collect()}
    assert abs(s[nm["alice"]] - 3.0) < 1e-12


def test_read_graph_dispatch(spark, tmp_path):
    # graphdb gained a real reader this round: dispatch round-trips
    from igraph_spark.sources.readers import write_graphdb
    g = Graph(spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long"),
              spark.range(3).toDF("id"), directed=False)
    p = str(tmp_path / "tiny.graphdb")
    write_graphdb(g, p)
    rt = read_graph(spark, p, "graphdb")
    assert sorted(map(tuple, rt.edges.select("src", "dst").collect())) == \
        [(0, 1), (1, 2)]
    with pytest.raises(ValueError):
        read_graph(spark, "x", "nope")
