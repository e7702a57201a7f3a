"""Graph file readers/writers (SURVEY.md §2.1).

The reference's flex/bison readers (/root/reference/src/foreign.c)
become declarative reads: edge-list and NCOL map to ``spark.read.csv``
+ a vertex-name dictionary; writers are ``df.write``.  Formats outside
the engine's scope (Pajek/GML/GraphML/...) raise NotImplementedError
with a pointer, mirroring the survey's scoping decision.

Name→id dictionaries: igraph's NCOL reader interns names in first-seen
order through a trie (/root/reference/src/foreign.c:193 +
igraph_trie.c) — inherently sequential.  Distributively we assign
dense ids by sorted-name dense rank (deterministic at any parallelism)
and keep the explicit ``(id, name)`` table (SURVEY §3.3); callers that
need igraph's exact id order must single-thread that tiny dictionary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from igraph_spark.graph import Graph


def read_edgelist(spark: SparkSession, path: str, directed: bool = True,
                  sep: str = " ") -> Graph:
    """igraph_read_graph_edgelist (foreign.c:78): whitespace-separated
    integer pairs."""
    df = (spark.read.option("sep", sep).option("comment", "#")
          .schema("src long, dst long").csv(path)
          .where(F.col("src").isNotNull() & F.col("dst").isNotNull()))
    return Graph(df, directed=directed)


def read_ncol(spark: SparkSession, path: str, directed: bool = False,
              weights: bool = True, sep: str = " "
              ) -> tuple[Graph, DataFrame]:
    """igraph_read_graph_ncol (foreign.c:193): ``name name [weight]``
    lines.  Returns (graph, names) where names = DataFrame(id, name).
    """
    schema = "a string, b string" + (", weight double" if weights else "")
    raw = spark.read.option("sep", sep).schema(schema).csv(path) \
        .where(F.col("a").isNotNull() & F.col("b").isNotNull())
    names = (raw.select(F.col("a").alias("name"))
             .unionByName(raw.select(F.col("b").alias("name")))
             .distinct()
             .select((F.dense_rank().over(Window.orderBy("name")) - 1)
                     .cast("long").alias("id"), "name"))
    e = (raw
         .join(names.select(F.col("name").alias("a"),
                            F.col("id").alias("src")), "a")
         .join(names.select(F.col("name").alias("b"),
                            F.col("id").alias("dst")), "b")
         .select("src", "dst", *(["weight"] if weights else [])))
    return Graph(e, names.select("id"), directed=directed), names


def write_edgelist(graph: Graph, path: str, sep: str = " ") -> None:
    """igraph_write_graph_edgelist (foreign.c:1449)."""
    (graph.edges.select(F.col("src").cast("string"),
                        F.col("dst").cast("string"))
     .write.mode("overwrite").option("sep", sep).csv(path))


def write_ncol(graph: Graph, names: DataFrame, path: str) -> None:
    """igraph_write_graph_ncol (foreign.c:1507)."""
    e = graph.weighted_edges()
    out = (e.join(names.select(F.col("id").alias("src"),
                               F.col("name").alias("a")), "src")
           .join(names.select(F.col("id").alias("dst"),
                              F.col("name").alias("b")), "dst")
           .select("a", "b", F.col("weight").cast("string")))
    out.write.mode("overwrite").option("sep", " ").csv(path)


def read_graph(spark: SparkSession, path: str, fmt: str, **kw):
    """Dispatcher mirroring igraph's per-format readers; unsupported
    legacy formats are explicit non-goals (SURVEY.md §2.1)."""
    if fmt == "edgelist":
        return read_edgelist(spark, path, **kw)
    if fmt == "ncol":
        return read_ncol(spark, path, **kw)
    if fmt in ("pajek", "gml", "graphml", "dl", "lgl", "dimacs", "graphdb"):
        raise NotImplementedError(
            f"{fmt}: legacy single-file format, out of v1 scope "
            "(SURVEY.md §2.1); convert to edgelist/ncol/parquet")
    raise ValueError(f"unknown format {fmt!r}")
