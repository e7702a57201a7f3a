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
              weights: bool = True, sep: str = " ",
              id_order: str = "sorted") -> tuple[Graph, DataFrame]:
    """igraph_read_graph_ncol (foreign.c:193): ``name name [weight]``
    lines.  Returns (graph, names) where names = DataFrame(id, name).

    ``id_order``: 'sorted' (default — sorted-name dense rank, the
    parallelism-friendly dictionary policy, module docstring) or
    'first_seen' — igraph's exact trie semantics: ids assigned in order
    of first appearance scanning the file sequentially (source name
    before target within a line).  first_seen needs global token
    positions, which only exist for this inherently single-file legacy
    format — the one zipWithIndex in the package."""
    schema = "a string, b string" + (", weight double" if weights else "")
    raw = spark.read.option("sep", sep).schema(schema).csv(path) \
        .where(F.col("a").isNotNull() & F.col("b").isNotNull())
    if id_order == "first_seen":
        toks = (raw.select("a", "b").rdd
                .zipWithIndex()
                .flatMap(lambda t: [(t[0]["a"], 2 * t[1]),
                                    (t[0]["b"], 2 * t[1] + 1)])
                .toDF(["name", "pos"]))
        names = (toks.groupBy("name").agg(F.min("pos").alias("first_pos"))
                 .select((F.dense_rank().over(Window.orderBy("first_pos"))
                          - 1).cast("long").alias("id"), "name"))
    else:
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


def read_graphml(spark: SparkSession, path: str
                 ) -> tuple[Graph, DataFrame]:
    """igraph_read_graph_graphml analog
    (/root/reference/src/foreign-graphml.c) via Spark's built-in XML
    source (two declarative scans, rowTag 'node' and 'edge') ->
    (graph, names) with names = DataFrame(id, name).

    Node names map to dense long ids by sorted-name rank (same
    dictionary policy as NCOL, module docstring).  ``edgedefault`` on
    the <graph> element decides directedness.  Edge <data> with a
    key resolving to a double 'weight' attribute becomes the weight
    column; other attributes are out of scope (documented)."""
    nodes = (spark.read.format("xml").option("rowTag", "node").load(path)
             .select(F.col("_id").cast("string").alias("name")))
    edges_raw = spark.read.format("xml").option("rowTag", "edge").load(path)
    gattr = (spark.read.format("xml").option("rowTag", "graph")
             .option("excludeAttribute", "false").load(path))
    directed = False
    if "_edgedefault" in gattr.columns:
        row = gattr.select("_edgedefault").first()
        directed = (row[0] == "directed") if row else False

    names = (nodes.distinct()
             .select((F.dense_rank().over(Window.orderBy("name")) - 1)
                     .cast("long").alias("id"), "name"))
    e = edges_raw.select(F.col("_source").cast("string").alias("a"),
                         F.col("_target").cast("string").alias("b"))
    # single <data> child -> struct, multiple -> array<struct>; a key
    # literally named 'weight' (or d_weight per common convention) is
    # taken as the edge weight
    if "data" in edges_raw.columns:
        dt = dict(edges_raw.schema["data"].dataType.jsonValue() or {})
        is_array = dt.get("type") == "array"
        data = F.col("data") if is_array else F.array(F.col("data"))
        w = F.filter(data, lambda d: d["_key"].isin("weight", "d_weight"))
        e = edges_raw.select(
            F.col("_source").cast("string").alias("a"),
            F.col("_target").cast("string").alias("b"),
            F.when(F.size(w) > 0, F.element_at(w, 1)["_VALUE"]
                   .cast("double")).alias("weight"))
        if e.where(F.col("weight").isNotNull()).isEmpty():
            e = e.drop("weight")
    g_edges = (e
               .join(names.select(F.col("name").alias("a"),
                                  F.col("id").alias("src")), "a")
               .join(names.select(F.col("name").alias("b"),
                                  F.col("id").alias("dst")), "b")
               .drop("a", "b"))
    cols = ["src", "dst"] + [c for c in g_edges.columns
                             if c not in ("src", "dst")]
    return Graph(g_edges.select(*cols), names.select("id"),
                 directed=directed), names


def write_graphml(graph: Graph, names: DataFrame | None, path: str) -> None:
    """igraph_write_graph_graphml analog (foreign-graphml.c writer).

    GraphML is a single XML document, so there is exactly one writer —
    rows are streamed to the driver via ``toLocalIterator`` (constant
    driver memory; the reference's writer is the same sequential file
    IO).  ``names`` maps ids to node names; None uses the numeric ids.
    """
    has_w = graph.has_weights
    if names is None:
        names = graph.vertices.select(
            F.col("id"), F.col("id").cast("string").alias("name"))
    e = graph.weighted_edges() if has_w else graph.edges.select("src", "dst")
    e = (e.join(names.select(F.col("id").alias("src"),
                             F.col("name").alias("sname")), "src")
         .join(names.select(F.col("id").alias("dst"),
                            F.col("name").alias("tname")), "dst"))
    with open(path, "w") as fh:
        fh.write('<?xml version="1.0" encoding="UTF-8"?>\n')
        fh.write('<graphml xmlns="http://graphml.graphdrawing.org/xmlns">\n')
        if has_w:
            fh.write('  <key id="weight" for="edge" attr.name="weight"'
                     ' attr.type="double"/>\n')
        mode = "directed" if graph.directed else "undirected"
        fh.write(f'  <graph id="G" edgedefault="{mode}">\n')
        for r in names.orderBy("id").toLocalIterator():
            fh.write(f'    <node id="{r["name"]}"/>\n')
        for r in e.toLocalIterator():
            if has_w:
                fh.write(f'    <edge source="{r["sname"]}" '
                         f'target="{r["tname"]}">'
                         f'<data key="weight">{r["weight"]!r}</data>'
                         f'</edge>\n')
            else:
                fh.write(f'    <edge source="{r["sname"]}" '
                         f'target="{r["tname"]}"/>\n')
        fh.write('  </graph>\n</graphml>\n')


def read_gml(spark: SparkSession, path: str) -> tuple[Graph, DataFrame]:
    """igraph_read_graph_gml analog (/root/reference/src/foreign.c:1096)
    -> (graph, names).  The single-document format is read wholetext
    and the node/edge blocks are exploded with Catalyst regex — no
    per-row Python.  Supported keys: node id/label, edge source/target/
    value (-> weight), graph-level ``directed 0|1``."""
    txt = spark.read.text(path, wholetext=True).select(
        F.col("value").alias("doc"))
    directed_row = txt.select(
        F.regexp_extract("doc", r"directed\s+(\d)", 1).alias("d")).first()
    directed = directed_row.d == "1"

    nodes = (txt.select(F.explode(F.regexp_extract_all(
                "doc", F.lit(r"node\s*\[([^\]]*)\]"), 1)).alias("blk"))
             .select(F.regexp_extract("blk", r"id\s+(-?\d+)", 1)
                     .cast("long").alias("gml_id"),
                     F.regexp_extract("blk", r'label\s+"([^"]*)"', 1)
                     .alias("name")))
    nodes = nodes.select(
        "gml_id",
        F.when(F.col("name") == "", F.col("gml_id").cast("string"))
         .otherwise(F.col("name")).alias("name"))
    names = nodes.select(
        (F.dense_rank().over(Window.orderBy("gml_id")) - 1)
        .cast("long").alias("id"), "gml_id", "name")

    edges = (txt.select(F.explode(F.regexp_extract_all(
                "doc", F.lit(r"edge\s*\[([^\]]*)\]"), 1)).alias("blk"))
             .select(F.regexp_extract("blk", r"source\s+(-?\d+)", 1)
                     .cast("long").alias("gs"),
                     F.regexp_extract("blk", r"target\s+(-?\d+)", 1)
                     .cast("long").alias("gt"),
                     F.regexp_extract("blk", r"value\s+([-0-9.eE]+)", 1)
                     .alias("val")))
    e = (edges
         .join(names.select(F.col("gml_id").alias("gs"),
                            F.col("id").alias("src")), "gs")
         .join(names.select(F.col("gml_id").alias("gt"),
                            F.col("id").alias("dst")), "gt"))
    if edges.where(F.col("val") != "").isEmpty():
        e = e.select("src", "dst")
    else:
        e = e.select("src", "dst",
                     F.when(F.col("val") == "", F.lit(1.0))
                      .otherwise(F.col("val").cast("double"))
                      .alias("weight"))
    return Graph(e, names.select("id"), directed=directed), \
        names.select("id", "name")


def write_gml(graph: Graph, names: DataFrame | None, path: str) -> None:
    """igraph_write_graph_gml analog (foreign.c writer): streamed
    single-document writer like write_graphml."""
    has_w = graph.has_weights
    if names is None:
        names = graph.vertices.select(
            F.col("id"), F.col("id").cast("string").alias("name"))
    e = graph.weighted_edges() if has_w else graph.edges.select("src", "dst")
    with open(path, "w") as fh:
        fh.write("graph [\n")
        fh.write(f"  directed {1 if graph.directed else 0}\n")
        for r in names.orderBy("id").toLocalIterator():
            fh.write(f'  node [ id {r["id"]} label "{r["name"]}" ]\n')
        for r in e.toLocalIterator():
            if has_w:
                fh.write(f'  edge [ source {r["src"]} target {r["dst"]}'
                         f' value {r["weight"]!r} ]\n')
            else:
                fh.write(f'  edge [ source {r["src"]} '
                         f'target {r["dst"]} ]\n')
        fh.write("]\n")


def read_graph(spark: SparkSession, path: str, fmt: str, **kw):
    """Dispatcher mirroring igraph's per-format readers; unsupported
    legacy formats are explicit non-goals (SURVEY.md §2.1)."""
    if fmt == "edgelist":
        return read_edgelist(spark, path, **kw)
    if fmt == "ncol":
        return read_ncol(spark, path, **kw)
    if fmt == "graphml":
        return read_graphml(spark, path, **kw)
    if fmt == "gml":
        return read_gml(spark, path, **kw)
    if fmt in ("pajek", "dl", "lgl", "dimacs", "graphdb"):
        raise NotImplementedError(
            f"{fmt}: legacy single-file format, out of v1 scope "
            "(SURVEY.md §2.1); convert to edgelist/ncol/parquet/"
            "graphml/gml")
    raise ValueError(f"unknown format {fmt!r}")
