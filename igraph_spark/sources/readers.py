"""Graph file readers/writers (SURVEY.md §2.1).

The reference's flex/bison readers (/root/reference/src/foreign.c)
become declarative reads: edge-list, NCOL and DIMACS map to
``spark.read.csv`` + a vertex-name dictionary; the single-document
formats (GraphML/GML/Pajek/LGL/DL) are one wholetext row exploded with
Catalyst regex — no per-row Python anywhere.  Writers for splittable
formats are ``df.write``; single-document writers stream through
``toLocalIterator`` (constant driver memory, same sequential file IO
as the reference's writers).

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


def _xml_escape(s) -> str:
    """Entity-escape a vertex name for XML output (igraph does the same
    via igraph_i_xml_escape before writing GraphML)."""
    return (str(s).replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace('"', "&quot;"))


def _gml_escape(s) -> str:
    """GML string escaping (entities, like igraph's GML writer)."""
    return str(s).replace("&", "&amp;").replace('"', "&quot;")


def _gml_unescape_col(c):
    return F.regexp_replace(F.regexp_replace(c, "&quot;", '"'),
                            "&amp;", "&")


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
            fh.write(f'    <node id="{_xml_escape(r["name"])}"/>\n')
        for r in e.toLocalIterator():
            if has_w:
                fh.write(f'    <edge source="{_xml_escape(r["sname"])}" '
                         f'target="{_xml_escape(r["tname"])}">'
                         f'<data key="weight">{r["weight"]!r}</data>'
                         f'</edge>\n')
            else:
                fh.write(f'    <edge source="{_xml_escape(r["sname"])}" '
                         f'target="{_xml_escape(r["tname"])}"/>\n')
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
                     _gml_unescape_col(
                         F.regexp_extract("blk", r'label\s+"([^"]*)"', 1))
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
            fh.write(f'  node [ id {r["id"]} '
                     f'label "{_gml_escape(r["name"])}" ]\n')
        for r in e.toLocalIterator():
            if has_w:
                fh.write(f'  edge [ source {r["src"]} target {r["dst"]}'
                         f' value {r["weight"]!r} ]\n')
            else:
                fh.write(f'  edge [ source {r["src"]} '
                         f'target {r["dst"]} ]\n')
        fh.write("]\n")


def _doc(spark: SparkSession, path: str):
    """Whole-file single-document scan (shared by the legacy
    single-document formats: GML, Pajek, LGL, DL)."""
    return spark.read.text(path, wholetext=True).select(
        F.col("value").alias("doc"))


def read_pajek(spark: SparkSession, path: str
               ) -> tuple[Graph, DataFrame]:
    """igraph_read_graph_pajek analog
    (/root/reference/src/foreign.c:478 + foreign-pajek-parser.y) ->
    (graph, names).

    Sections handled: ``*Vertices`` (1-based ids + optional quoted
    labels), ``*Arcs`` (directed), ``*Edges`` (undirected), ``*Matrix``
    (full adjacency, signed weights kept), ``*Arcslist`` /
    ``*Edgeslist`` (adjacency lists).  The graph is directed iff an
    arcs/arcslist/matrix section appears (Pajek's own convention —
    matrices are row->column).  Pajek ids are 1-based; we keep igraph's
    0-based dense ids (= pajek_id - 1, padded to the *Vertices count so
    isolated trailing vertices survive).  Layout/visual tokens after
    the label are ignored, like the reference parser.

    Parsing is two Catalyst passes over one wholetext row (split on
    section markers, explode, regex per line) — same plan shape as
    read_gml; the format is inherently one document, so a single-row
    scan is the honest distribution story (the 10^12-file corpus
    arrives as parquet, not .net).
    """
    txt = _doc(spark, path)
    # sections: split the doc at line-leading '*'; first line of each
    # piece is the header.
    secs = (txt.select(F.posexplode(F.split("doc", r"(?m)^\*"))
                       .alias("pos", "sec"))
            .where(F.col("sec") != "")
            .select("pos",
                    F.lower(F.regexp_extract("sec", r"^(\w+)", 1))
                    .alias("kind"),
                    F.regexp_extract("sec", r"^\w+\s+(\d+)", 1)
                    .alias("count"),
                    F.slice(F.split("sec", r"\r?\n"), 2, 2 ** 30)
                    .alias("lines")))
    secs = secs.persist()
    kinds = {r["kind"] for r in secs.select("kind").distinct().collect()}
    directed = bool(kinds & {"arcs", "arcslist", "matrix"})

    lines = (secs.select("kind", "count",
                         F.posexplode("lines").alias("ln", "line"))
             .select("kind", "count", "ln",
                     F.trim(F.regexp_replace("line", r"%.*$", ""))
                     .alias("line"))
             .where(F.col("line") != ""))
    lines = lines.persist()

    nv_row = secs.where(F.col("kind") == "vertices") \
        .select(F.col("count").cast("long")).first()
    n_vertices = int(nv_row[0]) if nv_row and nv_row[0] is not None else 0

    vlines = lines.where(F.col("kind") == "vertices").select(
        F.regexp_extract("line", r"^(\d+)", 1).cast("long").alias("pid"),
        F.regexp_extract("line", r'^\d+\s+"([^"]*)"', 1).alias("label"))
    names = (vlines
             .select((F.col("pid") - 1).alias("id"),
                     F.when(F.col("label") == "",
                            (F.col("pid") - 1).cast("string"))
                     .otherwise(F.col("label")).alias("name")))
    if n_vertices:
        allv = spark.range(n_vertices).select(F.col("id"))
        names = (allv.join(names, "id", "left")
                 .select("id", F.coalesce("name", F.col("id").cast("string"))
                         .alias("name")))

    def pair_lines(kind: str) -> DataFrame:
        toks = lines.where(F.col("kind") == kind).select(
            F.split("line", r"\s+").alias("t"))
        return toks.select(
            (F.element_at("t", 1).cast("long") - 1).alias("src"),
            (F.element_at("t", 2).cast("long") - 1).alias("dst"),
            F.try_element_at("t", F.lit(3)).cast("double")
            .alias("weight"))

    def list_lines(kind: str) -> DataFrame:
        toks = lines.where(F.col("kind") == kind).select(
            F.split("line", r"\s+").alias("t"))
        return toks.select(
            (F.element_at("t", 1).cast("long") - 1).alias("src"),
            F.explode(F.slice("t", 2, 2 ** 30)).alias("d")) \
            .select("src", (F.col("d").cast("long") - 1).alias("dst"),
                    F.lit(None).cast("double").alias("weight"))

    arcs = pair_lines("arcs").unionByName(list_lines("arcslist"))
    edges = pair_lines("edges").unionByName(list_lines("edgeslist"))
    if directed:
        # undirected *Edges lines inside a directed file -> both arcs
        # (the reference materializes them as two directed edges)
        edges = edges.unionByName(
            edges.select(F.col("dst").alias("src"),
                         F.col("src").alias("dst"), "weight"))
    mat = (lines.where(F.col("kind") == "matrix")
           .select("ln", F.posexplode(F.split("line", r"\s+"))
                   .alias("col", "v"))
           .select(F.col("ln").cast("long").alias("src"),
                   F.col("col").cast("long").alias("dst"),
                   F.col("v").cast("double").alias("weight"))
           .where(F.col("weight") != 0.0))
    e = arcs.unionByName(edges).unionByName(mat) \
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
    if e.where(F.col("weight").isNotNull()).isEmpty():
        e = e.select("src", "dst")
    else:
        e = e.select("src", "dst",
                     F.coalesce("weight", F.lit(1.0)).alias("weight"))
    secs.unpersist()
    lines.unpersist()
    return Graph(e, names.select("id"), directed=directed), names


def write_pajek(graph: Graph, names: DataFrame | None, path: str) -> None:
    """igraph_write_graph_pajek analog (foreign.c writer): streamed
    single-document writer (constant driver memory, like write_gml)."""
    has_w = graph.has_weights
    if names is None:
        names = graph.vertices.select(
            F.col("id"), F.col("id").cast("string").alias("name"))
    n = names.count()
    e = graph.weighted_edges() if has_w else graph.edges.select("src", "dst")
    with open(path, "w") as fh:
        fh.write(f"*Vertices {n}\n")
        for r in names.orderBy("id").toLocalIterator():
            # Pajek quoted labels have no escape syntax; embedded double
            # quotes are substituted (documented lossy, keeps the file
            # parseable by read_pajek and by Pajek itself)
            label = str(r["name"]).replace('"', "''")
            fh.write(f'{r["id"] + 1} "{label}"\n')
        fh.write("*Arcs\n" if graph.directed else "*Edges\n")
        for r in e.toLocalIterator():
            if has_w:
                fh.write(f'{r["src"] + 1} {r["dst"] + 1} {r["weight"]!r}\n')
            else:
                fh.write(f'{r["src"] + 1} {r["dst"] + 1}\n')


def read_lgl(spark: SparkSession, path: str, directed: bool = False
             ) -> tuple[Graph, DataFrame]:
    """igraph_read_graph_lgl analog (foreign.c:358): ``# source`` lines
    introduce a vertex, following lines are its neighbours with an
    optional weight.  Returns (graph, names); names use the sorted-rank
    dictionary policy (module docstring)."""
    txt = _doc(spark, path)
    blocks = (txt.select(F.explode(F.split("doc", r"(?m)^#")).alias("blk"))
              .where(F.trim("blk") != "")
              .select(F.split(F.trim("blk"), r"\r?\n").alias("ls"))
              .select(F.trim(F.element_at("ls", 1)).alias("a"),
                      F.slice("ls", 2, 2 ** 30).alias("rest")))
    pairs = (blocks.select("a", F.explode("rest").alias("line"))
             .select("a", F.split(F.trim("line"), r"\s+").alias("t"))
             .where(F.element_at("t", 1) != "")
             .select("a", F.element_at("t", 1).alias("b"),
                     F.try_element_at("t", F.lit(2)).cast("double")
                     .alias("weight")))
    has_w = not pairs.where(F.col("weight").isNotNull()).isEmpty()
    verts = (blocks.select(F.col("a").alias("name"))
             .unionByName(pairs.select(F.col("b").alias("name")))
             .where(F.col("name") != "").distinct())
    names = verts.select(
        (F.dense_rank().over(Window.orderBy("name")) - 1)
        .cast("long").alias("id"), "name")
    e = (pairs
         .join(names.select(F.col("name").alias("a"),
                            F.col("id").alias("src")), "a")
         .join(names.select(F.col("name").alias("b"),
                            F.col("id").alias("dst")), "b"))
    e = e.select("src", "dst", *(["weight"] if has_w else []))
    if has_w:
        e = e.withColumn("weight", F.coalesce("weight", F.lit(1.0)))
    return Graph(e, names.select("id"), directed=directed), names


def write_lgl(graph: Graph, names: DataFrame | None, path: str,
              isolates: bool = True) -> None:
    """igraph_write_graph_lgl analog (foreign.c:1553)."""
    has_w = graph.has_weights
    if names is None:
        names = graph.vertices.select(
            F.col("id"), F.col("id").cast("string").alias("name"))
    e = graph.weighted_edges() if has_w else graph.edges.select("src", "dst")
    e = (e.join(names.select(F.col("id").alias("src"),
                             F.col("name").alias("a")), "src")
         .join(names.select(F.col("id").alias("dst"),
                            F.col("name").alias("b")), "dst"))
    grouped = (e.groupBy("a").agg(F.collect_list(
        F.struct("b", *(["weight"] if has_w else []))).alias("nbrs")))
    written = set()
    with open(path, "w") as fh:
        for r in grouped.orderBy("a").toLocalIterator():
            fh.write(f'# {r["a"]}\n')
            written.add(r["a"])
            for nb in r["nbrs"]:
                if has_w:
                    fh.write(f'{nb["b"]} {nb["weight"]!r}\n')
                else:
                    fh.write(f'{nb["b"]}\n')
        if isolates:
            for r in names.orderBy("name").toLocalIterator():
                if r["name"] not in written:
                    fh.write(f'# {r["name"]}\n')


def read_dimacs(spark: SparkSession, path: str, directed: bool = True):
    """igraph_read_graph_dimacs analog (foreign.c:823): the DIMACS
    max-flow (``p max``) and edge (``p edge``) formats.

    Returns (graph, source, target) — source/target are vertex ids for
    the ``max`` problem (None for ``edge``); arc capacities become the
    ``weight`` column.  Unlike the other legacy formats this one is
    line-oriented and order-free, so the scan is a plain distributed
    CSV read — the only legacy format that stays splittable at scale.
    """
    raw = (spark.read.schema("line string").option("sep", "\x01")
           .csv(path)
           .select(F.trim("line").alias("line"))
           .where((F.col("line") != "") & ~F.col("line").startswith("c")))
    raw = raw.persist()
    prob = raw.where(F.col("line").startswith("p")).select(
        F.regexp_extract("line", r"^p\s+(\w+)", 1).alias("kind")).first()
    kind = prob["kind"] if prob else "edge"
    src_t, tgt_t = None, None
    if kind == "max":
        nodes = raw.where(F.col("line").rlike(r"^n\s")).select(
            (F.regexp_extract("line", r"^n\s+(\d+)", 1).cast("long") - 1)
            .alias("id"),
            F.regexp_extract("line", r"^n\s+\d+\s+(\w)", 1).alias("role"))
        for r in nodes.collect():
            if r["role"] == "s":
                src_t = int(r["id"])
            elif r["role"] == "t":
                tgt_t = int(r["id"])
        e = raw.where(F.col("line").rlike(r"^a\s")).select(
            (F.regexp_extract("line", r"^a\s+(\d+)", 1).cast("long") - 1)
            .alias("src"),
            (F.regexp_extract("line", r"^a\s+\d+\s+(\d+)", 1)
             .cast("long") - 1).alias("dst"),
            F.regexp_extract("line", r"^a\s+\d+\s+\d+\s+([-0-9.eE]+)", 1)
            .cast("double").alias("weight"))
    else:
        e = raw.where(F.col("line").rlike(r"^[ae]\s")).select(
            (F.regexp_extract("line", r"^[ae]\s+(\d+)", 1).cast("long") - 1)
            .alias("src"),
            (F.regexp_extract("line", r"^[ae]\s+\d+\s+(\d+)", 1)
             .cast("long") - 1).alias("dst"))
    nv_row = raw.where(F.col("line").startswith("p")).select(
        F.regexp_extract("line", r"^p\s+\w+\s+(\d+)", 1).cast("long")).first()
    raw.unpersist()
    verts = spark.range(int(nv_row[0])).select("id") if nv_row and \
        nv_row[0] is not None else None
    return Graph(e, verts, directed=directed), src_t, tgt_t


def write_dimacs(graph: Graph, path: str, source: int = 0,
                 target: int = 1) -> None:
    """igraph_write_graph_dimacs analog (foreign.c:1694): max-flow
    format; the weight column (default 1) becomes arc capacity."""
    n = graph.vcount()
    m = graph.ecount()
    e = graph.weighted_edges()
    with open(path, "w") as fh:
        fh.write(f"p max {n} {m}\n")
        fh.write(f"n {source + 1} s\n")
        fh.write(f"n {target + 1} t\n")
        for r in e.toLocalIterator():
            w = r["weight"]
            cap = int(w) if float(w).is_integer() else w
            fh.write(f'a {r["src"] + 1} {r["dst"] + 1} {cap}\n')


def read_dl(spark: SparkSession, path: str, directed: bool = True
            ) -> tuple[Graph, DataFrame]:
    """igraph_read_graph_dl analog (foreign-dl-parser.y): UCINET DL —
    ``fullmatrix`` (default), ``edgelist1`` and ``nodelist1`` formats,
    with optional ``labels:`` (comma-separated, possibly multi-line)
    and ``labels embedded``.  Returns (graph, names); ids are 0-based
    row order (matrix) / 1-based data ids minus one (lists), matching
    the reference's output ids (igraph_read_graph_dl.out).

    This is FULL reference parity: the reference grammar
    (foreign-dl-parser.y:106-123) accepts exactly these three formats
    and no others — UCINET's wider spec (upperhalf/lowerhalf/
    blockmatrix/...) is rejected by the reference too, so the
    NotImplementedError below fires only on inputs the reference
    also fails to parse."""
    txt = _doc(spark, path)
    hdr = txt.select(
        F.regexp_extract(F.lower("doc"), r"n\s*=\s*(\d+)", 1)
        .cast("long").alias("n"),
        F.regexp_extract(F.lower("doc"), r"format\s*=\s*(\w+)", 1)
        .alias("fmt"),
        F.regexp_extract(
            "doc", r"(?is)labels:\s*\n(.*?)(?=\n\s*(?:data|format|labels)\b)",
            1).alias("labels_blk"),
        (F.lower("doc").rlike(r"labels\s+embedded")).alias("embedded"),
        F.regexp_extract("doc", r"(?is)data:\s*\n(.*)$", 1).alias("data")
    ).first()
    n = int(hdr["n"]) if hdr["n"] is not None else 0
    fmt = hdr["fmt"] or "fullmatrix"
    label_list = [s.strip() for chunk in hdr["labels_blk"].split("\n")
                  for s in chunk.split(",") if s.strip()]

    data_lines = (spark.createDataFrame(
        [(i, ln.strip()) for i, ln in enumerate(hdr["data"].split("\n"))
         if ln.strip()], "ln long, line string"))

    if label_list:
        names = spark.createDataFrame(
            [(i, s) for i, s in enumerate(label_list)], "id long, name string")
    else:
        names = spark.range(n).select(
            "id", F.col("id").cast("string").alias("name"))

    if fmt == "fullmatrix":
        cells = (data_lines
                 .select((F.dense_rank().over(Window.orderBy("ln")) - 1)
                         .cast("long").alias("src"),
                         F.posexplode(F.split("line", r"\s+"))
                         .alias("dst", "v"))
                 .select("src", F.col("dst").cast("long").alias("dst"),
                         F.col("v").cast("double").alias("w"))
                 .where(F.col("w") != 0.0))
        if cells.where(F.col("w") != 1.0).isEmpty():
            e = cells.select("src", "dst")
        else:
            e = cells.select("src", "dst", F.col("w").alias("weight"))
    else:
        toks = data_lines.select(F.split("line", r"\s+").alias("t"))
        if fmt == "edgelist1":
            pairs = toks.select(F.element_at("t", 1).alias("a"),
                                F.element_at("t", 2).alias("b"),
                                F.try_element_at("t", F.lit(3)).cast("double")
                                .alias("weight"))
        elif fmt == "nodelist1":
            pairs = toks.select(
                F.element_at("t", 1).alias("a"),
                F.explode(F.slice("t", 2, 2 ** 30)).alias("b"),
                F.lit(None).cast("double").alias("weight"))
        else:
            raise NotImplementedError(f"DL format {fmt!r}")
        if hdr["embedded"]:
            e = (pairs
                 .join(names.select(F.col("name").alias("a"),
                                    F.col("id").alias("src")), "a")
                 .join(names.select(F.col("name").alias("b"),
                                    F.col("id").alias("dst")), "b"))
        else:
            e = pairs.select((F.col("a").cast("long") - 1).alias("src"),
                             (F.col("b").cast("long") - 1).alias("dst"),
                             "weight")
        if e.where(F.col("weight").isNotNull()).isEmpty():
            e = e.select("src", "dst")
        else:
            e = e.select("src", "dst",
                         F.coalesce("weight", F.lit(1.0)).alias("weight"))
    verts = spark.range(n).select("id") if n else names.select("id")
    return Graph(e, verts, directed=directed), names


def write_dot(graph: Graph, names: DataFrame | None, path: str) -> None:
    """igraph_write_graph_dot analog (foreign.c:2111): GraphViz dot."""
    has_w = graph.has_weights
    if names is None:
        names = graph.vertices.select(
            F.col("id"), F.col("id").cast("string").alias("name"))
    e = graph.weighted_edges() if has_w else graph.edges.select("src", "dst")
    arrow = "->" if graph.directed else "--"
    with open(path, "w") as fh:
        fh.write(("digraph" if graph.directed else "graph") + " G {\n")
        for r in names.orderBy("id").toLocalIterator():
            fh.write(f'  {r["id"]} [label="{r["name"]}"];\n')
        for r in e.toLocalIterator():
            attr = f' [weight={r["weight"]!r}]' if has_w else ""
            fh.write(f'  {r["src"]} {arrow} {r["dst"]}{attr};\n')
        fh.write("}\n")


def write_leda(graph: Graph, names: DataFrame | None, path: str) -> None:
    """igraph_write_graph_leda analog (foreign.c:3151): LEDA.GRAPH
    native format, 1-based ids, optional string node labels."""
    if names is None:
        names = graph.vertices.select(
            F.col("id"), F.col("id").cast("string").alias("name"))
    n = names.count()
    has_w = graph.has_weights
    e = graph.weighted_edges() if has_w else graph.edges.select("src", "dst")
    m = e.count()
    with open(path, "w") as fh:
        fh.write("LEDA.GRAPH\nstring\n")
        fh.write(("int" if has_w else "void") + "\n")
        fh.write(("-1" if graph.directed else "-2") + "\n")
        fh.write(f"{n}\n")
        for r in names.orderBy("id").toLocalIterator():
            fh.write("|{" + str(r["name"]) + "}|\n")
        fh.write(f"{m}\n")
        for r in e.toLocalIterator():
            data = repr(r["weight"]) if has_w else ""
            fh.write(f'{r["src"] + 1} {r["dst"] + 1} 0 ' + "|{"
                     + data + "}|\n")


def read_graphdb(spark: SparkSession, path: str,
                 directed: bool = False) -> Graph:
    """igraph_read_graph_graphdb (/root/reference/src/foreign.c:927):
    the binary graph-database format for isomorphism benchmarking —
    16-bit little-endian words; first word is the vertex count, then
    per vertex an out-edge count followed by that many target ids.

    One graph per file, mirroring the reference (one graph per
    stream).  Parsing is one numpy ``frombuffer`` per file inside
    ``mapInPandas`` — the driver never touches the bytes."""
    df = read_graphdb_db(spark, path)
    return Graph(df.select("src", "dst"), directed=directed)


def read_graphdb_db(spark: SparkSession, path: str) -> DataFrame:
    """Read a DIRECTORY (or glob) of graphdb binary files as a graph
    database -> DataFrame(gid: string, src, dst) with one gid per
    file — the (gid, src, dst) layout algorithms.fsm consumes.  Files
    parse in parallel across executors (binaryFile source)."""
    bin_df = spark.read.format("binaryFile").load(path) \
        .select("path", "content")

    def parse(batches):
        import numpy as np
        import pandas as pd
        for pdf in batches:
            out_gid, out_src, out_dst = [], [], []
            for gid, blob in zip(pdf["path"], pdf["content"]):
                # igraph_read_graph_graphdb raises "Truncated graphdb
                # file" (foreign.c) rather than keeping a prefix.
                # (A zero-byte file never reaches here: the binaryFile
                # source skips empty files at listing time.)
                if len(blob) % 2:
                    raise ValueError(
                        f"Truncated graphdb file (odd byte count): {gid}")
                words = np.frombuffer(blob, dtype="<u2").astype("int64")
                if len(words) == 0:
                    raise ValueError(
                        f"Truncated graphdb file (empty): {gid}")
                pos = 0
                n = int(words[pos]); pos += 1
                for i in range(n):
                    if pos >= len(words):
                        raise ValueError(
                            f"Truncated graphdb file: {gid} (word "
                            f"stream ended at vertex {i} of {n})")
                    deg = int(words[pos]); pos += 1
                    tgts = words[pos:pos + deg]
                    if len(tgts) < deg:
                        raise ValueError(
                            f"Truncated graphdb file: {gid} (vertex "
                            f"{i} declares {deg} targets, "
                            f"{len(tgts)} present)")
                    pos += deg
                    out_gid.extend([gid] * len(tgts))
                    out_src.extend([i] * len(tgts))
                    out_dst.extend(tgts.tolist())
            yield pd.DataFrame({"gid": out_gid, "src": out_src,
                                "dst": out_dst})

    return bin_df.mapInPandas(parse, "gid string, src long, dst long")


def write_graphdb(graph: Graph, path: str) -> None:
    """graphdb binary writer (inverse of foreign.c:927; the reference
    has no writer — provided for round-tripping test fixtures).
    Vertex ids must fit 16 bits."""
    import struct
    n = graph.vcount()
    if n >= 1 << 16:
        raise ValueError("graphdb format is 16-bit; graph too large")
    adj: dict[int, list[int]] = {}
    for r in graph.edges.select("src", "dst").orderBy("src", "dst") \
            .toLocalIterator():
        adj.setdefault(int(r["src"]), []).append(int(r["dst"]))
    with open(path, "wb") as fh:
        fh.write(struct.pack("<H", n))
        for i in range(n):
            tgts = adj.get(i, [])
            fh.write(struct.pack("<H", len(tgts)))
            for t in tgts:
                fh.write(struct.pack("<H", t))


def write_colored_graph(graph: Graph, path: str,
                        vcolors: DataFrame | None = None,
                        ecolors: DataFrame | None = None) -> None:
    """igraph_write_colored_graph (/root/reference/src/fsm.c:95): the
    gSpan text exchange format — ``v <id> [color]`` lines then
    ``e <src> <dst> [color]`` lines.  ``vcolors``: (id, vcolor);
    ``ecolors``: (src, dst, ecolor)."""
    verts = graph.vertices.select("id")
    if vcolors is not None:
        verts = verts.join(vcolors.select("id", "vcolor"), "id", "left")
    e = graph.edges.select("src", "dst")
    if ecolors is not None:
        e = e.join(ecolors.select("src", "dst", "ecolor"),
                   ["src", "dst"], "left")
    with open(path, "w") as fh:
        for r in verts.orderBy("id").toLocalIterator():
            if vcolors is not None:
                fh.write(f'v {r["id"]} {r["vcolor"] or 0}\n')
            else:
                fh.write(f'v {r["id"]}\n')
        for r in e.orderBy("src", "dst").toLocalIterator():
            if ecolors is not None:
                fh.write(f'e {r["src"]} {r["dst"]} {r["ecolor"] or 0}\n')
            else:
                fh.write(f'e {r["src"]} {r["dst"]}\n')


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
    if fmt == "pajek":
        return read_pajek(spark, path, **kw)
    if fmt == "lgl":
        return read_lgl(spark, path, **kw)
    if fmt == "dimacs":
        return read_dimacs(spark, path, **kw)
    if fmt == "dl":
        return read_dl(spark, path, **kw)
    if fmt == "graphdb":
        return read_graphdb(spark, path, **kw)
    raise ValueError(f"unknown format {fmt!r}")
