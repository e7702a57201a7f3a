"""The Graph value class: an edge DataFrame + optional vertex DataFrame.

Reference data model (/root/reference/include/igraph_datatype.h:78-88):
igraph_t is a columnar edge list (``from``/``to`` double columns) with
dual CSR/CSC sort indexes and an implicit dense vertex set ``0..n-1``.
The Spark-native equivalent (SURVEY.md §1.4):

    edges    : DataFrame(src: long, dst: long [, weight: double, ...])
    vertices : DataFrame(id: long [, ...attrs])   (None => derived)
    directed : bool

Undirected graphs are canonicalized at construction to ``src <= dst``,
mirroring igraph's canonical storage of undirected edges
(/root/reference/src/type_indexededgelist.c:279-287).  Multi-edges and
loops are retained (igraph is a multigraph library); ``simplify``
removes them explicitly.

Attributes are plain DataFrame columns (the reference's dynamic
attribute records, /root/reference/src/cattributes.c:53-57, map to
Spark columns 1:1).

Physical layout: ``hash_partition()`` materializes the analog of the
reference's sorted edge index (type_indexededgelist.c:835-877) —
hash-partitioned on ``src``, sorted within partitions, persisted — so
iterative algorithms reuse one shuffle across supersteps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.storagelevel import StorageLevel

SRC, DST, WEIGHT, ID = "src", "dst", "weight", "id"

#: degree modes, mirroring igraph_neighbor_mode_t
OUT, IN, ALL = "out", "in", "all"


class Graph:
    """Immutable graph over Spark DataFrames.

    Parameters
    ----------
    edges : DataFrame with columns ``src`` (long), ``dst`` (long) and
        optionally ``weight`` (double) plus arbitrary edge-attribute
        columns.
    vertices : optional DataFrame with column ``id`` (long) plus
        vertex-attribute columns.  When None the vertex set is the
        distinct endpoints of ``edges`` (computed lazily).  Isolated
        vertices require an explicit vertex DataFrame (igraph's
        explicit ``n``, igraph_datatype.h:48).
    directed : bool.
    """

    def __init__(self, edges: DataFrame, vertices: DataFrame | None = None,
                 directed: bool = True, _canonical: bool = False):
        cols = edges.columns
        if SRC not in cols or DST not in cols:
            raise ValueError(f"edges must have columns '{SRC}','{DST}'; got {cols}")
        edges = edges.withColumn(SRC, F.col(SRC).cast("long")) \
                     .withColumn(DST, F.col(DST).cast("long"))
        if not directed and not _canonical:
            # canonical undirected storage: src <= dst (igraph rule,
            # type_indexededgelist.c:279-287, normalized to least-first)
            u, v = F.least(SRC, DST), F.greatest(SRC, DST)
            others = [c for c in edges.columns if c not in (SRC, DST)]
            edges = edges.select(u.alias(SRC), v.alias(DST), *others)
        self.edges = edges
        self._vertices = vertices
        self.directed = bool(directed)

    # ------------------------------------------------------------------
    # construction helpers
    # ------------------------------------------------------------------
    @staticmethod
    def from_edge_list(spark: SparkSession, pairs, n: int | None = None,
                       directed: bool = True, weights=None) -> "Graph":
        """Build from a python list of (src, dst) pairs — the analog of
        igraph_create (/root/reference/src/structure_generators.c:77).

        ``n`` pads the vertex set to ids ``0..n-1`` (isolated vertices
        allowed, like igraph's explicit vertex count).
        """
        if weights is not None:
            rows = [(int(s), int(d), float(w)) for (s, d), w in zip(pairs, weights)]
            edges = spark.createDataFrame(rows, "src long, dst long, weight double")
        else:
            rows = [(int(s), int(d)) for s, d in pairs]
            edges = spark.createDataFrame(rows, "src long, dst long") if rows else \
                spark.createDataFrame([], "src long, dst long")
        vertices = None
        if n is not None:
            vertices = spark.range(n).toDF(ID)
        return Graph(edges, vertices, directed=directed)

    @property
    def vertices(self) -> DataFrame:
        if self._vertices is None:
            # memoize the derived endpoint-distinct plan: algorithms touch
            # .vertices several times per call and Catalyst cannot share
            # separately-built identical subtrees across actions
            e = self.edges
            self._vertices = (e.select(F.col(SRC).alias(ID))
                               .unionByName(e.select(F.col(DST).alias(ID)))
                               .distinct())
        return self._vertices

    @property
    def has_weights(self) -> bool:
        return WEIGHT in self.edges.columns

    def weight_col(self) -> F.Column:
        return F.col(WEIGHT) if self.has_weights else F.lit(1.0)

    def weighted_edges(self) -> DataFrame:
        """edges projected to (src, dst, weight) with weight defaulted to 1.0."""
        return self.edges.select(SRC, DST, self.weight_col().cast("double").alias(WEIGHT))

    # ------------------------------------------------------------------
    # basic counts
    # ------------------------------------------------------------------
    def vcount(self) -> int:
        if getattr(self, "_vcount", None) is None:
            self._vcount = self.vertices.count()
        return self._vcount

    def ecount(self) -> int:
        if getattr(self, "_ecount", None) is None:
            self._ecount = self.edges.count()
        return self._ecount

    # ------------------------------------------------------------------
    # traversal views
    # ------------------------------------------------------------------
    def sym_edges(self, weighted: bool = False) -> DataFrame:
        """Symmetrized incidence view == igraph's IGRAPH_ALL adjacency.

        Every edge contributes (src->dst) and (dst->src); a self-loop
        therefore appears twice, exactly matching igraph_neighbors in
        ALL mode (/root/reference/src/type_indexededgelist.c:806-811).
        Used by every undirected traversal (WCC symmetrizes always,
        components.c:133-134; undirected PageRank uses IGRAPH_ALL,
        centrality.c:1389).
        """
        e = self.weighted_edges() if weighted else self.edges.select(SRC, DST)
        rev = e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST),
                       *([WEIGHT] if weighted else []))
        return e.unionByName(rev)

    # ------------------------------------------------------------------
    # degrees  (igraph_degree, type_indexededgelist.c:935-1010)
    # ------------------------------------------------------------------
    def degree(self, mode: str = ALL, loops: bool = True) -> DataFrame:
        """Per-vertex degree -> DataFrame(id, degree).

        Semantics match igraph_degree exactly: a self-loop counts 2 in
        ALL mode and 1 in IN/OUT mode; ``loops=False`` ignores loops;
        vertices with no incident edges get degree 0 (hence the left
        join onto the vertex set).  For undirected graphs every mode is
        ALL (igraph treats in/out/all identically on undirected).
        """
        e = self.edges.select(SRC, DST)
        if not loops:
            e = e.where(F.col(SRC) != F.col(DST))
        if not self.directed:
            mode = ALL
        if mode == OUT:
            inc = e.select(F.col(SRC).alias(ID))
        elif mode == IN:
            inc = e.select(F.col(DST).alias(ID))
        elif mode == ALL:
            inc = e.select(F.col(SRC).alias(ID)).unionByName(
                e.select(F.col(DST).alias(ID)))
        else:
            raise ValueError(f"bad mode {mode!r}")
        counted = inc.groupBy(ID).agg(F.count("*").alias("degree"))
        return (self.vertices.select(ID)
                .join(counted, ID, "left")
                .select(ID, F.coalesce("degree", F.lit(0)).cast("long").alias("degree")))

    def strength(self, mode: str = ALL, loops: bool = True) -> DataFrame:
        """Weighted degree (igraph_strength,
        /root/reference/src/structural_properties.c:5994) ->
        DataFrame(id, strength).  Falls back to degree when unweighted.
        """
        e = self.weighted_edges()
        if not loops:
            e = e.where(F.col(SRC) != F.col(DST))
        if not self.directed:
            mode = ALL
        if mode == OUT:
            inc = e.select(F.col(SRC).alias(ID), WEIGHT)
        elif mode == IN:
            inc = e.select(F.col(DST).alias(ID), WEIGHT)
        else:
            inc = e.select(F.col(SRC).alias(ID), WEIGHT).unionByName(
                e.select(F.col(DST).alias(ID), WEIGHT))
        summed = inc.groupBy(ID).agg(F.sum(WEIGHT).alias("strength"))
        return (self.vertices.select(ID)
                .join(summed, ID, "left")
                .select(ID, F.coalesce("strength", F.lit(0.0)).alias("strength")))

    def max_degree(self, mode: str = ALL, loops: bool = True) -> int:
        """igraph_maxdegree (structural_properties.c:2806)."""
        row = self.degree(mode, loops).agg(F.max("degree")).first()
        return int(row[0] or 0)

    # ------------------------------------------------------------------
    # simplify  (igraph_simplify, structural_properties.c:2248)
    # ------------------------------------------------------------------
    def simplify(self, remove_loops: bool = True, remove_multiple: bool = True,
                 combiners: dict | None = None) -> "Graph":
        """Drop loops and/or collapse multi-edges.

        ``combiners`` maps attribute column -> one of
        'sum'|'mean'|'min'|'max'|'first'|'count'|'ignore' — the useful
        subset of igraph_attribute_combination_t
        (/root/reference/include/igraph_attributes.h:127-148).  Default:
        weight is summed, other attribute columns dropped.
        """
        e = self.edges
        if remove_loops:
            e = e.where(F.col(SRC) != F.col(DST))
        if remove_multiple:
            attr_cols = [c for c in e.columns if c not in (SRC, DST)]
            combiners = dict(combiners or {})
            if WEIGHT in attr_cols and WEIGHT not in combiners:
                combiners[WEIGHT] = "sum"
            aggs = []
            for c in attr_cols:
                how = combiners.get(c, "ignore")
                if how == "ignore":
                    continue
                fn = {"sum": F.sum, "mean": F.mean, "min": F.min, "max": F.max,
                      "first": F.first, "count": F.count}[how]
                aggs.append(fn(c).alias(c))
            e = e.groupBy(SRC, DST).agg(*aggs) if aggs else \
                e.select(SRC, DST).distinct()
        return Graph(e, self._vertices, self.directed, _canonical=True)

    # ------------------------------------------------------------------
    # direction conversions (conversion.c:341,441)
    # ------------------------------------------------------------------
    def to_undirected(self, mode: str = "collapse",
                      combiners: dict | None = None) -> "Graph":
        """igraph_to_undirected. mode: 'each' keeps every directed edge
        as one undirected edge (multi-edges possible); 'collapse' merges
        parallel/reciprocal edges (combining attrs); 'mutual' keeps one
        undirected edge per reciprocal pair."""
        if not self.directed:
            return self
        if mode == "each":
            return Graph(self.edges, self._vertices, directed=False)
        if mode == "collapse":
            return Graph(self.edges, self._vertices, directed=False).simplify(
                remove_loops=False, remove_multiple=True, combiners=combiners)
        if mode == "mutual":
            e = self.edges.select(SRC, DST)
            rev = e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
            mutual = e.where(F.col(SRC) != F.col(DST)).intersect(rev) \
                      .where(F.col(SRC) < F.col(DST))
            loops = e.where(F.col(SRC) == F.col(DST)).distinct()
            return Graph(mutual.unionByName(loops), self._vertices,
                         directed=False, _canonical=True)
        raise ValueError(f"bad mode {mode!r}")

    def to_directed(self, mode: str = "mutual") -> "Graph":
        """igraph_to_directed. 'mutual': each undirected edge becomes a
        reciprocal pair; 'arbitrary': keep stored orientation."""
        if self.directed:
            return self
        if mode == "arbitrary":
            return Graph(self.edges, self._vertices, directed=True)
        if mode == "mutual":
            e = self.edges
            rev = e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST),
                           *[c for c in e.columns if c not in (SRC, DST)]) \
                   .where(F.col(SRC) != F.col(DST))
            return Graph(e.unionByName(rev), self._vertices, directed=True)
        raise ValueError(f"bad mode {mode!r}")

    # ------------------------------------------------------------------
    # subgraphs (structural_properties.c:2064,2142)
    # ------------------------------------------------------------------
    def induced_subgraph(self, vertex_ids) -> "Graph":
        """Keep the given vertices and all edges between them
        (igraph_induced_subgraph).  ``vertex_ids`` is a DataFrame(id) or
        an iterable of ids.  Implemented as two semi-joins so Catalyst
        can broadcast the (usually small) vertex set."""
        spark = self.edges.sparkSession
        if isinstance(vertex_ids, DataFrame):
            vs = vertex_ids.select(F.col(vertex_ids.columns[0]).alias(ID))
        else:
            vs = spark.createDataFrame([(int(v),) for v in vertex_ids], f"{ID} long")
        e = (self.edges
             .join(F.broadcast(vs.withColumnRenamed(ID, SRC)), SRC, "left_semi")
             .join(F.broadcast(vs.withColumnRenamed(ID, DST)), DST, "left_semi"))
        return Graph(e, vs, self.directed, _canonical=True)

    def subgraph_edges(self, predicate, delete_vertices: bool = True) -> "Graph":
        """Keep edges matching a Column predicate (igraph_subgraph_edges)."""
        e = self.edges.where(predicate)
        vs = None if delete_vertices else self._vertices
        return Graph(e, vs, self.directed, _canonical=True)

    # ------------------------------------------------------------------
    # physical layout (SURVEY.md §4 row 1)
    # ------------------------------------------------------------------
    def hash_partition(self, num_partitions: int | None = None,
                       storage: StorageLevel = StorageLevel.MEMORY_AND_DISK) -> "Graph":
        """Materialize the Spark analog of igraph's sorted edge index:
        hash-partition edges on ``src``, sort within partitions by
        (src, dst), persist.  Iterative algorithms call this once and
        reuse the layout across supersteps instead of re-shuffling.
        """
        if num_partitions is None:
            num_partitions = int(self.edges.sparkSession.conf.get(
                "spark.sql.shuffle.partitions"))
        e = (self.edges.repartition(num_partitions, SRC)
             .sortWithinPartitions(SRC, DST)
             .persist(storage))
        g = Graph(e, self._vertices, self.directed, _canonical=True)
        # marker consumed by pagerank's link-table build: projections,
        # filters and src-keyed joins/aggregations over these edges
        # keep the hash(src) layout, so a matching consumer can skip
        # its own repartition exchange outright (guide §2.4)
        g._src_partitions = num_partitions
        return g

    def unpersist(self) -> None:
        self.edges.unpersist()
