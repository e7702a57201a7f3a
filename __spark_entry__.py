"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (PageRank top-20 of the
customer-supplier co-occurrence graph) at sf0.001.

``queries()`` exposes the engine's operators over graphs derived from
the TPC-H-ish tables (FIXTURES.md §5) plus the documents/embeddings
pipeline operators; ``oracle_sql()`` carries the DuckDB-equivalent SQL
for every SQL-expressible one.  Iterative fixpoint algorithms
(PageRank, WCC, LPA, k-core) are not single-query SQL-expressible
(recursive CTEs cannot aggregate per iteration) and get rows-only
checks, as the contract allows.

Derived graphs (identical definitions on both sides):
  * order_edges     — directed bipartite customer(2k) -> supplier(2k+1),
                      weight = #lineitems
  * supplier_edges  — undirected supplier co-occurrence within an
                      order (u < v), weight = #shared orders
  * mod_edges       — directed (l_partkey % 211) -> (l_suppkey % 211),
                      distinct; small non-bipartite graph with mutual
                      pairs (reciprocity / conversions fixture)

Numeric discipline for the value-hash compare: every aggregate is an
integer count/sum (exact in double/int64) or a single division of two
exact values (bit-identical IEEE result on both engines); genuinely
float outputs are ROUND()ed to 6 digits on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession, functions as F


@contextmanager
def _lean_conf(spark: SparkSession, shuffle_partitions: int = 8):
    """Iterative BSP loops pay per-superstep AQE replanning (~5x wall
    at test scale); run them with AQE off + modest shuffle width, then
    restore the session conf."""
    saved = {k: spark.conf.get(k) for k in
             ("spark.sql.adaptive.enabled", "spark.sql.shuffle.partitions")}
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
        yield
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


# ----------------------------------------------------------------- loaders
def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _order_edges(spark, sf_dir) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    return (o.join(l, o["o_orderkey"] == l["l_orderkey"])
            .groupBy((F.col("o_custkey") * 2).alias("src"),
                     (F.col("l_suppkey") * 2 + 1).alias("dst"))
            .agg(F.count("*").cast("double").alias("weight")))


def _supplier_edges(spark, sf_dir) -> DataFrame:
    os_ = (_t(spark, sf_dir, "lineitem")
           .select("l_orderkey", "l_suppkey").distinct())
    a = os_.select("l_orderkey", F.col("l_suppkey").alias("sa"))
    b = os_.select("l_orderkey", F.col("l_suppkey").alias("sb"))
    return (a.join(b, "l_orderkey")
            .where(F.col("sa") < F.col("sb"))
            .groupBy(F.col("sa").alias("src"), F.col("sb").alias("dst"))
            .agg(F.count("*").cast("double").alias("weight")))


def _mod_edges(spark, sf_dir) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return (l.select((F.col("l_partkey") % 211).alias("src"),
                     (F.col("l_suppkey") % 211).alias("dst"))
            .distinct())


_ORDER_E_SQL = """
  SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst,
         CAST(count(*) AS DOUBLE) AS weight
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  GROUP BY 1, 2
"""

_SUPPLIER_E_SQL = """
  WITH os AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
  SELECT a.l_suppkey AS src, b.l_suppkey AS dst,
         CAST(count(*) AS DOUBLE) AS weight
  FROM os a JOIN os b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2
"""

_MOD_E_SQL = """
  SELECT DISTINCT l_partkey % 211 AS src, l_suppkey % 211 AS dst
  FROM lineitem
"""


def _graph(edges: DataFrame, directed: bool):
    from igraph_spark.graph import Graph
    return Graph(edges, directed=directed,
                 _canonical=True)  # derived tables are already canonical


# ----------------------------------------------------------------- entry
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PageRank top-20 of the sf0.001 co-occurrence graph."""
    from igraph_spark.algorithms.pagerank import pagerank
    sf_dir = "/root/testdata/sf0.001"
    g = _graph(_order_edges(spark, sf_dir), directed=True)
    with _lean_conf(spark):
        pr = pagerank(g, weights=True, tol=1e-8, max_iter=40)
        out = (pr.orderBy(F.desc("pagerank"), F.asc("id")).limit(20)
               .select("id", F.round("pagerank", 8).alias("pagerank")))
        out = out.localCheckpoint(eager=True)  # materialize under lean conf
    return out


# ----------------------------------------------------------------- queries
def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from igraph_spark.algorithms.components import (
        connected_components, component_sizes)
    from igraph_spark.algorithms.kcore import coreness
    from igraph_spark.algorithms.lpa import label_propagation
    from igraph_spark.algorithms.pagerank import pagerank
    from igraph_spark.algorithms.triangles import (
        triangles_df, adjacent_triangles, transitivity_undirected)
    from igraph_spark.operators import setops, similarity, structure
    from igraph_spark.functions import ann, dedup, text

    # ---------------- graph: degrees / strength / density
    def q_degree_out(spark, sf):
        g = _graph(_order_edges(spark, sf), True)
        return g.degree("out").select(
            "id", F.col("degree").cast("long").alias("degree"))

    def q_degree_all(spark, sf):
        g = _graph(_order_edges(spark, sf), True)
        return g.degree("all").select(
            "id", F.col("degree").cast("long").alias("degree"))

    def q_strength_all(spark, sf):
        g = _graph(_order_edges(spark, sf), True)
        return g.strength("all")

    def q_density(spark, sf):
        g = _graph(_order_edges(spark, sf), True)
        return spark.createDataFrame([(structure.density(g),)],
                                     "density double")

    def q_reciprocity(spark, sf):
        g = _graph(_mod_edges(spark, sf), True)
        return spark.createDataFrame([(structure.reciprocity(g),)],
                                     "reciprocity double")

    # ---------------- joins / similarity
    def q_cocitation(spark, sf):
        g = _graph(_order_edges(spark, sf), True)
        return (similarity.cocitation(g)
                .select("a", "b", F.col("common").cast("long").alias("common")))

    def q_jaccard(spark, sf):
        g = _graph(_supplier_edges(spark, sf), False)
        return (similarity.similarity_jaccard(g)
                .select("a", "b", F.round("jaccard", 9).alias("jaccard")))

    def q_compose(spark, sf):
        cs = _graph(_order_edges(spark, sf), True)
        sn = _t(spark, sf, "supplier").select(
            (F.col("s_suppkey") * 2 + 1).alias("src"),
            (F.col("s_nationkey") + 1000000).alias("dst"))
        return (setops.compose(cs, _graph(sn, True)).edges
                .select("src", "dst").orderBy("src", "dst"))

    # ---------------- triangles / transitivity (supplier graph)
    def q_triangle_count(spark, sf):
        g = _graph(_supplier_edges(spark, sf), False)
        return (triangles_df(g).agg(F.count("*").alias("n_triangles")))

    def q_triangles_per_vertex(spark, sf):
        g = _graph(_supplier_edges(spark, sf), False)
        return (adjacent_triangles(g).where(F.col("triangles") > 0)
                .select("id", F.col("triangles").cast("long").alias("triangles")))

    def q_transitivity(spark, sf):
        g = _graph(_supplier_edges(spark, sf), False)
        return spark.createDataFrame(
            [(transitivity_undirected(g),)], "transitivity double")

    # ---------------- set ops (even/odd order halves)
    def _half_edges(spark, sf, parity):
        o = _t(spark, sf, "orders").select("o_orderkey", "o_custkey")
        l = _t(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
        return (o.join(l, o["o_orderkey"] == l["l_orderkey"])
                .where(F.col("o_orderkey") % 2 == parity)
                .select((F.col("o_custkey") * 2).alias("src"),
                        (F.col("l_suppkey") * 2 + 1).alias("dst"))
                .distinct())

    def q_edge_intersection(spark, sf):
        g1 = _graph(_half_edges(spark, sf, 0), True)
        g2 = _graph(_half_edges(spark, sf, 1), True)
        return setops.intersection(g1, g2).edges.select("src", "dst")

    def q_edge_difference(spark, sf):
        g1 = _graph(_half_edges(spark, sf, 0), True)
        g2 = _graph(_half_edges(spark, sf, 1), True)
        return setops.difference(g1, g2).edges.select("src", "dst")

    # ---------------- conversions
    def q_to_undirected_collapse(spark, sf):
        g = _graph(_mod_edges(spark, sf).withColumn("weight", F.lit(1.0)),
                   True)
        u = g.to_undirected("collapse")
        return u.edges.select("src", "dst", "weight")

    def q_stochastic(spark, sf):
        g = _graph(_order_edges(spark, sf), True)
        return (structure.get_stochastic(g)
                .select("src", "dst", F.round("prob", 9).alias("prob")))

    # ---------------- OLAP breadth on base tables
    def q_agg_lineitem(spark, sf):
        l = _t(spark, sf, "lineitem")
        return (l.groupBy("l_returnflag", "l_linestatus")
                .agg(F.sum("l_quantity").alias("sum_qty"),
                     F.count("*").alias("count_order"),
                     F.countDistinct("l_partkey").alias("n_parts")))

    def q_topk_suppliers_per_nation(spark, sf):
        from pyspark.sql import Window
        l = _t(spark, sf, "lineitem").groupBy("l_suppkey").agg(
            F.sum("l_quantity").alias("qty"))
        s = _t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
        j = s.join(l, s["s_suppkey"] == l["l_suppkey"])
        w = Window.partitionBy("s_nationkey").orderBy(
            F.desc("qty"), F.asc("s_suppkey"))
        return (j.withColumn("rnk", F.row_number().over(w))
                .where("rnk <= 3")
                .select("s_nationkey", "s_suppkey", "qty",
                        F.col("rnk").cast("long").alias("rnk")))

    def q_events_daily(spark, sf):
        e = _t(spark, sf, "events")
        return (e.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"),
                          "event_type")
                .agg(F.count("*").alias("n"),
                     F.countDistinct("user_id").alias("n_users")))

    # ---------------- documents pipeline
    def q_exact_duplicates(spark, sf):
        d = _t(spark, sf, "documents")
        return dedup.exact_duplicates(d)

    def q_token_count(spark, sf):
        d = _t(spark, sf, "documents")
        return text.token_count(d)

    def q_quality(spark, sf):
        d = _t(spark, sf, "documents")
        return (text.quality_score(d)
                .select("doc_id", "n_chars",
                        F.round("alpha_ratio", 9).alias("alpha_ratio"),
                        F.round("punct_ratio", 9).alias("punct_ratio")))

    def q_langid(spark, sf):
        d = _t(spark, sf, "documents")
        return text.language_id(d)

    def q_fingerprint(spark, sf):
        d = _t(spark, sf, "documents")
        return text.fingerprint(d)

    def q_minhash_pairs(spark, sf):
        d = _t(spark, sf, "documents")
        return (dedup.minhash_lsh_pairs(d, threshold=0.5)
                .select("a", "b", F.round("jaccard_est", 9)
                        .alias("jaccard_est")))

    def q_simhash_pairs(spark, sf):
        d = _t(spark, sf, "documents")
        return dedup.simhash_near_pairs(d, max_hamming=3)

    def q_ann_cosine(spark, sf):
        e = _t(spark, sf, "embeddings")
        q = e.where(F.col("vec_id") < 20)
        return (ann.cosine_topk_bruteforce(e, q, k=5)
                .select("query_id", "neighbor_id",
                        F.round("cosine", 6).alias("cosine"),
                        F.col("rank").cast("long").alias("rank")))

    # ---------------- paths / centrality / census
    def q_bfs(spark, sf):
        from igraph_spark.algorithms.paths import bfs_distances
        g = _graph(_mod_edges(spark, sf), True)
        with _lean_conf(spark):
            out = (bfs_distances(g, [0, 1, 2], mode="out", max_hops=6)
                   .select("source", "id", F.col("dist").cast("long")
                           .alias("dist"))
                   .localCheckpoint(eager=True))
        return out

    def q_dyad_census(spark, sf):
        from igraph_spark.algorithms.centrality import dyad_census
        g = _graph(_mod_edges(spark, sf), True)
        return dyad_census(g)

    def q_eigenvector(spark, sf):
        from igraph_spark.algorithms.centrality import eigenvector_centrality
        g = _graph(_supplier_edges(spark, sf), False)
        with _lean_conf(spark):
            out = (eigenvector_centrality(g, tol=1e-8, max_iter=80)
                   .select("id", F.round("eigenvector", 8)
                           .alias("eigenvector"))
                   .localCheckpoint(eager=True))
        return out

    def q_hits(spark, sf):
        from igraph_spark.algorithms.centrality import hits
        g = _graph(_mod_edges(spark, sf), True)
        with _lean_conf(spark):
            out = (hits(g, tol=1e-8, max_iter=60)
                   .select("id", F.round("hub", 8).alias("hub"),
                           F.round("authority", 8).alias("authority"))
                   .localCheckpoint(eager=True))
        return out

    def q_betweenness(spark, sf):
        from igraph_spark.algorithms.betweenness import betweenness
        g = _graph(_mod_edges(spark, sf), True)
        with _lean_conf(spark):
            out = (betweenness(g)
                   .select("id", F.round("betweenness", 6)
                           .alias("betweenness"))
                   .localCheckpoint(eager=True))
        return out

    def q_closeness(spark, sf):
        from igraph_spark.algorithms.paths import closeness
        g = _graph(_mod_edges(spark, sf), True)
        with _lean_conf(spark):
            out = (closeness(g, mode="out")
                   .select("id", F.round("closeness", 9).alias("closeness"))
                   .localCheckpoint(eager=True))
        return out

    def q_random_walks(spark, sf):
        from igraph_spark.algorithms.paths import random_walks
        g = _graph(_mod_edges(spark, sf), True)
        with _lean_conf(spark):
            out = random_walks(g, num_walks_per_vertex=1, length=4,
                               seed=42).localCheckpoint(eager=True)
        return out

    def q_ann_near_dup(spark, sf):
        e = _t(spark, sf, "embeddings")
        return (ann.cosine_near_dup_pairs(e, threshold=0.4)
                .select("a", "b", F.round("cosine", 6).alias("cosine")))

    # ---------------- iterative (rows-only: no single-SQL equivalent)
    def q_pagerank(spark, sf):
        g = _graph(_order_edges(spark, sf), True)
        with _lean_conf(spark):
            out = (pagerank(g, weights=True, tol=1e-8, max_iter=40)
                   .select("id", F.round("pagerank", 8).alias("pagerank"))
                   .localCheckpoint(eager=True))
        return out

    def q_wcc_sizes(spark, sf):
        g = _graph(_order_edges(spark, sf), True)
        with _lean_conf(spark):
            out = component_sizes(g, "weak").localCheckpoint(eager=True)
        return out

    def q_lpa_community_sizes(spark, sf):
        g = _graph(_supplier_edges(spark, sf), False)
        with _lean_conf(spark):
            mem = label_propagation(g, weights=True, max_iter=30)
            out = (mem.groupBy("label").agg(F.count("*").alias("size"))
                   .orderBy("label").localCheckpoint(eager=True))
        return out

    def q_louvain_sizes(spark, sf):
        from igraph_spark.algorithms.louvain import multilevel_communities
        g = _graph(_mod_edges(spark, sf).withColumn("weight", F.lit(1.0)),
                   True)
        with _lean_conf(spark):
            mem = multilevel_communities(g, max_levels=3,
                                         max_rounds_per_level=12)
            out = (mem.groupBy("label").agg(F.count("*").alias("size"))
                   .orderBy("label").localCheckpoint(eager=True))
        return out

    def q_kcore(spark, sf):
        g = _graph(_supplier_edges(spark, sf), False)
        with _lean_conf(spark):
            out = coreness(g).localCheckpoint(eager=True)
        return out

    return {
        "degree_out": q_degree_out,
        "degree_all": q_degree_all,
        "strength_all": q_strength_all,
        "density": q_density,
        "reciprocity": q_reciprocity,
        "cocitation": q_cocitation,
        "jaccard": q_jaccard,
        "compose": q_compose,
        "triangle_count": q_triangle_count,
        "triangles_per_vertex": q_triangles_per_vertex,
        "transitivity": q_transitivity,
        "edge_intersection": q_edge_intersection,
        "edge_difference": q_edge_difference,
        "to_undirected_collapse": q_to_undirected_collapse,
        "stochastic": q_stochastic,
        "agg_lineitem": q_agg_lineitem,
        "topk_suppliers_per_nation": q_topk_suppliers_per_nation,
        "events_daily": q_events_daily,
        "exact_duplicates": q_exact_duplicates,
        "token_count": q_token_count,
        "quality": q_quality,
        "langid": q_langid,
        "fingerprint": q_fingerprint,
        "minhash_pairs": q_minhash_pairs,
        "simhash_pairs": q_simhash_pairs,
        "ann_cosine": q_ann_cosine,
        "ann_near_dup": q_ann_near_dup,
        "bfs": q_bfs,
        "dyad_census": q_dyad_census,
        "eigenvector": q_eigenvector,
        "hits": q_hits,
        "betweenness": q_betweenness,
        "closeness": q_closeness,
        "random_walks": q_random_walks,
        "pagerank": q_pagerank,
        "wcc_sizes": q_wcc_sizes,
        "lpa_community_sizes": q_lpa_community_sizes,
        "louvain_sizes": q_louvain_sizes,
        "kcore": q_kcore,
    }


# ----------------------------------------------------------------- oracles
def oracle_sql() -> dict[str, str]:
    verts = f"""
      WITH e AS ({_ORDER_E_SQL}),
           v AS (SELECT src AS id FROM e UNION SELECT dst FROM e)
    """
    simple_sup = f"""
      WITH se AS ({_SUPPLIER_E_SQL}),
           e AS (SELECT src AS u, dst AS v FROM se),
           nbr AS (SELECT u AS id, v AS nbr FROM e
                   UNION ALL SELECT v, u FROM e)
    """
    return {
        "degree_out": verts + """
          SELECT v.id, CAST(coalesce(d.c, 0) AS BIGINT) AS degree
          FROM v LEFT JOIN
            (SELECT src AS id, count(*) AS c FROM e GROUP BY 1) d USING (id)
        """,
        "degree_all": verts + """
          , inc AS (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)
          SELECT v.id, CAST(coalesce(d.c, 0) AS BIGINT) AS degree
          FROM v LEFT JOIN
            (SELECT id, count(*) AS c FROM inc GROUP BY 1) d USING (id)
        """,
        "strength_all": verts + """
          , inc AS (SELECT src AS id, weight FROM e
                    UNION ALL SELECT dst, weight FROM e)
          SELECT v.id, CAST(coalesce(s.s, 0) AS DOUBLE) AS strength
          FROM v LEFT JOIN
            (SELECT id, sum(weight) AS s FROM inc GROUP BY 1) s USING (id)
        """,
        "density": verts + """
          SELECT CAST((SELECT count(*) FROM e) AS DOUBLE)
               / ((SELECT count(*) FROM v) * ((SELECT count(*) FROM v) - 1))
               AS density
        """,
        "reciprocity": f"""
          WITH e AS ({_MOD_E_SQL}),
               nl AS (SELECT * FROM e WHERE src <> dst)
          SELECT CAST((SELECT count(*) FROM nl a
                       JOIN nl b ON a.src = b.dst AND a.dst = b.src) AS DOUBLE)
               / (SELECT count(*) FROM nl) AS reciprocity
        """,
        "cocitation": f"""
          WITH e AS ({_ORDER_E_SQL})
          SELECT x.dst AS a, y.dst AS b, CAST(count(*) AS BIGINT) AS common
          FROM e x JOIN e y ON x.src = y.src AND x.dst < y.dst
          GROUP BY 1, 2
        """,
        "jaccard": simple_sup + """
          , deg AS (SELECT id, count(*) AS d FROM nbr GROUP BY 1),
          common AS (
            SELECT x.id AS a, y.id AS b, count(*) AS c
            FROM nbr x JOIN nbr y ON x.nbr = y.nbr AND x.id < y.id
            GROUP BY 1, 2)
          SELECT a, b,
                 round(CAST(c AS DOUBLE) / (da.d + db.d - c), 9) AS jaccard
          FROM common
          JOIN deg da ON da.id = a
          JOIN deg db ON db.id = b
        """,
        "compose": f"""
          WITH e AS ({_ORDER_E_SQL}),
               sn AS (SELECT s_suppkey * 2 + 1 AS src,
                             s_nationkey + 1000000 AS dst FROM supplier)
          SELECT DISTINCT e.src, sn.dst FROM e JOIN sn ON e.dst = sn.src
          ORDER BY 1, 2
        """,
        "triangle_count": f"""
          WITH se AS ({_SUPPLIER_E_SQL}),
               e AS (SELECT src AS u, dst AS v FROM se)
          SELECT CAST(count(*) AS BIGINT) AS n_triangles
          FROM e e1 JOIN e e2 ON e2.u = e1.v
                    JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
        """,
        "triangles_per_vertex": f"""
          WITH se AS ({_SUPPLIER_E_SQL}),
               e AS (SELECT src AS u, dst AS v FROM se),
               t AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
                     FROM e e1 JOIN e e2 ON e2.u = e1.v
                               JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
               corners AS (SELECT a AS id FROM t UNION ALL
                           SELECT b FROM t UNION ALL SELECT c FROM t)
          SELECT id, CAST(count(*) AS BIGINT) AS triangles
          FROM corners GROUP BY 1
        """,
        "transitivity": f"""
          WITH se AS ({_SUPPLIER_E_SQL}),
               e AS (SELECT src AS u, dst AS v FROM se),
               deg AS (SELECT id, count(*) AS d FROM
                       (SELECT u AS id FROM e UNION ALL SELECT v FROM e)
                       GROUP BY 1),
               tri AS (SELECT count(*) AS t
                       FROM e e1 JOIN e e2 ON e2.u = e1.v
                                 JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
          SELECT 3.0 * (SELECT t FROM tri)
               / (SELECT sum(CAST(d AS DOUBLE) * (d - 1) / 2) FROM deg)
               AS transitivity
        """,
        "edge_intersection": """
          WITH h0 AS (SELECT DISTINCT o_custkey * 2 AS src,
                             l_suppkey * 2 + 1 AS dst
                      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
                      WHERE o_orderkey % 2 = 0),
               h1 AS (SELECT DISTINCT o_custkey * 2 AS src,
                             l_suppkey * 2 + 1 AS dst
                      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
                      WHERE o_orderkey % 2 = 1)
          SELECT src, dst FROM h0 INTERSECT SELECT src, dst FROM h1
        """,
        "edge_difference": """
          WITH h0 AS (SELECT DISTINCT o_custkey * 2 AS src,
                             l_suppkey * 2 + 1 AS dst
                      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
                      WHERE o_orderkey % 2 = 0),
               h1 AS (SELECT DISTINCT o_custkey * 2 AS src,
                             l_suppkey * 2 + 1 AS dst
                      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
                      WHERE o_orderkey % 2 = 1)
          SELECT src, dst FROM h0 EXCEPT SELECT src, dst FROM h1
        """,
        "to_undirected_collapse": f"""
          WITH e AS ({_MOD_E_SQL})
          SELECT least(src, dst) AS src, greatest(src, dst) AS dst,
                 CAST(count(*) AS DOUBLE) AS weight
          FROM e GROUP BY 1, 2
        """,
        "stochastic": f"""
          WITH e AS ({_ORDER_E_SQL})
          SELECT src, dst,
                 round(weight / sum(weight) OVER (PARTITION BY src), 9)
                 AS prob
          FROM e
        """,
        "agg_lineitem": """
          SELECT l_returnflag, l_linestatus,
                 CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
                 CAST(count(*) AS BIGINT) AS count_order,
                 CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts
          FROM lineitem GROUP BY 1, 2
        """,
        "topk_suppliers_per_nation": """
          WITH q AS (SELECT l_suppkey, sum(l_quantity) AS qty
                     FROM lineitem GROUP BY 1),
               r AS (SELECT s_nationkey, s_suppkey, CAST(qty AS DOUBLE) AS qty,
                            row_number() OVER (PARTITION BY s_nationkey
                                ORDER BY qty DESC, s_suppkey ASC) AS rnk
                     FROM supplier JOIN q ON s_suppkey = l_suppkey)
          SELECT s_nationkey, s_suppkey, qty, CAST(rnk AS BIGINT) AS rnk
          FROM r WHERE rnk <= 3
        """,
        "events_daily": """
          SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
          FROM events GROUP BY 1, 2
        """,
        "exact_duplicates": """
          SELECT sha256(text) AS content_sha,
                 CAST(count(*) AS BIGINT) AS n_copies,
                 CAST(min(doc_id) AS BIGINT) AS keep_doc_id
          FROM documents GROUP BY 1 HAVING count(*) > 1
        """,
        "token_count": r"""
          SELECT doc_id,
                 CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE len(regexp_split_to_array(trim(text), '\s+'))
                      END AS BIGINT) AS n_tokens,
                 CAST(len(regexp_extract_all(
                      text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
                      AS BIGINT) AS n_subtokens
          FROM documents
        """,
        "quality": """
          SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
                 round(CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                       AS DOUBLE)
                       / greatest(CAST(length(text) AS DOUBLE), 1.0), 9)
                     AS alpha_ratio,
                 round(CAST(length(regexp_replace(
                           text, '[^.,;:!?''"()\\[\\]{}]', '', 'g'))
                       AS DOUBLE)
                       / greatest(CAST(length(text) AS DOUBLE), 1.0), 9)
                     AS punct_ratio
          FROM documents
        """,
        "ann_cosine": """
          WITH q AS (SELECT vec_id AS query_id, embedding AS qe
                     FROM embeddings WHERE vec_id < 20),
               scored AS (
                 SELECT q.query_id, e.vec_id AS neighbor_id,
                        list_cosine_similarity(
                            CAST(q.qe AS DOUBLE[]),
                            CAST(e.embedding AS DOUBLE[])) AS cos
                 FROM q JOIN embeddings e ON e.vec_id <> q.query_id),
               ranked AS (
                 SELECT query_id, neighbor_id, cos,
                        row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rank
                 FROM scored)
          SELECT query_id, neighbor_id, round(cos, 6) AS cosine,
                 CAST(rank AS BIGINT) AS rank
          FROM ranked WHERE rank <= 5
        """,
        "bfs": f"""
          WITH RECURSIVE e AS ({_MOD_E_SQL}),
               r AS (
                 SELECT s.source, s.source AS id, 0 AS dist
                 FROM (SELECT 0 AS source UNION SELECT 1 UNION SELECT 2) s
                 UNION
                 SELECT r.source, e.dst AS id, r.dist + 1
                 FROM r JOIN e ON e.src = r.id WHERE r.dist < 6)
          SELECT source, id, CAST(min(dist) AS BIGINT) AS dist
          FROM r GROUP BY 1, 2
        """,
        "dyad_census": f"""
          WITH e AS (SELECT * FROM ({_MOD_E_SQL}) WHERE src <> dst),
               p AS (SELECT least(src, dst) AS a, greatest(src, dst) AS b,
                            count(*) AS c
                     FROM e GROUP BY 1, 2),
               v AS (SELECT src AS id FROM ({_MOD_E_SQL})
                     UNION SELECT dst FROM ({_MOD_E_SQL})),
               nv AS (SELECT count(*) AS n FROM v)
          SELECT CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
                     AS mut,
                 CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                     AS asym,
                 CAST((SELECT n * (n - 1) / 2 FROM nv)
                      - count(*) AS BIGINT) AS null
          FROM p
        """,
        "ann_near_dup": """
          SELECT a.vec_id AS a, b.vec_id AS b,
                 round(list_cosine_similarity(
                     CAST(a.embedding AS DOUBLE[]),
                     CAST(b.embedding AS DOUBLE[])), 6) AS cosine
          FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
          WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                       CAST(b.embedding AS DOUBLE[])) >= 0.4
        """,
        # langid / fingerprint / minhash_pairs / simhash_pairs /
        # eigenvector / hits / random_walks and the iterative fixpoints
        # (pagerank, wcc_sizes, lpa_community_sizes, kcore) are
        # intentionally omitted: hash-seeded signatures and
        # per-iteration aggregation are not single-query ANSI SQL.
    }
