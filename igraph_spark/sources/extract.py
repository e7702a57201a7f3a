"""Edge extraction from the repos table (the engine's "table scan").

North rule: vertices are files (or repos), edges are co-commit /
import links, extracted with vectorized Arrow UDFs — never per-row
Python.  Two implementations of the import-line scan are provided:

  * ``import_targets_builtin`` — pure Catalyst
    (``regexp_extract_all``), JVM-side, whole-stage codegen; the
    production path.
  * ``import_targets_arrow`` — an Arrow-batched ``pandas_udf`` doing
    the same regex in numpy/pandas; kept as the reference
    implementation for the UDF plumbing (and to satisfy pipelines that
    need Python-side parsing).  tests/test_extract.py asserts the two
    agree row-for-row.

Vertex ids are 64-bit ``xxhash64(repo, path)`` (content-addressed,
stable, no global counter => no sequential bottleneck at 10^12 rows).
At that scale 64-bit birthday collisions become material, so
``assert_no_id_collisions`` audits the dictionary (SURVEY.md §7.3-8);
a 128-bit variant is the documented escape hatch.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

IMPORT_RE = r"import\s+([A-Za-z0-9_./]+)"


def file_vertices(repos: DataFrame) -> DataFrame:
    """Vertex dictionary: one row per distinct file ->
    DataFrame(id, repo, path).  id = xxhash64(repo, path)."""
    return (repos.select("repo", "path").distinct()
            .select(F.xxhash64("repo", "path").alias("id"), "repo", "path"))


def assert_no_id_collisions(vertices: DataFrame) -> None:
    dup = (vertices.groupBy("id").agg(F.count("*").alias("c"))
           .where("c > 1").limit(1).count())
    if dup:
        raise RuntimeError(
            "64-bit vertex-id collision detected; switch to the 128-bit "
            "dictionary (sha2-based) for this corpus")


@F.pandas_udf(T.ArrayType(T.StringType()))
def import_targets_arrow(content: pd.Series) -> pd.Series:
    """Arrow-vectorized import scan: one regex pass per Arrow batch."""
    pat = re.compile(IMPORT_RE)
    return content.map(lambda s: pat.findall(s) if s else [])


def import_targets_builtin(content_col) -> F.Column:
    """Catalyst-native equivalent (JVM regex, codegen'd)."""
    return F.regexp_extract_all(content_col, F.lit(IMPORT_RE), 1)


def import_edges(repos: DataFrame, use_arrow_udf: bool = False) -> DataFrame:
    """Directed import graph over files ->
    DataFrame(src, dst, weight=1.0).

    A file's ``import X`` lines resolve against file stems in the same
    repo; unresolved targets are dropped.  Distinct (importer,
    imported) pairs, weight 1 (FIXTURES.md §2).
    """
    files = repos.select("repo", "path", "content").distinct()
    extractor = (import_targets_arrow(F.col("content")) if use_arrow_udf
                 else import_targets_builtin(F.col("content")))
    refs = (files
            .select("repo", "path", F.explode(extractor).alias("target_stem"))
            .distinct())
    # stem of a path: basename without extension ("src/m0/f7.py" -> "f7")
    stem = F.regexp_extract(F.col("path"), r"([^/.]+)\.[^.]+$", 1)
    catalog = (repos.select("repo", "path").distinct()
               .select("repo", F.col("path").alias("tpath"), stem.alias("target_stem")))
    resolved = (refs.join(catalog, ["repo", "target_stem"])
                .where(F.col("path") != F.col("tpath")))
    return resolved.select(
        F.xxhash64("repo", "path").alias("src"),
        F.xxhash64("repo", "tpath").alias("dst"),
        F.lit(1.0).alias("weight")).distinct()


def cocommit_edges(repos: DataFrame, min_shared: int = 1) -> DataFrame:
    """Undirected co-commit graph: files touched by the same
    (repo, commit), weight = number of shared commits (FIXTURES.md §2).
    Canonicalized src <= dst like igraph's undirected storage rule
    (/root/reference/src/type_indexededgelist.c:279-287).

    The self-join is keyed on (repo, commit) — the shuffle key of both
    sides — and the quadratic blow-up is bounded per commit group
    (commits touch a bounded file set); a giant commit would need the
    same salting treatment as any hot key.
    """
    fc = (repos.select("repo", "commit",
                       F.xxhash64("repo", "path").alias("fid"))
          .distinct())
    a = fc.select("repo", "commit", F.col("fid").alias("fa"))
    b = fc.select("repo", "commit", F.col("fid").alias("fb"))
    pairs = (a.join(b, ["repo", "commit"])
             .where(F.col("fa") < F.col("fb")))
    return (pairs.groupBy("fa", "fb")
            .agg(F.count("*").cast("double").alias("weight"))
            .where(F.col("weight") >= min_shared)
            .select(F.col("fa").alias("src"), F.col("fb").alias("dst"), "weight"))
