"""Deterministic synthesis of the source-repository input table.

The engine's primary input (BASELINE.json input_hint) is a table

    repos(repo: string, path: string, commit: string,
          lang: string, content: string)

where each row is "file <path> of <repo> as touched by <commit>".
In production this is an Iceberg table at 10^12-file scale; here we
synthesize it deterministically (seed folded into xxhash64 — no RNG
state, so identical at any parallelism/scale) purely with Catalyst
column expressions over ``spark.range``: generation itself scales out.

Content embeds ``import f<k>`` lines so import edges are derivable by
regex (FIXTURES.md §1), and a Zipf-ish hub skew knob makes a few files
imported by a disproportionate share — exercising the salting/AQE path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

LANGS = ["py", "c", "java", "md"]

REPOS_COLUMNS = ("repo", "path", "commit", "lang", "content")


def read_repos(spark: SparkSession, source: str) -> DataFrame:
    """Load the production repos table from ``source`` — an Iceberg
    (or any catalog) table identifier like ``catalog.db.repos``, or a
    parquet path (the test-scale stand-in; paths are detected by a
    ``/`` or a ``.parquet`` suffix).

    The catalog route goes through ``spark.read.table``, so Iceberg's
    DataSourceV2 scan applies column pruning and partition pruning to
    whatever the downstream plan selects — ``import_edges`` /
    ``co_commit_edges`` only touch (repo, path, commit, content), and
    at 10^12 files the pruned scan IS the feasibility condition.  The
    schema is validated eagerly so a mis-pointed table fails here, not
    three joins deep."""
    if "/" in source or source.endswith(".parquet"):
        df = spark.read.parquet(source)
    else:
        df = spark.read.table(source)
    missing = [c for c in REPOS_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(
            f"repos source {source!r} lacks columns {missing}; expected "
            f"{list(REPOS_COLUMNS)}")
    return df.select(*REPOS_COLUMNS)


def synth_repos(spark: SparkSession, n_repos: int = 10,
                files_per_repo: int = 100, commits_per_file: int = 3,
                imports_per_file: int = 4, seed: int = 42,
                hub_share: int = 16) -> DataFrame:
    """Build the deterministic repos table.

    Import targets are drawn from the same repo; target index mixes a
    uniform part with a bias toward file 0 of the repo (every
    ``hub_share``-th candidate import hits file 0), creating hub
    vertices in the import graph.
    """
    n_files = n_repos * files_per_repo
    files = spark.range(n_files).select(
        (F.col("id") / files_per_repo).cast("long").alias("r"),
        F.pmod(F.col("id"), F.lit(files_per_repo)).alias("f"))
    files = files.select(
        "r", "f",
        F.concat(F.lit("org"), (F.col("r") / 10).cast("long"),
                 F.lit("/repo"), F.col("r")).alias("repo"),
        F.concat(F.lit("src/m"), (F.col("f") / 10).cast("long"),
                 F.lit("/f"), F.col("f")).alias("stem"))
    lang = F.element_at(
        F.array(*[F.lit(x) for x in LANGS]),
        (F.pmod(F.xxhash64("repo", "stem", F.lit(seed)), F.lit(len(LANGS)))
         + 1).cast("int"))
    files = files.withColumn("lang", lang).withColumn(
        "path", F.concat("stem", F.lit("."), "lang"))

    # deterministic import target list: k pseudo-random in-repo targets,
    # every hub_share-th one redirected to file 0 (the repo hub)
    idx = F.sequence(F.lit(0), F.lit(imports_per_file - 1))
    tgt = F.transform(
        idx,
        lambda i: F.when(
            F.pmod(F.xxhash64(F.col("f"), i, F.lit(seed), F.lit(1)),
                   F.lit(hub_share)) == 0,
            F.lit(0).cast("long")
        ).otherwise(
            F.pmod(F.xxhash64(F.col("f"), i, F.lit(seed), F.lit(2)),
                   F.lit(files_per_repo))))
    files = files.withColumn(
        "imports",
        F.array_distinct(F.filter(tgt, lambda t: t != F.col("f"))))

    import_lines = F.array_join(
        F.transform(F.col("imports"),
                    lambda t: F.concat(F.lit("import f"), t)), "\n")
    filler = F.sha2(F.concat(F.lit("body:"), "repo", F.lit(":"), "path",
                             F.lit(":"), F.lit(seed)), 256)
    content = F.concat(
        F.lit("// file: "), F.col("path"),
        F.lit(" lang: "), F.col("lang"), F.lit("\n"),
        import_lines, F.lit("\n"), filler, F.lit("\n"))
    files = files.withColumn("content", content)

    # each file appears in 1..commits_per_file commits of its repo
    n_c = F.pmod(F.xxhash64("repo", "path", F.lit(seed), F.lit(3)),
                 F.lit(commits_per_file)) + 1
    cidx = F.transform(
        F.sequence(F.lit(0), (n_c - 1).cast("int")),
        lambda i: F.pmod(F.xxhash64(F.col("f"), i, F.lit(seed), F.lit(4)),
                         F.lit(max(2, files_per_repo // 4))))
    rows = files.withColumn("c", F.explode(F.array_distinct(cidx)))
    commit = F.substring(
        F.sha2(F.concat("repo", F.lit(":"), F.col("c").cast("string")), 256),
        1, 40)
    return rows.select("repo", "path", commit.alias("commit"), "lang", "content")


def with_content_sha(repos: DataFrame) -> DataFrame:
    """Append the per-row content digest (input_hint row invariant:
    Spark-side sha2 must equal the pandas/hashlib oracle — tested in
    tests/test_extract.py)."""
    return repos.withColumn("content_sha", F.sha2("content", 256))
