"""spark-submit deployment smoke (north-rule run mode).

The north rule ships the engine to a multi-executor cluster as
``spark-submit --py-files igraph_spark.zip job.py``.  This job is the
``job.py``: it imports the package ONLY from the shipped zip (run it
with a cwd outside the repo so the source tree is not importable),
derives the co-commit/import edge graph from a synthetic repos table
(the BASELINE input shape: repo/path/commit/lang/content), and runs
the four north-rule algorithms end-to-end.

    python tools/package_zip.py
    cd /tmp && spark-submit --master local[8] --driver-memory 4g \
        --py-files /root/repo/dist/igraph_spark.zip \
        /root/repo/tools/submit_smoke.py
    # (--driver-memory: spark-submit's 1g local-mode default OOMs on
    #  the BSP loops' cached state rotation; any real cluster submit
    #  sets executor/driver memory anyway)

Prints one JSON line; exit 0 iff every invariant holds.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession


def main() -> int:
    spark = (SparkSession.builder.appName("igraph_spark_submit_smoke")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.adaptive.enabled", "false")
             .getOrCreate())

    # imports resolved from the --py-files zip on driver AND executors
    from igraph_spark import (Graph, pagerank, connected_components,
                              triangle_count)
    from igraph_spark.algorithms.lpa import label_propagation
    from igraph_spark.generators import famous
    from igraph_spark.sources.extract import file_vertices, import_edges
    from igraph_spark.sources.repos import synth_repos

    repos = synth_repos(spark, n_repos=4, files_per_repo=40)
    g = Graph(import_edges(repos), file_vertices(repos).select("id"),
              directed=True)
    v, e = g.vcount(), g.ecount()

    pr = pagerank(g, tol=1e-9, max_iter=200)
    pr_sum = float(pr.groupBy().sum("pagerank").first()[0])

    wcc = connected_components(g, "weak")
    n_comp = wcc.select("component").distinct().count()

    lpa = label_propagation(g, max_iter=20)
    n_lab = lpa.select("label").distinct().count()

    karate_tri = triangle_count(famous(spark, "Zachary"))

    ok = (v == 160 and e > 0 and abs(pr_sum - 1.0) < 1e-6
          and 1 <= n_comp <= v and 1 <= n_lab <= v and karate_tri == 45)
    print(json.dumps({"v": v, "e": e, "pagerank_sum": round(pr_sum, 9),
                      "wcc_components": n_comp, "lpa_labels": n_lab,
                      "karate_triangles": karate_tri, "ok": ok}))
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
