"""Dedup/LSH pipeline soak at ~200x the bench corpus.

The round-5 sf1 soaks covered the BSP engines (pagerank/wcc/lpa at
100M edges) and the triangle legs; this companion exercises the other
100-TB claim surface — the MinHash/LSH dedup pipeline — at a corpus
size where the banded bucket join, the verify stage, and the WCC
cluster resolution all run over millions of rows instead of the
bench's 5k documents.

Corpus: deterministic, synthesized Spark-side (pure Catalyst, no
driver loop, no external data — the same discipline as TESTDATA):

  * N base docs of 60 pseudo-words drawn from a 50k vocabulary by
    seeded xxhash64 (two random docs share ~0.07 words: no accidental
    near-dups);
  * Ne planted EXACT duplicates (verbatim copies of base docs);
  * Nn planted NEAR duplicates (same word sequence with the last 6 of
    60 words rewritten -> char-5-shingle Jaccard ~0.8, above the 0.6
    verify floor; banded-LSH candidate probability at J=0.8 with
    64 hashes / 16 bands is 1-(1-0.8^4)^16 ~ 0.9998).

Because the truth set is planted, the soak reports RECALL of the
verified near-dup pairs, not just wall time — a fast pipeline that
drops pairs at scale would fail here, not just look slow.

Legs (same functions bench.py times at sf0.1):
  dedup_exact     — sha256 groupBy over all docs
  dedup_minhash   — banded LSH candidate pairs (threshold 0.5)
  dedup_verified  — candidates + exact-Jaccard verify (floor 0.6)
  dedup_clusters  — WCC resolution over the verified pair graph

Artifact discipline: min-of-N per leg, per-sample data, launch
loadavg, peak /dev/shm.  Usage:

    python tools/soak_dedup.py [n_base] [samples]

Writes BENCH/soak_dedup_r5.json (override with SOAK_OUT).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from pyspark.sql import functions as F  # noqa: E402

from igraph_spark.session import get_spark  # noqa: E402
from igraph_spark.functions import dedup  # noqa: E402

VOCAB = 50_000
WORDS = 60
MUT_FROM = 55  # words at positions >= MUT_FROM are rewritten in 'm' docs


def synth_corpus(spark, n_base: int, n_exact: int, n_near: int):
    """(docs, planted_near) — docs(doc_id, text); planted_near(a, b)."""
    total = n_base + n_exact + n_near
    ids = spark.range(total).select(F.col("id").alias("doc_id"))
    base_id = (F.when(F.col("doc_id") < n_base, F.col("doc_id"))
               .when(F.col("doc_id") < n_base + n_exact,
                     F.col("doc_id") - n_base)
               .otherwise(F.col("doc_id") - n_base - n_exact))
    mutated = F.col("doc_id") >= n_base + n_exact

    def word(pos):
        # seeded word choice; mutated docs re-seed the tail positions
        salt = F.when(mutated & (pos >= F.lit(MUT_FROM)), F.lit("x")) \
                .otherwise(F.lit(""))
        h = F.xxhash64(F.concat_ws(
            ":", base_id.cast("string"), pos.cast("string"), salt))
        return F.conv(F.pmod(h, F.lit(VOCAB)).cast("string"), 10, 36)

    words = F.transform(F.sequence(F.lit(0), F.lit(WORDS - 1)), word)
    docs = ids.select(
        "doc_id", F.array_join(words, " ").alias("text"))
    planted = spark.range(n_near).select(
        F.col("id").alias("a"),
        (F.col("id") + n_base + n_exact).alias("b"))
    return docs, planted


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    samples = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_exact, n_near = n_base // 50, n_base // 20
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    parts = 2 * cpus

    spark = get_spark(
        app_name="igraph_spark_soak_dedup",
        master=f"local[{cpus}]",
        shuffle_partitions=parts,
        extra_conf={
            "spark.driver.memory":
                os.environ.get("SPARK_DRIVER_MEMORY", "80g"),
            "spark.local.dir":
                "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp",
        },
    )

    t0 = time.monotonic()
    docs, planted = synth_corpus(spark, n_base, n_exact, n_near)
    docs = docs.repartition(parts, "doc_id").persist()
    n_docs = docs.count()
    planted = planted.persist()
    planted.count()
    setup_sec = round(time.monotonic() - t0, 1)

    def shm_used_gib() -> float:
        u = shutil.disk_usage("/dev/shm")
        return round((u.total - u.free) / (1 << 30), 2)

    runs: list[dict] = []
    counts: dict[str, int] = {}
    recall = None
    loadavgs = [[round(x, 2) for x in os.getloadavg()]]
    for _ in range(samples):
        q: dict[str, float] = {}
        shm_peak = shm_used_gib()

        def timed(name, fn):
            nonlocal shm_peak
            t = time.monotonic()
            counts[name] = fn()
            q[name] = round(time.monotonic() - t, 1)
            shm_peak = max(shm_peak, shm_used_gib())

        timed("dedup_exact",
              lambda: dedup.exact_duplicates(docs).count())
        timed("dedup_minhash", lambda: dedup.minhash_lsh_pairs(
            docs, num_hashes=64, bands=16, threshold=0.5).count())

        verified = dedup.minhash_verified_pairs(
            docs, num_hashes=64, bands=16, min_jaccard=0.6)
        timed("dedup_verified", lambda: verified.count())
        timed("dedup_clusters", lambda: dedup.near_dup_clusters(
            docs, num_hashes=64, bands=16, min_jaccard=0.6).count())

        # recall of the planted near-dup truth set (cheap; once)
        if recall is None:
            hit = planted.join(verified, ["a", "b"], "left_semi").count()
            recall = round(hit / n_near, 4)

        runs.append({"queries": q, "shm_peak_gib": shm_peak})
        loadavgs.append([round(x, 2) for x in os.getloadavg()])

    best = {k: min(r["queries"][k] for r in runs)
            for k in runs[0]["queries"]}
    doc = {
        "metric": "soak_dedup_pipeline_sec",
        "value": round(sum(best.values()), 1),
        "unit": "sec",
        "queries": best,
        "counts": counts,
        "planted_near_recall": recall,
        "docs_per_sec_verified": round(n_docs / best["dedup_verified"]),
        "n_docs": n_docs,
        "n_base": n_base,
        "n_exact_planted": n_exact,
        "n_near_planted": n_near,
        "setup_sec": setup_sec,
        "n_samples": len(runs),
        "samples": runs,
        "loadavg_at_launch": loadavgs,
        "cpus": cpus,
    }
    out = os.environ.get(
        "SOAK_OUT", os.path.join(HERE, "BENCH", "soak_dedup_r5.json"))
    with open(out, "w") as fh:
        json.dump(doc, fh, indent=1)
    print(json.dumps(doc))
    spark.stop()


if __name__ == "__main__":
    main()
