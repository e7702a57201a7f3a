"""LSH hot-bucket skew guardrail (round 3): a bucket of N
near-identical items must produce O(bands * cap^2) candidates, not
O(N^2), and the rotated per-band membership must keep the duplicate
cluster connected."""

from pyspark.sql import functions as F

from igraph_spark.functions.dedup import minhash_lsh_pairs
from igraph_spark.functions.ann import rhp_near_dup_pairs


def _hot_docs(spark, n=120):
    # n identical documents -> every band hashes them into ONE bucket
    rows = [(i, "the quick brown fox jumps over the lazy dog " * 4)
            for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_cap_bounds_candidates(spark):
    docs = _hot_docs(spark, 120)
    capped = minhash_lsh_pairs(docs, bands=8, threshold=0.0,
                               max_bucket=10)
    n_pairs = capped.count()
    # uncapped would be C(120,2) = 7140; cap 10 over 8 bands admits at
    # most 8 * C(10,2) = 360 distinct pairs
    assert 0 < n_pairs <= 8 * 45
    # rotated membership: the kept pair set must touch (almost) every
    # doc so dedup clustering still unions the cluster
    touched = (capped.select(F.col("a").alias("d"))
               .unionByName(capped.select(F.col("b").alias("d")))
               .distinct().count())
    assert touched >= 50  # ((110/120)^8 ~ 50% kept-per-band floor)


def test_minhash_cap_none_is_exact(spark):
    docs = _hot_docs(spark, 20)
    un = minhash_lsh_pairs(docs, bands=8, threshold=0.0, max_bucket=None)
    assert un.count() == 20 * 19 // 2


def test_default_cap_is_on_and_transparent_below_threshold(spark):
    """max_bucket defaults to 'auto' (= 4096): a naive caller gets the
    skew guardrail without asking, and on a benign corpus (buckets far
    below the cap) the result is identical to uncapped."""
    from igraph_spark.functions.dedup import (AUTO_MAX_BUCKET,
                                              _resolve_max_bucket)
    assert _resolve_max_bucket("auto") == AUTO_MAX_BUCKET == 4096
    assert _resolve_max_bucket(None) is None
    assert _resolve_max_bucket(17) == 17

    docs = _hot_docs(spark, 20)
    default = minhash_lsh_pairs(docs, bands=8, threshold=0.0)
    assert default.count() == 20 * 19 // 2  # == uncapped below the cap


def test_rhp_cap_bounds_candidates(spark):
    import random
    random.seed(7)
    base = [random.gauss(0, 1) for _ in range(8)]
    rows = [(i, [x + random.gauss(0, 1e-3) for x in base])
            for i in range(100)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    capped = rhp_near_dup_pairs(emb, dim=8, threshold=0.0,
                                planes_per_band=2, n_bands=4,
                                max_bucket=8)
    n_pairs = capped.count()
    assert 0 < n_pairs <= 4 * 28  # bands * C(8,2)
