"""Deduplication operators for training-data pipelines.

Four tiers, all deterministic and shuffle-conscious:

  * exact            — sha256 hash groupBy (one shuffle on the digest)
  * minhash + LSH    — shingle -> k minhashes -> b bands -> bucket
                       join; candidate pairs verified by true Jaccard.
                       Near-dup at ~n log n instead of n^2.
  * simhash          — 64-bit weighted-token signature; near-dup =
                       small Hamming distance within same band.
  * n-gram Jaccard   — exact Jaccard on character n-gram sets via an
                       inverted-index join (bounded by shared-gram
                       pairs; use after LSH at scale).

Minhash permutations are the classic universal-hash family
``h_i(x) = (a_i*x + b_i) mod p`` with constants derived from
xxhash64(seed, i) — deterministic at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _cap_hot_buckets(buckets: DataFrame, id_col: str, band_col: str,
                     bucket_col: str, max_bucket: int) -> DataFrame:
    """Skew guardrail for banded-LSH self-joins: keep at most
    ``max_bucket`` members per (band, bucket), so a pathological bucket
    of N near-identical items produces O(bands * max_bucket^2)
    candidates instead of O(N^2).

    Membership rotates per band (ordered by xxhash64(id, band)), so an
    item dropped from one hot band is almost surely kept in another —
    with b bands the chance of being dropped everywhere is
    ((N-c)/N)^b.  Recall impact: pairs between two items BOTH dropped
    from every shared band are lost; for dedup clustering the kept
    members still connect the cluster transitively."""
    w = (Window.partitionBy(band_col, bucket_col)
         .orderBy(F.xxhash64(F.col(id_col), F.col(band_col)),
                  F.col(id_col)))
    return (buckets.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= max_bucket).drop("_rn"))


# default per-(band, bucket) cap for max_bucket="auto": generous enough
# that benign corpora never hit it (recall unchanged — a bucket only
# reaches 4096 members when its contents are near-identical anyway, and
# those stay transitively connected through the kept members), small
# enough that a pathological hot bucket costs bands * 4096^2 ~ 10^8
# candidates instead of 10^12+.
AUTO_MAX_BUCKET = 4096


def _resolve_max_bucket(max_bucket) -> int | None:
    if max_bucket == "auto":
        return AUTO_MAX_BUCKET
    return max_bucket

# Mersenne prime 2^31-1: keeps a*x within int64 under ANSI mode
MERSENNE31 = (1 << 31) - 1


def exact_duplicates(docs: DataFrame, col: str = "text") -> DataFrame:
    """Exact dedup by content digest -> one row per duplicated digest:
    (content_sha, n_copies, keep_doc_id) with keep = min doc_id."""
    return (docs
            .select("doc_id", F.sha2(F.col(col), 256).alias("content_sha"))
            .groupBy("content_sha")
            .agg(F.count("*").alias("n_copies"),
                 F.min("doc_id").alias("keep_doc_id"))
            .where(F.col("n_copies") > 1))


def dedup_exact(docs: DataFrame, col: str = "text") -> DataFrame:
    """Return the deduplicated table (first doc_id per digest kept)."""
    keep = (docs.select("doc_id", F.sha2(F.col(col), 256).alias("sha"))
            .groupBy("sha").agg(F.min("doc_id").alias("doc_id")))
    return docs.join(keep.select("doc_id"), "doc_id", "left_semi")


def _hash32(col: F.Column) -> F.Column:
    """Portable 32-bit string hash: the first 8 hex chars of md5,
    parsed as an integer — identical in any engine with md5()
    (DuckDB: CAST('0x'||substr(md5(s),1,8) AS BIGINT))."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def _shingles(col: str, n: int = 5, hash: str = "xxhash64") -> F.Column:
    """Character n-gram shingle hashes (distinct) as array<long>.
    hash='md5_32' uses the portable 32-bit md5 prefix (SQL-replayable)
    instead of xxhash64."""
    txt = F.lower(F.regexp_replace(F.col(col), r"\s+", " "))
    ln = F.length(txt)
    idx = F.sequence(F.lit(1), F.greatest(ln - n + 1, F.lit(1)))
    hfn = _hash32 if hash == "md5_32" else F.xxhash64
    return F.array_distinct(
        F.transform(idx, lambda i: hfn(txt.substr(i, F.lit(n)))))


def minhash_consts(num_hashes: int, seed: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) universal-hash constants from sha256 —
    shared with the driver oracle so DuckDB can replay the exact
    signatures."""
    import hashlib
    consts = []
    for i in range(num_hashes):
        h = hashlib.sha256(f"{seed}:{i}".encode()).digest()
        a = (int.from_bytes(h[:8], "big") % (MERSENNE31 - 1)) | 1
        b = int.from_bytes(h[8:16], "big") % MERSENNE31
        consts.append((a, b))
    return consts


def minhash_signatures(docs: DataFrame, col: str = "text",
                       num_hashes: int = 32, shingle: int = 5,
                       seed: int = 42, hash: str = "xxhash64") -> DataFrame:
    """-> (doc_id, sig: array<long>[num_hashes]).

    min over shingle hashes of (a_i*x + b_i) mod M31, with (a_i, b_i)
    fixed odd constants derived from sha256(seed, i); 31-bit modulus so
    the product stays inside int64 (Spark ANSI overflow checking).
    ``hash`` selects the shingle hash (see _shingles).
    """
    consts = minhash_consts(num_hashes, seed)
    sh = _shingles(col, shingle, hash).alias("sh")
    # spread the signature transform across the cluster: a small parquet
    # input often arrives as one partition, which would serialize the
    # O(docs * shingles * num_hashes) hashing onto one core
    spark = docs.sparkSession
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    base = docs.repartition(width, "doc_id").select("doc_id", sh)

    def _perm(a: int, b: int):
        return lambda x: F.pmod(
            F.pmod(F.lit(a) * F.pmod(x, F.lit(MERSENNE31)), F.lit(MERSENNE31))
            + F.lit(b), F.lit(MERSENNE31))

    sig = F.array(*[F.array_min(F.transform(F.col("sh"), _perm(a, b)))
                    for a, b in consts])
    return base.select("doc_id", sig.alias("sig"))


def minhash_lsh_pairs(docs: DataFrame, col: str = "text",
                      num_hashes: int = 32, bands: int = 8,
                      shingle: int = 5, threshold: float = 0.6,
                      seed: int = 42, hash: str = "xxhash64",
                      max_bucket: int | str | None = "auto") -> DataFrame:
    """Near-duplicate pairs via banded LSH -> (a, b, jaccard_est).

    Bands of r = num_hashes/bands rows; docs sharing any band bucket
    become candidates; the estimate is the fraction of agreeing
    minhashes.  Pairs below ``threshold`` are dropped.  With
    hash='md5_32' both the shingle hash and the band-bucket key are
    md5-derived, so the whole pipeline is replayable in DuckDB.

    ``max_bucket``: per-(band, bucket) membership cap (see
    ``_cap_hot_buckets``) — the skew guardrail for corpora where a
    hot bucket of near-identical docs would otherwise explode the
    candidate self-join quadratically.  Default "auto" = 4096, ON —
    a naive caller at corpus scale gets the guardrail for free, and
    benign corpora never reach it so recall is unchanged.  Recall
    trade when it DOES bite: pairs between two docs both evicted from
    every shared band are lost, but eviction order rotates per band
    and kept members still connect dedup clusters transitively.  Pass
    an int to tune, or None for exact uncapped candidates.
    """
    assert num_hashes % bands == 0
    max_bucket = _resolve_max_bucket(max_bucket)
    r = num_hashes // bands
    sigs = minhash_signatures(docs, col, num_hashes, shingle, seed,
                              hash).persist()
    if hash == "md5_32":
        def _bucket(bi: int) -> F.Column:
            return F.md5(F.concat_ws(
                ":", *[F.col("sig")[bi * r + j].cast("string")
                       for j in range(r)]))
    else:
        def _bucket(bi: int) -> F.Column:
            return F.xxhash64(*[F.col("sig")[bi * r + j] for j in range(r)])
    buckets = sigs.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(bi).alias("band"), _bucket(bi).alias("bucket"))
            for bi in range(bands)])).alias("bk"))
    buckets = buckets.select("doc_id", "bk.band", "bk.bucket")
    if max_bucket is not None:
        buckets = _cap_hot_buckets(buckets, "doc_id", "band", "bucket",
                                   max_bucket)
    cand = (buckets.alias("x").join(
                buckets.alias("y"),
                (F.col("x.band") == F.col("y.band"))
                & (F.col("x.bucket") == F.col("y.bucket"))
                & (F.col("x.doc_id") < F.col("y.doc_id")))
            .select(F.col("x.doc_id").alias("a"),
                    F.col("y.doc_id").alias("b"))
            .distinct())
    est = (cand
           .join(sigs.select(F.col("doc_id").alias("a"),
                             F.col("sig").alias("sa")), "a")
           .join(sigs.select(F.col("doc_id").alias("b"),
                             F.col("sig").alias("sb")), "b")
           .select("a", "b",
                   (F.size(F.filter(
                       F.zip_with("sa", "sb",
                                  lambda x, y: (x == y).cast("int")),
                       lambda z: z == 1)) / F.lit(float(num_hashes)))
                   .alias("jaccard_est")))
    return est.where(F.col("jaccard_est") >= threshold)


def minhash_verified_pairs(docs: DataFrame, col: str = "text",
                           num_hashes: int = 32, bands: int = 16,
                           shingle: int = 5, min_jaccard: float = 0.6,
                           seed: int = 42,
                           hash: str = "xxhash64") -> DataFrame:
    """The full LSH dedup pipeline: banded-minhash CANDIDATES verified
    by TRUE shingle-set Jaccard -> (a, b, jaccard), a < b.

    This wires the ``ngram_jaccard_pairs`` verify stage behind LSH
    blocking, which is the shape that scales: the quadratic exact
    Jaccard only runs on candidate pairs.  bands=16 of r=2 rows makes a
    pair at true Jaccard j a candidate with prob 1-(1-j^2)^16 (> 99%
    at j=0.5, ~1 at j>=0.7), so at test scale the result equals the
    brute-force >= min_jaccard pair set — the driver oracle asserts
    exactly that.
    """
    cand = minhash_lsh_pairs(docs, col, num_hashes, bands, shingle,
                             threshold=0.0, seed=seed, hash=hash) \
        .select("a", "b")
    sh = docs.select("doc_id", _shingles(col, shingle, hash).alias("sh"))
    return (cand
            .join(sh.select(F.col("doc_id").alias("a"),
                            F.col("sh").alias("sa")), "a")
            .join(sh.select(F.col("doc_id").alias("b"),
                            F.col("sh").alias("sb")), "b")
            .select("a", "b",
                    (F.size(F.array_intersect("sa", "sb"))
                     / F.size(F.array_union("sa", "sb"))).alias("jaccard"))
            .where(F.col("jaccard") >= min_jaccard))


def simhash(docs: DataFrame, col: str = "text",
            hash: str = "xxhash64") -> DataFrame:
    """SimHash over word tokens -> (doc_id, simhash).

    Per bit: sum of +/-1 votes from each token's hash; bit set when
    the vote is positive.  Pure Catalyst: aggregate over the token
    array with bitwise ops.  hash='xxhash64' gives the 64-bit default;
    hash='md5_32' gives a 32-bit signature whose token hash is the md5
    prefix — same scheme, replayable in DuckDB.
    """
    nbits = 32 if hash == "md5_32" else 64
    hfn = _hash32 if hash == "md5_32" else F.xxhash64
    spark = docs.sparkSession
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    docs = docs.repartition(width, "doc_id")  # see minhash_signatures
    words = F.filter(F.split(F.lower(F.trim(F.col(col))), r"\s+"),
                     lambda w: F.length(w) > 0)
    hashes = F.transform(words, lambda w: hfn(w))
    def _vote(bit: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)

    bits = []
    for bit in range(nbits):
        vote = F.aggregate(hashes, F.lit(0).cast("long"), _vote(bit))
        bits.append(F.when(vote > 0,
                           F.shiftleft(F.lit(1).cast("long"), bit))
                    .otherwise(F.lit(0).cast("long")))
    sh = bits[0]
    for b in bits[1:]:
        sh = sh.bitwiseOR(b)
    return docs.select("doc_id", sh.alias("simhash"))


def simhash_near_pairs(docs: DataFrame, col: str = "text",
                       max_hamming: int = 3,
                       hash: str = "xxhash64") -> DataFrame:
    """Near-dup pairs by SimHash -> (a, b, hamming).

    Blocking: max_hamming+1 = 4 equal-width bands (any pair within
    Hamming<=3 agrees exactly on at least one band — pigeonhole), then
    exact Hamming verify via bit_count(xor).  64-bit signatures use
    4 x 16-bit bands; the portable 32-bit variant (hash='md5_32') uses
    4 x 8-bit bands — same guarantee.
    """
    nbits = 32 if hash == "md5_32" else 64
    width = nbits // 4
    mask = (1 << width) - 1
    sh = simhash(docs, col, hash).persist()
    bands = sh.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"),
                     F.shiftright("simhash", i * width)
                     .bitwiseAND(F.lit(mask)).alias("key"))
            for i in range(4)])).alias("bk"))
    bands = bands.select("doc_id", "simhash", "bk.band", "bk.key")
    cand = (bands.alias("x").join(
                bands.alias("y"),
                (F.col("x.band") == F.col("y.band"))
                & (F.col("x.key") == F.col("y.key"))
                & (F.col("x.doc_id") < F.col("y.doc_id")))
            .select(F.col("x.doc_id").alias("a"),
                    F.col("x.simhash").alias("ha"),
                    F.col("y.doc_id").alias("b"),
                    F.col("y.simhash").alias("hb"))
            .distinct())
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (cand.select("a", "b", ham.cast("long").alias("hamming"))
            .where(F.col("hamming") <= max_hamming))


def ngram_jaccard_pairs(docs: DataFrame, col: str = "text", n: int = 5,
                        min_jaccard: float = 0.8,
                        min_common: int = 5) -> DataFrame:
    """Exact n-gram Jaccard via inverted-index join ->
    (a, b, jaccard).  Quadratic in docs sharing a gram — use behind
    LSH blocking at scale (this is the verify stage)."""
    grams = (docs.select("doc_id", F.explode(_shingles(col, n)).alias("g"))
             .distinct().persist())
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("sz"))
    common = (grams.alias("x").join(
                  grams.alias("y"),
                  (F.col("x.g") == F.col("y.g"))
                  & (F.col("x.doc_id") < F.col("y.doc_id")))
              .groupBy(F.col("x.doc_id").alias("a"),
                       F.col("y.doc_id").alias("b"))
              .agg(F.count("*").alias("common"))
              .where(F.col("common") >= min_common))
    return (common
            .join(sizes.select(F.col("doc_id").alias("a"),
                               F.col("sz").alias("sa")), "a")
            .join(sizes.select(F.col("doc_id").alias("b"),
                               F.col("sz").alias("sb")), "b")
            .select("a", "b",
                    (F.col("common")
                     / (F.col("sa") + F.col("sb") - F.col("common")))
                    .alias("jaccard"))
            .where(F.col("jaccard") >= min_jaccard))


def near_dup_clusters(docs: DataFrame, col: str = "text",
                      num_hashes: int = 64, bands: int = 16,
                      shingle: int = 5, min_jaccard: float = 0.6,
                      seed: int = 42, hash: str = "xxhash64",
                      pairs: DataFrame | None = None) -> DataFrame:
    """Near-duplicate RESOLUTION -> DataFrame(canonical, members): the
    step after detection a training-data pipeline actually ships —
    connected components over the verified near-dup pair graph, each
    cluster keyed by its smallest doc_id (the member to keep; all
    others are the drop set).  Docs with no near-duplicate do not
    appear (they are their own cluster).

    `pairs` short-circuits detection: a caller who already holds the
    verified pair DataFrame (columns a, b — e.g. the
    minhash_verified_pairs output it materialized for reporting)
    passes it here and pays only the component closure.  The 1M-doc
    soak measured the one-call convenience path double-paying ~150 s
    of verify (BENCH/soak_dedup_r5.json); this is the escape hatch.

    Scale shape: the pair graph is the banded-LSH + exact-verify
    output (no all-pairs anywhere), and the component closure is the
    package's hash-min + pointer-jumping WCC — O(log V) rounds over
    O(pairs) state."""
    from igraph_spark.algorithms.components import connected_components
    from igraph_spark.graph import Graph

    if pairs is None:
        pairs = minhash_verified_pairs(
            docs, col=col, num_hashes=num_hashes, bands=bands,
            shingle=shingle, min_jaccard=min_jaccard, seed=seed,
            hash=hash)
    else:
        # detection params are dead when the caller supplies pairs —
        # surface a non-default combination instead of ignoring it
        defaults = dict(col="text", num_hashes=64, bands=16, shingle=5,
                        min_jaccard=0.6, seed=42, hash="xxhash64")
        passed = dict(col=col, num_hashes=num_hashes, bands=bands,
                      shingle=shingle, min_jaccard=min_jaccard,
                      seed=seed, hash=hash)
        stale = {k: v for k, v in passed.items() if v != defaults[k]}
        if stale:
            import warnings
            warnings.warn(
                "near_dup_clusters: detection parameters "
                f"{sorted(stale)} are ignored when pairs= is supplied "
                "(the pair DataFrame already fixes the detection "
                "config)", stacklevel=2)
    g = Graph(pairs.select(F.col("a").alias("src"),
                           F.col("b").alias("dst")),
              directed=False)
    cc = connected_components(g)
    canon = (cc.groupBy("component")
             .agg(F.min("id").alias("canonical"),
                  F.count("*").cast("long").alias("members")))
    return canon.select("canonical", "members")
