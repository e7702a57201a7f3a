"""Pipeline functions: text analysis, dedup tiers, ANN, multimodal
plumbing — over small literal corpora."""

import pytest

from pyspark.sql import functions as F

from igraph_spark.functions import ann, dedup, multimodal, text

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog", "en"),
    (1, "the quick brown fox jumps over the lazy dog", "en"),   # exact dup
    (2, "the quick brown fox jumped over the lazy dogs", "en"),  # near dup
    (3, "der schnelle braune fuchs springt und das ist gut", "de"),
    (4, "completely different text about spark dataframes and shuffles",
     "en"),
    (5, "", "und"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t, l, "unit", len(t)) for i, t, l in DOCS],
        "doc_id long, text string, lang string, source string, n_chars long")


def test_token_count(spark, docs):
    got = {r["doc_id"]: (r["n_tokens"], r["n_subtokens"])
           for r in text.token_count(docs).collect()}
    assert got[0][0] == 9
    assert got[5][0] == 0
    assert got[0][1] == 9  # alpha words only


def test_quality(spark, docs):
    got = {r["doc_id"]: r for r in text.quality_score(docs).collect()}
    assert got[0]["alpha_ratio"] > 0.7
    assert got[5]["n_chars"] == 0
    assert got[0]["quality"] > got[5]["quality"]


def test_langid(spark, docs):
    got = {r["doc_id"]: r["lang_pred"]
           for r in text.language_id(docs).collect()}
    assert got[0] == "en"
    assert got[3] == "de"
    assert got[5] == "und"


def test_fingerprint_dup_invariant(spark, docs):
    got = {r["doc_id"]: r["fingerprint"]
           for r in text.fingerprint(docs).collect()}
    assert got[0] == got[1]            # identical docs, identical prints
    assert got[0] != got[4]


def test_exact_dedup(spark, docs):
    dups = dedup.exact_duplicates(docs).collect()
    assert len(dups) == 1
    assert dups[0]["n_copies"] == 2 and dups[0]["keep_doc_id"] == 0
    kept = dedup.dedup_exact(docs)
    assert kept.count() == 5
    assert kept.where("doc_id = 1").count() == 0


def test_minhash_lsh(spark, docs):
    pairs = {(r["a"], r["b"]): r["jaccard_est"]
             for r in dedup.minhash_lsh_pairs(
                 docs.where("doc_id <> 5"), threshold=0.5).collect()}
    assert pairs.get((0, 1)) == 1.0    # exact dup -> all minhashes agree
    assert (0, 4) not in pairs and (1, 4) not in pairs
    assert pairs.get((2, 0), pairs.get((0, 2), 0)) > 0.4  # near dup found


def test_simhash(spark, docs):
    pairs = {(r["a"], r["b"]): r["hamming"]
             for r in dedup.simhash_near_pairs(
                 docs.where("doc_id <> 5")).collect()}
    assert pairs.get((0, 1)) == 0
    assert (0, 4) not in pairs


def test_ngram_jaccard(spark, docs):
    pairs = {(r["a"], r["b"]): r["jaccard"]
             for r in dedup.ngram_jaccard_pairs(
                 docs.where("doc_id <> 5"), min_jaccard=0.5).collect()}
    assert pairs[(0, 1)] == 1.0
    assert 0.5 < pairs[(0, 2)] < 1.0


def test_near_dup_clusters_pairs_passthrough(spark, docs):
    # passing the pre-verified pair DataFrame must give the same
    # clusters as the one-call path (which re-derives it internally)
    d = docs.where("doc_id <> 5")
    # detection params passed explicitly so the pair table matches the
    # one-call path's LSH config by construction (near_dup_clusters
    # defaults num_hashes=64; minhash_verified_pairs defaults 32)
    pairs = dedup.minhash_verified_pairs(d, num_hashes=64, bands=16,
                                         shingle=5, min_jaccard=0.5)
    one_call = dedup.near_dup_clusters(d, min_jaccard=0.5)
    reused = dedup.near_dup_clusters(d, min_jaccard=0.5, pairs=pairs)
    assert sorted(map(tuple, one_call.collect())) == \
        sorted(map(tuple, reused.collect()))
    # and the cluster content is the planted one: {0,1,2} keyed by 0
    rows = one_call.collect()
    assert len(rows) == 1
    assert rows[0]["canonical"] == 0 and rows[0]["members"] == 3


def test_ann_bruteforce(spark):
    rows = [(i, [float(i == j) + 0.1 * ((i * 7 + j) % 3)
                 for j in range(4)], 0) for i in range(30)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    q = emb.where("vec_id < 3")
    out = ann.cosine_topk_bruteforce(emb, q, k=5)
    got = out.collect()
    assert len(got) == 15              # 3 queries x 5 neighbors
    per_q = {r["query_id"] for r in got}
    assert per_q == {0, 1, 2}
    for r in got:
        assert -1.0 <= r["cosine"] <= 1.0 + 1e-9


def test_ann_lsh_recall(spark):
    rows = [(i, [float(i == j) + 0.05 * ((i * 13 + j) % 5)
                 for j in range(8)], 0) for i in range(40)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    exact = ann.cosine_topk_bruteforce(emb, emb, k=3)
    approx = ann.cosine_topk_lsh(emb, dim=8, k=3, n_planes=4)
    ex = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    ap = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(ex & ap) / len(ex)
    assert recall > 0.3                # few planes -> decent recall


def test_multimodal_plumbing(spark, docs):
    media = multimodal.make_media_table(docs.where("doc_id <> 5"))
    assert media.schema.simpleString().startswith(
        "struct<media_id:bigint,modality:string,payload:binary")
    feats = multimodal.extract_features(media, n_feat=4).collect()
    assert len(feats) == 5
    assert all(len(r["feat"]) == 4 for r in feats)
    # determinism: same payload -> same features
    by_id = {r["media_id"]: list(r["feat"]) for r in feats}
    assert by_id[0] == by_id[1]
    frames = multimodal.frame_sample(media, every_n_bytes=16).collect()
    assert len(frames) > 5
    assert all(len(r["frame"]) <= 16 for r in frames)


def test_multimodal_decoder_registry(spark, docs):
    # a registered real decoder replaces the fake for its modality and
    # unregistering restores the fake (round 6: pluggable decode)
    media = multimodal.make_media_table(docs.where("doc_id <> 5"))
    fake = {r["media_id"]: list(r["feat"])
            for r in multimodal.extract_features(media, n_feat=4).collect()}
    multimodal.register_decoder(
        "image", lambda payload, n: [float(len(payload))] * n)
    try:
        real = {r["media_id"]: list(r["feat"])
                for r in multimodal.extract_features(media, n_feat=4)
                .collect()}
        assert all(len(v) == 4 and v[0] >= 1.0 for v in real.values())
        assert real != fake
    finally:
        multimodal.unregister_decoder("image")
    again = {r["media_id"]: list(r["feat"])
             for r in multimodal.extract_features(media, n_feat=4)
             .collect()}
    assert again == fake


def test_multimodal_pil_decoder_when_available(spark, docs):
    # the real-codec path: registers only when PIL is importable; the
    # no-codecs container skips cleanly (the documented gate)
    import pytest
    if not multimodal.register_pil_image_decoder():
        pytest.skip("PIL not installed — decode stays the documented fake")
    try:
        import io

        from PIL import Image
        buf = io.BytesIO()
        Image.new("L", (8, 8), 128).save(buf, format="PNG")
        media = spark.createDataFrame(
            [(1, "image", bytearray(buf.getvalue()), "image/png",
              len(buf.getvalue()), 0)],
            multimodal.MEDIA_SCHEMA)
        rows = multimodal.extract_features(media, n_feat=4).collect()
        assert rows[0]["feat"] == [0.5] * 4
    finally:
        multimodal.unregister_decoder("image")


def test_ann_ivf_full_probe_equals_bruteforce(spark):
    rows = [(i, [float(i == j) + 0.1 * ((i * 7 + j) % 3)
                 for j in range(4)], 0) for i in range(30)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    q = emb.where("vec_id < 3")
    bf = set((r.query_id, r.neighbor_id, r.rank) for r in
             ann.cosine_topk_bruteforce(emb, q, k=5).collect())
    full = set((r.query_id, r.neighbor_id, r.rank) for r in
               ann.ivf_topk(emb, q, dim=4, k=5, n_clusters=4,
                            n_probe=4).collect())
    assert bf == full


def test_ann_ivf_partial_probe_recall_and_determinism(spark):
    rows = [(i, [float(i == j) + 0.1 * ((i * 7 + j) % 3)
                 for j in range(4)], 0) for i in range(30)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    q = emb.where("vec_id < 3")
    bf = set((r.query_id, r.neighbor_id) for r in
             ann.cosine_topk_bruteforce(emb, q, k=5).collect())
    p1 = set((r.query_id, r.neighbor_id) for r in
             ann.ivf_topk(emb, q, dim=4, k=5, n_clusters=4,
                          n_probe=2).collect())
    p2 = set((r.query_id, r.neighbor_id) for r in
             ann.ivf_topk(emb, q, dim=4, k=5, n_clusters=4,
                          n_probe=2).collect())
    assert p1 == p2                       # deterministic
    assert len(bf & p1) / len(bf) >= 0.4  # sane recall at half probe


def test_ann_ivf_train_centroids_unit_norm(spark):
    import math as _m
    rows = [(i, [float((i + j) % 5) for j in range(4)], 0)
            for i in range(20)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    cents = ann.ivf_train_centroids(emb, dim=4, n_clusters=3)
    assert len(cents) == 3
    for c in cents:
        assert abs(_m.sqrt(sum(x * x for x in c)) - 1.0) < 1e-9
