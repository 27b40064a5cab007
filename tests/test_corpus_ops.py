"""Dedup family, similarity search, text stats, multimodal plumbing."""

from pyspark.sql import functions as F

from bfokg.functions.textstats import (
    fingerprint_col,
    lang_id_col,
    quality_score_col,
    token_count_col,
)
from bfokg.operators.dedup import (
    dedup_exact,
    embedding_near_dups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_dups,
)
from bfokg.operators.similarity_search import brute_force_topk, lsh_topk


def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "The quick brown fox jumps over the lazy dog!"),   # exact dup mod norm
        (3, "the quick brown fox jumps over the lazy cat"),    # near dup
        (4, "completely different text about spark engines and distributed joins"),
        (5, "der schnelle braune fuchs springt und das ist ein test von der sache"),
        (6, "le chat est dans la maison et les oiseaux sont pour le jardin"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_exact(spark):
    out = dedup_exact(docs(spark)).collect()
    assert len(out) == 1
    assert out[0].keeper_id == 1 and out[0].doc_ids == [1, 2]


def test_ngram_jaccard(spark):
    out = {(r.doc_a, r.doc_b): r.jaccard for r in
           ngram_jaccard_pairs(docs(spark), n=3, threshold=0.5).collect()}
    assert out[(1, 2)] == 1.0            # identical after normalization
    assert 0.5 <= out[(1, 3)] < 1.0      # near dup: shares most shingles
    assert (1, 4) not in out


def test_minhash_recall_vs_exact(spark):
    d = docs(spark)
    exact = {(r.doc_a, r.doc_b) for r in
             ngram_jaccard_pairs(d, n=3, threshold=0.5).collect()}
    est = {(r.doc_a, r.doc_b) for r in
           minhash_lsh_pairs(d, num_hashes=64, bands=16, threshold=0.35).collect()}
    # LSH must recover all high-jaccard pairs on this tiny corpus
    assert exact <= est
    # and not hallucinate unrelated ones
    assert (1, 4) not in est and (4, 5) not in est


def test_simhash_near_dups(spark):
    out = {(r.doc_a, r.doc_b): r.hamming for r in
           simhash_near_dups(docs(spark), max_hamming=8).collect()}
    assert (1, 2) in out and out[(1, 2)] == 0  # identical token stream
    assert (1, 4) not in out


def embs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.95, 0.05]),
        (4, [-1.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_brute_force_topk(spark):
    e = embs(spark)
    q = e.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = brute_force_topk(q, e, k=3).collect()
    assert [r.vec_id for r in out] == [0, 1, 2]  # self, near, orthogonal
    assert out[0].cosine > 0.999999


def test_lsh_topk_recovers_near_neighbor(spark):
    e = embs(spark)
    q = e.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = lsh_topk(q, e, k=3, n_planes=4).collect()
    ids = [r.vec_id for r in out]
    assert 1 in ids            # the near neighbor shares every bucket bit
    assert 4 not in ids        # the antipode never shares the bucket


def test_embedding_near_dups(spark):
    out = {(r.id_a, r.id_b) for r in embedding_near_dups(embs(spark), 0.95).collect()}
    assert (0, 1) in out and (2, 3) in out and (0, 4) not in out


def test_textstats(spark):
    d = docs(spark).select(
        "doc_id",
        token_count_col("text").alias("n_tok"),
        lang_id_col("text").alias("lang"),
        F.round(quality_score_col("text"), 6).alias("quality"),
        fingerprint_col("text").alias("fp"),
    )
    rows = {r.doc_id: r for r in d.collect()}
    assert rows[1].n_tok == 9
    assert rows[1].lang == "en"
    assert rows[5].lang == "de"
    assert rows[6].lang == "fr"
    assert 0.0 <= rows[1].quality <= 1.0
    assert rows[1].fp == rows[2].fp      # same normalized content
    assert rows[1].fp != rows[3].fp


def test_multimodal_plumbing(spark):
    from bfokg.operators.multimodal import extract_image_features, with_payload_meta

    d = docs(spark).select(
        "doc_id", F.encode("text", "utf-8").alias("payload"),
        F.when(F.col("doc_id") == 4, "video/mp4").otherwise("image/png").alias("mime"),
    )
    meta = with_payload_meta(d)
    r1 = meta.where(F.col("doc_id") == 1).first()
    assert r1.n_bytes == len("the quick brown fox jumps over the lazy dog")
    assert len(r1.payload_sha) == 64
    feats = {r.doc_id: r for r in extract_image_features(meta).collect()}
    assert feats[1].decode_ok and feats[1].width > 0
    assert not feats[4].decode_ok        # unsupported mime degrades, not fails
