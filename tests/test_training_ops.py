"""Training-data operators: dedup, similarity search, text analysis, multimodal."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from incremental_entity_extraction_spark.operators import multimodal
from incremental_entity_extraction_spark.operators.dedup import (
    dedup_connected_groups,
    embedding_near_dup_pairs,
    exact_duplicates,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_near_pairs,
    simhash_signatures,
)
from incremental_entity_extraction_spark.operators.similarity_search import (
    cosine_topk_broadcast,
    cosine_topk_join,
    ivf_topk,
)
from incremental_entity_extraction_spark.operators.text_analysis import (
    analyze_documents,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": [
                "the quick brown fox jumps over the lazy dog near the river bank",
                "the quick brown fox jumps over the lazy dog near the river bank",
                "the quick brown fox jumps over the lazy dog near the river edge",
                "completely different content about spark shuffle partitions here",
                "zz qq xx",
            ],
        }
    )
    return spark.createDataFrame(pdf)


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_text_analysis_columns(spark, docs):
    out = analyze_documents(docs).toPandas().set_index("doc_id")
    assert out.loc[0, "n_tokens"] == 13
    assert out.loc[0, "lang_pred"] == "en"
    assert out.loc[4, "lang_pred"] == "unknown"
    assert 0.0 <= out.loc[0, "quality"] <= 1.0
    assert out.loc[0, "fingerprint"] == out.loc[1, "fingerprint"]
    assert out.loc[0, "fingerprint"] != out.loc[2, "fingerprint"]


def test_exact_duplicates(spark, docs):
    out = exact_duplicates(docs, "doc_id", "text").toPandas()
    assert set(out["id"]) == {0, 1}
    assert (out["canonical_id"] == 0).all()


def test_ngram_jaccard(spark, docs):
    out = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5).toPandas()
    pairs = set(map(tuple, out[["id_a", "id_b"]].itertuples(index=False)))
    assert (0, 1) in pairs          # identical
    assert (0, 2) in pairs          # one word differs
    assert not any(3 in p or 4 in p for p in pairs)
    j01 = out.set_index(["id_a", "id_b"]).loc[(0, 1), "jaccard"]
    assert abs(j01 - 1.0) < 1e-9


def test_minhash_lsh(spark, docs):
    sigs = minhash_signatures(docs, "doc_id", "text", n=3, num_hashes=32)
    out = minhash_lsh_pairs(sigs, bands=8, verify_threshold=0.5).toPandas()
    pairs = set(map(tuple, out[["id_a", "id_b"]].itertuples(index=False)))
    assert (0, 1) in pairs
    est01 = out.set_index(["id_a", "id_b"]).loc[(0, 1), "est_jaccard"]
    assert est01 == 1.0
    assert not any(3 in p for p in pairs)


def test_simhash(spark, docs):
    sigs = simhash_signatures(docs, "doc_id", "text")
    pdf = sigs.toPandas().set_index("id")
    assert pdf.loc[0, "simhash"] == pdf.loc[1, "simhash"]
    out = simhash_near_pairs(sigs, max_hamming=8).toPandas()
    pairs = set(map(tuple, out[["id_a", "id_b"]].itertuples(index=False)))
    assert (0, 1) in pairs


def test_embedding_near_dup_and_groups(spark):
    base = np.random.default_rng(3).standard_normal((20, 16)).astype(np.float32)
    rows = [(i, base[i].tolist()) for i in range(20)]
    rows.append((100, base[0].tolist()))                       # exact dup of 0
    rows.append((101, (base[1] * 1.001 + 0.0001).tolist()))    # near dup of 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = embedding_near_dup_pairs(df, "vec_id", "embedding", threshold=0.99)
    got = pairs.toPandas()
    ps = set(map(tuple, got[["id_a", "id_b"]].itertuples(index=False)))
    assert (0, 100) in ps and (1, 101) in ps
    groups = dedup_connected_groups(pairs).toPandas()
    gmap = dict(zip(groups["id"], groups["canonical_id"]))
    assert gmap[100] == 0 and gmap[101] == 1


def test_cosine_topk_broadcast_equals_join(spark, embeddings):
    q = embeddings.filter(F.col("vec_id") < 10)
    a = cosine_topk_broadcast(q, embeddings, k=5).toPandas()
    b = cosine_topk_join(q, embeddings, k=5).toPandas()
    key = ["query_id", "rank"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert list(a["neighbor_id"]) == list(b["neighbor_id"])
    np.testing.assert_allclose(a["cosine"], b["cosine"], rtol=1e-5)


def test_ivf_recall_vs_exact(spark):
    # clustered corpus (IVF's operating regime): 8 tight clusters in R^16
    rng = np.random.default_rng(9)
    centers = rng.standard_normal((8, 16)).astype(np.float32) * 4
    X = np.concatenate(
        [c + rng.standard_normal((40, 16)).astype(np.float32) * 0.3 for c in centers]
    )
    corpus = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(len(X))],
        "vec_id long, embedding array<float>",
    )
    q = corpus.filter(F.col("vec_id") % 16 == 0)
    exact = cosine_topk_broadcast(q, corpus, k=10).toPandas()
    approx = ivf_topk(q, corpus, k=10, n_centroids=8, n_probe=4).toPandas()
    recall_sum, n = 0.0, 0
    for qid, g in exact.groupby("query_id"):
        e = set(g["neighbor_id"])
        a = set(approx[approx.query_id == qid]["neighbor_id"])
        recall_sum += len(e & a) / len(e)
        n += 1
    assert recall_sum / n >= 0.9


def test_multimodal_features_and_frames(spark):
    media = multimodal.make_media_fixture(spark, n=12)
    feats = multimodal.extract_features(media).toPandas()
    assert len(feats) == 12
    assert all(len(f) == multimodal.FEATURE_DIM for f in feats["features"])
    feats2 = multimodal.extract_features(media).toPandas()
    a = {m: tuple(f) for m, f in zip(feats["media_id"], feats["features"])}
    b = {m: tuple(f) for m, f in zip(feats2["media_id"], feats2["features"])}
    assert a == b  # deterministic
    frames = multimodal.sample_frames(media).toPandas()
    assert (frames["frame_idx"] >= 0).all()
    assert set(frames["media_id"]).issubset(set(media.filter("kind='video'").toPandas()["media_id"]))
    # the deterministic decode half (q32's oracle surface): byte length and
    # content fingerprint must match a direct driver-side recompute
    src = media.select("media_id", "payload").toPandas()
    by_id = {m: bytes(p) for m, p in zip(src["media_id"], src["payload"])}
    for m, nb, fp in zip(feats["media_id"], feats["n_bytes"], feats["fp"]):
        assert nb == len(by_id[m])
        assert fp == multimodal.payload_fingerprint(by_id[m])


def test_multimodal_strict_decoder_raises():
    with pytest.raises(NotImplementedError):
        multimodal.strict_decoder(b"xx", "image")


def test_cosine_topk_scan_matches_join_exactly(spark, embeddings):
    """The corpus-scan engine (queries broadcast, per-partition local top-k,
    window merge) must emit the identical (query, neighbor, rank) triples as
    the oracle-checkable crossjoin engine — same deterministic tie-break."""
    q = embeddings.filter(F.col("vec_id") < 40)
    from incremental_entity_extraction_spark.operators.similarity_search import (
        cosine_topk_scan,
    )

    scan = (
        cosine_topk_scan(q, embeddings.repartition(7), k=5)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    join = (
        cosine_topk_join(q, embeddings, k=5)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert list(scan["query_id"]) == list(join["query_id"])
    assert list(scan["neighbor_id"]) == list(join["neighbor_id"])
    assert list(scan["rank"]) == list(join["rank"])
    assert np.allclose(scan["cosine"], join["cosine"], atol=1e-5)


def test_multimodal_resize(spark):
    """Resize is a real nearest-neighbor kernel: with an injected known
    gradient image, the sampled pixels are analytically predictable."""
    media = multimodal.make_media_fixture(spark, n=9)

    def gradient_decoder(payload, w, h):
        # pixel value = row index (payload ignored) -> resize picks rows
        return np.tile(np.arange(h, dtype=np.float32)[:, None], (1, w))

    out = multimodal.resize_images(
        media, out_w=4, out_h=4, decoder_2d=gradient_decoder
    ).toPandas()
    n_images = media.filter("kind = 'image'").count()
    assert len(out) == n_images
    # source 64x64 -> rows sampled at floor((i+0.5)*16) = 8, 24, 40, 56
    px = np.asarray(out["pixels"].iloc[0], dtype=np.float32).reshape(4, 4)
    assert np.array_equal(px[:, 0], np.array([8, 24, 40, 56], dtype=np.float32))
    # each output row is constant (gradient varies only by row)
    assert (px == px[:, :1]).all()
    # default fake decode path is deterministic
    a = multimodal.resize_images(media, out_w=8, out_h=8).toPandas()
    b = multimodal.resize_images(media, out_w=8, out_h=8).toPandas()
    pa = [tuple(map(float, p)) for p in a.sort_values("media_id")["pixels"]]
    pb = [tuple(map(float, p)) for p in b.sort_values("media_id")["pixels"]]
    assert pa == pb


def test_ivf_hot_bucket_completes_and_finds_planted_pair(spark):
    """90% of the corpus collapses into one IVF bucket (extreme centroid
    skew): the cogroup path must still complete and return the planted
    nearest neighbor for a query in the hot bucket."""
    rng = np.random.default_rng(3)
    hot_dir = rng.standard_normal(16).astype(np.float32)
    hot_dir /= np.linalg.norm(hot_dir)
    n_hot, n_cold = 1800, 200
    hot = hot_dir + rng.standard_normal((n_hot, 16)).astype(np.float32) * 0.05
    cold = rng.standard_normal((n_cold, 16)).astype(np.float32)
    X = np.concatenate([hot, cold])
    # planted twin of vector 0 at the end
    X = np.concatenate([X, (X[0] + 1e-4).reshape(1, -1)])
    corpus = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(len(X))],
        "vec_id long, embedding array<float>",
    ).repartition(8)
    q = corpus.filter(F.col("vec_id") == 0)
    out = ivf_topk(q, corpus, k=3, n_centroids=8, n_probe=2).toPandas()
    assert len(out) == 3
    assert int(out[out["rank"] == 1]["neighbor_id"].iloc[0]) == len(X) - 1


def test_sha_sketch_twins_agree_with_truth(spark, docs):
    """The oracle-form sketches must behave like sketches: identical docs
    estimate Jaccard 1.0 / Hamming 0; unrelated docs score low."""
    from incremental_entity_extraction_spark.operators.dedup import (
        minhash_est_pairs_sha,
        simhash_signatures_sha,
    )

    est = minhash_est_pairs_sha(
        docs, "doc_id", "text", n=3, num_hashes=16, threshold=0.0
    ).toPandas().set_index(["id_a", "id_b"])
    assert est.loc[(0, 1), "est_jaccard"] == 1.0          # identical docs
    assert est.loc[(0, 3), "est_jaccard"] < 0.5 if (0, 3) in est.index else True

    sigs = simhash_signatures_sha(docs, "doc_id", "text").toPandas().set_index("id")
    assert sigs.loc[0, "simhash"] == sigs.loc[1, "simhash"]
    assert sigs.loc[0, "simhash"] != sigs.loc[3, "simhash"]


def test_ivf_pq_recall_and_exact_rerank_scores(spark):
    """IVF-PQ with exact re-rank: recall@10 >= 0.9 on a clustered corpus,
    and every emitted cosine must EQUAL the exact engine's cosine for the
    same (query, neighbor) pair — the re-rank stage rescores with the same
    f64 dot/norm expression, so only the candidate SET is approximate."""
    from incremental_entity_extraction_spark.operators.similarity_search import (
        ivf_pq_topk,
    )

    rng = np.random.default_rng(9)
    centers = rng.standard_normal((8, 16)).astype(np.float32) * 4
    X = np.concatenate(
        [c + rng.standard_normal((40, 16)).astype(np.float32) * 0.3 for c in centers]
    )
    corpus = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(len(X))],
        "vec_id long, embedding array<float>",
    )
    q = corpus.filter(F.col("vec_id") % 16 == 0)
    exact = cosine_topk_broadcast(q, corpus, k=10).toPandas()
    approx = ivf_pq_topk(
        q, corpus, k=10, n_centroids=8, n_probe=4, m_subvectors=4
    ).toPandas()
    recall_sum, n = 0.0, 0
    for qid, g in exact.groupby("query_id"):
        e = set(g["neighbor_id"])
        a = set(approx[approx.query_id == qid]["neighbor_id"])
        recall_sum += len(e & a) / len(e)
        n += 1
    assert recall_sum / n >= 0.9, f"pq recall {recall_sum / n:.3f}"
    # exact-score contract on the intersection (1e-6: the HOF expression
    # multiplies float32 elements before the double accumulation, the
    # broadcast engine rescores from f64-normalized vectors)
    ex = exact.set_index(["query_id", "neighbor_id"])["cosine"]
    for row in approx.itertuples(index=False):
        key = (row.query_id, row.neighbor_id)
        if key in ex.index:
            assert abs(ex.loc[key] - row.cosine) < 1e-6


def test_pq_codebook_determinism_and_code_width(spark):
    """Same seed -> identical codebooks/codes; codes are m bytes per row."""
    from incremental_entity_extraction_spark.operators.similarity_search import (
        pq_encode,
        pq_train_codebooks,
    )

    rng = np.random.default_rng(4)
    R = rng.standard_normal((500, 32)).astype(np.float32)
    b1 = pq_train_codebooks(R, m=8, seed=11)
    b2 = pq_train_codebooks(R, m=8, seed=11)
    np.testing.assert_array_equal(b1, b2)
    assert b1.shape == (8, 256, 4)
    codes = pq_encode(R, b1)
    assert codes.shape == (500, 8) and codes.dtype == np.uint8
    # quantization actually reconstructs: PQ approximation beats the zero
    # baseline by a wide margin
    recon = np.concatenate(
        [b1[m][codes[:, m]] for m in range(8)], axis=1
    )
    err = np.linalg.norm(R - recon) / np.linalg.norm(R)
    assert err < 0.9
