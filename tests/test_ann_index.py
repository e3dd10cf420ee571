"""Build-once ANN index (operators/ann_index.py): S6 serialize/load parity,
FAISS-add delta semantics, recall vs the exact engine, and the pipeline
contract that the KB is trained/bucketed ONCE per run — never per batch."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from incremental_entity_extraction_spark.operators import ann_index as ai
from incremental_entity_extraction_spark.operators.ann_index import (
    BASE_BATCH,
    ann_index_search,
    assign_delta,
    build_ann_index,
    ensure_ann_index,
    existing_delta_batches,
    load_ann_index,
    persist_delta,
)
from incremental_entity_extraction_spark.operators.similarity_search import (
    cosine_topk_join,
)


@pytest.fixture(scope="module")
def embs(spark):
    rng = np.random.default_rng(7)
    # 12 loose clusters so IVF bucketing has structure to find
    centers = rng.normal(size=(12, 32)).astype(np.float32) * 4
    rows = []
    for i in range(400):
        c = centers[i % 12]
        rows.append((i, [float(x) for x in c + rng.normal(size=32).astype(np.float32)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


@pytest.fixture(scope="module")
def built(spark, embs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("annidx") / "idx")
    model = build_ann_index(embs, path, mode="ivf", n_centroids=12, seed=11)
    return model, embs


def _recall(spark, approx_df, queries, corpus, k):
    exact = (
        cosine_topk_join(queries, corpus, k=k, exclude_self=True)
        .toPandas()
        .groupby("query_id")["neighbor_id"]
        .apply(set)
    )
    got = approx_df.toPandas().groupby("query_id")["neighbor_id"].apply(set)
    hits = sum(
        len(got.get(q, set()) & exact[q]) for q in exact.index
    )
    return hits / sum(len(v) for v in exact.values)


def test_build_search_recall(spark, built):
    model, embs = built
    q = embs.limit(60)
    out = ann_index_search(
        model, spark, q, k=5, n_probe=6, exclude_self=True
    )
    assert _recall(spark, out, q, embs, 5) >= 0.9


def test_model_roundtrip_and_reuse(spark, built, embs):
    model, _ = built
    loaded = load_ann_index(model.path)
    assert loaded is not None
    assert loaded.mode == "ivf" and loaded.seed == model.seed
    np.testing.assert_array_equal(loaded.centroids, model.centroids)
    assert loaded.n_corpus == model.n_corpus

    # matching fingerprint -> ensure loads, does NOT retrain
    calls = []
    orig = ai.kmeans_centroids
    ai.kmeans_centroids = lambda *a, **k: (calls.append(1), orig(*a, **k))[1]
    try:
        m2 = ensure_ann_index(embs, model.path, mode="ivf", n_centroids=12)
        assert calls == []
        np.testing.assert_array_equal(m2.centroids, model.centroids)
        # param change -> rebuild
        ensure_ann_index(embs, model.path, mode="ivf", n_centroids=6)
        assert calls == [1]
    finally:
        ai.kmeans_centroids = orig
        # restore the original index for later tests
        build_ann_index(embs, model.path, mode="ivf", n_centroids=12, seed=11)


def test_delta_add_and_visibility(spark, built):
    model, embs = built
    rng = np.random.default_rng(3)
    new_vecs = rng.normal(size=(5, 32)).astype(np.float32) * 3
    new_ids = np.arange(1000, 1005, dtype=np.int64)
    delta = assign_delta(model, new_ids, new_vecs, added_batch=0)
    assert set(delta["added_batch"]) == {0}

    q = spark.createDataFrame(
        [(int(5000 + i), [float(x) for x in new_vecs[i]]) for i in range(5)],
        "vec_id long, embedding array<float>",
    )
    # in-flight (extra_rows) visibility: self vector must be top-1
    out = ann_index_search(
        model, spark, q, k=3, extra_rows=delta,
        allowed_batches=[BASE_BATCH],
    ).toPandas()
    top1 = out[out["rank"] == 1].set_index("query_id")["neighbor_id"]
    assert all(top1[5000 + i] == 1000 + i for i in range(5))

    # persisted visibility: same result once the delta partition is written
    persist_delta(model, spark, delta, 0)
    assert existing_delta_batches(model) == {0}
    out2 = ann_index_search(
        model, spark, q, k=3, allowed_batches=[BASE_BATCH, 0],
    ).toPandas()
    top1b = out2[out2["rank"] == 1].set_index("query_id")["neighbor_id"]
    assert all(top1b[5000 + i] == 1000 + i for i in range(5))

    # undrained batches are invisible (crash-window isolation)
    out3 = ann_index_search(
        model, spark, q, k=3, allowed_batches=[BASE_BATCH],
    ).toPandas()
    assert not set(out3["neighbor_id"]) & set(new_ids.tolist())

    # idempotent rewrite (dynamic overwrite of the same partition)
    persist_delta(model, spark, delta, 0)
    out4 = ann_index_search(
        model, spark, q, k=3, allowed_batches=[BASE_BATCH, 0],
    ).toPandas()
    assert len(out4) == len(out2)


def test_pq_index_search_recall_and_exact_scores(spark, embs, tmp_path):
    model = build_ann_index(
        embs, str(tmp_path / "pq_idx"), mode="ivf_pq", n_centroids=12, seed=11
    )
    assert model.books is not None
    q = embs.limit(40)
    out = ann_index_search(
        model, spark, q, k=5, n_probe=6, rerank=64,
        rerank_corpus=embs, exclude_self=True,
    )
    pdf = out.toPandas()
    assert _recall(spark, out, q, embs, 5) >= 0.9
    # exact re-rank: emitted cosines match the exact engine's values
    exact = cosine_topk_join(q, embs, k=5, exclude_self=True).toPandas()
    merged = pdf.merge(
        exact, on=["query_id", "neighbor_id"], suffixes=("", "_exact")
    )
    assert len(merged) > 0
    np.testing.assert_allclose(
        merged["cosine"], merged["cosine_exact"], rtol=0, atol=1e-12
    )


def test_search_partitioning_invariant(spark, built):
    """Tie-inclusive local top-k: the result set must not depend on how the
    rows are split across scan tasks."""
    model, embs = built
    q = embs.limit(25)
    a = (
        ann_index_search(model, spark, q, k=5, exclude_self=True)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(64 * 1024))
        b = (
            ann_index_search(model, spark, q, k=5, exclude_self=True)
            .toPandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    assert a[["query_id", "neighbor_id", "rank"]].equals(
        b[["query_id", "neighbor_id", "rank"]]
    )


def test_empty_queries(spark, built):
    model, embs = built
    q = embs.filter(F.col("vec_id") < 0)
    assert ann_index_search(model, spark, q, k=5).count() == 0


def test_cogroup_query_mode_matches_driver_mode(spark, built, embs, tmp_path):
    """query_mode='cogroup' (unbounded query sets, nothing collected) must
    return exactly the driver-bucketed path's results — same engine, same
    index, different query topology."""
    model, _ = built
    q = embs.limit(30)
    a = (
        ann_index_search(model, spark, q, k=5, exclude_self=True)
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    b = (
        ann_index_search(
            model, spark, q, k=5, exclude_self=True, query_mode="cogroup"
        )
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    assert a[["query_id", "neighbor_id", "rank"]].equals(
        b[["query_id", "neighbor_id", "rank"]]
    )
    # the two topologies block the same f32 matmul differently, so values
    # agree to f32 accumulation noise, not bit-exactly (pq's exact f64
    # re-rank below IS bit-comparable by construction)
    np.testing.assert_allclose(a["cosine"], b["cosine"], rtol=0, atol=2e-5)

    pq_model = build_ann_index(
        embs, str(tmp_path / "pq_cg"), mode="ivf_pq", n_centroids=12, seed=11
    )
    c = (
        ann_index_search(
            pq_model, spark, q, k=5, rerank=64, rerank_corpus=embs,
            exclude_self=True,
        )
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    d = (
        ann_index_search(
            pq_model, spark, q, k=5, rerank=64, rerank_corpus=embs,
            exclude_self=True, query_mode="cogroup",
        )
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    assert c[["query_id", "neighbor_id", "rank"]].equals(
        d[["query_id", "neighbor_id", "rank"]]
    )


def test_content_fingerprint_triggers_rebuild(spark, embs, tmp_path):
    """A same-count content change (one vector re-encoded in place) must
    rebuild — a bare row-count fingerprint would silently serve the stale
    index against changed vectors."""
    path = str(tmp_path / "fp_idx")
    build_ann_index(embs, path, mode="ivf", n_centroids=12, seed=11)

    calls = []
    orig = ai.kmeans_centroids
    ai.kmeans_centroids = lambda *a, **k: (calls.append(1), orig(*a, **k))[1]
    try:
        # unchanged corpus: loads, no retrain
        ensure_ann_index(embs, path, mode="ivf", n_centroids=12)
        assert calls == []
        # one vector mutated, count unchanged: must rebuild.  The mutated
        # branch is cast back to array<float> — otherwise when/otherwise
        # type-unifies the WHOLE column to array<double>, every row's hash
        # changes, and the test would pass even for a fingerprint blind to
        # single-row edits
        mutated = embs.withColumn(
            "embedding",
            F.when(
                F.col("vec_id") == 0,
                F.transform("embedding", lambda x: x + F.lit(1.0)).cast(
                    "array<float>"
                ),
            ).otherwise(F.col("embedding")),
        )
        ensure_ann_index(mutated, path, mode="ivf", n_centroids=12)
        assert calls == [1]
    finally:
        ai.kmeans_centroids = orig


def test_n_probe_change_updates_model_without_rebuild(spark, embs, tmp_path):
    """n_probe is a search-time knob the stored rows are independent of —
    changing it must update the persisted model, not retrain + rewrite."""
    path = str(tmp_path / "np_idx")
    build_ann_index(embs, path, mode="ivf", n_centroids=12, n_probe=4, seed=11)

    calls = []
    orig = ai.kmeans_centroids
    ai.kmeans_centroids = lambda *a, **k: (calls.append(1), orig(*a, **k))[1]
    try:
        m = ensure_ann_index(embs, path, mode="ivf", n_centroids=12, n_probe=7)
        assert calls == []
        assert m.n_probe == 7
        assert load_ann_index(path).n_probe == 7  # persisted, not just in-memory
    finally:
        ai.kmeans_centroids = orig


def test_geometry_mismatch_triggers_rebuild(spark, embs, tmp_path):
    """An ivf_pq index built with one PQ subspace count or training budget
    must NOT be silently reused by a caller asking for another: the exact
    re-rank hides the mismatch from scores, but recall characteristics are
    the old geometry's."""
    path = str(tmp_path / "geom_idx")
    build_ann_index(
        embs, path, mode="ivf_pq", n_centroids=12, seed=11, m_subvectors=4
    )

    calls = []
    orig = ai.kmeans_centroids
    ai.kmeans_centroids = lambda *a, **k: (calls.append(1), orig(*a, **k))[1]
    try:
        m = ensure_ann_index(
            embs, path, mode="ivf_pq", n_centroids=12, m_subvectors=4
        )
        assert calls == [] and m.m_subvectors == 4
        # different subspace count -> rebuild
        m2 = ensure_ann_index(
            embs, path, mode="ivf_pq", n_centroids=12, m_subvectors=8
        )
        assert len(calls) >= 1 and m2.m_subvectors == 8
        n_after_m = len(calls)
        # different training budget -> rebuild
        m3 = ensure_ann_index(
            embs, path, mode="ivf_pq", n_centroids=12, m_subvectors=8,
            train_size=200,
        )
        assert len(calls) > n_after_m and m3.train_size == 200
    finally:
        ai.kmeans_centroids = orig


def test_rebuild_threshold_recovers_drift_recall(spark, tmp_path):
    """The drift knob FAISS lacks: deltas assigned under frozen build-time
    centroids scatter noise-driven when the stream drifts into a subspace
    the training never saw, and probe sets miss them (recall collapses).
    Crossing ``rebuild_threshold`` retrains ONCE with the deltas folded
    into the k-means sample; re-adding the deltas under the new model
    restores recall.  Below-threshold runs (and the run right after the
    rebuild, whose ratio reset) must reuse without retraining."""
    rng = np.random.default_rng(5)
    dim = 16

    def _df(ids, X):
        return spark.createDataFrame(
            [(int(i), [float(x) for x in v]) for i, v in zip(ids, X)],
            "vec_id long, embedding array<float>",
        )

    # base: 8 tight clusters living entirely in dims 0..7
    base_X = np.zeros((600, dim), dtype=np.float32)
    for i in range(600):
        base_X[i, i % 8] = 4.0
    base_X[:, :8] += rng.normal(size=(600, 8)).astype(np.float32) * 0.2
    base = _df(range(600), base_X)

    # drift: a cluster in dims 8..15 — orthogonal to every base centroid,
    # so frozen-model assignment is decided by per-vector noise alone
    u = np.zeros(dim, dtype=np.float32)
    u[8:] = 1.0
    drift_X = (
        np.tile(u, (200, 1))
        + rng.normal(size=(200, dim)).astype(np.float32) * 0.35
    ).astype(np.float32)
    drift_ids = np.arange(2000, 2200, dtype=np.int64)
    drift = _df(drift_ids, drift_X)
    corpus_full = base.unionByName(drift)

    q_X = (
        np.tile(u, (40, 1))
        + rng.normal(size=(40, dim)).astype(np.float32) * 0.35
    ).astype(np.float32)
    q = _df(range(9000, 9040), q_X)

    path = str(tmp_path / "drift_idx")
    model = build_ann_index(
        base, path, mode="ivf", n_centroids=12, n_probe=2, seed=11
    )
    persist_delta(
        model, spark, assign_delta(model, drift_ids, drift_X, 0), 0
    )

    before = _recall(
        spark,
        ann_index_search(
            model, spark, q, k=10, n_probe=2, allowed_batches=[BASE_BATCH, 0]
        ),
        q, corpus_full, 10,
    )
    assert before <= 0.6  # noise-scattered deltas vs 2-of-12 probes

    calls = []
    orig = ai.kmeans_centroids
    ai.kmeans_centroids = lambda *a, **k: (calls.append(1), orig(*a, **k))[1]
    try:
        # 200/600 = 0.33 > 0.25 -> exactly one drift rebuild
        m2 = ensure_ann_index(
            base, path, mode="ivf", n_centroids=12, n_probe=2,
            rebuild_threshold=0.25, delta_corpus=drift,
        )
        assert calls == [1]
        assert m2.n_delta_at_build == 200
        # the rebuild wiped the delta rows/markers; re-add them under the
        # new model — the pipeline's backfill_missing_deltas step
        assert existing_delta_batches(m2) == set()
        persist_delta(
            m2, spark, assign_delta(m2, drift_ids, drift_X, 0), 0
        )
        after = _recall(
            spark,
            ann_index_search(
                m2, spark, q, k=10, n_probe=2, allowed_batches=[BASE_BATCH, 0]
            ),
            q, corpus_full, 10,
        )
        assert after >= 0.85 and after > before
        # ratio reset: the immediate next run reuses, no second rebuild
        m3 = ensure_ann_index(
            base, path, mode="ivf", n_centroids=12, n_probe=2,
            rebuild_threshold=0.25, delta_corpus=drift,
        )
        assert calls == [1]
        np.testing.assert_array_equal(m3.centroids, m2.centroids)
        # default threshold=None keeps exact FAISS-add semantics: even the
        # drifted state never retrains
        m4 = ensure_ann_index(base, path, mode="ivf", n_centroids=12, n_probe=2)
        assert calls == [1]
        np.testing.assert_array_equal(m4.centroids, m2.centroids)
    finally:
        ai.kmeans_centroids = orig


def test_tripped_threshold_without_delta_corpus_is_ignored(spark, embs, tmp_path):
    """A tripped drift threshold with ``delta_corpus=None`` must NOT
    rebuild: rebuilding wipes the persisted delta rows, and without the
    delta vectors in hand the caller's backfill could never restore them
    (permanent recall hole) — and the recorded ``n_delta_at_build=0``
    would re-trip the threshold on every later run, retraining forever.
    The scenario is real: a caller whose ``new_entities`` table is
    unreadable (or that has drained nothing yet) passes None while the
    index still holds committed delta rows."""
    rng = np.random.default_rng(3)
    path = str(tmp_path / "guard_idx")
    model = build_ann_index(embs, path, mode="ivf", n_centroids=12, seed=11)
    d_ids = np.arange(5000, 5300, dtype=np.int64)  # 300/400 >> 0.25
    d_X = rng.normal(size=(300, 32)).astype(np.float32)
    persist_delta(model, spark, assign_delta(model, d_ids, d_X, 0), 0)

    calls = []
    orig = ai.kmeans_centroids
    ai.kmeans_centroids = lambda *a, **k: (calls.append(1), orig(*a, **k))[1]
    try:
        m2 = ensure_ann_index(
            embs, path, mode="ivf", n_centroids=12,
            rebuild_threshold=0.25, delta_corpus=None,
        )
    finally:
        ai.kmeans_centroids = orig
    assert calls == []  # reused, NOT retrained
    np.testing.assert_array_equal(m2.centroids, model.centroids)
    assert existing_delta_batches(m2) == {0}  # delta rows survived
    got = ann_index_search(
        m2, spark,
        spark.createDataFrame(
            [(9000, [float(x) for x in d_X[0]])],
            "vec_id long, embedding array<float>",
        ),
        k=5, allowed_batches=[BASE_BATCH, 0],
    ).toPandas()
    assert 5000 in set(got["neighbor_id"])  # deltas still searchable


def test_empty_delta_commits_marker_only(spark, embs, tmp_path):
    """A zero-entity batch persists a marker (so resume backfill never
    re-scans it) but no partition directory."""
    import os

    path = str(tmp_path / "mk_idx")
    model = build_ann_index(embs, path, mode="ivf", n_centroids=12, seed=11)
    persist_delta(model, spark, None, 7)
    assert existing_delta_batches(model) == {7}
    assert not os.path.isdir(os.path.join(model.rows_path, "added_batch=7"))
    # a rebuild wipes the markers along with the rows (deltas invalidated)
    build_ann_index(embs, path, mode="ivf", n_centroids=12, seed=11)
    assert existing_delta_batches(model) == set()
