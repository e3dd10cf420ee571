"""M4 pluggable-encoder contract: a custom encoder flows through the fused
stage (and the whole pipeline) unchanged, the default equals the hash
featurizer, and the torch adapter fails loudly where torch is absent."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from incremental_entity_extraction_spark.functions.featurizer import (
    encode_token_lists,
)
from incremental_entity_extraction_spark.operators.fused import (
    detect_encode_retrieve,
)
from incremental_entity_extraction_spark.operators.retrieval import build_kb_shards


def test_custom_encoder_flows_through_fused(spark, spark_world, cfg):
    shards = build_kb_shards(spark_world["entities_kb"], 1)
    t = spark_world["transcripts"].limit(40)

    # defined as a closure: cloudpickle ships it by VALUE, exactly how a
    # user-supplied encoder reaches executors (test modules aren't on the
    # worker import path)
    def _flipped_encoder_64(windows, weights):
        # hash featurizer with every vector negated — same norms (retrieval
        # stays well-defined) but distinguishable
        return -encode_token_lists(windows, 64, 10.0, weights)

    default = (
        detect_encode_retrieve(t, cfg, shards)
        .select("mention_id", "encoding")
        .toPandas()
        .set_index("mention_id")
        .sort_index()
    )
    custom = (
        detect_encode_retrieve(t, cfg, shards, encoder=_flipped_encoder_64)
        .select("mention_id", "encoding")
        .toPandas()
        .set_index("mention_id")
        .sort_index()
    )
    assert list(default.index) == list(custom.index)
    for mid in default.index:
        a = np.asarray(default.loc[mid, "encoding"], dtype=np.float32)
        b = np.asarray(custom.loc[mid, "encoding"], dtype=np.float32)
        assert np.allclose(a, -b), "custom encoder output must reach the rows"


def test_encoder_shape_contract_enforced(spark, spark_world, cfg):
    shards = build_kb_shards(spark_world["entities_kb"], 1)
    t = spark_world["transcripts"].limit(10)

    def bad_encoder(windows, weights):
        return np.zeros((len(windows), 3), dtype=np.float32)  # wrong dim

    from py4j.protocol import Py4JJavaError

    with pytest.raises((Py4JJavaError, Exception), match="encoder returned shape"):
        detect_encode_retrieve(t, cfg, shards, encoder=bad_encoder).select(
            F.count("*")
        ).collect()


def test_torch_adapter_raises_without_torch():
    from incremental_entity_extraction_spark.operators.torch_encoder import (
        make_torch_encoder,
    )

    try:
        import torch  # noqa: F401

        pytest.skip("torch present in this environment")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="hash featurizer"):
        make_torch_encoder("some-model", dim=64)


def test_torch_adapter_happy_path_when_deps_present(cfg):
    """Skip-if-missing smoke test for the real-model adapter: nothing in
    this sandbox can run it (torch absent), but the day the deps appear
    this pins the shape/dtype/norm contract of make_torch_encoder against
    an actual SentenceTransformer model — without it the adapter's happy
    path would ship forever unexecuted."""
    import numpy as np
    import pytest

    pytest.importorskip("torch")
    pytest.importorskip("sentence_transformers")
    from incremental_entity_extraction_spark.operators.torch_encoder import (
        make_torch_encoder,
    )

    # smallest commonly-cached sentence-transformers model; skip (not fail)
    # ONLY when the model itself can't be resolved/downloaded — the
    # adapter's encode path runs OUTSIDE the try so a real contract
    # regression fails instead of skipping
    model_name = "sentence-transformers/all-MiniLM-L6-v2"
    try:
        from sentence_transformers import SentenceTransformer

        SentenceTransformer(model_name, device="cpu")  # resolve + warm cache
    except Exception as e:  # download/resolution failure, not contract
        pytest.skip(f"model unavailable: {type(e).__name__}: {e}")
    enc = make_torch_encoder(
        model_name, dim=384, vector_norm=float(cfg.vector_norm)
    )
    out = enc([["acme", "corp"], ["widget"]], [[2.0, 2.0], [2.0]])
    assert out.shape == (2, 384)
    assert out.dtype == np.float32
    norms = np.linalg.norm(np.asarray(out, dtype=np.float64), axis=1)
    np.testing.assert_allclose(norms, float(cfg.vector_norm), rtol=1e-4)
