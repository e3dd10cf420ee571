"""Fused detect→encode→retrieve stage must equal the composed chain."""

import numpy as np

from incremental_entity_extraction_spark.operators.encode import encode_mentions_df
from incremental_entity_extraction_spark.operators.fused import detect_encode_retrieve
from incremental_entity_extraction_spark.operators.mentions import detect_mentions
from incremental_entity_extraction_spark.operators.retrieval import (
    build_kb_shards,
    retrieve_topk,
)


def test_fused_equals_composed(spark, spark_world, cfg):
    shards = build_kb_shards(spark_world["entities_kb"], n_shards=1)
    fused = detect_encode_retrieve(
        spark_world["transcripts"], cfg, shards
    ).toPandas().sort_values("mention_id").reset_index(drop=True)
    composed = retrieve_topk(
        encode_mentions_df(detect_mentions(spark_world["transcripts"]), cfg),
        cfg,
        shards,
    ).toPandas().sort_values("mention_id").reset_index(drop=True)

    assert list(fused["mention_id"]) == list(composed["mention_id"])
    assert list(fused["mention"]) == list(composed["mention"])
    assert list(fused["context_left"]) == list(composed["context_left"])
    for fe, ce in zip(fused["encoding"], composed["encoding"]):
        np.testing.assert_array_equal(np.asarray(fe), np.asarray(ce))
    for fc, cc in zip(fused["candidates"], composed["candidates"]):
        assert [(c["id"], c["indexer"]) for c in fc] == [
            (c["id"], c["indexer"]) for c in cc
        ]
        np.testing.assert_allclose(
            [c["score"] for c in fc], [c["score"] for c in cc], rtol=1e-5
        )


def test_detect_encode_equals_fused_minus_candidates(spark, spark_world, cfg):
    """The retrieval-free fused hop must be bit-identical to the full fused
    stage with the candidates column dropped."""
    from incremental_entity_extraction_spark.operators.fused import detect_encode
    from incremental_entity_extraction_spark.operators.retrieval import (
        build_kb_shards,
    )
    import numpy as np

    t = spark_world["transcripts"].limit(60)
    shards = build_kb_shards(spark_world["entities_kb"], 1)
    full = (
        detect_encode_retrieve(t, cfg, shards)
        .drop("candidates")
        .toPandas()
        .sort_values("mention_id")
        .reset_index(drop=True)
    )
    lite = (
        detect_encode(t, cfg)
        .toPandas()
        .sort_values("mention_id")
        .reset_index(drop=True)
    )
    assert list(full.columns) == list(lite.columns)
    for col in full.columns:
        if col == "encoding":
            for a, b in zip(full[col], lite[col]):
                assert np.array_equal(np.asarray(a), np.asarray(b))
        else:
            assert list(full[col]) == list(lite[col])


def test_shards_bc_rejects_inline_extra_shards(spark_world, cfg):
    """shards_bc + non-empty shards would force an internal per-call
    broadcast nobody could unpersist (the O(batches x KB) leak
    extra_shards_bc exists to avoid) — the API must refuse it loudly."""
    import pytest

    from incremental_entity_extraction_spark.operators.retrieval import (
        build_kb_shards,
    )

    shards = build_kb_shards(spark_world["entities_kb"], 1)
    bc = spark_world["transcripts"].sparkSession.sparkContext.broadcast(shards)
    try:
        with pytest.raises(ValueError, match="shards must be \\[\\]"):
            detect_encode_retrieve(
                spark_world["transcripts"].limit(5), cfg, shards, shards_bc=bc
            )
    finally:
        bc.unpersist()
