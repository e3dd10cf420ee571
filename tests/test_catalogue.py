"""S2 entity-catalogue ingest: curid parse, bare-int fallback, title
truncation, gzip transparency, contiguous ids, and line-order strict mode."""

import gzip
import json

import pytest
from pyspark.sql import functions as F

from incremental_entity_extraction_spark.operators.catalogue import (
    ingest_entity_catalogue,
)

LINES = [
    {"idx": "https://en.wikipedia.org/wiki?curid=42", "title": "Douglas", "text": "a writer"},
    {"idx": " 7 ", "title": "Seven", "text": "a number"},
    {"idx": "https://en.wikipedia.org/wiki?curid=9000", "title": "T" * 150, "text": "long title entity"},
]


@pytest.fixture(scope="module")
def catalogue_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cat")
    with open(d / "entity.jsonl", "w") as f:
        for r in LINES[:2]:
            f.write(json.dumps(r) + "\n")
    with gzip.open(d / "entity2.jsonl.gz", "wt") as f:
        f.write(json.dumps(LINES[2]) + "\n")
    return str(d)


def test_ingest_parses_and_encodes(spark, catalogue_dir, cfg):
    kb = ingest_entity_catalogue(spark, catalogue_dir, cfg).toPandas()
    kb = kb.sort_values("wikipedia_id").reset_index(drop=True)
    assert list(kb["wikipedia_id"]) == [7, 42, 9000]
    # title truncated to cfg.max_title_len (reference max_title_len=100)
    assert len(kb[kb.wikipedia_id == 9000]["title"].iloc[0]) == cfg.max_title_len
    # contiguous ids from 0, ordered by the deterministic key
    assert sorted(kb["id"]) == [0, 1, 2]
    assert list(kb.sort_values("id")["wikipedia_id"]) == [7, 42, 9000]
    # retrieval-ready: encoded to cfg.dim with norm vector_norm
    import numpy as np

    v = np.asarray(kb["embedding"].iloc[0], dtype=np.float32)
    assert v.shape == (cfg.dim,)
    assert abs(np.linalg.norm(v) - cfg.vector_norm) < 1e-3


def test_ingest_file_order_mode(spark, catalogue_dir, cfg, tmp_path):
    # strict parity: ids are exact line numbers within the single file
    single = str(tmp_path / "one.jsonl")
    with open(single, "w") as f:
        for r in LINES[:2]:
            f.write(json.dumps(r) + "\n")
    kb = (
        ingest_entity_catalogue(spark, single, cfg, id_order="file", encode=False)
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert list(kb["id"]) == [0, 1]
    assert list(kb["wikipedia_id"]) == [42, 7]  # file order, not key order


def test_ingested_kb_drives_retrieval(spark, catalogue_dir, cfg):
    """The ingested catalogue slots straight into the retrieval stack."""
    import pandas as pd

    from incremental_entity_extraction_spark.operators.fused import (
        detect_encode_retrieve,
    )
    from incremental_entity_extraction_spark.operators.retrieval import (
        build_kb_shards,
    )

    kb = ingest_entity_catalogue(spark, catalogue_dir, cfg)
    shards = build_kb_shards(kb, 1)
    t = spark.createDataFrame(
        pd.DataFrame(
            {
                "conv_id": ["c0"],
                "turn_idx": [0],
                "batch_id": [0],
                "text": ["the douglas wrote here"],
            }
        )
    )
    out = detect_encode_retrieve(t, cfg, shards, known_words=frozenset({"the"}))
    cands = out.select(F.explode("candidates").alias("c")).toPandas()
    assert len(cands) > 0
