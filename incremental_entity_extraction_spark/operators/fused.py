"""Fused detect→encode→retrieve stage: ONE mapInPandas hop.

The composable operators (mentions.py, encode.py, retrieval.py) are three
chained ``mapInPandas`` stages.  Spark runs each as its own PythonRunner, so
a single task chains three Python workers and every intermediate row
(including the duplicated context strings) crosses the JVM↔Python Arrow
boundary three times.  At 32 cores that is ~96 concurrent Python workers —
measured 2-3× slower than this fused single-hop stage on the same data.

This operator runs the same three kernels (detection, featurizer,
tiled top-k) inside one worker pass and emits the full enriched mention
rows.  Output is bit-identical to the composed chain (tests assert it);
the composed operators remain for unit testing and ad-hoc composition.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from incremental_entity_extraction_spark.config import PipelineConfig
from incremental_entity_extraction_spark.functions.fused_kernel import (
    fused_mentions_frame,
)
from incremental_entity_extraction_spark.operators.retrieval import (
    CANDIDATE_STRUCT,
    KBShard,
    topk_candidates_kernel,
)

ENCODED_SCHEMA = T.StructType(
    [
        T.StructField("mention_id", T.StringType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("batch_id", T.IntegerType(), False),
        T.StructField("start_tok", T.IntegerType(), False),
        T.StructField("mention", T.StringType(), False),
        T.StructField("context_left", T.StringType(), True),
        T.StructField("context_right", T.StringType(), True),
        T.StructField("encoding", T.ArrayType(T.FloatType()), False),
    ]
)

FUSED_SCHEMA = T.StructType(
    ENCODED_SCHEMA.fields
    + [T.StructField("candidates", T.ArrayType(CANDIDATE_STRUCT), False)]
)


def detect_encode_retrieve(
    transcripts: DataFrame,
    cfg: PipelineConfig,
    shards: list[KBShard],
    known_words: frozenset | None = None,
    encoder=None,
) -> DataFrame:
    """transcripts -> enriched mention rows (encoding + sorted candidates).

    ``encoder`` is the M4 pluggable-contract point: a picklable callable
    ``(windows: list[list[str]], weights: list[list[float]]) ->
    np.ndarray[n, cfg.dim] float32`` run executor-side per Arrow batch.
    Default = the deterministic hash featurizer
    (functions.featurizer.encode_token_lists).  A real model plugs in via
    ``operators.torch_encoder.make_torch_encoder`` (executor-local model
    singleton).  Contract: vectors must be L2-normed to ``cfg.vector_norm``
    so the reference's dot-product thresholds keep their meaning
    (config.py docstring)."""
    spark = transcripts.sparkSession
    bc = spark.sparkContext.broadcast(shards)
    dim, norm, max_tok = cfg.dim, cfg.vector_norm, cfg.max_context_tokens
    k_cfg = cfg.top_k
    norm2 = float(cfg.vector_norm) ** 2

    def _fused(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        shard_list = bc.value
        for pdf in batches:
            # vectorized partition kernel (functions/fused_kernel.py) —
            # bit-identical to the per-row detection/window/encode chain
            res = fused_mentions_frame(
                pdf, known_words, max_tok, dim, norm, encoder
            )
            if res is None:
                continue
            out, enc = res
            out["candidates"] = topk_candidates_kernel(enc, shard_list, k_cfg, norm2)
            yield out

    cols = ["conv_id", "turn_idx", "batch_id", "text"]
    return transcripts.select(*cols).mapInPandas(_fused, schema=FUSED_SCHEMA)


def detect_encode(
    transcripts: DataFrame,
    cfg: PipelineConfig,
    known_words: frozenset | None = None,
    encoder=None,
) -> DataFrame:
    """Fused detect→encode WITHOUT retrieval — one Python hop for callers
    that retrieve through a join/ANN stage instead of the shard broadcast
    (run_batch retrieval_mode='ivf').  Same kernels and encoder contract as
    ``detect_encode_retrieve``; output = ENCODED_SCHEMA."""
    dim, norm, max_tok = cfg.dim, cfg.vector_norm, cfg.max_context_tokens

    def _de(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            res = fused_mentions_frame(
                pdf, known_words, max_tok, dim, norm, encoder
            )
            if res is not None:
                yield res[0]

    cols = ["conv_id", "turn_idx", "batch_id", "text"]
    return transcripts.select(*cols).mapInPandas(_de, schema=ENCODED_SCHEMA)
