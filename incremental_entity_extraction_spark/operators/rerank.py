"""M14 — crossencoder-style candidate rerank.

The reference declares a crossencoder rerank service (port 30302, blink/
crossencoder/*, main_dense.py:300-323) but never deploys it in the eval
pipeline (absent from docker-compose).  This engine ships the stage anyway,
with the same pluggable-model philosophy as the bi-encoder: the default
scorer is the deterministic featurizer applied *jointly* — the mention's
context window is re-encoded together with the candidate's title (the
cross-attention analogue: candidate tokens participate in the query
encoding), then scored against the candidate tower.

Narrow mapInPandas over the enriched mention rows; the candidate metadata
needed (title, descr-lite) already rides inside the candidates array, so no
extra broadcast or shuffle.  Cost is O(top_k) encodes per mention — exactly
why the reference gates it behind a smaller top_k; ``top_m`` bounds it here.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from incremental_entity_extraction_spark.config import PipelineConfig
from incremental_entity_extraction_spark.functions.featurizer import (
    FOCUS_WEIGHT,
    build_entity_window,
    build_mention_window,
    encode_token_lists,
    tokenize,
)
from incremental_entity_extraction_spark.operators.retrieval import CANDIDATE_STRUCT

_RERANKED_STRUCT = T.StructType(
    CANDIDATE_STRUCT.fields
    + [T.StructField("cross_score", T.FloatType(), False)]
)


def rerank_crossencoder(
    enriched: DataFrame, cfg: PipelineConfig, top_m: int | None = None
) -> DataFrame:
    """Re-sorts each mention's candidate list by the joint cross score.

    Output schema = input schema with ``candidates`` replaced by the
    reranked array (each element gains ``cross_score``).  Deterministic
    ties: cross_score desc, then original bi-encoder rank.
    """
    dim, norm = cfg.dim, cfg.vector_norm
    max_ctx, max_ent = cfg.max_context_tokens, cfg.max_entity_tokens
    m = top_m or cfg.top_k

    out_fields = [
        f if f.name != "candidates"
        else T.StructField("candidates", T.ArrayType(_RERANKED_STRUCT), False)
        for f in enriched.schema.fields
    ]
    out_schema = T.StructType(out_fields)
    in_cols = [f.name for f in enriched.schema.fields]

    def _rerank(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # flatten ALL (mention, candidate) joint windows in the Arrow
            # batch and encode ONCE per tower — encode_token_lists builds a
            # unique-token vocab per call, so per-mention calls paid that
            # Python overhead ~|mentions|× instead of 1×
            q_windows, q_weights, e_windows, e_weights = [], [], [], []
            rows_cands: list[list] = []
            for left, mention, right, cands in zip(
                pdf["context_left"], pdf["mention"], pdf["context_right"],
                pdf["candidates"],
            ):
                cands = list(cands)[:m]
                rows_cands.append(cands)
                if not cands:
                    continue
                base_toks, base_w = build_mention_window(
                    left or "", mention, right or "", max_ctx
                )
                for c in cands:
                    # joint query window: context + candidate title tokens
                    t_toks = tokenize(c["title"])
                    q_windows.append(base_toks + t_toks)
                    q_weights.append(list(base_w) + [FOCUS_WEIGHT] * len(t_toks))
                    e_toks, e_w = build_entity_window(c["title"], "", max_ent)
                    e_windows.append(e_toks)
                    e_weights.append(e_w)
            if q_windows:
                q_enc = encode_token_lists(q_windows, dim, norm, q_weights)
                e_enc = encode_token_lists(e_windows, dim, norm, e_weights)
                flat_scores = (q_enc * e_enc).sum(1)
            else:
                flat_scores = np.zeros(0, dtype=np.float32)
            new_cands = []
            pos = 0
            for cands in rows_cands:
                n = len(cands)
                s = flat_scores[pos : pos + n]
                pos += n
                order = sorted(range(n), key=lambda i: (-float(s[i]), i))
                new_cands.append(
                    [{**dict(cands[i]), "cross_score": float(s[i])} for i in order]
                )
            out = pdf[in_cols].copy()
            out["candidates"] = new_cands
            yield out

    return enriched.mapInPandas(_rerank, schema=out_schema)
