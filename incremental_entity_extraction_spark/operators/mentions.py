"""M1 — mention detection over transcript turns.

Reference: Flair NER over sentences inside the biencoder service
(pipeline/biencoder/blink/ner.py:29-42, blink/main_dense.py:80-101).
Ours: an Arrow-batched ``mapInPandas`` stage running the deterministic
detector kernel per partition — no per-row Python, no shuffle (narrow
transform over the transcripts scan).  Contexts are lowercase like the
reference's ``_annotate`` (main_dense.py:89-96).

``mention_id`` is the deterministic composite ``conv_id:turn_idx:start_tok``
(never ``monotonically_increasing_id`` — ids must be stable under retry and
resume, SURVEY.md §4).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from incremental_entity_extraction_spark.functions.detection import (
    detect_mentions_in_tokens,
)
from incremental_entity_extraction_spark.functions.featurizer import tokenize

MENTION_SCHEMA = T.StructType(
    [
        T.StructField("mention_id", T.StringType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("batch_id", T.IntegerType(), False),
        T.StructField("start_tok", T.IntegerType(), False),
        T.StructField("mention", T.StringType(), False),
        T.StructField("context_left", T.StringType(), True),
        T.StructField("context_right", T.StringType(), True),
    ]
)


def detect_mentions(transcripts: DataFrame, known_words: frozenset | None = None) -> DataFrame:
    """transcripts(conv_id, turn_idx, text, batch_id, ...) -> mention rows.

    ``known_words`` overrides the default filler vocabulary — e.g. a
    corpus-derived frequent-token set (mentions are then the rare-token
    runs).  The set ships to executors via closure broadcast."""

    def _detect(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kw = known_words
        for pdf in batches:
            rows = {k: [] for k in MENTION_SCHEMA.fieldNames()}
            for conv_id, turn_idx, batch_id, text in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["batch_id"], pdf["text"]
            ):
                toks = tokenize(text)
                spans = (
                    detect_mentions_in_tokens(toks)
                    if kw is None
                    else detect_mentions_in_tokens(toks, kw)
                )
                for start, width, surface in spans:
                    rows["mention_id"].append(f"{conv_id}:{turn_idx}:{start}")
                    rows["conv_id"].append(conv_id)
                    rows["turn_idx"].append(int(turn_idx))
                    rows["batch_id"].append(int(batch_id))
                    rows["start_tok"].append(start)
                    rows["mention"].append(surface)
                    rows["context_left"].append(" ".join(toks[:start]))
                    rows["context_right"].append(" ".join(toks[start + width :]))
            yield pd.DataFrame(rows)

    cols = ["conv_id", "turn_idx", "batch_id", "text"]
    return transcripts.select(*cols).mapInPandas(_detect, schema=MENTION_SCHEMA)
