"""Distributed synthetic transcript generator (bench / scale fixtures).

The pandas generator (fixtures.generator) is row-by-row Python — right for
small parity fixtures, wrong for millions of turns.  This generator builds
the same transcript shape *inside Spark* with hash-derived pseudo-randomness
(``xxhash64`` of (conv_id, turn_idx, tag) — never ``rand()``, whose output
depends on partitioning), so any scale is deterministic and re-runnable.

Shape: Zipf-skewed turns per conversation (conv 0 is hot — the skew knob the
salted repartition must survive), each turn = hash-chosen filler tokens with
one embedded entity mention (+ a second at 35%).  Entity surfaces come from
a broadcast join against the entity catalogue keyed by hash — the catalogue
never rides the query plan as literals.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incremental_entity_extraction_spark.config import DEFAULT_CONFIG, PipelineConfig
from incremental_entity_extraction_spark.fixtures.generator import (
    FILLER_WORDS,
    _entity_titles,
)
from incremental_entity_extraction_spark.functions.featurizer import (
    build_entity_window,
    encode_token_lists,
)

_TYPES = ["person", "place", "org", "work", "event"]


def make_entities_pdf(
    n_entities: int, nil_frac: float = 0.005, cfg: PipelineConfig = DEFAULT_CONFIG
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """(entities_all, entities_kb) — vectorized driver-side build; the KB
    embedding encode is the only heavy step (vectorized featurizer)."""
    titles = _entity_titles(n_entities)
    rng = np.random.default_rng(cfg.seed)
    nil = np.zeros(n_entities, dtype=bool)
    nil[
        rng.choice(n_entities, size=max(1, int(n_entities * nil_frac)), replace=False)
    ] = True
    all_pdf = pd.DataFrame(
        {
            "ent_key": np.arange(n_entities, dtype=np.int64),
            "wikipedia_id": np.arange(n_entities, dtype=np.int64) + 1000,
            "title": titles,
            "descr": [
                f"a {_TYPES[i % len(_TYPES)]} concerning "
                + " ".join(
                    FILLER_WORDS[(i * 7 + j) % len(FILLER_WORDS)] for j in range(6)
                )
                for i in range(n_entities)
            ],
            "type_": [_TYPES[i % len(_TYPES)] for i in range(n_entities)],
            "nil": nil,
        }
    )
    kb = all_pdf[~all_pdf["nil"]].reset_index(drop=True).copy()
    kb["id"] = np.arange(len(kb), dtype=np.int64)
    kb["indexer"] = np.int32(cfg.ro_indexer_id)
    windows = [
        build_entity_window(t, d, cfg.max_entity_tokens)
        for t, d in zip(kb["title"], kb["descr"])
    ]
    emb = encode_token_lists(
        [w[0] for w in windows], cfg.dim, cfg.vector_norm, [w[1] for w in windows]
    )
    kb["embedding"] = [r.tolist() for r in emb]
    return (
        all_pdf,
        kb[
            ["id", "indexer", "wikipedia_id", "title", "descr", "type_", "embedding"]
        ],
    )


def spark_transcripts(
    spark: SparkSession,
    entities_all: pd.DataFrame,
    n_convs: int,
    hot_turns: int,
    n_batches: int = 2,
    zipf: float = 0.8,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic transcripts DataFrame of roughly
    ``hot_turns * sum(i^-zipf)`` turns (conv 0 gets ``hot_turns``)."""
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism * 2
    n_ent = len(entities_all)
    n_fill = len(FILLER_WORDS)
    fillers_arr = F.array(*[F.lit(w) for w in FILLER_WORDS])
    titles_df = spark.createDataFrame(entities_all[["ent_key", "title"]])

    convs = spark.range(n_convs).select(
        F.concat(F.lit("conv_"), F.format_string("%08d", F.col("id"))).alias(
            "conv_id"
        ),
        F.greatest(
            F.lit(2),
            (F.lit(float(hot_turns)) / F.pow(F.col("id") + 1, F.lit(zipf))).cast(
                "int"
            ),
        ).alias("n_turns"),
        F.col("id").alias("conv_idx"),
    )
    turns = convs.select(
        "conv_id",
        "conv_idx",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    ).repartition(partitions, "conv_id", "turn_idx")

    def h(tag):
        return F.abs(F.xxhash64(F.col("conv_id"), F.col("turn_idx"), F.lit(tag)))

    n_words = (h("len") % 12 + 6).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda i: F.element_at(
            fillers_arr,
            (F.abs(F.xxhash64(F.col("conv_id"), F.col("turn_idx"), i)) % n_fill + 1
             ).cast("int"),
        ),
    )
    base = turns.select(
        "conv_id",
        "conv_idx",
        "turn_idx",
        words.alias("words"),
        n_words.alias("n_words"),
        (h("pos1") % n_words).cast("int").alias("pos1"),
        (h("e1") % n_ent).alias("k1"),
        F.when(h("p2") % 100 < 35, h("e2") % n_ent).alias("k2"),
    )
    t1 = titles_df.select(
        F.col("ent_key").alias("k1"), F.col("title").alias("title1")
    )
    t2 = titles_df.select(
        F.col("ent_key").alias("k2"), F.col("title").alias("title2")
    )
    joined = base.join(F.broadcast(t1), "k1").join(F.broadcast(t2), "k2", "left")
    text = F.concat_ws(
        " ",
        F.concat_ws(" ", F.slice(F.col("words"), 1, F.col("pos1"))),
        F.col("title1"),
        F.coalesce(F.col("title2"), F.lit("")),
        F.concat_ws(
            " ",
            F.slice(
                F.col("words"), F.col("pos1") + 1, F.col("n_words") - F.col("pos1")
            ),
        ),
    )
    roles = F.array(F.lit("user"), F.lit("assistant"), F.lit("tool"))
    return joined.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.element_at(roles, (F.col("turn_idx") % 3 + 1).cast("int")).alias("role"),
        F.trim(F.regexp_replace(text, "  +", " ")).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.timestamp_seconds(
            F.lit(1704067200) + F.col("conv_idx") * 7 + F.col("turn_idx") * 13
        ).alias("ts"),
        (F.abs(F.xxhash64(F.col("conv_id"))) % n_batches).cast("int").alias(
            "batch_id"
        ),
    )
