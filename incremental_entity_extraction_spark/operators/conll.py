"""S10 — AIDA-YAGO CoNLL scan (the last reference source format).

Reference: pipeline/threestepclustering/Packages/ClusteringHelper.py:13-109
(``read_aida_yago_conll`` + ``text_reconstruction``): a sequential line loop
that merges B/I-tagged tokens into mention spans, tracks per-document char
and word counters, clears ``--NME--`` (not-in-KB) annotations, and returns
(reconstructed texts, token-level dataframe).

Spark design — document-parallel, not line-parallel: the format's state
machine is per-document (``-DOCSTART-`` resets every counter), so the
natural distribution unit is the document, not the line.

1. ``spark.read.text(..., wholetext=True)`` — one row per file (CoNLL files
   are modest; a 100-TB corpus is many files, and file rows parallelize);
2. JVM-side ``split('(?=-DOCSTART-)')`` + ``posexplode`` — one row per
   document chunk, then ``repartition`` so parsing spreads over the cluster;
3. one vectorized ``mapInPandas`` runs the per-chunk state machine — pure
   Python string ops batched over Arrow, no per-row UDF, no shuffle until
   the caller aggregates.

Faithful to the reference's exact semantics, including its quirks:

* char spans cover only the B token of a multi-token mention and the char
  counter advances by ``len(B token) + 1`` (I tokens extend the span TEXT
  but not its char index — ClusteringHelper.py:77-90 never updates
  ``counter``/``indexes`` on I rows);
* the word counter advances on every raw token line (B and I);
* a line whose tag is neither B nor I contributes no span but still
  advances the word counter;
* ``--NME--`` spans keep their row but lose mention/entity/tag
  (ClusteringHelper.py:97-101).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SPAN_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.IntegerType(), True),
        T.StructField("token", T.StringType(), False),
        T.StructField("start", T.IntegerType(), False),
        T.StructField("end", T.IntegerType(), False),
        T.StructField("word_index", T.IntegerType(), False),
        T.StructField("tag", T.StringType(), False),
        T.StructField("mention", T.StringType(), False),
        T.StructField("entity", T.StringType(), False),
        T.StructField("wikidata", T.StringType(), False),
        T.StructField("numeric_code", T.StringType(), False),
        T.StructField("alpha_code", T.StringType(), False),
    ]
)


def _parse_doc_chunk(chunk: str, unicode_escape: bool) -> list[dict]:
    """State machine over ONE document chunk (starts with its -DOCSTART-)."""
    if unicode_escape:
        # the reference opens files with codecs 'unicode_escape'
        # (ClusteringHelper.py:15); apply the same decoding to the chunk
        try:
            chunk = chunk.encode("latin-1", "backslashreplace").decode(
                "unicode_escape"
            )
        except UnicodeDecodeError:
            pass
    lines = chunk.split("\n")
    doc_id: int | None = None
    spans: list[dict] = []
    counter = 0
    word_counter = 0
    for raw in lines:
        word = raw.split("\t")
        if "DOCSTART" in word[0]:
            tag_part = word[0].split()[1][1:]
            doc_id = int(tag_part.replace("testa", "").replace("testb", "")) - 1
            counter = 0
            word_counter = 0
            continue
        if len(word[0]) == 0:
            continue
        tag = word[1] if len(word) > 1 else None
        if tag == "I" and spans:
            spans[-1]["token"] += " " + word[0]
            word_counter += 1
            continue
        if tag is not None and tag not in ("B", "I"):
            word_counter += 1
            continue
        # B row or bare token: open a new span
        def col(i: int) -> str:
            return word[i] if tag == "B" and len(word) > i else ""

        spans.append(
            {
                "doc_id": doc_id,
                "token": word[0],
                "start": counter,
                "end": counter + len(word[0]),
                "word_index": word_counter,
                "tag": "B" if (tag == "B" and len(word) > 4 and word[4]) else "",
                "mention": col(2),
                "entity": col(3),
                "wikidata": col(4),
                "numeric_code": col(5),
                "alpha_code": col(6),
            }
        )
        counter += len(word[0]) + 1
        word_counter += 1
    for s in spans:
        if s["entity"] == "--NME--":
            s["entity"] = ""
            s["tag"] = ""
            s["mention"] = ""
    return spans


def read_aida_yago_conll(
    spark: SparkSession,
    path: str,
    unicode_escape: bool = True,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed AIDA-YAGO CoNLL scan -> span DataFrame (SPAN_SCHEMA).

    One output row per mention span / bare token, mirroring the reference
    dataframe columns (documents, tokens, indexes, word_indexes, mentions,
    entities, wikidatas, numeric_codes, alpha_codes)."""
    par = partitions or spark.sparkContext.defaultParallelism
    files = spark.read.text(path, wholetext=True)
    chunks = (
        files.select(
            F.posexplode(F.split("value", r"(?=-DOCSTART-)")).alias("pos", "chunk")
        )
        .filter(F.length(F.trim("chunk")) > 0)
        .filter(F.col("chunk").contains("DOCSTART"))
        .repartition(par)
    )

    def _parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: list[dict] = []
            for chunk in pdf["chunk"]:
                rows.extend(_parse_doc_chunk(chunk, unicode_escape))
            yield pd.DataFrame(
                rows, columns=[f.name for f in SPAN_SCHEMA.fields]
            )

    return chunks.mapInPandas(_parse, schema=SPAN_SCHEMA)


def reconstruct_texts(spans: DataFrame) -> DataFrame:
    """(doc_id, text): per-document join of merged span tokens in span order
    (reference ``text_reconstruction``, ClusteringHelper.py:109-114)."""
    ordered = F.transform(
        F.array_sort(
            F.collect_list(F.struct(F.col("word_index").alias("w"), F.col("token").alias("t")))
        ),
        lambda s: s["t"],
    )
    return spans.groupBy("doc_id").agg(
        F.concat_ws(" ", ordered).alias("text")
    )


def conll_to_transcripts(spans: DataFrame) -> DataFrame:
    """Bridge into the engine's transcript schema so the incremental KG
    pipeline runs directly on AIDA documents: one turn per document
    (conv_id = doc_<id>, turn_idx = 0)."""
    texts = reconstruct_texts(spans)
    return texts.select(
        F.concat(F.lit("doc_"), F.col("doc_id").cast("string")).alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.lit("user").alias("role"),
        F.col("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit(0).cast("int").alias("batch_id"),
    )
