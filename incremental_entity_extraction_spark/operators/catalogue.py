"""S2/S3 — entity-catalogue ingest: entity.jsonl(.gz) -> encoded KB rows.

Reference: scripts/postgres_populate_entities.py:23-62 streams the BLINK
entity catalogue line by line, parses ``wikipedia_id`` out of the ``idx``
URL (``curid=N``, else the whole field as int), truncates titles to
``max_title_len``, and COPYs (id, indexer, wikipedia_id, title, descr)
into Postgres with id = line number.

Spark design: ``spark.read.json`` (gzip transparent, splittable across
files), pure column expressions for the parse/truncate, ``contiguous_ids``
for the id assignment, and the entity tower for embeddings — the catalogue
lands retrieval-ready in one job.

Id-order note: the reference's id = FILE LINE NUMBER.  Distributed readers
do not expose stable line numbers as a column, so the default here orders
ids by the deterministic key (wikipedia_id, title) — same contiguity and
stability guarantees, independent of partitioning.  ``id_order='file'``
reproduces exact line order via ``zipWithIndex`` (RDD rows ride through the
Python serializer — the strict-parity path, fine for catalogue-sized data,
not the 100-TB default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incremental_entity_extraction_spark.config import PipelineConfig
from incremental_entity_extraction_spark.operators.encode import encode_entities_df
from incremental_entity_extraction_spark.operators.kb import contiguous_ids


def ingest_entity_catalogue(
    spark: SparkSession,
    path: str,
    cfg: PipelineConfig,
    indexer: int | None = None,
    id_order: str = "key",
    encode: bool = True,
) -> DataFrame:
    """entity.jsonl(.gz) path/glob -> (id, indexer, wikipedia_id, title,
    descr, type_[, embedding]) with contiguous ids from 0."""
    raw = spark.read.json(path)
    wid = F.when(
        F.col("idx").contains("curid="),
        F.regexp_extract("idx", "curid=(\\d+)", 1).cast("long"),
    ).otherwise(F.trim(F.col("idx")).cast("long"))
    parsed = raw.select(
        wid.alias("wikipedia_id"),
        F.substring("title", 1, cfg.max_title_len).alias("title"),
        F.col("text").alias("descr"),
    )
    if id_order == "file":
        # strict line-order parity (see module docstring)
        rdd = raw.select("idx", "title", "text").rdd.zipWithIndex()
        rows = rdd.map(
            lambda t: (int(t[1]), t[0]["idx"], t[0]["title"], t[0]["text"])
        )
        parsed = spark.createDataFrame(
            rows, "id long, idx string, title string, text string"
        ).select(
            "id",
            wid.alias("wikipedia_id"),
            F.substring("title", 1, cfg.max_title_len).alias("title"),
            F.col("text").alias("descr"),
        )
        with_ids = parsed
    else:
        with_ids = contiguous_ids(
            parsed, ["wikipedia_id", "title"], id_col="id", start=0
        )
    ents = with_ids.select(
        "id",
        F.lit(int(cfg.ro_indexer_id if indexer is None else indexer))
        .cast("int")
        .alias("indexer"),
        "wikipedia_id",
        "title",
        "descr",
        F.lit(None).cast("string").alias("type_"),
    )
    return encode_entities_df(ents, cfg) if encode else ents
