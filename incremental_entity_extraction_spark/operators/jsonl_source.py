"""JSONL transcript source — the scan variant for line-delimited JSON dumps.

Conversation/agent transcripts commonly arrive as JSONL exports rather than
parquet (one turn per line).  The reference ingests its entity catalogue
from exactly this shape (models/entities_data.jsonl; see
operators/catalogue.py, which cites pipeline/postgres/populate.py) — this
module is the transcript-table counterpart.

Scale rules baked in:

* **Explicit schema, never inference** — schema inference is a full extra
  pass over the data (at 100 TB, a second 100 TB scan) and can silently
  widen types between runs.  The canonical transcript schema is the
  module-level ``TRANSCRIPT_JSON_SCHEMA``.
* **PERMISSIVE + corrupt-record quarantine** — real JSONL dumps contain
  torn lines; failing the job (FAILFAST) or silently nulling fields are
  both wrong.  Malformed lines land in ``_corrupt_record`` and are split
  into a separate return so callers can count/route them (dead-letter
  pattern); the clean rows keep exactly the declared schema.
* gzip (`.jsonl.gz`) is decoded transparently by the datasource, same as
  the catalogue scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPT_JSON_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

_CORRUPT = "_corrupt_record"


def read_transcripts_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = TRANSCRIPT_JSON_SCHEMA,
) -> tuple[DataFrame, DataFrame]:
    """(clean, corrupt): clean rows with exactly ``schema``'s columns, and
    the quarantined raw lines that failed to parse (dead-letter queue).

    One narrow scan, no shuffle; the JSON parse runs inside whole-stage
    codegen (JacksonParser), not Python."""
    # text source + from_json, NOT spark.read.json: the json datasource
    # forbids queries over its internal corrupt-record column unless the
    # whole input is cached (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_
    # COLUMN), and caching a 100 TB corpus is not an option.  from_json runs
    # the same JacksonParser JVM-side inside codegen, so the scan cost is
    # identical; blank lines are dropped like the json source does.
    full = T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType(), True)]
    )
    parsed = (
        spark.read.text(path)
        .filter(F.length(F.trim("value")) > 0)
        .select(
            F.from_json(
                "value", full, {"columnNameOfCorruptRecord": _CORRUPT}
            ).alias("j"),
            "value",
        )
    )
    clean = parsed.filter(F.col(f"j.{_CORRUPT}").isNull()).select(
        *[F.col(f"j.{f.name}").alias(f.name) for f in schema.fields]
    )
    corrupt = parsed.filter(F.col(f"j.{_CORRUPT}").isNotNull()).select(
        F.col("value").alias("raw_line")
    )
    return clean, corrupt
