"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship incremental KG-construction pipeline over
transcripts derived from /root/testdata/sf0.001 documents and returns the
emitted (subj, pred, obj) triples.  ``queries()``/``oracle_sql()`` expose the
operator inventory (SURVEY.md §2 + training-data ops) with DuckDB oracles
for every SQL-expressible query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# make the package importable regardless of the driver's cwd
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from incremental_entity_extraction_spark.entry_queries import (  # noqa: E402
    ORACLE_SQL,
    QUERIES,
    q28_kg_triples,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: incremental entity extraction + KG construction at sf0.001."""
    return q28_kg_triples(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator group from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; rows-only
    entries (dense retrieval, LSH, incremental state, media decode) are
    intentionally omitted."""
    return dict(ORACLE_SQL)
