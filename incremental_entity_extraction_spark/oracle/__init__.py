"""Single-node NumPy/pandas oracle reproducing the reference math exactly.

Test-only: the Spark pipeline must match this oracle's decisions (top-k ids,
is_nil, cluster membership, emitted triples) — SURVEY.md §5.
"""

from incremental_entity_extraction_spark.oracle.reference import (
    OracleState,
    oracle_run_incremental,
    oracle_detect_mentions,
)

__all__ = ["OracleState", "oracle_run_incremental", "oracle_detect_mentions"]
