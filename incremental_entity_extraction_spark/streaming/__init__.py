"""Structured Streaming surface for the incremental pipeline."""

from incremental_entity_extraction_spark.streaming.incremental import (
    run_streaming_incremental,
)

__all__ = ["run_streaming_incremental"]
