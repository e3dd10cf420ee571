"""Deterministic synthetic fixtures (transcripts, entity KB, gold mentions)."""

from incremental_entity_extraction_spark.fixtures.generator import World, make_world, write_world

__all__ = ["World", "make_world", "write_world"]
