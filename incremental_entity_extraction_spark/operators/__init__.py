"""Spark operators: one module per reference pipeline stage (SURVEY.md §2)."""
