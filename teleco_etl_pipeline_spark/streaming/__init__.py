"""Structured Streaming adapters for the engine's incremental
patterns (SURVEY.md §2.10)."""
