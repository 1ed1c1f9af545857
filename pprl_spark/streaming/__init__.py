"""Structured Streaming adapters (incremental embedding)."""
