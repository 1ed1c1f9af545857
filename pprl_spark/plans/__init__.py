"""Staged pipeline plans: checkpointing, resume, lineage."""
