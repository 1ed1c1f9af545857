"""pprl_spark — a PySpark-native privacy-preserving record-linkage engine.

A from-scratch re-design (NOT a port) of the capabilities of
``datasciencecampus/pprl_toolkit``: q-gram / skip-gram / phonetic feature
extraction, salted SHA-256 Bloom-filter embedding, blocked candidate
generation (MinHash-LSH + sorted-neighborhood), Dice / cosine /
Jaro-Winkler pair scoring, per-row similarity thresholds, mutual-best /
assignment matching, and transitive clustering via connected components —
all expressed as Spark DataFrame plans with vectorized pandas/Arrow UDFs
only where built-in functions genuinely cannot express the semantics.

The reference computes a dense N×M similarity matrix
(`/root/reference/src/pprl/embedder/embedder.py:468-528`); this engine never
materializes it. Candidate pairs are generated under blocking keys and
scored sparsely, so the same pipeline scales from 5k-row FEBRL-style
fixtures to a 10^12-document corpus on a real cluster.
"""

__version__ = "0.1.0"

from pprl_spark.config import EmbedderConfig

__all__ = ["EmbedderConfig"]
