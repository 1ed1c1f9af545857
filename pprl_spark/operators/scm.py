"""Soft Cosine Measure training + trained-matrix scoring.

Training (A3/A4): the reference scatter-adds the per-row cross-product of
Bloom indices from two aligned matched datasets into a (B×B) float32
joint-frequency matrix, repeats on a shuffled alignment for the negative
class, and sets ``scm = PSD(log(Fm+eps) - log(Fu+eps))``
(`/root/reference/src/pprl/embedder/embedder.py:530-645`,
``nearest_pos_semi_definite`` `embedder.py:712-739`).

Spark mapping (SURVEY.md §2.5 A3): the per-row index cross-product is an
``explode × explode`` + ``groupBy(i, j).count()`` — fully distributed;
only the aggregated sparse counts (≤ B² = ~1M cells, a few MB) come to
the driver, where the small-matrix algebra runs in numpy exactly as the
reference does. Negatives come from a seeded derangement-by-sort instead
of ``pd.Series.sample`` (`embedder.py:623`).

Scoring with a trained matrix: a broadcast numpy array inside a pandas
UDF computing ``x1ᵀ A x2 / (n1·n2)`` per pair from sparse indices —
the trained-path analog of the native ``array_intersect`` cosine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pprl_spark.config import EmbedderConfig


def nearest_pos_semi_definite(X: np.ndarray, eps: float = 0.0) -> np.ndarray:
    """Eigenvalue clipping — semantics of embedder.py:712-739."""
    C = (X + X.T) / 2
    eigval, eigvec = np.linalg.eig(C)
    eigval[eigval < 0] = eps
    return np.real(eigvec.dot(np.diag(eigval)).dot(eigvec.T))


def joint_freq_counts(pairs: DataFrame) -> DataFrame:
    """(i, j, n): distributed analog of _joint_freq_matrix scatter-add
    (embedder.py:550-559) over aligned (bf_indices_1, bf_indices_2) rows.
    """
    return (
        pairs.select(
            F.explode("bf_indices_1").alias("i"), F.col("bf_indices_2")
        )
        .select("i", F.explode("bf_indices_2").alias("j"))
        .groupBy("i", "j")
        .count()
        .withColumnRenamed("count", "n")
    )


def _counts_to_matrix(counts: DataFrame, size: int) -> np.ndarray:
    S = np.zeros((size, size), dtype=np.float32)
    rows = counts.collect()  # sparse: <= size^2 cells, typically ~1e5
    for r in rows:
        S[r["i"], r["j"]] += r["n"]
    return (S + S.T) / 2  # symmetrize (embedder.py:562)


def train_scm(
    aligned: DataFrame,
    config: EmbedderConfig,
    learning_rate: float = 1.0,
    eps: float = 0.01,
    seed: int = 42,
    prior_matched: np.ndarray | None = None,
    prior_unmatched: np.ndarray | None = None,
) -> dict[str, np.ndarray]:
    """Train the SCM from aligned matched pairs.

    ``aligned``: (bf_indices_1, bf_indices_2) — one row per known match.
    Returns dict with scm/freq_matr_matched/freq_matr_unmatched, mirroring
    the Embedder attributes (embedder.py:318-326). Cumulative training =
    pass the previous freq matrices as priors (embedder.py:631-636).
    """
    size = config.bf_size + config.offset
    w = Window.orderBy(F.xxhash64("bf_indices_1", F.lit(seed)))
    w2 = Window.orderBy(F.xxhash64("bf_indices_2", F.lit(seed + 1)))
    numbered = aligned.select(
        "bf_indices_1", "bf_indices_2", F.row_number().over(w).alias("rn")
    )
    # seeded shuffle of side 2 against side 1 (negative class, embedder.py:623)
    shuffled2 = aligned.select("bf_indices_2", F.row_number().over(w2).alias("rn"))
    jumbled = numbered.drop("bf_indices_2").join(shuffled2, "rn")

    Fm = _counts_to_matrix(joint_freq_counts(numbered), size)
    Fu = _counts_to_matrix(joint_freq_counts(jumbled), size)

    eye = np.eye(size, dtype=np.float32)
    fm = (prior_matched if prior_matched is not None else eye) + learning_rate * Fm
    fu = (prior_unmatched if prior_unmatched is not None else eye) + learning_rate * Fu

    scm = np.log(fm + eps) - np.log(fu + eps)  # embedder.py:639
    scm = nearest_pos_semi_definite(scm, eps=1e-6)  # embedder.py:643
    return {"scm": scm, "freq_matr_matched": fm, "freq_matr_unmatched": fu}


def scm_norm_udf(scm: np.ndarray):
    """bf_norm under a trained SCM: sqrt(sum A[ix,ix]) (embedder.py:137-139)."""

    @F.pandas_udf(T.DoubleType())
    def norm(indices: pd.Series) -> pd.Series:
        A = scm  # broadcast via closure (few MB at B=1024)
        return indices.apply(lambda ix: float(np.sqrt(A[np.ix_(ix, ix)].sum())))

    return norm


def scm_score_udf(scm: np.ndarray):
    """Pairwise soft-cosine numerator x1ᵀ A x2 from sparse indices."""

    @F.pandas_udf(T.DoubleType())
    def score(ix1: pd.Series, ix2: pd.Series) -> pd.Series:
        A = scm
        out = np.empty(len(ix1))
        for k, (a, b) in enumerate(zip(ix1, ix2)):
            out[k] = A[np.ix_(a, b)].sum()
        return pd.Series(out)

    return score


def soft_cosine_pairs(pairs: DataFrame, scm: np.ndarray) -> DataFrame:
    """Score candidate pairs with a trained SCM (dense-matrix-free).

    Input needs bf_indices_1/bf_indices_2; emits ``sim`` = soft cosine
    (embedder.py:519 restricted to the candidate pairs).
    """
    num = scm_score_udf(scm)
    nrm = scm_norm_udf(scm)
    # degenerate rows (norm 0 under a barely-trained matrix) score NULL
    denom = F.nullif(
        nrm(F.col("bf_indices_1")) * nrm(F.col("bf_indices_2")), F.lit(0.0)
    )
    return pairs.withColumn(
        "sim", num(F.col("bf_indices_1"), F.col("bf_indices_2")) / denom
    )
