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
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pprl_spark.config import EmbedderConfig

# Counted fast-path bound for driver-side joint-frequency scatter-adds:
# ~3KB of index lists per training row (~60MB at the limit) plus two
# B x B int64 accumulators (16MB at B=1024). Above it the distributed
# explode x explode aggregation runs unchanged.
SCM_DRIVER_ROWS = 20_000


def nearest_pos_semi_definite(X: np.ndarray, eps: float = 0.0) -> np.ndarray:
    """Eigenvalue clipping — semantics of embedder.py:712-739."""
    C = (X + X.T) / 2
    # eigh, not eig: C is symmetric by construction — real-valued and ~10x
    # faster than the general eigensolver at B=1024
    eigval, eigvec = np.linalg.eigh(C)
    eigval[eigval < 0] = eps
    return eigvec.dot(np.diag(eigval)).dot(eigvec.T)


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
    # Arrow batch + vectorized scatter-add: <= size^2 cells (typically
    # ~1e5-1e6) arrive as three numpy columns, not per-row Row objects
    pdf = counts.toPandas()
    np.add.at(S, (pdf["i"].to_numpy(), pdf["j"].to_numpy()), pdf["n"].to_numpy())
    return (S + S.T) / 2  # symmetrize (embedder.py:562)


def train_scm(
    aligned: DataFrame,
    config: EmbedderConfig,
    learning_rate: float = 1.0,
    eps: float = 0.01,
    seed: int = 42,
    prior_matched: np.ndarray | None = None,
    prior_unmatched: np.ndarray | None = None,
    driver_rows: int | None = None,
) -> dict[str, np.ndarray]:
    """Train the SCM from aligned matched pairs.

    ``aligned``: (bf_indices_1, bf_indices_2) — one row per known match.
    Returns dict with scm/freq_matr_matched/freq_matr_unmatched, mirroring
    the Embedder attributes (embedder.py:318-326). Cumulative training =
    pass the previous freq matrices as priors (embedder.py:631-636).
    """
    from pprl_spark.operators.private_index import _numbered

    size = config.bf_size + config.offset
    # Seeded alignment WITHOUT a global window: the training set is the
    # mutual-best match set, which grows linearly with the corpus — a
    # single-task Window.orderBy sort here would bottleneck at 100x. The
    # range-partitioned zipWithIndex (_numbered, range_by=True) computes
    # the identical global rank by the same xxhash64 key distributively,
    # so the seeded-shuffle semantics (embedder.py:623) and the trained
    # matrix are unchanged.
    #
    # One count action up front feeds _numbered's counted small-input
    # fast path: below SMALL_NUMBER_LIMIT training rows the distributed
    # alignment's ~6 fixed jobs (range sample, checkpoint, offset
    # collects x2 sides) are pure overhead, and a single-partition
    # numbering produces the identical ranks (order keys are xxhash64 —
    # no ties). The checkpoint also pins one materialization for both
    # numbering passes. Measured: scm_scored 16.2s -> ~8s at sf0.1
    # (865 training rows); the range-partitioned path still engages
    # unchanged above the threshold.
    aligned = aligned.select("bf_indices_1", "bf_indices_2").localCheckpoint()
    n_train = aligned.count()
    if driver_rows is None:
        driver_rows = SCM_DRIVER_ROWS

    if n_train <= driver_rows:
        # Counted small-training fast path: collect the aligned index
        # arrays (bounded: <= SCM_DRIVER_ROWS rows x ~2*num_indices ints)
        # and scatter-add the two joint-frequency matrices on the driver —
        # the reference's own _joint_freq_matrix shape — instead of two
        # explode x explode shuffles whose ~|pairs|*|ix|^2 rows dwarf the
        # training set (measured 2.6s -> ~0.2s at sf0.1's 865 rows).
        # Values are identical: per-cell totals are exact integers either
        # way (int64 accumulate -> float32 == float32(count)), and the
        # seeded derangement is reproduced from the same xxhash64 keys
        # (rank order; ties only arise from identical index arrays, where
        # either order pairs the same values).
        pdf = aligned.select(
            "bf_indices_1",
            "bf_indices_2",
            F.xxhash64("bf_indices_1", F.lit(seed)).alias("_h1"),
            F.xxhash64("bf_indices_2", F.lit(seed + 1)).alias("_h2"),
        ).toPandas()
        Sm = np.zeros((size, size), dtype=np.int64)
        Su = np.zeros((size, size), dtype=np.int64)
        ix1 = [np.asarray(a) for a in pdf["bf_indices_1"]]
        ix2 = [np.asarray(a) for a in pdf["bf_indices_2"]]
        for a, b in zip(ix1, ix2):
            if len(a) and len(b):
                Sm[np.ix_(a, b)] += 1
        order1 = np.argsort(pdf["_h1"].to_numpy(), kind="stable")
        order2 = np.argsort(pdf["_h2"].to_numpy(), kind="stable")
        for r1, r2 in zip(order1, order2):
            a, b = ix1[r1], ix2[r2]
            if len(a) and len(b):
                Su[np.ix_(a, b)] += 1
        Fm = Sm.astype(np.float32)
        Fm = (Fm + Fm.T) / 2
        Fu = Su.astype(np.float32)
        Fu = (Fu + Fu.T) / 2
    else:
        numbered, _ = _numbered(
            aligned.select(
                "bf_indices_1",
                "bf_indices_2",
                F.xxhash64("bf_indices_1", F.lit(seed)).alias("_h1"),
            ),
            "_h1",
            offset=0,
            range_by=True,
            known_count=n_train,
        )
        numbered = numbered.select(
            "bf_indices_1", "bf_indices_2", F.col("slot").alias("rn")
        )
        # seeded shuffle of side 2 against side 1 (negative class,
        # embedder.py:623)
        shuffled2, _ = _numbered(
            aligned.select(
                "bf_indices_2",
                F.xxhash64("bf_indices_2", F.lit(seed + 1)).alias("_h2"),
            ),
            "_h2",
            offset=0,
            range_by=True,
            known_count=n_train,
        )
        shuffled2 = shuffled2.select("bf_indices_2", F.col("slot").alias("rn"))
        jumbled = numbered.drop("bf_indices_2").join(shuffled2, "rn")
        Fm = _counts_to_matrix(joint_freq_counts(numbered), size)
        Fu = _counts_to_matrix(joint_freq_counts(jumbled), size)

    eye = np.eye(size, dtype=np.float32)
    fm = (prior_matched if prior_matched is not None else eye) + learning_rate * Fm
    fu = (prior_unmatched if prior_unmatched is not None else eye) + learning_rate * Fu

    scm = np.log(fm + eps) - np.log(fu + eps)  # embedder.py:639
    scm = nearest_pos_semi_definite(scm, eps=1e-6)  # embedder.py:643
    return {"scm": scm, "freq_matr_matched": fm, "freq_matr_unmatched": fu}


def scm_to_sparse(scm: np.ndarray) -> "pd.DataFrame":
    """Dense SCM -> (i, j, val) float64 triples of the non-zero cells.

    The on-disk interchange format: small enough to commit as a fixture
    (B² ≈ 1M rows at B=1024) and directly queryable by any SQL engine for
    oracle-side reproduction of the quadratic form x1ᵀ A x2.
    """
    ii, jj = np.nonzero(scm)
    return pd.DataFrame(
        {"i": ii.astype(np.int32), "j": jj.astype(np.int32), "val": scm[ii, jj].astype(np.float64)}
    )


def save_scm(scm: np.ndarray, path: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(scm_to_sparse(scm)), path)


def load_scm(path: str, size: int) -> np.ndarray:
    """Sparse parquet triples -> dense float64 matrix (float64 on purpose:
    the scorer's per-pair sums must agree with a SQL oracle summing doubles
    to 6 decimal places; float32 accumulation drifts past that)."""
    import pyarrow.parquet as pq

    t = pq.read_table(path)
    A = np.zeros((size, size), dtype=np.float64)
    A[t["i"].to_numpy(), t["j"].to_numpy()] = t["val"].to_numpy()
    return A


def soft_cosine_pairs_map(
    pairs: DataFrame, scm: np.ndarray, out_col: str = "sim"
) -> DataFrame:
    """mapInPandas variant of :func:`soft_cosine_pairs`.

    A logical operator rather than pandas-UDF columns: Spark 4.1 can skip
    Python-UDF extraction on re-executed plans that share subtrees, leaving
    a raw PythonUDF inside a codegen Project — mapInPandas cannot be missed.
    Keeps all input columns and appends ``out_col``.
    """
    A = np.asarray(scm, dtype=np.float64)
    # copy, don't .add(): StructType.add mutates the DataFrame's cached
    # schema object, corrupting pairs.columns
    schema = T.StructType(
        list(pairs.schema.fields) + [T.StructField(out_col, T.DoubleType())]
    )

    def kernel(batches):
        # Per-doc projection cache: each document appears in many pairs,
        # so memoize P_d = A[ix_d].sum(axis=0) (one 1xB vector per doc).
        # Then numerator x1ᵀAx2 = P_1[ix_2].sum() (an |ix|-element gather
        # instead of an |ix|² one — ~80x fewer gathered elements per pair)
        # and ‖x‖²_A = P_d[ix_d].sum(). Identical float64 ops/order as the
        # naive form: np.sum over the same cells, so oracle parity holds.
        proj_cache: dict = {}

        def proj_norm(ix: np.ndarray):
            key = ix.tobytes()
            v = proj_cache.get(key)
            if v is None:
                p = A[ix].sum(axis=0)
                v = (p, float(np.sqrt(p[ix].sum())))
                proj_cache[key] = v
            return v

        for pdf in batches:
            out = np.empty(len(pdf))
            for k, (a, b) in enumerate(zip(pdf["bf_indices_1"], pdf["bf_indices_2"])):
                ia, ib = np.asarray(a), np.asarray(b)
                p1, n1 = proj_norm(ia)
                _, n2 = proj_norm(ib)
                denom = n1 * n2
                out[k] = p1[ib].sum() / denom if denom > 0 else np.nan
            yield pdf.assign(**{out_col: out})

    out = pairs.mapInPandas(kernel, schema)
    # degenerate rows (norm 0 under a barely-trained matrix) score NULL,
    # matching the native path's F.when(denom > 0, ...) semantics
    return out.withColumn(
        out_col, F.when(~F.isnan(out_col), F.col(out_col))
    )


def scm_projections(
    docs: DataFrame, scm: np.ndarray, id_col: str = "doc_id"
) -> DataFrame:
    """(id, scm_proj array<double>, scm_norm double): per-DOC trained-SCM
    precomputation.

    ``scm_proj[j] = sum_{i in ix} A[i, j]`` — the projected row of the
    quadratic form — and ``scm_norm = sqrt(proj[ix].sum())``. Python cost
    is |docs| rows (one B-vector each), NOT |pairs|: pair scoring becomes
    a pure-JVM gather (:func:`soft_cosine_score_col`), which is the shape
    that survives 10^12 candidate pairs.
    """
    A = np.asarray(scm, dtype=np.float64)
    id_field = docs.schema[id_col]
    schema = T.StructType(
        [id_field, T.StructField("scm_proj", T.ArrayType(T.DoubleType())),
         T.StructField("scm_norm", T.DoubleType())]
    )

    def kernel(batches):
        for pdf in batches:
            projs, norms = [], []
            for ix in pdf["bf_indices"]:
                ia = np.asarray(ix)
                p = A[ia].sum(axis=0)
                projs.append(p)
                norms.append(float(np.sqrt(p[ia].sum())))
            yield pd.DataFrame({id_col: pdf[id_col], "scm_proj": projs, "scm_norm": norms})

    return docs.select(id_col, "bf_indices").mapInPandas(kernel, schema)


def soft_cosine_score_col(proj1: Column, indices2: Column, norm1: Column, norm2: Column) -> Column:
    """JVM-side soft cosine from a precomputed projection:
    ``sum_j proj1[ix2_j] / (norm1 * norm2)`` — codegen'd gather+sum, no
    Python in the per-pair hot path."""
    # one fused fold (gather inside the aggregate lambda) instead of
    # transform-then-aggregate: same cells in the same left-fold order —
    # identical float64 sums — minus the intermediate gathered array and
    # one interpreted HOF layer per pair
    num = F.aggregate(
        indices2,
        F.lit(0.0),
        lambda acc, j: acc + F.element_at(proj1, j + 1),
    )
    denom = norm1 * norm2
    return F.when(denom > 0, num / denom)


def soft_cosine_pairs_native(
    pairs: DataFrame,
    emb1: DataFrame,
    emb2: DataFrame,
    scm: np.ndarray,
    id1: str = "id1",
    id2: str = "id2",
    out_col: str = "sim",
) -> DataFrame:
    """Score (id1, id2) pairs with a trained SCM, Python-per-doc only.

    ``emb1``/``emb2``: frames with (doc_id, bf_indices). The projection
    tables are doc-sized (broadcastable: B doubles per doc); the pair
    table never moves through Python. Float64 sums over the same cells as
    :func:`soft_cosine_pairs_map`, so oracle parity holds to 6 decimals.
    """
    # Broadcast of p1 is GATED, never unconditional: it carries a B-length
    # double array (~8KB at B=1024) PER DOCUMENT of emb1 — corpus-sized
    # (~800MB at 100k docs), exactly the driver-OOM shape candidates.py
    # guards against. One count action on the (materialized) emb1 bounds
    # the relation; under 10% of the driver heap the broadcast join wins
    # (measured 5x on the sf0.1 driver suite), above it the join falls to
    # AQE's shuffle strategy and the projections flow executor-to-executor.
    from pprl_spark.operators.candidates import _heap_bytes

    spark = pairs.sparkSession
    n_docs1 = emb1.count()
    est_bytes = n_docs1 * (8 * scm.shape[0] + 64)
    fits = est_bytes < 0.10 * _heap_bytes(spark, "spark.driver.memory")
    p1 = scm_projections(emb1, scm).select(
        F.col("doc_id").alias(id1), F.col("scm_proj").alias("_p1"), F.col("scm_norm").alias("_n1")
    )
    n2 = scm_projections(emb2, scm).select(
        F.col("doc_id").alias(id2), F.col("scm_norm").alias("_n2")
    )
    if fits:
        p1, n2 = F.broadcast(p1), F.broadcast(n2)
    ix2 = emb2.select(F.col("doc_id").alias(id2), F.col("bf_indices").alias("_ix2"))
    out = (
        pairs.join(ix2, id2)
        .join(p1, id1)
        .join(n2, id2)
        .withColumn(out_col, soft_cosine_score_col(F.col("_p1"), F.col("_ix2"), F.col("_n1"), F.col("_n2")))
    )
    return out.drop("_p1", "_n1", "_n2", "_ix2")


def soft_cosine_pairs(pairs: DataFrame, scm: np.ndarray) -> DataFrame:
    """Score candidate pairs with a trained SCM (dense-matrix-free).

    Input needs bf_indices_1/bf_indices_2; emits ``sim`` = soft cosine
    (embedder.py:519 restricted to the candidate pairs). Routed through
    the projection formulation (:func:`soft_cosine_pairs_map`): Python
    cost is one B-vector per DISTINCT document in the batch, never a
    per-pair |ix|² gather — the old ``Series.apply`` per-pair UDFs are
    deliberately gone so no caller can score 10^12 pairs row-at-a-time.
    """
    return soft_cosine_pairs_map(pairs, scm, out_col="sim")
