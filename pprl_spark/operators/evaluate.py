"""Pairwise clustering-evaluation metrics without pair enumeration.

The standard entity-resolution quality report (pairwise precision /
recall / F1 against a ground-truth partition — the metric the reference
computes per-run in its evaluation notebooks, cf. reference
``scripts/results.py`` truth-join accounting) is usually written as a
join over *pairs*, which is quadratic in cluster size and dead at
10^12 docs.  This operator computes the identical numbers from three
COUNTED aggregates over the (predicted, truth) contingency table:

    tp_pairs    = sum_ij C(n_ij, 2)      n_ij = |pred i  ∩  truth j|
    pred_pairs  = sum_i  C(n_i., 2)
    truth_pairs = sum_j  C(n_.j, 2)

so no pair is ever materialized: one exchange keyed on
(pred, truth) builds the contingency table, and the two marginal
aggregates reduce *it*, never the corpus.  The contingency table is
bounded by the number of distinct (pred, truth) cluster overlaps — for
sane clusterings O(#clusters), microscopic relative to the input.

Exactness contract: C(n,2) and the three sums stay in BIGINT; each of
precision = tp/pred, recall = tp/truth and F1 = 2·tp/(pred+truth) is
ONE correctly-rounded int→double division, so the doubles are
bit-identical across engines (same trick as the TF-IDF operator's
log-free IDF).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c2(n: Column) -> Column:
    # C(n,2) in exact BIGINT arithmetic: n*(n-1) is always even and
    # non-negative, so a right-shift is the exact halving — no double
    # intermediate (n ~ 10^9 would overflow 2^53 as n*(n-1)).
    return F.shiftright((n * (n - F.lit(1))).cast("long"), 1)


def pairwise_cluster_eval(
    assign: DataFrame,
    pred_col: str = "entity_id",
    truth_col: str = "truth_id",
    materialize: bool = True,
) -> DataFrame:
    """One-row pairwise P/R/F1 report for a predicted vs truth partition.

    ``assign`` carries one row per item with its predicted cluster label
    and its ground-truth label (any orderable types).  Items missing
    from either partition should be pre-assigned singleton labels by
    the caller (e.g. ``coalesce(entity_id, doc_id)``) so both sides
    partition the same universe.

    ``materialize=True`` (default) persists the contingency table so
    the two marginal aggregates don't re-scan the corpus-sized input;
    pass False when the caller already materialized ``assign`` (the
    escape hatch the dedup operators expose for cluster callers).

    Output columns: n_items, n_pred_clusters, n_truth_clusters,
    tp_pairs, pred_pairs, truth_pairs, precision, recall, f1.
    """
    joint = assign.groupBy(
        F.col(pred_col).alias("_p"), F.col(truth_col).alias("_t")
    ).agg(F.count("*").cast("long").alias("_n"))
    if materialize:
        joint = joint.persist()

    tp = joint.agg(
        F.sum("_n").cast("long").alias("n_items"),
        F.sum(_c2(F.col("_n"))).cast("long").alias("tp_pairs"),
    )
    pred = (
        joint.groupBy("_p")
        .agg(F.sum("_n").cast("long").alias("_np"))
        .agg(
            F.count("*").cast("long").alias("n_pred_clusters"),
            F.sum(_c2(F.col("_np"))).cast("long").alias("pred_pairs"),
        )
    )
    truth = (
        joint.groupBy("_t")
        .agg(F.sum("_n").cast("long").alias("_nt"))
        .agg(
            F.count("*").cast("long").alias("n_truth_clusters"),
            F.sum(_c2(F.col("_nt"))).cast("long").alias("truth_pairs"),
        )
    )

    def _ratio(num: Column, den: Column) -> Column:
        # single int->double division: correctly rounded, engine-exact
        return F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(
            F.lit(0.0)
        )

    out = tp.crossJoin(pred).crossJoin(truth)
    return out.select(
        "n_items",
        "n_pred_clusters",
        "n_truth_clusters",
        "tp_pairs",
        "pred_pairs",
        "truth_pairs",
        _ratio(F.col("tp_pairs"), F.col("pred_pairs")).alias("precision"),
        _ratio(F.col("tp_pairs"), F.col("truth_pairs")).alias("recall"),
        _ratio(
            F.lit(2) * F.col("tp_pairs"), F.col("pred_pairs") + F.col("truth_pairs")
        ).alias("f1"),
    )
