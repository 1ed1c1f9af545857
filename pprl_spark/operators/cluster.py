"""Transitive closure: connected components over the accepted-pair graph.

Absent from the reference (its Hungarian output is one-to-one,
`/root/reference/src/pprl/embedder/embedder.py:280-284`); required by the
north rule to emit entity clusters. Implemented as iterative min-label
propagation over hash joins:

    label(u) <- min(label(u), min_{v in N(u)} label(v))

Entity-resolution match graphs have tiny components (pairs, stars, short
chains), so the loop converges in O(component diameter) ≈ 2-4 iterations;
each iteration is one shuffle join + one partial-aggregated groupBy-min.
``localCheckpoint`` truncates lineage every iteration so the plan does not
grow (SURVEY.md §2.4); on a cluster the pipeline checkpoints the label
table to a stage table instead (plans.pipeline). For graphs with long
chains the same loop still converges — iterations grow with diameter, not
size.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)


def connected_components(
    edges: DataFrame,
    src: str = "id1",
    dst: str = "id2",
    max_iterations: int = 50,
    checkpoint_each: bool = True,
) -> DataFrame:
    """Return ``(doc_id, entity_id)`` with entity_id = min doc_id of the
    component (lexicographic min for string ids — deterministic).
    """
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).unionAll(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    )
    sym = sym.distinct()
    if checkpoint_each:
        sym = sym.localCheckpoint()

    labels = (
        sym.select(F.col("u").alias("doc_id"))
        .distinct()
        .withColumn("entity_id", F.col("doc_id"))
    )

    changed = 1
    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels.withColumnRenamed("doc_id", "v"), "v")
            .groupBy(F.col("u").alias("doc_id"))
            .agg(F.min("entity_id").alias("_nmin"))
        )
        updated = labels.join(neighbor_min, "doc_id", "left").withColumn(
            "_new",
            F.coalesce(
                F.least(F.col("entity_id"), F.col("_nmin")), F.col("entity_id")
            ),
        )
        # path halving (pointer jumping): label(u) <- label(label(u)).
        # entity_id is always a doc_id of the same component, so chasing
        # one hop through the label table is legal and turns O(diameter)
        # propagation into O(log diameter) — a 12-hop chain converges in
        # 4 rounds instead of 12. The jump join is label-table-sized
        # (one row per doc), far cheaper than the edge join above.
        jump = updated.select(
            F.col("doc_id").alias("_e"), F.col("_new").alias("_j")
        )
        updated = (
            updated.join(jump, updated["_new"] == jump["_e"], "left")
            .withColumn("_final", F.coalesce(F.col("_j"), F.col("_new")))
            .select("doc_id", "entity_id", "_final")
        )
        if checkpoint_each:
            # LAZY checkpoint + full-scan convergence count = ONE job per
            # iteration: the count action computes every partition, which
            # materializes the checkpoint storage in the same pass, and
            # the truncated lineage keeps the next iteration's plan flat.
            # (The previous shape — eager checkpoint, then a second
            # limit(1) probe job — paid two scheduled jobs per iteration;
            # the probe must be a FULL count here, since a limit(1)
            # short-circuit could leave the lazy checkpoint partially
            # materialized.)
            updated = updated.localCheckpoint(eager=False)
        changed = updated.where(F.col("_final") != F.col("entity_id")).count()
        labels = updated.select("doc_id", F.col("_final").alias("entity_id"))
        if changed == 0:
            break
    if changed != 0:
        # a component whose diameter exceeds the budget would otherwise get
        # silently split into several entity_ids
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "iterations (component diameter exceeds budget); raise "
            "max_iterations"
        )
    return labels


def clusters_from_matches(matches: DataFrame) -> DataFrame:
    """Accepted pairs -> (doc_id, entity_id) cluster assignment."""
    return connected_components(matches.select("id1", "id2"))
