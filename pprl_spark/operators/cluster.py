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


SMALL_GRAPH_EDGES = 1_000_000


def _cc_driver(edges: DataFrame) -> DataFrame:
    """Counted small-graph fast path: union-find on the driver.

    Entity-resolution match graphs are usually tiny relative to the
    corpus (matches << docs); below ``SMALL_GRAPH_EDGES`` the iterative
    distributed loop's per-job scheduling (~5 jobs x N iterations) costs
    10-100x the actual work. A driver union-find over the collected edge
    list — bounded at ~16MB of id pairs — answers in milliseconds with
    the identical min-label semantics: union-by-min keeps the smallest
    id as every root, so find() IS the entity_id. Same counted-threshold
    pattern as the SCM alignment fast path; the distributed loop above
    the threshold is unchanged and remains the 10^12-edge story.
    """
    import pandas as pd

    spark = edges.sparkSession
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in edges.collect():
        u, v = r[0], r[1]
        if u not in parent:
            parent[u] = u
        if v not in parent:
            parent[v] = v
        ru, rv = find(u), find(v)
        if ru != rv:
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo
    pdf = pd.DataFrame(
        {"doc_id": list(parent), "entity_id": [find(x) for x in parent]}
    )
    dtype = edges.schema[0].dataType.simpleString()
    return spark.createDataFrame(pdf, f"doc_id {dtype}, entity_id {dtype}")


def connected_components(
    edges: DataFrame,
    src: str = "id1",
    dst: str = "id2",
    max_iterations: int = 50,
    checkpoint_each: bool = True,
    small_graph_edges: int = SMALL_GRAPH_EDGES,
) -> DataFrame:
    """Return ``(doc_id, entity_id)`` with entity_id = min doc_id of the
    component (lexicographic min for string ids — deterministic).

    ``small_graph_edges``: below this counted edge total the labels come
    from a driver-side union-find (see :func:`_cc_driver`); ``0``
    disables the fast path. The count action is cheap — match/pair
    tables arrive materialized from the upstream stage.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    if small_graph_edges and e.count() <= small_graph_edges:
        return _cc_driver(e)
    sym = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
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
