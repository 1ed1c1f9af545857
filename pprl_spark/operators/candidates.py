"""Candidate-pair generation: salted blocked equi-join + sparse scoring.

Replaces the reference's dense cross-join similarity matrix
(`/root/reference/src/pprl/embedder/embedder.py:468-528`, SURVEY.md §2.4
J1) with a block-key equi-join producing a long-form
``(id1, id2, sim)`` pair table. Scoring stays JVM-side:
identity-SCM soft-cosine ≡ cosine = |A∩B| / (√|A|·√|B|) via
``size(array_intersect(...))`` on the sorted sparse index arrays
(`embedder.py:519` reduces to exactly this when scm = I; see
`docs/tutorials/example-verknupfung.qmd:168-169`).

Scale mechanics:
- dedupe (doc, key) explosion BEFORE the join;
- per-block salting: side-1 rows get ``salt = pmod(hash(id), S)``, side-2
  rows replicate over all S salts, so a celebrity block's pairs spread
  over S shuffle partitions; S is chosen per block from block sizes
  (small blocks keep S=1 and do not replicate);
- AQE skew-join catches residual imbalance;
- per-pair dedupe (a pair may share several keys) via min(block_key)
  groupBy, which also carries provenance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pprl_spark.config import EmbedderConfig


def _similarity_expr(sim: str):
    i = F.col("_isect").cast("double")
    s1 = F.size("bf_indices_1").cast("double")
    s2 = F.size("bf_indices_2").cast("double")
    if sim == "cosine":
        return i / (F.sqrt(s1) * F.sqrt(s2))
    if sim == "dice":
        return F.lit(2.0) * i / (s1 + s2)
    if sim == "jaccard":
        return i / (s1 + s2 - i)
    raise ValueError(f"unknown similarity {sim!r}")


def cap_blocks(
    blocks: DataFrame,
    config: EmbedderConfig,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministically thin oversized blocks to ~max_block_size docs.

    Celebrity keys (a shared surname+postcode at web scale) produce
    blocks whose pair count grows quadratically — one 10^6-doc block is
    10^12 pairs on its own. Each doc in a block of size n survives with
    probability 1/ceil(n/cap) via a keyed hash — no window/sort needed,
    just a broadcast of the (hot-key -> factor) dim table and a map-side
    filter. Deterministic across runs and partitionings. True matches
    inside thinned blocks are still covered by the (selectivity-bounded)
    MinHash band keys, which are never the oversized ones unless the
    corpus is degenerate; the F1 gate validates the net effect.
    """
    cap = config.max_block_size
    if not cap:
        return blocks
    hot = (
        blocks.groupBy("block_key")
        .agg(F.count("*").alias("_n"))
        .where(F.col("_n") > cap)
        .withColumn("_factor", F.ceil(F.col("_n") / F.lit(cap)).cast("long"))
        .select("block_key", "_factor")
    )
    return (
        blocks.join(F.broadcast(hot), "block_key", "left")
        .where(
            F.col("_factor").isNull()
            | (F.pmod(F.xxhash64("block_key", id_col), F.col("_factor")) == 0)
        )
        .drop("_factor")
    )


def generate_candidates(
    blocks1: DataFrame,
    blocks2: DataFrame | None,
    config: EmbedderConfig,
    id_col: str = "doc_id",
    score: bool = True,
    cap: bool = True,
    min_sim: float | None = None,
) -> DataFrame:
    """Join exploded block tables into scored candidate pairs.

    ``blocks2=None`` means self-linkage (dedup): pairs within one table
    with ``id1 < id2``. Output: (id1, id2, block_key, sim?) with one row
    per distinct pair.

    ``min_sim`` prunes scored pairs BEFORE the pair-dedupe exchange: the
    filter runs map-side on the join output, so sub-cutoff pairs (the
    vast majority under LSH banding) never hit the shuffle. Pass the
    pipeline's abs_cutoff here when downstream masking would drop them
    anyway (P4, `embedder.py:276`).
    """
    if cap:
        blocks1 = cap_blocks(blocks1, config, id_col)
        if blocks2 is not None:
            blocks2 = cap_blocks(blocks2, config, id_col)
    left = blocks1.select(
        F.col(id_col).alias("id1"),
        F.col("bf_indices").alias("bf_indices_1"),
        "block_key",
    )
    right_src = blocks2 if blocks2 is not None else blocks1
    right = right_src.select(
        F.col(id_col).alias("id2"),
        F.col("bf_indices").alias("bf_indices_2"),
        "block_key",
    )

    # ---- skew salting -------------------------------------------------
    # Block sizes on the (usually larger) left side decide the per-block
    # fan-out S. Small dim table (block_key -> S) is broadcast to both
    # sides: left takes one salted key, right replicates S times. This is
    # the classic salt-and-replicate pattern; S=1 for all but hot keys so
    # replication cost is bounded.
    S = config.salt_buckets
    if S > 1:
        sizes = (
            left.groupBy("block_key")
            .agg(F.count("*").alias("_n"))
            .where(F.col("_n") > config.max_block_size)
            .withColumn(
                "_s",
                F.least(
                    F.lit(S), F.ceil(F.col("_n") / F.lit(config.max_block_size)).cast("int")
                ),
            )
            .select("block_key", "_s")
        )
        left = (
            left.join(F.broadcast(sizes), "block_key", "left")
            .withColumn("_s", F.coalesce(F.col("_s"), F.lit(1)))
            .withColumn("_salt", F.pmod(F.xxhash64("id1"), F.col("_s")).cast("int"))
            .drop("_s")
        )
        right = (
            right.join(F.broadcast(sizes), "block_key", "left")
            .withColumn("_s", F.coalesce(F.col("_s"), F.lit(1)))
            .withColumn("_salt", F.explode(F.sequence(F.lit(0), F.col("_s") - 1)))
            .drop("_s")
        )
        join_keys = ["block_key", "_salt"]
    else:
        join_keys = ["block_key"]

    pairs = left.join(right, join_keys)
    if blocks2 is None:
        pairs = pairs.where(F.col("id1") < F.col("id2"))
    if "_salt" in pairs.columns:
        pairs = pairs.drop("_salt")

    if score:
        # Score BEFORE the pair-dedupe shuffle: the intersect runs on the
        # join output where both arrays are already co-located, so the
        # groupBy below shuffles only (id1, id2, key, sim) scalars — at
        # 10^12 docs the pair table dominates, and not carrying two
        # ~100-int arrays through the exchange is a ~10x shuffle saving.
        pairs = (
            pairs.withColumn(
                "_isect", F.size(F.array_intersect("bf_indices_1", "bf_indices_2"))
            )
            .withColumn("sim", _similarity_expr(config.similarity))
            .drop("_isect", "bf_indices_1", "bf_indices_2")
        )
        if min_sim is not None:
            pairs = pairs.where(F.col("sim") >= F.lit(min_sim))
        # a pair sharing k block keys appears k times with equal sim; the
        # dedupe is REQUIRED before mutual-best ranking (duplicate rows of
        # one pair could take rank 1 in the two windows independently and
        # lose the pair), and it shuffles only scalars
        return pairs.groupBy("id1", "id2").agg(
            F.min("block_key").alias("block_key"), F.first("sim").alias("sim")
        )
    return (
        pairs.drop("bf_indices_1", "bf_indices_2")
        .groupBy("id1", "id2")
        .agg(F.min("block_key").alias("block_key"))
    )
