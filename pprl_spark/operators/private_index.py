"""Private matching index — distributed re-expression of J4.

Reference: ``add_private_index``
(`/root/reference/src/pprl/matching/perform.py:12-81`): matched pairs
receive one shared index, unmatched rows disjoint indices, all sampled
without replacement from ``[size_assumed, 3*size_assumed)`` so an index
value leaks nothing about match status. The reference materializes a
global RNG permutation (`perform.py:57-59`) — fine at 10k rows, impossible
at 10^12.

Here the permutation is *implicit*: the pool ``range(size, 3*size)`` is
ordered by a keyed hash (a pseudorandom shuffle), row-numbered, and joined
to assignment slots — two shuffles, no driver materialization. With
``seed=None`` the key comes from ``secrets`` (non-reproducible, like the
reference); tests pass a seed.

Like the reference (`perform.py:51-53`), only unique 1:1 matches are
accepted — many-to-one would leak successful matches.
"""

from __future__ import annotations

import secrets

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def add_private_index(
    spark: SparkSession,
    df1: DataFrame,
    df2: DataFrame,
    matches: DataFrame,
    size_assumed: int = 10_000,
    colname: str = "private_index",
    id_col: str = "doc_id",
    seed: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    assert colname not in df1.columns and colname not in df2.columns, (
        "The chosen colname for the private index is already in use."
    )
    if seed is None:
        seed = secrets.randbits(63)

    m = matches.select("id1", "id2")
    # reference rejects repeated indices (perform.py:51-53)
    dup1 = m.groupBy("id1").count().where("count > 1").limit(1).count()
    dup2 = m.groupBy("id2").count().where("count > 1").limit(1).count()
    assert dup1 == 0 and dup2 == 0, (
        "add_private_index can't handle repeated match indices (many-to-one matches)"
    )

    # assignment slots: matched pairs first, then left-only, then right-only
    w = Window.orderBy("id1")
    pairs = m.withColumn("slot", F.row_number().over(w) - 1)
    n_pairs = pairs.count()

    left_only = (
        df1.select(F.col(id_col).alias("id1"))
        .join(pairs.select("id1"), "id1", "left_anti")
        .withColumn("slot", F.row_number().over(Window.orderBy("id1")) - 1 + F.lit(n_pairs))
    )
    n_left = left_only.count()
    right_only = (
        df2.select(F.col(id_col).alias("id2"))
        .join(pairs.select("id2"), "id2", "left_anti")
        .withColumn(
            "slot",
            F.row_number().over(Window.orderBy("id2")) - 1 + F.lit(n_pairs + n_left),
        )
    )

    # pseudorandom shuffle of the fixed pool via keyed-hash ordering
    pool = (
        spark.range(size_assumed, 3 * size_assumed)
        .withColumn("_ord", F.xxhash64(F.col("id"), F.lit(seed)))
        .withColumn("slot", F.row_number().over(Window.orderBy("_ord", "id")) - 1)
        .select("slot", F.col("id").alias(colname))
    )

    idx1 = pairs.select("id1", "slot").unionByName(left_only).join(pool, "slot").drop("slot")
    idx2 = pairs.select("id2", "slot").unionByName(right_only).join(pool, "slot").drop("slot")

    out1 = df1.join(idx1.withColumnRenamed("id1", id_col), id_col)
    out2 = df2.join(idx2.withColumnRenamed("id2", id_col), id_col)
    return out1, out2
