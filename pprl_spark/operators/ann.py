"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, and a random-hyperplane
LSH-bucketed variant as the scale path. Dot products run JVM-side via
``zip_with`` + ``aggregate`` (codegen'd); no Python in either path.

Scale notes: brute force is a broadcast nested-loop (queries broadcast,
corpus scanned once — right whenever |queries| ≪ |corpus|, the common
retrieval shape). The LSH variant buckets both sides by sign-bit keys so
each query only scores its bucket; multi-probe (hamming-1 neighbors of
the query key) trades recall for bucket fan-out.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MOD = 2_147_483_647


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k: (query_id, vec_id, cos, rank)."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cvec"))
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id", "vec_id", cosine(F.col("qvec"), F.col("cvec")).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _hyperplane(dim: int, j: int) -> list[float]:
    """Deterministic pseudo-random hyperplane (SQL-reproducible closed form)."""
    return [
        (((j + 1) * 2_654_435_761 + i * 40_503) % MOD) / MOD - 0.5 for i in range(dim)
    ]


def lsh_bucket_key(vec: Column, dim: int, n_planes: int = 8) -> Column:
    """Sign-bit bucket key from n_planes random hyperplanes."""
    bits = []
    for j in range(n_planes):
        plane = F.array(*[F.lit(v) for v in _hyperplane(dim, j)])
        bits.append(F.when(dot(vec, plane) >= 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(2**j))
    key = bits[0]
    for b in bits[1:]:
        key = key + b
    return key


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    multiprobe: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """LSH-bucketed approximate top-k.

    Buckets corpus once; queries probe their own bucket plus (optionally)
    all hamming-1 neighbor buckets. Bucket join replaces the cross join —
    at 10^12 vectors each query touches ~(1+n_planes)/2^n_planes of the
    corpus instead of all of it.
    """
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("cvec"),
        lsh_bucket_key(F.col(vec_col), dim, n_planes).alias("bucket"),
    )
    qkey = lsh_bucket_key(F.col(vec_col), dim, n_planes)
    probes = [qkey] + (
        [qkey.bitwiseXOR(F.lit(1 << j)) for j in range(n_planes)] if multiprobe else []
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.explode(F.array(*probes)).alias("bucket"),
    )
    scored = c.join(F.broadcast(q), "bucket").select(
        "query_id", "vec_id", cosine(F.col("qvec"), F.col("cvec")).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.dropDuplicates(["query_id", "vec_id"])
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
