"""Normalize + embed stages: spans -> field columns -> Bloom indices.

Stage 1 (normalize) is pure built-in Spark: sort spans by offset, parse
``field=value`` text payloads into a map, collect media refs — no Python.
The source rows pass through untouched, preserving the per-row invariant
span-sequence equality (kind, text, media_ref, order) required by
BASELINE.json's input_hint.

Stage 2 (embed) is the single Arrow round-trip described in
``functions.features``: per-field token kernels + per-row union
(`/root/reference/src/pprl/embedder/embedder.py:449-454`) + salted SHA-256
Bloom hashing (`bloom_filters.py:69-79`). Norms use the identity-SCM fast
path ``sqrt(|bf_indices|)`` natively (`embedder.py:137-139`; the trained
SCM path lives in ``operators.scm``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pprl_spark.config import EmbedderConfig
from pprl_spark.functions.features import make_embed_udf

SPAN_ORDERED = "array_sort(transform(spans, s -> struct(s.offset as offset, s.kind as kind, s.text as text, s.media_ref as media_ref)))"


def normalize_documents(df: DataFrame, config: EmbedderConfig) -> DataFrame:
    """Extract colspec field columns from the spans array, JVM-side only.

    Emits the original columns plus one string column per colspec field.
    Text spans carry ``field=value`` payloads (FIXTURES.md §1); media
    spans contribute a whitespace-joined ``media_ref`` list in offset
    order.
    """
    ordered = F.expr(SPAN_ORDERED)
    entries = F.transform(
        F.filter(ordered, lambda s: (s["kind"] == "text") & s["text"].isNotNull()),
        lambda s: F.struct(
            F.substring_index(s["text"], "=", 1).alias("key"),
            F.substr(
                s["text"], F.instr(s["text"], "=") + F.lit(1), F.length(s["text"])
            ).alias("value"),
        ),
    )
    out = df.withColumn("_fields", F.map_from_entries(entries))
    media = F.array_join(
        F.transform(
            F.filter(ordered, lambda s: (s["kind"] == "media") & s["media_ref"].isNotNull()),
            lambda s: s["media_ref"],
        ),
        " ",
    )
    for field, ftype in config.colspec.items():
        if ftype == "media":
            out = out.withColumn(field, F.nullif(media, F.lit("")))
        else:
            out = out.withColumn(field, F.col("_fields").getItem(field))
    return out.drop("_fields")


def embed_documents(
    df: DataFrame,
    config: EmbedderConfig,
    keep: list[str] | None = None,
    normalized: bool = False,
) -> DataFrame:
    """Embed a documents DataFrame into Bloom space.

    Returns ``keep + colspec fields + features + bf_indices + bf_norm +
    collision_fraction``. ``anonymise``-style projection
    (`embedder.py:160-181`) is a plain ``select`` on the result.
    """
    if not normalized:
        df = normalize_documents(df, config)
    fields = [f for f in config.colspec if f in df.columns]
    embed_udf = make_embed_udf(config)
    emb = df.withColumn("_emb", embed_udf(F.struct(*[F.col(f) for f in fields])))
    emb = (
        emb.withColumn("features", F.col("_emb.features"))
        .withColumn("bf_indices", F.col("_emb.bf_indices"))
        .withColumn("collision_fraction", F.col("_emb.collision_fraction"))
        .drop("_emb")
    )
    # identity-SCM norm fast path (embedder.py:137-139); guard empty rows
    emb = emb.withColumn(
        "bf_norm",
        F.when(F.size("bf_indices") > 0, F.sqrt(F.size("bf_indices"))).otherwise(F.lit(0.0)),
    )
    if keep is not None:
        cols = list(dict.fromkeys(keep + ["features", "bf_indices", "bf_norm", "collision_fraction"]))
        emb = emb.select(*[c for c in cols if c in emb.columns])
    return emb


def anonymise(df: DataFrame, keep: list[str] | None = None) -> DataFrame:
    """Keep only safe columns — analog of EDF.anonymise (embedder.py:160-181)."""
    keep = keep or []
    wanted = keep + ["bf_indices", "bf_norm", "bf_norms", "thresholds"]
    cols = [c for c in df.columns if c in wanted]
    return df.select(*list(dict.fromkeys(cols)))
