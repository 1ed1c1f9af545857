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

from pyspark.sql import types as T

from pprl_spark.config import EmbedderConfig

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

    Returns ``keep + colspec fields + features + bf_indices + bf_norms +
    collision_fraction``. ``anonymise``-style projection
    (`embedder.py:160-181`) is a plain ``select`` on the result.

    The Python stage is a ``mapInPandas`` operator (not a column pandas
    UDF): one Arrow round-trip per batch, a shared hash memo across the
    batch, and — unlike expression-level UDFs — it cannot be dropped by
    Spark 4.1's Python-UDF extraction on re-executed shared plans.
    Columns not needed downstream are pruned *before* the Python stage so
    only requested passthrough columns cross the Arrow boundary.
    """
    if not normalized:
        df = normalize_documents(df, config)
    fields = [f for f in config.colspec if f in df.columns]
    if keep is not None:
        passthrough = [c for c in dict.fromkeys(keep + fields) if c in df.columns]
        df = df.select(*passthrough)

    colspec = dict(config.colspec)
    ff_args = {k: dict(v) for k, v in config.ff_args.items()}
    bf_size, num_hashes, offset, salt = (
        config.bf_size,
        config.num_hashes,
        config.offset,
        config.salt,
    )
    in_fields = [f.name for f in df.schema.fields]
    n_words = -(-(bf_size + offset) // 64)
    mh_perms = config.minhash_perms
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("features", T.ArrayType(T.StringType())),
            T.StructField("bf_indices", T.ArrayType(T.IntegerType())),
            T.StructField("bf_bitmap", T.ArrayType(T.LongType())),
            T.StructField("mh_sig", T.ArrayType(T.LongType())),
            T.StructField("collision_fraction", T.DoubleType()),
        ]
    )

    def kernel(batches):
        from pprl_spark.functions import tokens as TK
        from pprl_spark.functions.hashing import (
            bloom_indices_with_collisions,
            pack_bitmap,
        )
        from pprl_spark.operators.blocking import minhash_signatures

        kernels = TK.FEATURE_KERNELS
        plan = []
        for field, ftype in colspec.items():
            if field not in in_fields:
                continue
            kw = dict(ff_args.get(ftype, {}))
            if ftype in ("misc", "shingled"):
                kw.setdefault("label", field)
            plan.append((field, kernels[ftype], kw))

        for pdf in batches:
            memo: dict = {}
            n = len(pdf)
            feats_out, idx_out, bm_out, coll_out = [], [], [], []
            cols = {field: pdf[field].to_numpy() for field, _, _ in plan}
            for i in range(n):
                per_col = []
                for field, kern, kw in plan:
                    v = cols[field][i]
                    if v is not None and not isinstance(v, str):
                        v = None if v != v else v  # NaN -> None
                    per_col.append(kern(v, **kw))
                feats = TK.union_features(per_col)
                idx, coll = bloom_indices_with_collisions(
                    feats, bf_size, num_hashes, offset, salt, _memo=memo
                )
                feats_out.append(sorted(feats))
                idx_out.append(idx)
                # join-side bitmap computed ONCE here: the JVM
                # higher-order-function form is interpreted (never
                # codegen'd) and can be re-evaluated per consumer —
                # see functions.hashing.pack_bitmap
                bm_out.append(pack_bitmap(idx, n_words))
                coll_out.append(coll)
            yield pdf.assign(
                features=feats_out,
                bf_indices=idx_out,
                bf_bitmap=bm_out,
                # signature precomputed here (vectorized, bit-identical
                # to the JVM fold) so add_block_keys never pays the
                # interpreted higher-order minhash_col — same pattern as
                # bf_bitmap above
                mh_sig=minhash_signatures(idx_out, mh_perms),
                collision_fraction=coll_out,
            )

    emb = df.mapInPandas(kernel, out_schema)
    # identity-SCM norm fast path (embedder.py:137-139); guard empty rows
    emb = emb.withColumn(
        # "bf_norms" PLURAL: the reference EDF column-naming surface
        # (embedder.py:60-64,83-89) that update_norms()/compare() consume
        "bf_norms",
        F.when(F.size("bf_indices") > 0, F.sqrt(F.size("bf_indices"))).otherwise(F.lit(0.0)),
    )
    if keep is not None:
        cols = list(dict.fromkeys(keep + ["features", "bf_indices", "bf_bitmap", "mh_sig", "bf_norms", "collision_fraction"]))
        emb = emb.select(*[c for c in cols if c in emb.columns])
    return emb


def anonymise(df: DataFrame, keep: list[str] | None = None) -> DataFrame:
    """Keep only safe columns — analog of EDF.anonymise (embedder.py:160-181)."""
    keep = keep or []
    wanted = keep + ["bf_indices", "bf_norms", "thresholds"]
    cols = [c for c in df.columns if c in wanted]
    return df.select(*list(dict.fromkeys(cols)))
