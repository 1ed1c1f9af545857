"""Spark-facing feature extraction: one vectorized embed UDF + native columns.

Design: the reference runs one pandas ``Series.apply`` per configured
column, then a per-row union, then a per-row hashing loop
(`/root/reference/src/pprl/embedder/embedder.py:435-462`). Naively mapping
that onto Spark would mean one Python round-trip per column. Instead we
make **one** Arrow round-trip per batch: the caller packs all configured
field columns into a single struct, and :func:`make_embed_udf` returns a
pandas UDF that, per batch, runs the token kernels per field, unions per
row (`embedder.py:449-454` semantics), and Bloom-hashes with a per-batch
memo (`bloom_filters.py:69-79` semantics). Everything else in the
pipeline (field extraction from spans, norms, blocking keys, scoring)
stays JVM-side in built-in functions.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pprl_spark.config import EmbedderConfig
from pprl_spark.functions import tokens
from pprl_spark.functions.hashing import bloom_indices_with_collisions

EMBED_RESULT_TYPE = T.StructType(
    [
        T.StructField("features", T.ArrayType(T.StringType())),
        T.StructField("bf_indices", T.ArrayType(T.IntegerType())),
        T.StructField("collision_fraction", T.DoubleType()),
    ]
)


def make_embed_udf(config: EmbedderConfig):
    """Build the embed pandas UDF for a config.

    Input: a struct column whose fields are the colspec field values
    (string). Output: struct(features, bf_indices, collision_fraction).

    The UDF closure captures only the (small, JSON-serializable) config —
    cheap to pickle per task; no driver-side globals.
    """
    colspec = dict(config.colspec)
    ff_args = {k: dict(v) for k, v in config.ff_args.items()}
    bf_size, num_hashes, offset, salt = (
        config.bf_size,
        config.num_hashes,
        config.offset,
        config.salt,
    )

    @F.pandas_udf(EMBED_RESULT_TYPE)
    def embed(fields: pd.DataFrame) -> pd.DataFrame:
        kernels = tokens.FEATURE_KERNELS
        # resolve per-field kernel + kwargs once per batch
        plan = []
        for field, ftype in colspec.items():
            if field not in fields.columns:
                continue
            kw = dict(ff_args.get(ftype, {}))
            if ftype in ("misc", "shingled"):
                kw.setdefault("label", field)
            plan.append((field, kernels[ftype], kw))

        memo: dict = {}  # feature -> hash indices, shared across the batch
        n = len(fields)
        out_features: list[list[str]] = [None] * n  # type: ignore[list-item]
        out_indices: list[list[int]] = [None] * n  # type: ignore[list-item]
        out_collisions: list[float] = [0.0] * n

        cols = {field: fields[field].to_numpy() for field, _, _ in plan}
        for i in range(n):
            per_col = []
            for field, kernel, kw in plan:
                v = cols[field][i]
                if v is not None and not isinstance(v, str):
                    v = None if v != v else v  # NaN -> None
                per_col.append(kernel(v, **kw))
            feats = tokens.union_features(per_col)
            idx, coll = bloom_indices_with_collisions(
                feats, bf_size, num_hashes, offset, salt, _memo=memo
            )
            out_features[i] = sorted(feats)
            out_indices[i] = idx
            out_collisions[i] = coll

        return pd.DataFrame(
            {
                "features": out_features,
                "bf_indices": out_indices,
                "collision_fraction": out_collisions,
            }
        )

    return embed


def make_bloom_udf(
    bf_size: int = 1024, num_hashes: int = 2, offset: int = 0, salt: str = ""
):
    """Pandas UDF: array<string> features -> struct(bf_indices, collision).

    The standalone hashing half of the embed UDF, for queries that build
    feature arrays natively (e.g. bigram_col) and only need the
    parity-exact SHA-256 Bloom mapping (`bloom_filters.py:44-81`).
    """
    out_type = T.StructType(
        [
            T.StructField("bf_indices", T.ArrayType(T.IntegerType())),
            T.StructField("collision_fraction", T.DoubleType()),
        ]
    )

    @F.pandas_udf(out_type)
    def bloom(features: pd.Series) -> pd.DataFrame:
        memo: dict = {}
        idx_out, coll_out = [], []
        for feats in features:
            idx, coll = bloom_indices_with_collisions(
                feats if feats is not None else [],
                bf_size,
                num_hashes,
                offset,
                salt,
                _memo=memo,
            )
            idx_out.append(idx)
            coll_out.append(coll)
        return pd.DataFrame({"bf_indices": idx_out, "collision_fraction": coll_out})

    return bloom


# ---------------------------------------------------------------------------
# Native (JVM-side, codegen'd) single-field feature columns. These mirror the
# token kernels for the simple labelled types and exist so purely relational
# queries (and the DuckDB oracle) can exercise the same semantics without a
# Python round-trip: SURVEY.md §2.3 F7-F9 note these are natively expressible.
# ---------------------------------------------------------------------------


def sex_feature_col(col: Column | str) -> Column:
    """`sex<x>` from the casefolded first character — features.py:215-247."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        c.isNull() | (c == F.lit("")), F.array(F.lit(""))
    ).otherwise(F.array(F.concat(F.lit("sex<"), F.lower(F.substring(c, 1, 1)), F.lit(">"))))


def misc_feature_col(col: Column | str, label: str = "misc") -> Column:
    """`label<value>`; missing -> empty array — features.py:293-330."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNull() | (c == F.lit("")), F.array().cast("array<string>")).otherwise(
        F.array(F.concat(F.lit(f"{label}<"), F.lower(c.cast("string")), F.lit(">")))
    )


def dob_feature_col(col: Column | str, fmt: str = "yyyyMMdd") -> Column:
    """`[day<dd>, month<mm>, year<YYYY>]` from a fixed-format date string.

    Native path for well-formed dates (features.py:250-290); the embed UDF
    handles lenient parsing parity.
    """
    c = F.col(col) if isinstance(col, str) else col
    d = F.to_date(c, fmt)
    return F.when(d.isNull(), F.array().cast("array<string>")).otherwise(
        F.array(
            F.concat(F.lit("day<"), F.date_format(d, "dd"), F.lit(">")),
            F.concat(F.lit("month<"), F.date_format(d, "MM"), F.lit(">")),
            F.concat(F.lit("year<"), F.date_format(d, "yyyy"), F.lit(">")),
        )
    )


def bigram_col(col: Column | str) -> Column:
    """Native character-bigram extraction of underscore-wrapped tokens.

    JVM-side equivalent of gen_ngram(n=2) over split_string_underscore
    (features.py:10-65): split on the reference's separator class, wrap
    each token in underscores, then slide a 2-char window. Used by the
    relational dedup/tokenize queries; the embed UDF remains the parity
    path for multi-n and skip-grams.
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = F.filter(F.split(F.lower(c), r"[\s+\-_,.]+"), lambda w: w != F.lit(""))
    wrapped = F.transform(toks, lambda w: F.concat(F.lit("_"), w, F.lit("_")))
    return F.flatten(
        F.transform(
            wrapped,
            lambda tok: F.transform(
                F.sequence(F.lit(1), F.length(tok) - F.lit(1)),
                lambda i: tok.substr(i, F.lit(2)),
            ),
        )
    )
