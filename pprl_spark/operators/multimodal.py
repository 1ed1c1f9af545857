"""Multimodal columns: opaque binary payloads + typed metadata.

Media spans in the document model carry references (``media_ref``); this
module supplies the pipeline plumbing for the payloads themselves —
image/audio/video as ``binary`` columns with a typed metadata struct,
processed in Arrow batches via ``mapInPandas``.

The decode kernels are STUBS by design: no image/audio libraries exist in
this container, so ``decode_image``/``extract_audio_features`` either
raise ``NotImplementedError`` (strict mode) or produce a deterministic
fake derived from the payload bytes (test mode). Everything Spark-side —
schema, batch iteration, partitioning, UDF signatures — is real and
tested; swapping in PIL/torchvision later changes only the kernel body.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_ref string, media_type string, feature array<float>, n_bytes long, sha1 string"
)


def _fake_feature(payload: bytes, dim: int = 16) -> list[float]:
    """Deterministic stand-in for a learned embedding: bytes -> R^dim.

    Derived from the sha1 of the payload so tests are stable; replaces a
    real encoder (CLIP/ResNet/wav2vec) behind the same signature.
    """
    digest = hashlib.sha1(payload or b"").digest()
    return [b / 255.0 - 0.5 for b in digest[:dim]]


def decode_image(payload: bytes, strict: bool = True):
    """Decode an image payload. STUB: container ships no imaging libs."""
    if strict:
        raise NotImplementedError(
            "image decoding requires an imaging library (e.g. PIL) not "
            "present in this environment; use strict=False for the "
            "deterministic fake used by tests"
        )
    return _fake_feature(payload)


def media_features(
    media: DataFrame, dim: int = 16, batch_hint: int | None = None
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Real Spark plumbing: Arrow-batched iterator, bounded memory per batch
    (binary columns are not splittable — partition counts control batch
    size), stable output schema. The kernel is the deterministic fake.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_type": pdf["media_type"],
                    "feature": [_fake_feature(p, dim) for p in payloads],
                    "n_bytes": [len(p) if p is not None else 0 for p in payloads],
                    "sha1": [
                        hashlib.sha1(p or b"").hexdigest() for p in payloads
                    ],
                }
            )

    return media.mapInPandas(extract, FEATURE_SCHEMA)


META_SCHEMA = (
    "media_ref string, media_type string, n_bytes long, payload_sha256 string, "
    "width int, height int, duration_ms int, codec string"
)


def media_metadata(media: DataFrame) -> DataFrame:
    """Typed metadata extraction over binary payloads (mapInPandas).

    The payload-derived fields (byte count, content digest) are computed
    from the bytes — the real plumbing a decode stage needs; the
    decode-derived fields (width/height/duration/codec) pass through from
    the ``meta`` struct, standing in for the stubbed decoder's output.
    sha256 (not sha1) so the digest is reproducible by SQL engines — the
    driver's ``multimodal_meta`` query oracle-checks this whole path.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            meta = pdf["meta"]
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(p) if p is not None else 0 for p in payloads],
                    "payload_sha256": [
                        hashlib.sha256(p or b"").hexdigest() for p in payloads
                    ],
                    "width": [m["width"] for m in meta],
                    "height": [m["height"] for m in meta],
                    "duration_ms": [m["duration_ms"] for m in meta],
                    "codec": [m["codec"] for m in meta],
                }
            )

    return media.mapInPandas(extract, META_SCHEMA)


def synthesize_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table exercising the binary plumbing."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for idx in pdf["id"]:
                idx = int(idx)
                payload = hashlib.sha256(f"{seed}-{idx}".encode()).digest() * (1 + idx % 4)
                rows.append(
                    (
                        f"img://{hashlib.sha1(str(idx).encode()).hexdigest()[:16]}",
                        payload,
                        ["image", "audio", "video"][idx % 3],
                        {
                            "width": 64 + idx % 512,
                            "height": 64 + (idx * 7) % 512,
                            "duration_ms": (idx * 33) % 10_000,
                            "codec": ["jpeg", "opus", "h264"][idx % 3],
                        },
                    )
                )
            yield pd.DataFrame(rows, columns=["media_ref", "payload", "media_type", "meta"])

    return spark.range(0, n).mapInPandas(gen, MEDIA_SCHEMA)
