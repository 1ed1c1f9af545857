"""Checkpointed, resumable training-data dedup pipeline.

The dedup counterpart of ``plans.pipeline.run_linkage``, over the same
stage-table machinery (manifests, config-checksum resume, per-partition
metric rows): near-dup pairs -> entity clusters -> canonical survivors ->
(optional) deterministic stratified sample. This is the end-to-end shape
an LLM data pipeline runs over a raw crawl: every stage is a committed
table, so a killed 100 TB run resumes after its last finished stage and
the kept-document table is reproducible bit-for-bit (content-addressed
sampling, deterministic canonical selection).
"""

from __future__ import annotations

import hashlib
import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pprl_spark.config import EmbedderConfig
from pprl_spark.operators.cluster import clusters_from_matches
from pprl_spark.operators.dedup import canonical_documents, minhash_near_duplicates
from pprl_spark.operators.sampling import stratified_sample
from pprl_spark.plans.pipeline import ParquetStageIO, Pipeline, _input_fingerprint


def run_dedup(
    spark: SparkSession,
    docs: DataFrame,
    base_dir: str,
    run_id: str = "run-0",
    k: int = 2,
    threshold: float = 0.4,
    bands: int = 4,
    rows_per_band: int = 2,
    sample_fractions: dict[str, float] | None = None,
    sample_default: float = 1.0,
    sample_salt: int = 0,
    strata_col: str = "lang",
    config: EmbedderConfig | None = None,
) -> Pipeline:
    """dedup_pairs -> dedup_clusters -> canonical -> kept_docs, staged.

    ``docs`` must carry (doc_id, text) plus ``strata_col`` when sampling
    is requested. ``sample_fractions=None`` keeps every canonical doc
    (the sample stage still runs so the kept table exists and downstream
    consumers have ONE table to read regardless of configuration).

    Stage shapes (all scale-audited in the underlying operators):
    pairs is the slim (id, band-key) MinHash join; clusters is the
    counted union-find / two-phase contraction CC; canonical is one scan
    + one window; kept is a broadcast-friendly semi-join + a shuffle-free
    hash-sample filter.
    """
    cfg = config or EmbedderConfig()
    io = ParquetStageIO(base_dir)
    # sampling parameters are kept OUT of the run-level hash and folded
    # only into the kept_docs stage (Pipeline.stage salt), so re-running
    # with different rates reuses the committed pair/cluster/canonical
    # tables and re-executes only the cheap final filter
    params = (
        f"k={k};thr={threshold};b={bands}x{rows_per_band};"
        f"in={_input_fingerprint(docs)}"
    )
    sample_tag = hashlib.md5(
        (
            f"{json.dumps(sample_fractions, sort_keys=True)}:"
            f"{sample_default}:{sample_salt}:{strata_col}"
        ).encode()
    ).hexdigest()[:12]
    pipe = Pipeline(
        spark, cfg, io, run_id,
        run_params_hash=hashlib.md5(params.encode()).hexdigest()[:16],
    )

    pairs = pipe.stage(
        "dedup_pairs",
        lambda: minhash_near_duplicates(
            docs, k=k, threshold=threshold, bands=bands, rows_per_band=rows_per_band
        ),
    )
    clusters = pipe.stage(
        "dedup_clusters",
        lambda: clusters_from_matches(pairs),
        deps=["dedup_pairs"],
    )
    canonical = pipe.stage(
        "canonical",
        lambda: canonical_documents(docs, clusters),
        deps=["dedup_clusters"],
    )

    def build_kept() -> DataFrame:
        kept = docs.join(
            canonical.select(F.col("canonical_id").alias("doc_id")),
            "doc_id",
            "left_semi",
        )
        if sample_fractions is not None:
            kept = stratified_sample(
                kept,
                strata_col,
                sample_fractions,
                default_fraction=sample_default,
                salt=sample_salt,
            )
        return kept

    pipe.stage("kept_docs", build_kept, deps=["canonical"], salt=sample_tag)
    return pipe
