"""spark-submit entrypoint for the linkage pipeline.

Cluster:
    zip -r pprl_spark.zip pprl_spark
    spark-submit --py-files pprl_spark.zip \
        [--conf spark.sql.adaptive.enabled=true ...] \
        scripts/run_pipeline.py \
        --docs-a <path|synthetic:N> --docs-b <path|synthetic:N> \
        --base-dir /ckpt/run1 --run-id run1

Local smoke (this sandbox):
    python scripts/run_pipeline.py --docs-a synthetic:2000 \
        --docs-b synthetic:2000 --base-dir /tmp/pipe --evaluate

Inputs are parquet/Iceberg documents tables in input_hint shape
(doc_id string, spans array<struct<kind,text,media_ref,offset>>), or
``synthetic:N`` for the seeded FEBRL-style generator. The run is
resumable: re-invoking with the same --base-dir and config skips
committed stages (see pprl_spark.plans.pipeline).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--docs-a", required=True)
    p.add_argument("--docs-b", required=True)
    p.add_argument("--base-dir", required=True)
    p.add_argument("--run-id", default="run-0")
    p.add_argument("--abs-cutoff", type=float, default=0.3)
    p.add_argument("--salt", default="")
    p.add_argument("--use-thresholds", action="store_true")
    p.add_argument("--match-rounds", type=int, default=1)
    p.add_argument("--jw-field", default=None,
                   help="kept column to blend Jaro-Winkler pair scores on (e.g. surname)")
    p.add_argument("--jw-weight", type=float, default=0.3)
    p.add_argument("--evaluate", action="store_true", help="report pairwise P/R/F1 vs true_id")
    p.add_argument("--bucket-blocks", type=int, default=None,
                   help="bucket count for block stage tables (default: auto "
                        "= parallelism; 0 disables bucketing)")
    args = p.parse_args()

    # under spark-submit the session already exists; standalone we build one
    try:
        from pprl_spark.session import get_spark

        spark = SparkSession.getActiveSession() or get_spark("pprl_pipeline")
    except Exception:
        spark = SparkSession.builder.appName("pprl_pipeline").getOrCreate()

    from pprl_spark.config import EmbedderConfig
    from pprl_spark.plans.pipeline import run_linkage
    from pprl_spark.sources.synthetic import labeled_pairs, synthesize_documents

    def load(spec: str, source: str):
        if spec.startswith("synthetic:"):
            return synthesize_documents(spark, int(spec.split(":")[1]), source)
        return spark.read.parquet(spec)

    docs_a = load(args.docs_a, "A")
    docs_b = load(args.docs_b, "B")
    config = EmbedderConfig(abs_cutoff=args.abs_cutoff, salt=args.salt)

    pipe = run_linkage(
        spark,
        config,
        docs_a,
        docs_b,
        args.base_dir,
        run_id=args.run_id,
        use_thresholds=args.use_thresholds,
        match_rounds=args.match_rounds,
        jw_field=args.jw_field,
        jw_weight=args.jw_weight,
        bucket_blocks=args.bucket_blocks,
    )
    out = {
        "run_id": args.run_id,
        "executed": pipe.executed,
        "skipped": pipe.skipped,
        "matches": pipe.io.read(spark, "matches").count(),
        "clusters": pipe.io.read(spark, "clusters").select("entity_id").distinct().count(),
    }
    if args.evaluate and "true_id" in docs_a.columns:
        truth = labeled_pairs(docs_a, docs_b)
        matches = pipe.io.read(spark, "matches")
        tp = matches.join(truth, ["id1", "id2"]).count()
        n_m, n_t = out["matches"], truth.count()
        precision = tp / n_m if n_m else 0.0
        recall = tp / n_t if n_t else 0.0
        out["precision"] = round(precision, 4)
        out["recall"] = round(recall, 4)
        out["f1"] = round(
            2 * precision * recall / (precision + recall), 4
        ) if precision + recall else 0.0
    print(json.dumps(out))


if __name__ == "__main__":
    main()
