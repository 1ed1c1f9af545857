"""spark-submit entrypoint for the training-data dedup pipeline.

Cluster:
    zip -r pprl_spark.zip pprl_spark
    spark-submit --py-files pprl_spark.zip scripts/run_dedup.py \
        --docs /data/crawl_docs --base-dir /ckpt/dedup1 \
        --sample en=0.2,zh=1.0 --sample-default 0.5

Local smoke (this sandbox):
    PYTHONPATH=/root/repo python scripts/run_dedup.py \
        --docs /root/testdata/sf0.01/documents.parquet \
        --base-dir /tmp/dedup_run

Prints one JSON line with executed/skipped stages and per-stage row
counts. Re-running with the same --base-dir and parameters skips every
committed stage (resume); changing any parameter (rates, threshold,
banding) invalidates downstream stages via the config checksum.
"""

from __future__ import annotations

import argparse
import json
import sys


def _parse_rates(s: str | None) -> dict[str, float] | None:
    if not s:
        return None
    out: dict[str, float] = {}
    for part in s.split(","):
        k, v = part.split("=", 1)
        out[k.strip()] = float(v)
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--docs", required=True, help="parquet path of (doc_id, text, ...)")
    p.add_argument("--base-dir", required=True)
    p.add_argument("--run-id", default="run-0")
    p.add_argument("--shingle-k", type=int, default=2)
    p.add_argument("--threshold", type=float, default=0.4)
    p.add_argument("--bands", type=int, default=4)
    p.add_argument("--rows-per-band", type=int, default=2)
    p.add_argument("--sample", default=None,
                   help="per-stratum keep rates, e.g. en=0.2,zh=1.0")
    p.add_argument("--sample-default", type=float, default=1.0)
    p.add_argument("--sample-salt", type=int, default=0)
    p.add_argument("--strata-col", default="lang")
    args = p.parse_args()

    from pprl_spark.plans.dedup_pipeline import run_dedup
    from pprl_spark.session import get_spark

    spark = get_spark(app_name=f"dedup_{args.run_id}")
    docs = spark.read.parquet(args.docs)

    pipe = run_dedup(
        spark,
        docs,
        args.base_dir,
        run_id=args.run_id,
        k=args.shingle_k,
        threshold=args.threshold,
        bands=args.bands,
        rows_per_band=args.rows_per_band,
        sample_fractions=_parse_rates(args.sample),
        sample_default=args.sample_default,
        sample_salt=args.sample_salt,
        strata_col=args.strata_col,
    )
    counts = {
        s: pipe.io.read(spark, s).count()
        for s in ("dedup_pairs", "dedup_clusters", "canonical", "kept_docs")
    }
    print(json.dumps({
        "run_id": args.run_id,
        "executed": pipe.executed,
        "skipped": pipe.skipped,
        "n_docs": docs.count(),
        **{f"n_{k}": v for k, v in counts.items()},
    }))
    spark.stop()


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
