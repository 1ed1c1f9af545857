"""spark-submit entrypoint for the end-to-end corpus curation pipeline.

Cluster:
    zip -r pprl_spark.zip pprl_spark
    spark-submit --py-files pprl_spark.zip scripts/run_curation.py \
        --docs /data/crawl_docs --base-dir /ckpt/cur1 \
        --trim-frac 0.1 --drop-buckets tail --sample en=0.2

Local smoke (this sandbox):
    PYTHONPATH=/root/repo python scripts/run_curation.py \
        --docs /root/testdata/sf0.01/documents.parquet \
        --base-dir /tmp/cur_run

Prints one JSON line with executed/skipped stages and per-stage row
counts. Resume/invalidation semantics mirror run_dedup: re-running with
identical parameters skips every committed stage; retuning the filter
or sampling knobs re-runs only the stages they salt.
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
    p.add_argument("--trim-frac", type=float, default=0.1)
    p.add_argument("--drop-buckets", default="tail",
                   help="comma-separated perplexity buckets to drop ('' = none)")
    p.add_argument("--shingle-k", type=int, default=2)
    p.add_argument("--threshold", type=float, default=0.4)
    p.add_argument("--bands", type=int, default=4)
    p.add_argument("--rows-per-band", type=int, default=2)
    p.add_argument("--sample", default=None)
    p.add_argument("--sample-default", type=float, default=1.0)
    p.add_argument("--sample-salt", type=int, default=0)
    p.add_argument("--strata-col", default="lang")
    p.add_argument("--cores", type=int, default=8)
    args = p.parse_args()

    from pprl_spark.plans.curation_pipeline import run_curation
    from pprl_spark.session import get_spark

    spark = get_spark(
        "curation", master=f"local[{args.cores}]", shuffle_partitions=4 * args.cores
    )
    docs = spark.read.parquet(args.docs)
    pipe = run_curation(
        spark,
        docs,
        args.base_dir,
        run_id=args.run_id,
        trim_frac=args.trim_frac,
        drop_buckets=tuple(b for b in args.drop_buckets.split(",") if b),
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
        s: spark.read.parquet(f"{args.base_dir}/{s}").count()
        for s in ("scrubbed", "filtered", "canonical", "kept_docs")
    }
    print(json.dumps({
        "executed": pipe.executed, "skipped": pipe.skipped, "rows": counts,
    }))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
