"""Per-query probe harness for the optimization rounds (guide §1).

NOT the official bench (bench.py is frozen for measurement): this tool
isolates single queries for the measure/optimize/re-measure loop —
same timing methodology as bench.py (median of N samples, memo
invalidation between samples, .count() action), plus:

- ``--noop``: time a ``noop``-sink write instead of ``.count()`` so the
  full row payload is computed (guide §1.4);
- ``--plan plans/r06 --tag before``: dump ``.explain("formatted")`` for
  each probed query to ``plans/r06/<query>_<tag>.txt``.

Usage:
    python tools/bench_probe.py dedup_setjoin dedup_containment \
        --runs 3 --plan plans/r06 --tag before
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from pprl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# bench.py name -> entry queries() name (identity where omitted)
ALIASES = {
    "pprl_embed": "pprl_bloom_stats",
    "pprl_block_score": "pprl_score_pairs",
    "pprl_match": "pprl_mutual_best_match",
    "dedup_snm": "dedup_snm_pairs",
    "dedup_recall": "dedup_recall_report",
    "ann_ivf_probe": "ann_ivf_persisted",
    "scm_scored": "pprl_scm_scored",
    "jw_pairs": "pprl_jw_pairs",
    "edit_pairs": "pprl_edit_pairs",
    "delta_match": "delta_match_pairs",
    "fs_scored": "pprl_fs_scored",
    "fs_match": "pprl_fs_match",
    "fs_clusters": "pprl_fs_clusters",
    "block_stats": "pprl_block_stats",
    "pprl_suppressed": "pprl_suppressed_pairs",
    "pprl_dice": "pprl_dice_pairs",
    "threshold_sweep": "pprl_threshold_sweep",
    "review_pairs": "pprl_review_pairs",
    "blocking_eval": "pprl_blocking_eval",
}

# same per-sample memo resets as bench.py
OWNED_MEMO = {
    "pprl_embed": ["embedded"],
    "fs_scored": ["fs_scored"],
    "pprl_block_score": ["scored_pairs", "blocked"],
    "pprl_match": ["mutual_best"],
    "dedup_setjoin": ["setjoin_pairs"],
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--plan", default=None, help="directory for explain dumps")
    ap.add_argument("--tag", default="before")
    args = ap.parse_args()

    spark = get_spark(app_name="pprl_probe", master=f"local[{CPUS}]")
    q = entry.queries()

    def build(name):
        if name == "linkage_synthetic":
            import bench

            return None  # special-cased below
        if name == "dedup_minhash_op":
            from pprl_spark.operators.dedup import minhash_near_duplicates

            return minhash_near_duplicates(entry._docs(spark, SF_DIR), k=3, threshold=0.5)
        if name == "dedup_simhash_op":
            from pprl_spark.operators.dedup import simhash_near_duplicates

            return simhash_near_duplicates(entry._docs(spark, SF_DIR))
        return q[ALIASES.get(name, name)](spark, SF_DIR)

    out = {}
    for name in args.names:
        spark.sparkContext.setJobDescription(f"probe:{name}")
        if args.plan:
            os.makedirs(args.plan, exist_ok=True)
            df = build(name)
            if df is not None:
                with open(f"{args.plan}/{name}_{args.tag}.txt", "w") as fh:
                    fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"))
        samples = []
        rows = None
        for i in range(args.runs):
            if i > 0:
                entry.invalidate_memo(spark, SF_DIR, OWNED_MEMO.get(name, []))
            gc.collect()
            t0 = time.time()
            if name == "linkage_synthetic":
                import bench

                rows = bench.bench_linkage_synthetic(spark)
            else:
                df = build(name)
                if args.noop:
                    df.write.format("noop").mode("overwrite").save()
                else:
                    rows = df.count()
            samples.append(round(time.time() - t0, 3))
        out[name] = {
            "median": round(statistics.median(samples), 3),
            "samples": samples,
            "rows": rows,
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"all": out}))
    spark.stop()


if __name__ == "__main__":
    main()
