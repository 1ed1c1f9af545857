"""Two-parallelism scaling-efficiency evidence (north rule).

A real N-vs-4N-executor cluster does not exist in this sandbox, so —
per BASELINE.md — the same job runs at local[lo] and local[hi] on
identical input, each in its own JVM subprocess. Reported:

    efficiency = (T_lo / T_hi) / (hi / lo)      (per-core normalized)

The host's DRAM bandwidth drifts between fast and slow phases on a
timescale comparable to one run (measured single-sweep efficiency swung
0.577-0.783 within an hour), so with ``repeats > 1`` the two levels run
INTERLEAVED (lo, hi, lo, hi, ...) and the efficiency is computed from
per-level MEDIAN wall times — phase drift then hits both levels
near-symmetrically instead of landing entirely on one leg.

Usage: python tools/bench_scaling.py [n_per_source] [lo] [hi] [repeats]
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys


def run(cpus: int, n: int) -> dict:
    out = subprocess.run(
        [sys.executable, "tools/_scale_job.py", str(cpus), str(n)],
        capture_output=True,
        text=True,
        check=True,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    lo_cores = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    hi_cores = int(sys.argv[3]) if len(sys.argv) > 3 else 4 * lo_cores
    repeats = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    ratio = hi_cores / lo_cores

    los: list[dict] = []
    his: list[dict] = []
    for i in range(repeats):
        los.append(run(lo_cores, n))
        his.append(run(hi_cores, n))
        if repeats > 1:
            done = {
                "interleaved_round": i + 1,
                f"local{lo_cores}_sec": los[-1]["elapsed_sec"],
                f"local{hi_cores}_sec": his[-1]["elapsed_sec"],
            }
            print(json.dumps(done), file=sys.stderr)

    med = lambda runs, key: statistics.median(r[key] for r in runs)
    lo_sec, hi_sec = med(los, "elapsed_sec"), med(his, "elapsed_sec")
    eff = (lo_sec / hi_sec) / ratio
    result = {
        "n_per_source": n,
        "repeats": repeats,
        f"local{lo_cores}_sec": lo_sec,
        f"local{hi_cores}_sec": hi_sec,
        f"local{lo_cores}_samples": [r["elapsed_sec"] for r in los],
        f"local{hi_cores}_samples": [r["elapsed_sec"] for r in his],
        f"local{lo_cores}_docs_per_sec": round(2 * n / lo_sec, 1),
        f"local{hi_cores}_docs_per_sec": round(2 * n / hi_sec, 1),
        "speedup": round(lo_sec / hi_sec, 2),
        "scaling_efficiency": round(eff, 3),
        "matches_equal": len({r["matches"] for r in los + his}) == 1,
    }
    # per-stage attribution when the job reports the split: embed is the
    # CPU-bound stage (Arrow-batched hashing), match is exchange-bound
    if all("embed_sec" in r for r in los + his):
        result["embed_efficiency"] = round(
            (med(los, "embed_sec") / med(his, "embed_sec")) / ratio, 3
        )
        result["match_efficiency"] = round(
            (med(los, "match_sec") / med(his, "match_sec")) / ratio, 3
        )
        result["embed_sec"] = [med(los, "embed_sec"), med(his, "embed_sec")]
        result["match_sec"] = [med(los, "match_sec"), med(his, "match_sec")]
    print(json.dumps(result))


if __name__ == "__main__":
    main()
