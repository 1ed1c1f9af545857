"""Two-parallelism scaling-efficiency evidence (north rule).

A real N-vs-4N-executor cluster does not exist in this sandbox, so —
per BASELINE.md — the same job runs at local[8] and local[32] on
identical input, each in its own JVM subprocess. Reported:

    efficiency = (T_8 / T_32) / (32 / 8)      (per-core normalized)

Usage: python tools/bench_scaling.py [n_per_source]
Appends a row to BENCH/BASELINE.md when run from the repo root.
"""

from __future__ import annotations

import json
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
    lo = run(lo_cores, n)
    hi = run(hi_cores, n)
    eff = (lo["elapsed_sec"] / hi["elapsed_sec"]) / (hi_cores / lo_cores)
    result = {
        "n_per_source": n,
        f"local{lo_cores}_sec": lo["elapsed_sec"],
        f"local{hi_cores}_sec": hi["elapsed_sec"],
        f"local{lo_cores}_docs_per_sec": lo["docs_per_sec"],
        f"local{hi_cores}_docs_per_sec": hi["docs_per_sec"],
        "speedup": round(lo["elapsed_sec"] / hi["elapsed_sec"], 2),
        "scaling_efficiency": round(eff, 3),
        "matches_equal": lo["matches"] == hi["matches"],
    }
    # per-stage attribution when the job reports the split: embed is the
    # CPU-bound stage (Arrow-batched hashing), match is exchange-bound
    if "embed_sec" in lo and "embed_sec" in hi:
        ratio = hi_cores / lo_cores
        result["embed_efficiency"] = round(
            (lo["embed_sec"] / hi["embed_sec"]) / ratio, 3
        )
        result["match_efficiency"] = round(
            (lo["match_sec"] / hi["match_sec"]) / ratio, 3
        )
        result["embed_sec"] = [lo["embed_sec"], hi["embed_sec"]]
        result["match_sec"] = [lo["match_sec"], hi["match_sec"]]
    print(json.dumps(result))


if __name__ == "__main__":
    main()
