"""Single-box scaling ceilings: what local[N] -> local[4N] CAN deliver.

The north rule's scaling criterion targets N vs 4N EXECUTORS — separate
machines whose memory controllers, page-fault capacity and GC threads
multiply with the cluster. The sandbox stand-in (one JVM, more threads)
shares all of those, so its measurable ceilings bound any thread-scaled
efficiency number. This tool measures the two ceilings that matter for a
shuffle-heavy engine, with plain numpy processes (no Spark, no JVM):

- **steady-state memory bandwidth** (prefaulted 160MB streaming copies):
  how much aggregate DRAM throughput 4 vs 16 concurrent processes get;
- **fresh-page allocation** (same copies onto never-touched pages): the
  page-fault path a JVM exercises whenever heaps/shuffle buffers grow.

Measured on this container (32 vCPU VM, fixed 2.1GHz clocks):

    steady-state: 4p 78.1-78.4 GB/s | 16p 179.0-216.8
      -> 4->16 bandwidth scaling efficiency = 0.57-0.69 across runs
    fresh pages:  1p ~20 GB/s | 4p 0.3 | 16p 1.0
      -> concurrent first-touch faults collapse ~300x (serialized in the
         hypervisor), which is why session.py keeps JVM heaps small

A memory-bound stage therefore cannot exceed ~2.3-2.8x speedup from
local[4] -> local[16] ON THIS BOX; the linkage job's measured ~3.1x
(BENCH/BASELINE.md round 3) sits between the compute ceiling (4.0x) and
the bandwidth ceiling — i.e. the box, not the plan, is the binding
constraint at high thread counts. Usage::

    python tools/bench_boxscaling.py
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

ARR_ELEMS = 20_000_000  # 160 MB per buffer — far beyond L3
SECONDS = 5.0


def _worker(q, ev, prefault: bool) -> None:
    import numpy as np

    a = np.ones(ARR_ELEMS)
    b = np.empty_like(a)
    if prefault:
        b.fill(0.0)  # touch every destination page before the barrier
    ev.wait()
    t_end = time.time() + SECONDS
    n = 0
    while time.time() < t_end:
        np.copyto(b, a)
        n += 1
    q.put(n)


def measure(nproc: int, prefault: bool) -> float:
    """Aggregate GB/s of nproc synchronized streaming-copy processes."""
    q: mp.Queue = mp.Queue()
    ev = mp.Event()
    ps = [mp.Process(target=_worker, args=(q, ev, prefault)) for _ in range(nproc)]
    for p in ps:
        p.start()
    time.sleep(4 + nproc * 0.5)  # let every init (and prefault) finish
    ev.set()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    bytes_per_iter = ARR_ELEMS * 8 * 2  # read + write
    return total * bytes_per_iter / SECONDS / 1e9


def _spin(n: int) -> int:
    x = 0
    for i in range(n):
        x += i * i
    return x


def measure_cpu(nproc: int, work_units: int = 120, unit: int = 2_000_000) -> float:
    """Seconds for a FIXED amount of allocation-free integer work split
    across nproc processes — the compute-scaling control: no memory
    traffic, so this scales with core count (measured 0.91 for 4->16 on
    this VM) while anything touching DRAM at rate caps near 0.6."""
    t0 = time.time()
    with mp.Pool(nproc) as pool:
        pool.map(_spin, [unit] * work_units)
    return time.time() - t0


def main() -> None:
    out: dict = {}
    for prefault, key in ((True, "steady_gbps"), (False, "fresh_page_gbps")):
        res = {n: round(measure(n, prefault), 1) for n in (1, 4, 16)}
        out[key] = res
    s = out["steady_gbps"]
    out["bandwidth_scaling_efficiency_4_to_16"] = round(s[16] / (4 * s[4]), 3)
    c4, c16 = measure_cpu(4), measure_cpu(16)
    out["cpu_secs"] = {4: round(c4, 2), 16: round(c16, 2)}
    out["cpu_scaling_efficiency_4_to_16"] = round((c4 / c16) / 4, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
