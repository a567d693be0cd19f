"""Prove or retire the 2→8 scaling memory-bandwidth diagnosis
(VERDICT r04 next-round #3 / BENCH/BASELINE_2TO8.md).

The claim: the index build's 2→8-core efficiency (0.776) sits below the
≥0.8 contract because ≥8 cores saturate the host's shared memory
bandwidth, not because the build has a serial fraction. The r4 evidence
was throughput plateaus (indirect). This probe measures the resource
directly, with two single-process-identical kernels run at P = 1, 2, 4,
8 pinned processes (cores 0..P-1, multiprocessing, no shared state):

  * COMPUTE-bound: repeated 192×192 float64 matmul (~590 KB working
    set — resident in per-core L2; BLAS pinned to 1 thread). If the
    cores themselves scale, this scales ~1.0.
  * MEMORY-bound: STREAM-like copy of a 256 MB buffer (working set ≫
    LLC; every byte travels the memory bus). If the bus is the shared
    ceiling, per-process throughput collapses as P grows while the
    compute kernel's does not.

Interpretation: compute efficiency ≥ ~0.9 at 2→8 AND memory efficiency
well below the build's 0.776 ⇒ the build sits between the two bounds
exactly where a partially-bandwidth-bound workload must, and the
diagnosis is PROVEN (the contract's cluster-size scaling is about adding
EXECUTORS — each bringing its own memory bus — which this host cannot
emulate past its socket bandwidth). Compute efficiency ALSO low would
instead indict the host/scheduler and retire the diagnosis.

Usage: python scripts/bench_bandwidth_probe.py [--secs 6] [--out -]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import time


def _pin(core: int) -> None:
    try:
        os.sched_setaffinity(0, {core})
    except (AttributeError, OSError):
        pass


def compute_worker(core: int, secs: float, q) -> None:
    _pin(core)
    for v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ[v] = "1"
    import numpy as np

    a = np.random.default_rng(core).random((192, 192))
    b = np.random.default_rng(core + 1).random((192, 192))
    n = 0
    t0 = time.monotonic()
    while time.monotonic() - t0 < secs:
        for _ in range(50):
            a @ b
        n += 50
    q.put(n / (time.monotonic() - t0))  # matmuls/s


def memory_worker(core: int, secs: float, q) -> None:
    _pin(core)
    import numpy as np

    src = np.ones(32 * 1024 * 1024, dtype=np.float64)  # 256 MB
    dst = np.empty_like(src)
    n = 0
    t0 = time.monotonic()
    while time.monotonic() - t0 < secs:
        np.copyto(dst, src)
        n += 1
    elapsed = time.monotonic() - t0
    q.put(n * src.nbytes * 2 / elapsed / 1e9)  # GB/s (read+write)


def run(worker, p: int, secs: float) -> float:
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    procs = [
        ctx.Process(target=worker, args=(core, secs, q)) for core in range(p)
    ]
    for pr in procs:
        pr.start()
    vals = [q.get() for _ in procs]
    for pr in procs:
        pr.join()
    return sum(vals)  # aggregate throughput


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--secs", type=float, default=6.0)
    args = ap.parse_args()

    out: dict[str, dict] = {}
    for name, worker in (("compute", compute_worker), ("memory", memory_worker)):
        agg = {}
        for p in (1, 2, 4, 8):
            agg[p] = run(worker, p, args.secs)
            print(f"{name} P={p}: aggregate {agg[p]:.2f}", flush=True)
        eff = {
            f"{a}to{b}": round((agg[b] / agg[a]) / (b / a), 3)
            for a, b in ((1, 2), (2, 4), (4, 8), (2, 8))
        }
        out[name] = {"aggregate": {str(k): round(v, 2) for k, v in agg.items()},
                     "efficiency": eff}
        print(f"{name} efficiency: {eff}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
