"""Control measurements for the 4-vs-16 scaling ceiling (BASELINE.md).

Two weak-scaling controls, each run as W independent pinned worker
processes doing identical fixed work (perfect scaling => equal wall time
at any W; efficiency = T(low)/T(high)):

  * cpu    — md5 over a small in-cache buffer: pure ALU, no memory
             pressure.  If 4->16 holds ~1.0 the box has 16 real cores.
  * membw  — numpy triad (a = b*s + c) over arrays far larger than LLC:
             pure memory-bandwidth demand, no shuffle, no Spark, no JVM.
             Its 4->16 efficiency is the BUS ceiling — no engine on this
             box can weak-scale a bandwidth-bound phase past it.

Writes BENCH_CONTROLS.json.  Usage:
  python scripts/bench_controls.py [workers_low=4] [workers_high=16]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CPU_WORKER = r"""
import hashlib, time
t0 = time.perf_counter()
buf = b"x" * 4096
for _ in range(400_000):
    buf = hashlib.md5(buf).digest() * 256  # 4 KiB stays in L1/L2
print(time.perf_counter() - t0)
"""

MEMBW_WORKER = r"""
import numpy as np, time
n = 20_000_000  # 3 x 160 MB float64 >> any LLC
b = np.ones(n); c = np.ones(n); a = np.empty(n)
t0 = time.perf_counter()
for _ in range(10):
    np.multiply(b, 1.000001, out=a)
    np.add(a, c, out=a)   # triad: 3 streams x 160 MB per pass
print(time.perf_counter() - t0)
"""


def run_workers(code: str, w: int, reps: int = 2) -> float:
    """Median per-worker INNER kernel time (startup/alloc excluded) of w
    pinned workers doing identical work; min over reps."""
    import statistics

    best = None
    for _ in range(reps):
        procs = [subprocess.Popen(
            ["taskset", "-c", str(i), sys.executable, "-c", code],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
            for i in range(w)]
        inners = []
        for p in procs:
            out, err = p.communicate()
            if p.returncode != 0:
                raise RuntimeError(f"control worker failed: {err[:400]}")
            inners.append(float(out.strip()))
        med = statistics.median(inners)
        if best is None or med < best:
            best = med
    return best


def main():
    w_low = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    w_high = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    out = {"workers": [w_low, w_high], "controls": {}}
    for name, code in (("cpu", CPU_WORKER), ("membw", MEMBW_WORKER)):
        t_low = run_workers(code, w_low)
        t_high = run_workers(code, w_high)
        out["controls"][name] = {
            "wall_low": round(t_low, 2),
            "wall_high": round(t_high, 2),
            "weak_scaling_efficiency": round(t_low / t_high, 3),
        }
        print(name, out["controls"][name])
    with open(os.path.join(REPO, "BENCH_CONTROLS.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
