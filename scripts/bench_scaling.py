"""Scaling-efficiency evidence for the north rule: the same full-pyramid
build at two parallelism levels (local[8] vs local[32] — the sandbox
stand-in for N vs 4N executors), same input, fresh JVM per run.

Efficiency = (T_low / T_high) / (cores_high / cores_low); target >= 0.8.
Writes the result table into BENCH_SCALING.json and prints it.

Defaults (the configuration that produced the committed headline in
BENCH_SCALING.json / BASELINE.md): 128M points, cores 2 vs 8.  This
host's 32 hardware threads are 16 physical cores + SMT (verified by the
compute-bound control in scripts/bench_controls.py), and at >=4 cores the
shuffle's memory-bandwidth-bound fraction saturates the single box's bus
(see the bandwidth-bound control) — 2 vs 8 is the widest 4x pair where
neither side hits either ceiling.  The stricter 4-vs-16 pair is reported
alongside in BASELINE.md.  Override with argv[1..3], e.g.
``python scripts/bench_scaling.py 256000000 4 16``.

Usage: python scripts/bench_scaling.py [n_points=128000000] [cores_low=2] [cores_high=8]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_TEMPLATE = r"""
import sys, time, json, tempfile, shutil
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from vt_grid_spark.session import get_spark
from vt_grid_spark.operators.pyramid import build_pyramid
from vt_grid_spark.plans.aggspec import AggSpec
from vt_grid_spark.plans.pyramid_plan import PyramidPlan, ZoomBand
from vt_grid_spark.sources import pages
from vt_grid_spark.sources.table_io import TableIO

cores = {cores}
spark = get_spark("scaling", cores=cores)
pts = pages.with_coords(pages.pages_df(spark, {n}))
pts = pts.withColumn("v", F.length("text").cast("double"))
specs = [AggSpec(out="cnt", reducer="count"),
         AggSpec(out="sum_v", reducer="sum", field="v")]
plan = PyramidPlan(bands=[ZoomBand(basezoom=13, minzoom=0, aggregations=specs)],
                   gridsize=1, salt_buckets=16)
# warm JIT + shuffle machinery with a small untimed build first: a fresh
# JVM spends several seconds compiling the hot codegen paths, which is a
# constant that would otherwise read as serial fraction
wd = tempfile.mkdtemp(prefix="vtgrid_warm_", dir="/dev/shm")
wpts = pages.with_coords(pages.pages_df(spark, 1_000_000)).withColumn("v", F.length("text").cast("double"))
build_pyramid(wpts, plan, TableIO(wd), resume=False)
shutil.rmtree(wd, ignore_errors=True)
pts.count()  # warm the input outside the timed section
d = tempfile.mkdtemp(prefix="vtgrid_scaling_", dir="/dev/shm")
try:
    t0 = time.perf_counter()
    m = build_pyramid(pts, plan, TableIO(d), resume=False)
    wall = time.perf_counter() - t0
    tiles = sum(x["row_count"] for x in m.values())
finally:
    shutil.rmtree(d, ignore_errors=True)
print(json.dumps({{"cores": cores, "wall": wall, "tiles": tiles,
                   "tiles_per_sec": tiles / wall}}))
"""


def run(cores: int, n: int, reps: int = 2) -> dict:
    """Best of `reps` fresh-JVM runs — this host shows heavy run-to-run
    variance (shared microVM); min-of-reps isolates the engine's cost."""
    best = None
    for _ in range(reps):
        code = RUN_TEMPLATE.format(repo=REPO, cores=cores, n=n)
        # pin the whole JVM/Python process tree to `cores` CPUs: local[N]
        # alone still lets GC/JIT/shuffle threads use every hardware thread,
        # which silently gifts the low-parallelism run extra cores and
        # understates true scaling
        cmd = ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c", code]
        out = subprocess.run(cmd, capture_output=True,
                             text=True, check=True, cwd=REPO)
        r = json.loads(out.stdout.strip().splitlines()[-1])
        if best is None or r["wall"] < best["wall"]:
            best = r
    return best


def probe() -> dict:
    """Box-health probe recorded alongside every measurement: the warm
    sf0.1 headline build at full parallelism.  On a quiet box it lands
    ~2.6-3.7 s; hypervisor neighbor contention inflates it 1.5-4x and
    invalidates RATIO measurements too (the low- and high-parallelism
    sides absorb contention asymmetrically) — treat results with
    probe_wall > ~4.5 s as contaminated and re-run later.

    Caveat (round-3 lesson, BASELINE.md): a 32-thread probe can UNDER-
    detect — with 16 physical cores + SMT, a fixed neighbor load hides in
    the probe's hyperthread slack yet inflates a 16-core-pinned run ~2x.
    A clean probe is necessary, not sufficient; the definitive control is
    a same-moment A/B of the current engine vs a pinned older commit on
    the same workload (the 64M/16-core recipe in BASELINE.md round 3)."""
    r = run(32, 500_000, reps=2)
    return {"probe_points": 500_000, "probe_cores": 32,
            "probe_wall": round(r["wall"], 2), "quiet_reference": 2.65}


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128_000_000
    c_low = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    c_high = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    pb = probe()
    # interleave the reps (L,H,L,H) so both sides sample the same noise
    # environment — sequential low*2/high*2 lets a mid-measurement drift
    # land entirely on one side and skew the RATIO (round-3 lesson: a
    # drift during the high phase read as eff 0.528 on a "quiet" probe)
    lows, highs = [], []
    for _ in range(2):
        lows.append(run(c_low, n, reps=1))
        highs.append(run(c_high, n, reps=1))
    low = min(lows, key=lambda r: r["wall"])
    high = min(highs, key=lambda r: r["wall"])
    pa = probe()  # the box can degrade MID-measurement; bracket it
    eff = (low["wall"] / high["wall"]) / (c_high / c_low)
    result = {
        "input_points": n,
        "box_probe": pb,
        "box_probe_after": pa,
        "runs": [low, high],
        "speedup": round(low["wall"] / high["wall"], 3),
        "core_ratio": c_high / c_low,
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
