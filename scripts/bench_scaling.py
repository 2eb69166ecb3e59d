"""Scaling-efficiency evidence for the north rule: the same full-pyramid
build at two parallelism levels (local[8] vs local[32] — the sandbox
stand-in for N vs 4N executors), same input, fresh JVM per run.

Efficiency = (T_low / T_high) / (cores_high / cores_low); target >= 0.8.
Writes the result table into BENCH_SCALING.json and prints it.

Usage: python scripts/bench_scaling.py [n_points]
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
pts.count()  # warm the input outside the timed section
d = tempfile.mkdtemp(prefix="vtgrid_scaling_")
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


def run(cores: int, n: int) -> dict:
    code = RUN_TEMPLATE.format(repo=REPO, cores=cores, n=n)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, check=True, cwd=REPO)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    low = run(8, n)
    high = run(32, n)
    eff = (low["wall"] / high["wall"]) / (32 / 8)
    result = {
        "input_points": n,
        "runs": [low, high],
        "speedup": round(low["wall"] / high["wall"], 3),
        "core_ratio": 4,
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
