"""Pinned-core capacity probe — the control that decides whether a
scaling measurement is worth launching.

Round-3 lesson (BASELINE.md): the 32-thread warm-headline probe is
NECESSARY but NOT SUFFICIENT — a fixed hypervisor-neighbor load can hide
in SMT slack (probe reads 3.5-3.9 s, "quiet") while a 16-core-PINNED run
inflates 1.7-3x.  This probe measures what scaling runs actually consume:
the full 64M-point pyramid build on 16 pinned cores, fresh JVM, tmpfs.

Reference walls for THIS recipe:
  * r1 quiet window ........ 28.6 s  (the committed 4v16/2v8 conditions)
  * r3 engine, mild noise .. 48.8 s  (engine 1.28x faster than r1 code
                                      same-moment, so <=38 s is "quiet
                                      enough" for the current engine)
  * contended .............. 80-140 s (do NOT run scaling measurements)

Usage: python scripts/capacity_probe.py [n_points=64000000] [cores=16]
Prints one JSON line; exit 0 if wall <= 40 s (go), exit 1 otherwise.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CODE = r"""
import sys, time, json, tempfile, shutil
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from vt_grid_spark.session import get_spark
from vt_grid_spark.operators.pyramid import build_pyramid
from vt_grid_spark.plans.aggspec import AggSpec
from vt_grid_spark.plans.pyramid_plan import PyramidPlan, ZoomBand
from vt_grid_spark.sources import pages
from vt_grid_spark.sources.table_io import TableIO
spark = get_spark("capacity_probe", cores={cores})
specs = [AggSpec(out="cnt", reducer="count"),
         AggSpec(out="sum_v", reducer="sum", field="v")]
plan = PyramidPlan(bands=[ZoomBand(basezoom=13, minzoom=0, aggregations=specs)],
                   gridsize=1, salt_buckets=16)
wd = tempfile.mkdtemp(prefix="w_", dir="/dev/shm")
wpts = pages.with_coords(pages.pages_df(spark, 1_000_000)) \
            .withColumn("v", F.length("text").cast("double"))
build_pyramid(wpts, plan, TableIO(wd), resume=False)
shutil.rmtree(wd, ignore_errors=True)
pts = pages.with_coords(pages.pages_df(spark, {n})) \
           .withColumn("v", F.length("text").cast("double"))
pts.count()
d = tempfile.mkdtemp(prefix="s_", dir="/dev/shm")
try:
    t0 = time.perf_counter()
    build_pyramid(pts, plan, TableIO(d), resume=False)
    print(json.dumps({{"wall": round(time.perf_counter() - t0, 1)}}))
finally:
    shutil.rmtree(d, ignore_errors=True)
"""

GO_THRESHOLD_S = 40.0


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    cmd = ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c",
           CODE.format(repo=REPO, n=n, cores=cores)]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True,
                         cwd=REPO)
    wall = json.loads(out.stdout.strip().splitlines()[-1])["wall"]
    go = wall <= GO_THRESHOLD_S
    print(json.dumps({"pinned_cores": cores, "n_points": n, "wall": wall,
                      "go_threshold": GO_THRESHOLD_S, "go": go,
                      "references": {"r1_quiet": 28.6, "r3_mild": 48.8}}))
    sys.exit(0 if go else 1)


if __name__ == "__main__":
    main()
