"""Scale-robustness build: 10^9 points -> full checkpointed pyramid,
plus a 10% (10^8-point) incremental_update folded into it.

The point is robustness of the partitioning/driver design at 2000x the
bench corpus — sustained throughput, zero OOM/spill failure, bounded
driver memory — not the absolute wall (this box is a shared microVM;
bracketing canaries stamp the reading).  Run alone (never concurrently
with a bench) and in a quiet window:

    python scripts/scale_robustness.py [N_POINTS] 2>/dev/null

Prints one JSON line with build/update walls, pyramid shape, sampled
peak JVM heap, and the canary brackets.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main(argv: list[str]) -> int:
    n = int(argv[0]) if argv else 1_000_000_000
    from pyspark.sql import functions as F

    from vt_grid_spark.operators.pyramid import build_pyramid, incremental_update
    from vt_grid_spark.plans.aggspec import AggSpec
    from vt_grid_spark.plans.pyramid_plan import PyramidPlan, ZoomBand
    from vt_grid_spark.session import get_spark
    from vt_grid_spark.sources import pages
    from vt_grid_spark.sources.table_io import TableIO

    spark = get_spark("vt-grid-scale", cores=CPUS)
    rt = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()

    peak = {"bytes": 0}
    stop = threading.Event()

    def sample():  # peak JVM heap, sampled — good enough OOM-margin evidence
        while not stop.is_set():
            used = rt.totalMemory() - rt.freeMemory()
            if used > peak["bytes"]:
                peak["bytes"] = used
            stop.wait(0.5)

    from vt_grid_spark.canary import warm_canary
    from vt_grid_spark.canary import canary as _canary

    def canary() -> float:
        return _canary(spark)

    warm_canary(spark)
    probe_before = canary()

    pts = pages.with_coords(pages.pages_df(spark, n)) \
        .withColumn("v", F.length("text").cast("double"))
    specs = [AggSpec(out="cnt", reducer="count"),
             AggSpec(out="sum_v", reducer="sum", field="v")]
    plan = PyramidPlan(bands=[ZoomBand(basezoom=13, minzoom=0,
                                       aggregations=specs)],
                       gridsize=1, salt_buckets=16)

    out_dir = tempfile.mkdtemp(prefix="vtgrid_scale_",
                               dir="/dev/shm" if os.path.isdir("/dev/shm") else None)
    t = threading.Thread(target=sample, daemon=True)
    t.start()
    try:
        io = TableIO(out_dir)
        t0 = time.perf_counter()
        manifests = build_pyramid(pts, plan, io, resume=False)
        build_wall = round(time.perf_counter() - t0, 3)
        total_tiles = sum(m["row_count"] for m in manifests.values())
        base_rows = manifests[max(manifests)]["row_count"]

        # 10% delta folded in WITHOUT re-reading history.  The delta
        # replays the head of the generator distribution — every delta
        # cell is a TOUCHED cell including the hot NYC cluster, which is
        # the demanding path for the broadcast anti/semi routing (the
        # merge is exact regardless; monoid merge == rebuild is asserted
        # in tests/test_pyramid.py)
        delta = pages.with_coords(pages.pages_df(spark, n // 10)) \
            .withColumn("v", F.length("text").cast("double"))
        t0 = time.perf_counter()
        upd = incremental_update(delta, plan, io)
        update_wall = round(time.perf_counter() - t0, 3)
        upd_tiles = sum(m["row_count"] for m in upd.values())
    finally:
        stop.set()
        t.join(timeout=2)
        shutil.rmtree(out_dir, ignore_errors=True)
    probe_after = canary()

    print(json.dumps({
        "metric": "scale_robustness_1b",
        "points": n,
        "cpus": CPUS,
        "build_wall_s": build_wall,
        "points_per_sec": round(n / build_wall, 1),
        "pyramid": {"levels": len(manifests), "total_tiles": total_tiles,
                    "base_cells": base_rows},
        "incremental_update": {"delta_points": n // 10,
                               "wall_s": update_wall,
                               "total_tiles_after": upd_tiles},
        "peak_jvm_heap_gib": round(peak["bytes"] / 2**30, 2),
        "max_heap_gib": round(rt.maxMemory() / 2**30, 2),
        "probe_before": probe_before, "probe_after": probe_after,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
