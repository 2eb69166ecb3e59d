"""Round benchmark: full-pyramid build + headline operator queries.

Prints ONE JSON line:
  {"metric": ..., "value": <sec>, "unit": "sec", "queries": {...}, "sf": ...,
   "tiles_per_sec": ..., "pyramid": {...}}

Headline = wall time of the checkpointed full pyramid build (encode at base
cell zoom 12, roll up to z0, every level written to parquet with manifests)
over the synthetic page corpus at $SPARK_GRAFT_SF_DIR scale.
tiles_per_sec = total cells written across all levels / wall.

Measurement protocol (documented in the JSON): the headline is the best
of 2 builds (the first build in a fresh JVM pays whole-stage-codegen JIT,
a constant that is not engine cost); each query is warmed once at sf0.001
(compiles the same generated code for the plan shape) and timed once at
the benchmark scale.

Box-health gating: this host is a shared microVM whose hypervisor
neighbors inflate wall times 1.5-4x for hours at a time (BASELINE.md
round-2 table; the committed BENCH_r02 query numbers were ~2.1x the
engine's real cost for exactly this reason).  The warm headline IS the
probe: its quiet-box band is 2.6-3.7 s (sf0.1, 32 cores).  When the
best-of-2 lands above 1.5x the band ceiling, the bench retries the build
up to 2 more times; if it still can't reach the band, the output is
stamped ``"box_probe": {"contaminated": true}`` and a loud warning goes
to stderr — numbers in a contaminated JSON measure the neighbor, not the
engine, and must not be compared across rounds.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from vt_grid_spark.operators.pyramid import build_pyramid
    from vt_grid_spark.plans.aggspec import AggSpec
    from vt_grid_spark.plans.pyramid_plan import PyramidPlan, ZoomBand
    from vt_grid_spark.session import get_spark
    from vt_grid_spark.sources import pages
    from vt_grid_spark.sources.table_io import TableIO

    spark = get_spark("vt-grid-bench", cores=CPUS)
    sf = SF_DIR.rstrip("/").rsplit("/", 1)[-1]
    n = pages.n_for_sf_dir(SF_DIR)

    # --- headline: full pyramid, base cell zoom 12 -> 0 ----------------------
    pts = pages.with_coords(pages.pages_df(spark, n))
    pts = pts.withColumn("v", F.length("text").cast("double"))
    specs = [AggSpec(out="cnt", reducer="count"),
             AggSpec(out="sum_v", reducer="sum", field="v")]
    plan = PyramidPlan(bands=[ZoomBand(basezoom=13, minzoom=0, aggregations=specs)],
                       gridsize=1, salt_buckets=16)
    pts.count()  # warm input generation outside the timed section

    # quiet-box reference band for the warm headline (sf0.1, 32 cores);
    # only meaningful at that configuration
    QUIET_BAND = (2.6, 3.7)
    band_applies = (sf == "sf0.1" and CPUS == 32)
    gate = QUIET_BAND[1] * 1.5

    walls = []
    # best-of-2 baseline (first build pays fresh-JVM codegen JIT); up to 2
    # extra attempts if the box probe says a neighbor is eating the machine
    for attempt in range(4):
        if attempt >= 2 and (not band_applies or min(walls) <= gate):
            break
        out_dir = tempfile.mkdtemp(
            prefix="vtgrid_bench_",
            dir="/dev/shm" if os.path.isdir("/dev/shm") else None)
        try:
            t0 = time.perf_counter()
            manifests = build_pyramid(pts, plan, TableIO(out_dir), resume=False)
            walls.append(time.perf_counter() - t0)
            total_tiles = sum(m["row_count"] for m in manifests.values())
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)
    wall = min(walls)

    contaminated = band_applies and wall > gate
    box_probe = {
        "probe_wall": round(wall, 3),
        "quiet_band": list(QUIET_BAND),
        "band_applies": band_applies,
        "contaminated": contaminated,
    }
    if contaminated:
        print(f"WARNING: box probe {wall:.2f}s exceeds {gate:.2f}s "
              f"(quiet band {QUIET_BAND[0]}-{QUIET_BAND[1]}s) — hypervisor "
              "neighbor contention; these numbers measure the box, not the "
              "engine. Re-run in a quiet window.", file=sys.stderr)

    # --- per-query canary probes ---------------------------------------------
    # BASELINE.md documents whole per-query runs discarded for INVISIBLE
    # mid-run noise the headline-only probe cannot see (r3, r4).  The
    # shared compute-bound canary (vt_grid_spark/canary.py — one
    # definition, since its workload IS the quiet-band calibration)
    # re-runs every ~10 queries; each query's JSON entry is stamped with
    # the worse of its two bracketing probes, so a contaminated entry
    # self-identifies (VERDICT r4 #6).
    from vt_grid_spark.canary import CANARY_QUIET_CEIL, warm_canary
    from vt_grid_spark.canary import canary as _canary

    def canary() -> float:
        return _canary(spark)

    warm_canary(spark)
    probe_walls = [canary()]

    # --- per-query timings (codegen warmed at sf0.001, timed at SF_DIR) -------
    # clearCache between runs: operators that cache intermediates (minhash
    # signatures) would otherwise pile 2x36 cached plans into the block
    # manager and degrade late-running queries via eviction/GC churn.
    # gc.collect() additionally drops the Python refs to superseded
    # localCheckpoint RDDs (star-CC rounds, knn seams) so the
    # ContextCleaner reclaims their blocks BEFORE the next timed query
    # instead of mid-way through it.
    import gc

    queries = {}
    probe_idx = {}
    for i, (name, fn) in enumerate(entrymod.queries().items()):
        if i and i % 10 == 0:
            probe_walls.append(canary())
        try:
            fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
        except Exception:
            pass  # warm-up only; the timed run below surfaces real failures
        spark.catalog.clearCache()
        gc.collect()
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        queries[name] = round(time.perf_counter() - t0, 3)
        probe_idx[name] = len(probe_walls) - 1
        spark.catalog.clearCache()
    probe_walls.append(canary())
    # stamp = the WORSE of the two canaries bracketing the query, so noise
    # that starts mid-window still shows on every query inside it
    per_query_probe = {
        q: max(probe_walls[i], probe_walls[min(i + 1, len(probe_walls) - 1)])
        for q, i in probe_idx.items()}

    # PIP queries ship one geometry broadcast each; release them so the
    # kNN section below measures the engine, not accumulated blocks
    from vt_grid_spark.operators.spatial_join import release_pip_broadcasts
    release_pip_broadcasts()

    # --- scale-path kNN: |Q| above the broadcast gate --------------------------
    # 200k jittered queries (non-hot tail — the 20%-in-one-cell cluster
    # would make ring candidates quadratic at z8, a different benchmark)
    # force the shuffle-hash candidate join + re-ring escalation; the
    # registered knn_top10 query only ever exercises the broadcast path.
    from vt_grid_spark.operators.knn import knn_cells, unpersist_knn

    knn_pts = pts.select("url", "lon", "lat")
    # localCheckpoint, not cache(): the warm section's clearCache() would
    # evict a catalog cache and the timed run would silently regenerate
    # the limit() subset per subtree — nondeterministic AND mis-timed
    knn_q = (knn_pts
             .where(~((F.col("lat").between(40.4, 41.0))
                      & (F.col("lon").between(-74.6, -73.4))))
             .select(F.xxhash64("url").alias("qid"),
                     (F.col("lon") + 0.01).alias("lon"),
                     (F.col("lat") + 0.005).alias("lat"))
             .limit(200_000).localCheckpoint())  # eager, outside the timing
    # zoom scaled to corpus density (~6 uniform points per cell, the z8
    # operating point measured at sf0.1); broadcast_threshold forced low
    # so the shuffle-hash + re-ring path runs at EVERY sf (the small-|Q|
    # broadcast path skips re-ring and would fall through to an
    # |unproven| x |P| brute join on sparse corpora)
    import math
    knn_z = max(4, round(0.5 * math.log2(max(0.8 * n, 12) / 6)))
    # codegen warm at tiny scale, mirroring the per-query warm protocol
    # (same try/except discipline: a warm-only failure must not kill the
    # bench after the multi-minute headline was already measured)
    try:
        warm_pts = pages.with_coords(pages.pages_df(spark, 5_000)) \
            .select("url", "lon", "lat")
        warm_q = warm_pts.select(F.xxhash64("url").alias("qid"), "lon", "lat") \
            .limit(2_000)
        warm_out = knn_cells(warm_pts, warm_q, 5, z=5, ring=1,
                             broadcast_threshold=100)
        warm_out.write.format("noop").mode("overwrite").save()
        unpersist_knn(warm_out)
    except Exception:
        pass  # warm-up only; the timed run below surfaces real failures
    spark.catalog.clearCache()
    probe_walls.append(canary())
    t0 = time.perf_counter()
    knn_out = knn_cells(knn_pts, knn_q, 5, z=knn_z, ring=1,
                        broadcast_threshold=10_000)
    knn_out.write.format("noop").mode("overwrite").save()
    queries["knn_cells_200k_shufflehash"] = round(time.perf_counter() - t0, 3)
    unpersist_knn(knn_out)
    spark.catalog.clearCache()
    probe_walls.append(canary())
    per_query_probe["knn_cells_200k_shufflehash"] = max(probe_walls[-2:])

    print(json.dumps({
        "metric": "full_pyramid_build_wall",
        "value": round(wall, 3),
        "unit": "sec",
        "sf": sf,
        "cpus": CPUS,
        "box_probe": box_probe,
        "protocol": {"headline": "min of >=2 builds (fresh-JVM JIT excluded; "
                                 "extra attempts if the box probe is hot)",
                     "queries": "warmed at sf0.001, timed once at sf",
                     "headline_walls": [round(w, 3) for w in walls]},
        "tiles_per_sec": round(total_tiles / wall, 1),
        "pyramid": {"levels": len(manifests), "total_tiles": total_tiles,
                    "points": n, "base_cell_zoom": max(manifests),
                    "min_cell_zoom": min(manifests)},
        "queries": queries,
        # mid-run noise detector: probe_walls is the canary series (one
        # reading per ~10 queries); per_query_probe stamps each query with
        # the worse of its two bracketing canaries.  The contamination
        # reference is max(run minimum, the canary's measured quiet-box
        # ceiling) — relative-to-min alone over-flags a uniformly-drifting
        # run (the headline box probe already gates the uniform case; this
        # detector exists for MID-RUN spikes).
        "query_probes": {
            "probe_walls": probe_walls,
            "per_query_probe": per_query_probe,
            "canary_quiet_ceiling": CANARY_QUIET_CEIL,
            "contaminated_queries": sorted(
                q for q, p in per_query_probe.items()
                if p > 1.5 * max(min(probe_walls), CANARY_QUIET_CEIL)),
        },
    }))


if __name__ == "__main__":
    main()
