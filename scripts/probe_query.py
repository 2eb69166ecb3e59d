"""Dedicated bracketed probe for one (or more) registered bench queries.

Runs NAME with the same protocol as bench.py (codegen warm at sf0.001,
timed at $SPARK_GRAFT_SF_DIR) but in a fresh session with nothing else in
the block manager, bracketed by the compute-bound canary before and
after — the apples-to-apples twin of a BENCH_r{N}.json entry, used to
reconcile in-bench walls against dedicated walls (VERDICT r4 #2).

    python scripts/probe_query.py dedup_clusters [more names...] [--reps 2]

Prints one JSON line per query:
  {"query": ..., "walls": [...], "probe_before": s, "probe_after": s}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main(argv: list[str]) -> int:
    reps = 2
    if "--reps" in argv:
        i = argv.index("--reps")
        if i + 1 >= len(argv):
            print("usage: probe_query.py [query ...] [--reps N]",
                  file=sys.stderr)
            return 2
        try:
            reps = int(argv[i + 1])
        except ValueError:
            print(f"--reps expects an integer, got {argv[i + 1]!r}",
                  file=sys.stderr)
            return 2
        argv = argv[:i] + argv[i + 2:]
    names = argv or ["dedup_clusters"]

    import __spark_entry__ as entrymod
    from vt_grid_spark.canary import warm_canary
    from vt_grid_spark.canary import canary as _canary
    from vt_grid_spark.session import get_spark

    spark = get_spark("vt-grid-probe", cores=CPUS)
    qs = entrymod.queries()

    def canary() -> float:
        return _canary(spark)

    warm_canary(spark)
    for name in names:
        fn = qs[name]
        try:
            fn(spark, "/root/testdata/sf0.001") \
                .write.format("noop").mode("overwrite").save()
        except Exception:
            pass
        spark.catalog.clearCache()
        before = canary()
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        after = canary()
        print(json.dumps({"query": name, "sf": SF_DIR.rsplit("/", 1)[-1],
                          "cpus": CPUS, "walls": walls,
                          "probe_before": before, "probe_after": after}))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
