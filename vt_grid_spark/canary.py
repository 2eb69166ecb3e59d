"""The box-health canary shared by bench.py and the probe scripts.

ONE definition, because the canary's exact workload IS the calibration:
the documented quiet band (0.51-0.65 s over 10 post-warm reps on this
host, BASELINE.md round 5) is only meaningful while every script times
the identical job.  Compute-bound by design — chained xxhash64 over
spark.range, no IO, no shuffle, 64 tasks — so hypervisor-neighbor steal
shows proportionally (a scheduling-dominated probe had ~1.7x quiet
spread and false-flagged half a bench run).
"""

from __future__ import annotations

import time

CANARY_EXPR = "bit_xor(" + "xxhash64(" * 5 + "id" + ")" * 5 + ")"
CANARY_ROWS = 512_000_000
CANARY_TASKS = 64
# measured quiet-box band ceiling (post-warm); anchors contamination gates
CANARY_QUIET_CEIL = 0.65


def canary(spark) -> float:
    """One timed canary rep (seconds)."""
    t0 = time.perf_counter()
    spark.range(0, CANARY_ROWS, 1, CANARY_TASKS) \
        .selectExpr(CANARY_EXPR).collect()
    return round(time.perf_counter() - t0, 3)


def warm_canary(spark) -> None:
    """The 2 warm reps every protocol runs first: the first pays codegen,
    the second the JIT tail."""
    canary(spark)
    canary(spark)
