"""Regenerate PLANS.md: annotated physical plans for the headline
operators — the evidence that the shapes claimed in README "Scale design"
are the shapes Catalyst actually runs.

    python scripts/plan_audit.py 2>/dev/null   # rewrites PLANS.md
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"

# query -> what the plan must show (rendered above each plan)
AUDITS = {
    "cell_encode_z12": (
        "Base-level encode+aggregate. Look for: lon/lat arithmetic inside "
        "WholeStageCodegen (no Python); ONE Exchange hashpartitioning on "
        "integer (x, y) — quadkey is derived AFTER the agg, so the shuffle "
        "carries two longs, not strings; partial_count/partial_sum above "
        "the scan (map-side combine)."),
    "pyramid_rollup_z6": (
        "One rollup level. Look for: groupBy on shiftright(x,1)/"
        "shiftright(y,1) integer parent keys; a single Exchange per level; "
        "partial aggregation before it."),
    "pip_rect_join": (
        "Point-in-polygon join. Look for: BroadcastHashJoin on the "
        "polygon COVER only (the provably-small side); the fact table "
        "never shuffles for the join; exactly one ArrowEvalPython "
        "(the refine kernel) fed by the single joined stream — full-cell "
        "rows short-circuit INSIDE the kernel, so no double scan."),
    "minhash_dup_pairs": (
        "LSH near-dup pairs. Look for (r6 shape): NO BroadcastExchange "
        "anywhere (corpus-sized tables shuffle on id keys — "
        "ShuffledHashJoin); the FINAL plan is only the refine joins over "
        "`Scan ExistingRDD` leaves — the signature table, candidate pair "
        "list and semi-joined shingle sets are localCheckpointed seams, "
        "so the scan+shingle+md5 pipeline runs once per seam instead of "
        "the r5 plan's 22 parquet scans (the band self-join, prefilter "
        "and distinct run inside the candidate seam's own job)."),
    "decontaminate_overlap": (
        "Train/eval k-gram overlap. Look for: shingle explode scan-side "
        "(Generate under the scan, narrow); ShuffledHashJoin on the "
        "shingle for both the df-cap semi-join and the eval join — no "
        "broadcast; map-side partial count before the (train_id, eval_id) "
        "aggregation."),
    "knn_top10": (
        "Exact kNN, both strategies. Look for (r6 shape): the "
        "ring-candidate join feeding an ObjectHashAggregate top-k "
        "(collect_list + array_sort + slice — no Sort+Window chain over "
        "the candidate relation); the safety-radius prefilter as a "
        "Filter (d2 < _bd2) in the join stage; the brute twin broadcasts "
        "only the tiny query table and runs the salted two-phase "
        "aggregation (two HashAggregate pairs, no per-query Window "
        "sort)."),
}


def main() -> int:
    import __spark_entry__ as e
    from vt_grid_spark.session import get_spark

    spark = get_spark("plan-audit", cores=8)
    qs = e.queries()
    out = [
        "# PLANS — annotated physical plans (regenerate: "
        "`python scripts/plan_audit.py`)",
        "",
        "Spark `explain('simple')` output at sf0.001 for the headline "
        "operators, each annotated with the properties the plan must "
        "exhibit (machine-asserted versions of most of these live in "
        "tests/test_physical_plans.py — this file is the human-readable "
        "evidence).",
    ]
    for name, note in AUDITS.items():
        df = qs[name](spark, SF)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
        # strip volatile ids so regeneration diffs stay reviewable
        plan = re.sub(r"#\d+L?", "#_", plan)
        plan = re.sub(r"plan_id=\d+", "plan_id=_", plan)
        lines = plan.rstrip().split("\n")
        if len(lines) > 150:
            # the static knn plan contains every escalation level the
            # runtime residue counts short-circuit — keep the head, which
            # holds the strategy-defining joins
            lines = lines[:150] + [
                f"... ({len(lines) - 150} more lines — the remaining "
                "escalation levels repeat the same join shape; runtime "
                "short-circuits them via residue counts)"]
        out += ["", f"## {name}", "", note, "", "```", "\n".join(lines), "```"]
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
