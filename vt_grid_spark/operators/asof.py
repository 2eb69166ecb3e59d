"""As-of join — for each left row, the right row with the greatest
right_ts <= left_ts in the same key group.

Spark has no native ASOF JOIN (DuckDB does, which is the oracle), and the
naive formulations die at scale: a range-condition join explodes to
O(|L| x |R|) per key before filtering, and a per-key collect serializes
the driver.  The scalable composition is the tagged-union window:

  1. dedupe the right side to one row per (key, ts) — max tiebreaker —
     so the match is deterministic (DuckDB's ASOF picks an arbitrary row
     among equal timestamps otherwise);
  2. union left and right rows with an ``is_right`` tag (right sorts
     FIRST at equal ts, giving the standard >= semantics);
  3. one window per key ordered by (ts, tag): ``last(right_col,
     ignoreNulls)`` over unbounded-preceding rows carries the most recent
     right values forward;
  4. keep the left rows.

Cost: ONE shuffle (the window partition), no broadcast, no key-size
assumptions — the same shape Flink's event-time joins and kdb's aj reduce
to.  Skewed keys behave like any window: a hot key is one partition's
sort, not a cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_ts: str = "ts", right_ts: str = "ts",
              right_cols: list[str] | None = None,
              tiebreaker: str | None = None,
              prefix: str = "r_") -> DataFrame:
    """left columns + ``prefix``-named right columns of the as-of match
    (null when no right row precedes the left row — left-join semantics).
    ``right_cols`` defaults to every right column except key/ts;
    ``tiebreaker`` (default: first right_col) dedupes equal timestamps."""
    rcols = right_cols or [c for c in right.columns
                           if c not in (key, right_ts)]
    tb = tiebreaker or rcols[0]

    # 1. deterministic right side: one row per (key, ts), max tiebreaker
    r1 = (right.groupBy(key, right_ts)
          .agg(F.max_by(F.struct(*rcols), F.col(tb)).alias("_r"))
          .select(key, F.col(right_ts).alias("_t"),
                  *[F.col(f"_r.{c}").alias(f"{prefix}{c}") for c in rcols]))
    r1 = (r1.withColumn(f"{prefix}{right_ts}", F.col("_t"))
          .withColumn("_is_r", F.lit(1)))
    carried = [f"{prefix}{c}" for c in rcols] + [f"{prefix}{right_ts}"]

    lcols = left.columns
    l1 = left.withColumn("_t", F.col(left_ts)).withColumn("_is_r", F.lit(0))
    for c in carried:
        l1 = l1.withColumn(c, F.lit(None))
    for c in lcols:
        if c not in r1.columns:
            r1 = r1.withColumn(c, F.lit(None))
    u = l1.select(key, "_t", "_is_r", *carried,
                  *[c for c in lcols if c != key]) \
        .unionByName(r1.select(key, "_t", "_is_r", *carried,
                               *[c for c in lcols if c != key]))

    # 3. carry the latest right values forward; right rows sort first at
    # equal _t (desc on the tag), giving right_ts <= left_ts inclusively
    w = (Window.partitionBy(key)
         .orderBy(F.col("_t").asc(), F.col("_is_r").desc())
         .rowsBetween(Window.unboundedPreceding, 0))
    out = u
    for c in carried:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out.where(F.col("_is_r") == 0).select(*lcols, *carried)
