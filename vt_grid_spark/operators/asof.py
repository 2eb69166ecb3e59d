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
  3. one window per key ordered by (ts, tag): ``last(match_struct,
     ignoreNulls)`` over unbounded-preceding rows carries the most recent
     right ROW forward as ONE struct (never per-column — per-column
     last(ignorenulls) would let a NULL field in the matched row keep a
     staler row's non-null value, mixing values from different right
     rows and diverging from ASOF semantics);
  4. keep the left rows and project the struct fields out.

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
    if not rcols:
        raise ValueError(
            "asof_join needs at least one right value column to carry: "
            "right_cols is empty (or the right side has only the key and "
            "timestamp columns) — pass right_cols explicitly or add a "
            "value column to the right DataFrame")
    tb = tiebreaker or rcols[0]
    carried = [f"{prefix}{c}" for c in rcols] + [f"{prefix}{right_ts}"]

    clash = [c for c in {"_t", "_is_r", "_rmatch", *carried}
             if c in left.columns]
    if clash:
        raise ValueError(
            f"asof_join internal/output column names {sorted(clash)} "
            "collide with left columns — rename them on the left side or "
            "pass a different prefix")
    if right_ts in rcols:
        raise ValueError(
            f"right_cols must not contain the right timestamp column "
            f"{right_ts!r} — it is always carried as {prefix}{right_ts} "
            "and listing it too would emit a duplicate output column")
    if "__rts" in rcols:
        raise ValueError(
            "right_cols must not contain '__rts' — reserved for the "
            "carried right-timestamp struct field")

    # 1. deterministic right side: one row per (key, ts), max tiebreaker;
    # the whole matched row rides in ONE struct (field __rts = right ts),
    # non-null for every right row, absent (null) for left rows.
    r1 = (right.groupBy(key, right_ts)
          .agg(F.max_by(F.struct(*rcols), F.col(tb)).alias("_r"))
          .select(key, F.col(right_ts).alias("_t"),
                  F.struct(*[F.col(f"_r.{c}").alias(c) for c in rcols],
                           F.col(right_ts).alias("__rts")).alias("_rmatch"))
          .withColumn("_is_r", F.lit(1)))

    lcols = left.columns
    l1 = left.withColumn("_t", F.col(left_ts)).withColumn("_is_r", F.lit(0))
    # allowMissingColumns: left rows get a typed-null _rmatch, right rows
    # get typed-null left data columns.
    u = l1.unionByName(r1, allowMissingColumns=True)

    # 3. carry the latest right ROW forward; right rows sort first at
    # equal _t (desc on the tag), giving right_ts <= left_ts inclusively
    w = (Window.partitionBy(key)
         .orderBy(F.col("_t").asc(), F.col("_is_r").desc())
         .rowsBetween(Window.unboundedPreceding, 0))
    out = (u.withColumn("_rmatch", F.last("_rmatch", ignorenulls=True).over(w))
           .where(F.col("_is_r") == 0))
    return out.select(
        *lcols,
        *[F.col(f"_rmatch.{c}").alias(f"{prefix}{c}") for c in rcols],
        F.col("_rmatch.__rts").alias(f"{prefix}{right_ts}"))
