"""Stateful streaming: gap-timeout sessionization of the events stream.

The reference is pure batch (SURVEY.md §2.8); this is the engine's custom
STATEFUL streaming operator, built on ``applyInPandasWithState`` with an
event-time timeout — the Structured-Streaming surface for operators the
built-in windowed aggregations can't express.

Two forms with identical semantics (the unification contract, like
streaming/events.py):

  * ``sessionize_batch`` — window functions: a session breaks where the
    per-user inter-event gap exceeds ``gap_s``; pure Catalyst, DuckDB-
    oracle-checkable (lag / running sum are ANSI SQL).
  * ``sessionize_stream`` — per-user GroupState carries the OPEN session
    (start, last, n, Σvalue); closed sessions emit in append mode either
    when a newer event breaks the gap or when the event-time watermark
    passes ``last + gap`` (GroupStateTimeout.EventTimeTimeout).

State is O(1) per active user — the canonical bounded-state design for an
unbounded stream.  The handler loops over SESSIONS (numpy gap-split), not
rows.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_SCHEMA = ("user_id long, session_start timestamp, "
                  "session_end timestamp, n_events long, sum_value double")
_STATE_SCHEMA = "start_us long, last_us long, n long, sv double"


def sessionize_batch(events: DataFrame, gap_s: int = 14400) -> DataFrame:
    """(user_id, session_start, session_end, n_events, sum_value) — a new
    session starts where the gap to the previous event exceeds gap_s.
    Gap math in integer microseconds (exact cross-engine)."""
    e = events.withColumn("ts", F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts")
    us = F.unix_micros(F.col("ts"))
    brk = F.when(us - F.unix_micros(F.lag("ts").over(w)) > gap_s * 1_000_000,
                 1).otherwise(0)
    sess = (
        e.withColumn("_brk", brk)
        .withColumn("_sid", F.sum("_brk").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    return (
        sess.groupBy("user_id", "_sid")
        .agg(F.min("ts").alias("session_start"), F.max("ts").alias("session_end"),
             F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 6).alias("sum_value"))
        .drop("_sid")
    )


def _session_handler(gap_s: int):
    gap_us = gap_s * 1_000_000

    def fn(key, pdf_iter, state):
        import pandas as pd

        parts = [pdf[["ts", "value"]] for pdf in pdf_iter]
        parts = [p for p in parts if len(p)]  # timed-out groups get empty frames
        out: list[tuple] = []
        if parts:
            batch = pd.concat(parts).sort_values("ts")
            ts_us = batch["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            vals = batch["value"].to_numpy(dtype=np.float64)
            # Treat each event as a point interval and the stored OPEN
            # session as a spanning interval, then gap-merge the sorted set.
            # Late in-watermark events (older than the stored `last`) may
            # precede, fall inside, or extend the stored session; comparing
            # only the batch head against `last` (the old code) regressed
            # session_end backwards and diverged from sessionize_batch.
            starts, ends = ts_us, ts_us
            ns = np.ones(len(ts_us), dtype=np.int64)
            svs = vals
            if state.exists:
                s0, l0, n0, sv0 = state.get
                starts = np.append(starts, s0)
                ends = np.append(ends, l0)
                ns = np.append(ns, n0)
                svs = np.append(svs, sv0)
                order = np.argsort(starts, kind="stable")
                starts, ends = starts[order], ends[order]
                ns, svs = ns[order], svs[order]
            cummax_end = np.maximum.accumulate(ends)
            brk = np.nonzero(starts[1:] - cummax_end[:-1] > gap_us)[0] + 1
            bounds = np.concatenate([[0], brk, [len(starts)]])
            for a, b in zip(bounds[:-1], bounds[1:]):  # per session, not per row
                st, en = int(starts[a]), int(cummax_end[b - 1])
                n, sv = int(ns[a:b].sum()), float(svs[a:b].sum())
                if b < len(starts):
                    out.append((st, en, n, sv))
                else:
                    state.update((st, en, n, sv))
                    # fire once the watermark passes last + gap; clamp above
                    # the current watermark (a group already behind it would
                    # otherwise set an invalid timeout — it then fires next batch)
                    timeout_ms = max(en // 1000 + gap_s * 1000,
                                     state.getCurrentWatermarkMs() + 1)
                    state.setTimeoutTimestamp(timeout_ms)
        elif state.hasTimedOut and state.exists:
            s0, l0, n0, sv0 = state.get
            out.append((s0, l0, n0, sv0))
            state.remove()
        if out:
            df = pd.DataFrame(out, columns=["s", "e", "n", "sv"])
            yield pd.DataFrame({
                "user_id": int(key[0]),
                "session_start": pd.to_datetime(df["s"], unit="us"),
                "session_end": pd.to_datetime(df["e"], unit="us"),
                "n_events": df["n"].astype("int64"),
                "sum_value": df["sv"].round(6),
            })

    return fn


def sessionize_stream(events: DataFrame, gap_s: int = 14400,
                      watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of :func:`sessionize_batch` (append mode): emits each
    session exactly once, when it is provably closed under the watermark."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    e = (events.withColumn("ts", F.col("ts").cast("timestamp"))
               .withWatermark("ts", watermark))
    return e.groupBy("user_id").applyInPandasWithState(
        _session_handler(gap_s), SESSION_SCHEMA, _STATE_SCHEMA,
        "append", GroupStateTimeout.EventTimeTimeout)
