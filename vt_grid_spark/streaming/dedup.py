"""Streaming exact dedup — keep the first arrival of each document
fingerprint, drop replays inside the dedup horizon.

A streaming training-data pipeline sees the same page repeatedly
(recrawls, mirror hosts, retry storms); this operator is the stream form
of ``operators/dedup.exact_dedup``: fingerprint = md5 of the normalized
text (the same normalization as ``textops.with_fingerprint``), then
``dropDuplicatesWithinWatermark`` on the fingerprint — Structured
Streaming keeps one state row per fingerprint and EVICTS it once the
event-time watermark passes, so state is bounded by the horizon's
distinct-fingerprint count rather than the stream's lifetime (an
unbounded ``dropDuplicates`` would grow forever at 10^12 docs).

Same-function batch/stream unification contract as streaming/events.py:
the batch twin keeps the earliest (ts, doc_id) row per fingerprint, and
the stream==batch test asserts equality when every replay arrives inside
the horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _with_fp(docs: DataFrame, text_col: str) -> DataFrame:
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), "\\s+", " "))
    return docs.withColumn("fp", F.md5(norm))


def dedup_stream(docs: DataFrame, text_col: str = "text",
                 ts_col: str = "ts", horizon: str = "1 hour") -> DataFrame:
    """Streaming form: first arrival per fingerprint within the horizon
    survives; state per fingerprint is dropped once the watermark passes
    ``horizon`` beyond its event time."""
    d = _with_fp(docs.withColumn(ts_col, F.col(ts_col).cast("timestamp")),
                 text_col)
    return d.withWatermark(ts_col, horizon) \
        .dropDuplicatesWithinWatermark(["fp"])


def dedup_batch(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text", ts_col: str = "ts") -> DataFrame:
    """Batch twin: earliest (ts, id) row per fingerprint — what the stream
    emits when replays arrive within the horizon."""
    d = _with_fp(docs.withColumn(ts_col, F.col(ts_col).cast("timestamp")),
                 text_col)
    w = Window.partitionBy("fp").orderBy(F.col(ts_col).asc(),
                                         F.col(id_col).asc())
    return (d.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1).drop("_rn"))
