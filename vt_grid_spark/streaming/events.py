"""Streaming cell aggregation over the events table.

The reference is pure batch; this is the engine's streaming extension:
events (event_id, ts, user_id, event_type, value, props) arrive as a
stream, are geotagged (synthetic deterministic coords from user_id —
stand-in for the geotag UDF), encoded into cells, and aggregated into
per-(window, cell) counts with a watermark for late data.

The same transformation function is applied to a batch DataFrame and a
readStream DataFrame — tests assert stream (availableNow) == batch, which
is Structured Streaming's unification contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vt_grid_spark.operators.encode import encode_points


def with_event_coords(events: DataFrame) -> DataFrame:
    """Deterministic synthetic coordinates from user_id (integer math).
    ts is normalized to TIMESTAMP (the testdata parquet carries NTZ, which
    watermarks reject; session TZ is pinned to UTC so the cast is exact)."""
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return events.withColumn(
        "lon", (F.lit(-180.0) + ((F.col("user_id") * 37) % 36000).cast("double") / 100.0)
    ).withColumn(
        "lat", (F.lit(-85.0) + ((F.col("user_id") * 53) % 17000).cast("double") / 100.0)
    )


def windowed_cell_counts(events: DataFrame, z: int = 6,
                         window: str = "1 day",
                         watermark: str = "1 hour") -> DataFrame:
    """(window_start, x, y, cnt, sum_value) per tumbling window and cell.

    Works identically on batch and streaming inputs; the watermark bounds
    state for the streaming case (late rows beyond it are dropped).
    """
    src = with_event_coords(events)
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
    enc = encode_points(src, z, with_quadkey=False)
    return (
        enc.groupBy(F.window("ts", window).alias("w"), "x", "y")
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "x", "y", "cnt", "sum_value")
    )


def run_stream_from_parquet(spark, parquet_path: str, schema, out_table: str,
                            z: int = 6) -> None:
    """availableNow streaming run over a parquet directory into an
    in-memory sink — the test/demo harness for the streaming path."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(parquet_path)
    )
    agg = windowed_cell_counts(stream, z=z)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory").queryName(out_table)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
