"""As-of join: hand-built semantics fixture + plan shape."""

from pyspark.sql import functions as F

from vt_grid_spark.operators.asof import asof_join


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema).withColumn(
        "ts", F.to_timestamp("ts"))


def test_asof_semantics(spark):
    d = "2024-01-01 "
    left = _df(spark, [
        (1, 10, d + "10:00:00"),   # matches r at 09:30
        (2, 10, d + "11:00:00"),   # matches r at 11:00 (inclusive >=)
        (3, 10, d + "09:00:00"),   # no right row at or before -> null
        (4, 20, d + "12:00:00"),   # other key: matches 20's only row
        (5, 30, d + "12:00:00"),   # key with no right rows at all
    ], "event_id long, user_id long, ts string")
    right = _df(spark, [
        (100, 10, d + "09:30:00"),
        (101, 10, d + "11:00:00"),
        (102, 10, d + "11:00:00"),  # equal-ts duplicate: max id wins
        (103, 10, d + "11:30:00"),  # later than every left row but #2? no: after 11:00
        (200, 20, d + "07:00:00"),
    ], "event_id long, user_id long, ts string")

    out = {r.event_id: (r.r_event_id, str(r.r_ts) if r.r_ts else None)
           for r in asof_join(left, right, key="user_id",
                              right_cols=["event_id"], prefix="r_").collect()}
    assert out[1] == (100, d + "09:30:00")
    assert out[2] == (102, d + "11:00:00")  # inclusive + dedupe to max id
    assert out[3] == (None, None)
    assert out[4] == (200, d + "07:00:00")
    assert out[5] == (None, None)


def test_asof_plan_one_shuffle_no_broadcast(spark):
    from tests.test_physical_plans import plan_str

    left = spark.range(1000).select(
        F.col("id").alias("event_id"), F.pmod("id", F.lit(10)).alias("user_id"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"))
    right = spark.range(500).select(
        F.col("id").alias("event_id"), F.pmod("id", F.lit(10)).alias("user_id"),
        F.timestamp_seconds(F.col("id") * 97).alias("ts"))
    out = asof_join(left, right, key="user_id", right_cols=["event_id"])
    p = plan_str(out, "simple")
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p
    # the window's key exchange + the right-side dedupe aggregation's —
    # never a per-key cross product
    assert p.count("Exchange") <= 3
    assert "Window" in p


def test_asof_null_right_field_stays_null(spark):
    """ASOF returns the MATCHED row's value, NULL included: a NULL field
    in the matched right row must not inherit a staler row's non-null
    value (the per-column last(ignorenulls) bug — the whole right row is
    carried as one struct)."""
    d = "2024-01-01 "
    left = _df(spark, [(1, 10, d + "12:00:00")],
               "event_id long, user_id long, ts string")
    right = spark.createDataFrame(
        [(100, "stale", 10, d + "09:00:00"),
         (101, None, 10, d + "11:00:00")],   # the as-of match; label NULL
        "event_id long, label string, user_id long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))

    row = asof_join(left, right, key="user_id",
                    right_cols=["event_id", "label"],
                    tiebreaker="event_id").collect()[0]
    assert row.r_event_id == 101
    assert row.r_label is None          # NOT "stale"
    assert str(row.r_ts) == d + "11:00:00"


def test_asof_left_column_collision_raises(spark):
    import pytest

    left = spark.range(3).select(
        F.col("id").alias("user_id"), F.col("id").alias("r_event_id"),
        F.timestamp_seconds(F.col("id")).alias("ts"))
    right = spark.range(3).select(
        F.col("id").alias("user_id"), F.col("id").alias("event_id"),
        F.timestamp_seconds(F.col("id")).alias("ts"))
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, key="user_id", right_cols=["event_id"])


def test_asof_right_ts_in_right_cols_raises(spark):
    import pytest

    left = spark.range(3).select(
        F.col("id").alias("user_id"),
        F.timestamp_seconds(F.col("id")).alias("ts"))
    right = spark.range(3).select(
        F.col("id").alias("user_id"), F.col("id").alias("event_id"),
        F.timestamp_seconds(F.col("id")).alias("ts"))
    with pytest.raises(ValueError, match="right timestamp"):
        asof_join(left, right, key="user_id", right_cols=["event_id", "ts"])
    with pytest.raises(ValueError, match="__rts"):
        asof_join(left, right.withColumnRenamed("event_id", "__rts"),
                  key="user_id", right_cols=["__rts"])
