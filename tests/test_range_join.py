"""Bucketed range join: containment correctness vs a naive inequality
join, no BroadcastNestedLoopJoin in the plan, boundary semantics
(start inclusive, end exclusive), and keyed attribution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mlops_realtime_data_ingestion_spark.operators.relational import range_join
from mlops_realtime_data_ingestion_spark.sources.batch import load_table


def test_matches_naive_inequality_join(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    points = ev.select("ts", "event_id")
    intervals = (
        ev.filter(F.col("event_type") == "signup")
        .limit(20)
        .select(
            F.col("event_id").alias("iv_id"),
            F.col("ts").alias("w_start"),
            (F.col("ts") + F.expr("INTERVAL 3 HOURS")).alias("w_end"),
        )
    )
    got = {
        (r.event_id, r.iv_id)
        for r in range_join(
            points, intervals, "ts", "w_start", "w_end", bucket_seconds=3600
        ).collect()
    }
    naive = {
        (r.event_id, r.iv_id)
        for r in points.join(
            intervals,
            (points.ts >= intervals.w_start) & (points.ts < intervals.w_end),
        ).collect()
    }
    assert got == naive and len(got) > 0


def test_no_nested_loop_join(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    points = ev.select("ts", "event_id")
    intervals = ev.limit(5).select(
        F.col("event_id").alias("iv_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("w_end"),
    )
    plan = (
        range_join(points, intervals, "ts", "w_start", "w_end")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan


def test_boundaries_inclusive_exclusive(spark):
    points = spark.createDataFrame(
        [(i, f"2024-01-01 0{i}:00:00") for i in range(4)],
        "pid long, ts_s string",
    ).select("pid", F.to_timestamp("ts_s").alias("ts"))
    intervals = spark.createDataFrame(
        [(100, "2024-01-01 01:00:00", "2024-01-01 03:00:00")],
        "iv_id long, s string, e string",
    ).select(
        "iv_id",
        F.to_timestamp("s").alias("w_start"),
        F.to_timestamp("e").alias("w_end"),
    )
    got = sorted(
        r.pid
        for r in range_join(
            points, intervals, "ts", "w_start", "w_end", bucket_seconds=1800
        ).collect()
    )
    assert got == [1, 2]  # start inclusive, end exclusive


def test_key_cols_restrict_matches(spark):
    points = spark.createDataFrame(
        [(1, "2024-01-01 01:30:00"), (2, "2024-01-01 01:30:00")],
        "user_id long, ts_s string",
    ).select("user_id", F.to_timestamp("ts_s").alias("ts"))
    intervals = spark.createDataFrame(
        [(1, 7, "2024-01-01 01:00:00", "2024-01-01 02:00:00")],
        "user_id long, iv_id long, s string, e string",
    ).select(
        "user_id",
        "iv_id",
        F.to_timestamp("s").alias("w_start"),
        F.to_timestamp("e").alias("w_end"),
    )
    rows = range_join(
        points, intervals, "ts", "w_start", "w_end", key_cols=["user_id"]
    ).collect()
    assert [(r.user_id, r.iv_id) for r in rows] == [(1, 7)]


def test_overlapping_columns_rejected(spark):
    df = spark.createDataFrame([(1,)], "x long").withColumn(
        "ts", F.current_timestamp()
    )
    with pytest.raises(ValueError, match="disjoint"):
        range_join(df, df, "ts", "ts", "ts")
