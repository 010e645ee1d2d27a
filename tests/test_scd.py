"""SCD type-2 operators: history build and incremental merge."""

from __future__ import annotations

from pyspark.sql import functions as F

from mlops_realtime_data_ingestion_spark.operators.scd import scd2_build, scd2_merge


def _changes(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, ts long")


def test_scd2_build_intervals_and_current_flag(spark):
    df = _changes(spark, [(1, "a", 10), (1, "b", 20), (1, "c", 30), (2, "x", 15)])
    out = {(r.k, r.valid_from): r for r in scd2_build(
        df, ["k"], "ts", ["v"]).collect()}
    assert out[(1, 10)].valid_to == 20 and not out[(1, 10)].is_current
    assert out[(1, 20)].valid_to == 30
    assert out[(1, 30)].valid_to is None and out[(1, 30)].is_current
    assert out[(2, 15)].valid_to is None and out[(2, 15)].is_current


def test_scd2_merge_closes_open_rows_and_keeps_history(spark):
    base = scd2_build(
        _changes(spark, [(1, "a", 10), (1, "b", 20), (2, "x", 15)]),
        ["k"], "ts", ["v"],
    )
    updates = _changes(spark, [(1, "c", 30), (3, "new", 5)])
    merged = scd2_merge(base, updates, ["k"], "ts", ["v"])
    rows = {(r.k, r.valid_from): r for r in merged.collect()}
    # untouched closed row passes through
    assert rows[(1, 10)].valid_to == 20 and not rows[(1, 10)].is_current
    # previously-open row is closed by the update
    assert rows[(1, 20)].valid_to == 30 and not rows[(1, 20)].is_current
    assert rows[(1, 30)].valid_to is None and rows[(1, 30)].is_current
    # key with no update keeps its open row
    assert rows[(2, 15)].valid_to is None and rows[(2, 15)].is_current
    # brand-new key appears open
    assert rows[(3, 5)].valid_to is None and rows[(3, 5)].is_current
    assert len(rows) == 5


def test_scd2_point_in_time_lookup(spark):
    hist = scd2_build(
        _changes(spark, [(1, "a", 10), (1, "b", 20), (1, "c", 30)]),
        ["k"], "ts", ["v"],
    )
    at_25 = hist.filter(
        (F.col("valid_from") <= 25)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > 25))
    ).collect()
    assert len(at_25) == 1 and at_25[0].v == "b"


def test_scd2_merge_idempotent_reapply(spark):
    """At-least-once safety: re-delivering the same update batch is a
    no-op (the merge dedups the combined change log)."""
    base = scd2_build(_changes(spark, [(1, "a", 10)]), ["k"], "ts", ["v"])
    up = _changes(spark, [(1, "b", 20)])
    once = scd2_merge(base, up, ["k"], "ts", ["v"])
    twice = scd2_merge(once, up, ["k"], "ts", ["v"])
    a = sorted((r.k, r.valid_from, r.valid_to, r.v, r.is_current) for r in once.collect())
    b = sorted((r.k, r.valid_from, r.valid_to, r.v, r.is_current) for r in twice.collect())
    assert a == b
