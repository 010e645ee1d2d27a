"""Round-5 operator unit tests: EWMA smoothing, CDC chunking is in
test_curation.py, best-quality dedup survivors in
test_training_plans-adjacent tests below."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mlops_realtime_data_ingestion_spark.operators.timeseries import ewma_smooth


def test_ewma_matches_pandas_adjusted(spark):
    """For a series shorter than the lag cap, the operator IS
    pandas ewm(alpha=1/2, adjust=True) — same weights, exact
    arithmetic."""
    vals = [10.0, 12.5, 11.25, 14.0, 9.75, 13.0]
    rows = [(1, i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "value"]).withColumn(
        "ts", F.to_timestamp(F.lit("2024-01-01 00:00:00")) + F.make_interval(secs=F.col("event_id"))
    )
    out = (
        ewma_smooth(df, ["user_id"], "ts", "value", lags=20, tiebreak_col="event_id")
        .orderBy("event_id")
        .collect()
    )
    expect = pd.Series(vals).ewm(alpha=0.5, adjust=True).mean()
    for r, e in zip(out, expect):
        assert r["ewma"] == pytest.approx(e, abs=1e-9)


def test_ewma_deterministic_under_repartition(spark):
    rows = [(u, i, float((u * 7 + i * 3) % 50) / 4) for u in range(5) for i in range(40)]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "value"]).withColumn(
        "ts", F.to_timestamp(F.lit("2024-01-01")) + F.make_interval(secs=F.col("event_id"))
    )
    a = ewma_smooth(df, ["user_id"], "ts", "value", lags=20, tiebreak_col="event_id")
    b = ewma_smooth(
        df.repartition(13), ["user_id"], "ts", "value", lags=20, tiebreak_col="event_id"
    )
    ka = {(r["user_id"], r["event_id"]): r["ewma"] for r in a.collect()}
    kb = {(r["user_id"], r["event_id"]): r["ewma"] for r in b.collect()}
    assert ka == kb  # bit-identical, not approx


def test_ewma_truncation_window(spark):
    """Past the lag cap the oldest terms drop: with lags=3 the
    smoother only sees the last 3 points (w = 4,2,1)."""
    vals = [100.0, 1.0, 2.0, 3.0]
    rows = [(1, i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "value"]).withColumn(
        "ts", F.to_timestamp(F.lit("2024-01-01")) + F.make_interval(secs=F.col("event_id"))
    )
    out = (
        ewma_smooth(df, ["user_id"], "ts", "value", lags=3, tiebreak_col="event_id")
        .orderBy("event_id")
        .collect()
    )
    # t=3: (4*3 + 2*2 + 1*1) / 7 — the 100.0 head is outside the cap
    assert out[3]["ewma"] == pytest.approx((4 * 3 + 2 * 2 + 1 * 1) / 7.0, abs=1e-12)


def test_survivors_best_scored_keeps_argmax_not_min_id(spark):
    """In a near-dup group where the best doc has the HIGHER id, the
    quality-aware selection keeps it (min-id canonical would not);
    ties fall back to min id; out-of-component docs pass through."""
    from mlops_realtime_data_ingestion_spark.operators.training_data import (
        survivors_best_scored,
    )

    docs = spark.createDataFrame(
        [(1, 3), (2, 9), (3, 9), (10, 5)], ["doc_id", "score"]
    )
    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], ["doc_id", "component_id"]
    )
    kept = sorted(
        r["doc_id"] for r in survivors_best_scored(docs, comp).collect()
    )
    # group {1,2,3}: scores 3,9,9 -> tie between 2 and 3 -> keep 2
    assert kept == [2, 10]


def test_sliding_passages_coverage_and_overlap(spark):
    """Total coverage (every token in >= 1 passage), clamped last
    window, stride overlap, and short docs -> exactly one passage."""
    from mlops_realtime_data_ingestion_spark.operators.text import (
        sliding_passages,
    )

    long_doc = " ".join(f"t{i}" for i in range(97))
    df = spark.createDataFrame(
        [(1, long_doc), (2, "just a few words")], ["doc_id", "text"]
    )
    out = sliding_passages(df, window=64, stride=32).collect()
    p1 = sorted(
        [r for r in out if r["doc_id"] == 1], key=lambda r: r["passage_seq"]
    )
    # the tail window BACK-SHIFTS onto the doc end (round 6, ADVICE
    # r5): [34,97], not a truncated [65,97]
    assert [(r["start_tok"], r["end_tok"]) for r in p1] == [
        (1, 64), (33, 96), (34, 97)
    ]
    assert p1[2]["passage_text"].split() == [f"t{i}" for i in range(33, 97)]
    p2 = [r for r in out if r["doc_id"] == 2]
    assert len(p2) == 1 and (p2[0]["start_tok"], p2[0]["end_tok"]) == (1, 4)


def test_hll_set_ops_planted_overlap(spark):
    """Cohorts A = {0..599}, B = {400..999}: union 1000, intersect
    200. With p=10 the small-range linear-counting regime is
    near-exact — every estimate within 5%, and the exact intersect
    column is exact."""
    from mlops_realtime_data_ingestion_spark.operators.sketches import (
        hll_set_ops,
    )

    rows = [(u, "a") for u in range(600)] + [(u, "b") for u in range(400, 1000)]
    df = spark.createDataFrame(rows, ["user_id", "lbl"])
    r = hll_set_ops(df, "user_id", "lbl", "a", "b", p=10).collect()[0]
    assert r["exact_intersect"] == 200
    assert abs(r["hll_a"] - 600) / 600 < 0.05
    assert abs(r["hll_b"] - 600) / 600 < 0.05
    assert abs(r["hll_union"] - 1000) / 1000 < 0.05
    assert abs(r["hll_intersect"] - 200) / 200 < 0.25  # I-E amplifies error
    assert r["hll_union"] >= max(r["hll_a"], r["hll_b"]) - 1e-9
