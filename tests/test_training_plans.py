"""Plan-shape tests for the training-data and scale operators — same
discipline as the TPC-H plan tests: assert the plan Catalyst produced
is the one that survives 100 TB, not just that values match."""

from __future__ import annotations

from mlops_realtime_data_ingestion_spark.plans import (
    timeseries_queries as ts,
    training_queries as tr,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_decontam_broadcasts_benchmark_side(spark, sf_dir):
    """The benchmark shingle set must be the broadcast side — the
    corpus side (the 100 TB side) may only shuffle its per-doc
    partial aggregates."""
    plan = _plan(tr.decontam_ngram_overlap(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    # left outer broadcast: corpus rows stream past the bench set
    assert "LeftOuter, BuildRight" in plan


def test_split_and_sample_have_no_shuffle(spark, sf_dir):
    """Hash split is a pure projection; stratified sampling only adds
    a broadcast join — neither may exchange the corpus."""
    split_plan = _plan(tr.split_hash_assign(spark, sf_dir))
    assert "Exchange" not in split_plan
    sample_plan = _plan(tr.sample_stratified(spark, sf_dir))
    assert "BroadcastHashJoin" in sample_plan
    assert "Exchange hashpartitioning" not in sample_plan


def test_rolling_time_range_single_exchange(spark, sf_dir):
    """One shuffle on the key; the RANGE frame rides the sorted
    partition."""
    plan = _plan(ts.wf_rolling_time_range(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "specifiedwindowframe(RangeFrame" in plan


def test_sessionize_reuses_one_sort(spark, sf_dir):
    """lag, running sum, and the session aggregate all share the same
    (user_id)-partitioned sort — one hash exchange total."""
    plan = _plan(ts.sessionize_events(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1
