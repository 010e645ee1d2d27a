"""Plan-shape tests for the round-4 additions — the properties that
keep each plan viable at 100 TB, asserted on the executed plan."""

from __future__ import annotations

from mlops_realtime_data_ingestion_spark.plans import curation_queries as cq
from mlops_realtime_data_ingestion_spark.plans import extension_queries as xq
from mlops_realtime_data_ingestion_spark.plans import profiling_queries as pq
from mlops_realtime_data_ingestion_spark.plans import timeseries_queries as tq
from mlops_realtime_data_ingestion_spark.plans import training_queries as trq


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_skew_report_is_take_ordered(spark, sf_dir):
    """Top-10 heavy keys must come from a per-partition heap
    (TakeOrderedAndProject) and the one-row stats frame must ride a
    broadcast — never a full sort of the key space."""
    plan = _plan(pq.skew_report_lineitem(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_jl_projection_is_narrow(spark, sf_dir):
    """The JL sketch is a pure per-row projection: zero exchanges,
    zero Python."""
    plan = _plan(cq.embedding_jl_projection(spark, sf_dir))
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_zipf_fit_shuffles_vocab_not_corpus(spark, sf_dir):
    """The corpus-sized work is one partial-aggregated token count;
    the OLS fold runs on a top-k frame."""
    plan = _plan(pq.vocab_zipf_slope(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # token count must partial-aggregate before its shuffle
    assert plan.count("HashAggregate") >= 2
    # the top-k cut must be per-partition heaps, never a global sort
    # or a vocab-wide single-partition window
    assert "TakeOrderedAndProject" in plan


def test_novelty_join_is_equi_join(spark, sf_dir):
    """Heldout-vs-train shingle sets meet in an equi-join on the
    shingle hash — no broadcast assumption (both sides are corpus-
    scale), no nested loop."""
    plan = _plan(trq.split_ngram_novelty(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cumulative_distinct_window_runs_on_days(spark, sf_dir):
    """The global-order running sum must consume the days frame (post
    aggregation), so the single-partition window is bounded by the
    date domain, not the event count."""
    df = tq.wf_cumulative_distinct_users(spark, sf_dir)
    plan = _plan(df)
    assert "Window" in plan
    # the window input is aggregated: both groupBys happen before it
    assert plan.index("Window") < plan.index("HashAggregate")


def test_cluster_purity_never_shuffles_vectors(spark, sf_dir):
    """Assignment crosses each point with the BROADCAST k-row
    centroid frame (the intended kmeans_iterate shape — the only
    nested-loop joins allowed are those k-row builds); the label join
    itself is a hash equi-join and nothing materializes a cartesian
    shuffle."""
    plan = _plan(xq.clustering_eval_purity(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # vec_id label join
