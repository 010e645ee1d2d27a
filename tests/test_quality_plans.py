"""Plan-shape tests for the round-3 quality/retrieval/graph operators
— assert the plan Catalyst produced is the one that survives 100 TB."""

from __future__ import annotations

from mlops_realtime_data_ingestion_spark.plans import quality_queries as q


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bm25_prunes_tokens_before_tf_shuffle(spark, sf_dir):
    """The query-term IN-filter must run scan-side so the (doc, term)
    tf shuffle carries docs x |query| rows, not docs x vocab; the df
    and corpus-stats tables join broadcast."""
    plan = _plan(q.text_bm25_topk(spark, sf_dir))
    # the IN-list filter appears below the tf aggregation
    assert "tok#" in plan and " IN (spark,window,join)" in plan.replace(
        "'", ""
    ) or "isin" in plan.lower() or " IN " in plan
    assert "BroadcastHashJoin" in plan
    # top-k must be TakeOrdered, never a global sort
    assert "TakeOrderedAndProject" in plan


def test_bloom_prefilter_is_broadcast_and_prefilters(spark, sf_dir):
    """The bloom bit-set rides a broadcast (BroadcastNestedLoopJoin of
    a 1-row set); the big-side filter runs before the join shuffle."""
    plan = _plan(q.join_bloom_prefilter(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan
    assert "array_contains" in plan
    assert "forall" in plan


def test_drift_psi_single_bins_shuffle(spark, sf_dir):
    """The events scan aggregates to bin rows; only bins-sized frames
    shuffle after that (bounds and totals are broadcast 1-row
    aggregates)."""
    plan = _plan(q.drift_psi_events(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row bounds/stats
    # the only hash shuffles are on the bin key / final 1-row agg —
    # never on a per-event key
    assert "hashpartitioning(v#" not in plan


def test_cdc_diff_prunes_time_windows(spark, sf_dir):
    """Both snapshots must push their ts-window predicates into the
    parquet scan (partition/row-group pruning at scale)."""
    plan = _plan(q.cdc_snapshot_diff(spark, sf_dir))
    assert "PushedFilters" in plan
    assert "IsNotNull(ts)" in plan or "GreaterThan" in plan


def test_pagerank_shuffles_edges_not_pairs(spark, sf_dir):
    """Each iteration joins |E| rows and aggregates on the dst node —
    no cartesian/nested-loop anywhere in the loop."""
    plan = _plan(q.graph_pagerank_topk(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # broadcast of the 1-row node count only
    assert "TakeOrderedAndProject" in plan


def test_perplexity_partial_aggregates_before_doc_shuffle(spark, sf_dir):
    """Per-doc tf partial-aggregates map-side (HashAggregate appears
    twice per groupBy: partial + final) before the doc_id exchange."""
    plan = _plan(q.text_perplexity_filter(spark, sf_dir))
    assert "HashAggregate" in plan or "ObjectHashAggregate" in plan
    assert "CartesianProduct" not in plan
