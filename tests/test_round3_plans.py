"""Plan-shape tests for the round-3 query families — the broadcast /
no-cartesian / TakeOrdered properties that keep these plans viable at
100 TB, asserted on the executed plan like the TPC-H plan tests."""

from __future__ import annotations

from mlops_realtime_data_ingestion_spark.plans import profiling_queries as pq


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_semantic_decontam_broadcasts_benchmark(spark, sf_dir):
    """The benchmark vectors are the small side by construction; the
    corpus may never shuffle at vector width."""
    plan = _plan(pq.decontam_semantic(spark, sf_dir))
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_hard_negatives_broadcasts_queries(spark, sf_dir):
    plan = _plan(pq.embedding_hard_negatives(spark, sf_dir))
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_bpe_top_pair_is_take_ordered(spark, sf_dir):
    """Each round's top pair must come from a per-partition k-heap
    (TakeOrderedAndProject), never a vocabulary-wide global sort, and
    the merge applies via a broadcast of that single row."""
    plan = _plan(pq.bpe_top_merges(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_incremental_dedup_band_join_is_shuffle_join(spark, sf_dir):
    """The batch-vs-index candidate join must be an equi-join on the
    band keys — no nested loop, no cartesian."""
    plan = _plan(pq.dedup_incremental_lsh(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_quantile_sketch_shuffles_bins_not_rows(spark, sf_dir):
    """After the bin aggregation every exchange moves at most
    bins-sized data; the row-level scan feeds one partial aggregate."""
    plan = _plan(pq.approx_quantiles_value(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # the bounds frame rides a broadcast, not a row-level join
    assert "BroadcastExchange" in plan


def test_fuzzy_join_pushes_length_filter(spark, sf_dir):
    """Deletion-variant blocking keeps the join an equi-join; the
    distinct vocabulary aggregation is the only corpus shuffle."""
    plan = _plan(pq.fuzzy_join_part_names(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
