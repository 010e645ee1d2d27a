"""Semantic invariants for the round-4 queries — properties the
oracle hash can't express (monotonicity, bounds, closure), checked at
smoke scale."""

from __future__ import annotations

from mlops_realtime_data_ingestion_spark.plans import extension_queries as xq
from mlops_realtime_data_ingestion_spark.plans import profiling_queries as pq
from mlops_realtime_data_ingestion_spark.plans import timeseries_queries as tq
from mlops_realtime_data_ingestion_spark.plans import training_queries as trq


def test_zipf_slope_is_negative(spark, sf_dir):
    """Frequency decreases with rank by construction (the rank IS the
    count order), so the OLS slope must be negative."""
    row = pq.vocab_zipf_slope(spark, sf_dir).collect()[0]
    assert row.n_terms > 1
    assert row.zipf_slope < 0


def test_novelty_rate_bounded(spark, sf_dir):
    row = trq.split_ngram_novelty(spark, sf_dir).collect()[0]
    assert 0 <= row.n_novel <= row.n_heldout
    assert 0.0 <= row.novelty_rate <= 1.0


def test_purity_bounds_and_partition(spark, sf_dir):
    """Purity in (0,1]; cluster sizes partition the vector set."""
    rows = xq.clustering_eval_purity(spark, sf_dir).collect()
    n_vecs = xq._emb(spark, sf_dir).count()
    assert sum(r.size for r in rows) == n_vecs
    for r in rows:
        assert 0 < r.top_cnt <= r.size
        assert 0.0 < r.purity <= 1.0


def test_cumulative_uniques_monotone_and_totals(spark, sf_dir):
    """The curve is non-decreasing, ends at the global distinct-user
    count, and day-sums equal the running total."""
    from mlops_realtime_data_ingestion_spark.sources.batch import load_table

    rows = sorted(
        tq.wf_cumulative_distinct_users(spark, sf_dir).collect(),
        key=lambda r: r.day,
    )
    total_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    prev = 0
    running = 0
    for r in rows:
        running += r.n_new_users
        assert r.cum_users == running
        assert r.cum_users >= prev
        prev = r.cum_users
    assert rows[-1].cum_users == total_users


def test_entity_resolution_closure(spark, sf_dir):
    """Entity ids are closed (each entity_id is itself a tagged name),
    canonical (the lexicographic min of its members), and sizes count
    members exactly."""
    rows = pq.entity_resolution_part_names(spark, sf_dir).collect()
    by_entity: dict[str, list[str]] = {}
    for r in rows:
        by_entity.setdefault(r.entity_id, []).append(r.p_name)
    names = {r.p_name for r in rows}
    sizes = {r.entity_id: r.entity_size for r in rows}
    for ent, members in by_entity.items():
        assert ent in names
        assert ent == min(members)
        assert sizes[ent] == len(members)


def test_mmr_picks_are_distinct_and_anchored(spark, sf_dir):
    """5 distinct picks per query; pick 1 is the relevance argmax; no
    pick is the query itself."""
    rows = xq.sim_search_mmr_topk(spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, picks in by_q.items():
        assert sorted(p.pick for p in picks) == [1, 2, 3, 4, 5]
        assert len({p.vec_id for p in picks}) == 5
        assert all(p.vec_id != qid for p in picks)
        first = next(p for p in picks if p.pick == 1)
        assert first.qsim == max(p.qsim for p in picks)
