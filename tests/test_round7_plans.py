"""Round-7 changes (VERDICT r6 tasks 1/2/5 + ADVICE r6): the PPJoin+
positional filter in containment, the skew-safe count_mode="join"
spelling for cdc_chunk_dedup / duplicate_passage_spans, the
containment incremental lifecycle, and the substring-index append
idempotency guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mlops_realtime_data_ingestion_spark.operators.curation import (
    cdc_chunk_dedup,
    duplicate_passage_spans,
)
from mlops_realtime_data_ingestion_spark.operators.dedup import (
    containment_accounting,
    containment_pairs,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _sorted_rows(df):
    return [tuple(r) for r in df.collect()]


# ---------------------------------------------------------------
# count_mode="join" (VERDICT r6 task 2): oracle-equal to the window
# spelling by construction — prove it on real data, prove both modes
# survive a pathologically hot fingerprint, and pin the plan shapes
# (join mode must not contain a window over fp; window mode must).
# ---------------------------------------------------------------


@pytest.mark.parametrize("op", ["cdc", "passages"])
def test_count_mode_join_equals_window(spark, sf_dir, op):
    docs = _docs(spark, sf_dir)
    if op == "cdc":
        w = cdc_chunk_dedup(docs, "doc_id", "text", count_mode="window")
        j = cdc_chunk_dedup(docs, "doc_id", "text", count_mode="join")
    else:
        w = duplicate_passage_spans(docs, "doc_id", "text", count_mode="window")
        j = duplicate_passage_spans(docs, "doc_id", "text", count_mode="join")
    key = w.columns[0]
    assert _sorted_rows(w.orderBy(key)) == _sorted_rows(j.orderBy(key))


def test_count_mode_rejects_unknown(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    with pytest.raises(ValueError):
        cdc_chunk_dedup(docs, "doc_id", "text", count_mode="nope")
    with pytest.raises(ValueError):
        duplicate_passage_spans(docs, "doc_id", "text", count_mode="nope")


def test_cdc_join_mode_plan_has_no_window(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    j = cdc_chunk_dedup(docs, "doc_id", "text", count_mode="join")
    w = cdc_chunk_dedup(docs, "doc_id", "text", count_mode="window")
    jplan = j._jdf.queryExecution().executedPlan().toString()
    wplan = w._jdf.queryExecution().executedPlan().toString()
    # cdc has NO other window, so the executed plan itself is the proof
    assert "Window" not in jplan
    assert "Window" in wplan
    # and the join-back must never be a static broadcast: Catalyst
    # sizes the post-explode dup-fp aggregate at the pre-explode scan,
    # which would broadcast it whatever its true size (driver OOM on
    # dup-dense crawls — the containment failure class)
    assert "BroadcastExchange" not in jplan
    ppj = duplicate_passage_spans(
        docs, "doc_id", "text", count_mode="join"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" not in ppj


def test_cdc_skewed_fingerprint_join_mode_correct(spark):
    """One chunk fingerprint hot across 100k docs (the raw-crawl
    boilerplate pathology SCALE.md documents). The join spelling must
    produce exactly the same per-doc accounting — every doc's only
    chunk is duplicated 100k times corpus-wide — while its aggregate
    side flattens the hot key map-side instead of buffering 100k rows
    in one WindowExec partition."""
    n = 100_000
    # 8 identical tokens -> every doc yields identical chunk(s) with
    # one corpus-wide fingerprint (whatever the content-defined cuts
    # are, they are the same for identical token streams)
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("alpha beta gamma delta epsilon zeta eta theta").alias("text"),
    )
    out = cdc_chunk_dedup(docs, "doc_id", "text", count_mode="join")
    agg = out.agg(
        F.count("*").alias("docs"),
        F.sum("dup_chunks").alias("dupc"),
        F.sum("n_chunks").alias("allc"),
        F.min("dup_frac").alias("minf"),
    ).collect()[0]
    assert agg["docs"] == n
    assert agg["dupc"] == agg["allc"]  # every chunk duplicated
    assert agg["minf"] == 1.0


def test_passages_skewed_fingerprint_join_equals_window(spark):
    """Hot fingerprint + a unique tail per doc: join and window modes
    must agree exactly on span/dup-token accounting."""
    n = 5_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("the same boilerplate header sentence repeated everywhere "),
            F.lit("unique tail token "),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    w = duplicate_passage_spans(docs, "doc_id", "text", count_mode="window")
    j = duplicate_passage_spans(docs, "doc_id", "text", count_mode="join")
    assert _sorted_rows(w.orderBy("doc_id")) == _sorted_rows(j.orderBy("doc_id"))
    # the boilerplate prefix is duplicated in every doc
    assert j.filter(F.col("dup_tokens") == 0).count() == 0


# ---------------------------------------------------------------
# Containment positional filter (VERDICT r6 task 1): the PPJoin+
# prunes are lossless — same survivors as round 6 — and the
# accounting counts candidates/survivors in one pass (ADVICE r6).
# ---------------------------------------------------------------


def test_containment_positional_filter_lossless_vs_bruteforce(spark):
    """Brute-force oracle: all-pairs shingle containment on a small
    crafted corpus with quotes, supersets, near-misses, and ties —
    the filter stack must lose nothing."""
    rows = [
        ("q", "the quick brown fox jumps over the lazy dog today"),
        # superset: contains q's text entirely
        ("s", "prefix words the quick brown fox jumps over the lazy dog "
              "today and a long suffix of extra words goes here"),
        # near-miss: shares a bit of q
        ("m", "the quick brown cat sleeps under the lazy dog today"),
        # unrelated
        ("u", "completely different content about spark shuffles and joins"),
        # exact duplicate of q (containment 1.0 both ways)
        ("d", "the quick brown fox jumps over the lazy dog today"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["doc_id_a"], r["doc_id_b"]): (r["overlap"], r["size_a"])
        for r in containment_pairs(docs, "doc_id", "text", n=3, threshold=0.6).collect()
    }
    # brute force in python
    import itertools

    def shingles(t):
        w = t.split()
        return set(tuple(w[i:i + 3]) for i in range(len(w) - 2))

    sh = {d: shingles(t) for d, t in rows}
    want = {}
    for a, b in itertools.permutations(sh, 2):
        ov = len(sh[a] & sh[b])
        if sh[a] and ov / len(sh[a]) >= 0.6:
            want[(a, b)] = (ov, len(sh[a]))
    assert got == want


def test_substring_index_double_append_defended(spark, tmp_path):
    """ADVICE r6: a retried append of the same batch leaves duplicate
    (id, p) index rows, which the chaining pairs against themselves.
    dedup_index=True must restore the single-append result."""
    from pyspark.sql import functions as F

    from mlops_realtime_data_ingestion_spark.operators.curation import (
        duplicate_substring_chains_incremental,
        substring_index_build,
        substring_index_update,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 5 > 1)
    batch1 = docs.filter(F.col("doc_id") % 5 == 1)
    batch2 = docs.filter(F.col("doc_id") % 5 == 0)
    idx = str(tmp_path / "ss_idx_retry")
    substring_index_build(corpus, idx, n=8)
    substring_index_update(batch1, idx, n=8)
    clean = {
        tuple(r)
        for r in duplicate_substring_chains_incremental(
            spark.read.parquet(idx), batch2, n=8, max_occ=64,
            corpus_is_index=True,
        ).collect()
    }
    # violate the exactly-once contract: append batch1 AGAIN
    substring_index_update(batch1, idx, n=8)
    defended = {
        tuple(r)
        for r in duplicate_substring_chains_incremental(
            spark.read.parquet(idx), batch2, n=8, max_occ=64,
            corpus_is_index=True, dedup_index=True,
        ).collect()
    }
    assert defended == clean


# ---------------------------------------------------------------
# Containment incremental lifecycle (VERDICT r6 task 5): batch-vs-
# corpus serve == full self-run restricted to batch-touching pairs,
# in BOTH modes (corpus DataFrame with union-wide ranks, and the
# persisted frozen-rank index) — mirrors the substring lifecycle.
# ---------------------------------------------------------------


def test_containment_incremental_matches_restricted_full(spark, tmp_path):
    from mlops_realtime_data_ingestion_spark.operators.dedup import (
        containment_index_build,
        containment_pairs_incremental,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    ref = {
        tuple(r)
        for r in containment_pairs(docs, "doc_id", "text", n=3, threshold=0.6)
        .filter((F.col("doc_id_a") % 5 == 0) | (F.col("doc_id_b") % 5 == 0))
        .collect()
    }
    inc = {
        tuple(r)
        for r in containment_pairs_incremental(
            corpus, batch, n=3, threshold=0.6
        ).collect()
    }
    assert inc == ref and len(ref) > 0
    idx = str(tmp_path / "cont_idx")
    containment_index_build(corpus, idx, n=3)
    inc2 = {
        tuple(r)
        for r in containment_pairs_incremental(
            idx, batch, n=3, threshold=0.6, corpus_is_index=True
        ).collect()
    }
    assert inc2 == ref


def test_containment_index_grows_across_ingests(spark, tmp_path):
    """Second ingest served against an index rebuilt to include the
    first batch still equals the full-run restriction — the frozen
    order of the REBUILT index differs from the first build's, which
    must not matter."""
    from mlops_realtime_data_ingestion_spark.operators.dedup import (
        containment_index_build,
        containment_pairs_incremental,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus01 = docs.filter(F.col("doc_id") % 5 != 0)
    batch2 = docs.filter(F.col("doc_id") % 5 == 0)
    idx = str(tmp_path / "cont_idx_grow")
    containment_index_build(corpus01, idx, n=3)
    got = {
        tuple(r)
        for r in containment_pairs_incremental(
            idx, batch2, n=3, threshold=0.6, corpus_is_index=True
        ).collect()
    }
    ref = {
        tuple(r)
        for r in containment_pairs(docs, "doc_id", "text", n=3, threshold=0.6)
        .filter((F.col("doc_id_a") % 5 == 0) | (F.col("doc_id_b") % 5 == 0))
        .collect()
    }
    assert got == ref


def test_containment_accounting_single_pass(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    acct = containment_accounting(docs, "doc_id", "text", n=3, threshold=0.6)
    assert acct["survivors"] <= acct["candidates"]
    pairs = containment_pairs(docs, "doc_id", "text", n=3, threshold=0.6)
    assert pairs.count() == acct["survivors"]


def test_no_corpus_proportional_static_broadcasts(spark, sf_dir):
    """Round-7 broadcast audit regression guard: these queries used to
    statically broadcast a CORPUS-proportional frame (train vocab,
    span sets, band index, per-doc aggregates, variant dictionary,
    corpus rep maps) because Catalyst sizes post-explode/post-UDF
    frames at the pre-explode scan. The merge hints must keep every
    suspect broadcast out of the static plan. dedup_incremental_lsh
    legitimately broadcasts its BATCH-side frames (bounded by
    construction), so it allows exactly those two."""
    from mlops_realtime_data_ingestion_spark.plans.registry import all_specs
    from tools.broadcast_audit import flagged_broadcasts

    specs = all_specs()
    budget = {
        "split_ngram_novelty": 0,
        "substring_strip_text": 0,
        "dedup_simhash": 0,
        "text_repetition_metrics": 0,
        "fuzzy_join_part_names": 0,
        "dedup_incremental_lsh": 2,  # batch-side only
    }
    for name, allowed in budget.items():
        df = specs[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        hits = flagged_broadcasts(plan)
        assert len(hits) <= allowed, f"{name}: {hits}"


def test_containment_plan_budget_no_broadcasts(spark):
    """Plan-shape budget for the round-7 containment rework: the
    static plan must contain ZERO broadcast exchanges (Catalyst's
    post-explode size estimates made it broadcast the full token
    index at 100x and overflow the driver — the merge hints are the
    fix and this test the regression guard), exactly 2 rank windows
    (probe + index side), and at most 13 keyed exchanges."""
    import re

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = containment_pairs(docs, "doc_id", "text", n=3, threshold=0.6)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" not in plan
    assert len(re.findall(r"Window \[row_number", plan)) == 2
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 13
