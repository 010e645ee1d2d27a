"""Unit/property tests for round-3 operators: table profiling,
incremental rollup merge, symmetric-delete fuzzy join, incremental
MinHash-LSH corpus join, grouped HLL.

Cross-engine value parity for the registered queries lives in
tests/test_oracle_parity.py (auto-parametrized over the registry);
these tests pin the operator semantics and the plan shapes on
synthetic frames the oracle can't express.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mlops_realtime_data_ingestion_spark.operators.dedup import (
    minhash_lsh_join,
    minhash_lsh_pairs,
)
from mlops_realtime_data_ingestion_spark.operators.fuzzy import edit_distance_join
from mlops_realtime_data_ingestion_spark.operators.profiling import (
    merge_rollups,
    partial_rollup,
    table_stats,
)
from mlops_realtime_data_ingestion_spark.operators.sketches import (
    hll_cardinality,
    hll_cardinality_grouped,
)


# ---------- table_stats ----------

def test_table_stats_values(spark):
    df = spark.createDataFrame(
        [(1, "aa", 1.5), (2, None, 2.5), (2, "bbbb", None)],
        "k int, s string, v double",
    )
    rows = {r["column_name"]: r for r in table_stats(df).collect()}
    assert set(rows) == {"k", "s", "v"}
    assert all(r["n_rows"] == 3 for r in rows.values())
    assert rows["k"]["n_null"] == 0 and rows["k"]["n_distinct"] == 2
    assert rows["k"]["min_val"] == 1.0 and rows["k"]["max_val"] == 2.0
    assert rows["s"]["n_null"] == 1 and rows["s"]["n_distinct"] == 2
    assert rows["s"]["avg_len"] == 3.0  # (2 + 4) / 2 non-null strings
    assert rows["v"]["n_null"] == 1 and rows["v"]["max_val"] == 2.5


def test_table_stats_sketch_ndv_accuracy(spark, sf_dir):
    """ndv='sketch' reports a per-column HLL estimate within sketch
    error of the exact NDV, for every profiled type (int, double,
    string, timestamp)."""
    from mlops_realtime_data_ingestion_spark.operators.profiling import table_stats
    from mlops_realtime_data_ingestion_spark.sources.batch import load_table

    orders = load_table(spark, sf_dir, "orders")
    rows = {r["column_name"]: r for r in table_stats(orders, ndv="sketch").collect()}
    exact = {r["column_name"]: r for r in table_stats(orders).collect()}
    assert set(rows) == set(exact)
    for c, r in rows.items():
        assert r["n_distinct"] == exact[c]["n_distinct"]  # contract col intact
        if r["n_distinct"] and r["ndv_sketch"] is not None:
            rel = abs(r["ndv_sketch"] - r["n_distinct"]) / r["n_distinct"]
            assert rel < 0.25, (c, r["ndv_sketch"], r["n_distinct"])
    # the HLL keys come from ONE stack-unpivot scan, not one per column
    plan = (
        table_stats(orders, ndv="sketch")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("orders.parquet") <= 3  # stats agg + keys + exact contract


def test_table_stats_single_scan(spark):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("g"), F.col("id").cast("string").alias("s")
    )
    plan = table_stats(df)._jdf.queryExecution().executedPlan().toString()
    # one wide aggregate over one traversal of the input, not a
    # per-column union of scans
    assert plan.count("Union") == 0


# ---------- incremental rollup merge ----------

def test_merge_equals_recompute(spark):
    df = spark.range(1000).select(
        (F.col("id") % 13).alias("k"),
        (F.col("id") * 0.37 + 0.005).alias("x"),
    )
    full = (
        df.groupBy("k")
        .agg(
            F.sum(F.col("x").cast("decimal(18,4)")).cast("double").alias("total_sum"),
            F.count(F.lit(1)).alias("total_cnt"),
        )
    )
    parts = [
        partial_rollup(df.filter(F.col("id") % 3 == i), ["k"], "x") for i in range(3)
    ]
    merged = merge_rollups(parts)
    got = {r["k"]: (r["total_sum"], r["total_cnt"]) for r in merged.collect()}
    want = {r["k"]: (r["total_sum"], r["total_cnt"]) for r in full.collect()}
    assert got == want  # exact, not approximate: decimal partials


# ---------- fuzzy join ----------

def test_edit_distance_join_matches_bruteforce(spark):
    vocab = [
        "kitten", "sitten", "sittin", "sitting", "mitten",
        "apple", "appel", "spark", "shark", "sharp",
        "completely-different", "x",
    ]
    df = spark.createDataFrame([(v,) for v in vocab], "name string")
    got = {
        (r["name_1"], r["name_2"], r["dist"])
        for r in edit_distance_join(df, "name", max_dist=2).collect()
    }
    a = df.select(F.col("name").alias("n1"))
    b = df.select(F.col("name").alias("n2"))
    want = {
        (r["n1"], r["n2"], r["d"])
        for r in a.crossJoin(b)
        .filter(F.col("n1") < F.col("n2"))
        .withColumn("d", F.levenshtein("n1", "n2").cast("int"))
        .filter(F.col("d") <= 2)
        .collect()
    }
    assert got == want
    assert ("kitten", "sitten", 1) in got
    assert ("kitten", "sitting", 3) not in got


def test_edit_distance_join_no_cartesian(spark):
    df = spark.createDataFrame([("abc",), ("abd",), ("zzz",)], "name string")
    plan = (
        edit_distance_join(df, "name", max_dist=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan


# ---------- incremental MinHash-LSH join ----------

def test_minhash_lsh_join_finds_planted_dups(spark):
    # every corpus doc is mostly unique tokens so only the planted
    # batch near-dup crosses the jaccard threshold
    corpus_rows = [
        (i, " ".join(f"tok{i}x{j}" for j in range(15)) + " shared tail")
        for i in range(20)
    ]
    # batch doc 100 near-duplicates corpus doc 3; batch doc 101 is disjoint
    batch_rows = [
        (100, corpus_rows[3][1] + " tiny edit"),
        (101, "entirely unrelated content about glaciers melting slowly"),
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    batch = spark.createDataFrame(batch_rows, "doc_id long, text string")
    got = minhash_lsh_join(corpus, batch, "doc_id", "text", threshold=0.5).collect()
    assert {(r["batch_doc_id"], r["corpus_doc_id"]) for r in got} == {(100, 3)}
    assert all(r["jaccard"] >= 0.5 for r in got)


def test_minhash_lsh_join_consistent_with_self_dedup(spark):
    """Splitting a corpus and joining batch->corpus must find exactly
    the cross-split subset of the full self-dedup pairs."""
    docs = [
        (i, f"shared boilerplate prefix sentence number {i % 4} with long tail")
        for i in range(16)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    full = {
        frozenset((r["doc_id_1"], r["doc_id_2"]))
        for r in minhash_lsh_pairs(df, "doc_id", "text", threshold=0.5).collect()
    }
    corpus = df.filter(F.col("doc_id") % 4 != 0)
    batch = df.filter(F.col("doc_id") % 4 == 0)
    incr = {
        frozenset((r["batch_doc_id"], r["corpus_doc_id"]))
        for r in minhash_lsh_join(corpus, batch, "doc_id", "text", threshold=0.5).collect()
    }
    want = {
        p
        for p in full
        if (min(p) % 4 == 0) != (max(p) % 4 == 0)  # exactly one side in batch
    }
    assert incr == want


def test_minhash_lsh_join_collapse_is_lossless(spark):
    """A corpus full of EXACT duplicates (the degenerate-band case the
    signature collapse exists for) must still produce every doc-level
    pair: identical shingle sets are interchangeable for banding and
    verification, so collapsing them changes the plan, not the output."""
    # 12 corpus docs = 3 distinct texts x 4 copies; batch = 1 copy of
    # text A, 1 near-dup of text B, 1 unrelated
    texts = {
        "A": "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "B": "one two three four five six seven eight nine ten eleven",
        "C": "red orange yellow green blue indigo violet pink brown black",
    }
    corpus_rows = [
        (10 * k + c, texts[t])
        for k, t in enumerate("ABC")
        for c in range(4)
    ]
    batch_rows = [
        (100, texts["A"]),
        (101, texts["B"] + " twelve"),
        (102, "unrelated words about tectonic plates drifting apart slowly"),
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    batch = spark.createDataFrame(batch_rows, "doc_id long, text string")
    got = {
        (r["batch_doc_id"], r["corpus_doc_id"]): r["jaccard"]
        for r in minhash_lsh_join(corpus, batch, "doc_id", "text", threshold=0.5).collect()
    }
    # 100 matches ALL FOUR copies of A (jaccard 1.0); 101 matches all
    # four copies of B; 102 matches nothing
    assert {k for k in got} == {(100, c) for c in range(4)} | {
        (101, 10 + c) for c in range(4)
    }
    assert all(got[(100, c)] == 1.0 for c in range(4))

    from mlops_realtime_data_ingestion_spark.operators.dedup import (
        minhash_lsh_join_accounting,
    )

    acct = minhash_lsh_join_accounting(corpus, batch, "doc_id", "text", threshold=0.5)
    # 12 corpus docs collapse to 3 groups; candidate group pairs stay
    # tiny even though doc-level expansion is 8 pairs
    assert acct["corpus_groups"] == 3
    assert acct["batch_groups"] == 3
    assert acct["out_pairs"] == 8
    assert acct["survivors"] == 2  # (A,A) and (B~,B) group pairs
    assert acct["candidates"] <= 4  # bands shared only by true dups here


# ---------- grouped HLL ----------

def test_hll_grouped_error_and_global_consistency(spark):
    df = spark.range(30000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") * 2654435761 % 100000).alias("user_id"),
    )
    rows = {r["g"]: r for r in hll_cardinality_grouped(df, "user_id", ["g"]).collect()}
    assert set(rows) == {"0", "1", "2"}
    for r in rows.values():
        # p=10 gives ~3.2% sigma with an ideal hash; the cross-engine
        # polynomial family is weaker, so gate at a loose 4-sigma-ish
        # bound (the registered query's oracle pins the exact value)
        assert r["rel_err"] < 0.20
        assert r["exact_distinct"] == 10000
    # single-group run reproduces the global estimator bit-for-bit
    one = df.withColumn("g", F.lit("all"))
    grouped = hll_cardinality_grouped(one, "user_id", ["g"]).collect()[0]
    overall = hll_cardinality(df, "user_id").collect()[0]
    assert grouped["hll_estimate"] == overall["hll_estimate"]
    assert grouped["exact_distinct"] == overall["exact_distinct"]
    # NULL keys must not become a phantom register: estimates match
    # the null-free frame exactly (countDistinct already drops NULLs)
    with_nulls = one.unionByName(
        spark.createDataFrame([("all", None)], "g string, user_id long")
    )
    grouped_n = hll_cardinality_grouped(with_nulls, "user_id", ["g"]).collect()[0]
    assert grouped_n["hll_estimate"] == grouped["hll_estimate"]
    assert grouped_n["exact_distinct"] == grouped["exact_distinct"]


# ---------- BPE merges ----------

def test_bpe_merges_classic_example(spark):
    from mlops_realtime_data_ingestion_spark.operators.bpe import bpe_merges

    df = spark.createDataFrame(
        [("low lower lowest low low newer newest",), ("wider wide new newer",)],
        "text string",
    )
    rows = bpe_merges(df, "text", k=4).collect()
    got = [(r["rank"], r["left"], r["right"], r["pair_count"]) for r in rows]
    # 5x 'low' -> l+o then lo+w; 'er' in lower/newer(x2)/wider;
    # 'ew' in new/newer(x2)/newest ('e r' < 'e w' breaks the 4-4 tie)
    assert got == [(1, "l", "o", 5), (2, "lo", "w", 5), (3, "e", "r", 4), (4, "e", "w", 4)]


def test_bpe_pipe_tokens_are_excluded(spark):
    """A token containing the encoding delimiter '|' must not corrupt
    symbol boundaries: it is dropped from the vocabulary, so merge
    rules equal those of the pipe-free corpus."""
    from mlops_realtime_data_ingestion_spark.operators.bpe import bpe_merges

    clean = spark.createDataFrame(
        [("low lower lowest low low newer newest",)], "text string"
    )
    dirty = spark.createDataFrame(
        [("low lower lowest low low newer newest a|b || lo|w",)], "text string"
    )
    key = lambda rows: [(r["rank"], r["left"], r["right"], r["pair_count"]) for r in rows]
    assert key(bpe_merges(dirty, "text", k=3).collect()) == key(
        bpe_merges(clean, "text", k=3).collect()
    )


def test_bpe_encode_counts_hand_computed(spark):
    """Applying the learned merges: 'low low lower' with k=2 learns
    l+o then lo+w, so 'low'→1 token ('low'? no — 2 merges give 'lo','w'
    then 'low') … asserted against hand-derivation below."""
    from mlops_realtime_data_ingestion_spark.operators.bpe import (
        bpe_encode_counts, bpe_merges,
    )

    df = spark.createDataFrame(
        [(1, "low low lower"), (2, "low"), (3, "|||")], "doc_id long, text string"
    )
    rules = [(r["left"], r["right"]) for r in bpe_merges(df, "text", k=2).collect()]
    assert rules == [("l", "o"), ("lo", "w")]
    got = {r["doc_id"]: (r["n_words"], r["n_bpe_tokens"]) for r in
           bpe_encode_counts(df, "doc_id", "text", k=2).collect()}
    # after merges: 'low' -> ['low'] (1 tok), 'lower' -> ['low','e','r'] (3)
    assert got[1] == (3, 1 + 1 + 3)
    assert got[2] == (1, 1)
    assert 3 not in got  # doc of pipe-junk has no valid words


def test_bpe_merge_handles_overlapping_runs(spark):
    """'aaaa' must merge to 'aa','aa' (greedy left-to-right,
    non-overlapping), giving the merged-pair ('aa','aa') in round 2."""
    from mlops_realtime_data_ingestion_spark.operators.bpe import bpe_merges

    df = spark.createDataFrame([("aaaa aaaa",)], "text string")
    rows = {r["rank"]: (r["left"], r["right"], r["pair_count"]) for r in
            bpe_merges(df, "text", k=2).collect()}
    assert rows[1] == ("a", "a", 6)  # 3 adjacent pairs per word x 2
    assert rows[2] == ("aa", "aa", 2)


# ---------- retrieval eval ----------

def test_retrieval_eval_hand_computed(spark):
    import math

    from mlops_realtime_data_ingestion_spark.operators.retrieval import retrieval_eval

    truth = spark.createDataFrame(
        [(1, 100, 1), (1, 101, 2), (2, 200, 1), (2, 201, 2)],
        "query_id long, neighbor_id long, rank int",
    )
    # q1 finds both truth items (ranks 1 and 3); q2 finds nothing
    results = spark.createDataFrame(
        [(1, 100, 1), (1, 999, 2), (1, 101, 3), (2, 998, 1), (2, 997, 2)],
        "query_id long, neighbor_id long, rank int",
    )
    row = retrieval_eval(results, truth, k=5).collect()[0]
    assert row["n_queries"] == 2
    assert row["recall_at_5"] == 0.5          # (2/2 + 0/2) / 2
    assert row["mrr"] == 0.5                  # (1/1 + 0) / 2
    dcg = 1 / math.log2(2) + 1 / math.log2(4)
    idcg = 1 / math.log2(2) + 1 / math.log2(3)
    assert row["ndcg_at_5"] == round(round(dcg / idcg, 12) / 2, 6)


# ---------- anomaly / funnel / MI ----------

def test_rolling_zscore_flags_planted_spike(spark):
    from mlops_realtime_data_ingestion_spark.operators.timeseries import (
        rolling_zscore_anomalies,
    )

    rows = [(1, float(i), 10.0 + (i % 3) * 0.1, i) for i in range(30)]
    rows[25] = (1, 25.0, 99.0, 25)  # the spike
    df = spark.createDataFrame(rows, "user_id long, ts double, value double, event_id long")
    df = df.withColumn("ts", F.timestamp_seconds("ts"))
    got = rolling_zscore_anomalies(
        df, ["user_id"], "ts", "value", lookback=20, z_threshold=3.0,
        min_points=5, tiebreak_col="event_id",
    ).collect()
    assert [r["value"] for r in got] == [99.0]
    assert got[0]["zscore"] > 100  # far outside a 0.1-ish std baseline


def test_rolling_zscore_constant_baseline_never_flags(spark):
    """std == 0 (constant lookback window) must flag nothing: a
    deviating value is ±Inf and an on-baseline value is NaN (which
    Spark orders ABOVE all numerics, so abs(NaN) > 3 is true without
    the std > 0 guard)."""
    from mlops_realtime_data_ingestion_spark.operators.timeseries import (
        rolling_zscore_anomalies,
    )

    rows = [(1, float(i), 10.0, i) for i in range(25)]
    rows[20] = (1, 20.0, 99.0, 20)  # deviation against a zero-std baseline
    df = spark.createDataFrame(rows, "user_id long, ts double, value double, event_id long")
    df = df.withColumn("ts", F.timestamp_seconds("ts"))
    got = rolling_zscore_anomalies(
        df, ["user_id"], "ts", "value", lookback=20, z_threshold=3.0,
        min_points=5, tiebreak_col="event_id",
    ).collect()
    assert got == []


def test_funnel_ordering_is_strict(spark):
    # user 1 converts fully in order; user 2 clicked BEFORE viewing
    # (must not count); user 3 views only
    rows = [
        (1, "view", 1.0), (1, "click", 2.0), (1, "purchase", 3.0),
        (2, "click", 1.0), (2, "view", 2.0),
        (3, "view", 5.0),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts double")
    ev = ev.withColumn("ts", F.timestamp_seconds("ts"))
    # the registered query's stage logic, driven on the crafted frame
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(F.min("ts").alias("vt"))
    c = (ev.filter(F.col("event_type") == "click").join(v, "user_id")
         .filter(F.col("ts") > F.col("vt")).groupBy("user_id").agg(F.min("ts").alias("ct")))
    p = (ev.filter(F.col("event_type") == "purchase").join(c, "user_id")
         .filter(F.col("ts") > F.col("ct")).groupBy("user_id").agg(F.min("ts").alias("pt")))
    assert v.count() == 3 and c.count() == 1 and p.count() == 1


def test_mutual_info_independent_vs_dependent(spark):
    from mlops_realtime_data_ingestion_spark.plans.profiling_queries import (
        feature_mutual_info,
    )
    import math

    # dependent: y == x  => MI == H(X) == ln(2); write as orders-shaped table
    dep = spark.createDataFrame(
        [("A", "A")] * 50 + [("B", "B")] * 50,
        "o_orderstatus string, o_orderpriority string",
    )
    # independent: all four combos equally likely => MI == 0
    ind = spark.createDataFrame(
        [("A", "A"), ("A", "B"), ("B", "A"), ("B", "B")] * 25,
        "o_orderstatus string, o_orderpriority string",
    )
    import tempfile, os
    for df, want_mi in ((dep, round(math.log(2), 6)), (ind, 0.0)):
        d = tempfile.mkdtemp()
        df.write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))
        row = feature_mutual_info(spark, d).collect()[0]
        assert row["mutual_info"] == want_mi
        assert row["h_status"] == round(math.log(2), 6)


# ---------- PMI / weighted sampling ----------

def test_weighted_sampling_prefers_heavy_docs(spark):
    import os
    import tempfile

    from mlops_realtime_data_ingestion_spark.plans.profiling_queries import (
        sample_weighted_docs,
    )

    d = tempfile.mkdtemp()
    rows = [(i, "t", "en", "s", 1) for i in range(1000)]
    rows[500] = (500, "t", "en", "s", 10_000_000)  # overwhelming weight
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    got = sample_weighted_docs(spark, d)
    ids = [r["doc_id"] for r in got.collect()]
    assert ids[0] == 500  # u^(1/w) -> 1 as w grows: heavy doc ranks first
    # deterministic under repartitioning: a second plan yields the same rows
    again = [r["doc_id"] for r in sample_weighted_docs(spark, d).collect()]
    assert ids == again


def test_pmi_rewards_exclusive_cooccurrence(spark):
    import os
    import tempfile

    from mlops_realtime_data_ingestion_spark.plans.profiling_queries import (
        token_pmi_topk,
    )

    d = tempfile.mkdtemp()
    docs = [(i, "alpha beta", "en", "s", 10) for i in range(10)]
    docs += [(100 + i, "gamma delta epsilon zeta eta theta", "en", "s", 30)
             for i in range(10)]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    top = token_pmi_topk(spark, d).collect()
    # (alpha, beta) co-occur only with each other -> highest PMI
    assert (top[0]["x"], top[0]["y"]) == ("alpha", "beta")
    assert top[0]["pmi"] > 0


def test_leakage_safe_split_keeps_near_dups_together(spark, sf_dir):
    from mlops_realtime_data_ingestion_spark.operators.dedup import ngram_jaccard_pairs
    from mlops_realtime_data_ingestion_spark.plans.profiling_queries import (
        split_leakage_safe,
    )
    from mlops_realtime_data_ingestion_spark.sources.batch import load_table

    split = split_leakage_safe(spark, sf_dir)
    pairs = ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), id_col="doc_id", text_col="text",
        n=2, threshold=0.5, block_cols=("lang",), length_band=50,
    )
    assert pairs.count() > 0  # the testdata plants near-dups
    a = split.select(F.col("doc_id").alias("doc_id_1"), F.col("split").alias("s1"))
    b = split.select(F.col("doc_id").alias("doc_id_2"), F.col("split").alias("s2"))
    crossed = pairs.join(a, "doc_id_1").join(b, "doc_id_2").filter(
        F.col("s1") != F.col("s2")
    )
    assert crossed.count() == 0  # no near-dup pair straddles a split
    # and every doc got exactly one assignment
    assert split.count() == load_table(spark, sf_dir, "documents").count()
