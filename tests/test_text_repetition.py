"""Gopher repetition gates + vocab/OOV on hand-computed docs."""

from __future__ import annotations

from mlops_realtime_data_ingestion_spark.operators.text import (
    repetition_metrics,
    vocab_oov,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "a a a a"),                  # 1 distinct word of 4; bigrams: 'a a' x3
            (2, "x y z w"),                  # all distinct
            (3, "q"),                        # single word: no bigrams
            (4, ""),                         # no tokens: no output row
        ],
        "doc_id long, text string",
    )


def test_repetition_metrics_hand_computed(spark):
    rows = {r["doc_id"]: r for r in repetition_metrics(_docs(spark)).collect()}
    assert set(rows) == {1, 2, 3}  # empty doc dropped
    r1 = rows[1]
    assert r1["n_words"] == 4
    assert r1["dup_word_frac"] == 0.75       # 1 - 1/4
    assert r1["top_word_frac"] == 1.0
    assert r1["dup_bigram_frac"] == round(1 - 1 / 3, 6)
    r2 = rows[2]
    assert r2["dup_word_frac"] == 0.0 and r2["top_word_frac"] == 0.25
    assert r2["dup_bigram_frac"] == 0.0
    r3 = rows[3]
    assert r3["n_words"] == 1 and r3["dup_bigram_frac"] is None


def test_vocab_oov_cutoff_and_scoring(spark):
    docs = spark.createDataFrame(
        [(1, "a a b c"), (2, "a d")],
        "doc_id long, text string",
    )
    # freq: a=3, b=1, c=1, d=1; vocab_size=2 -> {a, b} (tie b<c<d)
    rows = {r["doc_id"]: r for r in vocab_oov(docs, vocab_size=2).collect()}
    assert rows[1]["oov_frac"] == 0.25      # c OOV out of 4
    assert rows[2]["oov_frac"] == 0.5       # d OOV out of 2
    assert rows[1]["n_words"] == 4 and rows[2]["n_words"] == 2


def test_kwic_udtf_hand_computed(spark):
    from mlops_realtime_data_ingestion_spark.operators.text import kwic

    docs = spark.createDataFrame(
        [(1, "a spark b c spark d"), (2, "no match here"), (3, "spark")],
        "doc_id long, text string",
    )
    rows = sorted(
        (r["doc_id"], r["pos"], r["context"])
        for r in kwic(docs, term="spark", window=1).collect()
    )
    assert rows == [
        (1, 1, "a spark b"),
        (1, 4, "c spark d"),
        (3, 0, "spark"),
    ]


def test_kwic_mixed_case_and_quote_terms(spark):
    """The term is lowercased (tokens are) and passed as a bound
    parameter, so mixed case matches and quotes don't break the SQL."""
    from mlops_realtime_data_ingestion_spark.operators.text import kwic

    docs = spark.createDataFrame(
        [(1, "a Spark b"), (2, "it's o'clock now")],
        "doc_id long, text string",
    )
    rows = sorted(
        (r["doc_id"], r["pos"], r["context"])
        for r in kwic(docs, term="SPARK", window=1).collect()
    )
    assert rows == [(1, 1, "a spark b")]

    quoted = sorted(
        (r["doc_id"], r["pos"], r["context"])
        for r in kwic(docs, term="o'clock", window=1).collect()
    )
    assert quoted == [(2, 1, "it's o'clock now")]


def test_vocab_oov_broadcast_plan(spark):
    docs = _docs(spark)
    plan = (
        vocab_oov(docs, vocab_size=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "TakeOrderedAndProject" in plan  # top-k vocab is never a global sort
