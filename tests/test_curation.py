"""Behavior + plan-shape tests for the curation operators
(operators/curation.py): hashed quality classifier, DSIR selection,
duplicate-passage spans, k-anonymity, SemDeDup, dataset card."""

from __future__ import annotations

from pyspark.sql import functions as F

from mlops_realtime_data_ingestion_spark.operators.curation import (
    duplicate_passage_spans,
    hashed_quality_classifier,
    k_anonymity_report,
    semdedup_prune,
)
from mlops_realtime_data_ingestion_spark.plans import curation_queries as cq


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------- behavior ----------

def test_passage_spans_merge_overlaps(spark):
    """Two docs sharing a 7-token passage: positions 1..3 all carry
    duplicated 5-grams and must merge into ONE span covering tokens
    1..7 in each doc."""
    shared = "alpha beta gamma delta epsilon zeta eta"
    df = spark.createDataFrame(
        [
            (1, shared + " unique1 tail1 one two"),
            (2, shared + " other2 words2 here2 now2"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in duplicate_passage_spans(df, n=5).collect()}
    assert set(rows) == {1, 2}
    for r in rows.values():
        assert r["n_spans"] == 1
        assert r["dup_tokens"] == 7
        assert r["n_tokens"] == 11
    # a doc with no shared 5-gram reports nothing
    df2 = df.union(
        spark.createDataFrame([(3, "totally different words nothing shared at all")],
                              ["doc_id", "text"])
    )
    out = duplicate_passage_spans(df2, n=5)
    assert out.filter(F.col("doc_id") == 3).count() == 0


def test_passage_spans_within_doc_repetition_counts(spark):
    """A passage repeated INSIDE one doc is duplication too (total
    fingerprint count >= 2, not distinct-doc count)."""
    rep = "one two three four five"
    df = spark.createDataFrame(
        [(1, rep + " filler " + rep)], ["doc_id", "text"]
    )
    r = duplicate_passage_spans(df, n=5).collect()[0]
    assert r["n_spans"] == 2
    assert r["dup_tokens"] == 10


def test_substring_chains_exact_lengths(spark):
    """Seed-and-chain recovers the EXACT length of the repeated
    substring: a 20-token passage shared by two docs chains into one
    match of length 20, projected as one merged span per doc."""
    from mlops_realtime_data_ingestion_spark.operators.curation import (
        duplicate_substring_chains,
    )

    shared = " ".join(f"tok{i}" for i in range(20))
    df = spark.createDataFrame(
        [
            (1, "alpha beta " + shared + " gamma delta epsilon"),
            (2, "zeta eta theta " + shared + " iota"),
            (3, "all unique words here nothing repeated at this one ever"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in duplicate_substring_chains(df, n=8).collect()}
    assert set(rows) == {1, 2}
    for r in rows.values():
        assert r["n_spans"] == 1
        assert r["dup_tokens"] == 20
        assert r["max_match_len"] == 20


def test_substring_chains_within_doc_tandem_repeat(spark):
    """A 10-token block repeated twice inside one doc: both copies are
    duplicated regions (2 adjacent spans), and the maximal exact match
    is the 10-token block, not the fixed seed size."""
    from mlops_realtime_data_ingestion_spark.operators.curation import (
        duplicate_substring_chains,
    )

    block = " ".join(f"rep{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, block + " " + block + " trailer")], ["doc_id", "text"]
    )
    r = duplicate_substring_chains(df, n=8).collect()[0]
    assert r["n_spans"] == 2
    assert r["dup_tokens"] == 20
    assert r["max_match_len"] == 10


def test_substring_chains_max_occ_skips_repetitive_seeds(spark):
    """Fingerprints above max_occ are repetitive seeds and never
    chain: with max_occ below the occurrence count, no output."""
    from mlops_realtime_data_ingestion_spark.operators.curation import (
        duplicate_substring_chains,
    )

    boiler = " ".join(f"b{i}" for i in range(12))
    rows = [(i, boiler + f" suffix{i} end{i}") for i in range(8)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # the boilerplate 8-grams occur 8 times each; cap at 4 skips them
    assert duplicate_substring_chains(df, n=8, max_occ=4).count() == 0
    # with the cap above the density, all 8 docs report the passage
    out = duplicate_substring_chains(df, n=8, max_occ=64)
    assert out.count() == 8
    assert out.agg(F.min("max_match_len")).collect()[0][0] == 12


def test_substring_chains_merges_overlapping_partners(spark):
    """Two different partners matching overlapping regions of one doc
    merge into a single maximal span (the deduplicated projection)."""
    from mlops_realtime_data_ingestion_spark.operators.curation import (
        duplicate_substring_chains,
    )

    toks = [f"w{i}" for i in range(30)]
    full = " ".join(toks)
    left = " ".join(toks[:18])   # matches doc1[1..18]
    right = " ".join(toks[10:])  # matches doc1[11..30]
    df = spark.createDataFrame(
        [(1, full), (2, left + " endA endB"), (3, "preC preD " + right)],
        ["doc_id", "text"],
    )
    r = {x["doc_id"]: x for x in duplicate_substring_chains(df, n=8).collect()}
    assert r[1]["n_spans"] == 1
    assert r[1]["dup_tokens"] == 30
    assert r[1]["max_match_len"] == 20  # the longer of the two overlaps


def test_substring_strip_cuts_exactly_the_spans(spark):
    """strip_duplicate_spans removes exactly the tokens the span rows
    cover, passes clean docs through (normalized token space), and
    conserves n_tokens = kept + removed."""
    from mlops_realtime_data_ingestion_spark.operators.curation import (
        duplicate_substring_span_rows,
        strip_duplicate_spans,
    )

    shared = " ".join(f"tok{i}" for i in range(20))
    df = spark.createDataFrame(
        [
            (1, "Alpha beta " + shared + " gamma"),
            (2, "zeta " + shared + " iota"),
            (3, "all unique words nothing repeated here at all now"),
        ],
        ["doc_id", "text"],
    )
    spans = {
        r["doc_id"]: r
        for r in duplicate_substring_span_rows(df, n=8).collect()
    }
    out = {r["doc_id"]: r for r in strip_duplicate_spans(df, n=8).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["clean_text"] == "alpha beta gamma"
    assert out[2]["clean_text"] == "zeta iota"
    # clean doc passes through, normalized
    assert out[3]["clean_text"] == "all unique words nothing repeated here at all now"
    assert out[3]["removed_tokens"] == 0
    for d, r in out.items():
        expect_removed = spans[d]["span_len"] if d in spans else 0
        assert r["removed_tokens"] == expect_removed
        kept = len(r["clean_text"].split())
        assert kept + r["removed_tokens"] == r["n_tokens"]


def test_substring_strip_fully_duplicated_doc_empties(spark):
    """A doc whose every token sits in a duplicated region rewrites to
    the empty string, not NULL."""
    from mlops_realtime_data_ingestion_spark.operators.curation import (
        strip_duplicate_spans,
    )

    body = " ".join(f"w{i}" for i in range(12))
    df = spark.createDataFrame(
        [(1, body), (2, body), (3, "other words " + body + " trailing bits")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in strip_duplicate_spans(df, n=8).collect()}
    assert out[1]["clean_text"] == ""
    assert out[1]["removed_tokens"] == 12
    assert out[2]["clean_text"] == ""
    assert out[3]["clean_text"] == "other words trailing bits"


def test_cdc_chunks_exact_copy_fully_dup(spark):
    """Two identical docs: every chunk fingerprint occurs twice, so
    dup_frac == 1.0 for both, and chunk lengths conserve n_tokens."""
    from mlops_realtime_data_ingestion_spark.operators.curation import (
        cdc_chunk_dedup,
    )

    body = " ".join(f"word{i}" for i in range(64))
    df = spark.createDataFrame(
        [(1, body), (2, body), (3, "completely different text here")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in cdc_chunk_dedup(df, divisor=4).collect()}
    assert out[1]["dup_frac"] == 1.0
    assert out[2]["dup_frac"] == 1.0
    assert out[1]["dup_tokens"] == out[1]["n_tokens"] == 64
    assert out[3]["dup_tokens"] == 0


def test_cdc_chunks_shift_resistant(spark):
    """The CDC property fixed-width windows lack: a token inserted at
    the FRONT of a copy leaves every chunk after the next
    content-defined boundary identical, so the shared tail still
    dedups."""
    from mlops_realtime_data_ingestion_spark.operators.curation import (
        cdc_chunk_dedup,
    )

    tail = " ".join(f"tok{i}" for i in range(120))
    df = spark.createDataFrame(
        [(1, "unique preamble " + tail), (2, "other opener words " + tail)],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in cdc_chunk_dedup(df, divisor=4).collect()}
    # with mean chunk len 4 over 120 shared tokens, all but the first
    # shared chunk (absorbed into the differing head) must match
    for d in (1, 2):
        assert out[d]["dup_chunks"] >= 1
        assert out[d]["dup_tokens"] >= 100


def test_classifier_deterministic_and_filters_empty(spark):
    df = spark.createDataFrame(
        [(1, "spark rows data"), (2, "   "), (3, None)], ["doc_id", "text"]
    )
    out = hashed_quality_classifier(df).collect()
    assert [r["doc_id"] for r in out] == [1]
    r = out[0]
    assert r["n_tokens"] == 3
    assert 0.0 <= r["quality_prob"] <= 1.0
    assert r["keep"] == (r["raw_score"] >= 0)


def test_k_anonymity_flags_small_groups(spark):
    df = spark.createDataFrame(
        [(i, "a" if i < 12 else "b") for i in range(15)], ["id", "qi"]
    )
    rows = {r["qi"]: r for r in k_anonymity_report(df, ["qi"], k=10).collect()}
    assert rows["a"]["group_size"] == 12 and not rows["a"]["at_risk"]
    assert rows["b"]["group_size"] == 3 and rows["b"]["at_risk"]


def test_semdedup_prunes_identical_vectors(spark):
    """Exact duplicate vectors land in the same cluster with cosine
    1.0 — the higher id must be pruned against the lower."""
    import math

    vecs = [
        (0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [-1.0, 0.0]), (3, [0.0, -1.0]),
        (10, [1.0, 0.05]), (11, [1.0, 0.05]),
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs], ["vec_id", "embedding"]
    )
    out = {r["vec_id"]: r for r in semdedup_prune(df, k=4, iters=1, tau=0.9999).collect()}
    assert out[11]["is_dup"] and out[11]["dup_of"] == 10
    assert not out[10]["is_dup"]
    assert math.isclose(sum(1 for r in out.values() if r["is_dup"]), 1)


# ---------- plan shape ----------

def test_classifier_plan_is_shuffle_free(spark, sf_dir):
    """Both spellings are one narrow map stage (no Exchange). The
    default rides Arrow for the per-char fold; the sql spelling stays
    entirely inside codegen with no Python at all."""
    from mlops_realtime_data_ingestion_spark.sources.batch import load_table

    plan = _plan(cq.quality_classifier_hashed(spark, sf_dir))
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan

    docs = load_table(spark, sf_dir, "documents")
    plan_sql = _plan(hashed_quality_classifier(docs, impl="sql"))
    assert "Exchange" not in plan_sql
    assert "BatchEvalPython" not in plan_sql and "ArrowEvalPython" not in plan_sql


def test_arrow_and_sql_spellings_bit_equal(spark, sf_dir):
    """The Arrow numpy fold computes the same int64 values as the
    interpreted expression spelling — whole-result equality for every
    retrofitted operator."""
    from mlops_realtime_data_ingestion_spark.operators.curation import (
        dataset_card,
        dsir_select,
    )
    from mlops_realtime_data_ingestion_spark.sources.batch import load_table

    docs = load_table(spark, sf_dir, "documents")
    from mlops_realtime_data_ingestion_spark.operators.curation import (
        duplicate_substring_chains,
    )

    for fn, kwargs in (
        (hashed_quality_classifier, {}),
        (dsir_select, {"topk": 50}),
        (duplicate_passage_spans, {"n": 5}),
        (dataset_card, {}),
        (duplicate_substring_chains, {"n": 8}),  # wide double-fold fp
    ):
        a = sorted(map(tuple, fn(docs, impl="pandas", **kwargs).collect()))
        b = sorted(map(tuple, fn(docs, impl="sql", **kwargs).collect()))
        assert a == b, fn.__name__


def test_dsir_bucket_table_broadcasts(spark, sf_dir):
    """The 64-row feature table rides a broadcast; the corpus never
    joins shuffled at token width."""
    plan = _plan(cq.dsir_select_en(spark, sf_dir))
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    # top-k selection must not be a global sort of all docs
    assert "TakeOrderedAndProject" in plan or "WindowGroupLimit" in plan


def test_passage_spans_plan_no_nested_loop(spark, sf_dir):
    plan = _plan(cq.passage_dedup_spans(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semdedup_pairs_join_on_cluster(spark, sf_dir):
    """Intra-cluster pairing is an equi-join on the cluster id; the
    only nested-loop allowed is the broadcast of the k centroids."""
    plan = _plan(cq.dedup_semdedup(spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_ivfpq_adc_never_touches_corpus_vectors(spark, sf_dir):
    """Query-time ADC reads the broadcast LUT, never raw corpus
    vectors: the candidate scoring join must be broadcast-fed with no
    cartesian and no nested loop on the corpus side."""
    plan = _plan(cq.sim_search_ivfpq(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan


# ---------- properties (hypothesis) ----------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

_words = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]),
    min_size=0, max_size=20,
)
_corpus = st.lists(_words, min_size=1, max_size=8)


@given(_corpus)
@_SET
def test_passage_spans_bounded_and_consistent(spark, docs):
    """dup_tokens <= n_tokens; spans only exist for docs long enough
    to hold an n-gram; dup_frac = dup_tokens / n_tokens exactly."""
    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)], ["doc_id", "text"]
    )
    for r in duplicate_passage_spans(df, n=5).collect():
        assert 5 <= r["dup_tokens"] <= r["n_tokens"]
        assert r["n_spans"] >= 1
        assert r["dup_frac"] == r["dup_tokens"] / r["n_tokens"]
        assert len(docs[r["doc_id"]]) == r["n_tokens"]


@given(_corpus)
@_SET
def test_classifier_score_matches_local_model(spark, docs):
    """The distributed classifier equals the reference Python model
    computed locally (same fold hash, bucket, weight table)."""
    from mlops_realtime_data_ingestion_spark.operators.curation import KNUTH, WP

    P = 1_000_000_007

    def local(ws):
        toks = [w for w in ws if w]
        if not toks:
            return None
        s = 0
        for t in toks:
            h = 0
            for ch in t:
                h = (h * 31 + ord(ch)) % P
            s += ((h % 256) * KNUTH) % WP % 2001 - 1000
        return s, len(toks)

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in hashed_quality_classifier(df).collect()}
    for i, ws in enumerate(docs):
        exp = local(ws)
        if exp is None:
            assert i not in got
        else:
            s, n = exp
            assert got[i]["n_tokens"] == n
            assert got[i]["raw_score"] == s / (n * 1000.0)
            assert got[i]["keep"] == (s >= 0)


def test_semdedup_scaled_finds_planted_dups_and_is_deterministic(spark):
    """The Arrow scale path: planted exact duplicates are pruned
    (higher id against lower), kept/pruned partition is consistent,
    and two runs agree exactly."""
    import random

    from mlops_realtime_data_ingestion_spark.operators.curation import (
        semdedup_prune_scaled,
    )

    rng = random.Random(7)
    rows = []
    for i in range(400):
        rows.append((i, [rng.uniform(-1, 1) for _ in range(8)]))
    # plant 20 exact dup pairs
    for j in range(20):
        rows.append((1000 + j, list(rows[j * 3][1])))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).repartition(8)
    out1 = {r["vec_id"]: r for r in semdedup_prune_scaled(df, k=8, tau=0.9999).collect()}
    assert len(out1) == 420
    for j in range(20):
        r = out1[1000 + j]
        assert r["is_dup"], f"planted dup {1000+j} not pruned"
        assert r["dup_of"] == j * 3
        assert not out1[j * 3]["is_dup"] or out1[j * 3]["dup_of"] != 1000 + j
    out2 = {r["vec_id"]: r for r in semdedup_prune_scaled(df, k=8, tau=0.9999).collect()}
    assert out1.keys() == out2.keys()
    for k_ in out1:
        assert (out1[k_]["cluster"], out1[k_]["dup_of"], out1[k_]["is_dup"]) == (
            out2[k_]["cluster"], out2[k_]["dup_of"], out2[k_]["is_dup"]
        )


def test_ivfpq_stored_index_matches_inline(spark, sf_dir, tmp_path):
    """Build-once/search-many: ADC results from the persisted index
    are identical to the inline (retrain-per-call) spelling — same
    deterministic training, so bit-equal ranks and distances."""
    from mlops_realtime_data_ingestion_spark.operators.similarity import (
        ivfpq_build,
        ivfpq_search,
        ivfpq_topk,
    )
    from mlops_realtime_data_ingestion_spark.sources.batch import load_table
    from pyspark.sql import functions as F2

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F2.col("vec_id") < 5)
    idx = str(tmp_path / "ivfpq")
    ivfpq_build(emb, idx, dim=64)
    stored = sorted(map(tuple, ivfpq_search(spark, idx, queries, dim=64).collect()))
    inline = sorted(map(tuple, ivfpq_topk(emb, queries, dim=64).collect()))
    assert stored == inline
    # the search plan never references the corpus vector column
    plan = ivfpq_search(spark, idx, queries, dim=64)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
