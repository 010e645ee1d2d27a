"""Round-8 changes (VERDICT r7 tasks 1/2/4 + ADVICE r7): drift-safe
threshold bounds in the containment/jaccard filter stacks, SimHash
block-combination banding, the simhash cache knob and band
validation, the direction-2 corpus-probe prefilter, and the
index-mode containment serve registry row."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from mlops_realtime_data_ingestion_spark.operators.dedup import (
    containment_pairs,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_pairs,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------
# ADVICE r7 (medium): float drift in threshold-derived integer
# bounds. 0.55 * 20 = 11.000000000000002 in doubles, so a bare
# ceil() demands overlap 12 where exact verification accepts 11 —
# the filters silently over-tighten at exact-boundary pairs. Both
# fixtures sit EXACTLY on the boundary (containment / jaccard
# = 11/20 = 0.55) so the un-guarded bounds provably drop them.
# ---------------------------------------------------------------

# 22 distinct words -> doc A has exactly 20 distinct 3-gram shingles;
# B = A's first 13 words -> 11 shingles, every one inside A.
_WORDS = [f"w{i:02d}" for i in range(22)]
_DOC_A = " ".join(_WORDS)
_DOC_B = " ".join(_WORDS[:13])


def _brute_containment(rows, n, t):
    sh = {
        d: set(
            tuple(txt.split()[i:i + n])
            for i in range(len(txt.split()) - n + 1)
        )
        for d, txt in rows
    }
    want = {}
    for a, b in itertools.permutations(sh, 2):
        ov = len(sh[a] & sh[b])
        if sh[a] and ov / len(sh[a]) >= t:
            want[(a, b)] = (ov, len(sh[a]))
    return want


@pytest.mark.parametrize("threshold", [0.55, 0.6])
def test_containment_drift_boundary_pair_survives(spark, threshold):
    rows = [("A", _DOC_A), ("B", _DOC_B),
            ("U", "totally unrelated words about spark shuffle plans x y z")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["doc_id_a"], r["doc_id_b"]): (r["overlap"], r["size_a"])
        for r in containment_pairs(
            docs, "doc_id", "text", n=3, threshold=threshold
        ).collect()
    }
    want = _brute_containment(rows, 3, threshold)
    assert got == want
    if threshold == 0.55:
        # the exact-boundary pair the un-guarded ceil() drops
        assert ("A", "B") in got and got[("A", "B")] == (11, 20)


def test_jaccard_drift_boundary_pair_survives_prefix_path(spark):
    """jaccard(A, B) = 11/20 = 0.55 exactly; block_cap=0 forces the
    PPJoin prefix path, where the un-guarded plen (9 instead of 10)
    and length filter (11 >= 11.000000000000002) both drop the pair."""
    rows = [("A", _DOC_A), ("B", _DOC_B)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"]).withColumn(
        "n_chars", F.length("text")
    )
    got = {
        (r["doc_id_1"], r["doc_id_2"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.55,
            length_band=10_000, block_cap=0,
        ).collect()
    }
    assert ("A", "B") in got
    assert got[("A", "B")] == pytest.approx(0.55)


# ---------------------------------------------------------------
# VERDICT r7 task 1: SimHash block-combination banding is lossless —
# identical output to simple banding and to the brute-force hamming
# scan — and the validation rejects degenerate band shapes
# (ADVICE r7 low: zero-width bands collapse to an all-pairs join).
# ---------------------------------------------------------------


def test_simhash_combination_equals_simple_and_bruteforce(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    simple = {
        tuple(r)
        for r in simhash_pairs(
            docs, "doc_id", "text", max_hamming=3, bits=48
        ).collect()
    }
    combi = {
        tuple(r)
        for r in simhash_pairs(
            docs, "doc_id", "text", max_hamming=3, bits=48, n_blocks=6,
        ).collect()
    }
    assert combi == simple
    # brute force: all-pairs hamming over the fingerprints
    fps = simhash_fingerprints(docs, "doc_id", "text", bits=48).collect()
    want = set()
    for (i1, s1), (i2, s2) in itertools.combinations(
        sorted((r["id"], r["simhash"]) for r in fps), 2
    ):
        h = bin(s1 ^ s2).count("1")
        if h <= 3:
            want.add((i1, i2, h))
    assert simple == want


def test_simhash_combination_fewer_candidates(spark, sf_dir):
    """The point of combination banding: 24-bit keys collide less
    than 12-bit keys. Count pre-verification candidate pairs both
    ways; combi must never exceed simple (and on real data is far
    below it)."""
    docs = _docs(spark, sf_dir)
    fps = simhash_fingerprints(docs, "doc_id", "text", bits=48).toPandas()

    def n_cand(keys_per_doc):
        from collections import Counter

        c = Counter()
        for _, row in fps.iterrows():
            for k in keys_per_doc(int(row["simhash"])):
                c[k] += 1
        return sum(v * (v - 1) // 2 for v in c.values())

    simple = n_cand(
        lambda s: [(b, (s >> (12 * b)) & 0xFFF) for b in range(4)]
    )
    combos = list(itertools.combinations(range(6), 3))
    combi = n_cand(
        lambda s: [
            (i, tuple((s >> (8 * k)) & 0xFF for k in sub))
            for i, sub in enumerate(combos)
        ]
    )
    assert combi <= simple


def test_simhash_band_validation(spark):
    docs = spark.createDataFrame([("a", "x y z")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_pairs(docs, "doc_id", "text", max_hamming=3, n_bands=3)
    with pytest.raises(ValueError, match="zero-width"):
        simhash_pairs(docs, "doc_id", "text", max_hamming=3, bits=48,
                      n_bands=64)
    with pytest.raises(ValueError, match="zero-width"):
        simhash_pairs(docs, "doc_id", "text", max_hamming=3, bits=48,
                      n_blocks=64)
    with pytest.raises(ValueError, match="simple banding"):
        simhash_pairs(docs, "doc_id", "text", max_hamming=3, n_blocks=4)


def test_simhash_cache_knob_output_identical(spark, sf_dir):
    docs = _docs(spark, sf_dir).limit(200)
    cached = {
        tuple(r)
        for r in simhash_pairs(docs, "doc_id", "text").collect()
    }
    uncached = {
        tuple(r)
        for r in simhash_pairs(docs, "doc_id", "text", cache=False).collect()
    }
    assert uncached == cached


# ---------------------------------------------------------------
# Registry: the new rows resolve, and the index-mode containment
# serve equals the DataFrame-mode row (same oracle restriction).
# ---------------------------------------------------------------


def test_new_rows_registered():
    from mlops_realtime_data_ingestion_spark.plans.registry import all_specs

    specs = all_specs()
    for name in ("dedup_simhash_combi", "dedup_containment_index_serve",
                 "dedup_simhash_incremental", "dedup_simhash_index_serve"):
        assert name in specs and specs[name].oracle is not None


# ---------------------------------------------------------------
# simhash_join (round 8): the incremental spelling equals the full
# self-run restricted to batch-touching pairs, in DataFrame mode,
# index mode, and combination-banding mode.
# ---------------------------------------------------------------


def test_simhash_join_equals_restricted_full_run(spark, sf_dir, tmp_path):
    from mlops_realtime_data_ingestion_spark.operators.dedup import (
        simhash_index_build,
        simhash_join,
    )

    docs = _docs(spark, sf_dir)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    full = {
        tuple(r)
        for r in simhash_pairs(docs, "doc_id", "text").collect()
    }
    want = {
        (a, b, h) for (a, b, h) in full if a % 5 == 0 or b % 5 == 0
    }
    got_df = {
        tuple(r)
        for r in simhash_join(corpus, batch, "doc_id", "text").collect()
    }
    assert got_df == want
    got_combi = {
        tuple(r)
        for r in simhash_join(corpus, batch, "doc_id", "text",
                              n_blocks=6).collect()
    }
    assert got_combi == want
    idx = str(tmp_path / "simhash_idx")
    simhash_index_build(corpus, idx, "doc_id", "text")
    got_idx = {
        tuple(r)
        for r in simhash_join(idx, batch, "doc_id", "text",
                              corpus_is_index=True).collect()
    }
    assert got_idx == want


def test_round8_plan_broadcast_budget(spark, sf_dir):
    """Round-8 audit pin: dedup_simhash_combi must keep the zero-
    suspect-broadcast contract of dedup_simhash (the band frame is
    corpus x 20 keys — statically broadcasting it is the 100x OOM
    class), and the certified incremental containment rows carry none
    either (the direction-2 batch-token broadcast is the opt-in
    `prefilter_corpus_probes` knob, default OFF on measurement —
    SCALE.md round 8)."""
    from mlops_realtime_data_ingestion_spark.plans.registry import all_specs
    from tools.broadcast_audit import flagged_broadcasts

    specs = all_specs()
    budget = {
        "dedup_simhash_combi": 0,
        "dedup_simhash_incremental": 0,
        "dedup_simhash_index_serve": 0,
        "dedup_containment_incremental": 0,
        "dedup_containment_index_serve": 0,
    }
    for name, allowed in budget.items():
        df = specs[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        hits = flagged_broadcasts(plan)
        assert len(hits) <= allowed, f"{name}: {hits}"


def test_containment_index_serve_equals_dataframe_mode(spark, sf_dir):
    from mlops_realtime_data_ingestion_spark.plans.registry import all_specs

    specs = all_specs()
    df_mode = {
        tuple(r)
        for r in specs["dedup_containment_incremental"].fn(spark, sf_dir).collect()
    }
    idx_mode = {
        tuple(r)
        for r in specs["dedup_containment_index_serve"].fn(spark, sf_dir).collect()
    }
    assert idx_mode == df_mode


def test_simhash_index_serve_equals_incremental(spark, sf_dir):
    from mlops_realtime_data_ingestion_spark.plans.registry import all_specs

    specs = all_specs()
    df_mode = {
        tuple(r)
        for r in specs["dedup_simhash_incremental"].fn(spark, sf_dir).collect()
    }
    idx_mode = {
        tuple(r)
        for r in specs["dedup_simhash_index_serve"].fn(spark, sf_dir).collect()
    }
    assert idx_mode == df_mode


def test_containment_probe_prefilter_is_lossless(spark, sf_dir):
    """The direction-2 broadcast-semi prefilter (the batch << corpus
    steady-state knob) must not change the output."""
    from mlops_realtime_data_ingestion_spark.operators.dedup import (
        containment_pairs_incremental,
    )

    docs = _docs(spark, sf_dir)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    base = {
        tuple(r)
        for r in containment_pairs_incremental(
            corpus, batch, "doc_id", "text", n=3, threshold=0.6
        ).collect()
    }
    filtered = {
        tuple(r)
        for r in containment_pairs_incremental(
            corpus, batch, "doc_id", "text", n=3, threshold=0.6,
            prefilter_corpus_probes=True,
        ).collect()
    }
    assert filtered == base
