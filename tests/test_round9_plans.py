"""Round-9 changes (VERDICT r8 tasks 1/2/4/5 + ADVICE r8): the _tq
round-up clamp, hyperplane-LSH-banded embedding dedup, simhash
banding auto-select, the containment probe-prefilter auto-default,
the simhash index append mode, and the IVF-PQ rerank oracle row."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from mlops_realtime_data_ingestion_spark.operators.dedup import (
    _tq,
    choose_simhash_banding,
    containment_pairs,
    containment_pairs_incremental,
    ngram_jaccard_pairs,
    simhash_index_build,
    simhash_join,
    simhash_pairs,
)
from mlops_realtime_data_ingestion_spark.operators.similarity import (
    embedding_lsh_accounting,
    embedding_lsh_pairs,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# ---------------------------------------------------------------
# ADVICE r8 (medium): _tq's round() can land ABOVE the double
# threshold (t = 2/3 -> 666666667/1e9 = 0.666666667 > t), which
# re-tightens every derived bound past what float verification
# accepts — the exact over-tightening bug _tq exists to prevent.
# ---------------------------------------------------------------

def test_tq_clamps_below_threshold():
    for t in [2 / 3, 1 / 3, 0.55, 0.6, 0.5, 1 / 7, 2 / 7, 0.999999]:
        p, q = _tq(t)
        assert p / q <= t, f"_tq({t}) = {p}/{q} sits above the threshold"
    # decimal thresholds stay EXACT (no unnecessary loosening)
    assert _tq(0.55) == (550_000_000, 1_000_000_000)
    assert _tq(0.6) == (600_000_000, 1_000_000_000)
    assert _tq(0.5) == (500_000_000, 1_000_000_000)


def test_tq_two_thirds_bound_matches_float_semantics():
    # ADVICE r8's concrete case: t = 2/3, sz = 3. Float semantics:
    # sz2 = 2 passes 2 >= t*3 (t*3 = 2.0 exactly in doubles). The
    # unclamped rational (666666667/1e9) demands q*2 >= p*3 ->
    # 2e9 >= 2000000001, FALSE. The clamp must restore it.
    t = 2 / 3
    p, q = _tq(t)
    sz, sz2 = 3, 2
    assert (sz2 >= t * sz) == (q * sz2 >= p * sz)
    # and the ceil bound: float-accepting min overlap for sz=3 is 2
    req = (p * sz + q - 1) // q
    assert req == 2


def test_jaccard_two_thirds_boundary_pair_survives(spark):
    # doc A: 3 distinct bigrams; doc B shares exactly 2 of them and
    # adds none -> jaccard = 2/3 exactly (intersection 2, union 3).
    # A = w0 w1 w2 w3 (bigrams 01,12,23); B = w0 w1 w2 (bigrams 01,12)
    rows = [("a", "w0 w1 w2 w3", 12), ("b", "w0 w1 w2", 9)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "n_chars"])
    got = ngram_jaccard_pairs(
        df, "doc_id", "text", n=2, threshold=2 / 3,
        length_band=None, block_cap=0,  # force the prefix-filter path
    ).collect()
    assert len(got) == 1 and got[0]["jaccard"] == pytest.approx(2 / 3)


def test_containment_two_thirds_boundary_pair_survives(spark):
    # B has 3 distinct 3-gram shingles, 2 of them inside A ->
    # containment(B in A) = 2/3 exactly.
    a = "w0 w1 w2 w3 w4"                # shingles 012,123,234
    b = "w0 w1 w2 w3 x9"                # shingles 012,123,23x9
    df = spark.createDataFrame(
        [("A", a), ("B", b)], ["doc_id", "text"]
    )
    got = {
        (r["doc_id_a"], r["doc_id_b"]): r["containment"]
        for r in containment_pairs(
            df, "doc_id", "text", n=3, threshold=2 / 3
        ).collect()
    }
    assert got.get(("B", "A")) == pytest.approx(2 / 3)


# ---------------------------------------------------------------
# VERDICT r8 task 1: bounded embedding dedup.
# ---------------------------------------------------------------

def test_embedding_lsh_impls_bit_identical(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    kw = dict(threshold=0.3, n_planes=4, n_tables=4, block_cols=("label",))
    a = sorted(
        tuple(r) for r in embedding_lsh_pairs(emb, impl="pandas", **kw).collect()
    )
    b = sorted(
        tuple(r) for r in embedding_lsh_pairs(emb, impl="sql", **kw).collect()
    )
    assert a == b and len(a) > 0


def test_embedding_lsh_is_verified_subset_of_allpairs(spark, sf_dir):
    # banding only ever DROPS pairs; every emitted pair must appear in
    # the exhaustive intra-label join with the identical sim value.
    emb = _emb(spark, sf_dir)
    got = {
        (r["vec_id_1"], r["vec_id_2"]): r["sim"]
        for r in embedding_lsh_pairs(
            emb, threshold=0.3, n_planes=4, n_tables=4, block_cols=("label",)
        ).collect()
    }
    from mlops_realtime_data_ingestion_spark.operators.similarity import cosine

    a = emb.select(F.col("vec_id").alias("i"), "label", F.col("embedding").alias("e1"))
    b = emb.select(F.col("vec_id").alias("j"), "label", F.col("embedding").alias("e2"))
    full = {
        (r["i"], r["j"]): r["sim"]
        for r in a.join(b, "label")
        .filter(F.col("i") < F.col("j"))
        .withColumn("sim", F.round(cosine("e1", "e2"), 6))
        .filter(F.col("sim") >= 0.3)
        .collect()
    }
    assert got and set(got).issubset(set(full))
    assert all(full[k] == v for k, v in got.items())


def test_embedding_lsh_finds_planted_near_dups(spark):
    # true near-dups (cosine ~1) collide in every table with
    # probability ~(1 - theta/pi)^planes per table; at theta ~ 3.6deg
    # a single 4-plane table already exceeds 0.92 — plant 20 dup pairs
    # and require >= 90% found (seeded, deterministic planes).
    import numpy as np

    rng = np.random.default_rng(9)
    base = rng.normal(0, 1, (20, 32))
    dup = base + rng.normal(0, 0.02, base.shape)  # ~cos 0.998
    rows = [
        (int(i), [float(x) for x in base[i]], 0) for i in range(20)
    ] + [
        (int(100 + i), [float(x) for x in dup[i]], 0) for i in range(20)
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    got = {
        (r["vec_id_1"], r["vec_id_2"])
        for r in embedding_lsh_pairs(
            emb, threshold=0.95, n_planes=4, n_tables=4
        ).collect()
    }
    planted = {(i, 100 + i) for i in range(20)}
    assert len(got & planted) >= 18


def test_embedding_lsh_accounting_counts(spark, sf_dir):
    acc = embedding_lsh_accounting(
        _emb(spark, sf_dir), threshold=0.3, n_planes=4, n_tables=4,
        block_cols=("label",),
    )
    n = _emb(spark, sf_dir).count()
    assert 0 < acc["survivors"] <= acc["candidates"]
    # bounded: candidates far below the intra-label all-pairs count
    assert acc["candidates"] < n * n / 10 / 2


# ---------------------------------------------------------------
# VERDICT r8 task 5: simhash banding auto-select.
# ---------------------------------------------------------------

def test_choose_simhash_banding_rule():
    # below the measured crossover: simple banding
    assert choose_simhash_banding(500) == {"n_bands": None, "n_blocks": None}
    assert choose_simhash_banding(9_999_999) == {
        "n_bands": None, "n_blocks": None,
    }
    # above it: combination banding, smallest feasible block count
    c8 = choose_simhash_banding(100_000_000)
    assert c8["n_blocks"] is not None and c8["n_blocks"] >= 5
    # wider fingerprints allow fewer blocks at the same docs
    c64 = choose_simhash_banding(1_000_000_000, bits=64)
    assert c64["n_blocks"] is not None
    # 48-bit at 1e9 docs: no feasible b, still returns the argmin
    c48 = choose_simhash_banding(1_000_000_000, bits=48)
    assert c48["n_blocks"] is not None


def test_simhash_auto_banding_output_identical(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    auto = sorted(
        tuple(r)
        for r in simhash_pairs(docs, "doc_id", "text", cache=False).collect()
    )
    # forced combination banding at a pretend-1e8 corpus: the scheme
    # changes, the OUTPUT must not (both blockings lossless at h<=3)
    combi = sorted(
        tuple(r)
        for r in simhash_pairs(
            docs, "doc_id", "text", cache=False, n_docs=100_000_000
        ).collect()
    )
    simple = sorted(
        tuple(r)
        for r in simhash_pairs(
            docs, "doc_id", "text", cache=False, n_bands=4
        ).collect()
    )
    assert auto == simple == combi


# ---------------------------------------------------------------
# VERDICT r8 task 4: containment probe-prefilter auto-default.
# ---------------------------------------------------------------

def test_containment_prefilter_auto_matches_both_pins(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)   # 98%
    batch = docs.filter(F.col("doc_id") % 50 == 0)    # 2% -> auto ON
    outs = []
    for knob in (None, True, False):
        outs.append(sorted(
            tuple(r)
            for r in containment_pairs_incremental(
                corpus, batch, "doc_id", "text", n=3, threshold=0.6,
                prefilter_corpus_probes=knob,
            ).collect()
        ))
    assert outs[0] == outs[1] == outs[2]


# ---------------------------------------------------------------
# ADVICE r8 (low): simhash index append lifecycle.
# ---------------------------------------------------------------

def test_simhash_index_append_mode(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    c1 = docs.filter(F.col("doc_id") % 3 == 1)
    c2 = docs.filter(F.col("doc_id") % 3 == 2)
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    path = str(tmp_path / "sim_idx")
    simhash_index_build(c1, path, "doc_id", "text")
    simhash_index_build(c2, path, "doc_id", "text", mode="append")
    served = sorted(
        tuple(r)
        for r in simhash_join(
            path, batch, "doc_id", "text", corpus_is_index=True
        ).collect()
    )
    direct = sorted(
        tuple(r)
        for r in simhash_join(
            c1.unionByName(c2), batch, "doc_id", "text"
        ).collect()
    )
    assert served == direct


# ---------------------------------------------------------------
# plane constant extension (j >= 16) sanity.
# ---------------------------------------------------------------

def test_plane_ab_extension():
    from mlops_realtime_data_ingestion_spark.functions.hashing import (
        MINHASH_A,
        MINHASH_B,
        P,
        plane_ab,
    )

    for j in range(16):
        assert plane_ab(j) == (MINHASH_A[j], MINHASH_B[j])
    seen = set()
    for j in range(64):
        a, b = plane_ab(j)
        assert 0 < a < P and 0 <= b < P
        seen.add((a, b))
    assert len(seen) == 64  # no accidental plane collisions


def test_lsh_bucket_topk_impls_bit_identical(spark, sf_dir):
    from mlops_realtime_data_ingestion_spark.operators.similarity import (
        lsh_bucket_topk,
    )

    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < 5)
    a = sorted(tuple(r) for r in lsh_bucket_topk(emb, q, impl="pandas").collect())
    b = sorted(tuple(r) for r in lsh_bucket_topk(emb, q, impl="sql").collect())
    assert a == b and len(a) > 0


# ---------------------------------------------------------------
# sim_search_ivfpq_serve: the persisted-index serve row must be
# output-identical to the inline-retrain rerank row (deterministic
# training + exact parquet double round-trip), so sharing
# IVFPQ_RERANK_ORACLE verbatim is sound.
# ---------------------------------------------------------------

def test_ivfpq_serve_row_matches_inline_rerank_row(spark, sf_dir):
    from mlops_realtime_data_ingestion_spark.plans.curation_queries import (
        sim_search_ivfpq_rerank,
        sim_search_ivfpq_serve,
    )

    inline = sorted(map(tuple, sim_search_ivfpq_rerank(spark, sf_dir).collect()))
    served = sorted(map(tuple, sim_search_ivfpq_serve(spark, sf_dir).collect()))
    assert inline == served
    # second call serves from the process-level cache (no rebuild) —
    # keys are (sf_dir, data-fingerprint) tuples since round 10
    # (plans/index_cache.py)
    from mlops_realtime_data_ingestion_spark.plans import curation_queries as cq

    assert any(k[0] == sf_dir for k in cq._IVFPQ_INDEX_CACHE)
    again = sorted(map(tuple, sim_search_ivfpq_serve(spark, sf_dir).collect()))
    assert again == served


# ---------------------------------------------------------------
# ivfpq_index_update: build(c1) then append(c2) must be
# row-identical to a build over c1+c2 with quantizers trained on c1
# (frozen-quantizer semantics), and the registry lifecycle row must
# equal its own oracle's spelling.
# ---------------------------------------------------------------

def test_ivfpq_index_update_matches_frozen_training(spark, sf_dir, tmp_path):
    import os

    from mlops_realtime_data_ingestion_spark.operators.similarity import (
        _ivfpq_query,
        _ivfpq_train,
        ivfpq_build,
        ivfpq_index_update,
        ivfpq_search,
    )

    emb = _emb(spark, sf_dir)
    c1 = emb.filter(F.col("vec_id") % 5 != 0)
    c2 = emb.filter(F.col("vec_id") % 5 == 0)
    queries = emb.filter(F.col("vec_id") < 5)

    path = str(tmp_path / "idx")
    ivfpq_build(c1, path, dim=64, coarse_k=4, m=4, pq_k=8, iters=2, train_on=c1)
    ivfpq_index_update(spark, path, c2, dim=64, m=4)
    grown = sorted(map(tuple, ivfpq_search(
        spark, path, queries, dim=64, m=4, nprobe=2, k=5,
        rerank=20, vectors=emb,
    ).collect()))

    # reference: one-shot train-on-c1 over the full corpus
    assign, coarse, codes, books = _ivfpq_train(
        emb, 64, 4, 4, 8, 2, train_on=c1
    )
    from mlops_realtime_data_ingestion_spark.operators.similarity import (
        ivfpq_rerank,
    )
    ref_short = _ivfpq_query(assign, coarse, codes, books, queries,
                             64, 4, 2, 20)
    ref = sorted(map(tuple, ivfpq_rerank(
        ref_short, queries, emb, 5).collect()))
    assert grown == ref

    # the appended index has exactly one assign/code row per vector
    a = spark.read.parquet(os.path.join(path, "assign"))
    assert a.count() == a.select("vec_id").distinct().count() == emb.count()
