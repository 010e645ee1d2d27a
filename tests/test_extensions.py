"""Extension-operator tests: pandas/SQL hash bit-equality, LSH
recall vs exact, IVF accuracy vs brute force, multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mlops_realtime_data_ingestion_spark.functions import hashing as H
from mlops_realtime_data_ingestion_spark.functions import hashing_pandas as HP
from mlops_realtime_data_ingestion_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    with_shingle_hashes,
)
from mlops_realtime_data_ingestion_spark.operators.multimodal import (
    attach_binary,
    decode_features,
    sniff_format,
)
from mlops_realtime_data_ingestion_spark.operators.similarity import cosine_topk, ivf_topk
from mlops_realtime_data_ingestion_spark.sources.batch import load_table


def test_pandas_sql_hash_bit_equality(spark, sf_dir):
    """The vectorized numpy hashing must equal the interpreted SQL
    spelling bit-for-bit — this is what licenses the fast path against
    the DuckDB oracles."""
    docs = load_table(spark, sf_dir, "documents")
    a = with_shingle_hashes(docs, "doc_id", "text", n=2, impl="pandas")
    b = with_shingle_hashes(docs, "doc_id", "text", n=2, impl="sql")
    merged = a.alias("a").join(b.alias("b"), "id").select(
        "id",
        (F.col("a.sh") == F.sort_array(F.col("b.sh"))).alias("eq_sorted"),
    )
    bad = merged.filter(~F.col("eq_sorted")).count()
    assert bad == 0

    sa = simhash_fingerprints(docs, "doc_id", "text", impl="pandas")
    sb = simhash_fingerprints(docs, "doc_id", "text", impl="sql")
    diff = (
        sa.alias("a")
        .join(sb.alias("b"), "id")
        .filter(F.col("a.simhash") != F.col("b.simhash"))
        .count()
    )
    assert diff == 0
    assert sa.count() == sb.count()


def test_scalar_hash_reference_values():
    # cross-checked against both engines' fold in plans oracles
    assert HP.str_hash("the") == 114801
    assert HP.str_hash("") == 0
    th = HP.token_hashes("  The fast  dog ")
    assert list(th) == [HP.str_hash("the"), HP.str_hash("fast"), HP.str_hash("dog")]
    sh = HP.shingle_hashes(np.array([1, 2, 3], dtype=np.int64), 2)
    assert list(sh) == [(1 * 31 + 2) % H.P, (2 * 31 + 3) % H.P]


def test_minhash_finds_planted_near_dups(spark, sf_dir):
    """Every blocked-Jaccard pair must also be found by MinHash-LSH
    (the planted near-dups have jaccard ~0.99 => band-collision
    probability ~1-(1-0.99^4)^4 ~ 1.0)."""
    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r["doc_id_1"], r["doc_id_2"])
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", threshold=0.8, block_cols=("lang",)
        ).collect()
    }
    lsh = {
        (r["doc_id_1"], r["doc_id_2"])
        for r in minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.8).collect()
    }
    assert exact <= lsh
    assert len(lsh) >= len(exact)


def test_prefix_filter_is_lossless(spark, sf_dir):
    """PPJoin prefix filtering must return EXACTLY the plain block
    join's pair set (it only prunes candidates that cannot pass the
    threshold)."""
    docs = load_table(spark, sf_dir, "documents")
    kwargs = dict(
        id_col="doc_id", text_col="text", threshold=0.5, block_cols=("lang",)
    )
    # block_cap=0 forces EVERY block through the prefix path
    fast = {
        (r["doc_id_1"], r["doc_id_2"], r["jaccard"])
        for r in ngram_jaccard_pairs(
            docs, prefix_filter=True, block_cap=0, **kwargs
        ).collect()
    }
    plain = {
        (r["doc_id_1"], r["doc_id_2"], r["jaccard"])
        for r in ngram_jaccard_pairs(docs, prefix_filter=False, **kwargs).collect()
    }
    assert fast == plain
    assert len(fast) > 0  # planted near-dups exist in the testdata
    # the adaptive default (mixed small/large blocks) agrees too
    adaptive = {
        (r["doc_id_1"], r["doc_id_2"], r["jaccard"])
        for r in ngram_jaccard_pairs(docs, block_cap=40, **kwargs).collect()
    }
    assert adaptive == plain


def test_minhash_hot_band_guard(spark):
    """Adversarial corpus: many identical docs collapse every band
    into one hot bucket. With bucket_cap forcing the self-join path,
    the operator must still complete and return exactly the all-pairs
    set; and the guarded result must equal the cold-path result."""
    n = 60
    docs = spark.createDataFrame(
        [(i, "the same boilerplate text repeated everywhere") for i in range(n)],
        "doc_id int, text string",
    )
    hot = minhash_lsh_pairs(
        docs, "doc_id", "text", threshold=0.9, bucket_cap=5
    ).collect()
    assert len(hot) == n * (n - 1) // 2
    assert all(r["jaccard"] == 1.0 for r in hot)
    cold = minhash_lsh_pairs(
        docs, "doc_id", "text", threshold=0.9, bucket_cap=10_000
    ).collect()
    assert sorted((r["doc_id_1"], r["doc_id_2"]) for r in hot) == sorted(
        (r["doc_id_1"], r["doc_id_2"]) for r in cold
    )


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    """IVF contract: probing all cells IS brute force; fewer cells
    trades recall for an nprobe/n_cells scan reduction. (The testdata
    labels are weak clusters — true neighbors spread across labels —
    so partial-probe recall is genuinely modest here.)"""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk(emb, queries, k=5).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}

    full = ivf_topk(emb, queries, assign_col="label", k=5, nprobe=10).collect()
    full_set = {(r["query_id"], r["neighbor_id"]) for r in full}
    assert full_set == exact_set  # nprobe = n_cells => exact

    approx = ivf_topk(emb, queries, assign_col="label", k=5, nprobe=3).collect()
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert 0.1 <= recall <= 1.0, f"IVF recall {recall}"
    assert len(approx) == len(exact)  # k answers per query regardless


def test_multimodal_decode_plumbing(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    with_bin = attach_binary(docs)
    sniffed = sniff_format(with_bin)
    rows = sniffed.select("doc_id", "payload_len", "format").collect()
    assert all(r["payload_len"] > 0 for r in rows)
    assert all(r["format"] == "unknown" for r in rows)  # utf-8 text, no magic

    feats = decode_features(sniffed, target_partitions=4).collect()
    assert len(feats) == 50
    for r in feats:
        assert r["n_chunks"] == -(-r["payload_len"] // 64)
        assert len(r["feature"]) == r["n_chunks"]
        assert 0 <= r["mean_byte"] <= 255


def test_magic_byte_sniff(spark):
    payloads = [
        (1, bytes.fromhex("89504e470d0a1a0a") + b"xxxx"),
        (2, bytes.fromhex("ffd8ffe0") + b"jfif"),
        (3, b"plain text"),
    ]
    df = spark.createDataFrame(payloads, "id int, payload binary")
    got = {r["id"]: r["format"] for r in sniff_format(df).collect()}
    assert got == {1: "png", 2: "jpeg", 3: "unknown"}


def test_frame_sample_fanout_and_tail(spark):
    from mlops_realtime_data_ingestion_spark.operators.multimodal import frame_sample

    payloads = [(1, bytes(range(200))), (2, b"tiny"), (3, None)]
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    rows = frame_sample(df, frame_bytes=64, every_k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: 200 B -> frames 0..3, sampled {0, 2}; tail frame 3 dropped
    assert [r["frame_idx"] for r in sorted(by_doc[1], key=lambda r: r["frame_idx"])] == [0, 2]
    assert by_doc[1][0]["frame_len"] == 64
    assert by_doc[1][0]["frame_hex"] == bytes(range(64)).hex()
    # doc 2: single short frame, exact tail length
    assert by_doc[2][0]["frame_len"] == 4 and by_doc[2][0]["frame_hex"] == b"tiny".hex()
    # doc 3: null payload contributes nothing
    assert 3 not in by_doc


def test_resize_fixed_width_contract(spark):
    from mlops_realtime_data_ingestion_spark.operators.multimodal import resize_stub

    payloads = [(1, bytes(range(256))), (2, b"ab"), (3, b""), (4, None)]
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    rows = {r["doc_id"]: r["resized"] for r in resize_stub(df, target=8).collect()}
    assert all(len(v) == 8 for v in rows.values())  # fixed width, any input
    # 256 evenly-spread bytes: bucket means are the 32-byte segment means
    assert rows[1][0] == float(sum(range(32))) / 32
    assert rows[3] == [0.0] * 8 and rows[4] == [0.0] * 8


def test_resize_buckets_matches_array_contract(spark):
    """The flat (doc, bucket) spelling must agree bucket-by-bucket
    with resize_stub's array output (same boundaries, same means);
    empty/null payloads yield no bucket rows."""
    from mlops_realtime_data_ingestion_spark.operators.multimodal import (
        resize_buckets,
        resize_stub,
    )

    payloads = [(1, bytes(range(256))), (2, b"ab"), (3, b""), (4, None)]
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    arrays = {r["doc_id"]: r["resized"] for r in resize_stub(df, target=8).collect()}
    flat = resize_buckets(df, target=8).collect()
    assert {r["doc_id"] for r in flat} == {1, 2}  # empty/null dropped
    for r in flat:
        assert r["bucket_mean"] == arrays[r["doc_id"]][r["bucket"]]
        assert r["bucket_sum"] >= 0 and r["bucket_len"] >= 1
