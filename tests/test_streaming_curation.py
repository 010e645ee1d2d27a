"""Streaming curation sink: classifier quality gate + exact dedup
against a persisted fingerprint index, per-batch metrics, idempotent
replays."""

from __future__ import annotations

import os

from mlops_realtime_data_ingestion_spark.operators.curation import KNUTH, WP
from mlops_realtime_data_ingestion_spark.streaming.curation_pipeline import (
    StreamingCuration,
)

_P = 1_000_000_007


def _weight(word: str) -> int:
    h = 0
    for ch in word:
        h = (h * 31 + ord(ch)) % _P
    return ((h % 256) * KNUTH) % WP % 2001 - 1000


def _text(sign: int, n: int = 6, salt: str = "") -> str:
    """n distinct words whose classifier weights all have ``sign``."""
    out, i = [], 0
    while len(out) < n:
        w = f"tok{salt}{i}"
        if (_weight(w) >= 0) == (sign > 0):
            out.append(w)
        i += 1
    return " ".join(out)


def _drain(spark, sc, input_dir):
    stream = spark.readStream.schema("doc_id long, text string").parquet(input_dir)
    q = sc.attach(stream, available_now=True)
    q.awaitTermination(120)


def test_streaming_curation_end_to_end(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    os.makedirs(input_dir)
    sc = StreamingCuration(str(tmp_path / "cur"))

    good1, good2, bad = _text(+1, salt="a"), _text(+1, salt="b"), _text(-1, salt="c")
    batch1 = [(1, good1), (2, good2), (3, bad), (4, good1)]  # 4 = intra dup of 1
    spark.createDataFrame(batch1, "doc_id long, text string").coalesce(1).write.mode(
        "append"
    ).parquet(input_dir)
    _drain(spark, sc, input_dir)

    assert sorted(r["doc_id"] for r in sc.accepted(spark).collect()) == [1, 2]
    rej = {r["doc_id"]: r["reason"] for r in sc.rejected(spark).collect()}
    assert rej == {3: "quality", 4: "dup_intra"}
    m = sc.metrics(spark).collect()[0]
    assert (m["n_in"], m["n_quality_rejected"], m["n_dup_rejected"], m["n_accepted"]) == (
        4, 1, 1, 2,
    )

    # batch 2: corpus dup of doc 1, one new good doc, one bad doc
    good3 = _text(+1, salt="d")
    batch2 = [(10, good1), (11, good3), (12, _text(-1, salt="e"))]
    spark.createDataFrame(batch2, "doc_id long, text string").coalesce(1).write.mode(
        "append"
    ).parquet(input_dir)
    _drain(spark, sc, input_dir)

    assert sorted(r["doc_id"] for r in sc.accepted(spark).collect()) == [1, 2, 11]
    rej = {r["doc_id"]: r["reason"] for r in sc.rejected(spark).collect()}
    assert rej[10] == "dup_corpus" and rej[12] == "quality"
    # index holds exactly the accepted docs' fingerprints
    idx = spark.read.parquet(sc.index_path)
    assert sorted(r["id"] for r in idx.collect()) == [1, 2, 11]


def test_streaming_curation_replay_is_idempotent(spark, tmp_path):
    """A crash after the index write but before the checkpoint commit
    re-delivers the batch with the SAME batch_id: outputs must be
    rewritten identically — no double-append, and the batch must not
    reject itself against its own just-written fingerprints."""
    sc = StreamingCuration(str(tmp_path / "cur"))
    b0 = spark.createDataFrame(
        [(1, _text(+1, salt="a")), (2, _text(+1, salt="b"))],
        "doc_id long, text string",
    )
    sc.process_batch(b0, 0)
    b1 = spark.createDataFrame(
        [(10, _text(+1, salt="a")), (11, _text(+1, salt="z"))],
        "doc_id long, text string",
    )
    for _ in range(3):  # original delivery + two replays
        sc.process_batch(b1, 1)
        acc = sorted(r["doc_id"] for r in sc.accepted(spark).collect())
        assert acc == [1, 2, 11]
        rej = {r["doc_id"]: r["reason"] for r in sc.rejected(spark).collect()}
        assert rej == {10: "dup_corpus"}
        assert sorted(r["id"] for r in spark.read.parquet(sc.index_path).collect()) == [
            1, 2, 11,
        ]
        m = {r["batch_id"]: r for r in sc.metrics(spark).collect()}
        assert m[1]["n_accepted"] == 1 and m[1]["n_dup_rejected"] == 1
