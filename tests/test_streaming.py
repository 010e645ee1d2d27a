"""Golden streaming tests (SURVEY.md §5 strategy): deterministic
event files through the windowed pipeline — window rows, dedup,
idempotent upsert, checkpoint restart, late-data drop."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from mlops_realtime_data_ingestion_spark.streaming.feature_store import FeatureStore
from mlops_realtime_data_ingestion_spark.streaming.pipeline import (
    PipelineConfig,
    StreamingPipeline,
)
from mlops_realtime_data_ingestion_spark.sources.streaming import json_file_stream

BASE_US = 1704067200_000_000  # 2024-01-01 00:00:00 UTC in micros


def _event(eid: int, minute: float, value: float = 10.0) -> dict:
    return {
        "event_id": eid,
        "ts_micros": BASE_US + int(minute * 60_000_000),
        "user_id": eid % 5,
        "event_type": "view",
        "value": value,
        "props": "{}",
    }


def _write_jsonl(path: str, rows: list[dict]) -> None:
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _typed_stream(spark, src_dir: str):
    """events JSONL -> the pipeline's (hash, tx_time, fee) shape."""
    raw = json_file_stream(spark, src_dir)
    return raw.select(
        F.col("event_id").cast("string").alias("hash"),
        F.timestamp_micros(F.col("ts_micros")).alias("tx_time"),
        F.col("value").alias("fee"),
        "user_id",
        "event_type",
    )


def _pipeline(tmp_path, name: str) -> StreamingPipeline:
    return StreamingPipeline(
        PipelineConfig(
            feature_path=str(tmp_path / f"{name}_features"),
            checkpoint_root=str(tmp_path / f"{name}_ckpt"),
            bronze_path=str(tmp_path / f"{name}_bronze"),
        )
    )


def test_end_to_end_window_agg_and_dedup(spark, tmp_path):
    src = tmp_path / "src1"
    src.mkdir()
    # minutes 0..9: 3 events per minute; event 5 duplicated 3x (P1)
    rows = []
    eid = 0
    for m in range(10):
        for j in range(3):
            rows.append(_event(eid, m + j * 0.01, value=10.0 + m))
            eid += 1
    rows.append(_event(5, 1.02, 11.0))  # dup of eid=5
    rows.append(_event(5, 1.02, 11.0))
    # sentinel far ahead so the watermark finalizes minutes 0..9
    rows.append(_event(999, 30.0, 1.0))
    _write_jsonl(str(src / "a.jsonl"), rows)

    pipe = _pipeline(tmp_path, "e2e")
    pipe.run(_typed_stream(spark, str(src)), available_now=True)

    # bronze (S8) got the post-dedup stream: 30 + sentinel
    bronze = spark.read.parquet(pipe.config.bronze_path)
    assert bronze.count() == 31
    assert bronze.select("hash").distinct().count() == 31

    # finalized windows: every minute 0..9 has exactly 3 events
    online = pipe.store.online_view(spark)
    got = {
        r["tx_minute"].minute: (r["total_nb_trx_1min"], r["total_fee_1min"])
        for r in online.collect()
    }
    for m in range(10):
        assert got[m] == (3, 3 * (10.0 + m)), f"minute {m}: {got.get(m)}"


def test_checkpoint_restart_and_idempotent_upsert(spark, tmp_path):
    src = tmp_path / "src2"
    src.mkdir()
    rows1 = [_event(i, i * 0.3, 5.0) for i in range(20)]  # minutes 0..5.7
    rows1.append(_event(900, 20.0, 1.0))  # advance watermark
    _write_jsonl(str(src / "a.jsonl"), rows1)

    pipe = _pipeline(tmp_path, "restart")
    stream = _typed_stream(spark, str(src))
    pipe.run(stream, available_now=True)
    n_bronze_1 = spark.read.parquet(pipe.config.bronze_path).count()
    assert n_bronze_1 == 21

    # restart with one more file: old events must NOT be reprocessed
    rows2 = [_event(1000 + i, 21 + i * 0.3, 7.0) for i in range(10)]
    rows2.append(_event(901, 40.0, 1.0))
    _write_jsonl(str(src / "b.jsonl"), rows2)
    pipe2 = _pipeline(tmp_path, "restart")  # same paths/checkpoint
    pipe2.run(_typed_stream(spark, str(src)), available_now=True)

    bronze = spark.read.parquet(pipe.config.bronze_path)
    assert bronze.count() == 32  # 21 + 11, no reprocessing (T8)
    # upsert stayed idempotent: one online row per window (T5)
    online = pipe2.store.online_view(spark)
    assert online.groupBy("tx_minute").count().filter("count > 1").count() == 0


def test_late_data_dropped_beyond_watermark(spark, tmp_path):
    src = tmp_path / "src3"
    src.mkdir()
    rows1 = [_event(i, 0.1 + i * 0.01, 10.0) for i in range(5)]  # minute 0
    rows1.append(_event(500, 10.0, 1.0))  # watermark -> ~minute 9
    _write_jsonl(str(src / "a.jsonl"), rows1)

    pipe = _pipeline(tmp_path, "late")
    pipe.run(_typed_stream(spark, str(src)), available_now=True)
    online1 = {
        r["tx_minute"].minute: r["total_nb_trx_1min"]
        for r in pipe.store.online_view(spark).collect()
    }
    assert online1[0] == 5

    # a late event for minute 0 arrives after the watermark passed (T1)
    rows2 = [_event(600, 0.5, 99.0), _event(601, 11.0, 1.0)]
    _write_jsonl(str(src / "b.jsonl"), rows2)
    pipe.run(_typed_stream(spark, str(src)), available_now=True)

    online2 = {
        r["tx_minute"].minute: r["total_nb_trx_1min"]
        for r in pipe.store.online_view(spark).collect()
    }
    assert online2[0] == 5  # unchanged: late row dropped from the window


def test_feature_store_upsert_and_point_read(spark, tmp_path):
    store = FeatureStore(str(tmp_path / "fs"), key_col="k", event_time_col="et", partition_by_time=False)
    df1 = spark.createDataFrame([("a", 1.0, 10.0), ("b", 1.0, 20.0)], "k string, et double, v double")
    df2 = spark.createDataFrame([("a", 2.0, 11.0)], "k string, et double, v double")
    store.put_batch(df1)
    store.put_batch(df2)
    online = {r["k"]: r["v"] for r in store.online_view(spark).collect()}
    assert online == {"a": 11.0, "b": 20.0}  # last event_time wins (T5)
    assert store.offline(spark).count() == 3  # history append-only
    rec = store.get_record(spark, "a")
    assert len(rec) == 1 and rec[0]["v"] == 11.0


def test_feature_store_compaction(spark, tmp_path):
    store = FeatureStore(str(tmp_path / "fsc"), key_col="k", event_time_col="et", partition_by_time=False)
    for i in range(5):
        store.put_batch(
            spark.createDataFrame([(f"k{i}", float(i), float(i))], "k string, et double, v double")
        )
    before = store.offline(spark).collect()
    store.compact(spark, target_bytes=1 << 30)
    after = store.offline(spark).collect()
    assert sorted(map(tuple, before)) == sorted(map(tuple, after))
    files = [f for f in os.listdir(store.path) if f.endswith(".parquet")]
    assert len(files) == 1  # coalesced to ceil(size/target) = 1


def test_monitoring_alarm_and_threshold(spark):
    from mlops_realtime_data_ingestion_spark.streaming.monitoring import (
        alarm_state,
        update_threshold,
    )

    rows = [
        ("wql", "prod", v, f"2024-01-01 0{i}:00:00")
        for i, v in enumerate([0.1, 0.3, 0.31, 0.32, 0.1, 0.4])
    ]
    metrics = spark.createDataFrame(rows, "metric string, stage string, value double, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    alarms = alarm_state(metrics, "wql", threshold=0.24, consecutive_to_alarm=3).collect()
    assert len(alarms) == 1 and alarms[0]["island_len"] == 3

    assert update_threshold(0.2, 0.24, 0.5) == pytest.approx(0.22)
    assert update_threshold(0.3, 0.24, 0.5) == 0.24  # no update on regression
