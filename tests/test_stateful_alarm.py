"""Golden test for the applyInPandasWithState consecutive-breach
alarm (model-monitor-template.yml:786-795 semantics): the counter
must persist ACROSS micro-batches (maxFilesPerTrigger=1 forces one
batch per file) and reset on recovery.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from mlops_realtime_data_ingestion_spark.streaming.stateful import (
    consecutive_breach_alarm,
)

METRIC_JSON_SCHEMA = T.StructType(
    [
        T.StructField("metric", T.StringType()),
        T.StructField("ts_micros", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)

BASE_US = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC


def _write_batch(path: str, rows: list[tuple[str, int, float]], mtime: int) -> None:
    with open(path, "w") as f:
        for metric, hour, value in rows:
            f.write(
                json.dumps(
                    {
                        "metric": metric,
                        "ts_micros": BASE_US + hour * 3_600_000_000,
                        "value": value,
                    }
                )
                + "\n"
            )
    os.utime(path, (mtime, mtime))


def test_alarm_counter_survives_microbatch_boundary(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    # batch 1: wql breaches twice (threshold 0.24) then ends — counter=2.
    # rmse stays healthy throughout.
    _write_batch(
        str(src / "b1.json"),
        [
            ("wql", 0, 0.30),
            ("wql", 1, 0.29),
            ("rmse", 0, 0.10),
            ("rmse", 1, 0.12),
        ],
        mtime=1_000_000,
    )
    # batch 2: third consecutive breach -> transition row; then a
    # recovery resets, and two more breaches do NOT re-alarm (need 3).
    _write_batch(
        str(src / "b2.json"),
        [
            ("wql", 2, 0.28),
            ("wql", 3, 0.10),
            ("wql", 4, 0.31),
            ("wql", 5, 0.32),
            ("rmse", 2, 0.11),
        ],
        mtime=2_000_000,
    )

    stream = (
        spark.readStream.schema(METRIC_JSON_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .select(
            "metric",
            F.timestamp_micros("ts_micros").alias("ts"),
            "value",
        )
    )
    alarms = consecutive_breach_alarm(stream, threshold=0.24, n_breaches=3)
    q = (
        alarms.writeStream.format("memory")
        .queryName("alarm_sink")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = spark.sql(
        "SELECT metric, hour(ts) AS h, consecutive, transition "
        "FROM alarm_sink ORDER BY metric, h"
    ).collect()
    got = [tuple(r) for r in rows]
    # only the hour-2 point alarms: counter 2 (batch 1) + 1 (batch 2)
    assert got == [("wql", 2, 3, True)]


def test_alarm_emits_every_point_while_in_alarm(spark, tmp_path):
    src = tmp_path / "src2"
    src.mkdir()
    _write_batch(
        str(src / "b1.json"),
        [("wql", h, 0.30) for h in range(5)],
        mtime=1_000_000,
    )
    stream = (
        spark.readStream.schema(METRIC_JSON_SCHEMA)
        .json(str(src))
        .select("metric", F.timestamp_micros("ts_micros").alias("ts"), "value")
    )
    alarms = consecutive_breach_alarm(stream, threshold=0.24, n_breaches=3)
    q = (
        alarms.writeStream.format("memory")
        .queryName("alarm_sink2")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT hour(ts) AS h, consecutive, transition FROM alarm_sink2 ORDER BY h"
    ).collect()
    assert [tuple(r) for r in rows] == [(2, 3, True), (3, 4, False), (4, 5, False)]
