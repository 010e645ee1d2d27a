"""In-stream drift monitor: per-micro-batch PSI vs a frozen baseline
lands in the metrics table and drives the consecutive-breach alarm."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from mlops_realtime_data_ingestion_spark.sources.streaming import json_file_stream
from mlops_realtime_data_ingestion_spark.streaming.drift_monitor import (
    DriftBaseline,
    attach_drift_monitor,
)
from mlops_realtime_data_ingestion_spark.streaming.monitoring import (
    MetricsTable,
    alarm_state,
)

BASE_US = 1704067200_000_000


def _rows(values, start_eid=0):
    return [
        {
            "event_id": start_eid + i,
            "ts_micros": BASE_US + i * 1_000_000,
            "user_id": i % 5,
            "event_type": "view",
            "value": v,
            "props": "{}",
        }
        for i, v in enumerate(values)
    ]


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_drift_monitor_scores_batches(spark, tmp_path):
    # baseline: uniform over 1..5
    ref = spark.createDataFrame(
        [(float(1 + i % 5),) for i in range(100)], "value double"
    )
    baseline = DriftBaseline.fit(ref, "value", bins=5)
    assert sum(baseline.counts) == 100

    src = tmp_path / "src"
    os.makedirs(src)
    # batch matching the baseline -> PSI ~ 0; shifted batch -> large
    _write_jsonl(str(src / "a.jsonl"), _rows([float(1 + i % 5) for i in range(50)]))
    _write_jsonl(str(src / "b.jsonl"), _rows([50.0] * 50, start_eid=1000))

    metrics = MetricsTable(str(tmp_path / "metrics"))
    typed = json_file_stream(spark, str(src)).select(
        F.col("value"), F.timestamp_micros(F.col("ts_micros")).alias("ts")
    )
    q = attach_drift_monitor(
        typed,
        baseline,
        metrics,
        value_col="value",
        ts_col="ts",
        checkpoint=str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(60)

    rows = metrics.read(spark).collect()
    assert len(rows) >= 1  # one metric row per non-empty batch
    scores = sorted(r["value"] for r in rows)
    # the drained batch(es) contain the shifted mass -> PSI breaches
    assert scores[-1] > 0.25
    # the alarm query consumes these rows directly
    alarms = alarm_state(
        metrics.read(spark), "input_psi", threshold=0.25,
        consecutive_to_alarm=1,
    )
    assert alarms.count() >= 1


def test_drift_baseline_psi_is_zero_on_itself(spark):
    ref = spark.createDataFrame(
        [(float(i % 10),) for i in range(1000)], "value double"
    )
    baseline = DriftBaseline.fit(ref, "value", bins=10)
    assert abs(baseline.psi(baseline.counts)) < 1e-12
