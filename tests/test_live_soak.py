"""Live-trigger soak: the two chained queries running CONTINUOUSLY
(no availableNow drain) against the rate source — the repo's analogue
of the reference's always-on Flink job (resources/flink/main.py:
105-120). Asserts >=3 micro-batches per query, finalized windows
reaching the feature store while the queries are still running, and
per-window freshness far inside the reference's 120 s budget
(BASELINE.md: one minute bucket must land within the next minute).

Window/watermark are shortened (10 s / 5 s) so finalized windows
appear within the test budget; the operators and plan shape are
identical to the production 1 min / 60 s configuration.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from mlops_realtime_data_ingestion_spark.sources.streaming import rate_tx_stream
from mlops_realtime_data_ingestion_spark.streaming.pipeline import (
    PipelineConfig,
    StreamingPipeline,
)

FRESHNESS_BUDGET_S = 120.0  # reference envelope (BASELINE.md)


def _wait(pred, timeout_s, poll=0.5, what=""):
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        if pred():
            return True
        time.sleep(poll)
    pytest.fail(f"timed out after {timeout_s}s waiting for {what}")


def test_live_trigger_soak(spark, tmp_path):
    cfg = PipelineConfig(
        feature_path=str(tmp_path / "soak_features"),
        checkpoint_root=str(tmp_path / "soak_ckpt"),
        bronze_path=str(tmp_path / "soak_bronze"),
        agg_watermark="5 seconds",
        window="10 seconds",
    )
    pipe = StreamingPipeline(cfg)
    typed = rate_tx_stream(spark, rows_per_second=50).select(
        "hash",
        F.timestamp_seconds("time").alias("tx_time"),
        F.col("fee").cast("double").alias("fee"),
    )

    ingest_q = pipe.start_ingest(typed, available_now=False)
    try:
        # agg's file stream needs the bronze dir to exist with data
        _wait(
            lambda: os.path.isdir(cfg.bronze_path)
            and any(
                f.endswith(".parquet") for f in os.listdir(cfg.bronze_path)
            ),
            timeout_s=30,
            what="first bronze file",
        )
        agg_q = pipe.start_aggregate(spark, available_now=False)
        try:
            # a finalized window lands once event time passes
            # window end + watermark (~15-25 s of live running)
            _wait(
                lambda: pipe.store.exists()
                and pipe.store.offline(spark).count() > 0,
                timeout_s=90,
                what="first finalized window in the feature store",
            )
            # keep running until both queries have done >=3 micro-batches
            _wait(
                lambda: (ingest_q.lastProgress or {}).get("batchId", 0) >= 3
                and (agg_q.lastProgress or {}).get("batchId", 0) >= 3,
                timeout_s=60,
                what=">=3 micro-batches on each query",
            )
            assert ingest_q.isActive and agg_q.isActive

            # freshness: put_batch stamps event_time=now() at sink time;
            # delay = materialization time - window end
            win = F.unix_timestamp("tx_minute") + F.lit(10.0)
            fresh = (
                pipe.store.offline(spark)
                .select((F.col("event_time") - win).alias("delay_s"))
                .agg(F.max("delay_s").alias("max_delay_s"))
                .collect()[0]["max_delay_s"]
            )
            assert fresh < FRESHNESS_BUDGET_S, f"freshness {fresh}s"
            # live windows really aggregated the rate stream
            row = (
                pipe.store.online_view(spark)
                .agg(F.sum("total_nb_trx_1min").alias("n"))
                .collect()[0]
            )
            assert row["n"] > 0
        finally:
            agg_q.stop()
            agg_q.awaitTermination(30)
    finally:
        ingest_q.stop()
        ingest_q.awaitTermination(30)
    assert not ingest_q.isActive and not agg_q.isActive  # clean stop
