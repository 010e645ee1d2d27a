"""Streaming queries for the registry — the continuous pipeline run
in availableNow (backlog-drain) mode over the driver's events table.

Non-SQL-expressible (stateful streaming semantics: watermark dedup,
finalized-window emission, checkpointed upsert) -> rows-only driver
check; the semantics themselves are golden-tested in
tests/test_streaming.py against batch analogues.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.batch import load_table
from ..sources.streaming import json_file_stream
from ..streaming.pipeline import PipelineConfig, StreamingPipeline
from .spec import QuerySpec


def streaming_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end: events (first 3 days) -> JSONL backlog -> dedup ->
    bronze -> 1-min windowed agg -> feature-store upsert -> online
    view. Returns the online latest-per-window records (the
    reference's feature-group content, agg-fg-schema.json:3-34)."""
    tmp = tempfile.mkdtemp(prefix="spark_stream_e2e_")
    # streaming state partitions are fixed at first checkpoint: pin to
    # the core count rather than inheriting a harness default of 200
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", spark.sparkContext.defaultParallelism
    )
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit("2024-01-04 00:00:00")
    )
    (
        ev.select(
            "event_id",
            F.unix_micros("ts").alias("ts_micros"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
        .coalesce(4)
        .write.mode("overwrite")
        .json(f"{tmp}/src")
    )
    raw = json_file_stream(spark, f"{tmp}/src")
    typed = raw.select(
        F.col("event_id").cast("string").alias("hash"),
        F.timestamp_micros("ts_micros").alias("tx_time"),
        F.col("value").alias("fee"),
    )
    pipe = StreamingPipeline(
        PipelineConfig(
            feature_path=f"{tmp}/features",
            checkpoint_root=f"{tmp}/ckpt",
            bronze_path=f"{tmp}/bronze",
        )
    )
    try:
        pipe.run(typed, available_now=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return pipe.store.online_view(spark).select(
        "tx_minute", "total_nb_trx_1min", "total_fee_1min", "avg_fee_1min", "event_time"
    )


SPECS: dict[str, QuerySpec] = {
    "streaming_pipeline_e2e": QuerySpec(streaming_pipeline_e2e, None, "§3.1,T1-T8 (stateful)"),
}
