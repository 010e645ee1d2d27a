"""Streaming sources (SURVEY.md §2.1 S1/S6).

The reference's hot path is Kinesis JSON with an explicit DDL schema
(resources/flink/main.py:57-86, 'format'='json', TRIM_HORIZON start).
Spark form: ``spark.readStream`` with an explicit StructType — a
file-backed JSON stream for tests/replays (full-backlog start ==
TRIM_HORIZON, T4) and a rate-source emulation of the 15 s HTTP poller
(S1) for soak runs. In production the same plan binds to any
``readStream`` connector (kafka/kinesis/socket) without changes —
the source is the only swap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import TRANSACTION_SCHEMA

__all__ = ["json_file_stream", "rate_tx_stream", "EVENTS_JSON_SCHEMA"]

# The events stand-in stream (driver testdata), serialized as JSONL.
EVENTS_JSON_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts_micros", T.LongType()),  # event time, epoch micros
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def json_file_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType = EVENTS_JSON_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-backed JSON stream with explicit schema (S6). Reading the
    existing backlog first == TRIM_HORIZON (T4). ``maxFilesPerTrigger``
    bounds micro-batch size (the reference's batching knob analogue,
    §4 backpressure row)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)


def json_stream_with_dead_letter(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """S6 + T7 (poison handling): schema'd JSON stream in PERMISSIVE
    mode with the raw text of unparseable records captured in
    ``_corrupt`` — split downstream with :func:`split_dead_letter`.
    The reference acks poison records instead of crashing
    (analytics_to_featurestore/main.py:53-55); the Spark analogue is
    route-don't-drop: corrupt rows flow to a dead-letter sink for
    replay, valid rows continue."""
    full = schema.add("_corrupt", T.StringType())
    reader = (
        spark.readStream.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)


def split_dead_letter(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(valid, dead): valid rows without the marker column; dead rows
    as (raw_record) for a replayable dead-letter sink. Use inside
    foreachBatch so ONE scan feeds both sinks."""
    valid = df.filter(F.col("_corrupt").isNull()).drop("_corrupt")
    dead = df.filter(F.col("_corrupt").isNotNull()).select(
        F.col("_corrupt").alias("raw_record")
    )
    return valid, dead


def rate_tx_stream(spark: SparkSession, rows_per_second: int = 7) -> DataFrame:
    """S1 emulation: the poller's ~6.7 rec/s steady state
    (BASELINE.md derived rate) as a rate source shaped like the
    transaction schema (resources/flink/main.py:58-77)."""
    rate = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    cols = [
        F.sha2(F.col("value").cast("string"), 256).alias("hash"),
        F.lit(1).alias("ver"),
        (F.col("value") % 10 + 1).cast("int").alias("vin_sz"),
        (F.col("value") % 7 + 1).cast("int").alias("vout_sz"),
        (F.col("value") % 1000 + 200).cast("int").alias("size"),
        (F.col("value") % 4000 + 800).cast("int").alias("weight"),
        (F.col("value") % 500 + 10).cast("int").alias("fee"),
        F.lit("0.0.0.0").alias("relayed_by"),
        F.lit(0).alias("lock_time"),
        F.col("value").alias("tx_index"),
        F.lit(False).alias("double_spend"),
        F.unix_timestamp("timestamp").alias("time"),
        F.lit(0).cast("long").alias("block_index"),
        F.lit(0).cast("long").alias("block_height"),
        F.lit("[]").alias("inputs"),
        F.lit("[]").alias("out"),
        F.lit(False).alias("rbf"),
    ]
    out = rate.select(*cols)
    assert out.schema.fieldNames() == TRANSACTION_SCHEMA.fieldNames()
    return out
