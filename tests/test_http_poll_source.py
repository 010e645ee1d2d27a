"""The S1 HTTP poller as a Python Data Source (sources/http_poll):
batch backfill partitioning, streaming offsets, replay determinism,
and the full poll→dedup→window pipeline over it.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from mlops_realtime_data_ingestion_spark.schemas import TRANSACTION_SCHEMA
from mlops_realtime_data_ingestion_spark.sources.http_poll import (
    fake_poll_rows,
    register,
)


def test_batch_backfill_schema_and_partitioning(spark):
    register(spark)
    df = (
        spark.read.format("blockchain_poll")
        .option("num_polls", 5)
        .option("per_poll", 40)
        .load()
    )
    assert df.schema.fieldNames() == TRANSACTION_SCHEMA.fieldNames()
    assert df.count() == 200
    # one partition per poll — a backfill fans out poll-wide
    assert df.rdd.getNumPartitions() == 5
    # ~5% duplicate hashes injected for dedup exercises
    distinct = df.select("hash").distinct().count()
    assert distinct == 200 - 2 * 5  # 2 dups per 40-tx poll


def test_stream_advances_one_poll_per_batch_and_replays(spark, tmp_path):
    register(spark)
    stream = (
        spark.readStream.format("blockchain_poll")
        .option("per_poll", 30)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("poll_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.sql("SELECT count(*) c FROM poll_sink").first().c >= 90:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    n = spark.sql("SELECT count(*) c FROM poll_sink").first().c
    assert n >= 90 and n % 30 == 0  # whole polls only
    # offset determinism: the stream's poll 0 == the generator's poll 0
    got = {
        tuple(r)
        for r in spark.sql(
            "SELECT hash, tx_index FROM poll_sink WHERE tx_index < 30"
        ).collect()
    }
    want = {(r[0], r[9]) for r in fake_poll_rows(0, 30, "graft")}
    assert got == want


def test_poll_pipeline_dedup_and_window(spark):
    register(spark)
    df = (
        spark.read.format("blockchain_poll")
        .option("num_polls", 8)
        .option("per_poll", 100)
        .load()
    )
    agg = (
        df.dropDuplicates(["hash"])
        .withColumn("tx_time", F.to_timestamp(F.from_unixtime("time")))
        .groupBy(F.window("tx_time", "1 minute").alias("w"))
        .agg(
            F.count("hash").alias("total_nb_trx_1min"),
            F.sum("fee").alias("total_fee_1min"),
            F.avg("fee").alias("avg_fee_1min"),
        )
    )
    rows = agg.collect()
    # 8 polls x 15s = 2 minutes of traffic (+ one late-arrival minute)
    assert len(rows) >= 2
    assert sum(r.total_nb_trx_1min for r in rows) == 8 * 100 - 8 * 5
