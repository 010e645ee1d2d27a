"""S1: the rate-source emulation of the reference's 15s HTTP poller
produces schema-correct transaction rows continuously."""

from __future__ import annotations

import time

from mlops_realtime_data_ingestion_spark.schemas import TRANSACTION_SCHEMA
from mlops_realtime_data_ingestion_spark.sources.streaming import rate_tx_stream


def test_rate_tx_stream_produces_schema_rows(spark, tmp_path):
    stream = rate_tx_stream(spark, rows_per_second=50)
    assert stream.isStreaming
    assert stream.schema.fieldNames() == TRANSACTION_SCHEMA.fieldNames()

    q = (
        stream.writeStream.format("memory")
        .queryName("rate_probe")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 30
        n = 0
        while time.time() < deadline:
            n = spark.sql("SELECT count(*) AS n FROM rate_probe").collect()[0]["n"]
            if n > 0:
                break
            time.sleep(1)
        assert n > 0
        row = spark.sql("SELECT * FROM rate_probe LIMIT 1").collect()[0]
        assert len(row["hash"]) == 64  # sha2-256 hex
        assert row["fee"] >= 10
    finally:
        q.stop()
