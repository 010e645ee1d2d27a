"""Gap backfill: missing feature-store minutes recomputed from bronze
match what the pipeline would have produced; present minutes are left
alone; repeat runs are no-ops."""

from __future__ import annotations

from pyspark.sql import functions as F

from mlops_realtime_data_ingestion_spark.streaming.backfill import (
    backfill_gaps,
    find_gaps,
)
from mlops_realtime_data_ingestion_spark.streaming.feature_store import FeatureStore


def _bronze(spark):
    # three minutes of data, 2 + 3 + 1 events
    rows = [
        ("h1", "2024-01-01 00:00:10", 1.0),
        ("h2", "2024-01-01 00:00:50", 3.0),
        ("h3", "2024-01-01 00:01:05", 5.0),
        ("h4", "2024-01-01 00:01:30", 7.0),
        ("h5", "2024-01-01 00:01:55", 9.0),
        ("h6", "2024-01-01 00:02:40", 11.0),
    ]
    return spark.createDataFrame(rows, "hash string, ts string, fee double").select(
        "hash", F.to_timestamp("ts").alias("tx_time"), "fee"
    )


def test_backfill_fills_only_missing_minutes(spark, tmp_path):
    store = FeatureStore(str(tmp_path / "fs"))
    bronze = _bronze(spark)
    # seed the store with ONLY minute 00:01 (a sentinel value proves
    # backfill never touches present minutes)
    store.put_batch(
        spark.createDataFrame(
            [("2024-01-01 00:01:00", 999, 999.0, 999.0)],
            "m string, total_nb_trx_1min long, total_fee_1min double, avg_fee_1min double",
        ).select(
            F.to_timestamp("m").alias("tx_minute"),
            "total_nb_trx_1min",
            "total_fee_1min",
            "avg_fee_1min",
        )
    )
    assert find_gaps(spark, store, bronze).count() == 2

    assert backfill_gaps(spark, store, bronze) == 2
    latest = {
        str(r["tx_minute"]): (
            r["total_nb_trx_1min"], r["total_fee_1min"], r["avg_fee_1min"]
        )
        for r in store.online_view(spark).collect()
    }
    assert latest["2024-01-01 00:00:00"] == (2, 4.0, 2.0)
    assert latest["2024-01-01 00:02:00"] == (1, 11.0, 11.0)
    assert latest["2024-01-01 00:01:00"] == (999, 999.0, 999.0)  # untouched

    # idempotent: nothing left to repair
    assert backfill_gaps(spark, store, bronze) == 0


def test_backfill_from_empty_store(spark, tmp_path):
    store = FeatureStore(str(tmp_path / "fs2"))
    bronze = _bronze(spark)
    assert backfill_gaps(spark, store, bronze) == 3
    assert store.offline(spark).count() == 3
