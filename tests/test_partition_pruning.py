"""Partition pruning on the hive-partitioned offline feature store —
the §4 optimizer property that replaces the reference's manual
year/month/day/hour directory walk (FeatureStoreAggregateParquet.py:
40-58): a time-bounded query must read ONLY the matching partition
directories, via Catalyst, with no hand-listing."""

from __future__ import annotations

from pyspark.sql import functions as F

from mlops_realtime_data_ingestion_spark.streaming.feature_store import FeatureStore


def _store_with_three_days(spark, tmp_path):
    store = FeatureStore(str(tmp_path / "fs_part"), key_col="k", event_time_col="et")
    rows = [
        (f"2024-01-0{d} {h:02d}:00:00", float(d * 100 + h))
        for d in (1, 2, 3)
        for h in (0, 12)
    ]
    batch = (
        spark.createDataFrame(rows, "k_str string, v double")
        .select(F.to_timestamp("k_str").alias("k"), "v")
        .withColumn("et", F.lit(1.0))
    )
    store.put_batch(batch)
    return store


def test_day_filter_prunes_partitions(spark, tmp_path):
    store = _store_with_three_days(spark, tmp_path)
    full = store.offline(spark)
    one_day = full.filter((F.col("year") == 2024) & (F.col("month") == 1) & (F.col("day") == 2))
    assert one_day.count() == 2
    # the predicates land in the scan's PartitionFilters (directory
    # pruning), NOT as a post-scan row Filter
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters", 1)[1][:300]
    assert "day" in pf and "month" in pf and "year" in pf


def test_compaction_preserves_partitions_and_pruning(spark, tmp_path):
    """S12 compaction must keep the year/month/day/hour hive layout —
    a time-bounded query still hits PartitionFilters afterwards."""
    import os

    store = _store_with_three_days(spark, tmp_path)
    # second append => multiple files per partition pre-compaction
    store.put_batch(
        spark.createDataFrame([("2024-01-02 12:00:00", 999.0)], "k_str string, v double")
        .select(F.to_timestamp("k_str").alias("k"), "v")
        .withColumn("et", F.lit(2.0))
    )
    before = sorted(map(tuple, store.offline(spark).collect()))
    store.compact(spark, target_bytes=1 << 30)
    after = sorted(map(tuple, store.offline(spark).collect()))
    assert before == after
    # hive dirs survived
    assert any(n.startswith("year=") for n in os.listdir(store.path))
    # each partition coalesced to ceil(bytes/1GiB) = 1 file
    for key, _ in store._partition_sizes().items():
        d = os.path.join(
            store.path,
            *(f"{c}={v}" for c, v in zip(("year", "month", "day", "hour"), key)),
        )
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, (key, files)
    # pruning still works
    one_day = store.offline(spark).filter(
        (F.col("year") == 2024) & (F.col("month") == 1) & (F.col("day") == 2)
    )
    assert one_day.count() == 3
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters", 1)[1][:300]
    assert "day" in pf


def test_hour_filter_prunes_within_day(spark, tmp_path):
    store = _store_with_three_days(spark, tmp_path)
    narrow = store.offline(spark).filter(
        (F.col("day") == 1) & (F.col("hour") == 12)
    )
    assert narrow.count() == 1
    plan = narrow._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters", 1)[1][:300]
    assert "hour" in pf and "day" in pf
