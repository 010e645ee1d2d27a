"""Vacuum (orphan sweep + commit-log checkpoint) and the mergeable
histogram quantile sketch."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mlops_realtime_data_ingestion_spark.operators.sketches import hist_quantiles
from mlops_realtime_data_ingestion_spark.streaming.feature_store import FeatureStore


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "k_str string, et double, v double"
    ).select(F.to_timestamp("k_str").alias("k"), "et", "v")


# ---------- vacuum ----------

def test_vacuum_removes_orphans_only(spark, tmp_path):
    store = FeatureStore(str(tmp_path / "v1"), key_col="k", event_time_col="et")
    store.put_batch(_batch(spark, [("2024-01-01 00:01:00", 1.0, 10.0)]))
    store.put_batch(_batch(spark, [("2024-01-01 01:01:00", 1.0, 20.0)]))
    before = store.offline(spark).count()

    # a crashed writer's uncommitted file: appended but never committed
    orphan_src = _batch(spark, [("2024-01-01 02:01:00", 1.0, 99.0)]).withColumn(
        "year", F.lit(2024)
    )
    orphan_dir = os.path.join(store.path, "_orphan_stage")
    orphan_src.coalesce(1).write.parquet(orphan_dir)
    part = next(f for f in os.listdir(orphan_dir) if f.endswith(".parquet"))
    os.replace(
        os.path.join(orphan_dir, part), os.path.join(store.path, "stray.parquet")
    )
    import shutil

    shutil.rmtree(orphan_dir)

    report = store.vacuum(keep_versions=10)
    assert report["orphans_removed"] == ["stray.parquet"]
    assert report["manifests_squashed"] == 0
    assert store.offline(spark).count() == before  # committed data intact
    assert store.versions() == [0, 1]


def test_vacuum_checkpoints_log_and_preserves_retained_versions(spark, tmp_path):
    store = FeatureStore(str(tmp_path / "v2"), key_col="k", event_time_col="et")
    for i in range(6):
        store.put_batch(_batch(spark, [(f"2024-01-01 0{i}:01:00", 1.0, float(i))]))
    assert store.versions() == [0, 1, 2, 3, 4, 5]
    want_v3 = sorted(r["v"] for r in store.offline(spark, version=3).collect())
    want_cur = sorted(r["v"] for r in store.offline(spark).collect())

    report = store.vacuum(keep_versions=3)
    assert report["manifests_squashed"] == 3
    assert store.versions() == [3, 4, 5]
    # retained time travel is byte-identical content
    got_v3 = sorted(r["v"] for r in store.offline(spark, version=3).collect())
    assert got_v3 == want_v3
    assert sorted(r["v"] for r in store.offline(spark).collect()) == want_cur
    # expired versions are no longer addressable
    with pytest.raises(ValueError, match="unknown version"):
        store.offline(spark, version=0)
    # idempotent: nothing left to squash or sweep
    again = store.vacuum(keep_versions=3)
    assert again == {"orphans_removed": [], "manifests_squashed": 0}


def test_vacuum_noop_without_commit_log(spark, tmp_path):
    # a plain parquet dir that never used versioning must NOT be swept
    p = str(tmp_path / "plain")
    spark.range(10).write.parquet(p)
    from mlops_realtime_data_ingestion_spark.streaming.storage import (
        ParquetManifestBackend,
    )

    report = ParquetManifestBackend().vacuum(p)
    assert report == {"orphans_removed": [], "manifests_squashed": 0}
    assert spark.read.parquet(p).count() == 10


# ---------- histogram quantiles ----------

def test_hist_quantiles_accuracy(spark):
    df = spark.range(100000).select((F.col("id") % 1000).cast("double").alias("x"))
    got = {r["prob"]: r["quantile_est"] for r in
           hist_quantiles(df, "x", (0.5, 0.9, 0.99), bins=128).collect()}
    width = 999.0 / 128
    # uniform data: estimate within one bin width of the true quantile
    assert abs(got[0.5] - 500.0) <= width
    assert abs(got[0.9] - 900.0) <= width
    assert abs(got[0.99] - 990.0) <= width


def test_hist_quantiles_merge_property(spark):
    """Bin counts are additive, so the sketch over a union equals the
    sketch computed from the two halves' merged counts — here verified
    end-to-end: quantiles(union) == quantiles computed on the union
    regardless of how rows are partitioned/ordered."""
    base = spark.range(50000).select(
        (F.col("id") * 2654435761 % 10007).cast("double").alias("x")
    )
    shuffled = base.repartition(13)
    a = {r["prob"]: r["quantile_est"] for r in
         hist_quantiles(base, "x", (0.5, 0.9), bins=64).collect()}
    b = {r["prob"]: r["quantile_est"] for r in
         hist_quantiles(shuffled, "x", (0.5, 0.9), bins=64).collect()}
    assert a == b  # bit-identical under re-partitioning


def test_grouped_quantiles_match_global_per_group(spark):
    from mlops_realtime_data_ingestion_spark.operators.sketches import (
        hist_quantiles_grouped,
    )

    df = spark.range(20000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        # group 0 spans 0..999, group 1 spans 0..99: per-group grids
        (F.col("id") % F.when(F.col("id") % 2 == 0, 1000).otherwise(100))
        .cast("double")
        .alias("x"),
    )
    got = {
        (r["g"], r["prob"]): r["quantile_est"]
        for r in hist_quantiles_grouped(df, "x", ["g"], (0.5, 0.9), bins=64).collect()
    }
    # each group must match the single-group sketch computed alone
    for g in ("0", "1"):
        alone = {
            r["prob"]: r["quantile_est"]
            for r in hist_quantiles(
                df.filter(F.col("g") == g), "x", (0.5, 0.9), bins=64
            ).collect()
        }
        assert got[(g, 0.5)] == alone[0.5]
        assert got[(g, 0.9)] == alone[0.9]
    # and the narrow group keeps full resolution (its own grid)
    assert abs(got[("1", 0.5)] - 50.0) <= 99.0 / 64
