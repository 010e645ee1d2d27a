"""Feature store on parquet (SURVEY.md §2.1 S9/S10, §7 step 5).

The reference's SageMaker Feature Store is a keyed record store with
two faces (lib/sagemaker/feature-store.ts:186-193):
- offline: append-only parquet history on S3 (every put is a new
  versioned row), hive-partitioned year/month/day/hour;
- online: latest value per record key (``record_identifier =
  tx_minute``, versioned by ``event_time`` — agg-fg-schema.json:31-32).

This module keeps exactly that layout on plain parquet:
``put_batch`` APPENDS (atomic at file granularity — no read-modify-
write race, unlike the Glue job's non-atomic prefix swap at
FeatureStoreAggregateParquet.py:94-110), and the online view derives
latest-per-key with a window function. On a Delta/Iceberg-backed
deployment ``put_batch`` becomes ``MERGE INTO`` and ``online_view``
a materialized latest snapshot; the API here is the contract.

Scale: appends are partitioned writes (no global coordination);
the online view is one shuffle on the key. Re-delivered batches are
harmless — the same (key, event_time) row wins deterministically
(T5: at-least-once + idempotent upsert, delivery_stream_to_
featurestore/main.py:54-63).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["FeatureStore"]


class FeatureStore:
    def __init__(
        self,
        path: str,
        key_col: str = "tx_minute",
        event_time_col: str = "event_time",
        partition_by_time: bool = True,
    ) -> None:
        self.path = path
        self.key_col = key_col
        self.event_time_col = event_time_col
        self.partition_by_time = partition_by_time

    # -- S9: streaming upsert sink ------------------------------------
    def put_batch(self, batch: DataFrame) -> None:
        """Append a batch of records (offline history). Stamps
        ``event_time`` if absent (reference stamps now() at the sink,
        delivery_stream_to_featurestore/main.py:60); dedups identical
        (key, event_time) pairs within the batch so re-processing is
        idempotent."""
        cols = batch.columns
        if self.event_time_col not in cols:
            batch = batch.withColumn(
                self.event_time_col,
                F.unix_timestamp(F.current_timestamp()).cast("double"),
            )
        batch = batch.dropDuplicates([self.key_col, self.event_time_col])
        writer = batch.write.mode("append")
        if self.partition_by_time:
            # reference partitions the offline store year/month/day/hour
            # (FeatureStoreAggregateParquet.py:40-58)
            batch = (
                batch.withColumn("year", F.year(self.key_col))
                .withColumn("month", F.month(self.key_col))
                .withColumn("day", F.dayofmonth(self.key_col))
                .withColumn("hour", F.hour(self.key_col))
            )
            writer = batch.write.mode("append").partitionBy(
                "year", "month", "day", "hour"
            )
        writer.parquet(self.path)

    # -- offline face ---------------------------------------------------
    def offline(self, spark: SparkSession) -> DataFrame:
        """Full append-only history (S11 scan target)."""
        return spark.read.parquet(self.path)

    def exists(self) -> bool:
        return os.path.isdir(self.path) and any(
            n.endswith(".parquet") or n.startswith(("year=", "part-"))
            for n in os.listdir(self.path)
        )

    # -- online face ------------------------------------------------
    def online_view(self, spark: SparkSession) -> DataFrame:
        """Latest record per key (the online store's get_record
        semantics; last event_time wins, ties broken deterministically
        by taking the max over remaining columns is avoided — ties on
        (key, event_time) are already deduped at put)."""
        df = self.offline(spark)
        w = Window.partitionBy(self.key_col).orderBy(
            F.col(self.event_time_col).desc()
        )
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    def as_of(self, spark: SparkSession, event_time_cutoff: float) -> DataFrame:
        """Point-in-time view: latest record per key with event_time <=
        cutoff — the offline store's time-travel / point-in-time-correct
        join input (SageMaker offline stores are queried this way to
        avoid feature leakage; here it is one filter + the same
        latest-per-key window)."""
        df = self.offline(spark).filter(
            F.col(self.event_time_col) <= F.lit(event_time_cutoff)
        )
        w = Window.partitionBy(self.key_col).orderBy(
            F.col(self.event_time_col).desc()
        )
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    def get_record(self, spark: SparkSession, key_value) -> list:
        """S10: online point-read (read_feature_store.ipynb cell 6)."""
        return (
            self.online_view(spark)
            .filter(F.col(self.key_col) == F.lit(key_value))
            .collect()
        )

    # -- S12: compaction ---------------------------------------------
    def compact(
        self, spark: SparkSession, target_bytes: int = 512 * 1024 * 1024
    ) -> None:
        """Rewrite the store into ~target-size files (the Glue hourly
        compaction, FeatureStoreAggregateParquet.py:79-111). Unlike
        the reference's copy-then-delete prefix swap (non-atomic,
        :94-110), the rewrite goes to a temp dir and is swapped with
        two renames — the window where readers see a partial store is
        a single rename, and the history is never mutated in place."""
        import shutil

        df = self.offline(spark)
        total = sum(
            os.path.getsize(os.path.join(root, f))
            for root, _, files in os.walk(self.path)
            for f in files
            if f.endswith(".parquet")
        )
        n_files = max(1, -(-total // target_bytes))  # ceil (A9)
        tmp = self.path.rstrip("/") + ".__compact_tmp"
        old = self.path.rstrip("/") + ".__compact_old"
        df.coalesce(int(n_files)).write.mode("overwrite").parquet(tmp)
        os.rename(self.path, old)
        os.rename(tmp, self.path)
        shutil.rmtree(old)
        # NOTE: compaction drops the hive partitioning in this local
        # form; partition-preserving rewrite = per-partition coalesce.
