"""The continuous pipeline — the reference's six hops as TWO chained
Structured Streaming queries (SURVEY.md §3.1).

Reference chain: HTTP poll -> EventBridge -> Lambda dedup (DynamoDB
conditional put, 3 h TTL) -> Kinesis -> {Firehose raw archive, Flink
1-min window agg} -> Kinesis -> Lambda -> Feature Store. Spark form:

  query 1 (ingest):  source -> withWatermark(3h)
                            -> dropDuplicatesWithinWatermark(hash)
                            -> bronze append sink (S8 raw archive)
  query 2 (aggregate): readStream(bronze) -> withWatermark(60s)
                            -> groupBy(window 1min).agg(count,sum,avg)
                            -> foreachBatch FeatureStore.put_batch (S9)

Two queries, not one: Spark allows a single watermark definition per
stream, and the reference genuinely runs two different event-time
horizons — 3 h dedup TTL (data-ingestion-stack.ts:75) vs 60 s window
lateness (resources/flink/main.py:77). The bronze hop between them is
the exact analogue of the reference's Kinesis "ingestion" stream
between the dedup Lambda and Flink — and doubles as the raw archive
(Firehose->S3, data-ingestion-stack.ts:102-122).

Semantics mapping (SURVEY.md §2.8):
- T1 watermark 60 s: late rows beyond it are dropped from windows.
- T6 dedup TTL 3 h: dropDuplicatesWithinWatermark state expires with
  the 3 h watermark — DynamoDB TTL minus the extra service.
- T5 exactly-once: checkpointed offsets + idempotent keyed put.
- T8 restart: same checkpointLocation resumes from the last commit.
- T3 idle-source timeout: not needed — micro-batch watermarks advance
  from observed max event time per batch (documented delta).

Scale: the dedup shuffle keys on the tx hash (uniform), the agg
shuffle on the minute bucket; state is per-partition (RocksDB/HDFS
at cluster scale); bronze decouples the two stages' backpressure.
No driver state anywhere.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from .feature_store import FeatureStore

__all__ = ["StreamingPipeline", "PipelineConfig"]


@dataclass
class PipelineConfig:
    feature_path: str
    checkpoint_root: str
    bronze_path: str
    key_col: str = "hash"
    ts_col: str = "tx_time"
    val_col: str = "fee"
    dedup_watermark: str = "3 hours"   # T6: data-ingestion-stack.ts:75
    agg_watermark: str = "60 seconds"  # T1: resources/flink/main.py:77
    window: str = "1 minute"           # T2: resources/flink/main.py:108-112


class StreamingPipeline:
    def __init__(self, config: PipelineConfig) -> None:
        self.config = config
        self.store = FeatureStore(config.feature_path)
        self._bronze_schema: T.StructType | None = None

    # -- stage transforms (independently testable) ---------------------
    def deduped(self, source: DataFrame) -> DataFrame:
        """P1/J1: exactly-once within the 3 h horizon."""
        c = self.config
        return source.withWatermark(
            c.ts_col, c.dedup_watermark
        ).dropDuplicatesWithinWatermark([c.key_col])

    def aggregated(self, bronze: DataFrame) -> DataFrame:
        """A1-A5 on the deduped stream; append-mode emission when the
        watermark passes the window end (Flink finalized windows)."""
        c = self.config
        return (
            bronze.withWatermark(c.ts_col, c.agg_watermark)
            .groupBy(F.window(F.col(c.ts_col), c.window).alias("w"))
            .agg(
                F.count(c.key_col).alias("total_nb_trx_1min"),
                F.sum(c.val_col).alias("total_fee_1min"),
                F.avg(c.val_col).alias("avg_fee_1min"),
            )
            .select(
                F.col("w.start").alias("tx_minute"),
                "total_nb_trx_1min",
                "total_fee_1min",
                "avg_fee_1min",
            )
        )

    # -- query 1: dedup -> bronze --------------------------------------
    def start_ingest(self, source: DataFrame, available_now: bool = False) -> StreamingQuery:
        c = self.config
        self._bronze_schema = source.schema
        writer = (
            self.deduped(source)
            .writeStream.format("parquet")
            .option("path", c.bronze_path)
            .option("checkpointLocation", f"{c.checkpoint_root}/bronze")
            .outputMode("append")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    # -- query 2: bronze -> windowed agg -> feature store ---------------
    def start_aggregate(self, spark: SparkSession, available_now: bool = False) -> StreamingQuery:
        c = self.config
        schema = self._bronze_schema or spark.read.parquet(c.bronze_path).schema
        bronze = spark.readStream.schema(schema).parquet(c.bronze_path)

        def upsert(batch: DataFrame, batch_id: int) -> None:
            if batch.isEmpty():
                return
            self.store.put_batch(batch)

        writer = (
            self.aggregated(bronze)
            .writeStream.foreachBatch(upsert)
            .outputMode("append")
            .option("checkpointLocation", f"{c.checkpoint_root}/features")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    # -- the whole job ---------------------------------------------------
    def run(self, source: DataFrame, available_now: bool = True, timeout_s: int = 300) -> None:
        """availableNow drains the backlog stage-by-stage and stops
        (test/replay mode); otherwise both queries run continuously."""
        spark = source.sparkSession
        ingest_q = self.start_ingest(source, available_now)
        if available_now:
            ingest_q.awaitTermination(timeout_s)
            agg_q = self.start_aggregate(spark, available_now=True)
            agg_q.awaitTermination(timeout_s)
        else:
            self.start_aggregate(spark, available_now=False)
