"""Streaming corpus curation: quality gate + exact dedup as one sink.

Composes the round-4 batch curation operators into the live-ingest
shape: every micro-batch is

1. scored by the hashed linear quality classifier
   (``operators/curation.hashed_quality_classifier`` — a pure codegen
   projection, so the gate adds no shuffle), rejecting low-quality
   docs;
2. exact-deduplicated: intra-batch keep-first on the text
   fingerprint, then an anti-join against the persisted fingerprint
   INDEX (ids + fingerprints only — accepted text is never rescanned);
3. written out: accepted rows, a rejection log with the reason
   (``quality`` / ``dup_intra`` / ``dup_corpus``), the survivors'
   fingerprints extending the index, and one metrics row per batch
   (counts in/kept/rejected) for the monitoring loop
   (streaming/monitoring.py's alarm queries consume such tables).

This is the text-corpus analogue of the reference's ingest chain —
quality routing + seen-set dedup before the stream reaches storage
(resources/lambdas/stream_processing/main.py:31-77 dedups on exact
hash; the EventBridge rule routes by event pattern) — generalized to
classifier-gated curation.

Replay safety follows ``incremental_dedup.py``: every output lands
under ``batch_id=<n>/`` with dynamic partition overwrite, and the
index read excludes the current batch id, so a re-delivered batch
rewrites its own partitions instead of double-appending or
self-matching.

Scale: the classifier is narrow; the fingerprint shuffle carries
(id, fp) only; the index anti-join is an equi-join on fp. Per-batch
cost = |batch| work + one fp-keyed join vs the index — the
steady-state ingest shape at any corpus size.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..functions import hashing as H
from ..operators.curation import hashed_quality_classifier

__all__ = ["StreamingCuration"]

_FP_SCHEMA = "id long, fp long"
_METRIC_SCHEMA = (
    "n_in long, n_quality_rejected long, n_dup_rejected long, n_accepted long"
)


class StreamingCuration:
    """foreachBatch quality-gate + exact-dedup curation sink."""

    def __init__(
        self,
        root: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        buckets: int = 256,
    ) -> None:
        self.index_path = os.path.join(root, "fp_index")
        self.accepted_path = os.path.join(root, "accepted")
        self.rejected_path = os.path.join(root, "rejected")
        self.metrics_path = os.path.join(root, "metrics")
        self.checkpoint = os.path.join(root, "ckpt")
        self.id_col = id_col
        self.text_col = text_col
        self.buckets = buckets

    # -- state ---------------------------------------------------------
    def _index(self, spark: SparkSession) -> DataFrame:
        """Read the fingerprint index, empty-frame only on BOOTSTRAP
        (index not written yet). Any other read failure propagates: a
        corrupted or transiently unreadable index must fail the batch,
        not silently disable corpus-level dedup (a swallowed error
        here would accept duplicates with no signal)."""
        if os.path.isdir(self.index_path):
            from pyspark.errors import AnalysisException

            try:
                return spark.read.schema(_FP_SCHEMA + ", batch_id long").parquet(
                    self.index_path
                )
            except AnalysisException:
                # dir exists but holds no readable parquet yet (e.g.
                # checkpoint dir created, first write not landed) —
                # the bootstrap shape, same as the no-dir branch
                pass
        return spark.createDataFrame([], _FP_SCHEMA + ", batch_id long")

    # -- the per-batch transform (pure, unit-testable) -----------------
    def curate_batch(
        self, batch: DataFrame, fp_index: DataFrame
    ) -> tuple[DataFrame, DataFrame, DataFrame]:
        """Returns (accepted_rows, rejection_log, new_index_entries).

        rejection_log rows: (id_col, reason) with reason one of
        'quality', 'dup_intra', 'dup_corpus'. Quality rejection is
        decided first; a low-quality doc never claims a fingerprint
        slot (its duplicate surviving later is correct — the
        low-quality copy was never accepted).
        """
        ic = self.id_col
        scored = batch.join(
            hashed_quality_classifier(
                batch, id_col=ic, text_col=self.text_col, buckets=self.buckets
            ).select(ic, "keep"),
            ic,
            "left",
        ).withColumn("keep", F.coalesce(F.col("keep"), F.lit(False)))
        quality_rej = scored.filter(~F.col("keep")).select(
            F.col(ic), F.lit("quality").alias("reason")
        )
        passed = scored.filter(F.col("keep")).withColumn(
            "fp", F.expr(H.spark_str_hash(self.text_col))
        )

        # intra-batch keep-first on fp (min id survives)
        w_min = passed.groupBy("fp").agg(F.min(ic).alias("__keep_id"))
        passed = passed.join(w_min, "fp")
        intra_rej = passed.filter(F.col(ic) != F.col("__keep_id")).select(
            F.col(ic), F.lit("dup_intra").alias("reason")
        )
        firsts = passed.filter(F.col(ic) == F.col("__keep_id")).drop("__keep_id")

        # cross-corpus: anti-join vs the fp index
        idx = fp_index.select(F.col("fp").alias("__ifp")).distinct()
        corpus_rej = firsts.join(
            idx, firsts["fp"] == F.col("__ifp"), "inner"
        ).select(F.col(ic), F.lit("dup_corpus").alias("reason"))
        accepted = firsts.join(
            idx, firsts["fp"] == F.col("__ifp"), "left_anti"
        )

        rejected = quality_rej.unionByName(intra_rej).unionByName(corpus_rej)
        new_entries = accepted.select(F.col(ic).alias("id"), "fp")
        accepted_rows = accepted.drop("fp", "keep")
        return accepted_rows, rejected, new_entries

    # -- streaming attach ---------------------------------------------
    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        """The foreachBatch body — public so crash-replay (same
        batch_id delivered twice) is directly testable."""
        spark = batch.sparkSession
        # exclude this batch's own prior attempt (replay safety)
        index = self._index(spark).filter(F.col("batch_id") < F.lit(batch_id))
        batch = batch.persist()
        try:
            accepted, rejected, entries = self.curate_batch(batch, index)
            accepted = accepted.persist()
            rejected = rejected.persist()
            try:
                for df, path in (
                    (accepted, self.accepted_path),
                    (rejected, self.rejected_path),
                    (entries, self.index_path),
                ):
                    (
                        df.withColumn("batch_id", F.lit(batch_id))
                        .write.partitionBy("batch_id")
                        .option("partitionOverwriteMode", "dynamic")
                        .mode("overwrite")
                        .parquet(path)
                    )
                n_in = batch.count()
                n_acc = accepted.count()
                reasons = dict(
                    (r["reason"], r["n"])
                    for r in rejected.groupBy("reason")
                    .agg(F.count("*").alias("n"))
                    .collect()
                )
                metrics = spark.createDataFrame(
                    [
                        (
                            n_in,
                            reasons.get("quality", 0),
                            reasons.get("dup_intra", 0)
                            + reasons.get("dup_corpus", 0),
                            n_acc,
                        )
                    ],
                    _METRIC_SCHEMA,
                )
                (
                    metrics.withColumn("batch_id", F.lit(batch_id))
                    .write.partitionBy("batch_id")
                    .option("partitionOverwriteMode", "dynamic")
                    .mode("overwrite")
                    .parquet(self.metrics_path)
                )
            finally:
                accepted.unpersist()
                rejected.unpersist()
        finally:
            batch.unpersist()

    def attach(self, stream_df: DataFrame, available_now: bool = True) -> StreamingQuery:
        writer = stream_df.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", self.checkpoint
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    # -- read faces ----------------------------------------------------
    def accepted(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.accepted_path)

    def rejected(self, spark: SparkSession) -> DataFrame:
        return spark.read.schema(
            f"{self.id_col} long, reason string, batch_id long"
        ).parquet(self.rejected_path)

    def metrics(self, spark: SparkSession) -> DataFrame:
        return spark.read.schema(
            _METRIC_SCHEMA + ", batch_id long"
        ).parquet(self.metrics_path)
