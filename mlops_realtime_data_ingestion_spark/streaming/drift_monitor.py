"""In-stream input-drift monitoring.

The reference's model monitor watches OUTPUT quality (hourly wQL ->
CloudWatch -> consecutive-breach alarm, custom_monitoring_metrics.py:
189-210); this adds the input-side guard the same loop needs: every
micro-batch, score the incoming value distribution against a FROZEN
baseline histogram with PSI (operators/drift.py semantics) and append
the score to the metrics table — `alarm_state` then fires on
consecutive drift breaches exactly like it does for wQL.

Design points:
- the baseline is computed ONCE from a reference DataFrame and held
  as a tiny plain-Python histogram (bin edges + counts). Each batch
  pays one narrow aggregation over its own rows; nothing rescans the
  reference;
- the per-batch PSI is computed driver-side from two small count
  vectors (bins x 2 numbers) — the only data crossing to the driver
  is the histogram, never rows;
- foreachBatch keeps the sink exactly-once-friendly: the metric row
  carries the batch's max event time, so re-delivered batches append
  duplicate metric rows that dedup downstream (same contract as the
  reference's at-least-once CloudWatch puts).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .monitoring import MetricsTable

__all__ = ["DriftBaseline", "attach_drift_monitor"]


class DriftBaseline:
    """Frozen equal-width histogram of a reference window."""

    def __init__(self, mn: float, mx: float, counts: list[int]) -> None:
        self.mn = mn
        self.mx = mx
        self.counts = counts
        self.bins = len(counts)

    @classmethod
    def fit(cls, ref: DataFrame, value_col: str, bins: int = 10) -> "DriftBaseline":
        b = ref.agg(
            F.min(value_col).alias("mn"), F.max(value_col).alias("mx")
        ).collect()[0]
        mn, mx = float(b["mn"]), float(b["mx"])
        hist = cls(mn, mx, [0] * bins)
        rows = (
            ref.select(hist.bin_expr(F.col(value_col)).alias("bin"))
            .groupBy("bin")
            .count()
            .collect()
        )
        counts = [0] * bins
        for r in rows:
            counts[r["bin"]] = r["count"]
        hist.counts = counts
        return hist

    def bin_expr(self, col):
        return F.least(
            F.lit(self.bins - 1),
            F.greatest(
                F.lit(0),
                F.floor(
                    (col - F.lit(self.mn)) * self.bins / F.lit(self.mx - self.mn)
                ).cast("int"),
            ),
        )

    def psi(self, batch_counts: list[int], eps: float = 0.5) -> float:
        n_ref = sum(self.counts)
        n_cur = sum(batch_counts)
        if n_cur == 0:
            return 0.0
        out = 0.0
        for c_ref, c_cur in zip(self.counts, batch_counts):
            p = (c_ref + eps) / (n_ref + self.bins * eps)
            q = (c_cur + eps) / (n_cur + self.bins * eps)
            out += (p - q) * math.log(p / q)
        return out


def attach_drift_monitor(
    stream_df: DataFrame,
    baseline: DriftBaseline,
    metrics: MetricsTable,
    value_col: str,
    ts_col: str,
    checkpoint: str,
    metric_name: str = "input_psi",
    available_now: bool = False,
):
    """Start a foreachBatch query scoring every micro-batch's
    ``value_col`` distribution against ``baseline`` and appending
    (metric, stage, value, ts) to the metrics table."""

    def score_batch(batch: DataFrame, batch_id: int) -> None:
        rows = (
            batch.select(
                baseline.bin_expr(F.col(value_col)).alias("bin"),
                F.col(ts_col).alias("__ts"),
            )
            .groupBy("bin")
            .agg(F.count("*").alias("c"), F.max("__ts").alias("mx_ts"))
            .collect()
        )
        if not rows:
            return
        counts = [0] * baseline.bins
        for r in rows:
            counts[r["bin"]] = r["c"]
        psi = baseline.psi(counts)
        spark = batch.sparkSession
        metrics.put(
            spark.createDataFrame(
                [(metric_name, "stream", float(psi))],
                "metric string, stage string, value double",
            ).withColumn("ts", F.lit(max(r["mx_ts"] for r in rows)))
        )

    writer = stream_df.writeStream.foreachBatch(score_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
