"""Monitoring loop (SURVEY.md §3.3, §7 step 7).

Reference: hourly model-quality job computes wQL, pushes metrics to
CloudWatch (custom_monitoring_metrics.py:189-210); an alarm fires
after N consecutive hourly breaches (model-monitor-template.yml:
786-795); on alarm a Lambda retriggers model build and the threshold
updates as ``new = wql + |wql - old| * rate`` when improved
(update_monitoring_threshold.py:80-101).

Spark form: metrics live in an append-only parquet table
(metric, stage, value, ts); the alarm is the gaps-and-islands query
(operators/relational.consecutive_islands); threshold update is a
driver-side scalar rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.relational import consecutive_islands

__all__ = ["MetricsTable", "alarm_state", "update_threshold"]


class MetricsTable:
    """S16: CloudWatch put_metric_data -> parquet append."""

    def __init__(self, path: str) -> None:
        self.path = path

    def put(self, metrics: DataFrame) -> None:
        """Append rows (metric STRING, stage STRING, value DOUBLE,
        ts TIMESTAMP)."""
        metrics.select("metric", "stage", "value", "ts").write.mode("append").parquet(
            self.path
        )

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)


def alarm_state(
    metrics: DataFrame,
    metric_name: str,
    threshold: float,
    consecutive_to_alarm: int = 3,
) -> DataFrame:
    """Alarm query: islands of >= N consecutive periods with
    value >= threshold (GreaterThanOrEqualToThreshold semantics,
    model-monitor-template.yml:793)."""
    flagged = metrics.filter(F.col("metric") == metric_name).withColumn(
        "breach", F.col("value") >= threshold
    )
    islands = consecutive_islands(flagged, order_col="ts", flag_col="breach")
    return islands.filter(F.col("island_len") >= consecutive_to_alarm)


def update_threshold(new_wql: float, old_threshold: float, update_rate: float = 0.5) -> float:
    """update_monitoring_threshold.py:80-101: tighten only on
    improvement."""
    if new_wql < old_threshold:
        return new_wql + abs(new_wql - old_threshold) * update_rate
    return old_threshold
