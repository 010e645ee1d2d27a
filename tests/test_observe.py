"""Observation API — pipeline metrics without a second scan.

The reference emits ingest metrics as a side effect of processing
(PutMetricData, ingestion-worker/lib.js:68-92 — SURVEY S4). The Spark
analogue worth proving: ``df.observe()`` accumulates named aggregates
DURING the one pass that produces the result, so a 100 TB job reports
row counts / sums / null rates for free instead of re-scanning."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from mlops_realtime_data_ingestion_spark.sources.batch import load_table


def test_observe_collects_metrics_in_single_pass(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    obs = Observation("ingest_metrics")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        F.sum(F.when(F.col("user_id").isNull(), 1).otherwise(0)).alias("null_users"),
    )
    # the "real" job: some downstream aggregation consuming the scan
    out = observed.groupBy("event_type").count().collect()
    assert len(out) == 5

    got = obs.get
    # metrics agree with independently computed values
    n = ev.count()
    assert got["n_rows"] == n
    assert got["null_users"] == 0
    expected_total = ev.agg(
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double")
    ).collect()[0][0]
    assert got["total_value"] == expected_total


def test_observed_metrics_feed_the_metrics_table(spark, sf_dir, tmp_path):
    """S4/S16 end-to-end: observed values land in the monitoring
    metrics table exactly like the reference's CloudWatch puts."""
    from mlops_realtime_data_ingestion_spark.streaming.monitoring import MetricsTable

    ev = load_table(spark, sf_dir, "events")
    obs = Observation("rates")
    observed = ev.observe(obs, F.count(F.lit(1)).alias("n_rows"))
    observed.write.format("noop").mode("overwrite").save()

    table = MetricsTable(str(tmp_path / "metrics"))
    table.put(
        spark.createDataFrame(
            [("ingested_rows", "ingest", float(obs.get["n_rows"]))],
            "metric string, stage string, value double",
        ).withColumn("ts", F.current_timestamp())
    )
    rows = table.read(spark).collect()
    assert len(rows) == 1 and rows[0].metric == "ingested_rows"
    assert rows[0].value == float(ev.count())
