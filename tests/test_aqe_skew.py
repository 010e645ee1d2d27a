"""AQE skew-join handling — prove the session's
``spark.sql.adaptive.skewJoin`` config actually splits a hot
partition at runtime (complement of the explicit salted_join path:
AQE covers plain SMJs after the fact; salting covers what AQE can't).

Thresholds are lowered to make the tiny test corpus register as
skewed; at 100 TB the defaults (256 MB / factor 5) do the same job.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mlops_realtime_data_ingestion_spark.sources.batch import load_table


@pytest.fixture()
def skew_confs(spark):
    keys = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "512b",
    }
    prev = {k: spark.conf.get(k) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    yield
    for k, v in prev.items():
        spark.conf.set(k, v)


def test_aqe_marks_and_splits_skewed_join(spark, skew_confs):
    # AQE splits a skewed REDUCER partition by ranges of MAPPER
    # outputs — a single-file scan gives the shuffle ONE mapper and
    # nothing to split, so spread the input across mappers first (at
    # 100 TB the scan has thousands of mappers and this is automatic).
    # Also: the right side must be a plain shuffle directly under the
    # join — an aggregate between shuffle and join blocks the split
    # (its partition can't be replicated through the agg).
    ev = (
        load_table(spark, "/root/testdata/sf0.01", "events")
        .repartition(8)
        .withColumn(
            "skew_key",
            F.when(F.col("user_id") % 4 != 0, F.lit(0)).otherwise(F.col("user_id")),
        )
    )
    cust = load_table(spark, "/root/testdata/sf0.01", "customer").select(
        F.col("c_custkey").alias("skew_key"), "c_mktsegment"
    )
    joined = ev.join(cust, "skew_key").select("event_id", "c_mktsegment")
    # collect() finalizes THIS DataFrame's adaptive plan (count()
    # would execute a different QueryExecution and leave this one
    # unfinalized: isFinalPlan=false)
    rows = joined.collect()
    assert len(rows) > 0
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # AQE rewrites the hot partition into multiple splits and tags the
    # join; without skew handling these strings never appear
    assert "skew=true" in plan, plan[:2000]
    assert "skewed" in plan.split("AQEShuffleRead", 2)[1][:60]
