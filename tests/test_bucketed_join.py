"""Bucketed co-located join: proves the at-rest partitioning removes
the join shuffle entirely — the plan-shape contract that matters most
at 100 TB (a fact-fact join without bucketing shuffles both sides)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mlops_realtime_data_ingestion_spark.operators.bucketing import (
    read_bucketed,
    write_bucketed,
)
from mlops_realtime_data_ingestion_spark.sources.batch import load_table


@pytest.fixture()
def no_broadcast(spark):
    """Force shuffle-based join strategies so the test proves bucket
    co-location (a broadcast join would trivially have no exchange)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_is_exchange_free(spark, sf_dir, no_broadcast):
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    write_bucketed(orders, "t_orders_b", ["o_custkey"], 8, sort_cols=["o_custkey"])
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "o_custkey"),
        "t_customer_b",
        ["o_custkey"],
        8,
        sort_cols=["o_custkey"],
    )
    try:
        joined = read_bucketed(spark, "t_orders_b").join(
            read_bucketed(spark, "t_customer_b"), "o_custkey"
        )
        n = joined.count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # and the result is the plain join's result
        plain = orders.join(
            customer.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey"
        )
        assert n == plain.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_customer_b")


def test_bucketed_groupby_is_exchange_free(spark, sf_dir, no_broadcast):
    orders = load_table(spark, sf_dir, "orders")
    write_bucketed(orders, "t_orders_b2", ["o_custkey"], 8)
    try:
        agg = (
            read_bucketed(spark, "t_orders_b2")
            .groupBy("o_custkey")
            .agg(F.count("*").alias("n"))
        )
        assert agg.count() > 0
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b2")
