"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``mlops_realtime_data_ingestion_spark``; this
module is a thin adapter over its query registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's one
    production query — 1-minute event-time tumbling window ->
    count/sum/avg (resources/flink/main.py:105-120)."""
    from mlops_realtime_data_ingestion_spark.plans.reference_queries import (
        flagship_tx_window_1min,
    )

    return flagship_tx_window_1min(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from mlops_realtime_data_ingestion_spark.plans.registry import all_specs

    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    from mlops_realtime_data_ingestion_spark.plans.registry import all_specs

    return {
        name: spec.oracle
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }
