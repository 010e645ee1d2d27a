"""SparkSession construction.

One builder for the whole engine. Local test profile mirrors the
driver's harness (``local[$SPARK_GRAFT_CPUS]``); the same config block
is what we would ship to a 1000-executor cluster minus the ``master``
and memory knobs:

- AQE on (runtime coalesce, skew-join splitting) — at 100 TB the
  static ``spark.sql.shuffle.partitions`` is only a starting point and
  AQE re-plans per-stage from observed sizes.
- UTC session timezone so event-time semantics are engine-independent
  (the reference converts epoch seconds with ``TO_TIMESTAMP(
  FROM_UNIXTIME(time))``, resources/flink/main.py:71 — wall-clock UTC).
- Arrow enabled: every Python-side exchange (pandas UDFs, mapInPandas
  in the multimodal path) is Arrow-batched, never row-at-a-time.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "stop_spark"]


def get_spark(
    app_name: str = "mlops_realtime_data_ingestion_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (driver contract);
    shuffle partitions default to the core count — correct for local
    mode, and on a real cluster this line is replaced by a value sized
    so that each shuffle partition holds ~128-200 MB of the largest
    stage's data (AQE coalesces down from there).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.spill.compress", "true")
        # 8g default, measured: raising to 16g slowed SHORT queries
        # 15-25% across the board (larger G1 young gen = slower minor
        # GC churn; A/B'd on tpch_q1 1.29 vs 1.52 s at sf0.1). The one
        # observed 8g failure (GCLocker allocation retries in the
        # round-7 100x containment sweep) was caused by the
        # pre-adaptive-prefix plan's 46M-pair distinct, which no
        # longer exists (99k candidates now). Heavy one-off jobs can
        # still raise SPARK_GRAFT_DRIVER_MEM; on a real cluster this
        # knob is per-executor and sized with the partition-bytes
        # budget instead.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        # The driver's testdata stores events.ts as TIMESTAMP(NANOS),
        # which the Spark parquet reader rejects; read nanos as long and
        # convert in sources.batch.load_table.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    if extra_conf:
        # Applied at BUILDER time so static app configs (spark.ui.*)
        # take effect when this call creates the context. getOrCreate
        # ignores builder configs when a context already exists —
        # callers needing a static conf must stop_spark() first
        # (bench.py's per-scale _fresh_session does).
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    if extra_conf:
        for k, v in extra_conf.items():
            try:
                spark.conf.set(k, v)
            except Exception:
                pass  # static conf on a live context: builder path covered it
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
