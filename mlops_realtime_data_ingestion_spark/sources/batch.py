"""Batch parquet sources over the driver's synthetic tables.

Equivalent of the reference's offline-store scans: Athena
``SELECT * FROM "<fg_table>"`` at pipelines/blockchain/preprocess.py:77-87
becomes ``spark.read.parquet`` — Catalyst gives predicate pushdown and
column pruning for free, which the reference's full-scan-into-pandas
never had (SURVEY.md §4).

At 100 TB these parquet paths are partitioned tables; nothing in this
module changes — the scan node prunes partitions/row-groups from the
same declarative plan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Timestamp columns in the synthetic tables. Depending on how the
# driver generated the parquet, these arrive as TIMESTAMP(NANOS)
# (read as nanosecond longs under spark.sql.legacy.parquet.nanosAsLong),
# or as naive timestamp[us] (read as TIMESTAMP_NTZ). Both are
# normalized to session-zoned TimestampType here: the session timezone
# is pinned to UTC (session.get_spark), so the NTZ->TZ cast preserves
# wall-clock values and DuckDB oracle comparisons see identical
# renderings; nanos are floor-divided to micros, the same truncation
# DuckDB applies.
_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name in _TS_COLS:
        # Runtime-settable; needed when the caller (e.g. the driver's
        # harness) built the session without this legacy flag.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The NTZ->timestamp normalization below assumes a UTC session:
    # on a caller-built session with a local timezone, the cast (and
    # collect()'s local-tz rendering) would shift instants relative to
    # the DuckDB oracle. Pin it here, not just in session.get_spark.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    dtypes = dict(df.dtypes)
    for col, dtype in dtypes.items():
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    for col in _TS_COLS.get(name, ()):
        if dtypes.get(col) == "bigint":
            df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every synthetic table as a temp view for ``spark.sql``."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
