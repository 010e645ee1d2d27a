"""Relational operator recipes (SURVEY.md §2.3, §2.5, §2.6).

The reference contains no relational joins in code (SURVEY.md §2.3) —
J1 (dedup anti-join) and J2 (positional zip) are the join-like
semantics it exercises; the engine exposes the full Spark join family
so a reference user has every query shape available.

Scale notes baked into each recipe:
- dimension joins broadcast (`F.broadcast`) — no shuffle of the fact
  side; Catalyst/AQE would usually pick this, the hint makes it a
  contract.
- top-k never global-sorts: `Window`-free `orderBy().limit(k)` lets
  Spark run TakeOrderedAndProject — per-partition heaps + driver
  merge of k rows, O(n) not O(n log n), no full shuffle.
- positional zip (J2) joins on `row_number` over an explicit total
  order — never `monotonically_increasing_id`, which is
  partitioning-dependent (SURVEY.md §7 risk register).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["broadcast_dim_join", "top_k", "positional_zip", "consecutive_islands"]


def broadcast_dim_join(
    fact: DataFrame, dim: DataFrame, on, how: str = "inner"
) -> DataFrame:
    """Fact-to-dimension equi-join with an explicit broadcast of the
    dim side — zero shuffle on the fact table."""
    return fact.join(F.broadcast(dim), on, how)


def top_k(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    """O2: latest/top K rows. orderBy().limit(k) compiles to
    TakeOrderedAndProject (per-partition heap, no global sort)."""
    return df.orderBy(*order).limit(k)


def positional_zip(
    left: DataFrame,
    right: DataFrame,
    left_order: list[Column],
    right_order: list[Column],
) -> DataFrame:
    """J2: align two series by position (reference: targets vs
    prediction arrays zipped by index, evaluate.py:60-70). Both sides
    get ``row_number`` over an explicit total order, then inner-join
    on the index.

    Scale note: a global row_number (no partition key) funnels through
    one task — correct but serial. Callers at 100 TB should zip within
    a partition key (e.g. per series id); this recipe is for the
    reference's per-series alignment where one series fits a task.
    """
    lw = Window.orderBy(*left_order)
    rw = Window.orderBy(*right_order)
    lhs = left.withColumn("__pos", F.row_number().over(lw))
    rhs = right.withColumn("__pos", F.row_number().over(rw))
    return lhs.join(rhs, "__pos", "inner").drop("__pos")


def consecutive_islands(
    df: DataFrame,
    order_col: str,
    flag_col: str,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Gaps-and-islands: group consecutive flagged rows (ordered by
    ``order_col``) into islands; returns island start/end/length.

    Mirrors the reference's CloudWatch alarm semantics — wQL >=
    threshold for N consecutive hourly periods
    (model-monitor-template.yml:786-795).
    """
    parts = partition_cols or []
    w_all = Window.partitionBy(*parts).orderBy(order_col)
    w_flag = Window.partitionBy(*parts, flag_col).orderBy(order_col)
    grouped = (
        df.withColumn("__rn_all", F.row_number().over(w_all))
        .withColumn("__rn_flag", F.row_number().over(w_flag))
        .withColumn("__island", F.col("__rn_all") - F.col("__rn_flag"))
    )
    return (
        grouped.filter(F.col(flag_col))
        .groupBy(*parts, "__island")
        .agg(
            F.min(order_col).alias("island_start"),
            F.max(order_col).alias("island_end"),
            F.count("*").alias("island_len"),
        )
        .drop("__island")
    )
