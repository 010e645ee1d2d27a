"""Change-data-capture snapshot diff.

A training-data pipeline re-ingests upstream stores on a schedule; the
incremental question is "what changed between snapshot T1 and T2?"
(rows to re-embed, re-deduplicate, re-index — reprocessing only the
delta is the difference between a nightly job and a full 100 TB
rebuild). The reference ships full-history re-reads (Athena offline
scan, pipelines/blockchain/preprocess.py:77-87); this operator adds
the row-level diff between two point-in-time states of a keyed event
stream.

Snapshot(T, W) = the latest record per key among events with
``T - W < ts <= T`` (a trailing activity window, so keys silent for a
whole window age OUT and appear as deletes — matching how CDC against
a TTL'd or windowed operational store behaves). The diff is one full
outer join of two window aggregations:

- key only in snapshot 2  -> ``insert``
- key only in snapshot 1  -> ``delete``
- in both, payload changed -> ``update``  (unchanged rows are dropped)

Scale: each snapshot is one latest-per-key window over a time-pruned
scan (partition pruning cuts everything outside (T-W, T]); the join
keys on the record key. No driver state, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["snapshot_latest", "snapshot_diff"]


def snapshot_latest(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    cutoff: str,
    window_days: int,
    payload_cols: tuple[str, ...],
    tiebreak_col: str,
) -> DataFrame:
    """Latest record per key within the trailing window
    (cutoff - window_days, cutoff]; ties on ts broken by
    ``tiebreak_col`` (a unique id) so the pick is total-ordered."""
    cut = F.lit(cutoff).cast("timestamp")
    lo = cut - F.expr(f"INTERVAL {int(window_days)} DAYS")
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).desc(), F.col(tiebreak_col).desc()
    )
    return (
        df.filter((F.col(ts_col) > lo) & (F.col(ts_col) <= cut))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(key_col, ts_col, tiebreak_col, *payload_cols)
    )


def snapshot_diff(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    t1: str,
    t2: str,
    window_days: int,
    payload_cols: tuple[str, ...],
    tiebreak_col: str,
) -> DataFrame:
    """Row-level diff between Snapshot(t1) and Snapshot(t2): one row
    per inserted / deleted / updated key with old and new payloads
    (null on the missing side). Unchanged keys produce no row."""
    s1 = snapshot_latest(
        df, key_col, ts_col, t1, window_days, payload_cols, tiebreak_col
    )
    s2 = snapshot_latest(
        df, key_col, ts_col, t2, window_days, payload_cols, tiebreak_col
    )
    old = s1.select(
        F.col(key_col).alias("k"),
        F.lit(True).alias("__in1"),  # presence marker (payloads may be null)
        *[F.col(c).alias(f"old_{c}") for c in payload_cols],
    )
    new = s2.select(
        F.col(key_col).alias("k"),
        F.lit(True).alias("__in2"),
        *[F.col(c).alias(f"new_{c}") for c in payload_cols],
    )
    joined = old.join(new, "k", "full_outer")
    has_old = F.col("__in1").isNotNull()
    has_new = F.col("__in2").isNotNull()
    changed = F.lit(False)
    for c in payload_cols:
        changed = changed | ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    change = (
        F.when(~has_old, F.lit("insert"))
        .when(~has_new, F.lit("delete"))
        .otherwise(F.lit("update"))
    )
    return (
        joined.filter((~has_old) | (~has_new) | changed)
        .select(
            F.col("k").alias(key_col),
            change.alias("change"),
            *[F.col(f"old_{c}") for c in payload_cols],
            *[F.col(f"new_{c}") for c in payload_cols],
        )
    )
