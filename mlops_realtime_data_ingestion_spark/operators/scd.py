"""Slowly-changing-dimension type 2 (validity-interval) history —
the at-rest generalization of the feature store's latest-per-key
online view (streaming/feature_store.py): instead of keeping only the
newest value per key, every change is kept as a row with
[valid_from, valid_to) and point-in-time lookups become range
predicates.

Scale: both operators are one shuffle on the key (window functions
over the per-key change log); the merge never rewrites untouched
keys' history — at 100 TB the update set is the small side and
history files for unaffected keys are untouched (pair with
partitioning by key range, or a MERGE-capable table format, at the
storage layer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["scd2_build", "scd2_merge"]


def scd2_build(
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Build a type-2 history from a change log: each change opens an
    interval [its ts, next change's ts); the latest change per key
    stays open (valid_to NULL, is_current true).

    Consecutive duplicate values still produce rows (no run-length
    collapse) — dedup the change log first if that matters.
    """
    order = [F.col(ts_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(*key_cols).orderBy(*order)
    out = changes.select(
        *key_cols,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
    )
    return out.withColumn("is_current", F.col("valid_to").isNull())


def scd2_merge(
    history: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Incrementally merge new changes into an existing type-2
    history.

    Closed rows (valid_to set) pass through untouched; open rows of
    updated keys get re-closed against the new changes; keys absent
    from ``updates`` keep their open row as-is. Contract: per key,
    change timestamps are strictly increasing (append-only change
    log), so ordering by ts alone is total within a key.
    """
    closed = (
        history.filter(F.col("valid_to").isNotNull())
        .drop("is_current")
        .withColumn("is_current", F.lit(False))
    )
    open_rows = history.filter(F.col("valid_to").isNull()).drop(
        "valid_to", "is_current"
    )
    as_changes = open_rows.select(
        *key_cols, *attr_cols, F.col("valid_from").alias(ts_col)
    )
    new_changes = updates.select(*key_cols, *attr_cols, ts_col)
    # dedup the combined change log so re-delivered updates are a
    # no-op: merge(merge(h, u), u) == merge(h, u) (at-least-once safe,
    # same contract as the feature-store upsert)
    combined = as_changes.unionByName(new_changes).dropDuplicates(
        [*key_cols, *attr_cols, ts_col]
    )
    rebuilt = scd2_build(combined, key_cols, ts_col, attr_cols)
    return closed.unionByName(rebuilt)
