"""Data-quality constraint reports — expectations-style validation
for ingestion pipelines.

The reference enforces quality operationally (idempotent upserts,
model-metric gates, dashboards — SURVEY.md §5); a standalone engine
needs the declarative form: a set of named constraints evaluated in
ONE scan, producing a (constraint, n_rows, n_violations, ok) report
row per check — the gate a 100 TB ingest job runs before publishing a
partition.

Scale: all row-level constraints compile to conditional aggregates in
a single pass (map-side partial aggregation; the shuffle carries one
row per constraint). Uniqueness rides the same pass as
``count(*) - count(distinct key)`` — at extreme cardinality swap in
``approx_count_distinct`` and a tolerance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["constraint_report"]


def constraint_report(
    df: DataFrame,
    violations: dict[str, Column],
    unique_keys: dict[str, str] | None = None,
) -> DataFrame:
    """Evaluate named constraints in one scan.

    ``violations``: constraint name -> boolean Column that is TRUE
    when the row VIOLATES the constraint (null-safe: nulls count as
    violations only if the predicate says so).
    ``unique_keys``: constraint name -> column whose duplicates are
    violations.

    Returns one row per constraint: (check_name, n_rows, n_violations,
    ok), ordered by name. (`constraint` is a reserved word in some
    engines — the column is ``check_name``.)
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, cond in violations.items():
        aggs.append(
            F.sum(F.when(cond, 1).otherwise(0)).alias(f"__v_{name}")
        )
    for name, key in (unique_keys or {}).items():
        aggs.append(
            (F.count(key) - F.countDistinct(key)).alias(f"__v_{name}")
        )
    wide = df.agg(*aggs)
    names = list(violations.keys()) + list((unique_keys or {}).keys())
    pairs = ", ".join(f"'{n}', __v_{n}" for n in names)
    long = wide.selectExpr(
        "__n", f"stack({len(names)}, {pairs}) as (check_name, n_violations)"
    )
    return long.select(
        "check_name",
        F.col("__n").alias("n_rows"),
        "n_violations",
        (F.col("n_violations") == 0).alias("ok"),
    ).orderBy("check_name")
