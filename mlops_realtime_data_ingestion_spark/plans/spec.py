"""Query registry plumbing.

Each engine capability from SURVEY.md §2 is registered as a QuerySpec:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are SQL-expressible) a DuckDB oracle SQL string over the same
parquet tables. The driver hash-compares the two at sf=0.01.

Cross-engine determinism rules used throughout the registry:

- Alias every computed column identically in Spark and SQL (the
  driver's compare sorts columns by name).
- Round derived doubles: arithmetic-heavy aggregates (sums of many
  doubles) round to 2 dp — engine summation order differs by ~1e-9 so
  the rounding grid must be far coarser; O(1)-magnitude ratios round
  to 6 dp. Pass-through (unmodified) doubles are left raw: identical
  bits in, identical bits out.
- Cast aggregates whose result types diverge (DuckDB ``sum(INTEGER)``
  is HUGEINT, ``ceil`` is DOUBLE) to BIGINT/DOUBLE explicitly in SQL.
- Every window/order-by carries a unique tiebreak column so both
  engines produce the same total order.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    """One registered engine capability."""

    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => driver does rows-only check
    doc: str = ""       # survey operator ids covered, e.g. "A1-A5,P4"
