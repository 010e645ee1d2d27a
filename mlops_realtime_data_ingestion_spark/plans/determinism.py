"""Cross-engine numeric determinism helpers.

Floating-point REDUCTIONS (sum/avg over many rows) are
order-dependent: Spark and DuckDB sum partitions in different orders
and can land a last-ULP apart, which flips any subsequent decimal
rounding (observed at sf0.1: avg over 32 doubles differing in the 6th
decimal). Per-row scalar double math is IEEE-deterministic and safe.

Rule used by every registered query:
- aggregate doubles by casting the (per-row) operand to DECIMAL(18,s)
  first — integer arithmetic, bitwise-identical in any engine — then
  cast the exact sum back to DOUBLE;
- averages are exact-sum / count, both deterministic;
- never round() an order-dependent float.

The oracle SQL mirrors the same construction:
``CAST(sum(CAST(x AS DECIMAL(18,s))) AS DOUBLE)``.

Scale note: this is not just a test trick — at 100 TB a
decimal-backed sum gives run-to-run reproducible aggregates
regardless of partitioning, which float sums do not.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["dsum", "davg", "dsum_sql", "davg_sql"]


def dsum(col: Column | str, scale: int = 4) -> Column:
    """Order-independent (exact) sum of a double column, as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def davg(col: Column | str, scale: int = 4) -> Column:
    """Order-independent average: exact sum / count."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(c)


def dsum_sql(expr: str, scale: int = 4) -> str:
    return f"CAST(sum(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def davg_sql(expr: str, scale: int = 4) -> str:
    return f"({dsum_sql(expr, scale)} / count({expr}))"
