"""Table profiling (ANALYZE-style column statistics) and incremental
rollup maintenance.

The reference pipeline recomputes its aggregates from scratch on every
run (resources/glue/FeatureStoreAggregateParquet.py rebuilds the whole
parquet aggregate; the monitoring Lambda re-derives thresholds over the
full window).  At 100 TB neither full rescan is affordable, so this
module adds the two standard fixes:

- ``table_stats``: one-pass per-column statistics (rows, nulls, exact
  NDV, min/max, avg length) — the optimizer-food / data-quality scan a
  warehouse runs as ANALYZE.  One job: a single wide aggregate over the
  scan (count-distincts expand map-side, everything partial-aggregates
  before the one shuffle), then a driver-free ``stack`` unpivot to one
  row per column.  No per-column re-scan of the table.
- ``partial_rollup`` / ``merge_rollups``: algebraic incremental
  aggregation.  Each data increment is collapsed to partial aggregates
  (sum/count per key), and ``merge_rollups`` re-aggregates the unioned
  partials — sum-of-sums and sum-of-counts — which equals the full
  recompute exactly (sums carried as exact decimals).  This is the
  materialized-view-maintenance contract: cost scales with the delta,
  not the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, StringType, TimestampType

from ..plans.determinism import dsum


def _hll_key_expr(c: str, dt) -> object | None:
    """Cross-engine numeric key for sketch-NDV profiling: a long in
    [0, P) per non-null value, distinct-preserving per type (doubles
    via a 4-dp decimal grid — the profile's documented precision
    contract; strings via the engines' shared char-fold hash)."""
    from ..functions import hashing as H
    from pyspark.sql.types import (
        DecimalType, DoubleType, FloatType, IntegralType,
    )

    if isinstance(dt, IntegralType):
        k = F.col(c).cast("long")
    elif isinstance(dt, (DoubleType, FloatType, DecimalType)):
        k = (F.col(c).cast("decimal(18,4)") * 10000).cast("long")
    elif isinstance(dt, TimestampType):
        k = F.unix_micros(F.col(c))
    elif isinstance(dt, StringType):
        k = F.expr(H.spark_str_hash(c))
    else:
        return None
    return F.pmod(k, F.lit(H.P))


def table_stats(
    df: DataFrame, columns: list[str] | None = None, ndv: str = "exact", p: int = 10
) -> DataFrame:
    """One-pass column profile: (column_name, n_rows, n_null,
    n_distinct, min_val, max_val, avg_len).

    min/max are reported as doubles (timestamps as epoch seconds) so
    the output schema is flat and engine-comparable; string columns
    report an exact 4-dp average length instead.

    NDV comes in two spellings behind ``ndv``:

    - ``"exact"``: count-distinct per column inside the single wide
      aggregate (null-excluded) — the oracle-bit-exact default.
    - ``"sketch"``: the 100 TB plan.  Every column's values are mapped
      to a cross-engine numeric key (_hll_key_expr), unpivoted to
      (column_name, key) rows, and fed through the deterministic
      grouped HyperLogLog (operators/sketches.hll_cardinality_grouped)
      — ONE extra scan and a <= columns x 2^p register shuffle replace
      the per-column count-distinct expansion, which at 100 TB is the
      dominant shuffle of the profile job.  Output gains an
      ``ndv_sketch`` double column (n_distinct stays exact, as the
      error contract — drop it at true scale).  Deterministic hashing
      keeps even this approximate plan DuckDB-oracle-checkable
      (table_stats_orders_sketch).
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = columns if columns is not None else [f.name for f in df.schema.fields]

    aggs: list = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        dt = fields[c]
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__null_{c}")
        )
        aggs.append(F.countDistinct(F.col(c)).alias(f"__ndv_{c}"))
        if isinstance(dt, NumericType):
            aggs.append(F.min(F.col(c)).cast("double").alias(f"__min_{c}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"__max_{c}"))
            aggs.append(F.lit(None).cast("double").alias(f"__len_{c}"))
        elif isinstance(dt, TimestampType):
            aggs.append(
                F.min(F.unix_timestamp(F.col(c))).cast("double").alias(f"__min_{c}")
            )
            aggs.append(
                F.max(F.unix_timestamp(F.col(c))).cast("double").alias(f"__max_{c}")
            )
            aggs.append(F.lit(None).cast("double").alias(f"__len_{c}"))
        elif isinstance(dt, StringType):
            aggs.append(F.lit(None).cast("double").alias(f"__min_{c}"))
            aggs.append(F.lit(None).cast("double").alias(f"__max_{c}"))
            # exact decimal average, 4 dp: engine-order-independent
            aggs.append(
                F.round(
                    (dsum(F.length(F.col(c)).cast("double"), 4) / F.count(F.col(c))),
                    4,
                ).alias(f"__len_{c}")
            )
        else:  # arrays/structs: profile presence only
            aggs.append(F.lit(None).cast("double").alias(f"__min_{c}"))
            aggs.append(F.lit(None).cast("double").alias(f"__max_{c}"))
            aggs.append(F.lit(None).cast("double").alias(f"__len_{c}"))

    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __null_{c}, __ndv_{c}, __min_{c}, __max_{c}, __len_{c}" for c in cols
    )
    base = wide.select(
        F.col("__n_rows").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column_name, n_null, n_distinct, min_val, max_val, avg_len)"
        ),
    ).select(
        "column_name",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_null").cast("long").alias("n_null"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_val",
        "max_val",
        "avg_len",
    )
    if ndv == "exact":
        return base

    from .sketches import hll_cardinality_grouped

    keyed = [(c, _hll_key_expr(c, fields[c])) for c in cols]
    keyed = [(c, k) for c, k in keyed if k is not None]
    if not keyed:
        return base.withColumn("ndv_sketch", F.lit(None).cast("double"))
    # ONE scan: every column's key expression is computed in a single
    # projection and stack-unpivoted to (column_name, key) rows —
    # a per-column union would rescan the table once per column.
    # NULL values produce NULL keys; the grouped HLL drops them (the
    # same exclusion count-distinct applies).
    wide_keys = df.select(
        *[k.alias(f"__k_{i}") for i, (c, k) in enumerate(keyed)]
    )
    stack_k = ", ".join(f"'{c}', __k_{i}" for i, (c, _) in enumerate(keyed))
    u = wide_keys.select(
        F.expr(f"stack({len(keyed)}, {stack_k}) AS (column_name, __hk)")
    )
    sk = hll_cardinality_grouped(u, "__hk", ["column_name"], p=p).select(
        "column_name", F.col("hll_estimate").alias("ndv_sketch")
    )
    return base.join(sk, "column_name", "left").select(
        "column_name", "n_rows", "n_null", "ndv_sketch", "n_distinct",
        "min_val", "max_val", "avg_len",
    )


def partial_rollup(
    df: DataFrame, keys: list[str], sum_col: str, scale: int = 4
) -> DataFrame:
    """Collapse one increment to partial aggregates per key.  Sums are
    carried as exact decimals so merge order can never change the
    result."""
    return df.groupBy(*keys).agg(
        F.sum(F.col(sum_col).cast(f"decimal(18,{scale})")).alias("__psum"),
        F.count(F.lit(1)).alias("__pcnt"),
    )


def merge_rollups(parts: list[DataFrame]) -> DataFrame:
    """Merge partial rollups (algebraic re-aggregation): sum of
    partial sums, sum of partial counts.  Equals the full recompute
    exactly; cost is the size of the partials, not the base table."""
    if not parts:
        raise ValueError("merge_rollups needs at least one partial")
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    keys = [c for c in merged.columns if c not in ("__psum", "__pcnt")]
    return merged.groupBy(*keys).agg(
        F.sum("__psum").cast("double").alias("total_sum"),
        F.sum("__pcnt").cast("long").alias("total_cnt"),
    )
