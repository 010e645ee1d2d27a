"""Forecast-predictor stage (SURVEY.md §3.2 lifecycle).

The reference trains a DeepAR estimator and serves quantile forecasts
(pipelines/blockchain/pipeline.py:391-404); model FITTING is out of
engine scope (SURVEY.md §2.10), but the predictor INTERFACE is in:
a predictor maps each series' ordered history to ``horizon`` rows of
(p10, p50, p90) quantile forecasts — exactly the shape the reference's
evaluation consumes (evaluate.py:73-91, metrics A10-A12).

Two implementations:

- :func:`seasonal_naive_forecast` — a fully relational, deterministic
  baseline: step h repeats the value one season back
  (y[n - m + ((h-1) mod m) + 1]), with a quantile band of
  z * sd(seasonal differences). Every reduction is decimal-exact
  (plans/determinism), so the same forecast — and its DuckDB oracle —
  hash-matches at any partitioning. This is the classical benchmark
  any learned forecaster must beat.

- :func:`apply_predictor` — the pluggable hook: an arbitrary
  per-series ``fn(history_pdf, horizon) -> forecast_pdf`` run via
  ``applyInPandas`` (Arrow-batched, one task per series group). A
  DeepAR/any-model endpoint drops in here without touching the plan;
  the engine only fixes the contract (ordered history in, horizon
  quantile rows out).

Scale: both paths shuffle once on the series key. The naive plan is
window functions + one self-join on (series, rank); the pandas path
is bounded by the widest single series (the same per-series bound the
reference's per-series DeepAR inference has).
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["seasonal_naive_forecast", "apply_predictor", "Z90"]

# N(0,1) 0.90 quantile: p10/p90 band half-width in sd units
Z90 = 1.2815515655446004


def seasonal_naive_forecast(
    df: DataFrame,
    order: list[Column],
    horizon: int,
    season: int,
    value_col: str = "value",
    series_cols: list[str] | None = None,
    ts_col: str | None = None,
    step: str = "1 minute",
    z: float = Z90,
) -> DataFrame:
    """Seasonal-naive quantile forecast per series.

    Returns one row per (series, h in 1..horizon) with ``p50`` = the
    value one season back at the matching phase, ``p10``/``p90`` =
    p50 -/+ z * sd(y_t - y_{t-season}) (population sd over the
    series' seasonal differences, decimal-exact sums), and
    ``forecast_ts`` = last ts + h * step when ``ts_col`` is given.

    Series shorter than ``season`` have no source value at the naive
    rank and are dropped; series with exactly ``season`` points
    forecast with a NULL band (no differences to estimate from). Both
    follow from the relational construction, identically in any
    engine.
    """
    series_cols = list(series_cols or [])
    w = Window.partitionBy(*series_cols).orderBy(*order)
    # both window functions run before projection (the order columns
    # need not survive into the output), one shuffle on the series key
    ranked = (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("__d", F.col(value_col) - F.lag(value_col, season).over(w))
        .select(
            *series_cols,
            *([ts_col] if ts_col else []),
            F.col(value_col).alias("__v"),
            "__rn",
            "__d",
        )
    )

    per_series = ranked.groupBy(*series_cols).agg(
        F.count("*").alias("__n"),
        *([F.max(ts_col).alias("__last_ts")] if ts_col else []),
    )
    # sd of seasonal differences: per-row double math is deterministic,
    # the sums are decimal-exact => sd is the same double in any engine
    diffs = ranked.filter(F.col("__d").isNotNull())
    dsum = lambda c: F.sum(c.cast("decimal(28,6)")).cast("double")  # noqa: E731
    # m2 - m1*m1 spelled with multiplication, not pow(): pow(x, 2) is
    # not guaranteed bit-identical to x*x across libms, and the oracle
    # must reproduce this double exactly
    m1 = dsum(F.col("__d")) / F.count("__d")
    sd = diffs.groupBy(*series_cols).agg(
        F.sqrt(
            F.greatest(
                F.lit(0.0),
                dsum(F.col("__d") * F.col("__d")) / F.count("__d") - m1 * m1,
            )
        ).alias("__sd")
    )

    steps = per_series.select(
        *series_cols,
        "__n",
        *(["__last_ts"] if ts_col else []),
        F.explode(F.sequence(F.lit(1), F.lit(horizon))).alias("h"),
    ).withColumn(
        "__src_rn",
        F.col("__n") - season + ((F.col("h") - 1) % season) + 1,
    )
    hist = ranked.select(*series_cols, "__rn", F.col("__v").alias("__p50"))
    join_cond = [
        F.col(f"s.{c}") == F.col(f"t.{c}") for c in series_cols
    ] + [F.col("s.__src_rn") == F.col("t.__rn")]
    out = steps.alias("s").join(hist.alias("t"), join_cond)
    out = out.select(
        *[F.col(f"s.{c}").alias(c) for c in series_cols],
        F.col("s.h").cast("long").alias("h"),
        *(
            [
                (
                    F.col("s.__last_ts")
                    + F.expr(f"INTERVAL {step}") * F.col("s.h")
                ).alias("forecast_ts")
            ]
            if ts_col
            else []
        ),
        F.col("t.__p50").alias("__p50"),
    )
    joined = out.join(sd, series_cols, "left")
    return joined.select(
        *series_cols,
        "h",
        *(["forecast_ts"] if ts_col else []),
        F.round(F.col("__p50") - F.lit(z) * F.col("__sd"), 6).alias("p10"),
        F.round(F.col("__p50"), 6).alias("p50"),
        F.round(F.col("__p50") + F.lit(z) * F.col("__sd"), 6).alias("p90"),
    )


def apply_predictor(
    df: DataFrame,
    fn: Callable[[pd.DataFrame, int], pd.DataFrame],
    horizon: int,
    order_cols: list[str],
    value_col: str = "value",
    series_cols: list[str] | None = None,
    quantile_schema: str = "p10 double, p50 double, p90 double",
) -> DataFrame:
    """Run an arbitrary per-series predictor (the DeepAR hook).

    ``fn`` receives the series' history as a pandas frame sorted by
    ``order_cols`` (columns: order_cols + [value_col]) and must return
    ``horizon`` rows matching ``quantile_schema``; the engine stamps
    the series key and step index. Arrow-batched via applyInPandas —
    one task per series group, no driver involvement.
    """
    series_cols = list(series_cols or [])
    out_schema = (
        ", ".join(
            f"{c} {t}"
            for c, t in df.select(*series_cols).dtypes
        )
        + (", " if series_cols else "")
        + "h long, "
        + quantile_schema
    )

    def run(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        hist = pdf.sort_values(order_cols).reset_index(drop=True)
        fc = fn(hist[order_cols + [value_col]], horizon).reset_index(drop=True)
        fc.insert(0, "h", range(1, len(fc) + 1))
        for i, c in enumerate(series_cols):
            fc.insert(i, c, key[i])
        return fc

    return df.groupBy(*series_cols).applyInPandas(run, out_schema)
