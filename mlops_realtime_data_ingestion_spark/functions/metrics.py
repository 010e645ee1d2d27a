"""Forecast-evaluation metrics as DataFrame expressions.

Reference parity (SURVEY.md §2.4 A10-A12):
- RMSE: ``sqrt(mean((pred-target)^2))`` — evaluate.py:73-77,
  custom_monitoring_metrics.py:154-157.
- Weighted quantile loss: ``ql(a,q,x) = where(x > q, a*(x-q),
  (1-a)*(q-x))``; ``wQL_a = 2*sum(ql)/sum(|x|)``; final = mean over
  {low, 0.5, up} — evaluate.py:32-33,82-91 (identical copy in
  custom_monitoring_metrics.py:38-39,161-169).
- Quantile bounds from confidence: ``low = 0.5 - c*0.005,
  up = 0.5 + c*0.005`` (c in (50,100), default 90 -> 0.05/0.95) —
  pipelines/blockchain/pipeline.py:269-275.

All reductions are decimal-backed (plans/determinism rationale): the
mean/sums over rows are exact, so results are identical regardless of
partitioning — reproducible at any cluster size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["quantile_bounds", "quantile_loss", "rmse_expr", "wql_aggs", "evaluate_forecast"]


def quantile_bounds(confidence: int = 90) -> tuple[float, float]:
    """A12: pipeline.py:269-275."""
    if not 50 < confidence < 100:
        raise ValueError("confidence must be in (50, 100)")
    return round(0.5 - confidence * 0.005, 3), round(0.5 + confidence * 0.005, 3)


def quantile_loss(alpha: float, q: Column, target: Column) -> Column:
    """A11 elementwise quantile loss: evaluate.py:32-33."""
    return F.when(target > q, alpha * (target - q)).otherwise((1 - alpha) * (q - target))


def _dsum(c: Column, scale: int = 6) -> Column:
    return F.sum(c.cast(f"decimal(28,{scale})")).cast("double")


def rmse_expr(pred: Column, target: Column) -> Column:
    """A10: aggregate expression; exact mean of squared errors."""
    se = F.pow(pred - target, 2)
    return F.sqrt(_dsum(se) / F.count(se))


def wql_aggs(
    target: Column,
    q_cols: dict[float, Column],
) -> dict[str, Column]:
    """A11 aggregate expressions: one wQL per quantile column plus the
    mean across quantiles (the reference's final metric)."""
    out: dict[str, Column] = {}
    wqls = []
    for alpha, qc in sorted(q_cols.items()):
        ql = quantile_loss(alpha, qc, target)
        wql = 2 * _dsum(ql) / _dsum(F.abs(target))
        name = f"wql_{str(alpha).replace('.', '_')}"
        out[name] = wql
        wqls.append(wql)
    out["wql_mean"] = sum(wqls[1:], wqls[0]) / len(wqls)
    return out


def evaluate_forecast(
    joined: DataFrame,
    target_col: str = "target",
    mean_col: str = "prediction_mean",
    q_cols: dict[float, str] | None = None,
) -> DataFrame:
    """Full evaluation-report query (S15 shape: evaluate.py:109-110):
    one row with rmse + per-quantile wQL + mean wQL."""
    q_cols = q_cols or {0.05: "prediction_q05", 0.5: "prediction_q50", 0.95: "prediction_q95"}
    target = F.col(target_col)
    aggs = [rmse_expr(F.col(mean_col), target).alias("rmse")]
    for name, expr in wql_aggs(target, {a: F.col(c) for a, c in q_cols.items()}).items():
        aggs.append(expr.alias(name))
    return joined.agg(*aggs)
