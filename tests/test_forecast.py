"""Forecast-predictor stage (SURVEY.md §3.2): seasonal-naive
semantics on a hand-computed series, and the applyInPandas predictor
hook (the DeepAR drop-in point)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from mlops_realtime_data_ingestion_spark.operators.forecast import (
    apply_predictor,
    seasonal_naive_forecast,
)


def _series(spark):
    # two series; series 'a' is strictly seasonal with period 2
    rows = [("a", i, float(10 + (i % 2))) for i in range(6)]  # 10,11,10,11,10,11
    rows += [("b", i, float(i)) for i in range(4)]  # 0,1,2,3
    return spark.createDataFrame(rows, "sid string, t int, value double")


def test_seasonal_naive_hand_computed(spark):
    fc = seasonal_naive_forecast(
        _series(spark),
        order=[F.col("t")],
        horizon=4,
        season=2,
        value_col="value",
        series_cols=["sid"],
    )
    rows = {(r["sid"], r["h"]): r for r in fc.collect()}
    # series a: last season is (10, 11) at ranks 5, 6 -> forecast
    # repeats 10, 11, 10, 11; perfectly seasonal => sd of diffs = 0
    assert [rows[("a", h)]["p50"] for h in (1, 2, 3, 4)] == [10.0, 11.0, 10.0, 11.0]
    assert rows[("a", 1)]["p10"] == 10.0 and rows[("a", 1)]["p90"] == 10.0
    # series b: values 0..3, season 2 -> forecast repeats (2, 3);
    # diffs y_t - y_{t-2} = 2, 2 -> sd = 0 (trend aliases into season)
    assert [rows[("b", h)]["p50"] for h in (1, 2)] == [2.0, 3.0]


def test_seasonal_naive_drops_short_series(spark):
    df = spark.createDataFrame(
        [("s", 0, 1.0), ("s", 1, 2.0)], "sid string, t int, value double"
    )
    fc = seasonal_naive_forecast(
        df, order=[F.col("t")], horizon=2, season=5,
        value_col="value", series_cols=["sid"],
    )
    assert fc.count() == 0  # n < season: no naive source rank


def test_apply_predictor_pluggable(spark):
    """The DeepAR hook: an arbitrary per-series pandas predictor runs
    via applyInPandas with the engine stamping series key + step."""

    def linear_trend(hist: pd.DataFrame, horizon: int) -> pd.DataFrame:
        y = hist["value"].to_numpy()
        slope = y[-1] - y[-2] if len(y) >= 2 else 0.0
        p50 = [y[-1] + slope * h for h in range(1, horizon + 1)]
        return pd.DataFrame(
            {"p10": [v - 1 for v in p50], "p50": p50, "p90": [v + 1 for v in p50]}
        )

    fc = apply_predictor(
        _series(spark),
        linear_trend,
        horizon=2,
        order_cols=["t"],
        value_col="value",
        series_cols=["sid"],
    )
    rows = {(r["sid"], r["h"]): r for r in fc.collect()}
    assert len(rows) == 4
    # series b: 0,1,2,3 -> slope 1 -> 4, 5
    assert rows[("b", 1)]["p50"] == 4.0 and rows[("b", 2)]["p50"] == 5.0
    assert rows[("b", 1)]["p10"] == 3.0 and rows[("b", 1)]["p90"] == 5.0
    # series a: ...10,11 -> slope 1 -> 12, 13
    assert rows[("a", 1)]["p50"] == 12.0
    # schema contract
    assert fc.columns == ["sid", "h", "p10", "p50", "p90"]
