"""Custom stateful streaming operator: consecutive-breach alarm.

The reference's monitoring alarm fires after N consecutive hourly
wQL breaches (model-monitor-template.yml:786-795: Period 3600,
EvaluationPeriods = DatapointsToAlarm = ConsecutiveBreachToAlarm,
GreaterThanOrEqualToThreshold) and the breach loop is evaluated by
CloudWatch, not by reference code. As a STREAMING operator the
semantics — a per-key counter that increments on breach, resets on
recovery, and emits on crossing N — are not expressible with windowed
aggregation (the reset is order-dependent), so this is the engine's
``applyInPandasWithState`` showcase (SURVEY.md §2.9).

Scale shape: state is one small tuple per metric key, partitioned by
key in the state store (RocksDB at cluster scale); each micro-batch
moves only that batch's rows. No driver state, no global ordering —
per-key ordering is enforced inside the group (metric series are
tiny: one row/hour/key in the reference).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["consecutive_breach_alarm", "ALARM_SCHEMA", "ALARM_STATE_SCHEMA"]

ALARM_SCHEMA = T.StructType(
    [
        T.StructField("metric", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("consecutive", T.IntegerType()),
        T.StructField("transition", T.BooleanType()),  # first breach >= N
    ]
)

# (current consecutive-breach count, epoch micros of last seen point)
ALARM_STATE_SCHEMA = T.StructType(
    [
        T.StructField("count", T.IntegerType()),
        T.StructField("last_seen_us", T.LongType()),
    ]
)


def consecutive_breach_alarm(
    metrics: DataFrame,
    threshold: float,
    n_breaches: int = 3,
    key_col: str = "metric",
    ts_col: str = "ts",
    val_col: str = "value",
) -> DataFrame:
    """``metrics`` is a streaming DataFrame of (key, ts, value) metric
    points (the engine's analogue of `put_metric_data`,
    custom_monitoring_metrics.py:189-210). Emits one alarm row per
    point whose consecutive-breach count reaches ``n_breaches``;
    ``transition`` marks the OK->ALARM edge. Use outputMode("update").

    Out-of-order points WITHIN a micro-batch are sorted by event time;
    across batches the counter follows arrival order (same as
    CloudWatch, which evaluates on ingestion order). Points older than
    the last state timestamp are counted too — the reference's alarm
    has no event-time correction either.
    """

    def evaluate(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (metric,) = key
        count, last_us = state.get if state.exists else (0, 0)
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(ts_col, kind="mergesort")
        out: list[tuple] = []
        for ts, value in zip(batch[ts_col], batch[val_col]):
            if value >= threshold:
                count += 1
                if count >= n_breaches:
                    out.append(
                        (metric, ts, float(value), count, count == n_breaches)
                    )
            else:
                count = 0
            last_us = int(pd.Timestamp(ts).value // 1_000)
        state.update((count, last_us))
        yield pd.DataFrame(out, columns=[f.name for f in ALARM_SCHEMA.fields])

    return metrics.groupBy(key_col).applyInPandasWithState(
        evaluate,
        outputStructType=ALARM_SCHEMA,
        stateStructType=ALARM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
