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

__all__ = [
    "consecutive_breach_alarm",
    "ALARM_SCHEMA",
    "ALARM_STATE_SCHEMA",
    "record_high_tracker",
    "RECORD_SCHEMA",
]

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


RECORD_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("record_rank", T.IntegerType()),
    ]
)


def _has_protobuf() -> bool:
    """transformWithStateInPandas speaks protobuf to its driver-side
    state worker; without google.protobuf the stream crashes at
    initialization (STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE)."""
    import importlib.util

    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:  # no `google` namespace package at all
        return False


def record_high_tracker(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    tiebreak_col: str = "event_id",
    api: str = "auto",
) -> DataFrame:
    """Per-key record-high detector: emit a row whenever a key's value
    strictly exceeds everything it has seen before, with the running
    record ordinal.

    Two identical-semantics spellings, selected by ``api``:

    - ``"tws"`` — the NEW arbitrary-state API
      (``transformWithStateInPandas`` + StatefulProcessor/ValueState,
      Spark 4.x), the surface new stateful operators should target.
      Requires ``google.protobuf`` (the state-server wire format) and
      the RocksDB state store provider.
    - ``"legacy"`` — ``applyInPandasWithState`` (same walk, same
      state tuple), which runs on the default state store with no
      extra dependency.
    - ``"auto"`` (default) — currently resolves to ``legacy``
      unconditionally: the tws path needs protobuf, which this
      environment lacks, so it has never executed under the test
      suite — auto-selecting an unverified path whenever protobuf
      happens to be importable was wrong (ADVICE r5). A
      protobuf-gated test (tests/test_round6_plans.py) covers the
      tws path where it CAN run; flip ``"auto"`` back to
      protobuf-detection once that test has executed somewhere.

    Determinism contract: within a micro-batch rows sort by
    (event time, tiebreak); state holds only (current max, records so
    far), compared with raw `>` — no float arithmetic anywhere, so a
    single-batch drain equals the batch prefix-max SQL exactly.

    Scale: state is one (double, int) per key in the state store;
    each micro-batch moves only its own rows, grouped by key.
    """
    if api == "auto":
        api = "legacy"
    if api == "legacy":
        return _record_high_legacy(events, key_col, ts_col, val_col, tiebreak_col)

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    cols = [f.name for f in RECORD_SCHEMA.fields]

    class RecordHigh(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState(
                "record_state", "cur_max double, n_records int"
            )

        def handleInputRows(self, key, rows, timerValues):
            (uid,) = key
            if self._st.exists():
                cur_max, n_rec = self._st.get()
            else:
                cur_max, n_rec = None, 0
            batch = pd.concat(list(rows), ignore_index=True)
            batch = batch.sort_values(
                [ts_col, tiebreak_col], kind="mergesort"
            )
            out: list[tuple] = []
            for ts, eid, value in zip(
                batch[ts_col], batch[tiebreak_col], batch[val_col]
            ):
                v = float(value)
                if cur_max is None or v > cur_max:
                    cur_max = v
                    n_rec += 1
                    out.append((uid, ts, int(eid), v, n_rec))
            self._st.update((cur_max, n_rec))
            yield pd.DataFrame(out, columns=cols)

        def close(self) -> None:
            pass

    return events.groupBy(key_col).transformWithStateInPandas(
        RecordHigh(),
        outputStructType=RECORD_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


# (current record max encoded as cents? no — raw double; ordinal int)
RECORD_STATE_SCHEMA = T.StructType(
    [
        T.StructField("cur_max", T.DoubleType()),
        T.StructField("n_records", T.IntegerType()),
    ]
)


def _record_high_legacy(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """applyInPandasWithState spelling of record_high_tracker — the
    same per-key walk and state tuple on the legacy API."""
    cols = [f.name for f in RECORD_SCHEMA.fields]

    def evaluate(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (uid,) = key
        cur_max, n_rec = state.get if state.exists else (None, 0)
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values([ts_col, tiebreak_col], kind="mergesort")
        out: list[tuple] = []
        for ts, eid, value in zip(
            batch[ts_col], batch[tiebreak_col], batch[val_col]
        ):
            v = float(value)
            if cur_max is None or v > cur_max:
                cur_max = v
                n_rec += 1
                out.append((uid, ts, int(eid), v, n_rec))
        state.update((cur_max, n_rec))
        yield pd.DataFrame(out, columns=cols)

    return events.groupBy(key_col).applyInPandasWithState(
        evaluate,
        outputStructType=RECORD_SCHEMA,
        stateStructType=RECORD_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
