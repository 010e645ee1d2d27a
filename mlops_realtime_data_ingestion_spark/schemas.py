"""Explicit schemas — no inference in the hot path.

The reference declares fixed schemas at every hop: the Flink source DDL
(resources/flink/main.py:58-77), the EventBridge envelope JSONPath map
(resources/sagemaker/featurestore/source-schema.json:2-118) and the
feature-group schema (resources/sagemaker/featurestore/
agg-fg-schema.json:3-34). We mirror those as StructTypes.
"""

from __future__ import annotations

from pyspark.sql import types as T

__all__ = [
    "TRANSACTION_SCHEMA",
    "ENVELOPE_SCHEMA",
    "AGGREGATE_SCHEMA",
    "EVENTS_SCHEMA",
]

# Transaction record — mirrors the Flink source DDL at
# resources/flink/main.py:58-77. `inputs`/`out` are nested JSON arrays
# deliberately kept opaque strings (source-schema.json:104-112).
TRANSACTION_SCHEMA = T.StructType(
    [
        T.StructField("hash", T.StringType(), False),
        T.StructField("ver", T.IntegerType()),
        T.StructField("vin_sz", T.IntegerType()),
        T.StructField("vout_sz", T.IntegerType()),
        T.StructField("size", T.IntegerType()),
        T.StructField("weight", T.IntegerType()),
        T.StructField("fee", T.IntegerType()),
        T.StructField("relayed_by", T.StringType()),
        T.StructField("lock_time", T.IntegerType()),
        T.StructField("tx_index", T.LongType()),
        T.StructField("double_spend", T.BooleanType()),
        T.StructField("time", T.LongType()),
        T.StructField("block_index", T.LongType()),
        T.StructField("block_height", T.LongType()),
        T.StructField("inputs", T.StringType()),
        T.StructField("out", T.StringType()),
        T.StructField("rbf", T.BooleanType()),
    ]
)

# EventBridge envelope — producer at
# resources/services/ingestion-worker/lib.js:100-108; JSONPath fan-out
# `$.detail.txs[0:]` per source-schema.json:44-47.
ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("version", T.StringType()),
        T.StructField("id", T.StringType()),
        T.StructField("detail-type", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("account", T.StringType()),
        T.StructField("time", T.StringType()),
        T.StructField("region", T.StringType()),
        T.StructField("resources", T.ArrayType(T.StringType())),
        T.StructField(
            "detail",
            T.StructType([T.StructField("txs", T.ArrayType(TRANSACTION_SCHEMA))]),
        ),
    ]
)

# Windowed aggregate record — Flink sink DDL resources/flink/main.py:90-95
# and agg-fg-schema.json:4-28. Flink types it FLOAT while the feature
# schema says Fractional/DOUBLE; we standardize on DoubleType (noted
# reference inconsistency, SURVEY.md §7).
AGGREGATE_SCHEMA = T.StructType(
    [
        T.StructField("tx_minute", T.TimestampType(), False),
        T.StructField("total_nb_trx_1min", T.LongType()),
        T.StructField("total_fee_1min", T.LongType()),
        T.StructField("avg_fee_1min", T.DoubleType()),
        T.StructField("event_time", T.DoubleType()),
    ]
)

# Synthetic `events` table (driver testdata) — the batch/stream stand-in
# for the transaction stream: event_id≈tx_index, ts≈tx_time,
# user_id≈relayed_by, value≈fee, props≈opaque JSON like inputs/out.
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)
