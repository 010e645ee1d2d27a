"""Ingest-path unit tests: envelope parse (S6), routing filter (S5),
explode/flatten (P2/P3), computed event time (P4), approx distinct."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from mlops_realtime_data_ingestion_spark.operators.ingest import (
    dedup_exact,
    explode_envelope,
    parse_envelopes,
    with_tx_time,
)
from mlops_realtime_data_ingestion_spark.schemas import TRANSACTION_SCHEMA
from mlops_realtime_data_ingestion_spark.sources.batch import load_table


def _tx(h: str, fee: int, t: int) -> dict:
    return {
        "hash": h, "ver": 1, "vin_sz": 1, "vout_sz": 2, "size": 250,
        "weight": 1000, "fee": fee, "relayed_by": "0.0.0.0", "lock_time": 0,
        "tx_index": 42, "double_spend": False, "time": t,
        "block_index": 0, "block_height": 0, "inputs": "[]", "out": "[]",
        "rbf": False,
    }


def _envelope(detail_type: str, txs: list[dict]) -> str:
    return json.dumps(
        {
            "version": "0", "id": "evt-1", "detail-type": detail_type,
            "source": "ingestion", "account": "0", "time": "2024-01-01T00:00:00Z",
            "region": "local", "resources": [], "detail": {"txs": txs},
        }
    )


def test_envelope_parse_route_explode(spark):
    raw = spark.createDataFrame(
        [
            (_envelope("Incoming Data", [_tx("a", 10, 1704067200), _tx("b", 20, 1704067260)]),),
            (_envelope("Heartbeat", [_tx("c", 30, 1704067320)]),),  # filtered (S5)
        ],
        "value string",
    )
    envs = parse_envelopes(raw)
    assert "detail" in envs.columns
    txs = explode_envelope(envs)
    rows = txs.collect()
    assert {r["hash"] for r in rows} == {"a", "b"}  # Heartbeat dropped
    # P3: projection keeps envelope routing fields + full tx schema
    for f in TRANSACTION_SCHEMA.fieldNames():
        assert f in txs.columns

    timed = with_tx_time(txs)
    t = {r["hash"]: r["tx_time"] for r in timed.collect()}
    assert t["a"].isoformat() == "2024-01-01T00:00:00"
    assert t["b"].isoformat() == "2024-01-01T00:01:00"


def test_dedup_exact_batch(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "hash string, fee int"
    )
    assert dedup_exact(df, ["hash"]).count() == 2


def test_approx_count_distinct_within_tolerance(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.countDistinct("l_partkey").alias("exact"),
        F.approx_count_distinct("l_partkey", 0.02).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] <= 0.05
