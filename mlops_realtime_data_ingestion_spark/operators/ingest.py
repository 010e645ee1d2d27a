"""Ingest-path operators: envelope flattening, typed projection,
computed event-time, exactly-once dedup.

Reference parity (SURVEY.md §2.2):
- P1 exactly-once dedup — the reference does a per-record DynamoDB
  conditional put with a 3 h TTL (resources/lambdas/stream_processing/
  main.py:47-56; TTL lib/ingestion/data-ingestion-stack.ts:75). Spark
  form: one declarative ``dropDuplicates``/``dropDuplicatesWithinWatermark``
  whose state store replaces DynamoDB; the shuffle on the hash key is
  the analogue of Kinesis ``PartitionKey=hash``.
- P2/P3 envelope flatten + rename — JSONPath ``$.detail.txs[0:]``
  (source-schema.json:44-117) becomes ``explode``.
- P4 computed column — ``tx_time AS TO_TIMESTAMP(FROM_UNIXTIME(time))``
  (resources/flink/main.py:71).

Scale note: dedup is a single hash-partitioned shuffle on the key —
the one shuffle this stage needs. At 100 TB the key (a 64-char tx
hash) is uniform, so no salting required; AQE skew-join handling
covers pathological keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import ENVELOPE_SCHEMA

__all__ = [
    "parse_envelopes",
    "explode_envelope",
    "with_tx_time",
    "dedup_exact",
    "dedup_keep_first",
    "chunk_greedy",
]


def parse_envelopes(raw: DataFrame, json_col: str = "value") -> DataFrame:
    """Raw JSON strings -> typed envelope rows (S6: explicit schema +
    ``from_json``, never inference)."""
    return raw.select(
        F.from_json(F.col(json_col), ENVELOPE_SCHEMA).alias("envelope")
    ).select("envelope.*")


def explode_envelope(envelopes: DataFrame) -> DataFrame:
    """One envelope -> N transaction rows (P2), keeping the routing
    fields the reference's EventBridge rule matches on (S5)."""
    return (
        envelopes.filter(F.col("`detail-type`") == F.lit("Incoming Data"))
        .select(
            F.col("source").alias("ingestion_source"),
            F.col("time").alias("ingestion_time"),
            F.explode(F.col("detail.txs")).alias("tx"),
        )
        .select("ingestion_source", "ingestion_time", "tx.*")
    )


def with_tx_time(txs: DataFrame, epoch_col: str = "time") -> DataFrame:
    """P4: epoch seconds -> event-time timestamp."""
    return txs.withColumn("tx_time", F.to_timestamp(F.from_unixtime(F.col(epoch_col))))


def chunk_greedy(
    df: DataFrame,
    group_cols: list[str],
    order: list[str],
    size_col: str,
    max_bytes: int = 256_000,
) -> DataFrame:
    """S2: the poller's 256 KB event-bus batching (ingestion-worker
    lib.js:95-176) as an operator — greedy size packing per group.

    Within each group (e.g. poll id), rows are packed in order into
    batches whose cumulative ``size_col`` stays <= max_bytes; a single
    row over the limit is dropped (the reference drops oversized txs,
    lib.js:139-146). Greedy packing is inherently sequential per
    group, so it runs as ``applyInPandas`` per group key — groups are
    the parallel unit, exactly like the reference's per-poll batches.
    Output: input columns + ``batch_id`` (0-based within group).
    """
    import pandas as pd

    out_fields = df.schema.fields
    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in out_fields)
    schema += ", batch_id int"

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        batch_ids = []
        keep = []
        current, bid = 0, 0
        for sz in pdf[size_col]:
            if sz > max_bytes:
                keep.append(False)
                batch_ids.append(-1)
                continue
            if current + sz > max_bytes:
                bid += 1
                current = 0
            current += sz
            keep.append(True)
            batch_ids.append(bid)
        pdf["batch_id"] = pd.Series(batch_ids, dtype="int32")
        return pdf[pd.Series(keep)]

    return df.groupBy(*group_cols).applyInPandas(pack, schema)


def dedup_exact(df: DataFrame, keys: list[str]) -> DataFrame:
    """Batch analogue of P1: keep one row per key set.

    ``dropDuplicates`` is the idiomatic Spark dedup — a hash aggregate
    on the keys, map-side partial first, so the shuffle carries one row
    per key per input partition (NOT one row per input row).
    """
    return df.dropDuplicates(keys)


def dedup_keep_first(df: DataFrame, keys: list[str], order: list[Column]) -> DataFrame:
    """Deterministic dedup: keep the first row per key under an explicit
    total order (the reference keeps whichever tx wins the conditional
    put — arrival order; batch replays need a *defined* winner).

    Implemented as ``row_number`` over (partitionBy keys, orderBy
    order) == 1 — one shuffle on the keys, no driver involvement.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
