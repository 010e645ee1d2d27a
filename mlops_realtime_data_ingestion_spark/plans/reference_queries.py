"""Queries reproducing the reference pipeline's own semantics
(SURVEY.md §2.1-§2.8) over the synthetic ``events`` table.

The `events` table stands in for the deduped transaction stream:
``event_id≈tx_index, ts≈tx_time, user_id≈relayed_by, value≈fee,
props≈opaque JSON payload``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.ingest import dedup_keep_first
from .determinism import davg, davg_sql, dsum, dsum_sql
from ..operators.windows import session_agg
from ..sources.batch import load_table
from .spec import QuerySpec


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# --- flagship: the reference's one production query (A1-A5, P4, T2) ---
def flagship_tx_window_1min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-minute tumbling event-time window -> count/sum/avg.

    Parity: resources/flink/main.py:105-120 (Tumble 1 min on tx_time,
    count(hash), sum(fee), avg(fee)); batch spelling of the same plan
    Structured Streaming runs in streaming/pipeline.py.
    """
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 minute").alias("w"))
        .agg(
            F.count("event_id").alias("total_nb_trx_1min"),
            dsum("value").alias("total_fee_1min"),
            davg("value").alias("avg_fee_1min"),
        )
        .select(F.col("w.start").alias("tx_minute"), "total_nb_trx_1min", "total_fee_1min", "avg_fee_1min")
    )


FLAGSHIP_ORACLE = f"""
SELECT date_trunc('minute', ts)        AS tx_minute,
       count(event_id)                 AS total_nb_trx_1min,
       {dsum_sql('value')}             AS total_fee_1min,
       {davg_sql('value')}             AS avg_fee_1min
FROM events
GROUP BY 1
"""


def a6_minute_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/F2: legacy ``GROUP BY FLOOR(ts TO MINUTE)`` spelling
    (resources/kinesis/analytics.sql:7-14) via date_trunc."""
    ev = _events(spark, sf_dir)
    return ev.groupBy(F.date_trunc("minute", F.col("ts")).alias("tx_minute")).agg(
        F.count("event_id").alias("total_nb_trx_1min"),
        dsum("value").alias("total_fee_1min"),
        davg("value").alias("avg_fee_1min"),
    )


def p1_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/J1 batch analogue: exactly-once dedup with a defined winner
    (reference: DynamoDB conditional put keeps the first arrival,
    resources/lambdas/stream_processing/main.py:47-56)."""
    ev = _events(spark, sf_dir)
    return dedup_keep_first(
        ev, ["user_id", "event_type"], [F.col("ts").asc(), F.col("event_id").asc()]
    )


P1_ORACLE = """
SELECT event_id, ts, user_id, event_type, value, props
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) = 1
"""


def s10_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10/W5: online-store point-read semantics — latest record per
    key (feature store get_record; read_feature_store.ipynb cell 6).
    Keyed on user_id over the events stand-in."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


S10_ORACLE = """
SELECT event_id, ts, user_id, event_type, value, props
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
"""


def f6_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4/F6: JSON field extraction (reference: base64+json decode at
    delivery_stream_to_featurestore/main.py:34-35; JSONPath mapping
    source-schema.json:75)."""
    ev = _events(spark, sf_dir)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
        F.length("props").cast("long").alias("props_len"),
    )


F6_ORACLE = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
       length(props)                                      AS props_len
FROM events
"""


def f1_epoch_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F3/F9: epoch<->timestamp conversions and string rendering
    (resources/flink/main.py:71,123-129 — the reference's only UDF,
    replaced by built-in date_format)."""
    ev = _events(spark, sf_dir)
    return ev.select(
        "event_id",
        F.unix_timestamp("ts").alias("epoch_s"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        F.to_timestamp(F.from_unixtime(F.unix_timestamp("ts"))).alias("ts_rt"),
    )


F1_ORACLE = """
SELECT event_id,
       CAST(floor(epoch(ts)) AS BIGINT)                       AS epoch_s,
       strftime(ts, '%Y-%m-%d %H:%M:%S')                      AS ts_str,
       CAST(to_timestamp(CAST(floor(epoch(ts)) AS BIGINT)) AS TIMESTAMP) AS ts_rt
FROM events
"""


def f7_f8_scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7/F8: where/abs/sqrt/pow/ceil/round catalog (evaluate.py:33,
    :74-91; FeatureStoreAggregateParquet.py:79)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("d_abs"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("sqrt_price"),
        F.round(F.pow("l_quantity", 2), 6).alias("qty_sq"),
        F.ceil(F.col("l_tax") * 100).alias("tax_c"),
        F.when(F.col("l_discount") > 0.05, F.lit("HIGH")).otherwise("LOW").alias("disc_band"),
    )


F7_ORACLE = """
SELECT l_orderkey,
       l_linenumber,
       round(abs(l_discount - 0.05), 6)       AS d_abs,
       round(sqrt(l_extendedprice), 6)        AS sqrt_price,
       round(power(l_quantity, 2), 6)         AS qty_sq,
       CAST(ceil(l_tax * 100) AS BIGINT)      AS tax_c,
       CASE WHEN l_discount > 0.05 THEN 'HIGH' ELSE 'LOW' END AS disc_band
FROM lineitem
"""


def f4_base64_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: the delivery-Lambda decode path — base64-wrapped JSON
    record -> decode -> field extraction (delivery_stream_to_
    featurestore/main.py:34-35 does base64.b64decode + json.loads).
    The base64 wrap is applied in-query to emulate the Kinesis record
    encoding."""
    ev = _events(spark, sf_dir)
    b64 = F.base64(F.encode("props", "UTF-8"))
    return ev.select(
        "event_id",
        b64.alias("record_b64"),
        F.get_json_object(
            F.decode(F.unbase64(b64), "UTF-8"), "$.k"
        ).cast("int").alias("k_decoded"),
    )


F4_ORACLE = """
SELECT event_id,
       to_base64(encode(props)) AS record_b64,
       CAST(json_extract_string(decode(from_base64(to_base64(encode(props)))), '$.k') AS INTEGER) AS k_decoded
FROM events
"""


def f5_json_encode_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5/S3: JSON encoding + entry-size accounting (the poller
    serializes {txs:[...]} and sizes entries, ingestion-worker
    lib.js:15-33,102,125)."""
    ev = _events(spark, sf_dir)
    j = F.to_json(F.struct("event_id", "user_id", "event_type"))
    return ev.select(
        "event_id",
        j.alias("entry_json"),
        F.length(j).cast("long").alias("entry_size"),
    )


F5_ORACLE = """
SELECT event_id,
       to_json(struct_pack(event_id := event_id, user_id := user_id, event_type := event_type))::VARCHAR AS entry_json,
       length(to_json(struct_pack(event_id := event_id, user_id := user_id, event_type := event_type))::VARCHAR) AS entry_size
FROM events
"""


def a7_minmax_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: series span anchors (preprocess.py:101-103 df.index.min/max)."""
    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.min("ts").alias("ts_min"),
        F.max("ts").alias("ts_max"),
        F.count("*").alias("n"),
    )


A7_ORACLE = """
SELECT event_type, min(ts) AS ts_min, max(ts) AS ts_max, count(*) AS n
FROM events GROUP BY 1
"""


def sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3 note: hopping-window variant for the Flink window-family
    surface. 10-minute windows sliding by 5."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n"), davg("value").alias("avg_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n",
            "avg_value",
        )
    )


SLIDING_ORACLE = """
WITH hops AS (
  SELECT ts, value,
         to_timestamp(CAST(floor(epoch(ts) / 300) * 300 AS BIGINT)) AS hop
  FROM events
), expanded AS (
  SELECT CAST(hop AS TIMESTAMP) - INTERVAL 5 MINUTE AS window_start, ts, value FROM hops
  UNION ALL
  SELECT CAST(hop AS TIMESTAMP) AS window_start, ts, value FROM hops
)
SELECT window_start,
       window_start + INTERVAL 10 MINUTE AS window_end,
       count(*)                          AS n,
       (CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / count(value)) AS avg_value
FROM expanded
GROUP BY 1
"""


def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (5-minute gap) per user — Spark-native
    ``session_window``; oracle via gaps-and-islands SQL."""
    out = session_agg(_events(spark, sf_dir), "ts", "user_id", gap="5 minutes")
    return out.select("user_id", "session_start", "n_events")


SESSION_ORACLE = """
WITH ordered AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   >= INTERVAL 5 MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM ordered
)
SELECT user_id, min(ts) AS session_start, count(*) AS n_events
FROM numbered
GROUP BY user_id, session_id
"""


SPECS: dict[str, QuerySpec] = {
    "flagship_tx_window_1min": QuerySpec(flagship_tx_window_1min, FLAGSHIP_ORACLE, "A1-A5,P4,T2"),
    "a6_minute_bucket": QuerySpec(a6_minute_bucket, FLAGSHIP_ORACLE, "A6,F2"),
    "p1_dedup_keep_first": QuerySpec(p1_dedup_keep_first, P1_ORACLE, "P1,J1"),
    "s10_latest_per_key": QuerySpec(s10_latest_per_key, S10_ORACLE, "S10,W5"),
    "f6_json_extract": QuerySpec(f6_json_extract, F6_ORACLE, "F4,F6"),
    "f1_epoch_roundtrip": QuerySpec(f1_epoch_roundtrip, F1_ORACLE, "F1,F3,F9,P5"),
    "f4_base64_json": QuerySpec(f4_base64_json, F4_ORACLE, "F4"),
    "f5_json_encode_size": QuerySpec(f5_json_encode_size, F5_ORACLE, "F5,S3"),
    "f7_f8_scalar_math": QuerySpec(f7_f8_scalar_math, F7_ORACLE, "F7,F8"),
    "a7_minmax_span": QuerySpec(a7_minmax_span, A7_ORACLE, "A7"),
    "sliding_window_agg": QuerySpec(sliding_window_agg, SLIDING_ORACLE, "T3-family"),
    "session_window_agg": QuerySpec(session_window_agg, SESSION_ORACLE, "T3-family"),
}
