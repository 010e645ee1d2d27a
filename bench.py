"""Benchmark harness (driver contract).

Runs the engine's headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is forced end-to-end through Spark's noop sink — full
materialization of every output row on the executors, no driver-side
collect distorting the measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The headline set: the reference's production query + one
# representative per operator family (scan-agg, star join, window
# functions, series prep, metrics, dedup, similarity, text).
HEADLINE = [
    "flagship_tx_window_1min",
    "tpch_q1_pricing_summary",
    "join_3way_brand_nation",
    "p1_dedup_keep_first",
    "wf_rank_lag_lead",
    "a8_ordered_gather",
    "metrics_rmse_wql",
    "w1_train_test_split",
    # extension families (present from the round they land)
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "sim_search_cosine_topk",
    "text_quality_score",
    # training-data pipeline stages
    "decontam_ngram_overlap",
    "doc_chunk_sliding",
    "join_salted_skew",
    "wf_rolling_time_range",
    "sessionize_events",
    "scd2_price_history",
    "dq_orders_report",
    "sim_search_lsh_topk",
    "pack_sequences_greedy",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from mlops_realtime_data_ingestion_spark.plans.registry import all_specs
    from mlops_realtime_data_ingestion_spark.session import get_spark

    spark = get_spark("bench")
    specs = all_specs()

    # Warm the session so no query is charged for one-time machinery:
    # JVM codegen, the Python worker pool (pandas UDFs fork ~1 worker
    # per core on first use), and Arrow serialization paths.
    from pyspark.sql import functions as F

    spark.range(1000).selectExpr("sum(id)").collect()

    @F.pandas_udf("long")
    def _warm(v: pd.Series) -> pd.Series:
        return v

    spark.range(10000, numPartitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))).select(
        _warm("id")
    ).selectExpr("sum(`_warm(id)`)").collect()
    spark.range(100).selectExpr(
        "aggregate(sequence(1, 50), 0L, (a, x) -> a + x)"
    ).collect()

    # Best-of-2 per query: single-shot numbers at sf0.1 swing 2-5x on
    # first-touch effects (page cache, codegen cache, worker reuse);
    # the min is the reproducible per-query cost.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = specs.get(name)
        if spec is None:
            continue
        best = None
        for _ in range(2):
            df = spec.fn(spark, sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    # Streaming freshness: wall time to drain the events backlog
    # through the full pipeline (dedup -> bronze -> 1-min window ->
    # feature upsert). BASELINE.md budget: a minute bucket finalizes
    # <= ~2 min after its start; the whole multi-day backlog draining
    # in seconds means per-micro-batch latency is far inside that.
    streaming_e2e = None
    stream_spec = specs.get("streaming_pipeline_e2e")
    if stream_spec is not None:
        t0 = time.perf_counter()
        stream_spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        streaming_e2e = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "streaming_e2e_sec": streaming_e2e,
                "streaming_freshness_budget_sec": 120,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
