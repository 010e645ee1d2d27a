"""S13-S15/P7 materialization tests + explain-plan shape assertions
(pushdown, broadcast) — the scale contracts, checked mechanically."""

from __future__ import annotations

import glob
import json
import math

from pyspark.sql import functions as F

from mlops_realtime_data_ingestion_spark.operators.ml_prep import (
    deepar_records,
    write_csv,
    write_deepar_jsonl,
    write_json_report,
)
from mlops_realtime_data_ingestion_spark.sources.batch import load_table


def test_deepar_jsonl_roundtrip(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").limit(500)
    recs = deepar_records(ev, series_cols=["user_id"])
    out = str(tmp_path / "deepar")
    write_deepar_jsonl(recs, out, num_shards=1)

    lines = []
    for f in glob.glob(f"{out}/part-*"):
        lines += [json.loads(line) for line in open(f)]
    assert len(lines) == recs.count()
    for rec in lines:
        assert set(rec) == {"start", "target"}
        assert isinstance(rec["target"], list) and len(rec["target"]) > 0
        # P7: every element is a stringified finite number or "NaN"
        for v in rec["target"]:
            assert v == "NaN" or math.isfinite(float(v))


def test_deepar_nan_encoding(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1.0), (1, "2024-01-01 00:01:00", float("nan"))],
        "user_id int, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    recs = deepar_records(df, series_cols=["user_id"])
    out = str(tmp_path / "nan")
    write_deepar_jsonl(recs, out, num_shards=1)
    (line,) = [json.loads(x) for f in glob.glob(f"{out}/part-*") for x in open(f)]
    assert line["target"] == ["1.0", "NaN"]
    assert line["start"] == "2024-01-01 00:00:00"


def test_csv_and_report_sinks(spark, tmp_path):
    df = spark.createDataFrame([(1, 2.5), (2, 3.5)], "id int, v double")
    write_csv(df, str(tmp_path / "csv"), num_shards=1)
    csv_lines = [x.strip() for f in glob.glob(str(tmp_path / "csv/part-*")) for x in open(f)]
    assert csv_lines[0] == "id,v" and len(csv_lines) == 3

    write_json_report(df.agg(F.sum("v").alias("total")), str(tmp_path / "rep"))
    (rep,) = [json.loads(x) for f in glob.glob(str(tmp_path / "rep/part-*")) for x in open(f)]
    assert rep == {"total": 6.0}


# ---------- plan-shape contracts ----------

def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_tpch_q1_pushes_filter_and_prunes_columns(spark):
    from mlops_realtime_data_ingestion_spark.plans.relational_queries import (
        tpch_q1_pricing_summary,
    )

    df = tpch_q1_pricing_summary(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the scan schema must not include l_orderkey
    scan = plan[plan.index("ReadSchema") :][:400]
    assert "l_orderkey" not in scan


def test_star_join_broadcasts_dims(spark):
    from mlops_realtime_data_ingestion_spark.plans.relational_queries import (
        join_3way_brand_nation,
    )

    df = join_3way_brand_nation(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan


def test_topk_uses_heap_not_global_sort(spark):
    from mlops_realtime_data_ingestion_spark.plans.relational_queries import o2_topk_orders

    df = o2_topk_orders(spark, "/root/testdata/sf0.001")
    assert "TakeOrderedAndProject" in _plan(df)
