"""Plan-shape tests for the TPC-H suite: the point is not just that
the answers match DuckDB but that Catalyst produced the plan we want
at 100 TB — dims broadcast, filters pushed to the parquet scan,
top-N as TakeOrderedAndProject, EXISTS as semi join.
"""

from __future__ import annotations

from mlops_realtime_data_ingestion_spark.plans import tpch_queries as tq


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q3_topn_no_global_sort(spark, sf_dir):
    plan = _plan(tq.tpch_q3_shipping_priority(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    # segment filter reaches the customer parquet scan
    assert "PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)" in plan


def test_q5_star_join_broadcasts_all_dims(spark, sf_dir):
    plan = _plan(tq.tpch_q5_local_supplier_volume(spark, sf_dir))
    # customer, supplier, nation, region always broadcast; at tiny SF
    # orders broadcasts too (size-based), at scale lineitem⋈orders is
    # the single shuffle join — never more than one
    assert plan.count("BroadcastHashJoin") >= 4
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1


def test_q4_exists_is_semi_join(spark, sf_dir):
    plan = _plan(tq.tpch_q4_order_priority(spark, sf_dir))
    assert "LeftSemi" in plan


def test_q6_filters_pushed_and_pruned(spark, sf_dir):
    plan = _plan(tq.tpch_q6_forecast_revenue(spark, sf_dir))
    # the plan string elides long filter lists; assert on the
    # non-truncated prefix of the pushed-filter set
    assert "PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_discount), IsNotNull(l_quantity)" in plan
    # column pruning: only the 4 referenced columns are read
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    for col in ("l_shipdate", "l_discount", "l_quantity", "l_extendedprice"):
        assert col in read
    assert "l_orderkey" not in read


def test_q22_anti_join(spark, sf_dir):
    plan = _plan(tq.tpch_q22_dormant_customers(spark, sf_dir))
    assert "LeftAnti" in plan
