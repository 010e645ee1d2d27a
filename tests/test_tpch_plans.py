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


def test_q2_no_second_lineitem_scan(spark, sf_dir):
    # the min-cost join-back must reuse the aggregated cost table, not
    # rescan lineitem: exactly one lineitem parquet scan in the plan
    plan = _plan(tq.tpch_q2_min_cost_supplier(spark, sf_dir))
    assert plan.count("lineitem.parquet") == 1
    assert "TakeOrderedAndProject" in plan


def test_q9_part_filter_pushed(spark, sf_dir):
    plan = _plan(tq.tpch_q9_product_profit(spark, sf_dir))
    # the %red% family filter reaches the part scan (StringContains)
    assert "StringContains(p_name,red)" in plan


def test_q12_date_filters_pushed(spark, sf_dir):
    plan = _plan(tq.tpch_q12_late_shipments(spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan


def test_q13_preserves_zero_order_customers(spark, sf_dir):
    # the LEFT OUTER must survive optimization (an inner join would
    # silently drop the c_count=0 bucket)
    plan = _plan(tq.tpch_q13_customer_distribution(spark, sf_dir))
    assert "LeftOuter" in plan


def test_q20_nested_semi_joins(spark, sf_dir):
    plan = _plan(tq.tpch_q20_excess_shipments(spark, sf_dir))
    assert plan.count("LeftSemi") >= 2


def test_q21_semi_and_anti_share_key(spark, sf_dir):
    plan = _plan(tq.tpch_q21_waiting_suppliers(spark, sf_dir))
    assert "LeftSemi" in plan and "LeftAnti" in plan


# ---------- true-shape variants over the derived partsupp ----------

from mlops_realtime_data_ingestion_spark.plans import tpch_partsupp as tps


def test_q2_true_single_lineitem_scan_and_topn(spark, sf_dir):
    # partsupp derives from ONE lineitem scan (the distinct pair set);
    # the correlated min is a window, not a join-back
    plan = _plan(tps.tpch_q2_true(spark, sf_dir))
    assert plan.count("lineitem.parquet") == 1
    assert "TakeOrderedAndProject" in plan
    assert plan.count("BroadcastHashJoin") >= 3  # supp/nation/region/part


def test_q9_true_part_filter_pushed(spark, sf_dir):
    plan = _plan(tps.tpch_q9_true(spark, sf_dir))
    assert "StringContains(p_name,red)" in plan


def test_q11_true_broadcasts_scalar_cut(spark, sf_dir):
    # HAVING-vs-scalar: the one-row threshold joins back as a
    # broadcast, never a shuffle
    plan = _plan(tps.tpch_q11_true(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q20_true_semi_joins(spark, sf_dir):
    plan = _plan(tps.tpch_q20_true(spark, sf_dir))
    assert plan.count("LeftSemi") >= 3  # part family, nation group, qualifying
