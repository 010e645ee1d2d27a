"""Relational operator surface (SURVEY.md §2.3, §2.4, §2.6):
join family, aggregation family (distinct/rollup/cube/grouping
sets/pivot), sorts/limits/top-k, set operations.

The reference has no relational joins in code; these queries exercise
the full Spark surface a reference user would expect from the engine
(SURVEY.md §2.3 note), on the TPC-H-ish synthetic tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.relational import (
    broadcast_dim_join,
    positional_zip,
    salted_join,
    top_k,
)
from ..sources.batch import load_table
from .determinism import davg, davg_sql, dsum, dsum_sql
from .spec import QuerySpec


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------- aggregations (A-family generalized) ----------

def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape — the canonical scan->filter->agg pipeline.
    Filter pushes to the parquet scan; map-side partial aggregation
    means the shuffle carries 6 groups, not 600k rows."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price, 6).alias("sum_disc_price"),
            dsum(charge, 6).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg(F.col("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


TPCH_Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {dsum_sql('l_quantity')}                                        AS sum_qty,
       {dsum_sql('l_extendedprice')}                                   AS sum_base_price,
       {dsum_sql('l_extendedprice * (1 - l_discount)', 6)}             AS sum_disc_price,
       {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS sum_charge,
       {davg_sql('l_quantity')}                                        AS avg_qty,
       {davg_sql('l_extendedprice')}                                   AS avg_price,
       {davg_sql('l_discount', 6)}                                     AS avg_disc,
       count(*)                                                        AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregates (SURVEY.md §2.4 note: absent from the
    reference, Spark-native)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey", "l_partkey").alias("n_supp_part"),
        F.count("*").alias("n_rows"),
    )


AGG_DISTINCT_ORACLE = """
SELECT l_returnflag,
       count(DISTINCT l_partkey)                AS n_parts,
       count(DISTINCT (l_suppkey, l_partkey))   AS n_supp_part,
       count(*)                                 AS n_rows
FROM lineitem
GROUP BY 1
"""


def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        F.count("*").alias("n"),
        (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus")).alias("gid"),
    )


AGG_ROLLUP_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {dsum_sql('l_quantity')} AS sum_qty,
       count(*) AS n,
       CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INTEGER) AS gid
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        F.count("*").alias("n"),
    )


AGG_CUBE_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {dsum_sql('l_quantity')} AS sum_qty,
       count(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping sets via Spark SQL (same Catalyst plan as the
    DataFrame rollup/cube variants)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


AGG_GROUPING_SETS_ORACLE = f"""
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n,
       {dsum_sql('o_totalprice')} AS sum_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot — conditional aggregation under the hood; explicit value
    list so no extra distinct-values job runs."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(dsum("l_quantity"))
        .withColumnsRenamed({"O": "qty_o", "F": "qty_f"})
    )


AGG_PIVOT_ORACLE = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE) AS qty_o,
       CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE) AS qty_f
FROM lineitem
GROUP BY 1
"""


def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (§2.4 note: the reference's
    quantile work happens in numpy; the engine exposes SQL
    percentile). Both engines linearly interpolate over identical
    doubles -> identical results."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
        F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
        F.count("*").alias("n"),
    )


AGG_PERCENTILES_ORACLE = """
SELECT o_orderstatus,
       quantile_cont(o_totalprice, 0.5) AS p50,
       quantile_cont(o_totalprice, 0.9) AS p90,
       count(*) AS n
FROM orders
GROUP BY 1
"""


# ---------- joins (J-family generalized) ----------

def join_orders_customer_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dim join: orders (fact) x customer (dim) -> revenue
    per market segment. Customer is broadcast: no shuffle of orders."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = broadcast_dim_join(
        orders, customer, orders.o_custkey == customer.c_custkey
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"),
        dsum("o_totalprice").alias("revenue"),
    )


JOIN_SEGMENT_ORACLE = f"""
SELECT c_mktsegment,
       count(*) AS n_orders,
       {dsum_sql('o_totalprice')} AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1
"""


def join_3way_brand_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem x part x supplier x nation — multi-dim star join; all
    dims broadcast, single pass over the fact table."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("p_brand", "n_name")
        .agg(
            F.count("*").alias("n"),
            dsum("l_quantity").alias("sum_qty"),
        )
    )


JOIN_3WAY_ORACLE = f"""
SELECT p_brand, n_name,
       count(*) AS n,
       {dsum_sql('l_quantity')} AS sum_qty
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY 1, 2
"""


def join_left_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with no (matching) orders;
    count(o_orderkey) ignores the null-extended rows."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    joined = customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
    return joined.groupBy("c_custkey", "c_name").agg(
        F.count("o_orderkey").alias("n_big_orders"),
        dsum("o_totalprice").alias("big_order_value"),
    )


JOIN_LEFT_ORACLE = f"""
SELECT c_custkey, c_name,
       count(o_orderkey) AS n_big_orders,
       {dsum_sql('o_totalprice')} AS big_order_value
FROM customer
LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
       ON c_custkey = o_custkey
GROUP BY 1, 2
"""


def join_semi_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers having at least one order
    above 450k. Semi joins short-circuit — no fan-out on duplicates."""
    customer = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return customer.join(
        big, customer.c_custkey == big.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


JOIN_SEMI_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
"""


def join_anti_no_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS) — the J1 dedup-ledger shape
    (stream_processing/main.py:47-59) as a batch operator."""
    customer = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return customer.join(
        big, customer.c_custkey == big.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


JOIN_ANTI_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
"""


def j2_positional_zip_simple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 positional zip, output = aligned pairs + position."""
    ev = _t(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy(F.date_trunc("minute", "ts").alias("m"))
        .agg(F.count("*").alias("n_click"))
        .select("m", "n_click")
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy(F.date_trunc("minute", "ts").alias("m"))
        .agg(F.count("*").alias("n_view"))
        .select(F.col("m").alias("m2"), "n_view")
    )
    zipped = positional_zip(clicks, views, [F.col("m")], [F.col("m2")], keep_pos=True)
    return zipped.select(F.col("__pos").alias("pos"), "n_click", "n_view")


J2_ORACLE = """
WITH clicks AS (
  SELECT date_trunc('minute', ts) AS m, count(*) AS n_click
  FROM events WHERE event_type = 'click' GROUP BY 1
), views AS (
  SELECT date_trunc('minute', ts) AS m, count(*) AS n_view
  FROM events WHERE event_type = 'view' GROUP BY 1
), c AS (
  SELECT row_number() OVER (ORDER BY m) AS pos, n_click FROM clicks
), v AS (
  SELECT row_number() OVER (ORDER BY m) AS pos, n_view FROM views
)
SELECT c.pos AS pos, n_click, n_view
FROM c JOIN v USING (pos)
"""


def asof_join_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (custom operator — Spark lacks native ASOF): each
    'click' event annotated with the user's latest 'purchase' value at
    or before the click. Oracle uses DuckDB's native ASOF JOIN.
    Right side deduped to unique (user_id, ts) for determinism."""
    from ..operators.ingest import dedup_keep_first
    from ..operators.relational import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    purchases = dedup_keep_first(
        ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value"),
        ["user_id", "ts"],
        [F.col("value").asc()],
    )
    out = asof_join(
        clicks,
        purchases,
        key_cols=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["value"],
    )
    return out.select(
        "user_id", "ts", "event_id", F.col("value").alias("last_purchase_value")
    )


ASOF_ORACLE = """
WITH clicks AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
), purchases AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
  QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY value) = 1
)
SELECT c.user_id, c.ts, c.event_id, p.value AS last_purchase_value
FROM clicks c ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.ts >= p.ts
"""


def asof_join_cogrouped_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same as-of semantics through the cogrouped-map pandas API
    (cogroup().applyInPandas + pd.merge_asof) — the §2.9 cogroup
    surface, sharing asof_join_last_purchase's oracle because the two
    spellings are result-identical (also asserted directly in
    tests/test_asof_chunk.py)."""
    from ..operators.ingest import dedup_keep_first
    from ..operators.relational import asof_join_cogrouped

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    purchases = dedup_keep_first(
        ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value"),
        ["user_id", "ts"],
        [F.col("value").asc()],
    )
    out = asof_join_cogrouped(
        clicks,
        purchases,
        key_cols=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["value"],
    )
    return out.select(
        "user_id", "ts", "event_id", F.col("value").alias("last_purchase_value")
    )


def range_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed range join (custom operator): every event inside the
    6-hour attribution window that starts at each purchase of a
    sampled user cohort, aggregated per purchase. A bare inequality
    join is BroadcastNestedLoopJoin (O(n·m)); the operator turns it
    into an equi shuffle join on (user_id, 6h-bucket) + residual
    containment filter."""
    from ..operators.relational import range_join

    ev = _t(spark, sf_dir, "events")
    points = ev.select("user_id", "ts", "value")
    intervals = (
        ev.filter(
            (F.col("event_type") == "purchase") & (F.col("user_id") % 7 == 0)
        )
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("w_start"),
            (F.col("ts") + F.expr("INTERVAL 6 HOURS")).alias("w_end"),
        )
    )
    joined = range_join(
        points,
        intervals,
        point_col="ts",
        start_col="w_start",
        end_col="w_end",
        bucket_seconds=21600,
        key_cols=["user_id"],
    )
    return (
        joined.groupBy("purchase_id")
        .agg(
            F.count("*").alias("n_events"),
            dsum("value").alias("window_value"),
        )
        .orderBy("purchase_id")
    )


RANGE_JOIN_ORACLE = f"""
SELECT p.event_id AS purchase_id, count(*) AS n_events,
       {dsum_sql('e.value')} AS window_value
FROM events p JOIN events e
  ON e.user_id = p.user_id
 AND e.ts >= p.ts AND e.ts < p.ts + INTERVAL 6 HOUR
WHERE p.event_type = 'purchase' AND p.user_id % 7 = 0
GROUP BY 1 ORDER BY 1
"""


# ---------- sorts / limits / set ops (O-family) ----------

def o2_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: top-10 orders by value — TakeOrderedAndProject, no global
    sort (preprocess.py:119 tail-N analogue)."""
    orders = _t(spark, sf_dir, "orders")
    return top_k(
        orders.select("o_orderkey", "o_custkey", "o_totalprice"),
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        10,
    )


O2_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


def set_ops_user_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union / intersect / except (SURVEY.md §2.6: absent from the
    reference, engine-native). Cohorts: users seen in the first vs
    second half of the month."""
    ev = _t(spark, sf_dir, "events")
    cut = F.lit("2024-01-16")
    first = ev.filter(F.col("ts") < cut).select("user_id").distinct()
    second = ev.filter(F.col("ts") >= cut).select("user_id").distinct()
    both = first.intersect(second).select(F.lit("both").alias("cohort"), "user_id")
    only_first = first.exceptAll(second).select(F.lit("only_first").alias("cohort"), "user_id")
    anyhalf = first.union(second).distinct().select(F.lit("any").alias("cohort"), "user_id")
    return both.unionAll(only_first).unionAll(anyhalf)


SET_OPS_ORACLE = """
WITH first_half AS (
  SELECT DISTINCT user_id FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
), second_half AS (
  SELECT DISTINCT user_id FROM events WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'
)
SELECT 'both' AS cohort, user_id FROM (SELECT user_id FROM first_half INTERSECT SELECT user_id FROM second_half)
UNION ALL
SELECT 'only_first', user_id FROM (SELECT user_id FROM first_half EXCEPT SELECT user_id FROM second_half)
UNION ALL
SELECT 'any', user_id FROM (SELECT user_id FROM first_half UNION SELECT user_id FROM second_half)
"""


def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long reshaping (UNPIVOT/melt): per-returnflag measure
    totals unpivoted into (measure, value) rows — the inverse of
    agg_pivot, completing the reshape pair. Aggregate first, then
    melt 6 rows x 4 measures: the unpivot runs on the tiny aggregate,
    never on the fact table."""
    li = _t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_price"),
        dsum("l_discount", 6).alias("sum_disc"),
        dsum("l_tax", 6).alias("sum_tax"),
    )
    return agg.unpivot(
        ["l_returnflag"],
        ["sum_qty", "sum_price", "sum_disc", "sum_tax"],
        "measure",
        "value",
    )


AGG_UNPIVOT_ORACLE = f"""
UNPIVOT (
  SELECT l_returnflag,
         {dsum_sql('l_quantity')}        AS sum_qty,
         {dsum_sql('l_extendedprice')}   AS sum_price,
         {dsum_sql('l_discount', 6)}     AS sum_disc,
         {dsum_sql('l_tax', 6)}          AS sum_tax
  FROM lineitem GROUP BY 1
) ON sum_qty, sum_price, sum_disc, sum_tax
INTO NAME measure VALUE value
"""


def dq_orders_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectations-style data-quality gate over orders: five named
    constraints (range, null, domain, format, uniqueness) evaluated in
    ONE scan via conditional aggregates, reported long-form."""
    from ..operators.dq import constraint_report

    o = _t(spark, sf_dir, "orders")
    return constraint_report(
        o,
        violations={
            "totalprice_positive": F.col("o_totalprice") <= 0,
            "orderdate_not_null": F.col("o_orderdate").isNull(),
            "status_in_domain": ~F.col("o_orderstatus").isin("O", "F", "P"),
            "priority_format": ~F.col("o_orderpriority").like("%-%"),
        },
        unique_keys={"orderkey_unique": "o_orderkey"},
    )


DQ_ORDERS_ORACLE = """
WITH wide AS (
  SELECT count(*) AS n,
    CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_totalprice_positive,
    CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_orderdate_not_null,
    CAST(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END) AS BIGINT) AS v_status_in_domain,
    CAST(sum(CASE WHEN o_orderpriority NOT LIKE '%-%' THEN 1 ELSE 0 END) AS BIGINT) AS v_priority_format,
    count(o_orderkey) - count(DISTINCT o_orderkey) AS v_orderkey_unique
  FROM orders
)
SELECT check_name, n AS n_rows, n_violations, n_violations = 0 AS ok FROM (
  SELECT n, 'totalprice_positive' AS check_name, v_totalprice_positive AS n_violations FROM wide
  UNION ALL SELECT n, 'orderdate_not_null', v_orderdate_not_null FROM wide
  UNION ALL SELECT n, 'status_in_domain', v_status_in_domain FROM wide
  UNION ALL SELECT n, 'priority_format', v_priority_format FROM wide
  UNION ALL SELECT n, 'orderkey_unique', v_orderkey_unique FROM wide
)
ORDER BY check_name
"""


def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewed fact-to-stats join under explicit salting. 75% of events
    collapse onto skew_key 0 (the adversarial case for a keyed
    shuffle); salted_join spreads that key across 8 salts. Row-level
    output is provably placement-independent, so the oracle is the
    plain unsalted SQL join."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "skew_key",
        F.when(F.col("user_id") % 4 != 0, F.lit(0)).otherwise(F.col("user_id")),
    )
    stats = ev.groupBy("skew_key").agg(
        F.count("*").alias("key_events"),
        dsum("value", 6).alias("key_value"),
    )
    return salted_join(
        ev, stats, ["skew_key"], salt_src="event_id", n_salts=8
    ).select("event_id", "skew_key", "key_events", "key_value")


JOIN_SALTED_ORACLE = f"""
WITH ev AS (
  SELECT event_id,
         CASE WHEN user_id % 4 != 0 THEN 0 ELSE user_id END AS skew_key,
         value
  FROM events
), s AS (
  SELECT skew_key, count(*) AS key_events, {dsum_sql('value', 6)} AS key_value
  FROM ev GROUP BY 1
)
SELECT event_id, ev.skew_key AS skew_key, key_events, key_value
FROM ev JOIN s USING (skew_key)
"""


SPECS: dict[str, QuerySpec] = {
    "tpch_q1_pricing_summary": QuerySpec(tpch_q1_pricing_summary, TPCH_Q1_ORACLE, "A2-A4 generalized"),
    "agg_distinct": QuerySpec(agg_distinct, AGG_DISTINCT_ORACLE, "§2.4 distinct"),
    "agg_rollup": QuerySpec(agg_rollup, AGG_ROLLUP_ORACLE, "§2.4 rollup"),
    "agg_cube": QuerySpec(agg_cube, AGG_CUBE_ORACLE, "§2.4 cube"),
    "agg_grouping_sets": QuerySpec(agg_grouping_sets, AGG_GROUPING_SETS_ORACLE, "§2.4 grouping sets"),
    "agg_pivot": QuerySpec(agg_pivot, AGG_PIVOT_ORACLE, "§2.4 pivot"),
    "agg_unpivot": QuerySpec(agg_unpivot, AGG_UNPIVOT_ORACLE, "§2.4 unpivot/melt"),
    "agg_percentiles": QuerySpec(agg_percentiles, AGG_PERCENTILES_ORACLE, "§2.4 quantiles, A12"),
    "join_orders_customer_segment": QuerySpec(join_orders_customer_segment, JOIN_SEGMENT_ORACLE, "§2.3 inner/broadcast"),
    "join_3way_brand_nation": QuerySpec(join_3way_brand_nation, JOIN_3WAY_ORACLE, "§2.3 star join"),
    "join_left_order_counts": QuerySpec(join_left_order_counts, JOIN_LEFT_ORACLE, "§2.3 left outer"),
    "join_semi_big_spenders": QuerySpec(join_semi_big_spenders, JOIN_SEMI_ORACLE, "§2.3 semi"),
    "join_anti_no_big_orders": QuerySpec(join_anti_no_big_orders, JOIN_ANTI_ORACLE, "§2.3 anti, J1"),
    "j2_positional_zip": QuerySpec(j2_positional_zip_simple, J2_ORACLE, "J2"),
    "asof_join_last_purchase": QuerySpec(asof_join_last_purchase, ASOF_ORACLE, "custom asof join"),
    "asof_join_cogrouped_purchase": QuerySpec(
        asof_join_cogrouped_purchase, ASOF_ORACLE, "asof via cogrouped-map pandas"
    ),
    "range_join_attribution": QuerySpec(range_join_attribution, RANGE_JOIN_ORACLE, "custom range join"),
    "join_salted_skew": QuerySpec(join_salted_skew, JOIN_SALTED_ORACLE, "skew-salted join"),
    "dq_orders_report": QuerySpec(dq_orders_report, DQ_ORDERS_ORACLE, "data-quality constraint gate"),
    "o2_topk_orders": QuerySpec(o2_topk_orders, O2_ORACLE, "O2"),
    "set_ops_user_cohorts": QuerySpec(set_ops_user_cohorts, SET_OPS_ORACLE, "§2.6 set ops"),
}
