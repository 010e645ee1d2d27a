"""TPC-H-derived decision-support suite (adapted to the driver's
synthetic star schema — no partsupp/shipmode/commitdate columns, so
Q4/Q12/Q16 use the nearest expressible shape).

SURVEY.md §2.3-§2.6 note that the reference delegates all relational
planning to Athena/Presto and Flink/Calcite (SURVEY.md §4); the engine
therefore has to prove the full decision-support surface on Spark.
These queries are the canonical shapes a reference user would run via
Athena on the offline store (preprocess.py:77-87 is a plain
``SELECT *`` — everything richer is our engine's added surface).

Every query is written for the 100 TB plan shape first:
- dims (region/nation/customer/supplier/part) broadcast — the only
  big-big shuffle anywhere is lineitem⋈orders on l_orderkey;
- aggregates are decimal-backed (plans/determinism.dsum) so results
  are bitwise reproducible regardless of partitioning;
- top-N uses orderBy+limit => TakeOrderedAndProject (no global sort);
- correlated EXISTS/NOT-EXISTS become semi/anti joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.batch import load_table
from .determinism import davg, davg_sql, dsum, dsum_sql
from .spec import QuerySpec


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _disc_price():
    # built lazily: Column construction needs an active SparkContext
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_DISC_PRICE_SQL = "l_extendedprice * (1 - l_discount)"


# ---------- Q3: shipping priority ----------

def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 unshipped-revenue orders for one market segment.
    customer is a broadcast dim filter (segment pushdown before the
    join); lineitem⋈orders shuffles on the join key; final top-10 is
    TakeOrderedAndProject."""
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1999-03-15")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1999-03-15")
    )
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(_disc_price(), 6).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


TPCH_Q3_ORACLE = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       {dsum_sql(_DISC_PRICE_SQL, 6)} AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1999-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1999-03-15 00:00:00'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# ---------- Q4: order priority checking (late-ship EXISTS) ----------

def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders having at least one lineitem shipped >60 days after the
    order date, counted per priority. The correlated EXISTS is a
    left-semi join on o_orderkey with the non-equi lateness predicate
    evaluated inside the join — no fan-out on multi-match."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (orders.o_orderkey == li.l_orderkey) & (
        li.l_shipdate > F.date_add(orders.o_orderdate, 60)
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


TPCH_Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY 1
ORDER BY 1
"""


# ---------- Q5: local supplier volume ----------

def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from orders where the supplying nation equals the
    customer nation, per nation of one region. Customer, supplier,
    nation, region all broadcast; the single shuffle is
    lineitem⋈orders. The c_nationkey = s_nationkey 'local' predicate
    lands as a post-join filter on two broadcast-joined columns."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    ).select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(_disc_price(), 6).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


TPCH_Q5_ORACLE = f"""
SELECT n_name, {dsum_sql(_DISC_PRICE_SQL, 6)} AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY 1
ORDER BY revenue DESC, n_name
"""


# ---------- Q6: forecasting revenue change ----------

def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure scan->filter->global-agg: every predicate pushes to the
    parquet scan (shipdate min/max prune row groups), the aggregate is
    a map-side partial sum of decimals — the shuffle carries one row
    per task."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), 6).alias("revenue"))
    )


TPCH_Q6_ORACLE = f"""
SELECT {dsum_sql('l_extendedprice * l_discount', 6)} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# ---------- Q10: returned item reporting ----------

def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by revenue lost to returns in a quarter.
    customer+nation broadcast; lineitem pre-filtered on returnflag
    before the orderkey shuffle."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    ).select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(_disc_price(), 6).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


TPCH_Q10_ORACLE = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       {dsum_sql(_DISC_PRICE_SQL, 6)} AS revenue
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND c_nationkey = n_nationkey
  AND l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# ---------- Q14: promotion effect ----------

def tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promo revenue share: conditional decimal sum / decimal sum —
    both exact, so the double ratio is bitwise identical across
    engines. part broadcast; single scan of lineitem."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01"))
        & (F.col("l_shipdate") < F.lit("1996-10-01"))
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    dp = _disc_price().cast("decimal(18,6)")
    promo = F.when(F.col("p_type") == "PROMO", dp)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(dp).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


TPCH_Q14_ORACLE = f"""
SELECT 100.0
       * CAST(sum(CASE WHEN p_type = 'PROMO'
                       THEN CAST({_DISC_PRICE_SQL} AS DECIMAL(18,6)) END) AS DOUBLE)
       / CAST(sum(CAST({_DISC_PRICE_SQL} AS DECIMAL(18,6))) AS DOUBLE)
       AS promo_revenue_pct
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
"""


# ---------- Q15: top supplier ----------

def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with max quarterly revenue. The per-supplier
    aggregate is tiny (|suppliers| rows), so the max is computed on
    the aggregated set and broadcast back — no second scan of
    lineitem, no single-partition window over base data."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = li.groupBy("l_suppkey").agg(dsum(_disc_price(), 6).alias("total_revenue"))
    best = rev.agg(F.max("total_revenue").alias("max_rev"))
    return (
        rev.join(F.broadcast(best), rev.total_revenue == best.max_rev)
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


TPCH_Q15_ORACLE = f"""
WITH revenue AS (
  SELECT l_suppkey, {dsum_sql(_DISC_PRICE_SQL, 6)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY 1
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# ---------- Q16: supplier-part relationship counting ----------

def tpch_q16_parts_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct suppliers per (brand, type, size) over the observed
    lineitem associations (the schema has no partsupp table). part is
    the broadcast side; countDistinct shuffles (brand,type,size,supp)
    pairs only."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & (F.col("p_size") < 20)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


TPCH_Q16_ORACLE = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_size < 20
GROUP BY 1, 2, 3
"""


# ---------- Q17: small-quantity-order revenue ----------

def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average yearly revenue lost if small-quantity orders were not
    taken: lineitems below 20% of their part's average quantity. The
    correlated scalar subquery becomes a partial-agg on l_partkey
    joined back — the per-part aggregate is |parts|-sized, shuffled
    once on the same key as the probe side (co-partitioned join)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#12").select(
        "p_partkey"
    )
    branded = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    avg_qty = branded.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.lit(0.2) * davg("l_quantity")).alias("qty_cut")
    )
    return (
        branded.join(avg_qty, branded.l_partkey == avg_qty.ap_partkey)
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg((dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))
    )


TPCH_Q17_ORACLE = f"""
SELECT {dsum_sql('l_extendedprice')} / 7.0 AS avg_yearly
FROM lineitem l JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#12'
  AND l_quantity < (
    SELECT 0.2 * {davg_sql('l_quantity')}
    FROM lineitem li2 WHERE li2.l_partkey = l.l_partkey
      AND li2.l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#12')
  )
"""


# ---------- Q18: large-volume customers ----------

def tpch_q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total quantity exceeds 250, with their customers.
    HAVING-filtered per-order aggregate (tiny) joins back to orders on
    the already-partitioned key; customer broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


TPCH_Q18_ORACLE = f"""
WITH big AS (
  SELECT l_orderkey, {dsum_sql('l_quantity')} AS sum_qty
  FROM lineitem GROUP BY 1
  HAVING sum_qty > 250
)
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM orders JOIN big ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


# ---------- Q19: disjunctive predicate revenue ----------

def tpch_q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue under OR-of-ANDs brand/quantity predicates — the shape
    that exercises CNF/DNF predicate handling. The disjunction
    evaluates post-join (it references both sides); the partkey equi
    join stays broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & (q >= 1) & (q <= 11) & (F.col("p_size") <= 5))
        | ((F.col("p_brand") == "Brand#15") & (q >= 10) & (q <= 20) & (F.col("p_size") <= 10))
        | ((F.col("p_brand") == "Brand#19") & (q >= 20) & (q <= 30) & (F.col("p_size") <= 15))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(dsum(_disc_price(), 6).alias("revenue"))
    )


TPCH_Q19_ORACLE = f"""
SELECT {dsum_sql(_DISC_PRICE_SQL, 6)} AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11 AND p_size <= 5)
   OR (p_brand = 'Brand#15' AND l_quantity BETWEEN 10 AND 20 AND p_size <= 10)
   OR (p_brand = 'Brand#19' AND l_quantity BETWEEN 20 AND 30 AND p_size <= 15)
"""


# ---------- Q22: dormant high-balance customers ----------

def tpch_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with above-average balance and no recent orders
    (none since 2000-01-01 — every synthetic customer has SOME order),
    per nation: scalar-subquery average (computed once, broadcast) +
    anti join. The anti join shuffles on c_custkey/o_custkey."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01")
    ).select("o_custkey")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        davg("c_acctbal").alias("cut")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("cut"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


TPCH_Q22_ORACLE = f"""
SELECT c_nationkey, count(*) AS numcust, {dsum_sql('c_acctbal')} AS totacctbal
FROM customer c
WHERE c_acctbal > (SELECT {davg_sql('c_acctbal')} FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY 1
ORDER BY 1
"""


SPECS: dict[str, QuerySpec] = {
    "tpch_q3_shipping_priority": QuerySpec(tpch_q3_shipping_priority, TPCH_Q3_ORACLE, "§2.3/§2.6 join+topN"),
    "tpch_q4_order_priority": QuerySpec(tpch_q4_order_priority, TPCH_Q4_ORACLE, "§2.3 correlated EXISTS"),
    "tpch_q5_local_supplier_volume": QuerySpec(tpch_q5_local_supplier_volume, TPCH_Q5_ORACLE, "§2.3 6-way star"),
    "tpch_q6_forecast_revenue": QuerySpec(tpch_q6_forecast_revenue, TPCH_Q6_ORACLE, "§2.2 pushdown agg"),
    "tpch_q10_returned_items": QuerySpec(tpch_q10_returned_items, TPCH_Q10_ORACLE, "§2.3/§2.6"),
    "tpch_q14_promo_effect": QuerySpec(tpch_q14_promo_effect, TPCH_Q14_ORACLE, "§2.4 conditional agg"),
    "tpch_q15_top_supplier": QuerySpec(tpch_q15_top_supplier, TPCH_Q15_ORACLE, "§2.4 agg+scalar max"),
    "tpch_q16_parts_supplier_cnt": QuerySpec(tpch_q16_parts_supplier_cnt, TPCH_Q16_ORACLE, "§2.4 distinct agg"),
    "tpch_q17_small_qty_revenue": QuerySpec(tpch_q17_small_qty_revenue, TPCH_Q17_ORACLE, "§2.3 correlated scalar"),
    "tpch_q18_large_volume_customers": QuerySpec(tpch_q18_large_volume_customers, TPCH_Q18_ORACLE, "§2.4 HAVING join-back"),
    "tpch_q19_disjunctive_predicates": QuerySpec(tpch_q19_disjunctive_predicates, TPCH_Q19_ORACLE, "§2.2 DNF predicates"),
    "tpch_q22_dormant_customers": QuerySpec(tpch_q22_dormant_customers, TPCH_Q22_ORACLE, "§2.3 anti+scalar subquery"),
}
