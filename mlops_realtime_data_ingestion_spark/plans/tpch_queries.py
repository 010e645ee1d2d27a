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


# ---------- Q2: minimum-cost supplier ----------

def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-cost supplier per part (adapted: no partsupp table, so the
    part-supplier relation and its supply cost are the ones observed
    in lineitem — min unit price per (part, supplier)). The correlated
    min-subquery becomes a per-part aggregate of the already-grouped
    cost table joined back on the same key (co-partitioned, no second
    scan of lineitem); supplier/nation/region broadcast."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_acctbal", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "LARGE").select("p_partkey")
    from pyspark.sql.window import Window

    # one shuffle total: hash on l_partkey up front — it satisfies the
    # (l_partkey, l_suppkey) grouping AND the per-part window, so
    # neither re-exchanges; the correlated-min is an unordered window,
    # not a join-back (a join-back re-computes the whole subtree —
    # Catalyst has no CTE reuse — doubling the lineitem scan).
    cost = (
        li.repartition("l_partkey")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supplycost"))
    )
    ecost = (
        cost.join(F.broadcast(supp), cost.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("l_partkey", "supplycost", "s_acctbal", "s_name", "n_name")
    )
    min_cost = F.min("supplycost").over(Window.partitionBy("l_partkey"))
    return (
        ecost.withColumn("min_cost", min_cost)
        .filter(F.col("supplycost") == F.col("min_cost"))
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "supplycost")
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", F.col("p_partkey").asc()
        )
        .limit(100)
    )


TPCH_Q2_ORACLE = """
WITH cost AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS supplycost
  FROM lineitem GROUP BY 1, 2
), ecost AS (
  SELECT cost.*, s_acctbal, s_name, n_name FROM cost
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
), best AS (
  SELECT l_partkey AS b_partkey, min(supplycost) AS min_cost FROM ecost GROUP BY 1
)
SELECT s_acctbal, s_name, n_name, p_partkey, supplycost
FROM ecost
JOIN best ON l_partkey = b_partkey AND supplycost = min_cost
JOIN part ON p_partkey = l_partkey AND p_type = 'LARGE'
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


_NAT10 = (
    "('NATION_1','NATION_2','NATION_3','NATION_4','NATION_5',"
    "'NATION_6','NATION_7','NATION_8','NATION_9','NATION_10')"
)
_NAT10_LIST = [f"NATION_{i}" for i in range(1, 11)]


# ---------- Q7: volume shipping between nation groups ----------

def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-border revenue between two nation groups per year
    (adapted: nation *sets* instead of the classic FRANCE/GERMANY pair
    — the synthetic data spreads 10 suppliers over 25 nations at
    sf0.001, so single-nation pairs are empty). Both nation lookups
    broadcast; the one shuffle is lineitem⋈orders."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") <= F.lit("1997-12-31"))
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = (
        _t(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(_NAT10_LIST))
        .select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    )
    n2 = (
        _t(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(_NAT10_LIST))
        .select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dsum(_disc_price(), 6).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


TPCH_Q7_ORACLE = f"""
SELECT supp_nation, cust_nation, l_year, {dsum_sql('volume', 6)} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INT) AS l_year, {_DISC_PRICE_SQL} AS volume
  FROM supplier, lineitem, orders, customer, nation n1, nation n2
  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
    AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
    AND c_nationkey = n2.n_nationkey
    AND n1.n_name IN {_NAT10} AND n2.n_name IN {_NAT10}
    AND n1.n_name <> n2.n_name
    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                       AND TIMESTAMP '1997-12-31 00:00:00'
) shipping
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


# ---------- Q8: national market share ----------

def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One supplier-nation's share of a region's market for one part
    type, per order year. Conditional decimal sum / decimal sum →
    bitwise-stable double ratio; dims broadcast, lineitem⋈orders is
    the shuffle."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") <= F.lit("1997-12-31"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    vol = _disc_price().cast("decimal(18,6)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == region.r_regionkey)
        .join(
            F.broadcast(
                _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
            ),
            li.l_suppkey == F.col("s_suppkey"),
        )
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("nation") == "NATION_3", vol).otherwise(
                        F.lit(0).cast("decimal(18,6)")
                    )
                ).cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


TPCH_Q8_ORACLE = f"""
SELECT o_year,
       CAST(sum(CASE WHEN nation = 'NATION_3' THEN CAST(volume AS DECIMAL(18,6))
                     ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
       / CAST(sum(CAST(volume AS DECIMAL(18,6))) AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS INT) AS o_year, {_DISC_PRICE_SQL} AS volume,
         n2.n_name AS nation
  FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
    AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
    AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                        AND TIMESTAMP '1997-12-31 00:00:00'
    AND p_type = 'ECONOMY'
) all_nations
GROUP BY 1 ORDER BY 1
"""


# ---------- Q9: product-type profit ----------

def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit by supplier nation and order year for one part family
    (adapted: no partsupp, so supply cost = 10% of the part's retail
    price × quantity — per-row scalar double math, deterministic).
    part filter broadcast-pruned before the orderkey shuffle."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%")).select(
        "p_partkey", "p_retailprice"
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    amount = _disc_price() - F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.1)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(dsum(amount, 6).alias("sum_profit"))
        .orderBy(F.col("nation").asc(), F.col("o_year").desc())
    )


TPCH_Q9_ORACLE = f"""
SELECT nation, o_year, {dsum_sql('amount', 6)} AS sum_profit
FROM (
  SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
         {_DISC_PRICE_SQL} - p_retailprice * l_quantity * 0.1 AS amount
  FROM part, supplier, lineitem, orders, nation
  WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
    AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
    AND p_name LIKE '%red%'
) profit
GROUP BY 1, 2 ORDER BY 1 ASC, 2 DESC
"""


# ---------- Q11: important stock value ----------

def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose observed inventory value (from a nation group's
    suppliers) exceeds 2× the average per-part value. The threshold is
    a scalar over the SAME aggregated set — computed once, broadcast
    back; scale-stable because it is relative, not absolute (a fixed
    fraction breaks as |parts| grows)."""
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin([f"NATION_{i}" for i in range(1, 6)])
    ).select("n_nationkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount", "l_tax"
    )
    value_expr = (
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    )
    group_supp = F.broadcast(
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("s_suppkey")
    )
    val = (
        li.join(group_supp, li.l_suppkey == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(dsum(value_expr, 6).alias("value"))
    )
    cut = val.agg((F.lit(2.0) * davg("value", 6)).alias("cut"))
    return (
        val.crossJoin(F.broadcast(cut))
        .filter(F.col("value") > F.col("cut"))
        .select(F.col("l_partkey").alias("p_partkey"), "value")
        .orderBy(F.col("value").desc(), F.col("p_partkey").asc())
    )


TPCH_Q11_ORACLE = f"""
WITH val AS (
  SELECT l_partkey,
         {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS value
  FROM lineitem, supplier, nation
  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
    AND n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4','NATION_5')
  GROUP BY 1
)
SELECT l_partkey AS p_partkey, value FROM val
WHERE value > (SELECT 2.0 * ({dsum_sql('value', 6)} / count(value)) FROM val)
ORDER BY value DESC, p_partkey
"""


# ---------- Q12: late shipments by priority ----------

def tpch_q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineitems shipped >60 days after their order date in one year,
    split into high/low-priority order counts per linestatus (adapted:
    no shipmode/commitdate columns — lateness is ship-vs-order-date,
    the grouping key is l_linestatus). Date filters push to the scan;
    the non-equi lateness predicate evaluates post-join."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    ).select("l_orderkey", "l_shipdate", "l_linestatus")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


TPCH_Q12_ORACLE = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders, lineitem
WHERE o_orderkey = l_orderkey
  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1 ORDER BY 1
"""


# ---------- Q13: customer order-count distribution ----------

def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of customers by number of qualifying orders,
    INCLUDING zero-order customers — the left outer join keeps them,
    count(o_orderkey) ignores the null. Both sides shuffle on custkey;
    the second aggregate is |distinct counts|-sized (tiny)."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    ).select("o_orderkey", "o_custkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


TPCH_Q13_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY 1
) c_orders
GROUP BY 1 ORDER BY custdist DESC, c_count DESC
"""


# ---------- Q20: excess-shipment suppliers ----------

def tpch_q20_excess_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers of one nation group who shipped an above-average
    quantity of one part family in a year (adapted: no partsupp
    availability, so 'excess stock' = shipped quantity above the
    per-supplier average). Nested IN-subqueries become semi joins:
    part-filter semi into lineitem, threshold scalar broadcast,
    qualifying-supplier set semi into supplier."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("small%")).select(
        "p_partkey"
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    shipped = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(dsum("l_quantity").alias("qty"))
    )
    cut = shipped.agg(davg("qty").alias("cut"))
    qualifying = (
        shipped.crossJoin(F.broadcast(cut))
        .filter(F.col("qty") > F.col("cut"))
        .select("l_suppkey")
    )
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(_NAT10_LIST)
    ).select("n_nationkey")
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey, "left_semi")
        .join(F.broadcast(qualifying), supp.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_suppkey")
    )


TPCH_Q20_ORACLE = f"""
WITH shipped AS (
  SELECT l_suppkey, {dsum_sql('l_quantity')} AS qty
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY 1
)
SELECT s_suppkey, s_name, s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name IN {_NAT10}
  AND s_suppkey IN (SELECT l_suppkey FROM shipped
                    WHERE qty > (SELECT {dsum_sql('qty')} / count(qty) FROM shipped))
ORDER BY s_suppkey
"""


# ---------- Q21: suppliers who kept orders waiting ----------

def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who were the SOLE late shipper on finished
    multi-supplier orders (adapted: late = shipped >90 days after the
    order date; no receipt/commit dates). The two correlated
    EXISTS/NOT-EXISTS become a semi join (another supplier exists on
    the order) and an anti join (no OTHER supplier was late) — all
    three joins share the l_orderkey shuffle key, so the exchange is
    reused; supplier/nation broadcast at the end."""
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90))
        .select("l_orderkey", "l_suppkey")
    )
    l1 = late.alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = late.alias("l3")
    has_other = l1.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    )
    sole_late = has_other.alias("l1").join(
        l3,
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
        "left_anti",
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin([f"NATION_{i}" for i in range(1, 6)])
    ).select("n_nationkey")
    return (
        sole_late.join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey, "left_semi")
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(100)
    )


TPCH_Q21_ORACLE = """
SELECT s_name, count(*) AS numwait
FROM supplier, lineitem l1, orders, nation
WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND s_nationkey = n_nationkey
  AND n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4','NATION_5')
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
                  WHERE o3.o_orderstatus = 'F'
                    AND l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)
GROUP BY 1 ORDER BY numwait DESC, s_name
LIMIT 100
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
    "tpch_q2_min_cost_supplier": QuerySpec(tpch_q2_min_cost_supplier, TPCH_Q2_ORACLE, "§2.3 min-subquery join-back"),
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
    "tpch_q7_volume_shipping": QuerySpec(tpch_q7_volume_shipping, TPCH_Q7_ORACLE, "§2.3 dual-dim self-join"),
    "tpch_q8_market_share": QuerySpec(tpch_q8_market_share, TPCH_Q8_ORACLE, "§2.4 conditional ratio"),
    "tpch_q9_product_profit": QuerySpec(tpch_q9_product_profit, TPCH_Q9_ORACLE, "§2.4 multi-dim profit"),
    "tpch_q11_important_stock": QuerySpec(tpch_q11_important_stock, TPCH_Q11_ORACLE, "§2.4 HAVING vs scalar"),
    "tpch_q12_late_shipments": QuerySpec(tpch_q12_late_shipments, TPCH_Q12_ORACLE, "§2.3 non-equi lateness"),
    "tpch_q13_customer_distribution": QuerySpec(tpch_q13_customer_distribution, TPCH_Q13_ORACLE, "§2.3 outer join histogram"),
    "tpch_q20_excess_shipments": QuerySpec(tpch_q20_excess_shipments, TPCH_Q20_ORACLE, "§2.3 nested semi joins"),
    "tpch_q21_waiting_suppliers": QuerySpec(tpch_q21_waiting_suppliers, TPCH_Q21_ORACLE, "§2.3 semi+anti self-join"),
}
