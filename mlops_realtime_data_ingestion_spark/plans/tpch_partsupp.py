"""True-shape TPC-H Q2/Q9/Q11/Q20 over a DERIVED partsupp relation.

The driver's synthetic schema has no partsupp table, so the base
suite (tpch_queries.py) runs those four in nearest-expressible form.
This module closes the shape gap: ``derived_partsupp`` materializes a
part-supplier relation from the DISTINCT (l_partkey, l_suppkey) pairs
observed in lineitem — so every lineitem row has exactly one matching
partsupp row, like real TPC-H — with availability and supply cost as
deterministic integer arithmetic on the key pair (bit-identical in
Spark and DuckDB, so every oracle states the SAME derivation as a
CTE).

Scale notes: the derivation is one distinct over lineitem's two key
columns (column-pruned scan, one shuffle); at a real deployment
partsupp is a stored dimension and the derivation disappears. The
query bodies are the true TPC-H shapes: correlated min subquery (Q2),
partsupp-joined profit (Q9), HAVING-vs-scalar stock value (Q11),
availability-vs-shipped-quantity semi joins (Q20).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.batch import load_table
from .determinism import davg, dsum, dsum_sql
from .spec import QuerySpec


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(ps_partkey, ps_suppkey, ps_availqty, ps_supplycost): the
    observed part-supplier pairs with synthetic-but-deterministic
    attributes (pure integer arithmetic on the keys)."""
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .distinct()
    )
    return pairs.select(
        "ps_partkey",
        "ps_suppkey",
        ((F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 17) % 9999 + 1)
        .cast("int")
        .alias("ps_availqty"),
        (
            ((F.col("ps_partkey") * 13 + F.col("ps_suppkey") * 7) % 9000 + 100)
            / F.lit(100.0)
        ).alias("ps_supplycost"),
    )


_PARTSUPP_CTE = """partsupp AS (
  SELECT ps_partkey, ps_suppkey,
         CAST((ps_partkey * 31 + ps_suppkey * 17) % 9999 + 1 AS INT) AS ps_availqty,
         ((ps_partkey * 13 + ps_suppkey * 7) % 9000 + 100) / 100.0 AS ps_supplycost
  FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
        FROM lineitem)
)"""


# ---------- Q2 true shape: minimum-cost supplier ----------

def tpch_q2_true(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True Q2: the correlated min-supplycost subquery over partsupp,
    restricted to EUROPE suppliers, LARGE parts.  The correlated min
    is an unordered window over ps_partkey (no join-back, no second
    partsupp scan); supplier/nation/region broadcast; final top-100
    is TakeOrderedAndProject."""
    ps = derived_partsupp(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "LARGE"
    ).select("p_partkey")
    eur = (
        ps.join(F.broadcast(supp), ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("ps_partkey", "ps_supplycost", "s_acctbal", "s_name", "n_name")
    )
    min_cost = F.min("ps_supplycost").over(Window.partitionBy("ps_partkey"))
    return (
        eur.withColumn("min_cost", min_cost)
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .join(F.broadcast(part), F.col("ps_partkey") == part.p_partkey)
        .select(
            "s_acctbal", "s_name", "n_name",
            F.col("ps_partkey").alias("p_partkey"), "ps_supplycost",
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", F.col("p_partkey").asc()
        )
        .limit(100)
    )


TPCH_Q2_TRUE_ORACLE = f"""
WITH {_PARTSUPP_CTE},
eur AS (
  SELECT ps_partkey, ps_supplycost, s_acctbal, s_name, n_name
  FROM partsupp
  JOIN supplier ON ps_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
), best AS (
  SELECT ps_partkey AS b_partkey, min(ps_supplycost) AS min_cost
  FROM eur GROUP BY 1
)
SELECT s_acctbal, s_name, n_name, ps_partkey AS p_partkey, ps_supplycost
FROM eur
JOIN best ON ps_partkey = b_partkey AND ps_supplycost = min_cost
JOIN part ON p_partkey = ps_partkey AND p_type = 'LARGE'
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


# ---------- Q9 true shape: product-type profit ----------

def tpch_q9_true(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True Q9: profit = disc price - ps_supplycost * l_quantity, the
    supply cost coming from the partsupp relation joined on BOTH keys.
    partsupp is co-keyed with lineitem on (partkey, suppkey); the only
    big-big shuffle is lineitem⋈orders on the orderkey."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    ps = derived_partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    ).select("p_partkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("ps_supplycost") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(
            ps,
            (li.l_partkey == ps.ps_partkey) & (li.l_suppkey == ps.ps_suppkey),
        )
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(dsum(amount, 6).alias("sum_profit"))
        .orderBy(F.col("nation").asc(), F.col("o_year").desc())
    )


TPCH_Q9_TRUE_ORACLE = f"""
WITH {_PARTSUPP_CTE}
SELECT nation, o_year, {dsum_sql('amount', 6)} AS sum_profit
FROM (
  SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
         l_extendedprice * (1 - l_discount) - ps_supplycost * l_quantity AS amount
  FROM part, supplier, lineitem, partsupp, orders, nation
  WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
    AND ps_partkey = l_partkey AND ps_suppkey = l_suppkey
    AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
    AND p_name LIKE '%red%'
) profit
GROUP BY 1, 2 ORDER BY 1 ASC, 2 DESC
"""


# ---------- Q11 true shape: important stock value ----------

def tpch_q11_true(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True Q11: per-part stock value = sum(ps_supplycost *
    ps_availqty) over a nation group's suppliers, HAVING value above a
    scalar over the same relation (2x the per-part average — the
    relative spelling stays meaningful at any scale, where the classic
    absolute fraction degenerates)."""
    ps = derived_partsupp(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin([f"NATION_{i}" for i in range(1, 6)])
    ).select("n_nationkey")
    group_supp = F.broadcast(
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("s_suppkey")
    )
    val = (
        ps.join(group_supp, ps.ps_suppkey == F.col("s_suppkey"), "left_semi")
        .groupBy("ps_partkey")
        .agg(dsum(F.col("ps_supplycost") * F.col("ps_availqty"), 6).alias("value"))
    )
    cut = val.agg((F.lit(2.0) * davg("value", 6)).alias("cut"))
    return (
        val.crossJoin(F.broadcast(cut))
        .filter(F.col("value") > F.col("cut"))
        .select(F.col("ps_partkey").alias("p_partkey"), "value")
        .orderBy(F.col("value").desc(), F.col("p_partkey").asc())
    )


TPCH_Q11_TRUE_ORACLE = f"""
WITH {_PARTSUPP_CTE},
val AS (
  SELECT ps_partkey,
         {dsum_sql('ps_supplycost * ps_availqty', 6)} AS value
  FROM partsupp, supplier, nation
  WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
    AND n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4','NATION_5')
  GROUP BY 1
)
SELECT ps_partkey AS p_partkey, value FROM val
WHERE value > (SELECT 2.0 * ({dsum_sql('value', 6)} / count(value)) FROM val)
ORDER BY value DESC, p_partkey
"""


# ---------- Q20 true shape: excess-availability suppliers ----------

def tpch_q20_true(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True Q20: suppliers (of a nation group) holding more than half
    the quantity they shipped of a part family in one year —
    ps_availqty > 0.5 * sum(l_quantity).  The correlated sum becomes a
    co-keyed (part, supp) aggregate joined to partsupp; pairs with no
    1996 shipments drop out, matching the NULL-comparison semantics of
    the original correlated subquery."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%")
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    shipped = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(dsum("l_quantity").alias("qty"))
    )
    ps = derived_partsupp(spark, sf_dir)
    qualifying = (
        ps.join(F.broadcast(part), ps.ps_partkey == part.p_partkey, "left_semi")
        .join(
            shipped,
            (ps.ps_partkey == shipped.l_partkey)
            & (ps.ps_suppkey == shipped.l_suppkey),
        )
        .filter(F.col("ps_availqty") > F.lit(0.5) * F.col("qty").cast("double"))
        .select("ps_suppkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin([f"NATION_{i}" for i in range(1, 11)])
    ).select("n_nationkey")
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey, "left_semi")
        .join(F.broadcast(qualifying), supp.s_suppkey == F.col("ps_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_suppkey")
    )


TPCH_Q20_TRUE_ORACLE = f"""
WITH {_PARTSUPP_CTE},
shipped AS (
  SELECT l_partkey, l_suppkey, {dsum_sql('l_quantity')} AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY 1, 2
), qualifying AS (
  SELECT DISTINCT ps_suppkey
  FROM partsupp
  JOIN shipped ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
  WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
    AND ps_availqty > 0.5 * CAST(qty AS DOUBLE)
)
SELECT s_suppkey, s_name, s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4','NATION_5',
                 'NATION_6','NATION_7','NATION_8','NATION_9','NATION_10')
  AND s_suppkey IN (SELECT ps_suppkey FROM qualifying)
ORDER BY s_suppkey
"""


SPECS: dict[str, QuerySpec] = {
    "tpch_q2_true": QuerySpec(
        tpch_q2_true, TPCH_Q2_TRUE_ORACLE, "Q2 true shape over derived partsupp"
    ),
    "tpch_q9_true": QuerySpec(
        tpch_q9_true, TPCH_Q9_TRUE_ORACLE, "Q9 true shape over derived partsupp"
    ),
    "tpch_q11_true": QuerySpec(
        tpch_q11_true, TPCH_Q11_TRUE_ORACLE, "Q11 true shape over derived partsupp"
    ),
    "tpch_q20_true": QuerySpec(
        tpch_q20_true, TPCH_Q20_TRUE_ORACLE, "Q20 true shape over derived partsupp"
    ),
}
