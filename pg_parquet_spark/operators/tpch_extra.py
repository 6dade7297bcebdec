"""Wider TPC-H-shaped coverage (ROADMAP #7): Q7/Q8/Q13/Q18/Q22 adapted
to the driver's star schema (no partsupp table, no l_shipmode/l_commitdate
columns — queries needing those are out of data scope; the operator
classes they exercise are covered below and in queries.py).

Every query follows the r2 representation contract: decimal arithmetic
internally, DOUBLE/BIGINT/DATE in final outputs, aliases identical to the
oracle (queries.py module docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg_parquet_spark.operators.queries import _dec
from pg_parquet_spark.session import table


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations (direction-paired join filter)

def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    supplier = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    revenue = _dec("l_extendedprice") * (F.lit(1).cast("decimal(12,2)") - _dec("l_discount"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_ORACLE = """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
         CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) AS volume
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# ---------------------------------------------------------------------------
# Q8 — market share of one nation within a region's part-type market

def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    supplier = table(spark, sf_dir, "supplier")
    part = table(spark, sf_dir, "part")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    # sums stay DECIMAL (exact, partitioning-independent); only the final
    # ratio is double — a double SUM would be addition-order-dependent
    # across partitions and drift from the oracle's sequential fold
    volume = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(12,2)") - _dec("l_discount")
    )
    zero = F.lit(0).cast("decimal(25,4)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(region), F.col("c_rkey") == region.r_regionkey)
        .filter((F.col("r_name") == "EUROPE") & (F.col("p_type") == "PROMO"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_1", volume).otherwise(zero))
                .cast("double")
                / F.sum(volume).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


Q8_ORACLE = """
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume
                ELSE CAST(0 AS DECIMAL(25,4)) END) AS DOUBLE)
         / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
         CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) AS volume,
         n1.n_name AS supp_nation
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region ON n2.n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (outer join + double grouping)

def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# ---------------------------------------------------------------------------
# Q18 — large-volume customers (HAVING subquery over an aggregate)

def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("_qty"))
        .filter(F.col("_qty") > 120)
        .select("l_orderkey", "_qty")
    )
    return (
        big_orders.join(orders, big_orders.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_totalprice",
            F.col("_qty").cast("double").alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


Q18_ORACLE = """
SELECT c_name, c_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS o_orderdate, o_totalprice,
       CAST(qty AS DOUBLE) AS sum_qty
FROM (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 120
) big
JOIN orders ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Q22 — global-acctbal-average anti-join (scalar subquery + NOT EXISTS)

def q22_prospective_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    # avg = exact decimal sum / count, widened to double at the end —
    # AVG(double) would be addition-order-dependent across partitions and
    # the engines also disagree on AVG(decimal) result types
    avg_bal = (
        customer.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))
            ).alias("_avg")
        )
    )
    rich = (
        customer.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg"))
    )
    # every synthetic customer has at least one order, so "prospective" is
    # adapted to "no HIGH-VALUE order" — same NOT EXISTS + anti-join shape
    big = orders.filter(F.col("o_totalprice") > 250000)
    no_orders = rich.join(big, rich.c_custkey == big.o_custkey, "left_anti")
    return (
        no_orders.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


Q22_ORACLE = """
SELECT c_mktsegment, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
                   FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 250000)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""




# ---------------------------------------------------------------------------
# Q15 — top supplier by period revenue (CTE + scalar-max subquery)

def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    supplier = table(spark, sf_dir, "supplier")
    revenue = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(12,2)") - _dec("l_discount")
    )
    per_supp = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(revenue).alias("_rev"))
    )
    # max over exact decimals → equality join is safe (no float compare)
    top = per_supp.agg(F.max("_rev").alias("_max_rev"))
    return (
        per_supp.crossJoin(F.broadcast(top))
        .filter(F.col("_rev") == F.col("_max_rev"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == supplier.s_suppkey)
        .select(
            "s_suppkey", "s_name", F.col("_rev").cast("double").alias("total_revenue")
        )
        .orderBy("s_suppkey")
    )


Q15_ORACLE = """
WITH revenue0 AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
WHERE total_rev = (SELECT MAX(total_rev) FROM revenue0)
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated per-part average)

def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    # per-part avg quantity = exact decimal sum / count (AVG(double) would
    # be partitioning-dependent and the engines disagree on AVG(decimal))
    per_part = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (
            F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))
        ).alias("_avg_qty")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(F.col("p_brand") == "Brand#1")
        .join(per_part, li.l_partkey == per_part._pk)
        .filter(F.col("l_quantity") < 0.5 * F.col("_avg_qty"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


Q17_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < 0.5 * (
    SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
    FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)
"""


QUERIES = {
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q13_customer_distribution": q13_customer_distribution,
    "q18_large_volume": q18_large_volume,
    "q22_prospective_customers": q22_prospective_customers,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_quantity": q17_small_quantity,
}

ORACLES = {
    "q7_volume_shipping": Q7_ORACLE,
    "q8_market_share": Q8_ORACLE,
    "q13_customer_distribution": Q13_ORACLE,
    "q18_large_volume": Q18_ORACLE,
    "q22_prospective_customers": Q22_ORACLE,
    "q15_top_supplier": Q15_ORACLE,
    "q17_small_quantity": Q17_ORACLE,
}
