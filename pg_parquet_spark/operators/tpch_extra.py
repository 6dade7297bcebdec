"""Wider TPC-H-shaped coverage (ROADMAP #7): Q7/Q8/Q13/Q15/Q17/Q18/Q22
(r2) + Q2/Q9/Q11/Q12/Q16/Q20/Q21 (r3) adapted to the driver's star schema.
No partsupp table → a derived (part, supplier) bridge from lineitem
(_partsupp); no l_shipmode/l_commitdate/l_receiptdate → "late" becomes
shipped >60 days after order date and "mode" becomes l_returnflag. The
operator shapes (correlated min, double-EXISTS anti-join, scalar-subquery
HAVING, NOT-IN exclusion, CASE-pivot agg) are preserved.

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


# ---------------------------------------------------------------------------
# Derived partsupp bridge: the synthetic schema has no partsupp table, so
# the (part, supplier) relationship is materialized from lineitem — cost =
# MIN extendedprice, availqty = total quantity. Exact decimal aggregates
# keep every downstream comparison engine-identical.

def _partsupp(li: DataFrame) -> DataFrame:
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(_dec("l_extendedprice")).alias("ps_supplycost"),
        F.sum(_dec("l_quantity")).alias("ps_availqty"),
    )


PS_SQL = """partsupp AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS ps_supplycost,
         SUM(CAST(l_quantity AS DECIMAL(12,2))) AS ps_availqty
  FROM lineitem GROUP BY 1, 2
)"""


# ---------------------------------------------------------------------------
# Q2 — min-cost supplier (correlated scalar MIN over a 4-join chain)

def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The correlated-min shape: cost must equal the minimum over ALL
    EUROPE suppliers of that part. Window-min over ps_partkey replaces
    the correlated subquery (one shuffle, no agg-self-join); decimal
    equality makes the min-match exact on both engines."""
    from pyspark.sql.window import Window

    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    supplier = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    europe_supp = (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    target_parts = part.filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "PROMO")
    ).select("p_partkey", "p_name")
    # r14 (guide §3.2 "reduce the big side before shuffling it"): both
    # dimension filters restrict the partsupp GROUP KEYS (part, supp),
    # so pushing them below the aggregate as broadcast semi-joins is
    # exactly equivalent (every row of a group shares the keys) and the
    # grouping exchange carries only target-part × EUROPE-supplier
    # lineitems instead of the whole fact table.
    li_f = li.join(
        F.broadcast(target_parts.select("p_partkey")),
        li.l_partkey == F.col("p_partkey"),
        "left_semi",
    ).join(
        F.broadcast(europe_supp.select("s_suppkey")),
        F.col("l_suppkey") == F.col("s_suppkey"),
        "left_semi",
    )
    eligible = (
        _partsupp(li_f)
        .join(F.broadcast(europe_supp), F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(target_parts), F.col("ps_partkey") == F.col("p_partkey"))
    )
    w = Window.partitionBy("ps_partkey")
    return (
        eligible.withColumn("_min_cost", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("_min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


Q2_ORACLE = f"""
WITH {PS_SQL}
SELECT s_acctbal, s_name, n_name, p_partkey, p_name
FROM part, partsupp, supplier, nation, region
WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
  AND p_size = 15 AND p_type = 'PROMO'
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
  AND ps_supplycost = (
    SELECT MIN(ps2.ps_supplycost)
    FROM partsupp ps2, supplier s2, nation n2, region r2
    WHERE part.p_partkey = ps2.ps_partkey AND s2.s_suppkey = ps2.ps_suppkey
      AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
      AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Q9 — product-type profit (6-way join, decimal profit expression)

def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    part = table(spark, sf_dir, "part")
    supplier = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    red_parts = part.filter(F.col("p_name").like("%red%")).select("p_partkey")
    # r14 second pass (guide §3.2, the q2 lever): the part filter
    # restricts the synthesized-partsupp GROUP KEYS, so a broadcast
    # LEFT SEMI pushed BELOW the aggregate is exactly equivalent — the
    # grouping exchange carries only red-part lineitems instead of the
    # whole table. Interleaved A/B at sf0.1: 1.426 → 0.859 s min
    # (−40%), digest-identical.
    ps = _partsupp(
        li.join(F.broadcast(red_parts), li.l_partkey == red_parts.p_partkey, "left_semi")
    )
    amount = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(12,2)") - _dec("l_discount")
    ) - F.col("ps_supplycost") * _dec("l_quantity")
    return (
        li.join(F.broadcast(red_parts), li.l_partkey == red_parts.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(ps, (li.l_partkey == ps.ps_partkey) & (li.l_suppkey == ps.ps_suppkey))
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


Q9_ORACLE = f"""
WITH {PS_SQL}
SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
FROM (
  SELECT n_name AS nation, CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
         CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
           - ps_supplycost * CAST(l_quantity AS DECIMAL(12,2)) AS amount
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


# ---------------------------------------------------------------------------
# Q11 — important stock (scalar-subquery HAVING over a national total)

def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    supplier = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    nat_supp = (
        supplier.join(
            F.broadcast(nation.filter(F.col("n_name") == "NATION_3")),
            supplier.s_nationkey == nation.n_nationkey,
        ).select("s_suppkey")
    )
    # value = cost × availqty in DECIMAL (availqty narrowed to (18,2) so
    # the product precision stays in-range on both engines)
    value = F.col("ps_supplycost") * F.col("ps_availqty").cast("decimal(18,2)")
    # r14 second pass (guide §3.2): the supplier filter restricts the
    # partsupp group keys — semi-filter BELOW the aggregate so the
    # grouping exchange carries only the nation's lineitems (the q9
    # lever; A/B 1.407 → see OPTIMIZATION_r14.md)
    per_part = (
        _partsupp(
            li.join(
                F.broadcast(nat_supp),
                li.l_suppkey == F.col("s_suppkey"),
                "left_semi",
            )
        )
        .join(F.broadcast(nat_supp), F.col("ps_suppkey") == F.col("s_suppkey"))
        .groupBy("ps_partkey")
        .agg(F.sum(value).alias("_val"))
    )
    total = per_part.agg(F.sum("_val").alias("_tot"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("_val").cast("double") > F.col("_tot").cast("double") * 0.001)
        .select("ps_partkey", F.col("_val").cast("double").alias("value"))
        .orderBy(F.col("value").desc(), "ps_partkey")
    )


Q11_ORACLE = f"""
WITH {PS_SQL},
scoped AS (
  SELECT ps_partkey, ps_supplycost * CAST(ps_availqty AS DECIMAL(18,2)) AS v
  FROM partsupp JOIN supplier ON ps_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
)
SELECT ps_partkey, CAST(SUM(v) AS DOUBLE) AS value
FROM scoped
GROUP BY ps_partkey
HAVING CAST(SUM(v) AS DOUBLE) > (SELECT CAST(SUM(v) AS DOUBLE) FROM scoped) * 0.001
ORDER BY value DESC, ps_partkey
"""


# ---------------------------------------------------------------------------
# Q12 — shipping-mode priority split (no l_shipmode/commit/receipt in the
# synthetic schema: mode → l_returnflag, late → shipped >60 days after
# order date; the CASE-pivot aggregation shape is unchanged)

def q12_shipping_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            late
            & (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
        )
        .groupBy(F.col("l_returnflag").alias("ship_mode"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("ship_mode")
    )


Q12_ORACLE = """
SELECT l_returnflag AS ship_mode,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
GROUP BY l_returnflag
ORDER BY ship_mode
"""


# ---------------------------------------------------------------------------
# Q16 — parts/supplier relationship (NOT IN exclusion + COUNT DISTINCT;
# "complaints" adapted to negative account balance)

def q16_parts_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    supplier = table(spark, sf_dir, "supplier")
    sel_parts = part.filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        _partsupp(li)
        .join(F.broadcast(sel_parts), F.col("ps_partkey") == F.col("p_partkey"))
        .join(F.broadcast(bad_supp), F.col("ps_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


Q16_ORACLE = f"""
WITH {PS_SQL}
SELECT p_brand, p_type, p_size, COUNT(DISTINCT ps_suppkey) AS supplier_cnt
FROM partsupp JOIN part ON p_partkey = ps_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------------
# Q20 — potential part promotion (nested IN subqueries + correlated
# availability threshold)

def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    supplier = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    red_parts = part.filter(F.col("p_name").like("red%")).select("p_partkey")
    shipped95 = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
        )
        .join(
            F.broadcast(red_parts),
            li.l_partkey == red_parts.p_partkey,
            "left_semi",
        )
        .groupBy(F.col("l_partkey").alias("_pk"), F.col("l_suppkey").alias("_sk"))
        .agg(F.sum(_dec("l_quantity")).alias("_qty95"))
    )
    # inner join drops pairs with no 1995 shipments — same as the oracle's
    # NULL-excluding correlated comparison
    # r14 second pass (guide §3.2): both aggregate inputs semi-filter
    # to red parts below their group-bys — the inner joins on
    # ps_partkey/_pk = p_partkey restrict the group keys identically
    qualifying = (
        _partsupp(
            li.join(
                F.broadcast(red_parts),
                li.l_partkey == red_parts.p_partkey,
                "left_semi",
            )
        )
        .join(F.broadcast(red_parts), F.col("ps_partkey") == F.col("p_partkey"))
        .join(shipped95, (F.col("ps_partkey") == F.col("_pk")) & (F.col("ps_suppkey") == F.col("_sk")))
        .filter(
            F.col("ps_availqty").cast("double") > 0.5 * F.col("_qty95").cast("double")
        )
        .select(F.col("ps_suppkey"))
    )
    nat = nation.filter(F.col("n_name") == "NATION_1")
    return (
        supplier.join(F.broadcast(nat), supplier.s_nationkey == nation.n_nationkey)
        .join(qualifying, supplier.s_suppkey == F.col("ps_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


Q20_ORACLE = f"""
WITH {PS_SQL}
SELECT s_name, s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_1'
  AND s_suppkey IN (
    SELECT ps_suppkey FROM partsupp
    WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      AND CAST(ps_availqty AS DOUBLE) > 0.5 * (
        SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
        FROM lineitem
        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
          AND l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate < TIMESTAMP '1996-01-01'))
ORDER BY s_name
"""


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (multi-correlated EXISTS +
# NOT-EXISTS on the same fact table — the last delegated-surface shape;
# "late" adapted to shipped >60 days after order date)

def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS/NOT EXISTS folded into ONE per-order profile aggregate
    (r14, guide §2.3 "aggregate before you shuffle"): for a late l1 row
    with supplier s, EXISTS(other supplier in the order) ⟺ the order
    has ≥ 2 distinct suppliers, and NOT EXISTS(other LATE supplier) ⟺
    the order's distinct-late-supplier set is exactly {s} — and since
    l1 itself is late, that set contains s, so the condition is
    count = 1. The pre-r14 shape planned the lineitem⋈orders leg THREE
    times and ran residual-inequality semi+anti joins whose big legs
    each shuffled the full fact table; now ONE narrow aggregate
    (orderkey, suppkey, late) profiles every order and broadcast-joins
    the (small) qualifying-order set onto the waiting-supplier rows —
    the fact table never shuffles."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    supplier = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    lo = (
        li.join(orders.filter(F.col("o_orderstatus") == "F"), li.l_orderkey == orders.o_orderkey)
        .select("l_orderkey", "l_suppkey", "l_shipdate", "o_orderdate")
    )
    nat_supp = (
        supplier.join(
            F.broadcast(nation.filter(F.col("n_name") == "NATION_1")),
            supplier.s_nationkey == nation.n_nationkey,
        ).select("s_suppkey", "s_name")
    )
    l1 = lo.filter(late).join(
        F.broadcast(nat_supp), F.col("l_suppkey") == F.col("s_suppkey")
    )
    # collect_set instead of two countDistincts: one exchange with NO
    # Expand doubling (an order has ≤ 7 lineitems, so the in-group sets
    # are bounded); NULLs (non-late rows) never enter the late set
    ord_prof = (
        lo.groupBy("l_orderkey")
        .agg(
            F.size(F.collect_set("l_suppkey")).alias("_ns"),
            F.size(
                F.collect_set(F.when(late, F.col("l_suppkey")))
            ).alias("_nls"),
        )
        .filter((F.col("_ns") >= 2) & (F.col("_nls") == 1))
        .select(F.col("l_orderkey").alias("_ok"))
    )
    waited = l1.join(ord_prof, F.col("l_orderkey") == F.col("_ok"), "left_semi")
    return (
        waited.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


Q21_ORACLE = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN nation ON s_nationkey = n_nationkey,
lineitem l1
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE s_suppkey = l1.l_suppkey
  AND o_orderstatus = 'F' AND n_name = 'NATION_1'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
"""


QUERIES = {
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q13_customer_distribution": q13_customer_distribution,
    "q18_large_volume": q18_large_volume,
    "q22_prospective_customers": q22_prospective_customers,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_quantity": q17_small_quantity,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q9_product_type_profit": q9_product_type_profit,
    "q11_important_stock": q11_important_stock,
    "q12_shipping_modes": q12_shipping_modes,
    "q16_parts_supplier": q16_parts_supplier,
    "q20_potential_promotion": q20_potential_promotion,
    "q21_suppliers_kept_waiting": q21_suppliers_kept_waiting,
}

ORACLES = {
    "q7_volume_shipping": Q7_ORACLE,
    "q8_market_share": Q8_ORACLE,
    "q13_customer_distribution": Q13_ORACLE,
    "q18_large_volume": Q18_ORACLE,
    "q22_prospective_customers": Q22_ORACLE,
    "q15_top_supplier": Q15_ORACLE,
    "q17_small_quantity": Q17_ORACLE,
    "q2_min_cost_supplier": Q2_ORACLE,
    "q9_product_type_profit": Q9_ORACLE,
    "q11_important_stock": Q11_ORACLE,
    "q12_shipping_modes": Q12_ORACLE,
    "q16_parts_supplier": Q16_ORACLE,
    "q20_potential_promotion": Q20_ORACLE,
    "q21_suppliers_kept_waiting": Q21_ORACLE,
}
