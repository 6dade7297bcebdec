"""The delegated query surface (SURVEY.md §2.B) as (spark, sf_dir) → DataFrame
callables, each paired with an ANSI-SQL oracle DuckDB runs on the same
parquet tables.

The reference delegates every relational operator to the PostgreSQL
executor (COPY (SELECT ...) TO, src/parquet_copy_hook/copy_to.rs:55-104);
here the same surface is the Spark DataFrame/SQL engine. Each query below
is one row of the §2.B inventory.

Determinism contract with the oracle: aggregate arithmetic over DOUBLE
columns is routed through DECIMAL casts (exact, order-independent) so
Spark's distributed partial aggregation and DuckDB's single-node fold
produce identical values; every computed column is aliased identically on
both sides (the driver compare sorts columns by name and hashes values).

Representation contract (round-2 hardening, VERDICT.md "What's wrong"):
final outputs never expose DECIMAL / HUGEINT / engine-width-divergent
types — the driver's pandas conversion coerces DuckDB decimals and
hugeints to float64 while Spark keeps Decimal objects, so equal values
hash unequal (all 8 r01 hash failures). Every decimal aggregate is cast
to DOUBLE (identical IEEE value from the identical exact decimal on both
engines) and DuckDB integer SUMs are cast back to BIGINT, in BOTH the
Spark projection and the oracle SQL.

Scale notes are inline per query: broadcast hints for dimension tables,
pushdown-friendly filters first, no collect-driven logic anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from pg_parquet_spark.session import table

# ---------------------------------------------------------------------------
# helpers

def _dec(col, prec=12, scale=2):
    return F.col(col).cast(f"decimal({prec},{scale})") if isinstance(col, str) else col.cast(
        f"decimal({prec},{scale})"
    )


# ---------------------------------------------------------------------------
# Q1 — pricing summary (filter → groupBy → multi-agg → sort)
# Spark plan: scan w/ pushed l_shipdate filter → partial LONG hash agg on
# (flag, status, scan partition) → tiny exchange → exact DECIMAL re-sum of
# the per-task partials → final projection.


def _cents(col: str):
    """Exact scaled-long (×100) of a 2-dp monetary double.

    ``round(x*100)`` equals ``cast(cast(x as decimal(12,2)) * 100 as
    long)`` for every value that carries at most 2 decimal digits
    (TPC-H monetary columns by spec; asserted row-by-row over every SF
    fixture in tests/test_operators.py::test_cents_cast_equivalence —
    a 2-dp decimal times 100 is an integer, so the half-way rounding
    modes can never disagree). Per-row work drops from a BigDecimal
    construction to one multiply+rint (r14, guide §2.3 "narrower
    types" / §1.2 per-task work)."""
    return F.expr(f"cast(round({col} * 100) as long)")


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r14 rewrite (guide §1.2 per-task work; output bit-identical,
    proven by full-result comparison at sf0.001/0.01/0.1 plus the
    unchanged DuckDB oracle hash): the per-row DECIMAL pipeline —
    4 double→decimal(12,2) casts, two decimal multiplies widening to
    (25,4)/(38,6), decimal sum buffers — dominated the scan task
    (count-only over the same filter measured 0.38 s vs 1.02 s for the
    full aggregate; every input file is one row group, so the scan
    side is a single task). Replaced by exact scaled-long arithmetic:
    cents products summed as LONGS per (group, scan partition), then
    the ≤ groups×tasks partial rows re-summed exactly as DECIMAL(38,0)
    and divided by the scale power — the same exact rational, hence
    the same IEEE double, as the all-decimal fold. Overflow headroom:
    charge_i ≤ ~1.13e11 (price ≤ 1.05e7 cents × 100 × 108), so a
    per-task long sum overflows only past ~8e7 lineitem rows in ONE
    scan task — an order of magnitude beyond a 1 GB split; ANSI mode
    would raise, not wrap, if a deployment ever got there. The final
    DECIMAL re-sum keeps the 38-digit range of the original plan
    across tasks, so total scale is unbounded."""
    li = table(spark, sf_dir, "lineitem")
    qty_l = _cents("l_quantity")
    price_l = _cents("l_extendedprice")
    disc_i = price_l * (F.lit(100).cast("long") - _cents("l_discount"))
    charge_i = disc_i * (F.lit(100).cast("long") + _cents("l_tax"))
    partials = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus", F.spark_partition_id().alias("_p"))
        .agg(
            F.sum(qty_l).alias("_q"),
            F.sum(price_l).alias("_b"),
            F.sum(disc_i).alias("_d"),
            F.sum(charge_i).alias("_c"),
            F.count(F.lit(1)).alias("_n"),
        )
    )
    totals = partials.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("_q").cast("decimal(38,0)")).alias("_q"),
        F.sum(F.col("_b").cast("decimal(38,0)")).alias("_b"),
        F.sum(F.col("_d").cast("decimal(38,0)")).alias("_d"),
        F.sum(F.col("_c").cast("decimal(38,0)")).alias("_c"),
        F.sum("_n").alias("_n"),
    )
    return totals.select(
        "l_returnflag",
        "l_linestatus",
        (F.col("_q") / 100).cast("double").alias("sum_qty"),
        (F.col("_b") / 100).cast("double").alias("sum_base_price"),
        (F.col("_d") / 10000).cast("double").alias("sum_disc_price"),
        (F.col("_c") / 1000000).cast("double").alias("sum_charge"),
        F.col("_n").cast("long").alias("count_order"),
    )


Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
           * (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# projection + filter (A4/A5/A6): pushdown-friendly — filter lands in
# PushedFilters, only 3 columns in ReadSchema.

def q_projection_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_quantity") > 45) & (F.col("l_discount") < 0.03))
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    )


Q_PROJECTION_FILTER_ORACLE = """
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem WHERE l_quantity > 45 AND l_discount < 0.03
ORDER BY l_orderkey, l_linenumber
"""


# ---------------------------------------------------------------------------
# joins — inner equi-join with broadcast dimension (customer ⋈ orders ⋈ nation)
# Scale: nation (25 rows) and customer (0.15% of lineitem) broadcast; the
# orders-side stays un-shuffled.

def q_join_inner_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total_revenue"),
        )
    )


Q_JOIN_INNER_ORACLE = """
SELECT n_name, COUNT(*) AS order_count,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_revenue
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
"""


# left join + null handling

def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r14 (guide §2.3 "aggregate before you shuffle"): orders
    pre-aggregate to (custkey, count) BEFORE the join, so the join and
    everything after it carry one row per customer instead of one row
    per order, and the post-join groupBy disappears. count(o_orderkey)
    over a left join yields 0 for orderless customers — reproduced by
    coalesce(_n, 0); output proven identical (full-result comparison +
    oracle hash). Interleaved A/B at sf0.1: 0.498 → 0.431 s min."""
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    cnt = orders.groupBy("o_custkey").agg(F.count("o_orderkey").alias("_n"))
    return customer.join(
        cnt, customer.c_custkey == cnt.o_custkey, "left"
    ).select(
        "c_custkey",
        "c_name",
        F.coalesce(F.col("_n"), F.lit(0).cast("long")).alias("order_count"),
    )


Q_JOIN_LEFT_ORACLE = """
SELECT c_custkey, c_name, COUNT(o_orderkey) AS order_count
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name ORDER BY c_custkey
"""


# semi join (EXISTS)

def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    big = orders.filter(F.col("o_totalprice") > 200000)
    return (
        customer.join(big, customer.c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


Q_JOIN_SEMI_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 200000)
ORDER BY c_custkey
"""


# anti join (NOT EXISTS)

def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    big = orders.filter(F.col("o_totalprice") > 300000)
    return (
        customer.join(big, customer.c_custkey == big.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


Q_JOIN_ANTI_ORACLE = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
ORDER BY c_custkey
"""


# full outer join — keys on both sides with non-overlap

def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    early = (
        orders.filter(F.col("o_orderdate") < F.lit("1995-01-01").cast("timestamp_ntz"))
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("early_orders"))
    )
    late = (
        orders.filter(F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("late_orders"))
    )
    return (
        early.withColumnRenamed("o_custkey", "custkey")
        .join(
            late.withColumnRenamed("o_custkey", "custkey_r"),
            F.col("custkey") == F.col("custkey_r"),
            "full",
        )
        .select(
            F.coalesce("custkey", "custkey_r").alias("custkey"),
            "early_orders",
            "late_orders",
        )
        .orderBy("custkey")
    )


Q_JOIN_FULL_ORACLE = """
WITH early AS (
  SELECT o_custkey AS custkey, COUNT(*) AS early_orders FROM orders
  WHERE o_orderdate < TIMESTAMP '1995-01-01' GROUP BY 1
), late AS (
  SELECT o_custkey AS custkey, COUNT(*) AS late_orders FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-01-01' GROUP BY 1
)
SELECT coalesce(early.custkey, late.custkey) AS custkey, early_orders, late_orders
FROM early FULL JOIN late ON early.custkey = late.custkey
ORDER BY custkey
"""


# cross join (small × small)

def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = table(spark, sf_dir, "region")
    nation = table(spark, sf_dir, "nation")
    return (
        region.crossJoin(nation)
        .select("r_name", "n_name")
        .orderBy("r_name", "n_name")
    )


Q_JOIN_CROSS_ORACLE = """
SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name
"""


# multi-join across the star (region→nation→customer→orders→lineitem):
# TPC-H Q5 shape. Scale: all dims broadcast, single shuffle for the agg.

def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r14: revenue folded as exact scaled-longs per (nation, scan
    partition) then DECIMAL re-summed — the q1_pricing_summary rewrite
    (see its docstring for the equivalence + overflow argument;
    rev_i ≤ 1.05e9, so a per-task long sum has ~8.7e9 rows of
    headroom). Join chain unchanged: dimensions broadcast, the fact
    side never shuffles."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    revenue_i = _cents("l_extendedprice") * (
        F.lit(100).cast("long") - _cents("l_discount")
    )
    partials = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name", F.spark_partition_id().alias("_p"))
        .agg(F.sum(revenue_i).alias("_r"))
    )
    return (
        partials.groupBy("n_name")
        .agg(F.sum(F.col("_r").cast("decimal(38,0)")).alias("_r"))
        .select("n_name", (F.col("_r") / 10000).cast("double").alias("revenue"))
    )


Q5_ORACLE = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# TPC-H Q3 shape — shipping priority (3-way join, filtered, top-10)

def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1996-06-30").cast("timestamp_ntz")
    revenue = _dec("l_extendedprice") * (F.lit(1).cast("decimal(12,2)") - _dec("l_discount"))
    return (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, customer.c_custkey == orders.o_custkey)
        .filter(F.col("o_orderdate") < cutoff)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate") > cutoff)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .withColumn("o_orderdate", F.col("o_orderdate").cast("date"))
    )


Q3_ORACLE = """
SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1996-06-30'
  AND l_shipdate > TIMESTAMP '1996-06-30'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# TPC-H Q6 shape — forecasting revenue change (pure scan+filter+agg:
# the pushdown showcase — all three predicates reach the parquet reader)

def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.06)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(_dec("l_extendedprice") * _dec("l_discount")).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


Q6_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
  AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24
"""


# TPC-H Q10 shape — returned items by customer

def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    nation = table(spark, sf_dir, "nation")
    revenue = _dec("l_extendedprice") * (F.lit(1).cast("decimal(12,2)") - _dec("l_discount"))
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .filter(F.col("l_returnflag") == "R")
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


Q10_ORACLE = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# TPC-H Q4 shape — order priority checking (semi-join + agg)

def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    late = li.filter(F.col("l_shipdate") > F.lit("1996-01-01").cast("timestamp_ntz"))
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
        )
        .join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > TIMESTAMP '1996-01-01')
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# TPC-H Q14 shape — promotion effect (conditional agg over a join)

def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    revenue = _dec("l_extendedprice") * (F.lit(1).cast("decimal(12,2)") - _dec("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type").startswith("PROMO"), revenue)).cast("double").alias(
                "promo_revenue"
            ),
            F.sum(revenue).cast("double").alias("total_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


Q14_ORACLE = """
SELECT CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
           THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) END) AS DOUBLE) AS promo_revenue,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS total_revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


# TPC-H Q19 shape — discounted revenue, OR-of-ANDs multi-predicate join

def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    revenue = _dec("l_extendedprice") * (F.lit(1).cast("decimal(12,2)") - _dec("l_discount"))
    cond = (
        (F.col("p_brand") == "Brand#1") & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 20) & (F.col("p_size") <= 10)
    ) | (
        (F.col("p_brand") == "Brand#2") & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 30) & (F.col("p_size") <= 20)
    ) | (
        (F.col("p_brand") == "Brand#3") & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 40) & (F.col("p_size") <= 30)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(F.sum(revenue).cast("double").alias("revenue"), F.count(F.lit(1)).alias("n_lines"))
    )


Q19_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 20 AND p_size <= 10)
   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 30 AND p_size <= 20)
   OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 40 AND p_size <= 30)
"""


# ---------------------------------------------------------------------------
# aggregation variants

def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("distinct_customers"),
            F.count(F.lit(1)).alias("order_count"),
        )
    )


Q_AGG_DISTINCT_ORACLE = """
SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS distinct_customers,
       COUNT(*) AS order_count
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over the PRE-AGGREGATED distinct-key base (r9): Spark's
    Expand runs BEFORE the partial aggregate, so a bare
    ``li.rollup(...)`` feeds 3× the fact-table rows into the shuffle —
    at 100 TB that's a 3× scan-side cost for information the 6-row
    (flag, status) base already contains. Aggregating first and rolling
    up the base is exact (DECIMAL re-sums) and identical to the
    oracle's true ROLLUP because the grouping keys are non-NULL in this
    schema (data NULLs would conflate with super-aggregate rows — the
    one precondition of the rewrite). Measured 0.97 → 0.62 s at sf0.1
    (the second tiny aggregate costs a job; the Expand-side win is the
    scan-volume one that matters at scale)."""
    li = table(spark, sf_dir, "lineitem")
    # r14: the base aggregate's per-row work is scaled-long (the
    # q1_pricing_summary rewrite — see its docstring); the exact
    # DECIMAL quantity re-materializes at (flag, status, task)
    # cardinality before the rollup, so the Expand input and the
    # rolled-up sums are value-identical to the all-decimal fold.
    base = (
        li.groupBy("l_returnflag", "l_linestatus", F.spark_partition_id().alias("_p"))
        .agg(F.sum(_cents("l_quantity")).alias("_sl"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg((F.sum(F.col("_sl").cast("decimal(38,0)")) / 100).alias("_s"))
    )
    return (
        base.rollup("l_returnflag", "l_linestatus")
        .agg(F.sum("_s").cast("double").alias("sum_qty"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


Q_AGG_ROLLUP_ORACLE = """
SELECT l_returnflag, l_linestatus, CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over the pre-aggregated distinct-key base (late r9, the
    q_agg_rollup rewrite): a bare ``orders.cube(...)`` Expands every
    fact row 4× BEFORE the partial aggregate; aggregating to the
    (status, priority) base first (≤15 rows) and cubing THAT is exact
    for re-summable counts and cuts the Expand to base-size. Same
    non-NULL-grouping-keys precondition as rollup (data NULLs would
    conflate with super-aggregate rows — this schema has none)."""
    orders = table(spark, sf_dir, "orders")
    base = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("_n")
    )
    return (
        base.cube("o_orderstatus", "o_orderpriority")
        .agg(F.sum("_n").alias("order_count"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


Q_AGG_CUBE_ORACLE = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS order_count
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


def q_agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER (WHERE ...) aggregates — PG Agg feature (§2.B)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.when(F.col("l_quantity") > 25, 1)).alias("big_qty_count"),
            F.count(F.when(F.col("l_discount") >= 0.05, 1)).alias("high_disc_count"),
        )
        .orderBy("l_returnflag")
    )


Q_AGG_FILTERED_ORACLE = """
SELECT l_returnflag,
       COUNT(*) FILTER (WHERE l_quantity > 25) AS big_qty_count,
       COUNT(*) FILTER (WHERE l_discount >= 0.05) AS high_disc_count
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# window functions

def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/row_number per partition — top-3 orders per customer."""
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .withColumn("rnk", F.rank().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn", "rnk")
    )


Q_WINDOW_RANK_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice, rn, rnk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
         RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders) t
WHERE rn <= 3 ORDER BY o_custkey, rn
"""


def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over per-user event sequences (events table)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            "event_id",
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
            F.lead("event_type").over(w).alias("next_type"),
        )
        .orderBy("user_id", "event_id")
    )


Q_WINDOW_LAG_LEAD_ORACLE = """
SELECT user_id, event_id, event_type,
       LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
       LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
FROM events ORDER BY user_id, event_id
"""


def q_window_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """running sum with ROWS BETWEEN frame."""
    orders = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.sum(_dec("o_totalprice")).over(w).cast("double").alias("running_total"),
        )
    )


Q_WINDOW_FRAME_ORACLE = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
FROM orders ORDER BY o_custkey, o_orderkey
"""


# ---------------------------------------------------------------------------
# sort / limit / top-k (TakeOrderedAndProject in the physical plan)

def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    )


Q_TOPK_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


# ---------------------------------------------------------------------------
# set operations

def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    hi = orders.filter(F.col("o_totalprice") > 250000).select("o_orderkey")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    return hi.unionAll(urgent)


Q_UNION_ALL_ORACLE = """
SELECT o_orderkey FROM orders WHERE o_totalprice > 250000
UNION ALL
SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
ORDER BY o_orderkey
"""


def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    hi = orders.filter(F.col("o_totalprice") > 150000).select("o_custkey")
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz")
    ).select("o_custkey")
    return hi.intersect(recent).orderBy("o_custkey")


Q_INTERSECT_ORACLE = """
SELECT o_custkey FROM orders WHERE o_totalprice > 150000
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
ORDER BY o_custkey
"""


def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    all_cust = orders.select(F.col("o_custkey").alias("custkey"))
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp_ntz")
    ).select(F.col("o_custkey").alias("custkey"))
    return all_cust.subtract(recent).orderBy("custkey")


Q_EXCEPT_ORACLE = """
SELECT o_custkey AS custkey FROM orders
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
ORDER BY custkey
"""


# ---------------------------------------------------------------------------
# scalar functions: string / date / math / json

def q_scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part")
    return (
        part.select(
            "p_partkey",
            F.upper(F.col("p_brand")).alias("brand_upper"),
            F.substring(F.col("p_name"), 1, 5).alias("name_prefix"),
            F.length(F.col("p_type")).alias("type_len"),
            F.concat_ws("|", F.col("p_brand"), F.col("p_type")).alias("brand_type"),
            F.regexp_replace(F.col("p_name"), "[aeiou]", "").alias("name_novowels"),
        )
        .orderBy("p_partkey")
    )


Q_SCALAR_STRING_ORACLE = """
SELECT p_partkey, UPPER(p_brand) AS brand_upper,
       SUBSTRING(p_name, 1, 5) AS name_prefix,
       LENGTH(p_type) AS type_len,
       CONCAT_WS('|', p_brand, p_type) AS brand_type,
       REGEXP_REPLACE(p_name, '[aeiou]', '', 'g') AS name_novowels
FROM part ORDER BY p_partkey
"""


def q_scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            F.dayofmonth("o_orderdate").alias("order_day"),
            F.date_trunc("month", F.col("o_orderdate"))
            .cast("date")
            .alias("month_start"),
        )
        .orderBy("o_orderkey")
    )


Q_SCALAR_DATE_ORACLE = """
SELECT o_orderkey,
       CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
       CAST(EXTRACT(month FROM o_orderdate) AS INT) AS order_month,
       CAST(EXTRACT(day FROM o_orderdate) AS INT) AS order_day,
       CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start
FROM orders ORDER BY o_orderkey
"""


def q_scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_orderkey") <= 100)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
            # ROUND on a DOUBLE is engine-divergent at exact halves:
            # 57867.5/100 binary-represents as 578.674999…, which Spark
            # rounds via the shortest decimal repr (578.675 → .68) and
            # DuckDB via the binary value (→ .67). Algebraic rewrite:
            # round(x/100, 2) ≡ round(x, 0)/100, and the rounding now
            # happens on an EXACT decimal (both engines HALF_UP away
            # from zero), with the final division an IEEE-exact
            # integer/100 on both. (DuckDB decimal÷int returns DOUBLE,
            # so rounding after a decimal division is NOT safe — caught
            # at sf0.001, r8.)
            (F.round(F.col("l_extendedprice").cast("decimal(18,4)"), 0)
             .cast("double") / 100)
            .alias("price_hundreds"),
            F.floor(F.col("l_quantity")).cast("long").alias("qty_floor"),
            F.ceil(F.col("l_discount") * 100).cast("long").alias("disc_pct_ceil"),
            F.pmod(F.col("l_orderkey"), F.lit(7)).alias("key_mod7"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


Q_SCALAR_MATH_ORACLE = """
SELECT l_orderkey, l_linenumber,
       ABS(l_quantity - 25) AS qty_dev,
       CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,4)), 0) AS DOUBLE) / 100
         AS price_hundreds,
       CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
       CAST(CEIL(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
       l_orderkey % 7 AS key_mod7
FROM lineitem WHERE l_orderkey <= 100
ORDER BY l_orderkey, l_linenumber
"""


def q_scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON access on events.props (reference maps json→string + access
    functions, SURVEY.md §1.2)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_id",
            F.get_json_object(F.col("props"), "$.k").cast("int").alias("k_value"),
        )
        .filter(F.col("k_value") > 90)
    )


Q_SCALAR_JSON_ORACLE = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k_value
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS INT) > 90
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# CASE / conditional + grouped agg over it

def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    bucket = (
        F.when(F.col("l_quantity") < 10, "low")
        .when(F.col("l_quantity") < 30, "mid")
        .otherwise("high")
    )
    return (
        li.groupBy(bucket.alias("qty_bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("qty_bucket")
    )


Q_CASE_WHEN_ORACLE = """
SELECT CASE WHEN l_quantity < 10 THEN 'low'
            WHEN l_quantity < 30 THEN 'mid'
            ELSE 'high' END AS qty_bucket,
       COUNT(*) AS cnt
FROM lineitem GROUP BY 1 ORDER BY qty_bucket
"""


# ---------------------------------------------------------------------------
# registry

QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q4_order_priority": q4_order_priority,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q10_returned_items": q10_returned_items,
    "q14_promo_effect": q14_promo_effect,
    "q19_discounted_revenue": q19_discounted_revenue,
    "q_projection_filter": q_projection_filter,
    "q_join_inner_broadcast": q_join_inner_broadcast,
    "q_join_left": q_join_left,
    "q_join_semi": q_join_semi,
    "q_join_anti": q_join_anti,
    "q_join_full": q_join_full,
    "q_join_cross": q_join_cross,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "q_agg_distinct": q_agg_distinct,
    "q_agg_rollup": q_agg_rollup,
    "q_agg_cube": q_agg_cube,
    "q_agg_filtered": q_agg_filtered,
    "q_window_rank": q_window_rank,
    "q_window_lag_lead": q_window_lag_lead,
    "q_window_frame": q_window_frame,
    "q_topk": q_topk,
    "q_union_all": q_union_all,
    "q_intersect": q_intersect,
    "q_except": q_except,
    "q_scalar_string": q_scalar_string,
    "q_scalar_date": q_scalar_date,
    "q_scalar_math": q_scalar_math,
    "q_scalar_json": q_scalar_json,
    "q_case_when": q_case_when,
}

ORACLES = {
    "q1_pricing_summary": Q1_ORACLE,
    "q3_shipping_priority": Q3_ORACLE,
    "q4_order_priority": Q4_ORACLE,
    "q6_forecast_revenue": Q6_ORACLE,
    "q10_returned_items": Q10_ORACLE,
    "q14_promo_effect": Q14_ORACLE,
    "q19_discounted_revenue": Q19_ORACLE,
    "q_projection_filter": Q_PROJECTION_FILTER_ORACLE,
    "q_join_inner_broadcast": Q_JOIN_INNER_ORACLE,
    "q_join_left": Q_JOIN_LEFT_ORACLE,
    "q_join_semi": Q_JOIN_SEMI_ORACLE,
    "q_join_anti": Q_JOIN_ANTI_ORACLE,
    "q_join_full": Q_JOIN_FULL_ORACLE,
    "q_join_cross": Q_JOIN_CROSS_ORACLE,
    "q5_local_supplier_volume": Q5_ORACLE,
    "q_agg_distinct": Q_AGG_DISTINCT_ORACLE,
    "q_agg_rollup": Q_AGG_ROLLUP_ORACLE,
    "q_agg_cube": Q_AGG_CUBE_ORACLE,
    "q_agg_filtered": Q_AGG_FILTERED_ORACLE,
    "q_window_rank": Q_WINDOW_RANK_ORACLE,
    "q_window_lag_lead": Q_WINDOW_LAG_LEAD_ORACLE,
    "q_window_frame": Q_WINDOW_FRAME_ORACLE,
    "q_topk": Q_TOPK_ORACLE,
    "q_union_all": Q_UNION_ALL_ORACLE,
    "q_intersect": Q_INTERSECT_ORACLE,
    "q_except": Q_EXCEPT_ORACLE,
    "q_scalar_string": Q_SCALAR_STRING_ORACLE,
    "q_scalar_date": Q_SCALAR_DATE_ORACLE,
    "q_scalar_math": Q_SCALAR_MATH_ORACLE,
    "q_scalar_json": Q_SCALAR_JSON_ORACLE,
    "q_case_when": Q_CASE_WHEN_ORACLE,
}
