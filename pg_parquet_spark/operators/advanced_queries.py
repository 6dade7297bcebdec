"""Remaining §2.B surface: SQL-entry queries (grouping sets, subqueries),
Python UDF tiers (pandas scalar + grouped-agg), composed custom operators
(as-of join, sessionization), richer windows/arrays/maps, and the
Structured Streaming queries.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from pg_parquet_spark.session import load_tables, table


# ---------------------------------------------------------------------------
# SQL entry point: GROUPING SETS (PG Agg feature delegated in §2.B)

def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS over the PRE-AGGREGATED distinct-key base (r9,
    the q_agg_rollup rewrite): Spark's Expand multiplies rows BEFORE
    the partial aggregate, so a bare 3-set grouping feeds 3× the fact
    table into the shuffle for information the 6-row (flag, status)
    base already holds. Exact because the re-sum is DECIMAL and the
    grouping keys are non-NULL in this schema (the rewrite's one
    precondition — data NULLs would conflate with super-aggregate
    rows); the oracle stays the true GROUPING SETS."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        WITH base AS (
          SELECT l_returnflag, l_linestatus,
                 SUM(CAST(l_quantity AS DECIMAL(12,2))) AS s
          FROM lineitem GROUP BY l_returnflag, l_linestatus
        )
        SELECT l_returnflag, l_linestatus, CAST(SUM(s) AS DOUBLE) AS sum_qty
        FROM base
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
        """
    )


Q_GROUPING_SETS_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


# scalar subquery + IN subquery (PG subselect delegation)

def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > 0.9 * (SELECT MAX(o_totalprice) FROM orders)
        ORDER BY o_orderkey
        """
    )


Q_SUBQUERY_SCALAR_ORACLE = """
SELECT o_orderkey, o_totalprice FROM orders
WHERE o_totalprice > 0.9 * (SELECT MAX(o_totalprice) FROM orders)
ORDER BY o_orderkey
"""


def q_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_orderkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS order_lineitem_total
        FROM lineitem
        WHERE l_orderkey IN (
          SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
        GROUP BY l_orderkey ORDER BY l_orderkey
        """
    )


Q_SUBQUERY_IN_ORACLE = """
SELECT l_orderkey,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS order_lineitem_total
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
GROUP BY l_orderkey ORDER BY l_orderkey
"""


def q_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
            AND o_totalprice > 100000)
        ORDER BY c_custkey
        """
    )


Q_EXISTS_CORRELATED_ORACLE = """
SELECT c_custkey, c_mktsegment FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderstatus = 'F' AND o_totalprice > 100000)
ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# UDF tiers (§2.B UDF/UDAF row): Arrow-vectorized pandas UDFs

def q_pandas_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF (Arrow batches) — per-row double
    arithmetic, deterministic. The 100 TB posture: vectorized Python only
    when built-ins can't express the logic; here it stands in for custom
    per-row model code."""

    @pandas_udf("double")
    def discounted(price: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1.0 - disc)

    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_orderkey") <= 200)
        .select(
            "l_orderkey",
            "l_linenumber",
            discounted(F.col("l_extendedprice"), F.col("l_discount")).alias(
                "discounted_price"
            ),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


Q_PANDAS_UDF_SCALAR_ORACLE = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1.0 - l_discount) AS discounted_price
FROM lineitem WHERE l_orderkey <= 200
ORDER BY l_orderkey, l_linenumber
"""


def q_pandas_udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF — order-independent reduction (max)
    so the result is deterministic under any partitioning."""

    @pandas_udf("double")
    def max_price(v: pd.Series) -> float:
        return float(v.max())

    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(max_price(F.col("o_totalprice")).alias("max_totalprice"))
        .orderBy("o_orderpriority")
    )


Q_PANDAS_UDF_GROUPED_ORACLE = """
SELECT o_orderpriority, MAX(o_totalprice) AS max_totalprice
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function) — the §2.B UDTF row; the reference
    itself ships 6 UDTFs via #[pg_extern] (A16-A21). Emits the first 5
    tokens of each document as rows via a LATERAL join."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="token string, pos int")
    class TopTokens:
        def eval(self, text: str):
            for i, tok in enumerate(text.split(" ")[:5]):
                yield tok, i

    spark.udtf.register("top_tokens", TopTokens)
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT d.doc_id, t.token, t.pos
        FROM documents d, LATERAL top_tokens(d.text) t
        ORDER BY d.doc_id, t.pos
        """
    )


Q_PYTHON_UDTF_ORACLE = """
SELECT doc_id, unnest(string_split(text, ' ')[1:5]) AS token,
       CAST(generate_subscripts(string_split(text, ' ')[1:5], 1) - 1 AS INT) AS pos
FROM documents ORDER BY doc_id, pos
"""


# ---------------------------------------------------------------------------
# composed custom operators

def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (reference lacks it; composed from a conditional
    projection + running last_value — no range-join explosion, one
    shuffle on user_id): for each purchase event, the most recent
    prior-or-same-ts click's event_id and value.

    r14 (guide §1.1 first-principles: one unavoidable pass): the
    click/purchase split used to be a UNION of two filtered scans of
    the same table — two full reads of events for one logical pass.
    Clicks and purchases are disjoint rows, so ONE scan with
    when()-projected side columns builds the identical merged frame
    (full-result comparison + oracle hash both green); at 100 TB this
    halves the operator's input I/O."""
    ev = table(spark, sf_dir, "events")
    merged = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        "ts",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("_side"),
        F.when(F.col("event_type") == "click", F.col("event_id"))
        .cast("long")
        .alias("click_id"),
        F.when(F.col("event_type") == "click", F.col("value"))
        .cast("double")
        .alias("click_value"),
        F.when(F.col("event_type") == "purchase", F.col("event_id"))
        .cast("long")
        .alias("purchase_id"),
    )
    # clicks sort before purchases at equal ts (_side 0 < 1) → "≤ ts" semantics
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "_side", F.coalesce("click_id", "purchase_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        "user_id",
        "ts",
        "purchase_id",
        F.last("click_id", ignorenulls=True).over(w).alias("last_click_id"),
        F.last("click_value", ignorenulls=True).over(w).alias("last_click_value"),
    )
    return (
        carried.filter(F.col("purchase_id").isNotNull())
        .select(
            "user_id",
            F.col("purchase_id"),
            "last_click_id",
            "last_click_value",
        )
    )


Q_ASOF_JOIN_ORACLE = """
WITH clicks AS (
  SELECT user_id, ts, event_id AS click_id, value AS click_value, 0 AS _side,
         NULL::BIGINT AS purchase_id
  FROM events WHERE event_type = 'click'
), purchases AS (
  SELECT user_id, ts, NULL::BIGINT AS click_id, NULL::DOUBLE AS click_value,
         1 AS _side, event_id AS purchase_id
  FROM events WHERE event_type = 'purchase'
), merged AS (
  SELECT * FROM clicks UNION ALL SELECT * FROM purchases
), carried AS (
  SELECT user_id, ts, purchase_id,
    last_value(click_id IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts, _side, coalesce(click_id, purchase_id)
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_id,
    last_value(click_value IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts, _side, coalesce(click_id, purchase_id)
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_value
  FROM merged
)
SELECT user_id, purchase_id, last_click_id, last_click_value
FROM carried WHERE purchase_id IS NOT NULL
ORDER BY user_id, purchase_id
"""


def q_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min gap) as a batch composition:
    lag → new-session flag → running sum = session id. One shuffle on
    user_id; state-free."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.col("value"),
        F.when(
            (F.unix_micros(F.col("ts").cast("timestamp"))
             - F.unix_micros(F.lag("ts").over(w).cast("timestamp")))
            > 30 * 60 * 1_000_000,
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(w2))
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("session_value"),
        )
    )


Q_SESSIONIZE_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
    CASE WHEN epoch_us(ts) - epoch_us(
      LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
    THEN 1 ELSE 0 END AS new_session
  FROM events
), sess AS (
  SELECT user_id, ts, event_id, value,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events,
       CAST(MIN(ts) AS TIMESTAMP) AS session_start,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS session_value
FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id
"""


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel signup → click → purchase over the
    events stream (custom sequence operator, operators/funnel.py)."""
    from pg_parquet_spark.operators.funnel import funnel_counts

    ev = table(spark, sf_dir, "events")
    return funnel_counts(ev, ["signup", "click", "purchase"])


Q_FUNNEL_ORACLE = """
WITH s0 AS (
  SELECT user_id, MIN(CASE WHEN event_type = 'signup' THEN ts END) AS s0_ts
  FROM events GROUP BY user_id
), s1 AS (
  SELECT e.user_id, MIN(CASE WHEN e.event_type = 'click' AND e.ts > s0.s0_ts THEN e.ts END) AS s1_ts
  FROM events e JOIN s0 ON e.user_id = s0.user_id GROUP BY e.user_id
), s2 AS (
  SELECT e.user_id, MIN(CASE WHEN e.event_type = 'purchase' AND e.ts > s1.s1_ts THEN e.ts END) AS s2_ts
  FROM events e JOIN s1 ON e.user_id = s1.user_id GROUP BY e.user_id
), t AS (
  SELECT s0.user_id, s0_ts, s1_ts, s2_ts
  FROM s0 LEFT JOIN s1 ON s0.user_id = s1.user_id
          LEFT JOIN s2 ON s0.user_id = s2.user_id
)
SELECT 0 AS stage_idx, 'signup' AS stage, COUNT(s0_ts) AS users FROM t
UNION ALL
SELECT 1, 'click', COUNT(s1_ts) FROM t
UNION ALL
SELECT 2, 'purchase', COUNT(s2_ts) FROM t
ORDER BY stage_idx
"""


# ---------------------------------------------------------------------------
# richer windows + array/map scalar functions

def q_window_ntile_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice"), F.col("o_orderkey")
    )
    return (
        orders.select(
            "o_orderkey",
            "o_orderpriority",
            F.ntile(4).over(w).alias("quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
        )
        .orderBy("o_orderkey")
    )


Q_WINDOW_NTILE_ORACLE = """
SELECT o_orderkey, o_orderpriority,
       NTILE(4) OVER w AS quartile,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
ORDER BY o_orderkey
"""


def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE BETWEEN frame over a numeric ordering."""
    orders = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy(F.col("o_orderkey"))
        .rangeBetween(-100, 0)
    )
    return (
        orders.select(
            "o_orderkey",
            "o_orderstatus",
            F.count(F.lit(1)).over(w).alias("nearby_orders"),
        )
        .orderBy("o_orderkey")
    )


Q_WINDOW_RANGE_ORACLE = """
SELECT o_orderkey, o_orderstatus,
       COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey
         RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS nearby_orders
FROM orders ORDER BY o_orderkey
"""


def q_scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return (
        emb.select(
            "vec_id",
            F.size("embedding").alias("dims"),
            F.array_max("embedding").cast("double").alias("max_component"),
            F.array_min("embedding").cast("double").alias("min_component"),
            F.element_at("embedding", 1).cast("double").alias("first_component"),
            # arrays-of-float render engine-specifically when collected —
            # canonicalize the slice as scaled integers (round() is
            # half-away-from-zero in both engines; decimal casts are NOT —
            # Spark HALF_UP vs DuckDB HALF_EVEN diverge in the last digit)
            F.concat_ws(
                ",",
                F.transform(
                    F.slice("embedding", 1, 3),
                    lambda x: F.round(x.cast("double") * 1e7).cast("long").cast("string"),
                ),
            ).alias("head3"),
        )
        .orderBy("vec_id")
    )


Q_SCALAR_ARRAY_ORACLE = """
SELECT vec_id,
       CAST(len(embedding) AS INT) AS dims,
       CAST(list_max(embedding) AS DOUBLE) AS max_component,
       CAST(list_min(embedding) AS DOUBLE) AS min_component,
       CAST(embedding[1] AS DOUBLE) AS first_component,
       array_to_string(list_transform(embedding[1:3],
         x -> CAST(CAST(round(CAST(x AS DOUBLE) * 10000000) AS BIGINT) AS VARCHAR)), ',') AS head3
FROM embeddings ORDER BY vec_id
"""


def q_scalar_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column construction + access (§2.B map_* functions;
    the reference's crunchy_map → MapType, SURVEY.md A30)."""
    ev = table(spark, sf_dir, "events")
    kmap = F.from_json(F.col("props"), "map<string,int>")
    # the raw map stays internal (engines render MAP differently when
    # collected); outputs are map-function results
    return (
        ev.filter(F.col("event_id") < 100)
        .select(
            "event_id",
            F.concat_ws(",", F.map_keys(kmap)).alias("prop_keys"),
            F.size(F.map_values(kmap)).alias("n_props"),
            F.element_at(kmap, "k").alias("k_value"),
            F.element_at(F.map_concat(kmap, F.create_map(F.lit("extra"), F.lit(1))), "extra").alias("extra_value"),
        )
        .orderBy("event_id")
    )


Q_SCALAR_MAP_ORACLE = """
SELECT event_id,
       'k' AS prop_keys,
       1 AS n_props,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_value,
       1 AS extra_value
FROM events WHERE event_id < 100 ORDER BY event_id
"""


def q_scalar_collections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection scalar functions — arrays AND maps in one gate (r9:
    merged from q_scalar_array + q_scalar_map under the registry
    retirement policy; both originals stay oracle-checked locally).
    Array side runs over the real embedding column (size/max/min/
    element_at/slice/transform); map side over the events props JSON
    (crunchy_map → MapType, SURVEY.md A30: from_json/map_keys/
    map_values/element_at/map_concat). One broadcast-ready equi join
    ties the two tables; floats canonicalize as scaled integers
    (round() is half-away-from-zero in both engines; decimal casts are
    not)."""
    emb = table(spark, sf_dir, "embeddings")
    ev = table(spark, sf_dir, "events").filter(F.col("event_id") < 100)
    kmap = F.from_json(F.col("props"), "map<string,int>")
    return (
        ev.join(emb, ev.event_id == emb.vec_id)
        .select(
            "event_id",
            F.size("embedding").alias("dims"),
            F.array_max("embedding").cast("double").alias("max_component"),
            F.array_min("embedding").cast("double").alias("min_component"),
            F.element_at("embedding", 1).cast("double").alias("first_component"),
            F.concat_ws(
                ",",
                F.transform(
                    F.slice("embedding", 1, 3),
                    lambda x: F.round(x.cast("double") * 1e7)
                    .cast("long")
                    .cast("string"),
                ),
            ).alias("head3"),
            F.concat_ws(",", F.map_keys(kmap)).alias("prop_keys"),
            F.size(F.map_values(kmap)).alias("n_props"),
            F.element_at(kmap, "k").alias("k_value"),
            F.element_at(
                F.map_concat(
                    kmap, F.create_map(F.lit("extra"), F.size("embedding"))
                ),
                "extra",
            ).alias("extra_value"),
        )
        .orderBy("event_id")
    )


Q_SCALAR_COLLECTIONS_ORACLE = """
SELECT e.event_id,
       CAST(len(m.embedding) AS INT) AS dims,
       CAST(list_max(m.embedding) AS DOUBLE) AS max_component,
       CAST(list_min(m.embedding) AS DOUBLE) AS min_component,
       CAST(m.embedding[1] AS DOUBLE) AS first_component,
       array_to_string(list_transform(m.embedding[1:3],
         x -> CAST(CAST(round(CAST(x AS DOUBLE) * 10000000) AS BIGINT) AS VARCHAR)), ',') AS head3,
       'k' AS prop_keys,
       1 AS n_props,
       CAST(json_extract_string(e.props, '$.k') AS INT) AS k_value,
       CAST(len(m.embedding) AS INT) AS extra_value
FROM events e JOIN embeddings m ON e.event_id = m.vec_id
WHERE e.event_id < 100 ORDER BY e.event_id
"""


def q_agg_percentile_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-set aggregates: continuous percentiles (PG
    percentile_cont) + deterministic array aggregation (sorted
    collect_set ≡ list_sort(list DISTINCT))."""
    li = table(spark, sf_dir, "lineitem")
    src = li.select(
        "l_returnflag", "l_quantity", "l_extendedprice", "l_linestatus",
        "l_orderkey",
    )
    # r14 (the q_feature_winsorize lever): the percentile buffers build
    # in the scan's few tasks otherwise (single-row-group local files =
    # one task); hash-spread the partial aggregation — the percentile
    # merge is a counts-map fold and the interpolation deterministic,
    # so the result is partition-invariant (A/B: 1.61 → 1.42 s min)
    par = spark.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < par:
        src = src.repartition(par, "l_orderkey")
    return (
        src.groupBy("l_returnflag")
        .agg(
            F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity)").alias(
                "median_qty"
            ),
            F.expr("percentile_cont(0.9) WITHIN GROUP (ORDER BY l_extendedprice)").alias(
                "p90_price"
            ),
            F.concat_ws(",", F.sort_array(F.collect_set("l_linestatus"))).alias("statuses"),
        )
        .orderBy("l_returnflag")
    )


Q_AGG_PERCENTILE_ORACLE = """
SELECT l_returnflag,
       percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity) AS median_qty,
       percentile_cont(0.9) WITHIN GROUP (ORDER BY l_extendedprice) AS p90_price,
       array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q_scalar_string_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wider string-function sweep (trim/pad/replace/left/right/reverse/
    repeat/split_part — identical semantics in DuckDB)."""
    part = table(spark, sf_dir, "part")
    return (
        part.select(
            "p_partkey",
            F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias("trimmed"),
            F.lpad(F.col("p_brand"), 12, "*").alias("padded"),
            F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("replaced"),
            F.substring(F.col("p_name"), 1, 3).alias("left3"),
            F.reverse(F.col("p_brand")).alias("reversed"),
            F.repeat(F.lit("ab"), 3).alias("repeated"),
            F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("first_word"),
        )
        .orderBy("p_partkey")
    )


Q_SCALAR_STRING_EXTRA_ORACLE = """
SELECT p_partkey,
       trim('  ' || p_brand || '  ') AS trimmed,
       lpad(p_brand, 12, '*') AS padded,
       replace(p_type, ' ', '_') AS replaced,
       substring(p_name, 1, 3) AS left3,
       reverse(p_brand) AS reversed,
       repeat('ab', 3) AS repeated,
       split_part(p_type, ' ', 1) AS first_word
FROM part ORDER BY p_partkey
"""


def q_scalar_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic sweep: datediff / date_add / weekday mapping."""
    orders = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return (
        orders.select(
            "o_orderkey",
            F.date_add(d, 30).alias("due_date"),
            F.datediff(F.lit("1998-12-31").cast("date"), d).alias("days_to_eoy"),
            F.dayofweek(d).alias("dow_sunday1"),
            F.quarter(d).alias("qtr"),
        )
        .orderBy("o_orderkey")
    )


Q_SCALAR_DATE_ARITH_ORACLE = """
SELECT o_orderkey,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS due_date,
       datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS days_to_eoy,
       CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS INT) AS dow_sunday1,
       CAST(quarter(CAST(o_orderdate AS DATE)) AS INT) AS qtr
FROM orders ORDER BY o_orderkey
"""


def q_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.max_by("o_orderkey", "o_totalprice").alias("priciest_order"),
            F.min_by("o_orderkey", "o_totalprice").alias("cheapest_order"),
        )
        .orderBy("o_orderpriority")
    )


Q_MIN_MAX_BY_ORACLE = """
SELECT o_orderpriority,
       arg_max(o_orderkey, o_totalprice) AS priciest_order,
       arg_min(o_orderkey, o_totalprice) AS cheapest_order
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# streaming queries

def q_stream_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window agg, drained with AvailableNow —
    equals the batch tumbling-window on a finite source."""
    from pg_parquet_spark.streaming.stream import (
        read_events_stream,
        run_available_now,
        windowed_event_counts,
    )

    events = read_events_stream(spark, sf_dir)
    result = run_available_now(windowed_event_counts(events))
    return result.withColumn(
        "total_value", F.col("total_value").cast("double")
    ).orderBy("window_start", "event_type")


Q_STREAM_WINDOW_ORACLE = """
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start, event_type,
       COUNT(*) AS event_count,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2 ORDER BY window_start, event_type
"""


def q_stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour windows every 30 minutes: each event contributes
    to exactly 2 overlapping windows. Oracle replicates the overlap by
    fanning every event out to its window/slide bucket starts."""
    from pg_parquet_spark.streaming.stream import (
        read_events_stream,
        run_available_now,
        sliding_event_counts,
    )

    events = read_events_stream(spark, sf_dir)
    result = run_available_now(sliding_event_counts(events))
    return result.withColumn(
        "total_value", F.col("total_value").cast("double")
    ).orderBy("window_start", "event_type")


Q_STREAM_SLIDING_ORACLE = """
WITH ex AS (
  SELECT event_type, value,
         time_bucket(INTERVAL '30 minutes', ts) AS b, unnest([0, 1]) AS k
  FROM events
)
SELECT CAST(b - (k * INTERVAL '30 minutes') AS TIMESTAMP) AS window_start,
       event_type, COUNT(*) AS event_count,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM ex GROUP BY 1, 2 ORDER BY window_start, event_type
"""


def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window stateful op, drained with AvailableNow.
    Oracle-checked (r2 — previously rows-only): gap-sessionization IS
    SQL-expressible via lag → new-session flag → running sum, and
    session_window's bounds are exactly [min ts, max ts + gap)."""
    from pg_parquet_spark.streaming.stream import (
        read_events_stream,
        run_available_now,
        sessionized_events,
    )

    events = read_events_stream(spark, sf_dir)
    result = run_available_now(sessionized_events(events))
    return result.withColumn(
        "session_value", F.col("session_value").cast("double")
    ).orderBy("user_id", "session_start")


Q_STREAM_SESSION_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, value,
    CASE WHEN epoch_us(ts) - epoch_us(
      LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
    THEN 1 ELSE 0 END AS new_session
  FROM events
), sess AS (
  SELECT user_id, ts, value,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id,
       CAST(MIN(ts) AS TIMESTAMP) AS session_start,
       CAST(CAST(MAX(ts) AS TIMESTAMP) + INTERVAL 30 MINUTE AS TIMESTAMP) AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS session_value
FROM sess GROUP BY user_id, session_id
ORDER BY user_id, session_start
"""


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup (stateful dropDuplicates keyed on
    (user_id, event_type)) feeding a per-type aggregate — equals
    COUNT(DISTINCT user_id) per event_type on a finite drain. The
    watermark-bounded production variant is documented on the operator
    (streaming/stream.py deduped_user_event_counts)."""
    from pg_parquet_spark.streaming.stream import (
        deduped_user_event_counts,
        read_events_stream,
        run_available_now,
    )

    events = read_events_stream(spark, sf_dir)
    result = run_available_now(deduped_user_event_counts(events))
    return result.orderBy("event_type")


Q_STREAM_DEDUP_ORACLE = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_stream_dedup_within_wm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-state streaming dedup (dropDuplicatesWithinWatermark):
    the watermark-evicted production variant of q_stream_dedup. The
    45-day horizon exceeds the fixture's 30-day event span, so no
    eviction fires and the drain equals exact global dedup — the
    eviction path is separately pinned by the 3-micro-batch test in
    tests/test_scale_ops.py."""
    from pg_parquet_spark.streaming.stream import (
        deduped_user_event_counts_within_watermark,
        read_events_stream,
        run_available_now,
    )

    events = read_events_stream(spark, sf_dir)
    result = run_available_now(
        deduped_user_event_counts_within_watermark(events)
    )
    return result.orderBy("event_type")


Q_STREAM_DEDUP_WM_ORACLE = Q_STREAM_DEDUP_ORACLE


def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join (Spark-native enrichment, beyond-reference):
    the event stream joins the static customer dimension per micro-batch
    and aggregates per market segment — equals the batch join+agg on a
    finite drain (every events.user_id has a customer row)."""
    from pg_parquet_spark.session import table
    from pg_parquet_spark.streaming.stream import (
        enriched_segment_totals,
        read_events_stream,
        run_available_now,
    )

    events = read_events_stream(spark, sf_dir)
    customer = table(spark, sf_dir, "customer")
    result = run_available_now(enriched_segment_totals(events, customer))
    return result.withColumn(
        "total_value", F.col("total_value").cast("double")
    ).orderBy("c_mktsegment")


Q_STREAM_JOIN_ORACLE = """
SELECT c_mktsegment, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM events JOIN customer ON events.user_id = customer.c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (click→purchase attribution within
    1 hour): two independent event streams, watermarked on both sides
    with an event-time range bound so both state stores are
    watermark-bounded — the shape that keeps stream-stream joins viable
    at 100 TB. Inner matches emit in append mode; a finite AvailableNow
    drain therefore yields exactly the batch interval join."""
    from pg_parquet_spark.streaming.stream import (
        click_purchase_pairs,
        read_events_stream,
        run_available_now,
    )

    clicks = read_events_stream(spark, sf_dir)
    purchases = read_events_stream(spark, sf_dir)
    result = run_available_now(
        click_purchase_pairs(clicks, purchases), output_mode="append"
    )
    return result.orderBy("click_id", "purchase_id")


Q_STREAM_STREAM_JOIN_ORACLE = """
SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS micros_to_purchase
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
ORDER BY click_id, purchase_id
"""


def q_profile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width histogram (20 buckets over the observed [min, max])
    of order totals — the profiling primitive behind data-drift checks.
    The bucket index is pure integer/float floor arithmetic (DuckDB has
    no width_bucket), and the (min, max) row is a broadcast cross join,
    so the fact scan aggregates in one pass after a 1-row side job."""
    orders = table(spark, sf_dir, "orders")
    n_buckets = 20
    bounds = orders.agg(
        F.min("o_totalprice").alias("_mn"), F.max("o_totalprice").alias("_mx")
    )
    bucket = F.least(
        F.greatest(
            F.floor(
                (F.col("o_totalprice") - F.col("_mn"))
                * n_buckets
                / (F.col("_mx") - F.col("_mn"))
            ),
            F.lit(0),
        ),
        F.lit(n_buckets - 1),
    ).cast("int")
    return (
        orders.crossJoin(F.broadcast(bounds))
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("bucket")
    )


Q_PROFILE_HISTOGRAM_ORACLE = """
WITH b AS (
  SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx FROM orders
)
SELECT CAST(LEAST(GREATEST(
         FLOOR((o_totalprice - mn) * 20 / (mx - mn)), 0), 19) AS INT) AS bucket,
       COUNT(*) AS cnt
FROM orders CROSS JOIN b GROUP BY 1 ORDER BY bucket
"""


def q_profile_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of quantity vs extended price, computed from
    EXACT decimal power sums (n, Σx, Σy, Σxy, Σx², Σy²) rather than the
    built-in corr() — float accumulation order varies with partitioning
    and would hash differently per engine; decimal sums are associative
    so the one-pass distributed aggregate is bit-reproducible, and the
    final closed form is a handful of IEEE ops on exact inputs."""
    li = table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(12,2)")
    y = F.col("l_extendedprice").cast("decimal(12,2)")
    sums = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    corr = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return sums.select(
        F.col("n"), F.round(corr, 6).alias("corr_qty_price")
    )


Q_PROFILE_CORR_ORACLE = """
WITH s AS (
  SELECT COUNT(*) AS n,
    SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sx,
    SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS sy,
    SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS sxy,
    SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS sxx,
    SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS syy
  FROM lineitem
)
SELECT n,
  ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
    / (SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       * SQRT(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
  AS corr_qty_price
FROM s
"""


def q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation (the hot-key mitigation AQE can't
    apply to aggregations): partial per (key, salt) then final per key.
    Semantically transparent — the oracle is the PLAIN group-by, which
    is exactly the point: same answer, skew-proof shuffle."""
    from pg_parquet_spark.operators.skew import salted_aggregate

    li = table(spark, sf_dir, "lineitem").withColumn(
        "_qty_dec", F.col("l_quantity").cast("decimal(12,2)")
    )
    out = salted_aggregate(
        li,
        ["l_returnflag"],
        {
            "cnt": ("l_quantity", "count"),
            "sum_qty": ("_qty_dec", "sum"),
            "max_qty": ("l_quantity", "max"),
        },
        salt_buckets=16,
    )
    return out.select(
        "l_returnflag",
        "cnt",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        "max_qty",
    ).orderBy("l_returnflag")


Q_SKEW_SALTED_AGG_ORACLE = """
SELECT l_returnflag, COUNT(l_quantity) AS cnt,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       MAX(l_quantity) AS max_qty
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted replicated join (broadcast-ineligible skewed key path):
    big side salted uniformly, small side replicated per bucket, join
    on (key, salt). Oracle is the plain join — identical answer, the
    hot key's probe rows spread over 16 partitions instead of one
    straggler."""
    from pg_parquet_spark.operators.skew import salted_join

    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    joined = salted_join(li, supp, on="l_suppkey", salt_buckets=16)
    return (
        joined.groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .orderBy("s_nationkey")
    )


Q_SKEW_SALTED_JOIN_ORACLE = """
SELECT s_nationkey, COUNT(*) AS cnt,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM lineitem JOIN supplier ON lineitem.l_suppkey = supplier.s_suppkey
GROUP BY s_nationkey ORDER BY s_nationkey
"""


def q_feature_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization (clip a numeric feature to its exact [p1, p99]) —
    the outlier-robust normalization step of feature pipelines. Uses
    EXACT interpolated percentiles (Spark `percentile` ≡ DuckDB
    `quantile_cont`, verified bit-identical), broadcast as a 1-row
    bound table; clipped sums ride decimal casts. At 100 TB swap the
    exact percentile for percentile_approx — same plan shape, the
    bound row stays a broadcast."""
    li = table(spark, sf_dir, "lineitem")
    x = F.col("l_extendedprice")
    # r14 (guide §1.2 per-task work): ONE array-percentile buffer for
    # both bounds (two scalar percentile() calls each built their own
    # 600k-entry value→count map), and spread the partial aggregation
    # when the scan is narrower than the cluster (single-file local
    # scans ran the whole buffer build in one task — the write_zordered
    # convention; exact percentile merge is count-sum + sort, so the
    # result is partition-invariant). A/B: 6.5 → 3.3 s min; bounds
    # bit-identical.
    xs = li.select("l_extendedprice")
    par = spark.sparkContext.defaultParallelism
    if xs.rdd.getNumPartitions() < par:
        # hash on the value, not round-robin (r14): keyless
        # repartition(n) pays a local input sort per SPARK-23207; the
        # percentile merge is partition-invariant, so any spread works
        # (A/B: 2.40 → 1.97 s min)
        xs = xs.repartition(par, "l_extendedprice")
    bounds = xs.agg(
        F.expr("percentile(l_extendedprice, array(0.01, 0.99))").alias("_pp")
    ).select(
        F.col("_pp")[0].alias("p01"), F.col("_pp")[1].alias("p99")
    )
    clipped = F.least(F.greatest(x, F.col("p01")), F.col("p99"))
    return (
        li.crossJoin(F.broadcast(bounds))
        .select("l_returnflag", clipped.alias("xc"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("xc").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_clipped"),
            F.min("xc").alias("min_clipped"),
            F.max("xc").alias("max_clipped"),
        )
        .orderBy("l_returnflag")
    )


Q_FEATURE_WINSORIZE_ORACLE = """
WITH b AS (
  SELECT quantile_cont(l_extendedprice, 0.01) AS p01,
         quantile_cont(l_extendedprice, 0.99) AS p99
  FROM lineitem
)
SELECT l_returnflag, COUNT(*) AS cnt,
  CAST(SUM(CAST(LEAST(GREATEST(l_extendedprice, p01), p99) AS DECIMAL(18,4))) AS DOUBLE) AS sum_clipped,
  MIN(LEAST(GREATEST(l_extendedprice, p01), p99)) AS min_clipped,
  MAX(LEAST(GREATEST(l_extendedprice, p01), p99)) AS max_clipped
FROM lineitem CROSS JOIN b
GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q_stream_sink_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming → hive-partitioned parquet sink (foreachBatch append
    under event_type=… directories) then a partition-pruned read-back
    aggregate — the landing-zone shape of a streaming ingestion
    pipeline. Equals the batch aggregate on a finite drain."""
    import shutil
    import tempfile

    from pg_parquet_spark.streaming.stream import (
        drain_to_partitioned_parquet,
        read_events_stream,
    )

    path = os.path.join(tempfile.gettempdir(), "pgpq_stream_landing")
    shutil.rmtree(path, ignore_errors=True)
    events = read_events_stream(spark, sf_dir).select(
        "event_id", "event_type", "value"
    )
    drain_to_partitioned_parquet(events, path, ["event_type"])
    back = spark.read.parquet(path)
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("double")
            .alias("total_value"),
            F.max("event_id").alias("max_event_id"),
        )
        .orderBy("event_type")
    )


Q_STREAM_SINK_PARTITIONED_ORACLE = """
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
       MAX(event_id) AS max_event_id
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_stream_sink_versioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming → MANIFEST-VERSIONED parquet sink (the strongest
    delivery tier: each micro-batch becomes visible only via the atomic
    ``_CURRENT`` pointer flip — exactly-once visibility by manifest,
    replays are no-ops) then a read back THROUGH the pointer resolver
    (``read_parquet``) — drain and resolution both under the oracle.
    Crash/replay/epoch-guard behavior is pytest-covered in
    tests/test_layout.py; this gate pins the data contract: a finite
    drain equals the batch aggregate."""
    import shutil
    import tempfile

    from pg_parquet_spark.sources import read_parquet
    from pg_parquet_spark.streaming.stream import (
        drain_to_versioned_parquet,
        read_events_stream,
    )

    root = os.path.join(tempfile.gettempdir(), "pgpq_vsink_gate")
    shutil.rmtree(root, ignore_errors=True)
    sink = os.path.join(root, "sink")
    events = read_events_stream(spark, sf_dir).select(
        "event_id", "event_type", "value"
    )
    # explicit checkpoint INSIDE the cleared root: the sink-derived
    # default would outlive the rmtree and mark all input processed
    drain_to_versioned_parquet(
        events,
        sink,
        ["event_type"],
        checkpoint=os.path.join(root, "ckpt"),
    )
    back = read_parquet(spark, sink)  # resolves the _CURRENT pointer
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("double")
            .alias("total_value"),
            F.max("event_id").alias("max_event_id"),
        )
        .orderBy("event_type")
    )


Q_STREAM_SINK_VERSIONED_ORACLE = """
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
       MAX(event_id) AS max_event_id
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    per-user running stats; the drained final state equals the batch
    aggregate (order-independent fields only in the output)."""
    from pg_parquet_spark.streaming.stateful import (
        run_stateful_available_now,
        running_user_stats,
    )
    from pg_parquet_spark.streaming.stream import read_events_stream

    events = read_events_stream(spark, sf_dir)
    out = run_stateful_available_now(running_user_stats(events))
    return out.select("user_id", "event_count", "last_event_id").orderBy("user_id")


Q_STREAM_STATEFUL_ORACLE = """
SELECT user_id, COUNT(*) AS event_count, MAX(event_id) AS last_event_id
FROM events GROUP BY user_id ORDER BY user_id
"""


QUERIES = {
    "q_grouping_sets": q_grouping_sets,
    "q_stream_stateful": q_stream_stateful,
    "q_stream_dedup": q_stream_dedup,
    "q_stream_dedup_within_wm": q_stream_dedup_within_wm,
    "q_subquery_scalar": q_subquery_scalar,
    "q_subquery_in": q_subquery_in,
    "q_exists_correlated": q_exists_correlated,
    "q_pandas_udf_scalar": q_pandas_udf_scalar,
    "q_pandas_udf_grouped_agg": q_pandas_udf_grouped_agg,
    "q_python_udtf": q_python_udtf,
    "q_asof_join": q_asof_join,
    "q_funnel": q_funnel,
    "q_sessionize_batch": q_sessionize_batch,
    "q_window_ntile_dist": q_window_ntile_dist,
    "q_window_range_frame": q_window_range_frame,
    "q_scalar_array": q_scalar_array,
    "q_scalar_map": q_scalar_map,
    "q_scalar_collections": q_scalar_collections,
    "q_agg_percentile_collect": q_agg_percentile_collect,
    "q_scalar_string_extra": q_scalar_string_extra,
    "q_scalar_date_arith": q_scalar_date_arith,
    "q_min_max_by": q_min_max_by,
    "q_stream_window": q_stream_window,
    "q_stream_session": q_stream_session,
    "q_stream_join": q_stream_join,
    "q_stream_stream_join": q_stream_stream_join,
    "q_stream_sink_partitioned": q_stream_sink_partitioned,
    "q_stream_sink_versioned": q_stream_sink_versioned,
    "q_stream_sliding_window": q_stream_sliding_window,
    "q_profile_histogram": q_profile_histogram,
    "q_profile_corr": q_profile_corr,
    "q_feature_winsorize": q_feature_winsorize,
    "q_skew_salted_agg": q_skew_salted_agg,
    "q_skew_salted_join": q_skew_salted_join,
}

ORACLES = {
    "q_grouping_sets": Q_GROUPING_SETS_ORACLE,
    "q_stream_stateful": Q_STREAM_STATEFUL_ORACLE,
    "q_stream_dedup": Q_STREAM_DEDUP_ORACLE,
    "q_stream_dedup_within_wm": Q_STREAM_DEDUP_WM_ORACLE,
    "q_subquery_scalar": Q_SUBQUERY_SCALAR_ORACLE,
    "q_subquery_in": Q_SUBQUERY_IN_ORACLE,
    "q_exists_correlated": Q_EXISTS_CORRELATED_ORACLE,
    "q_pandas_udf_scalar": Q_PANDAS_UDF_SCALAR_ORACLE,
    "q_pandas_udf_grouped_agg": Q_PANDAS_UDF_GROUPED_ORACLE,
    "q_python_udtf": Q_PYTHON_UDTF_ORACLE,
    "q_asof_join": Q_ASOF_JOIN_ORACLE,
    "q_funnel": Q_FUNNEL_ORACLE,
    "q_sessionize_batch": Q_SESSIONIZE_ORACLE,
    "q_window_ntile_dist": Q_WINDOW_NTILE_ORACLE,
    "q_window_range_frame": Q_WINDOW_RANGE_ORACLE,
    "q_scalar_array": Q_SCALAR_ARRAY_ORACLE,
    "q_scalar_map": Q_SCALAR_MAP_ORACLE,
    "q_scalar_collections": Q_SCALAR_COLLECTIONS_ORACLE,
    "q_agg_percentile_collect": Q_AGG_PERCENTILE_ORACLE,
    "q_scalar_string_extra": Q_SCALAR_STRING_EXTRA_ORACLE,
    "q_scalar_date_arith": Q_SCALAR_DATE_ARITH_ORACLE,
    "q_min_max_by": Q_MIN_MAX_BY_ORACLE,
    "q_stream_window": Q_STREAM_WINDOW_ORACLE,
    "q_stream_session": Q_STREAM_SESSION_ORACLE,
    "q_stream_join": Q_STREAM_JOIN_ORACLE,
    "q_stream_stream_join": Q_STREAM_STREAM_JOIN_ORACLE,
    "q_stream_sink_partitioned": Q_STREAM_SINK_PARTITIONED_ORACLE,
    "q_stream_sink_versioned": Q_STREAM_SINK_VERSIONED_ORACLE,
    "q_stream_sliding_window": Q_STREAM_SLIDING_ORACLE,
    "q_profile_histogram": Q_PROFILE_HISTOGRAM_ORACLE,
    "q_profile_corr": Q_PROFILE_CORR_ORACLE,
    "q_feature_winsorize": Q_FEATURE_WINSORIZE_ORACLE,
    "q_skew_salted_agg": Q_SKEW_SALTED_AGG_ORACLE,
    "q_skew_salted_join": Q_SKEW_SALTED_JOIN_ORACLE,
}
