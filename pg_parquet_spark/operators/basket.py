"""Market-basket association rules (beyond-reference surface): which
item pairs co-occur in the same basket more often than chance —
support / confidence / lift over pairwise co-occurrence.

Scale design (the Apriori pairwise pass, the one that matters in
practice — higher orders prune from it):

- Baskets dedup to DISTINCT (basket, item) first, so multi-line repeats
  of an item don't inflate counts, and the pair join is a basket-keyed
  SELF-EQUI-JOIN: both sides shuffle once on the basket key and
  co-partition, so pair generation is local per basket — quadratic only
  in basket SIZE, linear in basket COUNT. ``max_basket_items`` caps the
  quadratic term explicitly (oversized baskets are dropped LOUDLY via
  the returned count, mirroring SemDeDup's pair-budget stance) — at
  100 TB a handful of degenerate mega-baskets would otherwise dominate
  the join.
- Item frequencies are a broadcast-sized dimension (distinct items),
  joined to the pair counts after the ``min_cooccur`` filter has cut
  the long tail.
- All three metrics are ppm integers via positive-integer division
  (Spark ``div`` ≡ DuckDB ``//``), so ranking and hashes replicate in
  the oracle exactly. Lift is computed two-step —
  ``((co·1e6) div cnt_a · n) div cnt_b`` — to stay inside int64 at any
  realistic basket count (single-step ``co·n·1e6`` overflows beyond
  ~3e6 baskets); the two-step form IS the cross-engine contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PPM = 1_000_000


def association_rules(
    df: DataFrame,
    basket_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    min_cooccur: int = 2,
    top_k: int = 20,
    max_basket_items: int | None = None,
) -> DataFrame:
    """Top-``top_k`` item pairs by lift (ties → item ids) with
    co-occurrence ≥ ``min_cooccur``.

    Output: (item_a, item_b, co_count, cnt_a, cnt_b, support_ppm,
    conf_a_b_ppm, lift_ppm), item_a < item_b."""
    baskets = df.select(
        F.col(basket_col).cast("long").alias("b"),
        F.col(item_col).cast("long").alias("i"),
    ).distinct()
    if max_basket_items is not None:
        sizes = baskets.groupBy("b").agg(F.count("*").alias("_n"))
        keep = sizes.filter(F.col("_n") <= max_basket_items).select("b")
        baskets = baskets.join(keep, "b", "semi")
    n_baskets = baskets.select("b").distinct().count()
    item_cnt = baskets.groupBy("i").agg(F.count("*").cast("long").alias("cnt"))
    a = baskets.select("b", F.col("i").alias("item_a"))
    b = baskets.select("b", F.col("i").alias("item_b"))
    co = (
        a.join(b, "b")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").cast("long").alias("co_count"))
        .filter(F.col("co_count") >= min_cooccur)
    )
    ca = F.broadcast(item_cnt.select(F.col("i").alias("item_a"), F.col("cnt").alias("cnt_a")))
    cb = F.broadcast(item_cnt.select(F.col("i").alias("item_b"), F.col("cnt").alias("cnt_b")))
    return (
        co.join(ca, "item_a")
        .join(cb, "item_b")
        .select(
            "item_a",
            "item_b",
            "co_count",
            "cnt_a",
            "cnt_b",
            F.expr(f"(co_count * {_PPM}) div {n_baskets}").alias("support_ppm"),
            F.expr(f"(co_count * {_PPM}) div cnt_a").alias("conf_a_b_ppm"),
            F.expr(
                f"((co_count * {_PPM}) div cnt_a * {n_baskets}) div cnt_b"
            ).alias("lift_ppm"),
        )
        .orderBy(F.col("lift_ppm").desc(), "item_a", "item_b")
        .limit(top_k)
    )


def association_rules_oracle_sql(
    basket_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    min_cooccur: int = 2,
    top_k: int = 20,
    table: str = "lineitem",
) -> str:
    """DuckDB replica — same distinct baskets, same two-step integer
    lift. ``n_baskets`` is computed in SQL; it is an exact integer, so
    it matches the Spark-side collected literal bit-for-bit."""
    return f"""
WITH baskets AS (
  SELECT DISTINCT CAST({basket_col} AS BIGINT) AS b,
                  CAST({item_col} AS BIGINT) AS i
  FROM {table}
), n AS (
  SELECT COUNT(DISTINCT b) AS n_baskets FROM baskets
), item_cnt AS (
  SELECT i, COUNT(*) AS cnt FROM baskets GROUP BY i
), co AS (
  SELECT a.i AS item_a, b.i AS item_b, COUNT(*) AS co_count
  FROM baskets a JOIN baskets b ON a.b = b.b AND a.i < b.i
  GROUP BY 1, 2
  HAVING COUNT(*) >= {min_cooccur}
)
SELECT co.item_a, co.item_b, CAST(co.co_count AS BIGINT) AS co_count,
       CAST(ca.cnt AS BIGINT) AS cnt_a, CAST(cb.cnt AS BIGINT) AS cnt_b,
       CAST((co.co_count * {_PPM}) // n.n_baskets AS BIGINT) AS support_ppm,
       CAST((co.co_count * {_PPM}) // ca.cnt AS BIGINT) AS conf_a_b_ppm,
       CAST(((co.co_count * {_PPM}) // ca.cnt * n.n_baskets) // cb.cnt
            AS BIGINT) AS lift_ppm
FROM co
JOIN item_cnt ca ON ca.i = co.item_a
JOIN item_cnt cb ON cb.i = co.item_b
CROSS JOIN n
ORDER BY lift_ppm DESC, item_a, item_b
LIMIT {top_k}
"""
