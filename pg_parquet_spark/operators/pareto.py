"""Pareto frontier / skyline (beyond-reference surface): the rows not
strictly dominated on a (minimize cost, maximize benefit) pair —
"cheapest part at every size class", "best quality per token budget".

Scale design — NO self-join, NO quadratic term:

- Classic SQL computes the skyline with a NOT EXISTS anti-self-join
  (that is the oracle here), which is O(n²) and unrunnable at scale.
  The engine instead uses the sort-scan identity: a row is dominated
  iff the best benefit among STRICTLY CHEAPER rows reaches its benefit,
  or a SAME-COST row strictly beats it. So:
    1. aggregate to cost LEVELS (cost → max benefit) — map-side
       combinable, output is |distinct costs| rows;
    2. a DISTRIBUTED running max over the levels ordered by cost
       (``rows between unbounded preceding and 1 preceding``
       semantics) via :func:`distrank.distributed_running_max` —
       range-partition by cost, per-partition cummax, prefix the
       per-partition maxima broadcast back — so even unbounded level
       cardinality (continuous costs at web scale) never funnels
       through a single-task window;
    3. join the level decisions back on the cost key.
  The only data-sized operations are the level aggregation, the level
  range exchange, and the final key-equi join.
- No arithmetic on the measures — only comparisons — so doubles are
  hash-safe in the oracle compare (the float-aggregate rule doesn't
  apply: values pass through untouched).

Strict-dominance contract: duplicates (equal cost AND equal benefit)
do not dominate each other — both survive, matching the textbook
NOT EXISTS semantics the oracle states directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pg_parquet_spark.operators.distrank import distributed_running_max


def pareto_frontier(
    df: DataFrame, id_col: str, cost_col: str, benefit_col: str
) -> DataFrame:
    """Rows on the (min ``cost_col``, max ``benefit_col``) frontier,
    ordered by (cost, id)."""
    lvl = df.groupBy(F.col(cost_col).alias("_cost")).agg(
        F.max(benefit_col).alias("_mx")
    )
    lvl = distributed_running_max(lvl, "_cost", "_mx")
    dominated = (
        F.col("_best_prev").isNotNull()
        & (F.col("_best_prev") >= F.col(benefit_col))
    ) | (F.col("_mx") > F.col(benefit_col))
    return (
        df.join(lvl, df[cost_col] == lvl["_cost"])
        .filter(~dominated)
        .select(id_col, cost_col, benefit_col)
        .orderBy(cost_col, id_col)
    )


def pareto_frontier_oracle_sql(
    id_col: str = "p_partkey",
    cost_col: str = "p_retailprice",
    benefit_col: str = "p_size",
    table: str = "part",
) -> str:
    """The textbook NOT EXISTS strict-dominance skyline — quadratic,
    which is exactly why it is the small-SF oracle and not the engine."""
    return f"""
SELECT p.{id_col}, p.{cost_col}, p.{benefit_col}
FROM {table} p
WHERE NOT EXISTS (
  SELECT 1 FROM {table} q
  WHERE q.{cost_col} <= p.{cost_col}
    AND q.{benefit_col} >= p.{benefit_col}
    AND (q.{cost_col} < p.{cost_col} OR q.{benefit_col} > p.{benefit_col})
)
ORDER BY p.{cost_col}, p.{id_col}
"""
