"""Hierarchy / graph-closure operators (r9): transitive ancestors by
PATH DOUBLING and subtree (BOM-style) rollups — the recursive-CTE
workload Spark lacks natively, expressed as a convergent join loop.

Scale design:

- **Path doubling, not parent-chasing**: each round composes the
  closure with ITSELF, so reachable-distance doubles per round and a
  depth-d hierarchy converges in ceil(log2 d) + 1 rounds (a
  parent-pointer loop needs d rounds — 6 vs ~60 for a deep BOM). Every
  round is one equi-join + distinct, both key-partitioned shuffles.
- **Convergence is detected, never assumed** (the dedup-clusters
  contract): the loop compares closure sizes per round and RAISES at
  ``max_rounds`` instead of silently truncating reachability. Note a
  finite CYCLE still converges (its closure contains the self-pairs
  node→node) — the bound guards DEPTH, not cyclicity; subtree_rollup's
  contract is a DAG/forest, and cyclic input shows up loudly as nodes
  that are their own ancestors (asserted in tests).
- Closure size is Σ depth(n) ≤ n·d rows of two ids — the classic
  space trade of materialized reachability; for billion-node graphs
  cap with ``max_depth``-style pruning upstream (document, don't
  silently drop).

The DuckDB oracle is the textbook ``WITH RECURSIVE`` — the two
formulations must produce the identical pair set
(tests/test_analytics_ops.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_ancestors(
    edges: DataFrame,
    node_col: str = "node",
    parent_col: str = "parent",
    max_rounds: int = 20,
) -> DataFrame:
    """All (node, ancestor) pairs at ANY distance ≥ 1 over a
    child→parent edge table, by path doubling. Raises if the closure
    has not converged after ``max_rounds`` doublings (reachable
    distance 2^max_rounds) — a depth bound; cycles converge with
    self-pairs rather than raising (see module docstring)."""
    cl = edges.select(
        F.col(node_col).alias("node"), F.col(parent_col).alias("ancestor")
    ).distinct()
    for _ in range(max_rounds):
        hop = cl.select(
            F.col("node").alias("_mid"), F.col("ancestor").alias("_anc")
        )
        doubled = (
            cl.join(hop, cl.ancestor == hop._mid)
            .select("node", F.col("_anc").alias("ancestor"))
            .unionByName(cl)
            .distinct()
        )
        doubled = doubled.persist()
        n_new, n_old = doubled.count(), cl.count()
        cl.unpersist()  # no-op on the first (never-persisted) frame
        cl = doubled
        if n_new == n_old:
            return cl
    raise RuntimeError(
        f"transitive closure did not converge in {max_rounds} doubling "
        f"rounds (reachable distance 2^{max_rounds}) — the hierarchy is "
        "deeper than the bound; raise max_rounds only if the depth is "
        "genuinely that large"
    )


def subtree_rollup(
    edges: DataFrame,
    values: DataFrame,
    node_col: str = "node",
    parent_col: str = "parent",
    value_col: str = "value",
    max_rounds: int = 20,
) -> DataFrame:
    """BOM-style subtree totals: for every node, the exact DECIMAL sum
    and count of ``value_col`` over the node's ENTIRE subtree (self
    included) — the hierarchy rollup a recursive CTE computes, as one
    closure + one aggregate. ``values`` must carry ONE row per node
    (duplicate nodes would multiply membership pairs — pre-aggregate
    upstream). Returns (node, n_nodes, total)."""
    closure = transitive_ancestors(edges, node_col, parent_col, max_rounds)
    self_pairs = values.select(
        F.col(node_col).alias("node"), F.col(node_col).alias("ancestor")
    )
    member_of = closure.unionByName(self_pairs).distinct()
    v = values.select(
        F.col(node_col).alias("node"),
        F.col(value_col).cast("decimal(18,2)").alias("_v"),
    )
    return (
        member_of.join(v, "node")
        .groupBy("ancestor")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("_v").cast("double").alias("total"),
        )
        .select(F.col("ancestor").alias("node"), "n_nodes", "total")
        .orderBy("node")
    )


def subtree_rollup_oracle_sql(
    edges_sql: str,
    values_sql: str,
    node_col: str = "node",
    parent_col: str = "parent",
    value_col: str = "value",
) -> str:
    """DuckDB replica via WITH RECURSIVE: the closure is the textbook
    recursive CTE; the rollup joins self-inclusive membership onto the
    values with the identical DECIMAL re-sum. ``edges_sql`` /
    ``values_sql`` are subqueries producing (node, parent) and
    (node, value)."""
    return f"""
WITH RECURSIVE edges AS ({edges_sql}), vals AS ({values_sql}),
closure AS (
  SELECT {node_col} AS node, {parent_col} AS ancestor FROM edges
  UNION
  SELECT c.node, e.{parent_col} AS ancestor
  FROM closure c JOIN edges e ON c.ancestor = e.{node_col}
), member_of AS (
  SELECT node, ancestor FROM closure
  UNION
  SELECT {node_col} AS node, {node_col} AS ancestor FROM vals
)
SELECT m.ancestor AS node, COUNT(*) AS n_nodes,
       CAST(SUM(CAST(v.{value_col} AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM member_of m JOIN vals v ON v.{node_col} = m.node
GROUP BY m.ancestor ORDER BY m.ancestor
"""
