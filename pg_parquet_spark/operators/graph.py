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


# --------------------------------------------------------------------------
# Fixed-point PageRank
# --------------------------------------------------------------------------

_PR_SCALE = 10**12  # total rank mass, integer "pico-rank" units


def bipartite_order_edges(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Undirected customer↔supplier interaction graph from the order
    flow: an edge per DISTINCT (customer, supplier) pair that ever
    traded, emitted in both directions. Node keys are prefixed strings
    ('c:<custkey>' / 's:<suppkey>') so the two id spaces can't collide."""
    pairs = (
        orders.select("o_orderkey", "o_custkey")
        .join(
            lineitem.select("l_orderkey", "l_suppkey"),
            orders.o_orderkey == lineitem.l_orderkey,
        )
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    return pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def page_rank(
    edges: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
    top_k: int | None = 20,
) -> DataFrame:
    """Fixed-ITERATION, fixed-POINT PageRank: ``iterations`` rounds of
    pr(v) ← base + d·Σ_{u→v} pr(u)/out(u), entirely in integer
    arithmetic so the result is bit-identical on any engine, partition
    layout, or cluster size — the iterative-algorithm class Spark is
    usually said to need GraphX for, expressed as a 3-round join/agg
    loop over DataFrames.

    Determinism contract: rank mass is integer pico-units
    (Σ init = 10^12); each edge contribution is ``pr div out_degree``
    and the damped update is ``(init·(100−d)) div 100 +
    (d·Σcontrib) div 100`` — positive-integer division only (Spark
    ``div`` ≡ DuckDB ``//``), so the unrolled-CTE oracle replicates
    every iteration exactly. Floor loss per division is the documented
    trade (≤ out_degree pico-units per node per round) — this is a
    RANKING operator, not a probability estimator.

    Scale shape: the edge list shuffles once per round on the join key;
    degrees and ranks are node-sized (≪ edges). Dangling nodes (out-
    degree 0 — impossible in an undirected graph) simply leak their
    mass, the standard simplification; stated, not silent. Each round
    localCheckpoints the node-sized rank frame, truncating the
    iterative lineage like near_dup_clusters does.
    """
    # Materialize the loop-invariant frames ONCE (near_dup_clusters
    # precedent): without the checkpoint every iteration re-derives the
    # edge list from its upstream plan (a join+distinct here costs more
    # than the rank update itself — measured 13 s → 3 s at sf0.1).
    e = (
        edges.select(
            F.col("src").cast("string").alias("src"),
            F.col("dst").cast("string").alias("dst"),
        )
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        raise ValueError("page_rank: empty edge set")
    init = _PR_SCALE // n
    base = (init * (100 - damping_pct)) // 100
    deg = (
        e.groupBy("src")
        .agg(F.count("*").cast("long").alias("deg"))
        .localCheckpoint()
    )
    pr = nodes.select("node", F.lit(init).cast("long").alias("pr"))
    for _ in range(iterations):
        contrib = (
            e.join(pr, e.src == pr.node)
            .join(deg, "src")
            .select(F.col("dst").alias("node"), F.expr("pr div deg").alias("c"))
        )
        sums = contrib.groupBy("node").agg(F.sum("c").cast("long").alias("s"))
        pr = (
            nodes.join(sums, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(f"({damping_pct} * coalesce(s, 0L)) div 100")
                ).cast("long").alias("pr"),
            )
            .localCheckpoint()
        )
    out = pr.orderBy(F.col("pr").desc(), "node")
    return out.limit(top_k) if top_k is not None else out


def bipartite_order_edges_sql(
    orders: str = "orders", lineitem: str = "lineitem"
) -> str:
    """SQL twin of bipartite_order_edges, for embedding as the oracle's
    ``edges_sql`` subquery."""
    return f"""
WITH pairs AS (
  SELECT DISTINCT CONCAT('c:', CAST(o.o_custkey AS VARCHAR)) AS src,
                  CONCAT('s:', CAST(l.l_suppkey AS VARCHAR)) AS dst
  FROM {orders} o JOIN {lineitem} l ON o.o_orderkey = l.l_orderkey
)
SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs
"""


def page_rank_oracle_sql(
    edges_sql: str,
    iterations: int = 3,
    damping_pct: int = 85,
    top_k: int | None = 20,
) -> str:
    """DuckDB replica: the iteration unrolled into chained CTEs with
    the identical integer update. ``edges_sql`` produces (src, dst)."""
    ctes = [
        f"e AS (SELECT DISTINCT CAST(src AS VARCHAR) AS src, "
        f"CAST(dst AS VARCHAR) AS dst FROM ({edges_sql}))",
        "nodes AS (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM e UNION ALL SELECT dst FROM e))",
        f"cfg AS (SELECT CAST({_PR_SCALE} // COUNT(*) AS BIGINT) AS init, "
        f"CAST(({_PR_SCALE} // COUNT(*)) * {100 - damping_pct} // 100 AS BIGINT)"
        " AS base FROM nodes)",
        "deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src)",
        "pr0 AS (SELECT node, (SELECT init FROM cfg) AS pr FROM nodes)",
    ]
    for i in range(iterations):
        prev, cur = f"pr{i}", f"pr{i + 1}"
        ctes.append(
            f"{cur} AS (SELECT n.node, CAST((SELECT base FROM cfg) + "
            f"{damping_pct} * COALESCE(s.s, 0) // 100 AS BIGINT) AS pr "
            f"FROM nodes n LEFT JOIN (SELECT e.dst AS node, "
            f"SUM(CAST(p.pr // d.deg AS BIGINT)) AS s "
            f"FROM e JOIN {prev} p ON e.src = p.node "
            f"JOIN deg d ON d.src = e.src GROUP BY e.dst) s USING (node))"
        )
    limit = f"LIMIT {top_k}" if top_k is not None else ""
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT node, pr FROM pr{iterations} "
        f"ORDER BY pr DESC, node {limit}"
    )


# --------------------------------------------------------------------------
# Triangle counting (degree-oriented)
# --------------------------------------------------------------------------


def copurchase_edges(lineitem: DataFrame, max_order_items: int = 12) -> DataFrame:
    """Undirected co-purchase graph: an edge (a, b), a < b, for every
    pair of distinct parts appearing in the same order. The per-order
    pair blowup is quadratic in basket size, so ``max_order_items``
    fails fast on degenerate baskets (the association-rules guard)."""
    items = lineitem.select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("part")
    ).distinct()
    big = (
        items.groupBy("okey")
        .count()
        .filter(F.col("count") > max_order_items)
        .limit(1)
        .collect()
    )
    if big:
        raise ValueError(
            f"order {big[0]['okey']} has {big[0]['count']} > "
            f"{max_order_items} distinct parts — raise max_order_items "
            "explicitly if the quadratic pair cost is intended"
        )
    a, b = items.alias("a"), items.alias("b")
    return (
        a.join(b, "okey")
        .filter(F.col("a.part") < F.col("b.part"))
        .select(F.col("a.part").alias("u"), F.col("b.part").alias("v"))
        .distinct()
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """Exact triangle count of the undirected graph ``edges`` (u, v)
    by DEGREE ORIENTATION: rank nodes by (degree, id), direct every
    edge low→high rank, then count wedge closures.

    Why this is THE scalable formulation: orienting by degree bounds
    every out-degree by O(√m) regardless of skew — the celebrity node
    with 10⁶ neighbors contributes wedges only through its (few)
    higher-ranked peers, so the wedge table (Σ outdeg²) stays ~m^1.5
    worst-case instead of deg_max². Each triangle {x,y,z} with ranks
    x<y<z is counted EXACTLY once, as the wedge (x→y, x→z) closed by
    the edge y→z. Three key-partitioned hash joins, no cartesian. The
    rank assignment is :func:`distrank.distributed_row_number` over
    (deg, n) — range exchange + per-partition windows, identical
    values to the global row_number, so a billion-node graph ranks in
    parallel instead of through one task. Returns one row
    (n_nodes, n_edges, n_triangles).

    Oracle: the identical formulation in DuckDB SQL
    (:func:`triangle_oracle_sql`) — being a pure integer pipeline it
    replicates exactly; tests also cross-check a brute-force
    3-way-join count on a small fixture."""
    from pg_parquet_spark.operators.distrank import distributed_row_number

    und = (
        edges.select(
            F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("n"))
        .unionAll(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("deg"))
    )
    rank = distributed_row_number(deg, ["deg", "n"], out_col="r").select(
        "n", "r"
    )
    # no broadcast hint: the rank table is NODE-sized — dimension-small
    # here (parts), potentially huge on a web graph — so the join
    # strategy is left to AQE's runtime size estimate
    ranked = (
        und.join(rank.alias("ra"), F.col("a") == F.col("ra.n"))
        .join(rank.alias("rb"), F.col("b") == F.col("rb.n"))
        .select(
            F.least("ra.r", "rb.r").alias("lo"),
            F.greatest("ra.r", "rb.r").alias("hi"),
        )
    )
    # the oriented edge list is read THREE times (both wedge legs + the
    # closing probe) and the node/edge counts twice more — materialize
    # it once instead of re-running the dedup + rank joins per alias
    # (the PageRank loop-invariant lesson; 77 → ~8 exchanges)
    ranked = ranked.localCheckpoint(eager=False)
    e1, e2, e3 = ranked.alias("e1"), ranked.alias("e2"), ranked.alias("e3")
    wedges = e1.join(e2, "lo").filter(F.col("e1.hi") < F.col("e2.hi"))
    tri = wedges.join(
        e3,
        (F.col("e1.hi") == F.col("e3.lo")) & (F.col("e2.hi") == F.col("e3.hi")),
        "inner",
    )
    nodes = (
        ranked.select(F.col("lo").alias("r"))
        .unionAll(ranked.select(F.col("hi").alias("r")))
        .distinct()
    )
    # 1-row × 1-row crossJoins (compile to BroadcastNestedLoopJoin on
    # single-row frames — the q_sim_cosine_topk-style designed shape)
    return (
        tri.agg(F.count("*").cast("long").alias("n_triangles"))
        .crossJoin(ranked.agg(F.count("*").cast("long").alias("n_edges")))
        .crossJoin(nodes.agg(F.count("*").cast("long").alias("n_nodes")))
        .select("n_nodes", "n_edges", "n_triangles")
    )


def triangle_oracle_sql(max_order_items: int = 12) -> str:
    """DuckDB replica: co-purchase edges from lineitem, the same
    degree-rank orientation, the same wedge-closure count."""
    return f"""
WITH items AS (
  SELECT DISTINCT l_orderkey AS okey, l_partkey AS part FROM lineitem
), und AS (
  SELECT DISTINCT a.part AS a, b.part AS b
  FROM items a JOIN items b USING (okey)
  WHERE a.part < b.part
), deg AS (
  SELECT n, COUNT(*) AS deg FROM (
    SELECT a AS n FROM und UNION ALL SELECT b FROM und
  ) GROUP BY n
), rank AS (
  SELECT n, CAST(row_number() OVER (ORDER BY deg, n) AS BIGINT) AS r
  FROM deg
), ranked AS (
  SELECT least(ra.r, rb.r) AS lo, greatest(ra.r, rb.r) AS hi
  FROM und JOIN rank ra ON und.a = ra.n JOIN rank rb ON und.b = rb.n
), tri AS (
  SELECT COUNT(*) AS n_triangles
  FROM ranked e1
  JOIN ranked e2 ON e1.lo = e2.lo AND e1.hi < e2.hi
  JOIN ranked e3 ON e3.lo = e1.hi AND e3.hi = e2.hi
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM rank) AS n_nodes,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM und) AS n_edges,
       CAST(n_triangles AS BIGINT) AS n_triangles
FROM tri
"""


# --------------------------------------------------------------------------
# Connected components (min-label propagation)
# --------------------------------------------------------------------------


def connected_components(
    edges: DataFrame,
    iterations: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Connected components by fixed-round MIN-label propagation (r14 —
    the cluster primitive under every dedup graph: near-dup edge sets,
    entity-resolution matches, co-occurrence networks). Each node's
    label starts as itself and each round takes the min over its
    neighborhood; after enough rounds every node carries its
    component's minimum node id. Returns (node, component) for every
    edge ENDPOINT (isolated nodes never appear in an edge list —
    callers union them back as their own components), ordered.

    ``iterations`` must be ≥ the graph DIAMETER for exact components —
    a fixed unrolled count, like :func:`page_rank`, so the oracle can
    replicate round-for-round (and under-iteration diverges
    IDENTICALLY on both engines). For web-scale graphs with unknown
    diameter, loop :func:`cc_converged` externally or switch to the
    log-round large-star/small-star contraction — documented,
    deliberately not implicit (a hidden driver-side convergence loop
    would make the gate's plan depend on data).

    Scale shape: one symmetric edge normalization (distinct), then per
    round ONE edge-keyed join + node-keyed min-aggregate — edges
    shuffle once per round, labels stay node-sized; the node frame
    localCheckpoints each round (page_rank's lineage-truncation
    precedent)."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    e = (
        edges.filter(
            F.col(src_col).isNotNull() & F.col(dst_col).isNotNull()
        )
        .select(
            F.col(src_col).cast("string").alias("a"),
            F.col(dst_col).cast("string").alias("b"),
        )
    )
    sym = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    sym = sym.localCheckpoint(eager=True)
    labels = sym.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(int(iterations)):
        nbr = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("label").alias("_nbr"))
        )
        labels = (
            labels.join(nbr, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("_nbr", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
    return labels.select(
        "node", F.col("label").alias("component")
    ).orderBy("node")


def cc_converged(
    edges: DataFrame,
    labels: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> bool:
    """True iff one more propagation round would change nothing — the
    external convergence check for unknown-diameter graphs (run
    :func:`connected_components` with rising ``iterations`` until this
    holds; each check is one edge-keyed join). ``src_col``/``dst_col``
    name the edge columns exactly like connected_components — NOT
    positional (review, late-r14: a leading weight/id column would
    have silently joined on the wrong keys and returned a wrong
    verdict)."""
    e = edges.select(
        F.col(src_col).cast("string").alias("a"),
        F.col(dst_col).cast("string").alias("b"),
    )
    sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    lab = labels.select(
        F.col("node"), F.col("component").alias("label")
    )
    joined = (
        sym.join(lab.withColumnRenamed("node", "a"), "a")
        .withColumnRenamed("label", "la")
        .join(
            lab.withColumnRenamed("node", "b").withColumnRenamed(
                "label", "lb"
            ),
            "b",
        )
    )
    return joined.filter(F.col("la") != F.col("lb")).limit(1).count() == 0


def connected_components_oracle_sql(
    edges_sql: str, iterations: int = 8
) -> str:
    """DuckDB replica: the propagation unrolled into chained CTEs —
    identical symmetric normalization, identical min-label rounds.
    ``edges_sql`` produces (src, dst)."""
    ctes = [
        f"raw AS (SELECT CAST(src AS VARCHAR) AS a, CAST(dst AS VARCHAR) AS b "
        f"FROM ({edges_sql}) WHERE src IS NOT NULL AND dst IS NOT NULL)",
        "sym AS (SELECT DISTINCT a, b FROM "
        "(SELECT a, b FROM raw UNION ALL SELECT b AS a, a AS b FROM raw))",
        "l0 AS (SELECT DISTINCT a AS node, a AS label FROM sym)",
    ]
    for i in range(int(iterations)):
        prev, cur = f"l{i}", f"l{i + 1}"
        ctes.append(
            f"{cur} AS (SELECT p.node, "
            f"LEAST(p.label, COALESCE(n.nbr, p.label)) AS label "
            f"FROM {prev} p LEFT JOIN (SELECT sym.a AS node, "
            f"MIN(q.label) AS nbr FROM sym JOIN {prev} q ON sym.b = q.node "
            f"GROUP BY sym.a) n ON p.node = n.node)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, label AS component FROM l{iterations} ORDER BY node"
    )


def kcore(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """k-core decomposition by fixed-round peeling (r14 — the density
    filter next to :func:`connected_components`: the k-core is the
    maximal subgraph where every node keeps degree ≥ k, the standard
    way to carve the dense heart out of a co-occurrence or near-dup
    graph before expensive downstream work). Each round recomputes
    degrees in the CURRENTLY induced subgraph and drops nodes under
    ``k``; peeling is monotone (node sets only shrink), so once a
    round removes nothing the result is exact.

    Like :func:`connected_components`, ``rounds`` is a FIXED unrolled
    count so the DuckDB oracle replicates round-for-round and
    under-iteration diverges identically on both engines — exactness
    for unknown peel depth is the caller's loop over
    :func:`kcore_converged` (the external-convergence contract;
    a hidden driver-side loop would make the gate's plan depend on
    data). Returns the surviving nodes as (node, degree) — degree in
    the FINAL induced subgraph — ordered; self-loops and NULL
    endpoints drop, direction and duplicate edges collapse.

    Scale shape: per round TWO semi-joins of the (symmetric) edge
    frame against the shrinking node set plus one node-keyed count —
    all key-partitioned hash shuffles; labels stay node-sized and the
    node frame localCheckpoints per round (page_rank's
    lineage-truncation precedent). Peel depth on real graphs is small
    (each round removes a full degeneracy layer)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    e = edges.filter(
        F.col(src_col).isNotNull()
        & F.col(dst_col).isNotNull()
        & (F.col(src_col).cast("string") != F.col(dst_col).cast("string"))
    ).select(
        F.col(src_col).cast("string").alias("a"),
        F.col(dst_col).cast("string").alias("b"),
    )
    sym = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    sym = sym.localCheckpoint(eager=True)
    nodes = sym.select(F.col("a").alias("node")).distinct()
    for _ in range(int(rounds)):
        alive = sym.join(
            nodes.withColumnRenamed("node", "a"), "a", "left_semi"
        ).join(nodes.withColumnRenamed("node", "b"), "b", "left_semi")
        nodes = (
            alive.groupBy(F.col("a").alias("node"))
            .agg(F.count(F.lit(1)).alias("_d"))
            .filter(F.col("_d") >= k)
            .select("node")
            .localCheckpoint(eager=True)
        )
    final = sym.join(
        nodes.withColumnRenamed("node", "a"), "a", "left_semi"
    ).join(nodes.withColumnRenamed("node", "b"), "b", "left_semi")
    deg = final.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    # isolated survivors cannot exist (survival requires degree >= k
    # in the previous round's subgraph, and the last peel re-checks),
    # but a not-yet-converged run can leave degree < k — visible, by
    # design, identically in both engines
    return nodes.join(deg, "node", "left").select(
        "node", F.coalesce("degree", F.lit(0)).alias("degree")
    ).orderBy("node")


def kcore_converged(
    edges: DataFrame,
    core_nodes: DataFrame,
    k: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> bool:
    """True iff one more peel round would remove nothing — every node
    in ``core_nodes`` keeps degree ≥ k inside the induced subgraph.
    Column-named like :func:`kcore` (the cc_converged contract: never
    positional)."""
    e = edges.filter(
        F.col(src_col).isNotNull()
        & F.col(dst_col).isNotNull()
        & (F.col(src_col).cast("string") != F.col(dst_col).cast("string"))
    ).select(
        F.col(src_col).cast("string").alias("a"),
        F.col(dst_col).cast("string").alias("b"),
    )
    sym = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    nodes = core_nodes.select("node")
    alive = sym.join(
        nodes.withColumnRenamed("node", "a"), "a", "left_semi"
    ).join(nodes.withColumnRenamed("node", "b"), "b", "left_semi")
    deg = alive.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).alias("_d")
    )
    under = (
        nodes.join(deg, "node", "left")
        .filter(F.coalesce("_d", F.lit(0)) < k)
        .limit(1)
        .count()
    )
    return under == 0


def kcore_oracle_sql(edges_sql: str, k: int = 3, rounds: int = 8) -> str:
    """DuckDB replica: the peel unrolled into chained CTEs — identical
    symmetric normalization, identical induced-degree rounds.
    ``edges_sql`` produces (src, dst)."""
    ctes = [
        f"raw AS (SELECT CAST(src AS VARCHAR) AS a, CAST(dst AS VARCHAR) AS b "
        f"FROM ({edges_sql}) WHERE src IS NOT NULL AND dst IS NOT NULL "
        f"AND CAST(src AS VARCHAR) <> CAST(dst AS VARCHAR))",
        "sym AS (SELECT DISTINCT a, b FROM "
        "(SELECT a, b FROM raw UNION ALL SELECT b AS a, a AS b FROM raw))",
        "n0 AS (SELECT DISTINCT a AS node FROM sym)",
    ]
    for i in range(int(rounds)):
        prev, cur = f"n{i}", f"n{i + 1}"
        ctes.append(
            f"{cur} AS (SELECT e.a AS node FROM sym e "
            f"JOIN {prev} x ON e.a = x.node "
            f"JOIN {prev} y ON e.b = y.node "
            f"GROUP BY e.a HAVING COUNT(*) >= {int(k)})"
        )
    last = f"n{rounds}"
    return (
        "WITH " + ",\n".join(ctes)
        + f""",
final_deg AS (
  SELECT e.a AS node, CAST(COUNT(*) AS BIGINT) AS degree
  FROM sym e
  JOIN {last} x ON e.a = x.node
  JOIN {last} y ON e.b = y.node
  GROUP BY e.a
)
SELECT n.node, COALESCE(d.degree, 0) AS degree
FROM {last} n LEFT JOIN final_deg d ON n.node = d.node
ORDER BY n.node"""
    )
