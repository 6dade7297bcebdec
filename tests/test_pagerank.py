"""Fixed-point PageRank: unrolled-CTE oracle equality at both SFs,
mass conservation, and a hand-checkable ranking on a tiny graph."""

import duckdb
import pytest

from pg_parquet_spark.operators import graph
from pg_parquet_spark.session import table

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _con(sf):
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("sf", SFS)
def test_page_rank_matches_duckdb_oracle(spark, sf):
    orders = table(spark, sf, "orders")
    lineitem = table(spark, sf, "lineitem")
    edges = graph.bipartite_order_edges(orders, lineitem)
    got = graph.page_rank(edges, iterations=3, top_k=20).toPandas()
    want = _con(sf).execute(
        graph.page_rank_oracle_sql(
            graph.bipartite_order_edges_sql(), iterations=3, top_k=20
        )
    ).df()
    assert len(got) == len(want) > 0
    assert list(got["node"]) == list(want["node"])
    assert list(got["pr"]) == list(want["pr"])


def test_mass_conserved_up_to_floor_loss(spark):
    """Total rank stays ≤ the initial 10^12 pico-units and within the
    documented floor-loss bound of it."""
    orders = table(spark, SFS[0], "orders")
    lineitem = table(spark, SFS[0], "lineitem")
    edges = graph.bipartite_order_edges(orders, lineitem)
    pr = graph.page_rank(edges, iterations=3, top_k=None).toPandas()
    total = int(pr["pr"].sum())
    n = len(pr)
    scale = graph._PR_SCALE
    assert total <= scale
    # floor loss: < 1 unit per division; ≤ (edges + 2·nodes) per round
    assert total >= scale - 3 * (len(pr) * 2 + 2 * n) * 100 - n


def test_star_center_outranks_leaves(spark):
    rows = [("hub", f"leaf{i}") for i in range(5)]
    rows += [(b, a) for a, b in rows]
    edges = spark.createDataFrame(rows, "src string, dst string")
    pr = graph.page_rank(edges, iterations=3, top_k=None).toPandas()
    ranked = dict(zip(pr["node"], pr["pr"]))
    assert all(ranked["hub"] > ranked[f"leaf{i}"] for i in range(5))


# --------------------------------------------------------------------------
# Triangle counting
# --------------------------------------------------------------------------


@pytest.mark.parametrize("sf", SFS)
def test_triangle_count_matches_duckdb_oracle(spark, sf):
    """Degree-oriented count over the co-purchase graph replicates the
    identically-formulated DuckDB pipeline exactly (pure integers)."""
    li = table(spark, sf, "lineitem")
    edges = graph.copurchase_edges(li, max_order_items=20)
    got = graph.triangle_count(edges).toPandas()
    want = _con(sf).execute(graph.triangle_oracle_sql()).df()
    assert got.values.tolist() == want.values.tolist()
    assert got.n_triangles.iloc[0] > 0


def test_triangle_count_exact_on_fixture(spark):
    """K4 + pendant = exactly 4 triangles; direction/duplicate noise in
    the input (reversed pairs, self-loops, dup rows) must not change
    the count — canonicalization is part of the contract."""
    rows = [(1, 2), (2, 1), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 5), (3, 4)]
    df = spark.createDataFrame(rows, "u long, v long")
    n = graph.triangle_count(df).collect()[0]
    assert (n.n_nodes, n.n_edges, n.n_triangles) == (5, 7, 4)


def test_copurchase_edges_guard_is_loud(spark):
    li = table(spark, SFS[1], "lineitem")
    with pytest.raises(ValueError, match="distinct parts"):
        graph.copurchase_edges(li, max_order_items=12)


def test_connected_components_matches_oracle(spark):
    """r14: min-label propagation replicates the unrolled-CTE oracle
    bit-for-bit at both SFs over the bipartite order-part graph."""
    import duckdb

    from pg_parquet_spark.operators import graph
    from pg_parquet_spark.session import table

    edges_sql = (
        "SELECT l_orderkey AS src, 1000000 + l_partkey AS dst "
        "FROM lineitem WHERE l_orderkey % 7 = 0"
    )
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        li = table(spark, sf, "lineitem").filter("l_orderkey % 7 = 0")
        e = li.selectExpr("l_orderkey AS src", "1000000 + l_partkey AS dst")
        got = graph.connected_components(e, iterations=8).toPandas()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{sf}/lineitem.parquet')"
        )
        want = con.execute(
            graph.connected_components_oracle_sql(edges_sql, 8)
        ).df()
        assert len(got) == len(want) > 0, sf
        for c in got.columns:
            assert list(got[c]) == list(want[c]), (sf, c)


def test_connected_components_semantics(spark):
    """Planted fixture: a 6-node chain (diameter 5) resolves to one
    component at sufficient rounds and cc_converged certifies it;
    under-iteration is detectably unconverged; disjoint components
    keep distinct min labels; direction doesn't matter."""
    from pg_parquet_spark.operators import graph

    # chain 1-2-3-4-5-6 (edges deliberately reversed in places) and a
    # separate pair 10-11
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (4, 3), (4, 5), (6, 5), (10, 11)],
        "src long, dst long",
    )
    done = graph.connected_components(edges, iterations=6)
    labels = {r.node: r.component for r in done.collect()}
    assert {labels[str(n)] for n in (1, 2, 3, 4, 5, 6)} == {"1"}
    assert labels["10"] == labels["11"] == "10"
    assert graph.cc_converged(edges, done)
    # 1 round cannot traverse the diameter-5 chain
    partial = graph.connected_components(edges, iterations=1)
    assert not graph.cc_converged(edges, partial)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="iterations"):
        graph.connected_components(edges, iterations=0)


def test_kcore_planted_triangle_with_tail(spark):
    """k-core peeling (r14): a triangle with a pendant tail — the
    2-core is exactly the triangle (the tail peels), degrees are the
    induced-subgraph degrees, self-loops and duplicate/reversed edges
    collapse."""
    from pg_parquet_spark.operators import graph

    edges = spark.createDataFrame(
        [
            (1, 2), (2, 3), (3, 1),          # triangle
            (1, 4),                          # pendant tail
            (2, 1),                          # reversed duplicate
            (4, 4),                          # self-loop drops
            (None, 1), (5, None),            # NULL endpoints drop
        ],
        "src int, dst int",
    )
    got = graph.kcore(edges, k=2, rounds=4).collect()
    assert [(r.node, r.degree) for r in got] == [
        ("1", 2), ("2", 2), ("3", 2),
    ]
    core = spark.createDataFrame(
        [("1",), ("2",), ("3",)], "node string"
    )
    assert graph.kcore_converged(edges, core, k=2)
    # the full node set is NOT converged at k=2 (node 4 has degree 1)
    all_nodes = spark.createDataFrame(
        [("1",), ("2",), ("3",), ("4",)], "node string"
    )
    assert not graph.kcore_converged(edges, all_nodes, k=2)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="k must be"):
        graph.kcore(edges, k=0)
    with _pytest.raises(ValueError, match="rounds"):
        graph.kcore(edges, rounds=0)


def test_kcore_under_iteration_diverges_identically(spark):
    """The fixed-round contract: a 5-node path at k=2 peels one layer
    per round from each end; at rounds=1 BOTH engines report the same
    partial (not-yet-converged) node set, and convergence flips the
    external check, never the gate's plan."""
    import duckdb

    from pg_parquet_spark.operators import graph

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "src int, dst int"
    )
    got1 = graph.kcore(edges, k=2, rounds=1)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW path_edges AS SELECT * FROM (VALUES "
        "(1, 2), (2, 3), (3, 4), (4, 5)) t(src, dst)"
    )
    want1 = con.execute(
        graph.kcore_oracle_sql("SELECT src, dst FROM path_edges",
                               k=2, rounds=1)
    ).df()
    rows1 = [(r.node, r.degree) for r in got1.collect()]
    assert rows1 == list(map(tuple, want1.itertuples(index=False)))
    assert rows1 == [("2", 1), ("3", 2), ("4", 1)]  # ends peeled once
    assert not graph.kcore_converged(edges, got1.select("node"), k=2)
    # fully converged: the path has NO 2-core
    assert graph.kcore(edges, k=2, rounds=3).count() == 0


def test_kcore_matches_oracle_on_copurchase(spark):
    """Gate replica at sf0.001: k=3 core of the co-purchase graph
    equals the unrolled-CTE oracle and is converged at 6 rounds."""
    import duckdb

    from pg_parquet_spark.operators import graph
    from pg_parquet_spark.operators.extended_registry import _KCORE_EDGES_SQL
    from pg_parquet_spark.session import table

    sf = "/root/testdata/sf0.001"
    e = graph.copurchase_edges(
        table(spark, sf, "lineitem"), max_order_items=20
    ).selectExpr("u AS src", "v AS dst")
    core = graph.kcore(e, k=3, rounds=6)
    got = [(r.node, r.degree) for r in core.collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{sf}/lineitem.parquet')"
    )
    want = con.execute(
        graph.kcore_oracle_sql(_KCORE_EDGES_SQL, k=3, rounds=6)
    ).df()
    assert got == list(map(tuple, want.itertuples(index=False)))
    assert len(got) > 0
    assert all(d >= 3 for _, d in got)
    assert graph.kcore_converged(e, core.select("node"), k=3)
