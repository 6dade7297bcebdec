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
