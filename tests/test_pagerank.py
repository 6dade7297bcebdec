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
