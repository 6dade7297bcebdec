"""Skyline operator: oracle equality at both SFs plus the dominance
invariants (no frontier row dominated, every dropped row dominated)."""

import duckdb
import pytest

from pg_parquet_spark.operators import pareto
from pg_parquet_spark.session import table

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _con(sf):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW part AS SELECT * FROM read_parquet('{sf}/part.parquet')"
    )
    return con


@pytest.mark.parametrize("sf", SFS)
def test_pareto_matches_duckdb_oracle(spark, sf):
    parts = table(spark, sf, "part")
    got = pareto.pareto_frontier(
        parts, "p_partkey", "p_retailprice", "p_size"
    ).toPandas()
    want = _con(sf).execute(pareto.pareto_frontier_oracle_sql()).df()
    assert len(got) == len(want) > 0
    for col in ("p_partkey", "p_retailprice", "p_size"):
        assert list(got[col]) == list(want[col]), col


def test_dominance_invariants(spark):
    parts = table(spark, SFS[0], "part")
    rows = parts.select("p_partkey", "p_retailprice", "p_size").toPandas()
    frontier = pareto.pareto_frontier(
        parts, "p_partkey", "p_retailprice", "p_size"
    ).toPandas()
    fr = set(frontier["p_partkey"])

    def dominated(p, q):
        return (
            q.p_retailprice <= p.p_retailprice
            and q.p_size >= p.p_size
            and (q.p_retailprice < p.p_retailprice or q.p_size > p.p_size)
        )

    recs = list(rows.itertuples())
    for p in recs:
        dom = any(dominated(p, q) for q in recs)
        assert (p.p_partkey in fr) == (not dom), p.p_partkey


def test_duplicates_both_survive(spark):
    df = spark.createDataFrame(
        [(1, 5.0, 10), (2, 5.0, 10), (3, 6.0, 10), (4, 4.0, 1)],
        "id long, cost double, ben long",
    )
    got = pareto.pareto_frontier(df, "id", "cost", "ben").toPandas()
    # ids 1 and 2 are identical → neither dominates; 3 is dominated by
    # them (same benefit, higher cost); 4 survives (cheapest).
    assert list(got["id"]) == [4, 1, 2]
