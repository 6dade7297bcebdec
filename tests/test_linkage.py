"""Entity resolution: DuckDB-oracle equality at both SFs, blocking
bounds, and transitivity of the resolved entities."""

import duckdb
import pytest

from pg_parquet_spark.operators import linkage
from pg_parquet_spark.session import table

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _con(sf):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW part AS SELECT * FROM read_parquet('{sf}/part.parquet')"
    )
    return con


@pytest.mark.parametrize("sf", SFS)
def test_resolve_entities_matches_duckdb_oracle(spark, sf):
    parts = table(spark, sf, "part")
    got = linkage.resolve_entities(parts, "p_partkey", "p_name", max_dist=2).toPandas()
    want = _con(sf).execute(
        linkage.resolve_entities_oracle_sql("p_partkey", "p_name", max_dist=2)
    ).df()
    assert len(got) == len(want) > 0
    for col in ("p_partkey", "p_name", "entity_id"):
        assert list(got[col]) == list(want[col]), col


def test_pairs_respect_block_and_distance(spark):
    parts = table(spark, SFS[0], "part")
    mentions = linkage.mention_table(parts, "p_partkey", "p_name")
    pairs = linkage.fuzzy_name_pairs(mentions, max_dist=2).toPandas()
    assert len(pairs) > 0
    for _, r in pairs.iterrows():
        assert r.dist <= 2
        assert r.name_a.split(" ")[-1] == r.name_b.split(" ")[-1]  # blocked
        assert r.id_a < r.id_b


def test_entities_are_consistent_per_name_and_transitive(spark):
    """Same name → same entity everywhere, and entity_id is a member
    mention id (the smallest in the component)."""
    parts = table(spark, SFS[0], "part")
    res = linkage.resolve_entities(parts, "p_partkey", "p_name").toPandas()
    per_name = res.groupby("p_name")["entity_id"].nunique()
    assert (per_name == 1).all()
    mention_ids = set(
        linkage.mention_table(parts, "p_partkey", "p_name")
        .toPandas()["mention_id"]
    )
    assert set(res["entity_id"]) <= mention_ids
    # at least one genuine merge happened (distinct names, one entity)
    n_names = res["p_name"].nunique()
    n_entities = res["entity_id"].nunique()
    assert n_entities < n_names
