"""Association rules: DuckDB-oracle equality at both SFs, metric
sanity, and the basket-size cap contract."""

import duckdb
import pytest

from pg_parquet_spark.operators import basket
from pg_parquet_spark.session import table

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

COLS = [
    "item_a",
    "item_b",
    "co_count",
    "cnt_a",
    "cnt_b",
    "support_ppm",
    "conf_a_b_ppm",
    "lift_ppm",
]


def _con(sf):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{sf}/lineitem.parquet')"
    )
    return con


@pytest.mark.parametrize("sf", SFS)
def test_association_rules_match_duckdb_oracle(spark, sf):
    li = table(spark, sf, "lineitem")
    got = basket.association_rules(li, min_cooccur=2, top_k=20).toPandas()
    want = _con(sf).execute(
        basket.association_rules_oracle_sql(min_cooccur=2, top_k=20)
    ).df()
    assert len(got) == len(want) > 0
    for col in COLS:
        assert list(got[col]) == list(want[col]), col


def test_metrics_are_sane(spark):
    li = table(spark, SFS[1], "lineitem")
    rules = basket.association_rules(li, min_cooccur=2, top_k=50).toPandas()
    n_baskets = li.select("l_orderkey").distinct().count()
    for _, r in rules.iterrows():
        assert r.item_a < r.item_b
        assert r.co_count >= 2
        assert r.co_count <= min(r.cnt_a, r.cnt_b)
        assert 0 < r.support_ppm <= 1_000_000
        assert 0 < r.conf_a_b_ppm <= 1_000_000
        # lift > 1 (ppm) means the pair beats independence; top-ranked
        # pairs should all clear it on this data
        assert r.lift_ppm > 1_000_000
        # exact integer recomputation matches the engine's contract
        assert r.support_ppm == (r.co_count * 1_000_000) // n_baskets


def test_basket_cap_drops_oversized(spark):
    li = table(spark, SFS[0], "lineitem")
    sizes = (
        li.select("l_orderkey", "l_partkey")
        .distinct()
        .groupBy("l_orderkey")
        .count()
        .toPandas()
    )
    cap = int(sizes["count"].max()) - 1
    capped = basket.association_rules(
        li, min_cooccur=1, top_k=10_000, max_basket_items=cap
    ).toPandas()
    full = basket.association_rules(li, min_cooccur=1, top_k=10_000).toPandas()
    assert len(capped) < len(full)
