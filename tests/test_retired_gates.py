"""Retired driver gates stay oracle-green LOCALLY.

The registry is saturated (150 gates = 50-slot window × 3-round
freshness cycle — VERDICT r8), so adding a gate retires one 1-for-1.
Retirement removes a query from the DRIVER surface only: the
implementation, its DuckDB oracle, and this test remain, so a
regression in a retired operator still reddens CI. Each retirement's
rationale lives in ``registry.RETIRED``; ``tools/rotation.py check``
audits the hygiene (retired ⇒ unregistered + rationale)."""

import os

import duckdb
import pytest

from pg_parquet_spark.operators import registry
from tools.check_oracle import TABLES, frame_digest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    yield con
    con.close()


def test_retired_set_is_consistent():
    regular = registry.all_queries()
    full = registry.all_queries(include_retired=True)
    oracles = registry.all_oracles(include_retired=True)
    for name, why in registry.RETIRED.items():
        assert name not in regular, f"{name} retired but still registered"
        assert name in full, f"{name} retired but implementation dropped"
        assert name in oracles, f"{name} retired but oracle dropped"
        assert why.strip(), f"{name} retired without a rationale"


@pytest.mark.parametrize("name", sorted(registry.RETIRED))
def test_retired_gate_still_oracle_green(spark, duck, name):
    q = registry.all_queries(include_retired=True)[name]
    o = registry.all_oracles(include_retired=True)[name]
    spdf = q(spark, SF).toPandas()
    opdf = duck.execute(o).df()
    sn, sc, sh, _ = frame_digest(spdf)
    on, oc, oh, _ = frame_digest(opdf)
    assert sn == on, f"{name}: row count {sn} vs oracle {on}"
    assert sc == oc, f"{name}: columns {sc} vs {oc}"
    assert sh == oh, f"{name}: value hash mismatch over {sn} rows"
