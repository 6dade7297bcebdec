"""The extended (third) certification tier stays well-formed.

The heavy equality sweep runs once per round via
``tools/extended_gate_sweep.py`` (→ CORRECTNESS_EXTENDED_r{N}.json,
both SFs); the per-family oracle equality is ALSO asserted by each
family's own pytest module. This suite pins the tier's structure so a
rename/refactor can't silently drop a family out of the artifact:
every query has an oracle, names are x_-prefixed, and the tier never
overlaps the driver registry (which would double-certify under two
names and confuse the rotation audit).
"""

from pg_parquet_spark.operators import registry
from pg_parquet_spark.operators.extended_registry import (
    EXTENDED_QUERIES,
    extended_oracles,
)


def test_extended_tier_structure():
    oracles = extended_oracles()
    assert set(EXTENDED_QUERIES) == set(oracles)
    assert all(n.startswith("x_") for n in EXTENDED_QUERIES)
    assert all(isinstance(s, str) and s.strip() for s in oracles.values())
    assert len(EXTENDED_QUERIES) >= 25  # the VERDICT r11 #3 scope
    overlap = set(EXTENDED_QUERIES) & set(
        registry.all_queries(include_retired=True)
    )
    assert not overlap, overlap


def test_extended_tier_queries_compile(spark):
    """Every family builds a DataFrame plan at sf0.001 (no execution —
    the sweep/per-family tests own equality; this catches signature
    drift cheaply)."""
    for name, fn in EXTENDED_QUERIES.items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.columns, name
