"""Property-based round-trip: arbitrary typed values survive
write_parquet → read_parquet with strict schema (beyond the reference's
example-based suite — SURVEY.md §5 notes it has no property testing)."""

import datetime
import math
from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql.types import StructType

from pg_parquet_spark.sources import read_parquet, write_parquet

_SETTINGS = dict(
    max_examples=8,  # each example spins a Spark job — keep the loop tight
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

texts = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=80
)
doubles = st.one_of(
    st.floats(allow_nan=False, allow_infinity=True, width=64),
    st.just(float("nan")),
)
decimals = st.decimals(
    min_value=Decimal("-999999.999"), max_value=Decimal("999999.999"), places=3
)
dates = st.dates(datetime.date(1, 1, 1), datetime.date(9999, 12, 28))
rows_strategy = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(-(2**31), 2**31 - 1)),
        st.one_of(st.none(), texts),
        st.one_of(st.none(), doubles),
        st.one_of(st.none(), decimals),
        st.one_of(st.none(), dates),
        st.one_of(st.none(), st.lists(st.one_of(st.none(), st.integers(-100, 100)), max_size=5)),
    ),
    min_size=1,
    max_size=20,
)

DDL = "a INT, b STRING, c DOUBLE, d DECIMAL(9,3), e DATE, f ARRAY<INT>"


def _norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else v
    if isinstance(v, list):
        return tuple(v)
    return v


@settings(**_SETTINGS)
@given(rows=rows_strategy)
def test_roundtrip_property(spark, tmp_path_factory, rows):
    schema = StructType.fromDDL(DDL)
    df = spark.createDataFrame(rows, schema)
    path = str(tmp_path_factory.mktemp("prop") / "t.parquet")
    write_parquet(df, path)
    back = read_parquet(spark, path, schema)
    assert back.schema == schema
    got = sorted(
        (tuple(_norm(v) for v in r) for r in back.collect()),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )
    want = sorted(
        (tuple(_norm(v) for v in r) for r in df.collect()),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )
    assert got == want
