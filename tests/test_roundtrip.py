"""Type round-trip suite (FIXTURES.md §1; reference:
src/pgrx_tests/copy_type_roundtrip.rs pattern — insert known values incl.
NULLs → write parquet → read back with strict schema → equality)."""

import datetime
import math
from decimal import Decimal

import pytest
from pyspark.sql import Row
from pyspark.sql.types import StructType

from pg_parquet_spark.sources import read_parquet, write_parquet


def _roundtrip(spark, tmp_parquet, ddl, rows, match_by="position"):
    schema = StructType.fromDDL(ddl)
    df = spark.createDataFrame(rows, schema)
    path = tmp_parquet()
    write_parquet(df, path)
    back = read_parquet(spark, path, schema, match_by=match_by)
    assert back.schema == schema
    got = sorted(
        [tuple(r) for r in back.collect()],
        key=lambda t: tuple((v is None, str(v)) for v in t),
    )
    want = sorted(
        [tuple(r) for r in df.collect()],
        key=lambda t: tuple((v is None, str(v)) for v in t),
    )
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert _eq(g, w), f"{g} != {w}"
    return back


def _eq(a, b):
    if isinstance(a, tuple) and isinstance(b, tuple):
        return all(_eq(x, y) for x, y in zip(a, b))
    if isinstance(a, float) and isinstance(b, float):
        return (math.isnan(a) and math.isnan(b)) or a == b
    return a == b


@pytest.mark.parametrize(
    "ddl,values",
    [
        ("a SMALLINT", [(-32768,), (0,), (32767,), (None,)]),
        ("a INT", [(-2147483648,), (42,), (None,)]),
        ("a BIGINT", [(-9223372036854775808,), (1,), (None,)]),
        ("a BOOLEAN", [(True,), (False,), (None,)]),
        ("a STRING", [("hello",), ("",), ("üñïçödé",), (None,)]),
        ("a BINARY", [(bytearray(b"\xde\xad\xbe\xef"),), (bytearray(b""),), (None,)]),
        ("a DATE", [(datetime.date(2022, 5, 1),), (datetime.date(1970, 1, 1),), (None,)]),
        (
            "a TIMESTAMP_NTZ",
            [(datetime.datetime(2022, 5, 1, 12, 0, 0),), (None,)],
        ),
        ("a DECIMAL(5,2)", [(Decimal("123.45"),), (Decimal("-0.01"),), (None,)]),
        ("a DECIMAL(15,4)", [(Decimal("12345678901.2345"),), (None,)]),
        (
            "a DECIMAL(38,9)",
            [(Decimal("12345678901234567890123456789.123456789"),), (None,)],
        ),
        # float4/float8 scalars (reference test_float4/test_float8;
        # NaN/Inf specials live in test_float_special_values)
        ("a FLOAT", [(1.5,), (-0.0,), (None,)]),
        ("a DOUBLE", [(2.5e300,), (1e-300,), (None,)]),
        ("a ARRAY<INT>", [([1, 2, None],), (None,), ([],)]),
        ("a ARRAY<STRING>", [(["x", None, ""],), ([],), (None,)]),
        # element-typed arrays mirroring the reference's *_array suite
        ("a ARRAY<BIGINT>", [([9223372036854775807, None],), ([],)]),
        ("a ARRAY<BOOLEAN>", [([True, None, False],), (None,)]),
        ("a ARRAY<DOUBLE>", [([1.5, None, -2.25],), ([],)]),
        (
            "a ARRAY<DATE>",
            [([datetime.date(2022, 5, 1), None],), (None,)],
        ),
        (
            "a ARRAY<TIMESTAMP_NTZ>",
            [([datetime.datetime(2022, 5, 1, 12, 0, 0), None],), ([],)],
        ),
        (
            "a ARRAY<DECIMAL(5,2)>",
            [([Decimal("123.45"), None],), ([],), (None,)],
        ),
        (
            "a ARRAY<BINARY>",
            [([bytearray(b"\x01"), None],), (None,)],
        ),
        # nested collections (test_map_array / nested-list parity)
        ("a ARRAY<ARRAY<INT>>", [([[1, None], [], None],), (None,)]),
        (
            "a ARRAY<MAP<INT,STRING>>",
            [([{1: "a"}, None, {}],), (None,)],
        ),
        (
            "a ARRAY<STRUCT<x:INT, s:STRING>>",
            [([Row(x=1, s="a"), None, Row(x=None, s=None)],), (None,)],
        ),
        ("a MAP<INT,STRING>", [({1: "a", 2: None},), (None,), ({},)]),
        # map with non-string keys + null values (test_map_null_entries;
        # Spark forbids null KEYS, matching crunchy_map's key NOT NULL)
        (
            "a MAP<STRING,ARRAY<INT>>",
            [({"k": [1, None], "e": []},), (None,)],
        ),
        (
            "a STRUCT<name:STRING, age:INT>",
            [(Row(name="Alice", age=3),), (Row(name=None, age=None),), (None,)],
        ),
    ],
)
def test_scalar_roundtrip(spark, tmp_parquet, ddl, values):
    _roundtrip(spark, tmp_parquet, ddl, values)


def test_float_special_values(spark, tmp_parquet):
    # NaN/±Inf asserted specially (common.rs:276-316)
    rows = [(1.123,), (float("nan"),), (float("inf"),), (float("-inf"),), (None,)]
    _roundtrip(spark, tmp_parquet, "a DOUBLE", rows)
    _roundtrip(spark, tmp_parquet, "a FLOAT", [(0.5,), (float("nan"),), (None,)])


def test_timestamptz_roundtrip(spark, tmp_parquet):
    # timestamptz → Timestamp(µs, UTC) (schema_parser.rs:385-392)
    rows = [(datetime.datetime(2022, 5, 1, 12, 0, 0),), (None,)]
    _roundtrip(spark, tmp_parquet, "a TIMESTAMP", rows)


def test_nested_dog_owners(spark, tmp_parquet):
    # deep nesting fixture (copy_type_roundtrip.rs:1183-1304)
    ddl = (
        "owner STRUCT<name:STRING, dogs:ARRAY<STRUCT<name:STRING, age:INT>>, "
        "lucky_numbers:ARRAY<INT>>"
    )
    rows = [
        (Row(name="Alice", dogs=[Row(name="Buddy", age=2), Row(name="Charlie", age=3)], lucky_numbers=[1, 2, 3]),),
        (Row(name="Cathie", dogs=[], lucky_numbers=[4, 5, 6]),),
        (Row(name="Cathy", dogs=None, lucky_numbers=None),),
        (None,),
    ]
    _roundtrip(spark, tmp_parquet, ddl, rows)


def test_match_by_name_roundtrip(spark, tmp_parquet):
    schema = StructType.fromDDL("a INT, b STRING")
    df = spark.createDataFrame([(1, "x"), (2, "y")], schema)
    path = tmp_parquet()
    write_parquet(df, path)
    # target with reordered columns — name matching resolves
    target = StructType.fromDDL("b STRING, a INT")
    back = read_parquet(spark, path, target, match_by="name")
    assert back.columns == ["b", "a"]
    assert sorted((r.a, r.b) for r in back.collect()) == [(1, "x"), (2, "y")]


def test_interval_fallback_to_text(spark, tmp_parquet):
    # interval has no parquet mapping → text (copy_type_roundtrip.rs:663-675)
    df = spark.sql(
        "SELECT INTERVAL '5' DAY AS a UNION ALL SELECT INTERVAL '10' DAY"
    )
    path = tmp_parquet()
    write_parquet(df, path)
    back = read_parquet(spark, path)
    assert dict(back.dtypes)["a"] == "string"
    assert sorted(r.a for r in back.collect()) == ["INTERVAL '10' DAY", "INTERVAL '5' DAY"]
