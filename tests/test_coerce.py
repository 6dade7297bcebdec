"""Read-coercion suite (FIXTURES.md §3; reference:
src/pgrx_tests/copy_from_coerce.rs — parquet written with types different
from the target table)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql.types import StructType

from pg_parquet_spark.sources import read_parquet
from pg_parquet_spark.sources.coerce import SchemaMatchError, match_and_coerce


def _write(tmp_parquet, table: pa.Table) -> str:
    path = tmp_parquet("coerce.parquet")
    pq.write_table(table, path)
    return path


@pytest.mark.parametrize(
    "pa_type,values,ddl,expect",
    [
        (pa.int16(), [1, -2, None], "a INT", [1, -2, None]),
        (pa.int16(), [1, -2, None], "a BIGINT", [1, -2, None]),
        (pa.int32(), [7, None], "a BIGINT", [7, None]),
        (pa.float32(), [0.5, None], "a DOUBLE", [0.5, None]),
        (pa.float64(), [0.25, None], "a FLOAT", [0.25, None]),
        (pa.uint16(), [9, None], "a INT", [9, None]),
        (pa.date32(), [0, 19000], "a TIMESTAMP_NTZ", None),
    ],
)
def test_allowed_primitive_coercions(spark, tmp_parquet, pa_type, values, ddl, expect):
    # copy_from_coerce.rs:29-150
    path = _write(tmp_parquet, pa.table({"a": pa.array(values, pa_type)}))
    df = read_parquet(spark, path, StructType.fromDDL(ddl))
    assert df.schema == StructType.fromDDL(ddl)
    got = [r.a for r in df.collect()]
    if expect is not None:
        assert got == expect


def test_list_coercion_recursive(spark, tmp_parquet):
    # LIST<INT16> → ARRAY<INT>/ARRAY<BIGINT> (copy_from_coerce.rs:503)
    path = _write(
        tmp_parquet, pa.table({"a": pa.array([[1, 2], None, []], pa.list_(pa.int16()))})
    )
    for ddl in ("a ARRAY<INT>", "a ARRAY<BIGINT>"):
        df = read_parquet(spark, path, StructType.fromDDL(ddl))
        assert df.schema == StructType.fromDDL(ddl)
        assert [r.a for r in df.collect()] == [[1, 2], None, []]


def test_struct_coercion_by_name(spark, tmp_parquet):
    # STRUCT w/ same field names, castable fields → ok (:611-709)
    t = pa.table(
        {"s": pa.array([{"x": 1, "y": 2}], pa.struct({"x": pa.int16(), "y": pa.int32()}))}
    )
    path = _write(tmp_parquet, t)
    df = read_parquet(spark, path, StructType.fromDDL("s STRUCT<x:INT, y:BIGINT>"))
    row = df.collect()[0].s
    assert (row.x, row.y) == (1, 2)


def test_struct_different_field_name_errors(spark, tmp_parquet):
    # :784
    t = pa.table({"s": pa.array([{"x": 1}], pa.struct({"x": pa.int32()}))})
    path = _write(tmp_parquet, t)
    with pytest.raises(SchemaMatchError, match="type mismatch"):
        read_parquet(spark, path, StructType.fromDDL("s STRUCT<z:INT>"))


def test_struct_fewer_fields_errors(spark, tmp_parquet):
    # :758
    t = pa.table({"s": pa.array([{"x": 1}], pa.struct({"x": pa.int32()}))})
    path = _write(tmp_parquet, t)
    with pytest.raises(SchemaMatchError, match="type mismatch"):
        read_parquet(spark, path, StructType.fromDDL("s STRUCT<x:INT, y:INT>"))


def test_map_coercion(spark, tmp_parquet):
    # MAP<INT16,STRING> → MAP<INT,STRING> (:887)
    t = pa.table(
        {"m": pa.array([[(1, "a"), (2, "b")]], pa.map_(pa.int16(), pa.string()))}
    )
    path = _write(tmp_parquet, t)
    df = read_parquet(spark, path, StructType.fromDDL("m MAP<INT,STRING>"))
    assert df.collect()[0].m == {1: "a", 2: "b"}


def test_runtime_overflow_errors_not_nulls(spark, tmp_parquet):
    # BIGINT file col → INT target w/ overflowing value must ERROR (:1080)
    path = _write(tmp_parquet, pa.table({"a": pa.array([2**40], pa.int64())}))
    df = read_parquet(spark, path, StructType.fromDDL("a INT"))
    with pytest.raises(Exception, match="(?i)overflow|cast|ARITHMETIC"):
        df.collect()


def test_missing_column_errors(spark, tmp_parquet):
    # :1066
    path = _write(tmp_parquet, pa.table({"a": pa.array([1])}))
    with pytest.raises(SchemaMatchError, match='column "b" is not found'):
        read_parquet(spark, path, StructType.fromDDL("b INT"), match_by="name")


def test_position_vs_name(spark, tmp_parquet):
    # same cols, different order (:1021-1065)
    t = pa.table({"b": pa.array(["x"]), "a": pa.array([1], pa.int32())})
    path = _write(tmp_parquet, t)
    target = StructType.fromDDL("a INT, b STRING")
    # name: resolves correctly
    df = read_parquet(spark, path, target, match_by="name")
    assert (df.collect()[0].a, df.collect()[0].b) == (1, "x")
    # position: string file col vs int target col → type mismatch error
    with pytest.raises(SchemaMatchError, match="type mismatch"):
        read_parquet(spark, path, target, match_by="position")


def test_non_coercible_errors(spark, tmp_parquet):
    path = _write(tmp_parquet, pa.table({"a": pa.array(["x"])}))
    with pytest.raises(SchemaMatchError, match="type mismatch"):
        read_parquet(spark, path, StructType.fromDDL("a INT"))


def test_error_texts_match_reference_exactly(spark):
    # byte-parity with schema_parser.rs:516-521, 536, 562-565 (the
    # strings copy_from_coerce.rs #[should_panic] expectations assert)
    df2 = spark.createDataFrame([(1, "a")], "a INT, b STRING")
    with pytest.raises(SchemaMatchError) as e:
        match_and_coerce(df2, StructType.fromDDL("x BIGINT, y STRING, z INT"), "position")
    assert str(e.value) == (
        "column count mismatch between table and parquet file. "
        "parquet file has 2 columns, but table has 3 columns"
    )
    with pytest.raises(SchemaMatchError) as e:
        match_and_coerce(df2, StructType.fromDDL("name STRING"), "name")
    assert str(e.value) == 'column "name" is not found in parquet file'
    dfd = spark.createDataFrame([(1.0,)], "x DOUBLE")
    with pytest.raises(SchemaMatchError) as e:
        match_and_coerce(dfd, StructType.fromDDL("x DATE"), "position")
    assert str(e.value) == (
        'type mismatch for column "x" between table and parquet file.\n\n'
        'table has "Date32"\n\nparquet file has "Float64"'
    )
