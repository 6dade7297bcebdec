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


# ---------------------------------------------------------------------------
# r6 completeness audit vs the reference's copy_from_coerce.rs enumeration.
# Case mapping (reference test :line → test here):
#
#   :29   INT16  => {int,bigint}            test_allowed_primitive_coercions
#   :57   INT32  => {bigint}                test_allowed_primitive_coercions
#   :80   FLOAT32 => {double}               test_allowed_primitive_coercions
#   :103  FLOAT64 => {real} (lossy)         test_allowed_primitive_coercions
#   :126  DATE32 => {timestamp}             test_allowed_primitive_coercions
#   :151  TIMESTAMP => {timestamptz}        test_timestamp_tz_coercions
#   :182  TIMESTAMPTZ => {timestamp}        test_timestamp_tz_coercions
#   :215  TIME64 => {timetz}, :243 => {time} — n/a: Spark has no TIME type;
#         reference-written TIME_MICROS columns read as raw µs longs via the
#         schema fallback (SURVEY §1.2 policy), test_time64_reads_as_micros
#   :275  UINT16 => {smallint,int,bigint}   test_unsigned_and_int8_widths
#   :303  UINT32 => {int,bigint}            test_unsigned_and_int8_widths
#   :328  UINT64 => {bigint}                test_unsigned_and_int8_widths
#   :351  INT8   => {bigint}                test_unsigned_and_int8_widths
#   :373  BOOLEAN => {int}                  test_bool_int_coercions
#   :395  DECIMAL128(8,5) => {float8}       test_decimal_to_float
#   :425  Binary => {text}                  test_binary_to_text
#   :447  LargeUtf8 => {text}, :474 LargeBinary => {bytea} — n/a by
#         construction: parquet has no LARGE physical distinction, Spark
#         reads them as string/binary directly (test_large_types_read)
#   :503  [UINT16] => {int[],bigint[]}      test_list_coercion_recursive
#   :557  LargeList => {int[],bigint[]}     test_large_list_coercion
#   :611  STRUCT{a,b} uint16 => {int,bigint} test_struct_coercion_by_name
#   :648  [STRUCT] => composite[]           test_list_of_struct_coercion
#   :710  not-castable list of struct       test_struct_not_castable_field_errors
#   :758  struct fewer fields               test_struct_fewer_fields_errors
#   :784  struct different field name       test_struct_different_field_name_errors
#   :817  struct not-castable field type    test_struct_not_castable_field_errors
#   :849  deep nested type mismatch         test_struct_different_field_name_errors
#   :887  MAP key/val coercion              test_map_coercion
#   :947  list of map                       test_list_of_map_coercion
#   :1021 match-by-name different order     test_position_vs_name
#   :1037 match-by-position different names test_position_vs_name
#   :1052 column count mismatch             test_error_texts_match_reference_exactly
#   :1066 missing column by name            test_missing_column_errors
#   :1080 runtime cast failure (no NULLs)   test_runtime_overflow_errors_not_nulls


def test_timestamp_tz_coercions(spark, tmp_parquet):
    # TIMESTAMP(µs,None) => timestamptz (:151); TIMESTAMPTZ => timestamp (:182)
    import datetime

    ts = datetime.datetime(2022, 5, 5, 12, 0, 0)
    path = _write(
        tmp_parquet, pa.table({"a": pa.array([ts], pa.timestamp("us"))})
    )
    df = read_parquet(spark, path, StructType.fromDDL("a TIMESTAMP"))
    assert df.schema == StructType.fromDDL("a TIMESTAMP")
    assert df.count() == 1

    path2 = _write(
        tmp_parquet,
        pa.table({"a": pa.array([ts], pa.timestamp("us", tz="Europe/Paris"))}),
    )
    df2 = read_parquet(spark, path2, StructType.fromDDL("a TIMESTAMP_NTZ"))
    assert df2.schema == StructType.fromDDL("a TIMESTAMP_NTZ")
    assert df2.count() == 1


def test_unsigned_and_int8_widths(spark, tmp_parquet):
    # UINT16/UINT32/UINT64/INT8 widen into the signed SQL widths
    # (:275-371); Spark reads uint64 as DECIMAL(20,0) — still a numeric
    # cell of the matrix, strict on overflow
    t = pa.table(
        {
            "u16": pa.array([1], pa.uint16()),
            "u32": pa.array([2], pa.uint32()),
            "u64": pa.array([3], pa.uint64()),
            "i8": pa.array([4], pa.int8()),
        }
    )
    path = _write(tmp_parquet, t)
    ddl = "u16 SMALLINT, u32 INT, u64 BIGINT, i8 BIGINT"
    df = read_parquet(spark, path, StructType.fromDDL(ddl))
    assert df.schema == StructType.fromDDL(ddl)
    r = df.collect()[0]
    assert (r.u16, r.u32, r.u64, r.i8) == (1, 2, 3, 4)


def test_bool_int_coercions(spark, tmp_parquet):
    # BOOLEAN => {int} (:373) — PG's only bool↔numeric explicit cast
    # pair is bool↔int4, so int2/int8 targets stay type-mismatch errors
    path = _write(tmp_parquet, pa.table({"a": pa.array([True, False, None])}))
    df = read_parquet(spark, path, StructType.fromDDL("a INT"))
    assert [r.a for r in df.collect()] == [1, 0, None]
    for bad in ("a SMALLINT", "a BIGINT"):
        with pytest.raises(SchemaMatchError, match="type mismatch"):
            read_parquet(spark, path, StructType.fromDDL(bad))


def test_decimal_to_float(spark, tmp_parquet):
    # DECIMAL128(8,5) => {float8} (:395)
    import decimal

    path = _write(
        tmp_parquet,
        pa.table({"a": pa.array([decimal.Decimal("123.45000")], pa.decimal128(8, 5))}),
    )
    df = read_parquet(spark, path, StructType.fromDDL("a DOUBLE"))
    assert df.collect()[0].a == 123.45


def test_binary_to_text(spark, tmp_parquet):
    # Binary => {text} (:425) — bytes reinterpreted as utf8, PG parity
    path = _write(tmp_parquet, pa.table({"a": pa.array([b"abc"], pa.binary())}))
    df = read_parquet(spark, path, StructType.fromDDL("a STRING"))
    assert df.collect()[0].a == "abc"


def test_large_types_read(spark, tmp_parquet):
    # LargeUtf8 => {text} (:447), LargeBinary => {bytea} (:474): parquet
    # stores no LARGE distinction, so these are plain string/binary reads
    t = pa.table(
        {
            "s": pa.array(["test"], pa.large_string()),
            "b": pa.array([b"abc"], pa.large_binary()),
        }
    )
    path = _write(tmp_parquet, t)
    df = read_parquet(spark, path, StructType.fromDDL("s STRING, b BINARY"))
    r = df.collect()[0]
    assert (r.s, bytes(r.b)) == ("test", b"abc")


def test_large_list_coercion(spark, tmp_parquet):
    # LargeList<UINT16> => {int[], bigint[]} (:557)
    t = pa.table(
        {"a": pa.array([[1, 2]], pa.large_list(pa.uint16()))}
    )
    path = _write(tmp_parquet, t)
    for ddl in ("a ARRAY<INT>", "a ARRAY<BIGINT>"):
        df = read_parquet(spark, path, StructType.fromDDL(ddl))
        assert df.schema == StructType.fromDDL(ddl)
        assert [r.a for r in df.collect()] == [[1, 2]]


def test_list_of_struct_coercion(spark, tmp_parquet):
    # [STRUCT{a:uint16,b:uint16}] => {a:int,b:bigint}[] (:648)
    inner = pa.struct({"a": pa.uint16(), "b": pa.uint16()})
    t = pa.table({"x": pa.array([[{"a": 1, "b": 2}]], pa.list_(inner))})
    path = _write(tmp_parquet, t)
    ddl = "x ARRAY<STRUCT<a:INT, b:BIGINT>>"
    df = read_parquet(spark, path, StructType.fromDDL(ddl))
    assert df.schema == StructType.fromDDL(ddl)
    row = df.collect()[0].x[0]
    assert (row.a, row.b) == (1, 2)


def test_list_of_map_coercion(spark, tmp_parquet):
    # [MAP<INT16,STRING>] => map[] with widened key (:947)
    t = pa.table(
        {
            "x": pa.array(
                [[[(1, "a")], [(2, "b")]]],
                pa.list_(pa.map_(pa.int16(), pa.string())),
            )
        }
    )
    path = _write(tmp_parquet, t)
    ddl = "x ARRAY<MAP<INT,STRING>>"
    df = read_parquet(spark, path, StructType.fromDDL(ddl))
    assert df.schema == StructType.fromDDL(ddl)
    assert df.collect()[0].x == [{1: "a"}, {2: "b"}]


def test_struct_not_castable_field_errors(spark, tmp_parquet):
    # STRUCT{b:boolean} => {b:date} must fail (:817); same shape inside a
    # list covers :710
    inner = pa.struct({"a": pa.uint16(), "b": pa.bool_()})
    t = pa.table({"x": pa.array([{"a": 1, "b": False}], inner)})
    path = _write(tmp_parquet, t)
    with pytest.raises(SchemaMatchError, match="type mismatch"):
        read_parquet(spark, path, StructType.fromDDL("x STRUCT<a:INT, b:DATE>"))
    t2 = pa.table({"x": pa.array([[{"a": 1, "b": False}]], pa.list_(inner))})
    path2 = _write(tmp_parquet, t2)
    with pytest.raises(SchemaMatchError, match="type mismatch"):
        read_parquet(
            spark, path2, StructType.fromDDL("x ARRAY<STRUCT<a:INT, b:DATE>>")
        )


def test_time64_reads_as_micros(spark, tmp_parquet):
    # TIME64 columns (reference PG time/timetz, schema_parser.rs:393-406)
    # read as raw µs longs via the schema fallback — Spark has no TIME
    # type (PARQUET_TYPE_ILLEGAL from the native converter)
    path = _write(
        tmp_parquet,
        pa.table({"t": pa.array([46800000000], pa.time64("us"))}),
    )
    df = read_parquet(spark, path)
    assert [r.t for r in df.collect()] == [46800000000]
    assert dict(df.dtypes)["t"] == "bigint"


def test_schema_drift_report_classifies_every_case():
    """r11 ingest guard: ok / coercible (PG allowlist) / incompatible /
    missing / new, across the union of both schemas."""
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from pg_parquet_spark.sources.coerce import schema_drift_report

    target = StructType(
        [
            StructField("id", LongType()),
            StructField("qty", IntegerType()),
            StructField("note", StringType()),
            StructField("tags", ArrayType(StringType())),
            StructField("gone", DoubleType()),
        ]
    )
    incoming = StructType(
        [
            StructField("id", LongType()),            # ok
            StructField("qty", DoubleType()),         # coercible (num->num)
            StructField("note", ArrayType(LongType())),  # incompatible
            StructField("tags", ArrayType(StringType())),  # ok
            StructField("extra", StringType()),       # new
        ]                                             # gone -> missing
    )
    rep = {r["column"]: r["status"] for r in schema_drift_report(incoming, target)}
    assert rep == {
        "id": "ok",
        "qty": "coercible",
        "note": "incompatible",
        "tags": "ok",
        "extra": "new",
        "gone": "missing",
    }
    detail = {r["column"]: r for r in schema_drift_report(incoming, target)}
    assert detail["gone"]["incoming_type"] is None
    assert detail["extra"]["target_type"] is None
    assert detail["qty"]["incoming_type"] == "double"
