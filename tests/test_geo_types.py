"""GeoParquet (A29) + numeric/type policy (§1.2) tests."""

import json
from decimal import Decimal

import pytest
from pyspark.sql import functions as F
from pg_parquet_spark.functions.geo import (
    geo_metadata,
    wkb_geometry_type,
    wkb_point,
    wkb_type_expr,
    write_geoparquet,
)
from pg_parquet_spark.functions.metadata import parquet_kv_metadata
from pg_parquet_spark.functions.types import (
    decimal_guard,
    time_to_micros,
    unbounded_numeric_type,
    uuid_canonical,
)
from pg_parquet_spark.sources import read_parquet


def test_wkb_point_header():
    blob = wkb_point(1.5, -2.5)
    assert wkb_geometry_type(blob) == "Point"


def test_geoparquet_write_and_metadata(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, bytearray(wkb_point(0.0, 0.0))), (2, bytearray(wkb_point(3.0, 4.0))), (3, None)],
        "id INT, geom BINARY",
    )
    path = str(tmp_path / "geo.parquet")
    write_geoparquet(df, path, {"geom": ["Point"]})
    rows = parquet_kv_metadata(spark, path).collect()
    geo = [bytes(r.value) for r in rows if bytes(r.key) == b"geo"]
    assert geo, "geo footer metadata missing"
    meta = json.loads(geo[0])
    # GeoParquet 1.1 structure (geometry.rs:151-165)
    assert meta["version"] == "1.1.0"
    assert meta["primary_column"] == "geom"
    assert meta["columns"]["geom"]["encoding"] == "WKB"
    assert meta["columns"]["geom"]["geometry_types"] == ["Point"]
    # WKB round-trips as binary
    back = read_parquet(spark, path)
    got = {r.id: bytes(r.geom) if r.geom else None for r in back.collect()}
    assert wkb_geometry_type(got[2]) == "Point"
    assert got[3] is None


def test_wkb_type_expr_jvm_side(spark):
    df = spark.createDataFrame(
        [(1, bytearray(wkb_point(1.0, 2.0)))], "id INT, geom BINARY"
    )
    out = df.select(wkb_type_expr("geom").alias("gtype")).collect()
    assert out[0].gtype == "Point"


def test_geoparquet_rejects_non_binary(spark, tmp_path):
    df = spark.createDataFrame([(1, "not wkb")], "id INT, geom STRING")
    with pytest.raises(ValueError, match="must be WKB binary"):
        write_geoparquet(df, str(tmp_path / "g.parquet"), ["geom"])


def test_geo_metadata_requires_columns():
    with pytest.raises(ValueError, match="at least one"):
        geo_metadata({})


# --- numeric / type policies (pg_arrow_type_conversions.rs parity) ---


def test_unbounded_numeric_default():
    # numeric without typmod → Decimal128(38,9) (:296-300)
    assert unbounded_numeric_type().precision == 38
    assert unbounded_numeric_type().scale == 9


def test_decimal_guard_passes_valid(spark):
    df = spark.createDataFrame([("123.456789",), (None,)], "a STRING")
    out = df.select(decimal_guard(F.col("a")).alias("d")).collect()
    assert out[0].d == Decimal("123.456789000")


def test_decimal_guard_rejects_excess_integral_digits(spark):
    # ≥30 integral digits must error (:252-294)
    big = "9" * 30 + ".5"
    df = spark.createDataFrame([(big,)], "a STRING")
    with pytest.raises(Exception, match="(?i)overflow|out of range|cannot be represented"):
        df.select(decimal_guard(F.col("a")).alias("d")).collect()


def test_decimal_nan_inf_rejected(spark):
    # NaN/Inf can't enter numeric (error_if_special_numeric, :178-190)
    from pg_parquet_spark.functions.types import to_numeric

    for bad in (float("nan"), float("inf"), float("-inf")):
        df = spark.createDataFrame([(bad,)], "a DOUBLE")
        with pytest.raises(Exception, match="(?i)nan or infinity"):
            df.select(to_numeric(F.col("a")).alias("d")).collect()
    ok = spark.createDataFrame([(1.5,), (None,)], "a DOUBLE")
    vals = [r.d for r in ok.select(to_numeric(F.col("a")).alias("d")).collect()]
    assert vals[0] == Decimal("1.500000000") and vals[1] is None


def test_uuid_canonical(spark):
    df = spark.createDataFrame([("550E8400-E29B-41D4-A716-446655440000",)], "u STRING")
    out = df.select(uuid_canonical(F.col("u")).alias("u")).collect()
    assert out[0].u == "550e8400-e29b-41d4-a716-446655440000"


def test_time_to_micros(spark):
    # PG time → µs since midnight (schema_parser.rs:393-397)
    df = spark.createDataFrame([("2024-01-01 15:05:21.5",)], "t STRING")
    out = df.select(time_to_micros(F.col("t")).alias("us")).collect()
    assert out[0].us == ((15 * 3600 + 5 * 60 + 21) * 1_000_000 + 500_000)
