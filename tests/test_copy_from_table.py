"""COPY <table> FROM end-to-end (reference copy_from.rs + NOT-NULL
enforcement copy_pg_rules.rs:79): load → coerce → guard → insertInto."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pg_parquet_spark.sources.reader import copy_from, copy_from_into


@pytest.fixture()
def source_file(tmp_path):
    p = str(tmp_path / "src.parquet")
    pq.write_table(
        pa.table(
            {
                "a": pa.array([1, 2, 3], pa.int64()),
                "b": pa.array(["x", "y", "z"]),
            }
        ),
        p,
    )
    return p


def test_copy_from_into_appends(spark, source_file, tmp_path):
    spark.sql("DROP TABLE IF EXISTS pgpq_copy_target")
    spark.sql(
        "CREATE TABLE pgpq_copy_target (a BIGINT, b STRING) USING parquet "
        f"LOCATION '{tmp_path}/copy_target'"
    )
    try:
        out = copy_from_into(spark, source_file, "pgpq_copy_target")
        assert out.count() == 3
        # COPY appends — a second load doubles the rows
        out = copy_from_into(spark, source_file, "pgpq_copy_target")
        assert out.count() == 6
        assert sorted(r.a for r in out.collect()) == [1, 1, 2, 2, 3, 3]
    finally:
        spark.sql("DROP TABLE IF EXISTS pgpq_copy_target")


def test_copy_from_not_null_violation_errors(spark, tmp_path):
    src = str(tmp_path / "nulls.parquet")
    pq.write_table(
        pa.table({"a": pa.array([1, None], pa.int64()), "b": pa.array(["x", "y"])}), src
    )
    spark.sql("DROP TABLE IF EXISTS pgpq_copy_nn")
    spark.sql(
        "CREATE TABLE pgpq_copy_nn (a BIGINT NOT NULL, b STRING) USING parquet "
        f"LOCATION '{tmp_path}/copy_nn'"
    )
    try:
        # the v1 parquet catalog drops NOT NULL metadata, so the COPY
        # surface takes the constraint explicitly (reference parity:
        # copy_pg_rules.rs enforces the catalog's constraint list)
        with pytest.raises(Exception, match="not-null constraint"):
            copy_from(spark, src, "pgpq_copy_nn", not_null=["a"]).collect()
        # clean rows under the same guard load fine
        ok = str(tmp_path.parent / f"{tmp_path.name}_ok.parquet")
        pq.write_table(
            pa.table({"a": pa.array([5, 6], pa.int64()), "b": pa.array(["u", "v"])}),
            ok,
        )
        assert copy_from(spark, ok, "pgpq_copy_nn", not_null=["a"]).count() == 2
    finally:
        spark.sql("DROP TABLE IF EXISTS pgpq_copy_nn")


def test_copy_from_coerces_to_table_schema(spark, tmp_path):
    # file has INT32 where the table declares BIGINT → read-side coercion
    src = str(tmp_path / "narrow.parquet")
    pq.write_table(
        pa.table({"a": pa.array([7, 8], pa.int32()), "b": pa.array(["p", "q"])}), src
    )
    spark.sql("DROP TABLE IF EXISTS pgpq_copy_coerce")
    spark.sql(
        "CREATE TABLE pgpq_copy_coerce (a BIGINT, b STRING) USING parquet "
        f"LOCATION '{tmp_path}/copy_coerce'"
    )
    try:
        out = copy_from_into(spark, src, "pgpq_copy_coerce")
        assert dict(out.dtypes)["a"] == "bigint"
        assert sorted(r.a for r in out.collect()) == [7, 8]
    finally:
        spark.sql("DROP TABLE IF EXISTS pgpq_copy_coerce")


def test_copy_from_into_column_subset_fills_nulls(spark, tmp_path):
    # COPY table (col list) FROM fills unlisted columns with NULL
    # (copy_utils.rs:616-682); ADVICE r2: this raised an arity error
    src = str(tmp_path / "subset.parquet")
    pq.write_table(pa.table({"a": pa.array([1, 2], pa.int64())}), src)
    spark.sql("DROP TABLE IF EXISTS pgpq_copy_subset")
    spark.sql(
        "CREATE TABLE pgpq_copy_subset (a BIGINT, b STRING) USING parquet "
        f"LOCATION '{tmp_path}/copy_subset'"
    )
    try:
        out = copy_from_into(spark, src, "pgpq_copy_subset", columns=["a"], match_by="name")
        rows = sorted(out.collect(), key=lambda r: r.a)
        assert [r.a for r in rows] == [1, 2]
        assert all(r.b is None for r in rows)
    finally:
        spark.sql("DROP TABLE IF EXISTS pgpq_copy_subset")


def test_duplicate_column_in_list_rejected(spark):
    """copy_pg_rules.rs:229 parity: a duplicate attribute in the COPY
    column list errors with the reference's message."""
    import pytest

    from pg_parquet_spark.sources import read_parquet

    with pytest.raises(ValueError, match='duplicate attribute "o_orderkey"'):
        read_parquet(
            spark,
            "/root/testdata/sf0.001/orders.parquet",
            columns=["o_orderkey", "o_orderkey"],
        )
