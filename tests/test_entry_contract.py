"""Driver-contract guards: entry smoke, registry consistency, every
oracle parses and runs in DuckDB, empty-relation round trips."""

import duckdb
import pytest
from pyspark.sql.types import StructType

import __spark_entry__ as entry_mod
from pg_parquet_spark.sources import read_parquet, write_parquet

SF = "/root/testdata/sf0.001"


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert "sum_qty" in df.columns


def test_registry_consistency():
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(queries) >= 70
    # every oracle key has a query
    missing = set(oracles) - set(queries)
    assert not missing, f"oracles without queries: {missing}"
    # r3: every registry query carries an oracle — the last two rows-only
    # entries gained hard verification (IVF via frozen literal centroids
    # replicated in SQL; the fake decoder via a DuckDB sha256 replica)
    rows_only = set(queries) - set(oracles)
    assert rows_only == set(), f"rows-only queries remain: {rows_only}"


def test_all_oracles_parse_in_duckdb():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    for name, sql in entry_mod.oracle_sql().items():
        try:
            con.execute(f"SELECT * FROM ({sql}) LIMIT 1").fetchall()
        except Exception as e:  # noqa: BLE001
            pytest.fail(f"oracle for {name} failed in DuckDB: {e}")


def test_empty_relation_roundtrip(spark, tmp_path):
    schema = StructType.fromDDL("a INT, b STRING")
    df = spark.createDataFrame([], schema)
    path = str(tmp_path / "empty.parquet")
    write_parquet(df, path)
    back = read_parquet(spark, path, schema)
    assert back.count() == 0
    assert back.schema == schema


def test_empty_after_filter_write(spark, tmp_path):
    from pg_parquet_spark.session import table

    region = table(spark, SF, "region").filter("r_regionkey < 0")
    path = str(tmp_path / "none.parquet")
    write_parquet(region, path)
    assert read_parquet(spark, path).count() == 0
