"""Golden tests for the six parquet.* metadata functions (SURVEY.md
A16-A21; reference: src/pgrx_tests/udfs.rs)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pg_parquet_spark.functions import (
    parquet_column_stats,
    parquet_file_metadata,
    parquet_kv_metadata,
    parquet_list,
    parquet_metadata,
    parquet_schema,
)
from pg_parquet_spark.sources import write_parquet


@pytest.fixture()
def sample(spark, tmp_path):
    """Two row groups to prove cross-group aggregation (stats.rs:96-165)."""
    path = str(tmp_path / "sample.parquet")
    t = pa.table(
        {
            "id": pa.array(range(100), pa.int64()),
            "name": pa.array([f"n{i}" for i in range(100)]),
            "val": pa.array([float(i) for i in range(100)]),
        }
    )
    pq.write_table(t, path, row_group_size=50)
    return path


def test_file_metadata(spark, sample):
    rows = parquet_file_metadata(spark, sample).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.num_rows == 100
    assert r.num_row_groups == 2
    assert r.uri == sample
    assert r.format_version in ("1.0", "2.4", "2.6")


def test_metadata_per_chunk(spark, sample):
    df = parquet_metadata(spark, sample)
    rows = df.collect()
    assert len(rows) == 2 * 3  # 2 row groups × 3 columns
    assert {r.row_group_id for r in rows} == {0, 1}
    assert {r.path_in_schema for r in rows} == {"id", "name", "val"}
    byrg = {r.row_group_id for r in rows if r.row_group_num_rows == 50}
    assert byrg == {0, 1}
    assert all(r.compression for r in rows)
    assert all(r.total_compressed_size > 0 for r in rows)


def test_column_stats_cross_row_group_fold(spark, sample):
    rows = {r.column_id: r for r in parquet_column_stats(spark, sample).collect()}
    # min of mins / max of maxes across both groups (stats.rs:118-164)
    assert rows[0].stats_min == "0" and rows[0].stats_max == "99"
    # parquet writers may widen float zero to -0.0 in stats (spec-allowed)
    assert float(rows[2].stats_min) == 0.0 and float(rows[2].stats_max) == 99.0
    assert rows[0].stats_null_count == 0


def test_schema_walk(spark, sample):
    rows = parquet_schema(spark, sample).collect()
    names = [r.name for r in rows]
    assert names[0] == "arrow_schema"  # root
    assert set(names[1:]) == {"id", "name", "val"}
    by = {r.name: r for r in rows[1:]}
    assert by["id"].type_name == "INT64"
    assert by["val"].type_name == "DOUBLE"
    assert by["name"].type_name == "BYTE_ARRAY"
    assert by["name"].logical_type and "String" in by["name"].logical_type


def test_schema_nested_groups(spark, tmp_path):
    path = str(tmp_path / "nested.parquet")
    t = pa.table(
        {
            "s": pa.array([{"x": 1, "ys": [1, 2]}], pa.struct({"x": pa.int32(), "ys": pa.list_(pa.int64())})),
            "m": pa.array([[(1, "a")]], pa.map_(pa.int32(), pa.string())),
        }
    )
    pq.write_table(t, path)
    rows = parquet_schema(spark, path).collect()
    names = [r.name for r in rows]
    # group rows present with converted types
    assert "s" in names and "ys" in names and "m" in names
    by = {r.name: r for r in rows}
    assert by["s"].num_children == 2
    assert by["ys"].converted_type == "LIST"
    assert by["m"].converted_type == "MAP"
    assert by["key_value"].num_children == 2


def test_kv_metadata(spark, tmp_path):
    from pg_parquet_spark.session import table as load

    df = load(spark, "/root/testdata/sf0.001", "region")
    path = str(tmp_path / "kv.parquet")
    write_parquet(df, path, kv_metadata={"geo": '{"version":"1.1.0"}'})
    rows = parquet_kv_metadata(spark, path).collect()
    keys = {bytes(r.key).decode() for r in rows}
    assert "geo" in keys
    geo = [bytes(r.value).decode() for r in rows if bytes(r.key) == b"geo"][0]
    assert "1.1.0" in geo


def test_list_glob(spark, tmp_path):
    for i in range(3):
        pq.write_table(pa.table({"a": pa.array([i])}), str(tmp_path / f"f{i}.parquet"))
    rows = parquet_list(spark, str(tmp_path / "*.parquet")).collect()
    assert len(rows) == 3
    assert all(r.size > 0 for r in rows)
    # directory form
    rows2 = parquet_list(spark, str(tmp_path)).collect()
    assert len(rows2) == 3


def test_list_http_unsupported(spark):
    with pytest.raises(ValueError, match="http"):
        parquet_list(spark, "https://example.com/*.parquet")


def test_metadata_cross_validated_against_duckdb(spark, tmp_path):
    """Independent-oracle parity for A17: every comparable field of
    `parquet.metadata` (row-group structure, per-chunk value counts,
    offsets, sizes, compression) must agree with DuckDB's own
    parquet_metadata() on a multi-row-group file OUR writer produced —
    two unrelated footer readers reaching identical answers."""
    import duckdb

    from pg_parquet_spark.session import table

    li = table(spark, "/root/testdata/sf0.001", "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity"
    )
    path = str(tmp_path / "meta_cross.parquet")
    write_parquet(li, path, compression="zstd", row_group_size=2000)

    ours = {
        (r.row_group_id, r.path_in_schema): r
        for r in parquet_metadata(spark, path).collect()
    }
    con = duckdb.connect()
    theirs = con.execute(
        "SELECT row_group_id, path_in_schema, row_group_num_rows,"
        "       row_group_num_columns, num_values, file_offset,"
        "       data_page_offset, total_compressed_size,"
        "       total_uncompressed_size, compression "
        f"FROM parquet_metadata('{path}')"
    ).fetchall()
    assert len(theirs) == len(ours) > 3  # multi row group × 3 columns
    for (
        rg, col, rg_rows, rg_cols, nvals, foff, dpoff, csize, usize, comp
    ) in theirs:
        r = ours[(rg, col)]
        assert r.row_group_num_rows == rg_rows
        assert r.row_group_num_columns == rg_cols
        assert r.num_values == nvals
        assert r.data_page_offset == dpoff
        assert r.total_compressed_size == csize
        assert r.total_uncompressed_size == usize
        assert r.compression.upper() == comp.upper()


def test_kv_metadata_cross_validated_against_duckdb(spark, tmp_path):
    """Independent-oracle parity for A19: the key/value footer pairs we
    report equal DuckDB's parquet_kv_metadata() byte-for-byte on a file
    our writer produced with custom kv metadata (geo path)."""
    import duckdb

    from pg_parquet_spark.functions.geo import write_geoparquet
    from pg_parquet_spark.functions.metadata import parquet_kv_metadata
    from pyspark.sql import functions as F

    pts = spark.createDataFrame(
        [(1, bytes.fromhex("0101000000000000000000f03f0000000000000040"))],
        "id BIGINT, geom BINARY",
    )
    path = str(tmp_path / "kv_cross.parquet")
    write_geoparquet(pts, path, geometry_columns=["geom"])

    ours = {
        bytes(r.key): bytes(r.value)
        for r in parquet_kv_metadata(spark, path).collect()
    }
    con = duckdb.connect()
    theirs = {
        bytes(k): bytes(v)
        for _f, k, v in con.execute(
            f"SELECT * FROM parquet_kv_metadata('{path}')"
        ).fetchall()
    }
    # both must see the geo key with identical bytes; pyarrow may add
    # its own ARROW:schema entry on one side only — compare the
    # intersection-of-keys on equality and require geo present
    assert b"geo" in ours and b"geo" in theirs
    for k in ours.keys() & theirs.keys():
        assert ours[k] == theirs[k], k


def test_schema_drift_matches_duckdb_oracle(spark):
    """r14: the footer-level schema-drift report replicates DuckDB's
    parquet_metadata() FULL JOIN bit-for-bit, including the nested-path
    spelling normalization (embedding.list.element)."""
    import duckdb

    from pg_parquet_spark.functions import schema_drift
    from pg_parquet_spark.functions.metadata import schema_drift_oracle_sql

    sf = "/root/testdata/sf0.001"
    a, b = f"{sf}/events.parquet", f"{sf}/embeddings.parquet"
    got = schema_drift(spark, a, b).toPandas()
    want = duckdb.connect().execute(schema_drift_oracle_sql(a, b)).df()
    assert len(got) == len(want) > 0
    for c in got.columns:
        assert [x if x == x else None for x in got[c]] == [
            x if x == x else None for x in want[c]
        ], c
    # nested path present and dotted
    assert "embedding.list.element" in set(got.path)


def test_schema_drift_semantics(spark, tmp_path):
    """Planted snapshots: a column dropped, one added, one retyped
    (INT64 -> BYTE_ARRAY), one unchanged — each classified; identical
    snapshots report all-unchanged."""
    from pg_parquet_spark.functions import schema_drift

    v1 = spark.createDataFrame(
        [(1, "a", 10, 1.5)], "id long, kept string, retyped long, gone double"
    )
    v2 = spark.createDataFrame(
        [(1, "a", "s", True)], "id long, kept string, retyped string, fresh boolean"
    )
    p1, p2 = str(tmp_path / "v1"), str(tmp_path / "v2")
    # coalesce(1): a multi-partition 1-row write also emits EMPTY part
    # files, and one_file() might pick one — which schema_drift now
    # refuses (zero-row-group guard)
    write_parquet(v1.coalesce(1), p1)
    write_parquet(v2.coalesce(1), p2)
    import os

    # write_parquet writes a directory; point at the single data file
    def one_file(d):
        for root, _, files in os.walk(d):
            for f in files:
                if f.endswith(".parquet"):
                    return os.path.join(root, f)
        raise AssertionError(f"no parquet under {d}")

    f1, f2 = one_file(p1), one_file(p2)
    out = {r.path: r for r in schema_drift(spark, f1, f2).collect()}
    assert out["gone"].change == "removed" and out["gone"].type_b is None
    assert out["fresh"].change == "added" and out["fresh"].type_a is None
    assert out["retyped"].change == "retyped"
    assert (out["retyped"].type_a, out["retyped"].type_b) == (
        "INT64",
        "BYTE_ARRAY",
    )
    assert out["kept"].change == "unchanged"
    assert out["id"].change == "unchanged"
    same = schema_drift(spark, f1, f1).collect()
    assert all(r.change == "unchanged" for r in same)


def test_scan_planning_report_matches_duckdb(spark, tmp_path):
    """r14: the row-group pruning explain replicates DuckDB's
    parquet_metadata() stats view over a multi-row-group file, and the
    would_scan verdicts match a hand check of the sorted layout."""
    import duckdb

    from pg_parquet_spark.functions.metadata import (
        scan_planning_oracle_sql,
        scan_planning_report,
    )
    from pg_parquet_spark.session import table as _table

    ev = _table(spark, "/root/testdata/sf0.001", "events")
    path = str(tmp_path / "rg.parquet")
    write_parquet(ev.orderBy("event_id").coalesce(1), path, row_group_size=300)
    got = scan_planning_report(spark, path, "event_id", 100, 500).toPandas()
    want = (
        duckdb.connect()
        .execute(scan_planning_oracle_sql(path, "event_id", 100, 500))
        .df()
    )
    assert len(got) == len(want) >= 3  # 1000 rows / 300 per group
    for c in got.columns:
        assert [x if x == x else None for x in got[c]] == [
            x if x == x else None for x in want[c]
        ], c
    # sorted layout: exactly the groups overlapping [100, 500] scan
    for r in got.itertuples():
        assert r.would_scan == (not (r.rg_max < 100 or r.rg_min > 500)), r
    assert got.would_scan.sum() < len(got)  # pruning actually happens
    # validation: unknown column and non-integer column raise
    with pytest.raises(ValueError, match="not found"):
        scan_planning_report(spark, path, "nope", 0, 1)
    with pytest.raises(ValueError, match="INT32/INT64"):
        scan_planning_report(spark, path, "event_type", 0, 1)


def test_row_group_size_requires_single_file_target(spark, tmp_path):
    """Late-r14 writer guard: a directory target used to silently
    IGNORE row-exact batching (only partition_by raised) — now it
    raises like the partitioned branch, pointing at the bytes cap."""
    df = spark.range(10).selectExpr("id AS a")
    with pytest.raises(ValueError, match="single parquet file uri"):
        write_parquet(df, str(tmp_path / "plain_dir"), row_group_size=5)
    # the single-file path still honors row-exact batching
    import pyarrow.parquet as pq_

    f = str(tmp_path / "one.parquet")
    write_parquet(df.coalesce(1), f, row_group_size=4)
    assert pq_.ParquetFile(f).metadata.num_row_groups == 3


def test_r14_review_regressions_metadata_and_writer(spark, tmp_path):
    """Late-r14 review closures: (1) the file_size_bytes split path now
    raises on row_group_size instead of silently ignoring it; (2)
    scan_planning rejects logically-annotated int columns (DATE is
    physically INT32 but its stats decode to dates); (3) schema_drift
    refuses zero-row-group snapshots whose column chunks the oracle
    cannot see."""
    import pyspark.sql.functions as F

    from pg_parquet_spark.functions import schema_drift
    from pg_parquet_spark.functions.metadata import scan_planning_report

    df = spark.range(100).select(
        F.col("id"), F.to_date(F.lit("2026-01-01")).alias("d")
    )
    # (1) split path: row-exact batching cannot ride maxRecordsPerFile
    with pytest.raises(ValueError, match="single parquet file uri"):
        write_parquet(
            df, str(tmp_path / "split"), file_size_bytes="1MB",
            row_group_size=10,
        )
    # (2) DATE passes the physical INT32 check but must still raise
    f = str(tmp_path / "dated.parquet")
    write_parquet(df.coalesce(1), f)
    with pytest.raises(ValueError, match="logical annotation"):
        scan_planning_report(spark, f, "d", 0, 10)
    # (3) zero-row-group snapshot: footer says columns, stats say none
    empty = str(tmp_path / "empty.parquet")
    write_parquet(df.filter("id < 0").coalesce(1), empty)
    import pyarrow.parquet as pq_

    if pq_.ParquetFile(empty).metadata.num_row_groups == 0:
        with pytest.raises(ValueError, match="no row groups"):
            schema_drift(spark, f, empty)
