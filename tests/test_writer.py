"""Writer-path behaviors: row group sizing, splitting, compression —
asserted via our own metadata functions, exactly as the reference
self-hosts its checks (copy_options.rs:348-565)."""

import glob
import os

import pyarrow.parquet as pq
import pytest

from pg_parquet_spark.functions import parquet_file_metadata, parquet_metadata
from pg_parquet_spark.session import table as load
from pg_parquet_spark.sources import read_parquet, write_parquet
from pg_parquet_spark.sources.writer import copy_to
from pg_parquet_spark.sources.options import OptionError


def test_row_group_size_rows(spark, tmp_path):
    # row_group_size effect observed via parquet.metadata (copy_options.rs:348)
    li = load(spark, "/root/testdata/sf0.001", "lineitem")  # 6000 rows
    path = str(tmp_path / "rg.parquet")
    write_parquet(li, path, row_group_size=1000)
    md = parquet_file_metadata(spark, path).collect()[0]
    assert md.num_rows == 6000
    assert md.num_row_groups == 6
    per_group = {
        r.row_group_id: r.row_group_num_rows
        for r in parquet_metadata(spark, path).collect()
    }
    assert all(v == 1000 for v in per_group.values())


def test_file_size_bytes_split_naming(spark, tmp_path):
    # children data_{i}.parquet (copy_to_split_dest_receiver.rs:105-136)
    li = load(spark, "/root/testdata/sf0.01", "lineitem")
    out = str(tmp_path / "split_out")
    files = write_parquet(li, out, file_size_bytes="1MB")
    assert len(files) >= 2
    assert [os.path.basename(f) for f in files] == [
        f"data_{i}.parquet" for i in range(len(files))
    ]
    back = read_parquet(spark, out + "/*.parquet")
    assert back.count() == li.count()


def test_file_size_bytes_min_enforced(spark, tmp_path):
    li = load(spark, "/root/testdata/sf0.001", "region")
    with pytest.raises(OptionError, match="Minimum allowed size is 1MB. Got 1000 bytes."):
        write_parquet(li, str(tmp_path / "x"), file_size_bytes=1000)


@pytest.mark.parametrize("codec", ["snappy", "gzip", "zstd", "uncompressed"])
def test_compression_codecs_roundtrip(spark, tmp_path, codec):
    df = load(spark, "/root/testdata/sf0.001", "nation")
    path = str(tmp_path / f"c_{codec}.parquet")
    write_parquet(df, path, compression=codec)
    md = parquet_metadata(spark, path).collect()
    expected = {"uncompressed": "UNCOMPRESSED", "snappy": "SNAPPY", "gzip": "GZIP", "zstd": "ZSTD"}[codec]
    assert all(r.compression == expected for r in md)
    assert read_parquet(spark, path).count() == df.count()


def test_compression_from_extension(spark, tmp_path):
    # *.parquet.zst → zstd (compression.rs:135-155)
    df = load(spark, "/root/testdata/sf0.001", "region")
    path = str(tmp_path / "r.parquet.zst")
    write_parquet(df, path)
    md = parquet_metadata(spark, path).collect()
    assert all(r.compression == "ZSTD" for r in md)


def test_directory_target_distributed_write(spark, tmp_path):
    out = str(tmp_path / "dataset_dir")
    df = load(spark, "/root/testdata/sf0.001", "lineitem").repartition(4)
    files = write_parquet(df, out)
    assert len(files) >= 1
    assert read_parquet(spark, out).count() == 6000


def test_parquet_version_v2_on_spark_paths(spark, tmp_path):
    # v2 previously only took effect on the pyarrow path; the Spark single
    # file and directory paths must honor it too (DELTA_* encodings are
    # the v2 writer's signature; v1 uses PLAIN + BIT_PACKED/RLE)
    from pg_parquet_spark.session import table as _table

    df = _table(spark, "/root/testdata/sf0.001", "region")
    single_v2 = str(tmp_path / "v2.parquet")
    write_parquet(df, single_v2, parquet_version="v2")
    encs = pq.ParquetFile(single_v2).metadata.row_group(0).column(0).encodings
    assert any(e.startswith("DELTA") for e in encs)

    dir_v1 = str(tmp_path / "v1_dir")
    write_parquet(df, dir_v1, parquet_version="v1")
    f = glob.glob(os.path.join(dir_v1, "*.parquet"))[0]
    encs1 = pq.ParquetFile(f).metadata.row_group(0).column(0).encodings
    assert not any(e.startswith("DELTA") for e in encs1)


def test_split_write_applies_field_ids(spark, tmp_path):
    # ADVICE r1: file_size_bytes + field_ids used to silently drop the ids
    df = spark.range(200_000).selectExpr("id AS a", "CAST(id AS STRING) AS b")
    out = str(tmp_path / "split_ids")
    files = write_parquet(df, out, file_size_bytes=1024 * 1024, field_ids="auto")
    assert files and all(os.path.basename(f).startswith("data_") for f in files)
    sch = pq.ParquetFile(files[0]).schema_arrow
    ids = [
        (sch.field(i).metadata or {}).get(b"PARQUET:field_id")
        for i in range(len(sch))
    ]
    assert ids == [b"0", b"1"]


def test_copy_to_unknown_option_and_format_texts(spark):
    # copy_utils.rs:200-216 / :60-66 exact texts
    df = spark.range(1)
    with pytest.raises(OptionError, match=r'nonexisted is not a valid option for "copy to parquet"'):
        copy_to(df, "/tmp/x.parquet", nonexisted=1)
    with pytest.raises(OptionError, match=r"csv is not a valid format. Only parquet format is supported."):
        copy_to(df, "/tmp/x.parquet", format="csv")


def test_row_group_size_bytes_rotates_on_pyarrow_path(spark, tmp_path):
    # parquet_writer.rs:37-38 rotates on rows OR bytes, whichever first —
    # a small byte cap must split a big table into many row groups even
    # when the row cap alone would keep it in one
    df = spark.range(100_000).selectExpr("id", "CAST(id AS STRING) AS s")
    out = str(tmp_path / "bytecap.parquet")
    write_parquet(
        df,
        out,
        row_group_size=1_000_000,  # rows alone would give 1 group
        row_group_size_bytes=64 * 1024,
        kv_metadata={"probe": "1"},  # routes through the pyarrow path
    )
    md = pq.ParquetFile(out).metadata
    assert md.num_row_groups > 5
    # uncompressed group sizes should be in the ballpark of the cap
    sizes = [md.row_group(i).total_byte_size for i in range(md.num_row_groups)]
    assert max(sizes[:-1]) < 4 * 64 * 1024


def test_timestamp_micros_footer_on_parity_path(spark, tmp_path):
    # ADVICE r3 #1: the pyarrow parity path (row_group_size / kv_metadata /
    # field_ids) must stamp TIMESTAMP(MICROS) like the reference
    # (schema_parser.rs maps PG timestamps to Timestamp(Microsecond)),
    # never NANOS derived from an INT96 stage file — NANOS breaks our own
    # round-trip (nanosAsLong read surfaces raw longs).
    import datetime

    rows = [
        (i, datetime.datetime(2024, 1, 1, 12, 0, i)) for i in range(25)
    ]
    df = spark.createDataFrame(rows, "id int, ts timestamp")
    path = str(tmp_path / "ts_parity.parquet")
    write_parquet(df, path, row_group_size=10)

    col = pq.ParquetFile(path).schema.column(1)
    assert "timestamp" in str(col.logical_type).lower()
    assert "micro" in str(col.logical_type).lower()
    arrow_type = pq.read_table(path).schema.field("ts").type
    assert str(arrow_type).startswith("timestamp[us")

    back = read_parquet(spark, path)
    assert dict(back.dtypes)["ts"].startswith("timestamp")
    got = sorted(r.ts for r in back.collect())
    assert got == [r[1] for r in rows]


def test_timestamp_micros_footer_on_spark_paths(spark, tmp_path):
    # Same annotation parity on the pure-Spark single-file and directory
    # paths (session pins spark.sql.parquet.outputTimestampType).
    import datetime

    df = spark.createDataFrame(
        [(1, datetime.datetime(2023, 6, 1, 0, 0, 0))], "id int, ts timestamp"
    )
    single = str(tmp_path / "ts_single.parquet")
    write_parquet(df, single)
    col = pq.ParquetFile(single).schema.column(1)
    assert "micro" in str(col.logical_type).lower()

    outdir = str(tmp_path / "ts_dir")
    write_parquet(df, outdir)
    part = glob.glob(os.path.join(outdir, "*.parquet"))[0]
    col = pq.ParquetFile(part).schema.column(1)
    assert "micro" in str(col.logical_type).lower()

def test_interleaved_compression_levels_are_isolated(spark, tmp_path):
    """Codec levels ride the per-write job conf, not the session conf
    (VERDICT r5 watch item 2): interleaved writes with different zstd
    levels each get their own level, reproducibly, and nothing leaks
    into the session hadoop conf."""
    from pyspark.sql import functions as F

    # highly compressible, big enough for the level to matter
    df = (
        spark.range(40_000)
        .select(
            F.col("id"),
            F.concat(F.lit("the quick brown fox jumps over the lazy dog " * 4),
                     (F.col("id") % 7).cast("string")).alias("s"),
        )
        .coalesce(1)
    )
    a1 = str(tmp_path / "lvl1_a")
    b = str(tmp_path / "lvl19_b")
    a2 = str(tmp_path / "lvl1_c")
    write_parquet(df, a1, compression="zstd", compression_level=1)
    write_parquet(df, b, compression="zstd", compression_level=19)
    write_parquet(df, a2, compression="zstd", compression_level=1)

    import glob as g
    import os

    size = lambda d: sum(os.path.getsize(f) for f in g.glob(os.path.join(d, "part-*")))  # noqa: E731
    assert size(a1) == size(a2), "same level must reproduce the same bytes"
    assert size(b) < size(a1), "level 19 must out-compress level 1"
    # no session-global leakage
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert hconf.get("parquet.compression.codec.zstd.level") is None
    assert spark.conf.get("spark.hadoop.parquet.compression.codec.zstd.level", None) is None


def test_partitioned_dataset_write_and_pruned_read(spark, tmp_path):
    """partition_by writes a hive layout (col=value dirs) and a filter
    on the partition column prunes the scan to one directory
    (PartitionFilters in the plan, no data-column filter needed)."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "li_part")
    li = load(spark, "/root/testdata/sf0.001", "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    files = write_parquet(li, out, partition_by=["l_returnflag"])
    assert files, "expected partitioned files"
    import os

    flags = {p.split("=")[1] for p in os.listdir(out) if p.startswith("l_returnflag=")}
    assert flags == {"A", "N", "R"}

    back = read_parquet(spark, out)
    pruned = back.filter(F.col("l_returnflag") == "R")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "l_returnflag" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], "partition filter must prune at the scan"
    want = li.filter(F.col("l_returnflag") == "R").count()
    assert pruned.count() == want


def test_partition_by_rejects_incompatible_targets(spark, tmp_path):
    from pg_parquet_spark.sources.writer import write_parquet as wp

    df = load(spark, "/root/testdata/sf0.001", "region")
    with pytest.raises(ValueError, match="directory target"):
        wp(df, str(tmp_path / "x.parquet"), partition_by=["r_name"])
    with pytest.raises(ValueError, match="file_size_bytes"):
        wp(df, str(tmp_path / "d"), partition_by=["r_name"], file_size_bytes="2MB")
    with pytest.raises(ValueError, match="parity options"):
        wp(df, str(tmp_path / "d"), partition_by=["r_name"], row_group_size=100)
