"""Option validation parity (reference: copy_options.rs tests)."""

import pytest

from pg_parquet_spark.sources.options import (
    OptionError,
    WriteOptions,
    infer_compression,
    parse_file_size_bytes,
    validate_compression,
    validate_match_by,
    validate_parquet_version,
)


def test_default_compression_is_snappy():
    assert validate_compression(None, None, "/tmp/x.parquet") == ("snappy", None)


@pytest.mark.parametrize(
    "uri,codec",
    [
        ("/t/x.parquet.gz", "gzip"),
        ("/t/x.parquet.zst", "zstd"),
        ("/t/x.parquet.br", "brotli"),
        ("/t/x.parquet.lz4", "lz4"),
        ("/t/x.parquet.snappy", "snappy"),
        ("/t/x.parquet", "snappy"),
    ],
)
def test_compression_from_extension(uri, codec):
    # compression.rs:135-155
    assert infer_compression(uri) == codec


def test_non_parquet_extension_not_engaged():
    assert infer_compression("/t/x.csv") is None
    assert infer_compression("/t/x.gz") is None  # needs *.parquet.gz


def test_invalid_compression_errors():
    with pytest.raises(OptionError, match="invalid compression"):
        validate_compression("bzip2", None, "/t/x.parquet")


@pytest.mark.parametrize(
    "codec,level,ok",
    [
        ("gzip", 0, True),
        ("gzip", 10, True),
        ("gzip", 11, False),
        ("zstd", 1, True),
        ("zstd", 22, True),
        ("zstd", 0, False),
        ("zstd", 23, False),
        ("brotli", 11, True),
        ("brotli", 12, False),
    ],
)
def test_compression_levels(codec, level, ok):
    if ok:
        validate_compression(codec, level, "/t/x.parquet")
    else:
        with pytest.raises(OptionError, match="out of range"):
            validate_compression(codec, level, "/t/x.parquet")


@pytest.mark.parametrize("codec", ["snappy", "lz4", "uncompressed"])
def test_level_unsupported_codecs(codec):
    with pytest.raises(OptionError, match="not supported"):
        validate_compression(codec, 3, "/t/x.parquet")


def test_default_levels_applied():
    assert validate_compression("gzip", None, "/t/x.parquet") == ("gzip", 6)
    assert validate_compression("zstd", None, "/t/x.parquet") == ("zstd", 1)
    assert validate_compression("brotli", None, "/t/x.parquet") == ("brotli", 1)


def test_file_size_bytes_units_and_min():
    # copy_utils.rs:686-733 (min 1MB; KB/MB/GB units)
    assert parse_file_size_bytes("1MB") == 1024**2
    assert parse_file_size_bytes("2GB") == 2 * 1024**3
    assert parse_file_size_bytes("1024KB") == 1024**2
    assert parse_file_size_bytes(5 * 1024**2) == 5 * 1024**2
    with pytest.raises(OptionError, match="at least 1MB"):
        parse_file_size_bytes("512KB")
    with pytest.raises(OptionError, match="invalid file_size_bytes"):
        parse_file_size_bytes("tenMB")


def test_parquet_version():
    assert validate_parquet_version("v1") == "PARQUET_1_0"
    assert validate_parquet_version("v2") == "PARQUET_2_0"
    with pytest.raises(OptionError, match="invalid parquet version"):
        validate_parquet_version("v3")


def test_match_by():
    assert validate_match_by("position") == "position"
    assert validate_match_by("name") == "name"
    with pytest.raises(OptionError, match="invalid match_by"):
        validate_match_by("ordinal")


def test_row_group_size_validation():
    with pytest.raises(OptionError, match="row_group_size"):
        WriteOptions.validate("/t/x.parquet", row_group_size=0)
    opts = WriteOptions.validate("/t/x.parquet")
    assert opts.row_group_size == 122_880  # parquet_writer.rs:37
    assert opts.row_group_size_bytes == 122_880 * 1024  # :38
