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
    # exact reference text (copy_utils.rs:138 + compression.rs:19-29 list)
    with pytest.raises(
        OptionError,
        match=r"bzip2 is not a valid compression format. Supported compression "
        r"formats are uncompressed, snappy, gzip, lz4, lz4raw, brotli, zstd",
    ):
        validate_compression("bzip2", None, "/t/x.parquet")


@pytest.mark.parametrize(
    "codec,level,ok",
    [
        ("gzip", 0, True),
        ("gzip", 9, True),
        ("gzip", 10, False),  # parquet-rs GzipLevel is 0..=9 (copy_options.rs:212)
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
        with pytest.raises(OptionError, match=r"valid compression range \d+\.\.=\d+ exceeded"):
            validate_compression(codec, level, "/t/x.parquet")


@pytest.mark.parametrize("codec", ["snappy", "lz4", "uncompressed"])
def test_level_unsupported_codecs(codec):
    # compression.rs:55: compression level is not supported for "snappy" ...
    with pytest.raises(OptionError, match=f'not supported for "{codec}" compression'):
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
    with pytest.raises(OptionError, match=r"Minimum allowed size is 1MB. Got 524288 bytes."):
        parse_file_size_bytes("512KB")
    with pytest.raises(OptionError, match=r"No numeric value found in 'TENMB'"):
        parse_file_size_bytes("tenMB")
    with pytest.raises(OptionError, match=r"Unrecognized unit 'TB'. Allowed units are KB, MB or GB."):
        parse_file_size_bytes("1TB")


def test_parquet_version():
    assert validate_parquet_version("v1") == "PARQUET_1_0"
    assert validate_parquet_version("v2") == "PARQUET_2_0"
    with pytest.raises(
        OptionError, match=r"unrecognized parquet version: v3. v1 or v2 is supported."
    ):
        validate_parquet_version("v3")


def test_match_by():
    assert validate_match_by("position") == "position"
    assert validate_match_by("name") == "name"
    with pytest.raises(OptionError, match="unrecognized match_by method: ordinal"):
        validate_match_by("ordinal")


def test_row_group_size_validation():
    with pytest.raises(OptionError, match="row_group_size"):
        WriteOptions.validate("/t/x.parquet", row_group_size=0)
    opts = WriteOptions.validate("/t/x.parquet")
    assert opts.row_group_size == 122_880  # parquet_writer.rs:37
    assert opts.row_group_size_bytes == 122_880 * 1024  # :38
