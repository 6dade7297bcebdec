"""COPY-option parsing/validation with reference-parity semantics.

Mirrors pg_parquet's option surface and error behavior
(reference: src/parquet_copy_hook/copy_utils.rs:37-172 for validation,
src/arrow_parquet/compression.rs for codecs/levels/extension inference,
src/arrow_parquet/parquet_version.rs for writer version,
src/parquet_copy_hook/copy_utils.rs:686-733 for file_size_bytes units).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

#: codec → (spark codec name, level range or None)
#: reference: compression.rs:6-39 — uncompressed/snappy(default)/gzip/
#: brotli/lz4/lz4raw/zstd; level ranges are parquet-rs's (GzipLevel 0..=9,
#: BrotliLevel 0..=11, ZstdLevel 1..=22 — copy_options.rs:212 asserts the
#: 0..=9 gzip text).
COMPRESSIONS: dict[str, tuple[str, tuple[int, int] | None]] = {
    "uncompressed": ("uncompressed", None),
    "none": ("uncompressed", None),
    "snappy": ("snappy", None),
    "gzip": ("gzip", (0, 9)),
    "brotli": ("brotli", (0, 11)),
    "lz4": ("lz4", None),
    "lz4raw": ("lz4_raw", None),
    "lz4_raw": ("lz4_raw", None),
    "zstd": ("zstd", (1, 22)),
}

#: user-facing codec list for the invalid-compression error
#: (compression.rs:19-29 ordering)
_SUPPORTED_LIST = "uncompressed, snappy, gzip, lz4, lz4raw, brotli, zstd"

#: default levels (compression.rs:31-39 / README.md:374)
DEFAULT_LEVELS = {"gzip": 6, "zstd": 1, "brotli": 1}

#: compression inferred from uri extension (compression.rs:135-155):
#: *.parquet[.gz|.zst|.br|.lz4|.snappy]
_EXT_CODEC = {
    ".gz": "gzip",
    ".zst": "zstd",
    ".br": "brotli",
    ".lz4": "lz4",
    ".snappy": "snappy",
    ".parquet": "snappy",  # bare .parquet → default snappy
}

DEFAULT_ROW_GROUP_SIZE = 122_880  # parquet_writer.rs:37
DEFAULT_ROW_GROUP_SIZE_BYTES = 122_880 * 1024  # parquet_writer.rs:38
MIN_FILE_SIZE_BYTES = 1024 * 1024  # copy_utils.rs:727-730 (min 1MB)


class OptionError(ValueError):
    """Invalid COPY option (reference raises ERROR with these texts)."""


def infer_compression(uri: str) -> str | None:
    """Codec from file extension, or None when the uri is not a parquet
    target this engine handles (compression.rs:135-155)."""
    low = uri.lower().rstrip("/")
    for ext, codec in _EXT_CODEC.items():
        if low.endswith(ext):
            if ext == ".parquet":
                return "snappy"
            # require the double extension *.parquet.<ext>
            base = low[: -len(ext)]
            if base.endswith(".parquet"):
                return codec
    return None


def is_parquet_uri(uri: str) -> bool:
    """Hook-engagement test (copy_utils.rs:430-515): `.parquet` or a
    recognized compressed parquet extension."""
    return infer_compression(uri) is not None


def validate_compression(codec: str | None, level: int | None, uri: str) -> tuple[str, int | None]:
    """Resolve (spark_codec, level); errors match the reference's
    invalid-option behavior (copy_options.rs:109-313 tests)."""
    if codec is None:
        codec = infer_compression(uri) or "snappy"
    codec = codec.lower()
    if codec not in COMPRESSIONS:
        raise OptionError(
            f"{codec} is not a valid compression format. "
            f"Supported compression formats are {_SUPPORTED_LIST}"
        )
    spark_codec, level_range = COMPRESSIONS[codec]
    if level is not None:
        if level_range is None:
            # exact reference text (compression.rs:55)
            raise OptionError(
                f'compression level is not supported for "{codec}" compression'
            )
        lo, hi = level_range
        if not (lo <= int(level) <= hi):
            # parquet-rs level error shape (copy_options.rs:212)
            raise OptionError(f"valid compression range {lo}..={hi} exceeded")
        return spark_codec, int(level)
    if codec in DEFAULT_LEVELS:
        return spark_codec, DEFAULT_LEVELS[codec]
    return spark_codec, None


def parse_file_size_bytes(value: int | str) -> int:
    """`file_size_bytes` accepts raw bytes or KB/MB/GB units; min 1 MiB.
    Error texts byte-match copy_utils.rs:686-733 (`parse_file_size`)."""
    if isinstance(value, (int, float)):
        nbytes = int(value)
    else:
        s = str(value).strip().upper()
        m = re.match(r"^(\d+)", s)
        if not m:
            raise OptionError(f"No numeric value found in '{s}'")
        nbytes = int(m.group(1))
        unit = s[m.end():].strip()
        if unit not in ("", "KB", "MB", "GB"):
            raise OptionError(
                f"Unrecognized unit '{unit}'. Allowed units are KB, MB or GB."
            )
        nbytes *= {"": 1, "KB": 1024, "MB": 1024**2, "GB": 1024**3}[unit]
    if nbytes < MIN_FILE_SIZE_BYTES:
        raise OptionError(f"Minimum allowed size is 1MB. Got {nbytes} bytes.")
    return nbytes


def validate_parquet_version(version: str) -> str:
    """'v1' (default) | 'v2' → Spark/parquet-mr writer version
    (parquet_version.rs:6-34; exact error text from rs:21)."""
    v = str(version).lower()
    if v not in ("v1", "v2"):
        raise OptionError(
            f"unrecognized parquet version: {version}. v1 or v2 is supported."
        )
    return {"v1": "PARQUET_1_0", "v2": "PARQUET_2_0"}[v]


def validate_match_by(match_by: str) -> str:
    """'position' (default) | 'name' (match_by.rs:3-20; exact error text
    from rs:17)."""
    m = str(match_by).lower()
    if m not in ("position", "name"):
        raise OptionError(f"unrecognized match_by method: {match_by}")
    return m


@dataclass
class WriteOptions:
    """Validated COPY TO option bundle (copy_utils.rs:37-172)."""

    compression: str = "snappy"
    compression_level: int | None = None
    row_group_size: int = DEFAULT_ROW_GROUP_SIZE
    row_group_size_bytes: int = DEFAULT_ROW_GROUP_SIZE_BYTES
    file_size_bytes: int | None = None
    field_ids: str = "none"
    parquet_version: str = "PARQUET_1_0"

    @classmethod
    def validate(
        cls,
        uri: str,
        *,
        compression: str | None = None,
        compression_level: int | None = None,
        row_group_size: int | None = None,
        row_group_size_bytes: int | None = None,
        file_size_bytes: int | str | None = None,
        field_ids: str = "none",
        parquet_version: str = "v1",
    ) -> "WriteOptions":
        codec, level = validate_compression(compression, compression_level, uri)
        rgs = DEFAULT_ROW_GROUP_SIZE if row_group_size is None else int(row_group_size)
        if rgs <= 0:
            raise OptionError("row_group_size must be greater than 0")
        rgsb = (
            DEFAULT_ROW_GROUP_SIZE_BYTES
            if row_group_size_bytes is None
            else int(row_group_size_bytes)
        )
        if rgsb <= 0:
            raise OptionError("row_group_size_bytes must be greater than 0")
        fsb = None if file_size_bytes is None else parse_file_size_bytes(file_size_bytes)
        return cls(
            compression=codec,
            compression_level=level,
            row_group_size=rgs,
            row_group_size_bytes=rgsb,
            file_size_bytes=fsb,
            field_ids=field_ids,
            parquet_version=validate_parquet_version(parquet_version),
        )
