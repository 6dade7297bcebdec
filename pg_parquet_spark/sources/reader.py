"""``read_parquet`` — the COPY FROM surface (SURVEY.md A2, A5-A7, A14-A15).

Reference behavior (src/parquet_copy_hook/copy_from.rs,
src/arrow_parquet/parquet_reader.rs, schema_parser.rs:505-680):

- glob patterns (``*``/``**``) fan out to many files; an empty match is an
  error (parquet_reader.rs:226-228);
- with a target schema, the file schema is strictly validated: match_by
  ``position`` (ordinal, counts must agree) or ``name`` (missing name →
  error), then per-column coercion through the PG-explicit-cast matrix,
  strict (overflow errors, never NULL);
- an optional WHERE expression filters rows on load (copy_from.rs:138-142)
  — here it lands *before* the scan in the optimized plan, so Catalyst
  pushes it into the parquet reader (a strict superset of the reference,
  which filters row-by-row after decode, SURVEY.md §2.C);
- a column list projects (copy_utils.rs:616-682); unknown column → error.

Scale: everything stays declarative — the scan benefits from predicate
pushdown, column pruning, partition coalescing and vectorized decode.
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql.types import StructType

from pg_parquet_spark.session import copy_hooks_enabled
from pg_parquet_spark.sources.coerce import SchemaMatchError, match_and_coerce
from pg_parquet_spark.sources.options import validate_match_by


class CopyHookDisabled(RuntimeError):
    pass


def _strip_scheme(uri: str) -> str:
    return uri[len("file://"):] if uri.startswith("file://") else uri


def _check_glob(uri: str) -> None:
    """Empty glob match is an error (parquet_reader.rs:226-228)."""
    path = _strip_scheme(uri)
    if ("*" in path or "?" in path or "[" in path) and not path.startswith(
        ("s3a://", "abfss://", "gs://", "https://", "http://")
    ):
        matches = _glob.glob(path, recursive=True)
        if not matches:
            raise FileNotFoundError(f"no files found that match the uri/pattern: {uri}")


def read_parquet(
    spark: SparkSession,
    uri: str | list[str],
    schema: StructType | str | None = None,
    *,
    match_by: str = "position",
    where: str | Column | None = None,
    columns: list[str] | None = None,
) -> DataFrame:
    """Read parquet at ``uri`` with pg_parquet's COPY FROM semantics."""
    if not copy_hooks_enabled():
        raise CopyHookDisabled("pg_parquet_spark copy hooks are disabled")
    from pg_parquet_spark.session import ensure_session_defaults

    ensure_session_defaults(spark)
    match_by = validate_match_by(match_by)

    uris = uri if isinstance(uri, list) else [uri]
    for u in uris:
        _check_glob(u)
    paths = [_strip_scheme(u) for u in uris]

    reader = spark.read.option("recursiveFileLookup", "false")
    df = reader.parquet(*paths)

    if schema is not None:
        if isinstance(schema, str):
            schema = StructType.fromDDL(schema)
        df = match_and_coerce(df, schema, match_by)

    if columns is not None:
        missing = [c for c in columns if c not in df.columns]
        if missing:
            raise SchemaMatchError(
                f'column "{missing[0]}" of relation does not exist'
            )
        df = df.select(*columns)

    if where is not None:
        df = df.filter(where)
    return df


def copy_from(
    spark: SparkSession,
    uri: str,
    table: str,
    *,
    match_by: str = "position",
    where: str | Column | None = None,
    columns: list[str] | None = None,
) -> DataFrame:
    """COPY <table> FROM '<uri>' parity: validate against the registered
    table's schema, coerce, filter, and return the load-ready frame
    (the caller appends via ``.writeTo(table).append()``)."""
    target = spark.table(table).schema
    if columns is not None:
        names = set(columns)
        target = StructType([f for f in target.fields if f.name in names])
    return read_parquet(
        spark, uri, target, match_by=match_by, where=where
    )
