"""Read-time strict schema matching + PG-style coercion matrix.

Mirrors ``ensure_file_schema_match_tupledesc_schema`` / ``is_coercible``
(reference: src/arrow_parquet/schema_parser.rs:505-680):

- ``match_by position`` — file column count must equal the target count
  (error otherwise, :513-521); columns pair by ordinal.
- ``match_by name`` — every target column must exist in the file by name
  (error otherwise, :531-537).
- identical types pass through; otherwise the pair must be *coercible*:
  castable AND meaningful as a PG explicit coercion (:580-655). Structs
  must have the same field count with equal names in order (:594-625);
  lists (incl. large/fixed-size in the file) and maps recurse.
- casts are strict: a runtime overflow errors instead of producing NULL
  (CastOptions{safe:false}, parquet_reader.rs:151-155) — Spark parity via
  ``spark.sql.ansi.enabled=true``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    ByteType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    ShortType,
    StringType,
    StructType,
    TimestampNTZType,
    TimestampType,
)


class SchemaMatchError(ValueError):
    """Strict-match failure; messages mirror the reference's errors."""


_NUMERIC = (ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType, DecimalType)
_TIMESTAMPS = (TimestampType, TimestampNTZType)


def _is_numeric(dt: DataType) -> bool:
    return isinstance(dt, _NUMERIC)


def is_coercible(from_dt: DataType, to_dt: DataType) -> bool:
    """PG-explicit-coercion allowlist over Spark types."""
    if from_dt == to_dt:
        return True
    if isinstance(from_dt, StructType) and isinstance(to_dt, StructType):
        # same field count, equal names in order, recursively coercible
        # (schema_parser.rs:594-625)
        if len(from_dt.fields) != len(to_dt.fields):
            return False
        for f, t in zip(from_dt.fields, to_dt.fields):
            if f.name != t.name:
                return False
            if not is_coercible(f.dataType, t.dataType):
                return False
        return True
    if isinstance(from_dt, ArrayType) and isinstance(to_dt, ArrayType):
        return is_coercible(from_dt.elementType, to_dt.elementType)
    if isinstance(from_dt, MapType) and isinstance(to_dt, MapType):
        return is_coercible(from_dt.keyType, to_dt.keyType) and is_coercible(
            from_dt.valueType, to_dt.valueType
        )
    if isinstance(from_dt, (StructType, ArrayType, MapType)) or isinstance(
        to_dt, (StructType, ArrayType, MapType)
    ):
        return False
    # primitive matrix — arrow `can_cast_types` AND a PG explicit
    # coercion path (schema_parser.rs:648-663): PG has explicit paths
    # between all numeric types (both widening and narrowing — narrowing
    # errors at runtime on overflow, copy_from_coerce.rs:1080),
    # date→timestamp(+ntz), timestamp→date, timestamp↔timestamp_ntz,
    # bool↔int4 (BOOLEAN => {int}, copy_from_coerce.rs:373-393 — PG's
    # only bool↔numeric cast pair), bytea→text (Binary => {text},
    # :425-445), and anything→text.
    if _is_numeric(from_dt) and _is_numeric(to_dt):
        return True
    if isinstance(from_dt, BooleanType) and isinstance(to_dt, IntegerType):
        return True
    if isinstance(from_dt, IntegerType) and isinstance(to_dt, BooleanType):
        return True
    if isinstance(from_dt, DateType) and isinstance(to_dt, _TIMESTAMPS):
        return True
    if isinstance(from_dt, _TIMESTAMPS) and isinstance(to_dt, (DateType, *_TIMESTAMPS)):
        return True
    if isinstance(to_dt, StringType) and isinstance(
        from_dt, (BooleanType, BinaryType, DateType, *_TIMESTAMPS, *_NUMERIC)
    ):
        # PG: every type has a text output function (fallback-to-text)
        return True
    if isinstance(from_dt, StringType) and isinstance(to_dt, BinaryType):
        return True
    return False


def coerce_expr(col: Column, from_dt: DataType, to_dt: DataType) -> Column:
    """Build a cast expression honoring by-name struct semantics."""
    if from_dt == to_dt:
        return col
    if isinstance(from_dt, StructType) and isinstance(to_dt, StructType):
        parts = [
            coerce_expr(col.getField(f.name), f.dataType, t.dataType).alias(t.name)
            for f, t in zip(from_dt.fields, to_dt.fields)
        ]
        return F.when(col.isNull(), F.lit(None).cast(to_dt)).otherwise(F.struct(*parts))
    if isinstance(from_dt, ArrayType) and isinstance(to_dt, ArrayType):
        return F.transform(
            col, lambda x: coerce_expr(x, from_dt.elementType, to_dt.elementType)
        ).cast(to_dt)
    if isinstance(from_dt, MapType) and isinstance(to_dt, MapType):
        keys = F.transform(
            F.map_keys(col), lambda k: coerce_expr(k, from_dt.keyType, to_dt.keyType)
        )
        vals = F.transform(
            F.map_values(col), lambda v: coerce_expr(v, from_dt.valueType, to_dt.valueType)
        )
        return F.when(col.isNull(), F.lit(None).cast(to_dt)).otherwise(
            F.map_from_arrays(keys, vals)
        )
    return col.cast(to_dt)


#: Spark type → arrow-rs ``DataType`` Display name, so type-mismatch
#: errors print byte-identically to schema_parser.rs:562-565 (the
#: reference formats the *Arrow* type). Nested types fall back to
#: Spark's rendering — the reference's Debug-derived nested output is
#: a Rust struct dump no SQL user should ever see.
_ARROW_NAMES = {
    ByteType(): "Int8",
    ShortType(): "Int16",
    IntegerType(): "Int32",
    LongType(): "Int64",
    FloatType(): "Float32",
    DoubleType(): "Float64",
    StringType(): "Utf8",
    BinaryType(): "Binary",
    BooleanType(): "Boolean",
    DateType(): "Date32",
    TimestampNTZType(): "Timestamp(Microsecond, None)",
    TimestampType(): 'Timestamp(Microsecond, Some("UTC"))',
}


def _arrow_type_name(dt: DataType) -> str:
    if isinstance(dt, DecimalType):
        return f"Decimal128({dt.precision}, {dt.scale})"
    return _ARROW_NAMES.get(dt, dt.simpleString())


def match_and_coerce(df, target_schema: StructType, match_by: str):
    """Strict-match ``df`` (the file schema) against ``target_schema``.

    Returns a DataFrame with the target's column names/order and coerced
    types, or raises :class:`SchemaMatchError`.
    """
    file_fields = df.schema.fields
    out_cols: list[Column] = []
    if match_by == "position":
        if len(file_fields) != len(target_schema.fields):
            raise SchemaMatchError(
                "column count mismatch between table and parquet file. "
                f"parquet file has {len(file_fields)} columns, "
                f"but table has {len(target_schema.fields)} columns"
            )
        pairs = list(zip(file_fields, target_schema.fields))
    else:
        by_name = {f.name: f for f in file_fields}
        pairs = []
        for t in target_schema.fields:
            if t.name not in by_name:
                raise SchemaMatchError(
                    f'column "{t.name}" is not found in parquet file'
                )
            pairs.append((by_name[t.name], t))

    for f, t in pairs:
        if f.dataType != t.dataType and not is_coercible(f.dataType, t.dataType):
            raise SchemaMatchError(
                f'type mismatch for column "{t.name}" between table and '
                f'parquet file.\n\ntable has "{_arrow_type_name(t.dataType)}"'
                f'\n\nparquet file has "{_arrow_type_name(f.dataType)}"'
            )
        out_cols.append(coerce_expr(F.col(f.name), f.dataType, t.dataType).alias(t.name))
    return df.select(*out_cols)


def schema_drift_report(
    incoming: StructType, target: StructType
) -> list[dict]:
    """Ingest-time schema-drift guard (r11): classify every column of
    an arriving batch against the corpus schema BEFORE any data moves —
    the check a long-lived ingest pipeline runs when an upstream
    producer redeploys. One dict per column name (union of both
    schemas), ``status`` ∈:

    - ``ok``          — present both sides, identical type;
    - ``coercible``   — type changed but inside the PG explicit-cast
                        allowlist (:func:`is_coercible`) — ingest can
                        proceed through ``match_and_coerce``;
    - ``incompatible``— type changed outside the allowlist — ingest
                        must stop (silently casting here is how corpora
                        rot);
    - ``missing``     — in the corpus, absent from the batch (reader
                        fills NULL under match_by=name semantics);
    - ``new``         — in the batch, unknown to the corpus (dropped by
                        match_by=name; surfaced so the producer change
                        is a decision, not an accident).

    Driver-side only — schemas, not data; pair with
    ``match_and_coerce`` to act on the verdicts."""
    inc = {f.name: f.dataType for f in incoming.fields}
    tgt = {f.name: f.dataType for f in target.fields}
    out = []
    for name in sorted(set(inc) | set(tgt)):
        if name in inc and name in tgt:
            if inc[name] == tgt[name]:
                status = "ok"
            elif is_coercible(inc[name], tgt[name]):
                status = "coercible"
            else:
                status = "incompatible"
        elif name in tgt:
            status = "missing"
        else:
            status = "new"
        out.append(
            {
                "column": name,
                "status": status,
                "incoming_type": inc[name].simpleString() if name in inc else None,
                "target_type": tgt[name].simpleString() if name in tgt else None,
            }
        )
    return out
