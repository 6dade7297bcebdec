"""Parquet field-id stamping: none | auto | explicit JSON.

Reference semantics (src/arrow_parquet/field_ids.rs:6-177,
src/arrow_parquet/schema_parser.rs:51-137):

- ``auto`` — a DFS *pre-order* counter starting at 0; group nodes
  (struct/list/map roots) get their id *before* their children.
- explicit — nested JSON ``{"col": 1, "b": {"__root_field_id": 2,
  "x": 3}}``; list children addressed as ``element``, map children as
  ``key``/``val``; a mapping entry naming a field absent from the schema
  errors; unmapped fields simply get no id.
- duplicate assigned ids error (schema_parser.rs:96-103).

Spark writes ids it finds in StructField metadata (``parquet.field.id``)
but cannot stamp list/map internals, so full-fidelity stamping happens on
the pyarrow schema in the single-file writer path; the Spark distributed
path supports ``auto``/explicit for struct-reachable nodes only.
"""

from __future__ import annotations

import json
from typing import Any

import pyarrow as pa

PARQUET_FIELD_ID_KEY = b"PARQUET:field_id"


class FieldIdError(ValueError):
    pass


def parse_field_ids(field_ids: str | dict | None) -> str | dict:
    if field_ids is None:
        return "none"
    if isinstance(field_ids, dict):
        return field_ids
    s = str(field_ids)
    if s in ("none", "auto"):
        return s
    try:
        mapping = json.loads(s)
    except json.JSONDecodeError:
        raise FieldIdError("invalid JSON string for field_ids") from None
    if not isinstance(mapping, dict):
        raise FieldIdError("invalid JSON string for field_ids")
    return mapping


class _Context:
    """Mirror of FieldIdMappingContext (schema_parser.rs:58-137)."""

    def __init__(self, field_ids: str | dict):
        self.mode = field_ids
        self.counter = 0
        self.path: list[str] = []
        self.assigned: set[int] = set()

    def _lookup(self, mapping: dict, path: list[str]) -> int | None:
        node: Any = mapping
        for part in path:
            if not isinstance(node, dict):
                return None
            if part not in node:
                return None
            node = node[part]
        return node if isinstance(node, int) else None

    def next_field_id(self) -> int | None:
        if self.mode == "none":
            fid = None
        elif self.mode == "auto":
            fid = self.counter
            self.counter += 1
        else:
            fid = self._lookup(self.mode, self.path)
        if fid is not None:
            if fid in self.assigned:
                raise FieldIdError(f'duplicate field id {fid} in "field_ids"')
            self.assigned.add(fid)
        return fid

    def next_root_field_id(self) -> int | None:
        self.path.append("__root_field_id")
        try:
            return self.next_field_id()
        finally:
            self.path.pop()


def _with_id(field: pa.Field, fid: int | None) -> pa.Field:
    if fid is None:
        return field
    md = dict(field.metadata or {})
    md[PARQUET_FIELD_ID_KEY] = str(fid).encode()
    return field.with_metadata(md)


def _visit(field: pa.Field, ctx: _Context) -> pa.Field:
    t = field.type
    if pa.types.is_struct(t):
        ctx.path.append(field.name)
        fid = ctx.next_root_field_id()
        children = [_visit(t.field(i), ctx) for i in range(t.num_fields)]
        ctx.path.pop()
        return _with_id(
            pa.field(field.name, pa.struct(children), field.nullable), fid
        )
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        ctx.path.append(field.name)
        fid = ctx.next_root_field_id()
        elem = t.value_field.with_name("element")
        elem = _visit(elem, ctx)
        ctx.path.pop()
        return _with_id(pa.field(field.name, pa.list_(elem), field.nullable), fid)
    if pa.types.is_map(t):
        # map id == entries-struct root id (schema_parser.rs:305-337)
        ctx.path.append(field.name)
        fid = ctx.next_root_field_id()
        key = _visit_map_child(t.key_field, "key", ctx)
        val = _visit_map_child(t.item_field, "val", ctx)
        ctx.path.pop()
        return _with_id(
            pa.field(field.name, pa.map_(key, val), field.nullable), fid
        )
    ctx.path.append(field.name)
    fid = ctx.next_field_id()
    ctx.path.pop()
    return _with_id(field, fid)


def _visit_map_child(field: pa.Field, json_name: str, ctx: _Context) -> pa.Field:
    # JSON addresses map children as key/val (field_ids.rs:126-142);
    # pyarrow names them key/value — translate for the path lookup only.
    saved = field.name
    renamed = field.with_name(json_name)
    out = _visit(renamed, ctx)
    return out.with_name(saved)


def _validate_mapping(mapping: dict, schema_fields: list[pa.Field]) -> None:
    """Every mapped name must exist (field_ids.rs:73-154)."""
    by_name = {f.name: f for f in schema_fields}
    for name, item in mapping.items():
        if name == "__root_field_id":
            continue
        if name not in by_name:
            raise FieldIdError(
                f"Field '{name}' in the mapping does not exist in the Arrow "
                f"schema.\nAvailable fields: {[f.name for f in schema_fields]}"
            )
        if isinstance(item, dict):
            t = by_name[name].type
            if pa.types.is_struct(t):
                _validate_mapping(item, [t.field(i) for i in range(t.num_fields)])
            elif pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
                _validate_mapping(item, [t.value_field.with_name("element")])
            elif pa.types.is_map(t):
                _validate_mapping(
                    item,
                    [t.key_field.with_name("key"), t.item_field.with_name("val")],
                )
            else:
                raise FieldIdError(
                    f"Field '{name}' is not a nested type; expected an integer id"
                )
        elif not isinstance(item, int):
            raise FieldIdError(f"invalid field id for '{name}'")


def stamp_field_ids(schema: pa.Schema, field_ids: str | dict | None) -> pa.Schema:
    """Return a new pyarrow schema with PARQUET:field_id metadata."""
    mode = parse_field_ids(field_ids)
    if mode == "none":
        return schema
    if isinstance(mode, dict):
        _validate_mapping(mode, [schema.field(i) for i in range(len(schema))])
    ctx = _Context(mode)
    fields = [_visit(schema.field(i), ctx) for i in range(len(schema))]
    return pa.schema(fields, metadata=schema.metadata)


def spark_schema_with_field_ids(spark_schema, field_ids: str | dict | None):
    """Stamp ``parquet.field.id`` into StructField metadata for the Spark
    distributed write path. Covers top-level and struct-nested fields;
    list/map internals require the pyarrow path (documented deviation).
    """
    from pyspark.sql.types import StructField, StructType

    mode = parse_field_ids(field_ids)
    if mode == "none":
        return spark_schema
    ctx = _Context(mode)

    def visit(field: StructField) -> StructField:
        from pyspark.sql.types import ArrayType, MapType

        dt = field.dataType
        md = dict(field.metadata or {})
        if isinstance(dt, StructType):
            ctx.path.append(field.name)
            fid = ctx.next_root_field_id()
            new_dt = StructType([visit(f) for f in dt.fields])
            ctx.path.pop()
        elif isinstance(dt, (ArrayType, MapType)):
            ctx.path.append(field.name)
            fid = ctx.next_root_field_id()
            # burn counter ids for unreachable internals to keep auto
            # numbering aligned with the pyarrow path
            if isinstance(dt, ArrayType):
                ctx.path.append("element")
                ctx.next_field_id()
                ctx.path.pop()
            else:
                for child in ("key", "val"):
                    ctx.path.append(child)
                    ctx.next_field_id()
                    ctx.path.pop()
            new_dt = dt
            ctx.path.pop()
        else:
            ctx.path.append(field.name)
            fid = ctx.next_field_id()
            ctx.path.pop()
            new_dt = dt
        if fid is not None:
            md["parquet.field.id"] = fid
        return StructField(field.name, new_dt, field.nullable, md)

    return StructType([visit(f) for f in spark_schema.fields])
