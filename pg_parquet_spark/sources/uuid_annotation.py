"""Post-write logical-type annotation for parquet footers (UUID + JSON).

The reference writes PG ``uuid`` columns as FixedLenByteArray(16) with
the ``UUID`` logical type (schema_parser.rs:360-365) and PG ``json`` /
``jsonb`` columns as UTF8 byte arrays with the ``JSON`` logical type +
``JSON`` converted type (schema_parser.rs:409-410; parquet_udfs/
schema.rs:130,160 report both). pyarrow < 18 has no ``pa.uuid()`` and
no JSON extension type, so the writer can only emit plain FLBA(16) /
STRING-annotated UTF8. This module closes the gap (VERDICT r2 #8, r3
JSON half of #4) by patching the file footer in place: it re-encodes
each target column's SchemaElement with the requested
``logicalType`` — replacing an existing one (pyarrow stamps STRING on
text columns) — and, for JSON, the ``converted_type`` as well.

Only the schema list is parsed; everything after it is copied verbatim.
No thrift library needed: the compact protocol subset used by parquet
footers is ~100 lines.
"""

from __future__ import annotations

import struct

# compact-protocol wire types
_STOP = 0
_BOOL_TRUE = 1
_BOOL_FALSE = 2
_BYTE = 3
_I16 = 4
_I32 = 5
_I64 = 6
_DOUBLE = 7
_BINARY = 8
_LIST = 9
_SET = 10
_MAP = 11
_STRUCT = 12

#: LogicalType union member field ids (parquet.thrift LogicalType)
_LOGICAL_UNION_FIELD = {"UUID": 14, "JSON": 12}
#: ConvertedType enum values to stamp alongside (parquet.thrift Type);
#: UUID has no converted type — only JSON does (JSON = 19)
_CONVERTED_VALUE = {"JSON": 19}

#: SchemaElement field ids (parquet.thrift)
_SE_CONVERTED_TYPE = 6
_SE_LOGICAL_TYPE = 10
_SE_NAME = 4


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _write_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _logical_type_struct(kind: str) -> bytes:
    """Value bytes of a ``LogicalType`` struct whose single (union)
    member is the empty struct for ``kind`` — e.g. UUID(14):
    ``[0xEC STOP STOP]`` (short-form header (14<<4)|STRUCT, inner
    empty struct, outer STOP)."""
    fid = _LOGICAL_UNION_FIELD[kind]
    return bytes([(fid << 4) | _STRUCT, _STOP, _STOP])


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _skip(buf: bytes, pos: int, ctype: int) -> int:
    """Advance past one value of the given compact wire type."""
    if ctype in (_BOOL_TRUE, _BOOL_FALSE):
        return pos
    if ctype == _BYTE:
        return pos + 1
    if ctype in (_I16, _I32, _I64):
        return _read_varint(buf, pos)[1]
    if ctype == _DOUBLE:
        return pos + 8
    if ctype == _BINARY:
        n, pos = _read_varint(buf, pos)
        return pos + n
    if ctype in (_LIST, _SET):
        head = buf[pos]
        pos += 1
        size, elem = head >> 4, head & 0x0F
        if size == 0x0F:
            size, pos = _read_varint(buf, pos)
        for _ in range(size):
            pos = _skip(buf, pos, elem)
        return pos
    if ctype == _MAP:
        size, pos = _read_varint(buf, pos)
        if size == 0:
            return pos
        kv = buf[pos]
        pos += 1
        for _ in range(size):
            pos = _skip(buf, pos, kv >> 4)
            pos = _skip(buf, pos, kv & 0x0F)
        return pos
    if ctype == _STRUCT:
        last_id = 0
        while True:
            header = buf[pos]
            pos += 1
            if header == _STOP:
                return pos
            delta, ftype = header >> 4, header & 0x0F
            if delta:
                last_id += delta
            else:
                z, pos = _read_varint(buf, pos)
                last_id = (z >> 1) ^ -(z & 1)
            pos = _skip(buf, pos, ftype)
    raise ValueError(f"unknown compact thrift type {ctype}")


def _parse_struct_fields(buf: bytes, pos: int) -> tuple[list[tuple[int, int, bytes]], int]:
    """Parse one struct's fields as ``(field_id, wire_type, value_bytes)``
    triples (bools carry the value in the wire type, value_bytes empty).
    Returns (fields, pos_after_stop)."""
    fields: list[tuple[int, int, bytes]] = []
    fid = 0
    while True:
        h = buf[pos]
        pos += 1
        if h == _STOP:
            return fields, pos
        d, ft = h >> 4, h & 0x0F
        if d:
            fid += d
        else:
            z, pos = _read_varint(buf, pos)
            fid = (z >> 1) ^ -(z & 1)
        vstart = pos
        pos = _skip(buf, pos, ft)
        fields.append((fid, ft, buf[vstart:pos]))


def _emit_struct_fields(fields: list[tuple[int, int, bytes]]) -> bytes:
    """Re-encode ``(field_id, wire_type, value_bytes)`` triples in field-id
    order with compact headers, terminated by STOP."""
    out = bytearray()
    last = 0
    for fid, ft, val in sorted(fields, key=lambda f: f[0]):
        delta = fid - last
        if 1 <= delta <= 15:
            out.append((delta << 4) | ft)
        else:
            out.append(ft)
            out += _write_varint(_zigzag(fid))
        out += val
        last = fid
    out.append(_STOP)
    return bytes(out)


def _patch_schema_elements(meta: bytes, mapping: dict[str, str]) -> bytes:
    """Return FileMetaData bytes with the requested logical types stamped
    on the SchemaElements named in ``mapping`` (column → 'UUID'|'JSON'),
    replacing any logicalType / converted_type already present."""
    pos = 0
    last_id = 0
    while True:
        header = meta[pos]
        pos += 1
        if header == _STOP:
            return meta  # no schema field found — nothing to patch
        delta, ftype = header >> 4, header & 0x0F
        if delta:
            last_id += delta
        else:
            z, pos = _read_varint(meta, pos)
            last_id = (z >> 1) ^ -(z & 1)
        if last_id != 2:  # FileMetaData.schema is field 2
            pos = _skip(meta, pos, ftype)
            continue
        # list<SchemaElement>
        head = meta[pos]
        pos += 1
        size, elem = head >> 4, head & 0x0F
        if size == 0x0F:
            size, pos = _read_varint(meta, pos)
        if elem != _STRUCT:
            raise ValueError("FileMetaData.schema is not a list of structs")
        out = bytearray(meta[:pos])
        for _ in range(size):
            start = pos
            fields, pos = _parse_struct_fields(meta, start)
            name = None
            for fid, ft, val in fields:
                if fid == _SE_NAME and ft == _BINARY:
                    n, p2 = _read_varint(val, 0)
                    name = val[p2 : p2 + n].decode("utf-8", "replace")
            kind = mapping.get(name)
            if kind is None:
                out += meta[start:pos]
                continue
            kept = [
                f for f in fields if f[0] not in (_SE_LOGICAL_TYPE, _SE_CONVERTED_TYPE)
            ]
            conv = next((f for f in fields if f[0] == _SE_CONVERTED_TYPE), None)
            if kind in _CONVERTED_VALUE:
                kept.append(
                    (
                        _SE_CONVERTED_TYPE,
                        _I32,
                        _write_varint(_zigzag(_CONVERTED_VALUE[kind])),
                    )
                )
            elif conv is not None:
                kept.append(conv)  # UUID: leave converted type untouched
            kept.append((_SE_LOGICAL_TYPE, _STRUCT, _logical_type_struct(kind)))
            out += _emit_struct_fields(kept)
        out += meta[pos:]
        return bytes(out)


def annotate_logical_types(path: str, mapping: dict[str, str]) -> None:
    """Stamp logical types (``{'col': 'UUID'|'JSON'}``) on the named
    columns of the parquet file at ``path`` by rewriting its footer in
    place. JSON also replaces the converted type (UTF8 → JSON) for
    parquet_udfs/schema.rs:160 parity."""
    if not mapping:
        return
    unknown = set(mapping.values()) - set(_LOGICAL_UNION_FIELD)
    if unknown:
        raise ValueError(f"unsupported logical annotation(s): {sorted(unknown)}")
    with open(path, "rb") as f:
        data = f.read()
    if data[-4:] != b"PAR1":
        raise ValueError(f"{path} is not a parquet file")
    (meta_len,) = struct.unpack("<I", data[-8:-4])
    meta_start = len(data) - 8 - meta_len
    patched = _patch_schema_elements(data[meta_start : meta_start + meta_len], mapping)
    with open(path, "wb") as f:
        f.write(data[:meta_start])
        f.write(patched)
        f.write(struct.pack("<I", len(patched)))
        f.write(b"PAR1")


def annotate_uuid_columns(path: str, columns: list[str]) -> None:
    """Stamp ``logical_type: UUID`` on the named FLBA(16) columns."""
    annotate_logical_types(path, {c: "UUID" for c in columns})
