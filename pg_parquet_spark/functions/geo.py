"""Geometry / GeoParquet 1.1 support (SURVEY.md A29).

Reference behavior (src/type_compat/geometry.rs:43-165,
src/arrow_parquet/parquet_writer.rs:100-107): geometry columns are
WKB-encoded Binary; the writer stamps a ``geo`` key into the footer
kv metadata with GeoParquet 1.1 structure (version, primary_column,
per-column encoding + geometry_types).

Spark-side: WKB travels as BinaryType (opaque to the engine — exactly the
reference's posture, which delegates geometry math to PostGIS); this
module adds the GeoParquet metadata contract plus minimal WKB helpers for
tests (header-level type inspection — no geometry engine required, and
none is shipped in this container).
"""

from __future__ import annotations

import json
import struct

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GEOPARQUET_VERSION = "1.1.0"

#: WKB geometry type codes (little-endian uint32 after the byte-order byte)
WKB_TYPE_NAMES = {
    1: "Point",
    2: "LineString",
    3: "Polygon",
    4: "MultiPoint",
    5: "MultiLineString",
    6: "MultiPolygon",
    7: "GeometryCollection",
}


def wkb_point(x: float, y: float) -> bytes:
    """Little-endian WKB for POINT(x y) — test/fixture helper."""
    return struct.pack("<BIdd", 1, 1, x, y)


def wkb_geometry_type(blob: bytes) -> str | None:
    """Geometry type name from a WKB header (no geometry engine needed)."""
    if blob is None or len(blob) < 5:
        return None
    byte_order = blob[0]
    (code,) = struct.unpack_from("<I" if byte_order == 1 else ">I", blob, 1)
    return WKB_TYPE_NAMES.get(code % 1000)


def wkb_type_expr(col: Column | str) -> Column:
    """JVM-side geometry-type extraction from the WKB header (byte 0 =
    order, bytes 1-4 = type code) — usable in filters/groupBy without
    Python."""
    b = F.col(col) if isinstance(col, str) else col
    # bytes 2-5 as hex (substring on binary is byte-addressed, 1-based)
    h = F.hex(F.substring(b, 2, 4))
    le = F.concat(
        F.substring(h, 7, 2), F.substring(h, 5, 2), F.substring(h, 3, 2), F.substring(h, 1, 2)
    )
    be = h
    order_hex = F.hex(F.substring(b, 1, 1))
    code = (
        F.conv(F.when(order_hex == "01", le).otherwise(be), 16, 10).cast("int") % 1000
    )
    mapping = F.create_map(
        *[x for k, v in WKB_TYPE_NAMES.items() for x in (F.lit(k), F.lit(v))]
    )
    return F.element_at(mapping, code)


def geo_metadata(
    geometry_columns: dict[str, list[str]], primary: str | None = None
) -> str:
    """GeoParquet 1.1 ``geo`` footer JSON (geometry.rs:151-165 parity:
    version, primary_column, per-column WKB encoding + geometry_types)."""
    if not geometry_columns:
        raise ValueError("at least one geometry column is required")
    primary = primary or next(iter(geometry_columns))
    return json.dumps(
        {
            "version": GEOPARQUET_VERSION,
            "primary_column": primary,
            "columns": {
                name: {"encoding": "WKB", "geometry_types": types}
                for name, types in geometry_columns.items()
            },
        }
    )


def write_geoparquet(
    df: DataFrame,
    uri: str,
    geometry_columns: dict[str, list[str]] | list[str],
    primary: str | None = None,
    **options,
) -> list[str]:
    """Write ``df`` as GeoParquet: WKB binary columns + ``geo`` footer
    metadata. ``geometry_columns`` maps column → geometry_types (or a
    plain list of column names for unconstrained types)."""
    from pg_parquet_spark.sources.writer import write_parquet

    if isinstance(geometry_columns, list):
        geometry_columns = {c: [] for c in geometry_columns}
    for c in geometry_columns:
        if c not in df.columns:
            raise ValueError(f"geometry column {c!r} not in DataFrame")
        if dict(df.dtypes)[c] != "binary":
            raise ValueError(f"geometry column {c!r} must be WKB binary")
    meta = geo_metadata(geometry_columns, primary)
    return write_parquet(df, uri, kv_metadata={"geo": meta}, **options)
