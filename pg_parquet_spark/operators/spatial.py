"""Grid-blocked spatial containment join (r14 — the blocking pattern
on the geometric axis).

The reference stores geometry as WKB binary and delegates every
spatial predicate to PostGIS (/root/reference/src/type_compat/
geometry.rs:277-357 — pg_parquet itself never evaluates
`ST_Contains`); a Spark user running the same point-in-region
workload needs the JOIN STRATEGY, which neither engine supplies
natively: a naive `points CROSS JOIN regions ON contains(...)` is a
CartesianProduct — O(P·R) comparisons, the exact shape Catalyst
cannot save you from because the predicate is not an equi-key.

The fix is the classic uniform-grid blocking (the spatial twin of
LSH banding in :mod:`dedup` and IVF cells in :mod:`similarity`):

1. quantize space into ``cell``-sized squares;
2. each POINT lands in exactly ONE cell (integer div of each axis);
3. each RECTANGLE expands to the (bounded) set of cells it overlaps;
4. an equi-join on (cell_x, cell_y) + the exact containment filter.

Because a point's cell is unique and a rectangle lists each covered
cell once, every qualifying (rect, point) pair is produced EXACTLY
once — no post-join distinct, so the only exchanges are the two
hash-partitions on the cell key. Completeness is proven by equality
against the brute-force all-pairs DuckDB oracle (x_spatial_join —
the oracle IS the cross join, the Spark side never is).

Scale shape at 100 TB: fan-out per rectangle is
``ceil(extent/cell)+1`` cells per axis, guarded LOUDLY (raise_error,
not silent explosion) by ``max_cells_per_axis`` — the caller picks a
cell size on the order of the typical rectangle extent, which keeps
the blow-up ≤ 4-9 rows per rectangle while cells stay selective.
Hot cells (urban-density skew) are plain groupBy skew, handled by
AQE skew-join like every other key shuffle in the engine.

Coordinates here are INTEGERS (the md5-prefix uniform grid of
:mod:`sampling` — both engines derive identical values), so equality
is exact with no float epsilon anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: md5-prefix space is [0, 2^24); SPAN divides it so `% SPAN` stays
#: uniform. 2^20 positions per axis → a 1M×1M integer grid.
SPAN_BITS = 20
SPAN = 1 << SPAN_BITS

#: default rectangle extent bound (2^16) and matching cell size: a
#: rectangle never spans more than 2 cells per axis.
EXTENT_BITS = 16
DEFAULT_CELL = 1 << 16


def _hash_axis(col, tag: str):
    """Uniform integer in [0, SPAN) from the md5 prefix of tag:value —
    the content-hash determinism idiom (sampling.hash_fraction), with
    a DuckDB twin in the oracle builders below."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(tag), col.cast("string"))), 1, 6),
            16,
            10,
        ).cast("long")
        % SPAN
    )


def hash_points(df: DataFrame, id_col: str) -> DataFrame:
    """Synthetic point layer: (point_id, px, py) with both axes
    hash-derived from the id — the deterministic stand-in for a real
    lat/lon pair (the engines must agree bit-for-bit, so the fixture
    coordinates are content-hashed, never RNG). NULL ids drop."""
    c = F.col(id_col)
    return df.filter(c.isNotNull()).select(
        c.cast("long").alias("point_id"),
        _hash_axis(c, "ptx:").alias("px"),
        _hash_axis(c, "pty:").alias("py"),
    )


def hash_rects(
    df: DataFrame, id_col: str, extent_bits: int = EXTENT_BITS
) -> DataFrame:
    """Synthetic rectangle layer: (rect_id, xmin, ymin, xmax, ymax)
    with hash-derived corner and extents in [0, 2^extent_bits). Edges
    may poke past SPAN — containment simply finds fewer points there
    (no wrap-around)."""
    if not (1 <= extent_bits <= SPAN_BITS):
        raise ValueError(
            f"extent_bits must be in [1, {SPAN_BITS}], got {extent_bits}"
        )
    c = F.col(id_col)
    ext = 1 << extent_bits
    return df.filter(c.isNotNull()).select(
        c.cast("long").alias("rect_id"),
        _hash_axis(c, "rcx:").alias("xmin"),
        _hash_axis(c, "rcy:").alias("ymin"),
        (_hash_axis(c, "rcx:") + (_hash_axis(c, "rcw:") % ext)).alias("xmax"),
        (_hash_axis(c, "rcy:") + (_hash_axis(c, "rch:") % ext)).alias("ymax"),
    )


def grid_containment_join(
    points: DataFrame,
    rects: DataFrame,
    cell: int = DEFAULT_CELL,
    max_cells_per_axis: int = 4,
) -> DataFrame:
    """All (rect_id, point_id, px, py) pairs where the point lies
    INSIDE the rectangle (inclusive on all four edges), via the grid
    equi-join — never a CartesianProduct.

    ``points`` must carry (point_id, px, py), ``rects``
    (rect_id, xmin, ymin, xmax, ymax); all integer-valued. Rows with
    any NULL coordinate drop (a NULL coordinate is an unlocatable
    geometry, identical in the oracle). A rectangle overlapping more
    than ``max_cells_per_axis`` grid columns or rows raises at
    execution (the caller's cell size is wrong for that data — a
    silent 10⁶-cell explode would be the 100 TB accident).

    Exactly-once by construction: a point has ONE cell, a rectangle
    emits each covered cell ONCE, so no dedup pass follows the join.
    Degenerate rectangles (xmax < xmin after coordinate bugs) emit no
    cells and no pairs in either engine.
    """
    if cell <= 0:
        raise ValueError(f"cell must be positive, got {cell}")
    if max_cells_per_axis < 1:
        raise ValueError(
            f"max_cells_per_axis must be >= 1, got {max_cells_per_axis}"
        )
    for col, frame, name in (
        ("point_id", points, "points"),
        ("px", points, "points"),
        ("py", points, "points"),
        ("rect_id", rects, "rects"),
        ("xmin", rects, "rects"),
        ("ymin", rects, "rects"),
        ("xmax", rects, "rects"),
        ("ymax", rects, "rects"),
    ):
        if col not in frame.columns:
            raise ValueError(f"{name} is missing required column {col!r}")

    p = points.filter(
        F.col("px").isNotNull() & F.col("py").isNotNull()
    ).select(
        "point_id",
        F.col("px").cast("long").alias("px"),
        F.col("py").cast("long").alias("py"),
        # exact integer floor-div — a double FLOOR(x/cell) silently
        # loses precision past 2^52 and would misplace cells (review)
        F.expr(f"(px - pmod(px, {cell})) div {cell}").alias("_cx"),
        F.expr(f"(py - pmod(py, {cell})) div {cell}").alias("_cy"),
    )

    # inverted rectangles must emit NOTHING (the oracle's BETWEEN
    # matches nothing) — and must be dropped BEFORE the explode:
    # F.sequence(start, stop) defaults to step -1 when start > stop,
    # so an inverted rect would generate a huge DESCENDING cell list
    # that also slips past the span guard (negative span < max)
    # (review, r14)
    r = rects.filter(
        F.col("xmin").isNotNull()
        & F.col("ymin").isNotNull()
        & F.col("xmax").isNotNull()
        & F.col("ymax").isNotNull()
        & (F.col("xmax") >= F.col("xmin"))
        & (F.col("ymax") >= F.col("ymin"))
    ).select(
        "rect_id",
        F.col("xmin").cast("long").alias("xmin"),
        F.col("ymin").cast("long").alias("ymin"),
        F.col("xmax").cast("long").alias("xmax"),
        F.col("ymax").cast("long").alias("ymax"),
    )
    fd = "(({0} - pmod({0}, " + str(cell) + ")) div " + str(cell) + ")"
    guard = (
        f"IF(GREATEST("
        f"  {fd.format('xmax')} - {fd.format('xmin')},"
        f"  {fd.format('ymax')} - {fd.format('ymin')}"
        f") < {int(max_cells_per_axis)},"
        " 1L,"
        " raise_error(CONCAT('grid_containment_join: rectangle ', "
        "   CAST(rect_id AS STRING), "
        f"  ' spans more than {int(max_cells_per_axis)} cells per axis "
        f"at cell={cell} — raise cell or max_cells_per_axis')))"
    )
    r_cells = (
        r.withColumn("_g", F.expr(guard))
        .withColumn(
            "_cx",
            F.explode(
                F.sequence(
                    F.expr(f"{fd.format('xmin')} * _g"),
                    F.expr(fd.format("xmax")),
                )
            ),
        )
        .withColumn(
            "_cy",
            F.explode(
                F.sequence(
                    F.expr(fd.format("ymin")),
                    F.expr(fd.format("ymax")),
                )
            ),
        )
        .drop("_g")
    )

    return (
        r_cells.join(p, ["_cx", "_cy"])
        .filter(
            (F.col("px") >= F.col("xmin"))
            & (F.col("px") <= F.col("xmax"))
            & (F.col("py") >= F.col("ymin"))
            & (F.col("py") <= F.col("ymax"))
        )
        .select("rect_id", "point_id", "px", "py")
    )


def spatial_join_oracle_sql(
    point_table: str = "customer",
    point_id: str = "c_custkey",
    rect_table: str = "supplier",
    rect_id: str = "s_suppkey",
    extent_bits: int = EXTENT_BITS,
) -> str:
    """DuckDB replica — deliberately the BRUTE-FORCE cross join with
    the containment predicate: equality against it is the proof that
    the grid blocking loses no pair and invents none."""
    ext = 1 << extent_bits

    def hx(tag: str, col: str) -> str:
        return (
            f"CAST(CONCAT('0x', substr(md5('{tag}' || "
            f"CAST({col} AS VARCHAR)), 1, 6)) AS BIGINT) % {SPAN}"
        )

    return f"""
WITH pts AS (
  SELECT CAST({point_id} AS BIGINT) AS point_id,
         {hx("ptx:", point_id)} AS px,
         {hx("pty:", point_id)} AS py
  FROM {point_table} WHERE {point_id} IS NOT NULL
), rcs AS (
  SELECT CAST({rect_id} AS BIGINT) AS rect_id,
         {hx("rcx:", rect_id)} AS xmin,
         {hx("rcy:", rect_id)} AS ymin,
         {hx("rcx:", rect_id)} + ({hx("rcw:", rect_id)} % {ext}) AS xmax,
         {hx("rcy:", rect_id)} + ({hx("rch:", rect_id)} % {ext}) AS ymax
  FROM {rect_table} WHERE {rect_id} IS NOT NULL
)
SELECT rect_id, point_id, px, py
FROM rcs, pts
WHERE px BETWEEN xmin AND xmax AND py BETWEEN ymin AND ymax
ORDER BY rect_id, point_id
"""


def nearest_neighbor_join(
    a: DataFrame,
    b: DataFrame,
    d_max: int,
    cell: int | None = None,
) -> DataFrame:
    """Bounded-radius nearest neighbor (r14 — the second spatial
    primitive): for every point in ``a``, the closest point of ``b``
    within Euclidean distance ``d_max`` (NULL columns when none) —
    geocoding's "nearest store within 10 km" join.

    Completeness by geometry, not enumeration: with ``cell ≥ d_max``
    (enforced), ANY b within d_max of a lies in one of the 3×3 cells
    around a's cell — so the plan is a 9-way replicate of the A side
    (a bounded literal explode; B is never replicated), one cell-keyed
    equi-join, the exact distance² filter (pure integer — no sqrt,
    d_max² compares exactly), and a per-a MIN over a (dist², b_id)
    struct — the deterministic smallest-id tie rule. Equality against
    the brute-force all-pairs oracle (x_spatial_nn) proves both
    completeness and the tie rule.

    ``a`` and ``b`` both carry (point_id, px, py); NULL coordinates
    drop (an unlocatable point matches nothing and finds nothing).
    Returns (point_id, nn_id, dist2) for EVERY a point, ordered.

    Scale shape: two hash shuffles on the cell key + one a-keyed MIN
    aggregate; hot cells are AQE skew keys. 9× replication of the
    smaller/probe side is the classic fixed-radius trade — for
    multi-resolution radii, re-run with a coarser cell."""
    if d_max <= 0:
        raise ValueError(f"d_max must be positive, got {d_max}")
    cell = int(cell) if cell is not None else int(d_max)
    if cell < d_max:
        raise ValueError(
            f"cell ({cell}) must be >= d_max ({d_max}) — the 3x3 "
            "neighborhood would miss in-radius points"
        )
    for frame, name in ((a, "a"), (b, "b")):
        for col in ("point_id", "px", "py"):
            if col not in frame.columns:
                raise ValueError(f"{name} is missing required column {col!r}")

    def with_cell(df, prefix):
        return df.filter(
            F.col("px").isNotNull() & F.col("py").isNotNull()
        ).select(
            F.col("point_id").alias(f"{prefix}_id"),
            F.col("px").cast("long").alias(f"{prefix}x"),
            F.col("py").cast("long").alias(f"{prefix}y"),
            F.expr(f"(px - pmod(px, {cell})) div {cell}").alias("_cx"),
            F.expr(f"(py - pmod(py, {cell})) div {cell}").alias("_cy"),
        )

    aa = with_cell(a, "a")
    bb = with_cell(b, "b")
    probes = aa.select(
        "a_id",
        "ax",
        "ay",
        F.explode(F.expr("array(-1L, 0L, 1L)")).alias("_dx"),
        "_cx",
        "_cy",
    ).select(
        "a_id",
        "ax",
        "ay",
        (F.col("_cx") + F.col("_dx")).alias("_cx"),
        F.explode(F.expr("array(_cy - 1L, _cy, _cy + 1L)")).alias("_cy"),
    )
    d2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    found = (
        probes.join(bb, ["_cx", "_cy"])
        .select("a_id", d2.alias("_d2"), "b_id")
        .filter(F.col("_d2") <= F.lit(int(d_max) * int(d_max)))
        .groupBy("a_id")
        .agg(F.min(F.struct("_d2", "b_id")).alias("_best"))
        .select(
            "a_id",
            F.col("_best.b_id").alias("nn_id"),
            F.col("_best._d2").alias("dist2"),
        )
    )
    return (
        aa.select("a_id")
        .join(found, "a_id", "left")
        .select(F.col("a_id").alias("point_id"), "nn_id", "dist2")
        .orderBy("point_id")
    )


def nn_join_oracle_sql(
    a_table: str = "customer",
    a_id: str = "c_custkey",
    b_table: str = "supplier",
    b_id: str = "s_suppkey",
    d_max: int = 16384,
) -> str:
    """DuckDB replica — brute-force all-pairs min with the identical
    (dist², id) tie rule: equality proves the 3×3 blocking complete."""
    def hx(tag: str, col: str) -> str:
        return (
            f"CAST(CONCAT('0x', substr(md5('{tag}' || "
            f"CAST({col} AS VARCHAR)), 1, 6)) AS BIGINT) % {SPAN}"
        )

    return f"""
WITH pa AS (
  SELECT CAST({a_id} AS BIGINT) AS point_id,
         {hx("ptx:", a_id)} AS ax, {hx("pty:", a_id)} AS ay
  FROM {a_table} WHERE {a_id} IS NOT NULL
), pb AS (
  SELECT CAST({b_id} AS BIGINT) AS b_id,
         {hx("ptx:", b_id)} AS bx, {hx("pty:", b_id)} AS by
  FROM {b_table} WHERE {b_id} IS NOT NULL
), pairs AS (
  SELECT pa.point_id, pb.b_id,
         (ax - bx) * (ax - bx) + (ay - by) * (ay - by) AS d2
  FROM pa, pb
  WHERE (ax - bx) * (ax - bx) + (ay - by) * (ay - by)
        <= {int(d_max)} * {int(d_max)}
), best AS (
  SELECT point_id, b_id AS nn_id, d2 AS dist2,
         ROW_NUMBER() OVER (PARTITION BY point_id
                            ORDER BY d2, b_id) AS rn
  FROM pairs
)
SELECT pa.point_id, best.nn_id, best.dist2
FROM pa LEFT JOIN best ON pa.point_id = best.point_id AND best.rn = 1
ORDER BY pa.point_id
"""
