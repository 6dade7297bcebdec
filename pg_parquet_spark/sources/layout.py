"""Dataset layout for scale: partitioned and bucketed Parquet
(beyond-reference — SURVEY.md §2.C notes pg_parquet has no
partitioned-dataset semantics; a 100 TB Spark engine lives on them).

- ``write_partitioned``: hive-style ``key=value`` directory layout →
  partition pruning (a filter on the partition key skips whole
  directories at planning time).
- ``write_bucketed``: hash-bucketed (optionally sorted) managed table →
  co-located, shuffle-free joins and aggregations on the bucket key.
  Two tables bucketed the same way join with ZERO Exchange in the plan
  (asserted in tests/test_layout.py) — at 100 TB this removes the
  dominant cost of the fact-fact join.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    uri: str,
    partition_by: list[str],
    compression: str = "snappy",
    mode: str = "overwrite",
) -> None:
    """Hive-layout partitioned write (directory per partition value).

    Partition columns should be low-cardinality (date buckets, region,
    lang); high-cardinality keys create a small-files problem — bucket
    those instead."""
    (
        df.write.mode(mode)
        .option("compression", compression)
        .partitionBy(*partition_by)
        .parquet(uri)
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_by: list[str],
    num_buckets: int = 32,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (and optionally sorted) managed parquet table.

    Matching ``num_buckets`` + ``bucket_by`` across tables makes their
    equi-join shuffle-free; ``sort_by`` additionally removes the sort
    from sort-merge joins."""
    spark = df.sparkSession
    # a previous session's managed-table directory survives catalog resets
    # (fresh derby metastore + leftover warehouse dir) — clear both
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    leftover = os.path.join(warehouse.replace("file:", ""), table_name.lower())
    if os.path.isdir(leftover):
        shutil.rmtree(leftover, ignore_errors=True)
    w = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *bucket_by)
    )
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table_name)


def zorder_expr(df: DataFrame, cols: list[str], bits: int = 8):
    """Morton (Z-order) interleave expression over quantile-bucketed
    columns — the multi-dimensional clustering key behind data skipping
    on MORE THAN ONE column (single-column sort tightens row-group
    min/max stats for that column only; Z-order tightens them for every
    interleaved column at once, the layout Delta Lake's OPTIMIZE ZORDER
    BY popularized).

    Per column: 2^bits − 1 quantile boundaries are fitted with
    ``approxQuantile`` (driver-side result is 255 floats per column —
    model fitting like the IVF/PQ codebooks, not data movement), the
    bucket index is a binary-search ``when`` tree (see _bucket_expr),
    and bit b of dimension i lands at interleaved position ``b·d + i``
    via a spread-table lookup (see _interleave). Everything after the
    quantile fit is a pure JVM projection — zero extra shuffle beyond
    the range partition the caller does for the write.
    """
    from pyspark.sql import functions as F

    # one multi-column quantile job, not one scan per column
    boundary_lists = df.approxQuantile(
        cols, [i / (1 << bits) for i in range(1, 1 << bits)], 0.001
    )
    return _interleave(
        [_bucket_expr(c, bounds) for c, bounds in zip(cols, boundary_lists)],
        bits,
    )


def _bucket_expr(c: str, bounds: list[float]):
    """Quantile-bucket index (count of boundaries ≤ value) as a
    binary-search ``when`` tree: log2(2^bits) codegen'd comparisons per
    row. The earlier literal-array-HOF formulation (count via
    F.filter) was 2^bits interpreted lambda calls per evaluation —
    and Catalyst's projection collapse inlines the bucket into every
    consumer, so the HOF ran once per interleave read (measured: 17.6 s
    vs 9.4 s total for a 600k-row 2-dim write; the z projection itself
    dropped to ~1.2 s warm)."""
    from pyspark.sql import functions as F

    val = F.col(c).cast("double")

    def build(lo: int, hi: int):
        # bucket index ∈ [lo, hi]; compare against bounds[mid]
        if lo == hi:
            return F.lit(lo)
        mid = (lo + hi) // 2
        return F.when(val >= bounds[mid], build(mid + 1, hi)).otherwise(
            build(lo, mid)
        )

    # NULL values fall through every >= to the lo branch → bucket 0,
    # matching the HOF-count semantics
    return build(0, len(bounds)).cast("long")


def _spread_table(bits: int, d: int) -> list[int]:
    """spread(v): bit b of v moved to position b*d (zeros between) —
    the per-dimension half of a Morton code, precomputed for all 2^bits
    bucket values."""
    out = []
    for v in range(1 << bits):
        s = 0
        for b in range(bits):
            if v >> b & 1:
                s |= 1 << (b * d)
        out.append(s)
    return out


def _interleave(bucket_cols: list, bits: int):
    """Morton bit-interleave: bit b of dim i → position b*d + i.
    Implemented as one literal spread-table lookup per dimension
    (z = Σ spread(bucket_i) << i), so each bucket expression is read
    EXACTLY once — bit-shift extraction would read it ``bits`` times
    and projection collapse would duplicate its whole subtree per
    read."""
    from pyspark.sql import functions as F

    d = len(bucket_cols)
    spread = F.array(*[F.lit(s).cast("long") for s in _spread_table(bits, d)])
    z = F.lit(0).cast("long")
    for i, bucket in enumerate(bucket_cols):
        z = z + F.shiftleft(
            F.element_at(spread, (bucket + 1).cast("int")), i
        )
    return z


def write_zordered(
    df: DataFrame,
    uri: str,
    zorder_by: list[str],
    bits: int = 8,
    num_files: int = 8,
    compression: str = "snappy",
    mode: str = "overwrite",
) -> None:
    """Z-order clustered parquet write: range-partition + sort the data
    by the Morton interleave of ``zorder_by`` so every row group's
    min/max footer stats are tight on ALL the interleaved columns — a
    conjunctive range filter on any subset of them then skips most row
    groups at scan time (tested against the unsorted layout in
    tests/test_layout.py).

    At 100 TB: one quantile-fit job + one range shuffle on an 8-byte
    key, then a locally-sorted write — the same cost shape as a global
    sort, but the skipping benefit applies to d columns instead of 1.
    ``num_files`` controls output granularity (at scale set it so files
    land near 1 GiB)."""
    z = zorder_expr(df, zorder_by, bits=bits)
    # spread the CPU-bound z projection over all cores before the range
    # shuffle — the source's file-partition count caps parallelism
    # otherwise (the similarity.py PQ-encode lever; locally 3 input
    # splits left 29 cores idle, 5.9 s → ~1 s)
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        df = df.repartition(par)
    (
        df.withColumn("_zorder", z)
        .repartitionByRange(num_files, "_zorder")
        .sortWithinPartitions("_zorder")
        .drop("_zorder")
        .write.mode(mode)
        .option("compression", compression)
        .parquet(uri)
    )


def merge_upsert(
    spark,
    base_uri: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_col: str | None = None,
) -> None:
    """SCD-1 MERGE into a plain-parquet dataset (the Delta-Lake
    ``MERGE WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT`` primitive,
    without a table format): rows in ``updates`` replace base rows with
    the same key; unmatched update rows are inserts. Implemented as the
    standard anti-join + union — one shuffle on the key columns.

    Scale behavior is governed by ``partition_col``: when the base is
    hive-partitioned on it and every update row carries it, ONLY the
    partitions that appear in ``updates`` are read, merged, and
    rewritten (the distinct-partition-values collect is bounded by the
    partition count, not the data). At 100 TB this turns a full-table
    rewrite into a touched-partitions rewrite — the same
    copy-on-write granularity Delta/Iceberg use. Without
    ``partition_col`` the whole dataset is rewritten.

    The merge is staged into a sibling ``<base>__staging`` directory
    and swapped in only after the write succeeds, so a failed job never
    leaves a half-written dataset (on an object store the same pattern
    is a staging prefix + manifest/metadata swap).
    """
    import glob as _glob

    from pyspark.sql import functions as F

    staging = base_uri.rstrip("/") + "__staging"
    shutil.rmtree(staging, ignore_errors=True)
    base = spark.read.parquet(base_uri)

    missing = [c for c in key_cols if c not in updates.columns]
    if missing:
        raise ValueError(f"updates is missing key column(s) {missing}")
    if set(updates.columns) != set(base.columns):
        raise ValueError(
            "updates schema must match the base dataset: "
            f"base has {sorted(base.columns)}, updates has "
            f"{sorted(updates.columns)}"
        )
    if partition_col is not None and partition_col not in updates.columns:
        raise ValueError(
            f"partition_col {partition_col!r} not present in updates"
        )

    if partition_col is not None:
        affected = [
            r[0] for r in updates.select(partition_col).distinct().collect()
        ]
        scoped = base.filter(F.col(partition_col).isin(affected))
        merged = scoped.join(
            updates.select(key_cols).distinct(), key_cols, "left_anti"
        ).unionByName(updates)
        merged.write.mode("overwrite").partitionBy(partition_col).parquet(staging)
        # swap only the touched key=value directories; everything else
        # is never read or written
        for part_dir in _glob.glob(os.path.join(staging, f"{partition_col}=*")):
            target = os.path.join(base_uri, os.path.basename(part_dir))
            shutil.rmtree(target, ignore_errors=True)
            shutil.move(part_dir, target)
        shutil.rmtree(staging, ignore_errors=True)
        return

    merged = base.join(
        updates.select(key_cols).distinct(), key_cols, "left_anti"
    ).unionByName(updates)
    merged.write.mode("overwrite").parquet(staging)
    old = base_uri.rstrip("/") + "__old"
    shutil.rmtree(old, ignore_errors=True)
    shutil.move(base_uri, old)
    shutil.move(staging, base_uri)
    shutil.rmtree(old, ignore_errors=True)


def compact_dataset(
    spark,
    uri: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_by: list[str] | None = None,
    compression: str = "snappy",
) -> int:
    """Small-files compaction: rewrite a parquet dataset into
    ceil(total_bytes / target_file_bytes) files (the OPTIMIZE /
    bin-packing maintenance job every streaming or incremental sink
    eventually needs — thousands of KB-sized files turn scan planning
    and footer reads into the bottleneck long before data volume does).

    With ``partition_by`` the hive layout is preserved and rows are
    repartitioned on the partition columns so each output partition
    coalesces its own files. Uses the same staging-dir + swap protocol
    as merge_upsert (never leaves a half-written dataset). Returns the
    target file count. At 100 TB this runs per-partition (compact only
    partitions whose file count drifted) — compose with merge_upsert's
    touched-partition pattern."""
    import math

    total = 0
    for root, _dirs, files in os.walk(uri):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n = max(1, math.ceil(total / target_file_bytes))

    df = spark.read.parquet(uri)
    staging = uri.rstrip("/") + "__compact"
    shutil.rmtree(staging, ignore_errors=True)
    if partition_by:
        w = df.repartition(n, *partition_by).write.partitionBy(*partition_by)
    else:
        w = df.repartition(n).write
    w.mode("overwrite").option("compression", compression).parquet(staging)
    old = uri.rstrip("/") + "__old"
    shutil.rmtree(old, ignore_errors=True)
    shutil.move(uri, old)
    shutil.move(staging, uri)
    shutil.rmtree(old, ignore_errors=True)
    return n


def write_with_bloom(
    df: DataFrame,
    uri: str,
    bloom_cols: list[str],
    fpp: float = 0.01,
    expected_ndv: int | None = None,
    compression: str = "snappy",
    mode: str = "overwrite",
    disable_dictionary: bool = False,
) -> None:
    """Parquet write with bloom filters on ``bloom_cols`` — the
    data-skipping complement to min/max stats: a point lookup
    (``key = X``) on a high-cardinality column can't be pruned by
    min/max ranges (every row group spans most of the key space), but a
    bloom filter answers "definitely not in this row group" with fpp
    false-positive rate. At 100 TB this is the difference between
    scanning every row group of a 10 TB fact table and touching the one
    that can contain the key. Written via parquet-mr's native
    ``parquet.bloom.filter.enabled#column`` options.

    parquet-mr only materializes a bloom filter for pages that are NOT
    dictionary-encoded (a complete dictionary already answers exact
    membership). At scale, high-cardinality key columns overflow the
    dictionary page limit and fall back to plain encoding — exactly
    when the bloom matters. Small local fixtures stay fully
    dictionary-encoded, so ``disable_dictionary=True`` forces the
    bitset out for testing (tests/test_layout.py asserts the footprint
    delta — pyarrow 16 exposes no bloom metadata field)."""
    w = df.write.mode(mode).option("compression", compression)
    for c in bloom_cols:
        w = w.option(f"parquet.bloom.filter.enabled#{c}", "true")
        w = w.option(f"parquet.bloom.filter.fpp#{c}", str(fpp))
        if expected_ndv is not None:
            w = w.option(
                f"parquet.bloom.filter.expected.ndv#{c}", str(expected_ndv)
            )
    if disable_dictionary:
        w = w.option("parquet.enable.dictionary", "false")
    w.parquet(uri)


#: 4-state Hilbert automaton over MSB-first (x_bit, y_bit) quads,
#: derived programmatically from the classic xy2d loop and verified
#: exhaustively against it (tests/test_layout.py re-checks at runtime).
#: index = state*4 + 2*bx + by → output digit / next state.
HILBERT_OUT = [0, 1, 3, 2, 0, 3, 1, 2, 2, 1, 3, 0, 2, 3, 1, 0]
HILBERT_NXT = [1, 0, 2, 0, 0, 3, 1, 1, 2, 2, 0, 3, 3, 1, 3, 2]


def _hilbert_expr(xcol, ycol, bits: int = 8):
    """2-D Hilbert index of two ALREADY-MATERIALIZED bucket columns via
    a 4-state automaton over MSB-first bit pairs — consecutive Hilbert
    indices are always adjacent cells, so a contiguous index range maps
    to a tighter rectangle than the Z-curve's diagonal jumps.

    The automaton keeps the expression LINEAR in ``bits`` (two literal
    table lookups per level). The direct xy2d rotation loop is a trap:
    its x/y updates double the expression per unrolled level, and the
    resulting 2^bits-node tree made Catalyst analysis run for minutes
    at bits=8 (measured; this formulation plans in milliseconds).

    Inputs must be cheap column references — each level reads them once
    for bit extraction, so an inlined quantile-bucket tree would still
    be duplicated ``bits`` times (write_hilbert stages the buckets
    behind a shuffle barrier)."""
    from pyspark.sql import functions as F

    out_t = F.array(*[F.lit(v).cast("long") for v in HILBERT_OUT])
    nxt_t = F.array(*[F.lit(v).cast("int") for v in HILBERT_NXT])
    x, y = xcol.cast("long"), ycol.cast("long")
    d = F.lit(0).cast("long")
    state = F.lit(0).cast("int")
    for i in range(bits - 1, -1, -1):
        bx = F.shiftright(x, i).bitwiseAND(F.lit(1)).cast("int")
        by = F.shiftright(y, i).bitwiseAND(F.lit(1)).cast("int")
        quad = state * F.lit(4) + bx * F.lit(2) + by + F.lit(1)  # 1-indexed
        d = F.shiftleft(d, 2) + F.element_at(out_t, quad)
        state = F.element_at(nxt_t, quad)
    return d


def write_hilbert(
    df: DataFrame,
    uri: str,
    order_by: list[str],
    bits: int = 8,
    num_files: int = 8,
    compression: str = "snappy",
    mode: str = "overwrite",
) -> None:
    """Hilbert-clustered parquet write (exactly 2 columns) — same cost
    shape as write_zordered (quantile fit + range shuffle + local
    sort), usually tighter per-file spans because the Hilbert curve
    never makes the long diagonal jumps the Z-curve does. Measured vs
    Morton in tests/test_layout.py."""
    if len(order_by) != 2:
        raise ValueError("write_hilbert supports exactly 2 columns")
    from pyspark.sql import functions as F

    boundary_lists = df.approxQuantile(
        order_by, [i / (1 << bits) for i in range(1, 1 << bits)], 0.001
    )
    staged = df
    for i, (c, bounds) in enumerate(zip(order_by, boundary_lists)):
        staged = staged.withColumn(f"_hb{i}", _bucket_expr(c, bounds))
    # shuffle barrier: materialize the bucket columns so projection
    # collapse cannot inline the bucket trees into the hilbert unroll
    par = df.sparkSession.sparkContext.defaultParallelism
    staged = staged.repartition(par)
    h = _hilbert_expr(F.col("_hb0"), F.col("_hb1"), bits)
    (
        staged.withColumn("_hilbert", h)
        .repartitionByRange(num_files, "_hilbert")
        .sortWithinPartitions("_hilbert")
        .drop("_hilbert", "_hb0", "_hb1")
        .write.mode(mode)
        .option("compression", compression)
        .parquet(uri)
    )
