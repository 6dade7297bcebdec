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
    those instead.

    r14 (optimization guide §6 "coalesce on write"): the frame is
    REBALANCE-hinted on the partition columns before the write.
    Without it every write task emits one file into every partition
    value it holds (tasks × values tiny files — measured 130 ~8 KB
    files for the 16-bucket BM25 index); with it AQE routes each
    partition value to one task (one file), still splitting skewed
    values across several tasks so a hot partition does not serialize
    the write."""
    from pg_parquet_spark.sources import fs as pgfs

    (
        df.hint("rebalance", *partition_by)
        .write.mode(mode)
        .option("compression", compression)
        .partitionBy(*partition_by)
        .parquet(pgfs.spark_uri(uri))
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
    if mode == "overwrite":
        # a previous session's managed-table directory survives catalog
        # resets (fresh derby metastore + leftover warehouse dir) — clear
        # both. ONLY for overwrite: an append must never drop existing
        # data (review r8 — the unconditional drop made mode="append"
        # silently destroy the table).
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


def _reject_reserved_columns(df: DataFrame, names: list[str]) -> None:
    """The clustering writers stage internal working columns; a user
    column with the same name would be silently overwritten and then
    dropped (review r8) — refuse instead."""
    clash = [n for n in names if n in df.columns]
    if clash:
        raise ValueError(
            f"input already has column(s) {clash}, which the clustered "
            "write uses internally — rename them first"
        )


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

    if len(cols) * bits > 63:
        # bit 63 is the sign of the interleaved long — overflow would
        # silently corrupt the clustering sort order (ADVICE r6)
        raise ValueError(
            f"z-order key needs {len(cols) * bits} bits but a signed long "
            f"holds 63; lower bits= (e.g. {63 // len(cols)}) or cluster "
            "fewer columns"
        )
    # one multi-column quantile job, not one scan per column
    boundary_lists = df.approxQuantile(
        cols, [i / (1 << bits) for i in range(1, 1 << bits)], 0.001
    )
    return _interleave(
        [_bucket_expr(c, bounds) for c, bounds in zip(cols, boundary_lists)],
        bits,
    )


def _double_lit_sql(v: float) -> str:
    """Exact Spark-SQL double literal (the similarity.py helper):
    repr() round-trips the IEEE value through Python and
    Double.parseDouble, and the CAST constant-folds at analysis to the
    identical Literal(double) F.lit() would build."""
    return f"CAST('{v!r}' AS DOUBLE)"


def _bucket_expr(c: str, bounds: list[float]):
    """Quantile-bucket index (count of boundaries ≤ value) as a
    binary-search nested-IF tree: log2(2^bits) codegen'd comparisons
    per row. The earlier literal-array-HOF formulation (count via
    F.filter) was 2^bits interpreted lambda calls per evaluation —
    and Catalyst's projection collapse inlines the bucket into every
    consumer, so the HOF ran once per interleave read (measured: 17.6 s
    vs 9.4 s total for a 600k-row 2-dim write; the z projection itself
    dropped to ~1.2 s warm).

    Rendered as ONE SQL string parsed JVM-side (r14 second pass — the
    similarity.py literal-matrix lesson applied to the tree: the
    F.when() route built 2·2^bits nested Column nodes through py4j,
    ~2.2 s of pure DRIVER time per 2-column zorder_expr; one expr()
    parse of the same depth-log2 tree builds in milliseconds and
    analyzes to the identical plan). IF(cond, a, b) evaluates b on
    NULL exactly as when().otherwise() did — NULLs land in bucket 0,
    matching the HOF-count semantics."""
    from pyspark.sql import functions as F

    val = f"CAST(`{c}` AS DOUBLE)"

    def build(lo: int, hi: int) -> str:
        # bucket index ∈ [lo, hi]; compare against bounds[mid]
        if lo == hi:
            return str(lo)
        mid = (lo + hi) // 2
        return (
            f"IF({val} >= {_double_lit_sql(bounds[mid])}, "
            f"{build(mid + 1, hi)}, {build(lo, mid)})"
        )

    return F.expr(f"CAST({build(0, len(bounds))} AS BIGINT)")


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
    # one parsed SQL literal, not 2^bits F.lit() py4j calls (r14 —
    # the same single-parse construction as _bucket_expr)
    spread = F.expr(
        "array(" + ", ".join(f"{s}L" for s in _spread_table(bits, d)) + ")"
    )
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
    from pg_parquet_spark.sources import fs as pgfs

    _reject_reserved_columns(df, ["_zorder"])
    z = zorder_expr(df, zorder_by, bits=bits)
    # spread the CPU-bound z projection over all cores before the range
    # shuffle — the source's file-partition count caps parallelism
    # otherwise (the similarity.py PQ-encode lever; locally 3 input
    # splits left 29 cores idle, 5.9 s → ~1 s). Hash on the z-order
    # columns, NOT round-robin (r14): a keyless repartition(n) pays a
    # local sort of its input per SPARK-23207, and the z-order columns
    # are high-cardinality range keys by contract, so their hash
    # spreads evenly (A/B: 4.86 → 4.34 s min on the gate).
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        df = df.repartition(par, *zorder_by)
    (
        df.withColumn("_zorder", z)
        .repartitionByRange(num_files, "_zorder")
        .sortWithinPartitions("_zorder")
        .drop("_zorder")
        .write.mode(mode)
        .option("compression", compression)
        .parquet(pgfs.spark_uri(uri))
    )


# ---------------------------------------------------------------------------
# versioned publish: manifest-pointer snapshots (r8)
#
# Plain parquet has no metadata to swap, so the r7 merge/compact publish
# had a crash window (flat path: base renamed aside; partitioned path:
# one partition moved at a time — a crash mid-publish could lose a
# partition's base rows, ADVICE r7). The versioned protocol closes it
# without a table format:
#
#   root/_CURRENT          tiny JSON pointer, rewritten ATOMICALLY last
#   root/_v<n>/...         immutable snapshot data (whole dataset, or
#                          just the partitions a merge touched)
#
# Every write lands in a NEW _v<n> directory (invisible to readers: no
# pointer references it yet, and Spark ignores underscore-prefixed dirs,
# so even a naive spark.read.parquet(root) can never see half a publish
# — it errors on the bare root, which is the loud failure we want).
# The publish is ONE small-object write: local/HDFS rename is atomic,
# object stores surface it as a single PUT. A crash anywhere before the
# pointer swap leaves _CURRENT on the old snapshot; after it, on the
# new — readers resolve old-or-new, never a mix. Touched-partition
# merges carry untouched partitions FORWARD by reference (the manifest
# maps each partition to the version directory that last rewrote it),
# so the copy-on-write granularity stays per-partition. Each publish
# also lands its manifest in the `_manifest-<n>.json` history, giving
# TIME TRAVEL to retained snapshots; maintenance ops vacuum at entry
# with the session setting `snapshot_keep_history` (default 2, per-op
# `keep_history=` override), which is both the in-flight-reader grace
# period and the travel window — the reader SLA is "finish within
# keep_history maintenance cycles". Publishes run an optimistic
# lost-update check just before the flip; single-writer remains the
# deployment contract — the same one Delta on S3 has without a lock
# service.

_CURRENT = "_CURRENT"


def _retained_manifest_versions(root_uri: str) -> list[int]:
    """Sorted version numbers of the ``_manifest-<n>.json`` history files
    (non-numeric names are ignored — a stray hand-made file must not
    abort vacuum/describe/time-travel, review r8)."""
    from pg_parquet_spark.sources import fs as pgfs

    out = []
    for child, is_dir in pgfs.list_dir(root_uri):
        name = child.rstrip("/").rsplit("/", 1)[1]
        if (
            not is_dir
            and name.startswith("_manifest-")
            and name.endswith(".json")
            and name[len("_manifest-"):-len(".json")].isdigit()
        ):
            out.append(int(name[len("_manifest-"):-len(".json")]))
    return sorted(out)


def read_manifest(root_uri: str, version: int | None = None) -> dict | None:
    """Parse the dataset's manifest.

    Default: ``root/_CURRENT`` (None when the dataset is unversioned).
    With ``version``, the retained ``_manifest-<n>.json`` history file —
    TIME TRAVEL to any snapshot the retention window still holds
    (raises with the list of available versions otherwise)."""
    import json

    from pg_parquet_spark.sources import fs as pgfs

    root_uri = root_uri.rstrip("/")
    if version is None:
        uri = root_uri + "/" + _CURRENT
        if not pgfs.exists(uri):
            return None
        return json.loads(pgfs.read_bytes(uri).decode("utf-8"))
    uri = f"{root_uri}/_manifest-{version}.json"
    if not pgfs.exists(uri):
        avail = _retained_manifest_versions(root_uri)
        raise ValueError(
            f"version {version} of {root_uri} is not retained "
            f"(available: {avail or 'none'} — raise keep_history on the "
            "maintenance ops to widen the time-travel window)"
        )
    return json.loads(pgfs.read_bytes(uri).decode("utf-8"))


def _publish_manifest(root_uri: str, manifest: dict) -> None:
    """Persist the snapshot manifest to the version history, then flip
    the ``_CURRENT`` pointer ATOMICALLY — the history file lands first
    so time travel can never observe a version the pointer knows about
    but the history lacks."""
    import json

    from pg_parquet_spark.sources import fs as pgfs

    root_uri = root_uri.rstrip("/")
    data = json.dumps(manifest, sort_keys=True).encode("utf-8")
    pgfs.write_bytes_atomic(
        f"{root_uri}/_manifest-{manifest['version']}.json", data
    )
    pgfs.write_bytes_atomic(root_uri + "/" + _CURRENT, data)


def _check_not_concurrently_modified(
    root_uri: str, expected_version: int
) -> None:
    """Optimistic-concurrency check, run just before the pointer flip:
    if another writer published since this operation read its base,
    raise instead of silently overwriting their snapshot (lost update).
    This is DETECTION, not prevention — a true compare-and-swap needs a
    store primitive plain object stores lack (Delta on S3 has the same
    gap and closes it with an external lock service); the window
    between this check and the flip is milliseconds against a
    maintenance op that runs for minutes, and the single-writer
    deployment contract still stands."""
    manifest = read_manifest(root_uri)
    found = manifest["version"] if manifest else 0
    if found != expected_version:
        raise RuntimeError(
            f"concurrent modification of {root_uri}: expected version "
            f"{expected_version} at publish time but found {found} — "
            "another writer published during this operation; re-run to "
            "merge against the new base"
        )


def _next_version(root_uri: str, manifest: dict | None) -> int:
    """max(existing _v dirs, pointer version) + 1 — never reuses a
    directory a crashed writer may have half-filled."""
    from pg_parquet_spark.sources import fs as pgfs

    n = manifest["version"] if manifest else 0
    for child, is_dir in pgfs.list_dir(root_uri):
        name = child.rstrip("/").rsplit("/", 1)[1]
        if is_dir and name.startswith("_v") and name[2:].isdigit():
            n = max(n, int(name[2:]))
    return n + 1


def read_versioned(spark, root_uri: str, version: int | None = None) -> DataFrame:
    """Resolve a dataset through its ``_CURRENT`` pointer — or TIME
    TRAVEL to a retained historical snapshot with ``version`` (the
    window is ``keep_history`` on the maintenance ops; snapshots are
    immutable, so a historical read is exactly the bytes that snapshot
    published).

    Unversioned roots fall back to a plain parquet read. Partitioned
    snapshots come back as a union of per-partition scans with the
    partition column re-attached as a typed literal — a filter on it
    constant-folds each non-matching branch to an empty relation, so
    partition pruning survives the indirection (asserted in
    tests/test_layout.py). Planning cost is linear in the partition
    count, which is bounded for the low-cardinality keys hive layouts
    use; at very high partition counts a real table format (Delta/
    Iceberg) is the right tool and this protocol is its Spark-native
    stand-in."""
    from functools import reduce

    from pg_parquet_spark.sources import fs as pgfs

    root_uri = root_uri.rstrip("/")
    manifest = read_manifest(root_uri, version=version)
    if manifest is None:
        return spark.read.parquet(pgfs.spark_uri(root_uri))
    if manifest.get("format") == "batches":
        # streaming-sink form: one immutable dir per published
        # micro-batch, hive-partitioned inside (partition columns come
        # back through normal discovery below each batch dir). Readers
        # see exactly the batches the pointer published — never a
        # half-landed one. Batch count grows until compact_dataset
        # collapses the dataset into snapshot form; ingestion after a
        # compaction opens a new batches EPOCH whose ``base_manifest``
        # embeds that snapshot (review r8 — the sink previously refused
        # snapshot-form roots, breaking its own documented lifecycle),
        # so the read is base ∪ new batches.
        base_manifest = manifest.get("base_manifest")
        branches = []
        if base_manifest is not None:
            branches.append(_resolve_snapshot(spark, root_uri, base_manifest))
        branches.extend(
            spark.read.parquet(pgfs.spark_uri(root_uri + "/" + rel))
            for _bid, rel in sorted(
                manifest["batches"].items(), key=lambda kv: int(kv[0])
            )
        )
        if not branches:
            raise ValueError(
                f"streaming dataset at {root_uri} has no published batches yet"
            )
        return reduce(lambda a, b: a.unionByName(b), branches)
    return _resolve_snapshot(spark, root_uri, manifest)


def _carry_max_batch_id(prev_manifest: dict | None) -> int:
    """Highest micro-batch id ever folded into this dataset — carried
    through every publish so a checkpoint REPLAY of a batch the
    compaction already collapsed cannot re-add its rows (review r8:
    the id list dies with the batches form, the horizon must not)."""
    if prev_manifest is None:
        return -1
    mb = prev_manifest.get("max_batch_id", -1)
    if prev_manifest.get("format") == "batches" and prev_manifest["batches"]:
        mb = max(mb, max(int(k) for k in prev_manifest["batches"]))
    return mb


def _carry_writer_id(prev_manifest: dict | None) -> str | None:
    """Streaming writer epoch id (derived from the sink's checkpoint) —
    carried through every maintenance publish for the same reason as
    ``max_batch_id``: the replay horizon is only meaningful within ONE
    checkpoint's id space, so the sink must still be able to detect a
    checkpoint swap after a compaction collapsed the batch list
    (ADVICE r8: a fresh checkpoint restarts ids at 0 and every new
    batch would be silently discarded as a replay)."""
    return prev_manifest.get("writer_id") if prev_manifest else None


def _resolve_keep_history(keep_history: int | None) -> int:
    """Per-op override or the engine-level session default (README
    'Maintenance & retention': the window is both the time-travel depth
    and the in-flight-reader grace period)."""
    if keep_history is not None:
        return keep_history
    from pg_parquet_spark.session import snapshot_keep_history

    return snapshot_keep_history()


def _resolve_snapshot(spark, root_uri: str, manifest: dict) -> DataFrame:
    """DataFrame for a snapshot-form (flat or partitioned) manifest —
    shared by the direct resolve and a batches epoch's base."""
    from functools import reduce

    from pyspark.sql import functions as F

    from pg_parquet_spark.sources import fs as pgfs

    if manifest.get("partitions") is None:
        return spark.read.parquet(
            pgfs.spark_uri(root_uri + "/" + manifest["path"])
        )
    col = manifest["partition_col"]
    dtype = manifest["partition_dtype"]
    items = sorted(manifest["partitions"].items())
    if not items:
        raise ValueError(f"versioned dataset at {root_uri} has no partitions")
    # r14 second pass (guide §5 driver work): when every partition
    # branch carries the IDENTICAL parquet schema, infer the Spark
    # schema from the FIRST branch only and impose it on the rest —
    # each schema-less spark.read.parquet() pays a py4j driver footer
    # read at construction (~60 ms), so a 16-bucket index cost ~1 s
    # (64-cell IVF snapshots ~4×) before any job ran. Uniformity is
    # PROVEN first with one cheap pyarrow footer probe per branch
    # (parquet-schema string equality ⇒ identical Spark inference);
    # branches written at different times MAY legally differ in
    # physical type (MERGE enforces column names, and the union then
    # coerces per branch — e.g. a float index upserted from a double
    # frame, regression-tested in test_similarity_dedup's incremental
    # IVF maintenance), and any non-uniform or unprobeable dataset
    # takes the original per-branch inference path unchanged.
    sch = None
    if _uniform_branch_parquet_schema(
        [root_uri + "/" + rel for _val, rel in items]
    ):
        first = spark.read.parquet(
            pgfs.spark_uri(root_uri + "/" + items[0][1])
        )
        sch = first.schema
        branches = [first.withColumn(col, F.lit(items[0][0]).cast(dtype))]
        for val, rel in items[1:]:
            df = spark.read.schema(sch).parquet(
                pgfs.spark_uri(root_uri + "/" + rel)
            )
            branches.append(df.withColumn(col, F.lit(val).cast(dtype)))
        return reduce(lambda a, b: a.unionByName(b), branches)
    branches = []
    for val, rel in items:
        df = spark.read.parquet(pgfs.spark_uri(root_uri + "/" + rel))
        branches.append(df.withColumn(col, F.lit(val).cast(dtype)))
    return reduce(lambda a, b: a.unionByName(b), branches)


def _uniform_branch_parquet_schema(branch_uris: list[str]) -> bool:
    """True iff every branch dir's data files carry the SAME parquet
    schema (physical+logical, compared as the footer schema string).
    Probes min(2, n_files) footers per branch (~1 ms each local, one
    GET on object stores) — the probe that licenses the imposed-schema
    fast path in _resolve_snapshot. A dir normally holds files from
    exactly one snapshot write, so its first file is representative;
    the second (first + LAST, r15 per ADVICE r14) catches a
    partially-failed rewrite that left a mixed-schema dir without
    paying a full per-file sweep. Anything unreadable or empty returns
    False (→ the safe per-branch path)."""
    import pyarrow.parquet as pq

    from pg_parquet_spark.sources import fs as pgfs

    try:
        ref = None
        for uri in branch_uris:
            files = sorted(
                c
                for c, is_dir in pgfs.list_dir(uri)
                if not is_dir and c.endswith(".parquet")
            )
            if not files:
                return False
            for f in {files[0], files[-1]}:
                fs, path, _ = pgfs.resolve(f)
                # drop str()'s first line — it embeds the wrapper
                # object's memory address; the remainder is the full
                # physical+logical schema listing
                s = str(pq.ParquetFile(path, filesystem=fs).schema).split(
                    "\n", 1
                )[1]
                if ref is None:
                    ref = s
                elif s != ref:
                    return False
        return True
    except Exception:  # noqa: BLE001 — unprobeable ⇒ take the safe path
        return False


def _manifest_refs(manifest: dict) -> set[str]:
    if manifest.get("format") == "batches":
        refs = set(manifest["batches"].values())
        if manifest.get("base_manifest") is not None:
            refs |= _manifest_refs(manifest["base_manifest"])
        return refs
    if manifest.get("partitions") is None:
        return {manifest["path"]}
    return set(manifest["partitions"].values())


def vacuum_dataset(root_uri: str, keep_history: int | None = None) -> None:
    """Delete snapshot data the retained manifests no longer reference:
    whole unreferenced ``_v*`` dirs, unreferenced partition subdirs of
    partially-referenced ones, legacy pre-versioning children, dropped
    history manifests, and pointer temp litter. No-op on unversioned
    roots.

    ``keep_history`` is the TIME-TRAVEL retention window: the newest N
    manifests (current included) and every snapshot they reference
    survive, so ``read_versioned(..., version=k)`` works for any
    retained k. ``None`` (the default) resolves to the ENGINE SETTING
    ``session.snapshot_keep_history()`` (default 2) — the maintenance
    ops vacuum at entry with the same resolution, so the window doubles
    as the in-flight-reader grace period: a reader that resolved a
    snapshot must finish within ``keep_history`` maintenance cycles or
    its version can be deleted mid-read (the reader SLA; raise the
    session default for long-running readers). Single-writer assumed."""
    from pg_parquet_spark.sources import fs as pgfs

    root_uri = root_uri.rstrip("/")
    manifest = read_manifest(root_uri)
    if manifest is None:
        return
    keep_history = max(1, _resolve_keep_history(keep_history))
    history = _retained_manifest_versions(root_uri)
    kept_versions = {
        v for v in sorted(history, reverse=True)[:keep_history]
    } | {manifest["version"]}
    referenced = _manifest_refs(manifest)
    kept_names = {_CURRENT}
    for v in kept_versions:
        kept_names.add(f"_manifest-{v}.json")
        if v != manifest["version"]:
            try:
                referenced |= _manifest_refs(read_manifest(root_uri, version=v))
            except ValueError:
                pass  # raced with a concurrent cleanup — refs stay minimal
    for child, is_dir in pgfs.list_dir(root_uri):
        name = child.rstrip("/").rsplit("/", 1)[1]
        if name in kept_names:
            continue
        if not is_dir:
            pgfs.delete_file(child)  # legacy loose / _SUCCESS / tmp / old manifest
            continue
        if name.startswith("_v") and name[2:].isdigit():
            refs_in = [
                r for r in referenced
                if r == name or r.startswith(name + "/")
            ]
            if not refs_in:
                pgfs.delete_dir(child)
            elif name not in refs_in:
                # partially referenced: prune unreferenced partition dirs
                for sub, sub_is_dir in pgfs.list_dir(child):
                    sub_name = sub.rstrip("/").rsplit("/", 1)[1]
                    rel = f"{name}/{sub_name}"
                    if sub_is_dir and rel not in referenced:
                        pgfs.delete_dir(sub)
                    elif not sub_is_dir:
                        pgfs.delete_file(sub)  # _SUCCESS inside the version
            continue
        if name not in referenced:  # legacy hive dir no longer referenced
            pgfs.delete_dir(child)


def _hive_partition_dirs(uri: str, partition_col: str) -> list[tuple[str, str]]:
    """(full-uri, decoded partition value) for each ``col=`` child dir.
    Values are hive-escaped in directory names (%XX for specials) —
    decode so the manifest stores the real value."""
    from urllib.parse import unquote

    from pg_parquet_spark.sources import fs as pgfs

    out = []
    for child, is_dir in pgfs.list_dir(uri):
        name = child.rstrip("/").rsplit("/", 1)[1]
        if is_dir and name.startswith(f"{partition_col}="):
            out.append((child, unquote(name[len(partition_col) + 1 :])))
    return out


def _restore_missing_tree(src_uri: str, dst_uri: str) -> None:
    """Undo a PARTIALLY-completed aside move: every file moved out lives
    under src at its original relative path and is absent from dst, so
    moving each missing file back reconstitutes the original exactly
    (the two file sets are disjoint by construction)."""
    from pg_parquet_spark.sources import fs as pgfs

    for file_uri, _sz in pgfs.tree_files(src_uri):
        rel = file_uri[len(src_uri.rstrip("/")) + 1 :]
        target = dst_uri.rstrip("/") + "/" + rel
        if not pgfs.exists(target):
            pgfs.move_file(file_uri, target)


def _inplace_swap_whole(base_uri: str, staging: str) -> None:
    """Whole-dataset in-place swap with crash-DECIDABLE marker files
    (review r8: without markers, recovery could not tell a crashed
    aside-move from a crashed move-in from a crashed cleanup, and
    guessing wrong either resurrected stale rows or destroyed the only
    copy of base rows). Sequence:

        1. base → __old                    (aside)
        2. write  <base>__aside_done       (atomic small file)
        3. staging → base                  (move-in)
        4. write  <base>__committed
        5. delete __old, delete markers

    ``_recover_inplace`` reads the markers: committed → roll forward
    (finish cleanup); aside_done only → roll BACK (base holds partial
    staged output; restore the aside — the op re-runs from inputs);
    neither → the aside move itself crashed and base ∪ __old is the
    original, so the missing files move back."""
    from pg_parquet_spark.sources import fs as pgfs

    old = base_uri + "__old"
    aside_done = base_uri + "__aside_done"
    committed = base_uri + "__committed"
    pgfs.delete_dir(old)
    pgfs.delete_file(aside_done)
    pgfs.delete_file(committed)
    pgfs.move_dir(base_uri, old)
    pgfs.write_bytes_atomic(aside_done, b"1")
    pgfs.move_dir(staging, base_uri)
    pgfs.write_bytes_atomic(committed, b"1")
    pgfs.delete_dir(old)
    # marker removal order matters (review r8): aside_done FIRST, so a
    # crash between the two deletes leaves (committed only) — a
    # roll-forward state — never (aside_done only, aside gone), whose
    # roll-back would delete the published base with nothing to restore
    pgfs.delete_file(aside_done)
    pgfs.delete_file(committed)


def _recover_inplace(base_uri: str) -> None:
    """Roll a crashed LEGACY in-place publish forward or back on entry,
    decided by the swap MARKER files (see ``_inplace_swap_whole``) and
    the per-partition markers inside the ``__old`` aside — never by the
    current caller's layout arguments, so any later op (flat merge,
    partitioned merge, compaction) recovers any earlier op's crash
    (review r8)."""
    from pg_parquet_spark.sources import fs as pgfs

    old = base_uri + "__old"
    aside_done = base_uri + "__aside_done"
    committed = base_uri + "__committed"
    if pgfs.exists(committed):
        # whole swap fully published; only the cleanup crashed
        pgfs.delete_dir(old)
        pgfs.delete_file(aside_done)  # before committed — see swap cleanup
        pgfs.delete_file(committed)
        return
    if pgfs.exists(aside_done):
        # whole swap crashed mid move-in: base holds only partial staged
        # output — roll back to the parked original. Never delete the
        # base without a restore source (review r8: recovery itself can
        # crash after the restore but before the marker delete; a second
        # pass must not destroy the restored original)
        if pgfs.exists(old):
            pgfs.delete_dir(base_uri)
            pgfs.move_dir(old, base_uri)
        pgfs.delete_file(aside_done)
        return
    if not pgfs.exists(old):
        return
    if not pgfs.exists(base_uri):
        # aside move finished but its marker write didn't — restore
        pgfs.move_dir(old, base_uri)
        return
    # per-partition protocol (or a whole-swap aside that crashed partway:
    # base ∪ __old is then the original and the no-marker branches below
    # move the missing pieces back)
    entries = {
        c.rstrip("/").rsplit("/", 1)[1]: (c, d) for c, d in pgfs.list_dir(old)
    }
    for name in sorted(entries):
        child, is_dir = entries[name]
        if name.endswith(".committed") or name.endswith(".aside_done"):
            continue  # markers are consumed with their partition below
        target = f"{base_uri}/{name}"
        if not is_dir:
            # loose file from a partially-asided whole swap
            if not pgfs.exists(target):
                pgfs.move_file(child, target)
            else:
                pgfs.delete_file(child)
            continue
        if f"{name}.committed" in entries:
            pgfs.delete_dir(child)  # staged move-in finished — roll forward
        elif f"{name}.aside_done" in entries:
            # move-in crashed: target holds partial staged output
            pgfs.delete_dir(target)
            pgfs.move_dir(child, target)
        else:
            # the aside move itself crashed partway
            _restore_missing_tree(child, target)
            pgfs.delete_dir(child)
    pgfs.delete_dir(old)


def merge_upsert(
    spark,
    base_uri: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_col: str | None = None,
    check_partition_stability: bool = False,
    versioned: bool | None = None,
    keep_history: int | None = None,
) -> None:
    """SCD-1 MERGE into a plain-parquet dataset (the Delta-Lake
    ``MERGE WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT`` primitive,
    without a table format): rows in ``updates`` replace base rows with
    the same key; unmatched update rows are inserts. Implemented as the
    standard anti-join + union — one shuffle on the key columns.
    ``updates`` with duplicate keys fail fast (Delta MERGE errors on
    multiple matches; silently keeping both would land duplicate keys —
    ADVICE r6). Dedupe upstream with a documented precedence
    (e.g. ``max_by`` on a version column) before calling.

    Scale behavior is governed by ``partition_col``: when the base is
    hive-partitioned on it and every update row carries it, ONLY the
    partitions that appear in ``updates`` are read, merged, and
    rewritten (the distinct-partition-values collect is bounded by the
    partition count, not the data). At 100 TB this turns a full-table
    rewrite into a touched-partitions rewrite — the same
    copy-on-write granularity Delta/Iceberg use. Without
    ``partition_col`` the whole dataset is rewritten.

    **Partition-stability assumption (ADVICE r6):** partitioned mode
    assumes a key's partition value never changes — an update row whose
    key lives in a DIFFERENT (untouched) base partition would leave the
    stale row behind, yielding duplicate keys. That is the same
    contract Hive/Glue-style partition overwrites carry. Pass
    ``check_partition_stability=True`` to verify: a semi-join of the
    UNtouched partitions against the update keys (one scan of the
    complement — use when the invariant isn't structurally guaranteed,
    skip when it is, e.g. partition derived from the key).

    Durability has two tiers. **Versioned (manifest-pointer) publish**
    — ``versioned=True``, or automatic once the dataset has a
    ``_CURRENT`` pointer — is crash-ATOMIC: the merge writes a new
    immutable ``_v<n>`` snapshot directory (touched partitions only;
    untouched ones are carried forward by reference in the manifest)
    and publishes by atomically rewriting the tiny ``_CURRENT`` file
    last, so a reader resolves the old snapshot or the new one, never a
    mix, no matter where a crash lands (crash-mid-publish test in
    tests/test_layout.py). The first versioned merge on a legacy
    dataset migrates it in place: existing partition dirs become
    version-0 references, nothing is rewritten. Read versioned
    datasets through ``read_versioned`` / ``read_parquet`` — the bare
    root holds only the pointer and snapshot dirs.

    **Legacy in-place publish** (``versioned=False`` on a pointerless
    dataset) stages into a sibling ``<base>__staging`` prefix, so a
    failed JOB never corrupts the base; the publish then swaps each
    touched partition through a ``<base>__old`` aside (move old aside →
    move staged in → drop aside), and a crashed swap is rolled forward
    or back on the next merge's entry, so base rows are never LOST
    (ADVICE r7 — the previous delete-then-move order could truncate a
    partition permanently). The swap still has a brief window where a
    reader sees the dataset without one partition — that's the window
    only the manifest tier closes. All listing/move/delete goes through
    ``sources.fs``'s scheme dispatch, so both tiers run unchanged on
    object stores (tested on mem://).
    """
    from pyspark.sql import functions as F

    from pg_parquet_spark.sources import fs as pgfs

    base_uri = base_uri.rstrip("/")
    manifest = read_manifest(base_uri)
    if versioned is None:
        versioned = manifest is not None
    if manifest is not None and not versioned:
        raise ValueError(
            f"{base_uri} is a versioned dataset (has {_CURRENT}); "
            "an in-place merge would bypass the pointer"
        )
    staging = base_uri + "__staging"
    pgfs.delete_dir(staging)
    if versioned:
        if manifest is None:
            # migrating a legacy dataset: recover any crashed in-place
            # publish FIRST so the migration manifest cannot silently
            # omit a partition parked in the __old aside (review r8)
            _recover_inplace(base_uri)
        # grace-period + time-travel retention: the previous snapshot and
        # its manifest survive this op
        vacuum_dataset(base_uri, keep_history=keep_history)
        expected_version = manifest["version"] if manifest else 0
        base = (
            read_versioned(spark, base_uri)
            if manifest is not None
            else spark.read.parquet(pgfs.spark_uri(base_uri))
        )
    else:
        _recover_inplace(base_uri)
        base = spark.read.parquet(pgfs.spark_uri(base_uri))

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
    # the updates lineage feeds three actions (validity stats, optional
    # stability semi-join, the merged write) — persist it so an
    # expensive upstream isn't recomputed per action (review r8)
    updates = updates.persist()
    try:
        # r14 second pass (guide §1.2): ONE aggregate job carries the
        # dup check (row count vs null-safe distinct key count — struct
        # equality groups NULL key fields exactly as the groupBy did),
        # the affected-partition set (bounded by partition count), and
        # the NULL-partition probe — previously three separate passes
        # over the updates. The exact duplicate key is re-derived with
        # the original groupBy ONLY on the error path.
        stat_cols = [
            F.count(F.lit(1)).alias("_n"),
            F.countDistinct(F.struct(*key_cols)).alias("_nk"),
        ]
        if partition_col is not None:
            stat_cols += [
                F.collect_set(partition_col).alias("_parts"),
                F.max(
                    F.col(partition_col).isNull().cast("int")
                ).alias("_null_part"),
            ]
        stats = updates.agg(*stat_cols).collect()[0]
        if stats["_n"] != stats["_nk"]:
            dup = (
                updates.groupBy(*key_cols)
                .count()
                .filter(F.col("count") > 1)
                .limit(1)
                .collect()
            )
            raise ValueError(
                f"updates contains multiple rows for key {dup[0][:-1]}; "
                "MERGE requires at most one update row per key — dedupe "
                "upstream with an explicit precedence"
            )

        if partition_col is not None:
            if stats["_null_part"]:
                # a NULL partition value would silently escape the isin()
                # scoping below (SQL NULL semantics) and land in the
                # __HIVE_DEFAULT_PARTITION__ dir without the anti-join
                # having covered matching base rows
                raise ValueError(
                    f"updates contain NULL {partition_col!r} values; "
                    "partitioned MERGE requires a concrete partition per row"
                )
            affected = list(stats["_parts"])
            if versioned and manifest is not None:
                # manifest-compatibility checks BEFORE any shuffle or write
                # (review r8: they used to run after the full snapshot write,
                # discarding minutes of work at scale and orphaning a _v dir)
                if manifest.get("format") == "batches":
                    raise ValueError(
                        "partitioned MERGE into a streaming-batches dataset: "
                        "run compact_dataset first to collapse the batch "
                        "dirs into a per-partition snapshot (the batches "
                        "form has no per-partition directory to carry "
                        "forward)"
                    )
                if manifest.get("partitions") is None:
                    raise ValueError(
                        "partitioned MERGE into an unpartitioned snapshot: "
                        "the current version has no per-partition dirs to "
                        "carry forward — merge with partition_col=None, or "
                        "compact_dataset(partition_by=[...]) first"
                    )
                if manifest.get("partition_col") != partition_col:
                    raise ValueError(
                        f"partitioned MERGE on {partition_col!r} but the "
                        f"current snapshot is partitioned on "
                        f"{manifest.get('partition_col')!r} — the manifest "
                        "carries per-partition refs for one column only"
                    )
            if versioned and manifest is None:
                # migration: a NULL-partition dir cannot be carried (its
                # sentinel dirname would round-trip as a literal value and
                # corrupt the rows — review r8); refuse up front
                hive_dirs = _hive_partition_dirs(base_uri, partition_col)
                for child, value in hive_dirs:
                    if value == "__HIVE_DEFAULT_PARTITION__":
                        raise ValueError(
                            f"{base_uri} contains a NULL-partition directory "
                            f"({child.rstrip('/').rsplit('/', 1)[1]}); the "
                            "versioned partitioned protocol requires concrete "
                            "partition values — repartition NULLs to a default "
                            "value before migrating"
                        )
                # migration builds the version-0 partition map SOLELY from
                # hive 'col=' dirs: data stored outside them (in-file
                # partition column, or loose root files) would never enter
                # the manifest and the next vacuum would DELETE it as
                # unreferenced — refuse instead of silently losing data
                # (ADVICE r8)
                loose = [
                    c
                    for c, is_dir in pgfs.list_dir(base_uri)
                    if not is_dir
                    and not c.rstrip("/")
                    .rsplit("/", 1)[1]
                    .startswith(("_", "."))
                ]
                if loose or not hive_dirs:
                    raise ValueError(
                        f"{base_uri} is not hive-partitioned on "
                        f"{partition_col!r} ({len(hive_dirs)} "
                        f"'{partition_col}=' dirs, {len(loose)} loose data "
                        "files at the root); the versioned partitioned "
                        "migration carries existing partition DIRECTORIES "
                        "into the manifest, so other layouts would lose "
                        "data at the next vacuum — rewrite first with "
                        f"compact_dataset(partition_by=[{partition_col!r}], "
                        "versioned=True), or merge with partition_col=None"
                    )
            if check_partition_stability:
                moved = (
                    base.filter(
                        ~F.col(partition_col).isin(affected)
                        | F.col(partition_col).isNull()
                    )
                    .join(
                        F.broadcast(updates.select(key_cols).distinct()),
                        key_cols,
                        "left_semi",
                    )
                    .limit(1)
                    .collect()
                )
                if moved:
                    raise ValueError(
                        "update key found in an untouched partition (key's "
                        f"{partition_col} changed); partitioned MERGE requires "
                        "partition-stable keys — include the old partition in "
                        "the update set or merge unpartitioned"
                    )
            scoped = base.filter(F.col(partition_col).isin(affected))
            merged = scoped.join(
                updates.select(key_cols).distinct(), key_cols, "left_anti"
            ).unionByName(updates)
            if versioned:
                dtype = base.schema[partition_col].dataType.simpleString()
                n = _next_version(base_uri, manifest)
                vdir = f"_v{n}"
                merged.hint("rebalance", partition_col).write.mode(
                    "overwrite"
                ).partitionBy(partition_col).parquet(
                    pgfs.spark_uri(f"{base_uri}/{vdir}")
                )
                if manifest is not None:
                    partitions = dict(manifest["partitions"])
                else:
                    # migrate: existing hive dirs become version-0 references
                    partitions = {
                        value: child.rstrip("/").rsplit("/", 1)[1]
                        for child, value in _hive_partition_dirs(
                            base_uri, partition_col
                        )
                    }
                for child, value in _hive_partition_dirs(
                    f"{base_uri}/{vdir}", partition_col
                ):
                    name = child.rstrip("/").rsplit("/", 1)[1]
                    partitions[value] = f"{vdir}/{name}"
                _check_not_concurrently_modified(base_uri, expected_version)
                _publish_manifest(
                    base_uri,
                    {
                        "version": n,
                        "partition_col": partition_col,
                        "partition_dtype": dtype,
                        "partitions": partitions,
                        "max_batch_id": _carry_max_batch_id(manifest),
                        "writer_id": _carry_writer_id(manifest),
                    },
                )
                return
            merged.hint("rebalance", partition_col).write.mode(
                "overwrite"
            ).partitionBy(partition_col).parquet(
                pgfs.spark_uri(staging)
            )
            # publish only the touched key=value directories; everything
            # else is never read or written. Per-partition aside swap
            # (ADVICE r7): the live partition is parked under __old until
            # the staged one is in place, so a crash never loses base rows
            # — _recover_inplace rolls a half-done swap forward on entry.
            old = base_uri + "__old"
            pgfs.delete_dir(old)
            for child, is_dir in pgfs.list_dir(staging):
                name = child.rstrip("/").rsplit("/", 1)[1]
                if not is_dir or not name.startswith(f"{partition_col}="):
                    continue
                target = f"{base_uri}/{name}"
                if pgfs.exists(target):
                    pgfs.move_dir(target, f"{old}/{name}")
                    # crash-decidable marker: the aside is COMPLETE, so a
                    # crash past this point rolls back to it; a crash
                    # before it merges the partial aside back (review r8)
                    pgfs.write_bytes_atomic(f"{old}/{name}.aside_done", b"1")
                pgfs.move_dir(child, target)
                pgfs.write_bytes_atomic(f"{old}/{name}.committed", b"1")
            # cleanup order (review r8): parked DIRS first, marker files
            # second — a crash mid-cleanup then leaves markers without
            # dirs (recovery skips them) instead of a stale dir whose
            # .committed vanished first (recovery would revert it)
            for _child, _is_dir in pgfs.list_dir(old):
                if _is_dir:
                    pgfs.delete_dir(_child)
            pgfs.delete_dir(old)
            pgfs.delete_dir(staging)
            return

        merged = base.join(
            updates.select(key_cols).distinct(), key_cols, "left_anti"
        ).unionByName(updates)
        if versioned:
            n = _next_version(base_uri, manifest)
            vdir = f"_v{n}"
            merged.write.mode("overwrite").parquet(
                pgfs.spark_uri(f"{base_uri}/{vdir}")
            )
            _check_not_concurrently_modified(base_uri, expected_version)
            _publish_manifest(
                base_uri,
                {
                    "version": n,
                    "partition_col": None,
                    "partition_dtype": None,
                    "partitions": None,
                    "path": vdir,
                    "max_batch_id": _carry_max_batch_id(manifest),
                    "writer_id": _carry_writer_id(manifest),
                },
            )
            return
        merged.write.mode("overwrite").parquet(pgfs.spark_uri(staging))
        _inplace_swap_whole(base_uri, staging)

    finally:
        updates.unpersist()


def delete_where(
    spark,
    base_uri: str,
    condition: str,
    partition_col: str | None = None,
    keep_history: int | None = None,
) -> int:
    """Versioned DELETE (r11) — the data-lifecycle primitive MERGE and
    compaction don't cover: publish a new snapshot EXCLUDING every row
    where ``condition`` evaluates TRUE (SQL DELETE semantics: NULL
    keeps the row), through the same crash-atomic pointer flip as
    ``merge_upsert``. Returns the number of rows deleted; deleting
    zero rows publishes nothing.

    With ``partition_col`` (the dataset's manifest partition column),
    only partitions CONTAINING matches rewrite — untouched partitions
    carry forward by reference, and a partition whose every row dies
    leaves the manifest entirely. At 100 TB a targeted delete (one
    user, one source, one day) is a touched-partitions rewrite, not a
    table rewrite — Delta/Iceberg's copy-on-write DELETE granularity.

    Right-to-be-forgotten note: the flip removes the rows from every
    subsequent read atomically, but prior snapshots retain them for
    time travel — PHYSICAL erasure is this call followed by
    ``vacuum_dataset`` once the retention window passes. Versioned
    datasets only: a pointerless dataset should migrate first
    (``merge_upsert(..., versioned=True)`` or
    ``compact_dataset(..., versioned=True)``)."""
    from pyspark.sql import functions as F

    from pg_parquet_spark.sources import fs as pgfs

    base_uri = base_uri.rstrip("/")
    manifest = read_manifest(base_uri)
    if manifest is None:
        raise ValueError(
            f"{base_uri} is not a versioned dataset (no {_CURRENT}); "
            "delete_where needs the manifest-pointer protocol — migrate "
            "with merge_upsert/compact_dataset (versioned=True) first"
        )
    if manifest.get("format") == "batches":
        raise ValueError(
            "delete_where on a streaming-batches dataset: run "
            "compact_dataset first to collapse the batch dirs into a "
            "snapshot (the batches form has no per-partition dirs to "
            "carry forward)"
        )
    vacuum_dataset(base_uri, keep_history=keep_history)
    expected_version = manifest["version"]
    base = read_versioned(spark, base_uri)
    # SQL DELETE semantics: a NULL predicate keeps the row
    dies = F.coalesce(F.expr(condition).cast("boolean"), F.lit(False))
    n_deleted = base.filter(dies).count()
    if n_deleted == 0:
        return 0

    if partition_col is not None:
        if manifest.get("partitions") is None:
            raise ValueError(
                "partitioned delete on an unpartitioned snapshot — pass "
                "partition_col=None, or compact_dataset(partition_by=[...]) "
                "first"
            )
        if manifest.get("partition_col") != partition_col:
            raise ValueError(
                f"partitioned delete on {partition_col!r} but the current "
                f"snapshot is partitioned on {manifest.get('partition_col')!r}"
            )
        affected = [
            r[0]
            for r in base.filter(dies).select(partition_col).distinct().collect()
        ]
        scoped_kept = base.filter(
            F.col(partition_col).isin(affected)
        ).filter(~dies)
        n = _next_version(base_uri, manifest)
        vdir = f"_v{n}"
        scoped_kept.hint("rebalance", partition_col).write.mode(
            "overwrite"
        ).partitionBy(partition_col).parquet(
            pgfs.spark_uri(f"{base_uri}/{vdir}")
        )
        partitions = dict(manifest["partitions"])
        for value in affected:
            # fully-deleted partitions leave the manifest; survivors
            # re-enter below from the new snapshot's hive dirs
            partitions.pop(str(value), None)
            partitions.pop(value, None)
        for child, value in _hive_partition_dirs(
            f"{base_uri}/{vdir}", partition_col
        ):
            name = child.rstrip("/").rsplit("/", 1)[1]
            partitions[value] = f"{vdir}/{name}"
        _check_not_concurrently_modified(base_uri, expected_version)
        _publish_manifest(
            base_uri,
            {
                "version": n,
                "partition_col": partition_col,
                "partition_dtype": manifest.get("partition_dtype"),
                "partitions": partitions,
                "max_batch_id": _carry_max_batch_id(manifest),
                "writer_id": _carry_writer_id(manifest),
            },
        )
        return n_deleted

    kept = base.filter(~dies)
    n = _next_version(base_uri, manifest)
    vdir = f"_v{n}"
    kept.write.mode("overwrite").parquet(pgfs.spark_uri(f"{base_uri}/{vdir}"))
    _check_not_concurrently_modified(base_uri, expected_version)
    _publish_manifest(
        base_uri,
        {
            "version": n,
            "partition_col": None,
            "partition_dtype": None,
            "partitions": None,
            "path": vdir,
            "max_batch_id": _carry_max_batch_id(manifest),
            "writer_id": _carry_writer_id(manifest),
        },
    )
    return n_deleted


def compact_dataset(
    spark,
    uri: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_by: list[str] | None = None,
    compression: str = "snappy",
    cluster_by: list[str] | None = None,
    cluster_bits: int = 8,
    versioned: bool | None = None,
    keep_history: int | None = None,
) -> int:
    """Small-files compaction: rewrite a parquet dataset into
    ceil(total_bytes / target_file_bytes) files (the OPTIMIZE /
    bin-packing maintenance job every streaming or incremental sink
    eventually needs — thousands of KB-sized files turn scan planning
    and footer reads into the bottleneck long before data volume does).

    With ``partition_by`` the hive layout is preserved and rows are
    repartitioned on the partition columns so each output partition
    coalesces its own files. Publish follows merge_upsert's two tiers:
    on a versioned dataset (or ``versioned=True``) the rewrite lands in
    a new ``_v<n>`` snapshot and the ``_CURRENT`` pointer swaps
    atomically — readers see the old layout or the compacted one, never
    a mix; the legacy in-place tier stages into a sibling and swaps
    through an ``__old`` aside (failed rewrites never corrupt the
    source, but the swap has a brief aside window — see merge_upsert's
    durability note). All filesystem ops go through ``sources.fs``, so
    this runs on any registered store. Returns the target file count. At 100 TB
    this runs per-partition (compact only partitions whose file count
    drifted) — compose with merge_upsert's touched-partition
    pattern.

    ``cluster_by`` RESTORES multi-dimensional clustering while
    compacting (streaming appends and MERGE rewrites interleave rows
    arbitrarily, decaying the row-group stats a z-ordered initial
    write established): rows are re-sorted on the Morton interleave of
    the given columns — within each hive partition when
    ``partition_by`` is set, globally (range-partitioned on the
    z-key, as write_zordered) otherwise. Same quantile-fit +
    8-byte-key sort cost shape as the initial clustered write."""
    import math

    from pg_parquet_spark.sources import fs as pgfs

    uri = uri.rstrip("/")
    manifest = read_manifest(uri)
    if versioned is None:
        versioned = manifest is not None
    if manifest is not None and not versioned:
        raise ValueError(
            f"{uri} is a versioned dataset (has {_CURRENT}); "
            "an in-place compaction would bypass the pointer"
        )
    if versioned and partition_by and len(partition_by) != 1:
        # validate BEFORE the snapshot write (ADVICE r8): failing after
        # it discards the whole rewrite and orphans a _v dir
        raise ValueError(
            "versioned compaction supports a single partition "
            "column (the manifest maps one value per directory)"
        )
    if versioned:
        if manifest is None:
            _recover_inplace(uri)  # crashed legacy publish before migration
        vacuum_dataset(uri, keep_history=keep_history)
        expected_version = manifest["version"] if manifest else 0
        if manifest is not None:
            refs = _manifest_refs(manifest)
            total = sum(
                sz
                for rel in refs
                for _u, sz in pgfs.tree_files(f"{uri}/{rel}", suffix=".parquet")
            )
            df = read_versioned(spark, uri)
        else:
            total = sum(
                sz for _u, sz in pgfs.tree_files(uri, suffix=".parquet")
            )
            df = spark.read.parquet(pgfs.spark_uri(uri))
    else:
        _recover_inplace(uri)
        total = sum(sz for _u, sz in pgfs.tree_files(uri, suffix=".parquet"))
        df = spark.read.parquet(pgfs.spark_uri(uri))
    if versioned and partition_by:
        # NULL partition values would land in the __HIVE_DEFAULT_PARTITION__
        # sentinel dir, the manifest would store the sentinel STRING as the
        # partition value, and _resolve_snapshot would re-attach it as a
        # literal — silent corruption for string dtypes (ADVICE r8).
        # Checked BEFORE the snapshot write; the probe is a column-pruned
        # limit-1 scan and parquet null-counts let row groups skip.
        from pyspark.sql import functions as F

        if df.filter(F.col(partition_by[0]).isNull()).limit(1).count():
            raise ValueError(
                f"dataset contains NULL {partition_by[0]!r} values; the "
                "versioned partitioned protocol requires concrete partition "
                "values — map NULLs to a default value before compacting "
                "with partition_by"
            )
    n = max(1, math.ceil(total / target_file_bytes))
    staging = uri + "__compact"
    pgfs.delete_dir(staging)
    if cluster_by:
        _reject_reserved_columns(df, ["_zorder"])
        z = zorder_expr(df, cluster_by, bits=cluster_bits)
        df = df.withColumn("_zorder", z)
        if partition_by:
            # cluster WITHIN each hive partition: partition dirs keep
            # their pruning role, row groups inside regain tight
            # multi-dim stats
            df = df.repartition(n, *partition_by).sortWithinPartitions(
                *partition_by, "_zorder"
            )
        else:
            df = df.repartitionByRange(n, "_zorder").sortWithinPartitions(
                "_zorder"
            )
        df = df.drop("_zorder")
        w = df.write.partitionBy(*partition_by) if partition_by else df.write
    elif partition_by:
        w = df.repartition(n, *partition_by).write.partitionBy(*partition_by)
    else:
        w = df.repartition(n).write
    if versioned:
        vn = _next_version(uri, manifest)
        vdir = f"_v{vn}"
        w.mode("overwrite").option("compression", compression).parquet(
            pgfs.spark_uri(f"{uri}/{vdir}")
        )
        if partition_by:
            pcol = partition_by[0]
            partitions = {
                value: f"{vdir}/" + child.rstrip("/").rsplit("/", 1)[1]
                for child, value in _hive_partition_dirs(
                    f"{uri}/{vdir}", pcol
                )
            }
            _check_not_concurrently_modified(uri, expected_version)
            _publish_manifest(
                uri,
                {
                    "version": vn,
                    "partition_col": pcol,
                    "partition_dtype": df.schema[pcol].dataType.simpleString(),
                    "partitions": partitions,
                    "max_batch_id": _carry_max_batch_id(manifest),
                    "writer_id": _carry_writer_id(manifest),
                },
            )
        else:
            _check_not_concurrently_modified(uri, expected_version)
            _publish_manifest(
                uri,
                {
                    "version": vn,
                    "partition_col": None,
                    "partition_dtype": None,
                    "partitions": None,
                    "path": vdir,
                    "max_batch_id": _carry_max_batch_id(manifest),
                    "writer_id": _carry_writer_id(manifest),
                },
            )
        return n
    w.mode("overwrite").option("compression", compression).parquet(
        pgfs.spark_uri(staging)
    )
    _inplace_swap_whole(uri, staging)
    return n


def publish_snapshot(
    spark,
    root_uri: str,
    df: DataFrame,
    keep_history: int | None = None,
    extra: dict | None = None,
) -> int:
    """CREATE OR REPLACE for a versioned dataset: write ``df`` as a new
    immutable flat ``_v<n>`` snapshot and flip the pointer — the
    FULL-REPLACEMENT primitive the other maintenance ops don't cover
    (merge = keyed replace, compact = layout replace). Crash-atomic
    like every manifest publish (a reader resolves the old snapshot or
    the new one, never a mix); prior snapshots stay time-travelable
    within the retention window (vacuumed at entry like merge/compact).
    Carries the streaming sink's replay horizon and writer identity, so
    replacing a sink-fed dataset doesn't reopen replayed batch ids
    (the compact_dataset contract). Returns the published version.

    Refuses an unversioned NON-EMPTY root: silently superseding a
    legacy parquet dataset is the migration footgun class the merge
    migration guards against — migrate through merge_upsert /
    compact_dataset first, or delete the root explicitly if
    replacement is genuinely intended."""
    from pg_parquet_spark.sources import fs as pgfs

    root_uri = root_uri.rstrip("/")
    manifest = read_manifest(root_uri)
    if manifest is None and pgfs.exists(root_uri):
        loose = pgfs.tree_files(root_uri, suffix=".parquet")
        if loose:
            raise ValueError(
                f"publish_snapshot refuses the unversioned non-empty root "
                f"{root_uri} ({len(loose)} loose parquet files) — migrate "
                "it with merge_upsert/compact_dataset, or delete it "
                "explicitly if full replacement is intended"
            )
    if manifest is not None:
        vacuum_dataset(root_uri, keep_history=keep_history)
    expected = manifest["version"] if manifest else 0
    n = _next_version(root_uri, manifest) if pgfs.exists(root_uri) else 1
    vdir = f"_v{n}"
    df.write.mode("overwrite").parquet(pgfs.spark_uri(f"{root_uri}/{vdir}"))
    _check_not_concurrently_modified(root_uri, expected)
    _publish_manifest(
        root_uri,
        {
            "version": n,
            "partition_col": None,
            "partition_dtype": None,
            "partitions": None,
            "path": vdir,
            "max_batch_id": _carry_max_batch_id(manifest),
            "writer_id": _carry_writer_id(manifest),
            # caller metadata (e.g. the streaming refresh's
            # folded_batch_id replay stamp) rides the SAME atomic
            # manifest write — no second-write torn-state window.
            # The stamp is CARRIED across plain re-publishes so a
            # full-replace of a refresh-maintained summary does not
            # silently reset the replay gate (extra overrides).
            **(
                {"folded_batch_id": manifest["folded_batch_id"]}
                if manifest and "folded_batch_id" in manifest
                else {}
            ),
            **(extra or {}),
        },
    )
    return n


def describe_versioned(root_uri: str) -> dict:
    """Human/tooling-facing snapshot summary of a versioned dataset:
    current version, manifest form, partition map or batch list, the
    retained time-travel versions, and per-referenced-prefix file/byte
    counts (footer-free: one recursive LIST per referenced prefix).
    Raises on unversioned roots — plain parquet has nothing to
    describe beyond the directory itself."""
    from pg_parquet_spark.sources import fs as pgfs

    root_uri = root_uri.rstrip("/")
    manifest = read_manifest(root_uri)
    if manifest is None:
        raise ValueError(f"{root_uri} has no {_CURRENT} pointer")
    retained = _retained_manifest_versions(root_uri)
    refs = {}
    for rel in sorted(_manifest_refs(manifest)):
        files = pgfs.tree_files(f"{root_uri}/{rel}", suffix=".parquet")
        refs[rel] = {"files": len(files), "bytes": sum(sz for _u, sz in files)}
    form = (
        "batches"
        if manifest.get("format") == "batches"
        else ("partitioned" if manifest.get("partitions") is not None else "flat")
    )
    out = {
        "version": manifest["version"],
        "form": form,
        "retained_versions": retained,
        "refs": refs,
    }
    if form == "partitioned":
        out["partition_col"] = manifest["partition_col"]
        out["partitions"] = dict(manifest["partitions"])
    elif form == "batches":
        out["batches"] = dict(manifest["batches"])
    else:
        out["path"] = manifest["path"]
    return out


def compact_partitions(
    spark,
    uri: str,
    max_files: int = 8,
    target_file_bytes: int = 128 * 1024 * 1024,
    compression: str = "snappy",
    keep_history: int | None = None,
) -> list[str]:
    """Incremental per-partition compaction of a versioned partitioned
    snapshot — the 100 TB shape ``compact_dataset``'s docstring promises:
    only partitions whose file count exceeds ``max_files`` are rewritten
    into the new snapshot; every other partition carries forward BY
    REFERENCE, and the whole maintenance pass publishes with one atomic
    pointer flip. A streaming-merge workload fragments a few hot
    partitions while the cold ones stay compact — rewriting the
    dataset (or even scanning the cold partitions) would make the
    maintenance cost proportional to data size instead of drift.

    Cost shape: one delimiter LIST per partition to count files (no data
    read for non-drifted partitions), then ceil(bytes/target) output
    files per drifted partition. Returns the partition values compacted
    (empty list = nothing drifted, nothing published).

    Requires the partitioned snapshot form: run ``compact_dataset``
    first for flat, legacy, or streaming-batches datasets."""
    import math

    from pg_parquet_spark.sources import fs as pgfs

    uri = uri.rstrip("/")
    manifest = read_manifest(uri)
    if manifest is None or manifest.get("partitions") is None:
        raise ValueError(
            f"{uri} is not a partitioned versioned snapshot; use "
            "compact_dataset (it converts flat/legacy/batches datasets "
            "and can partition the rewrite)"
        )
    vacuum_dataset(uri, keep_history=keep_history)
    expected = manifest["version"]
    drifted: dict[str, tuple[str, int]] = {}
    for val, rel in manifest["partitions"].items():
        files = pgfs.tree_files(f"{uri}/{rel}", suffix=".parquet")
        if len(files) > max_files:
            drifted[val] = (rel, sum(sz for _u, sz in files))
    if not drifted:
        return []
    n = _next_version(uri, manifest)
    vdir = f"_v{n}"
    partitions = dict(manifest["partitions"])
    for val in sorted(drifted):
        rel, total = drifted[val]
        k = max(1, math.ceil(total / target_file_bytes))
        dirname = rel.rstrip("/").rsplit("/", 1)[-1]
        df = spark.read.parquet(pgfs.spark_uri(f"{uri}/{rel}"))
        (
            df.repartition(k)
            .write.mode("overwrite")
            .option("compression", compression)
            .parquet(pgfs.spark_uri(f"{uri}/{vdir}/{dirname}"))
        )
        partitions[val] = f"{vdir}/{dirname}"
    _check_not_concurrently_modified(uri, expected)
    _publish_manifest(
        uri,
        {
            "version": n,
            "partition_col": manifest["partition_col"],
            "partition_dtype": manifest["partition_dtype"],
            "partitions": partitions,
            "max_batch_id": _carry_max_batch_id(manifest),
            "writer_id": _carry_writer_id(manifest),
        },
    )
    return sorted(drifted)


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
    from pg_parquet_spark.sources import fs as pgfs

    w.parquet(pgfs.spark_uri(uri))


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

    from pg_parquet_spark.sources import fs as pgfs

    _reject_reserved_columns(df, ["_hilbert", "_hb0", "_hb1"])

    boundary_lists = df.approxQuantile(
        order_by, [i / (1 << bits) for i in range(1, 1 << bits)], 0.001
    )
    staged = df
    for i, (c, bounds) in enumerate(zip(order_by, boundary_lists)):
        staged = staged.withColumn(f"_hb{i}", _bucket_expr(c, bounds))
    # shuffle barrier: materialize the bucket columns so projection
    # collapse cannot inline the bucket trees into the hilbert unroll.
    # Hash on the order columns, not round-robin (r14 — see
    # write_zordered: keyless repartition pays a local input sort)
    par = df.sparkSession.sparkContext.defaultParallelism
    staged = staged.repartition(par, *order_by)
    h = _hilbert_expr(F.col("_hb0"), F.col("_hb1"), bits)
    (
        staged.withColumn("_hilbert", h)
        .repartitionByRange(num_files, "_hilbert")
        .sortWithinPartitions("_hilbert")
        .drop("_hilbert", "_hb0", "_hb1")
        .write.mode(mode)
        .option("compression", compression)
        .parquet(pgfs.spark_uri(uri))
    )


def snapshot_diff(
    spark,
    root_uri: str,
    key_cols: list[str],
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Audit DIFF between two retained snapshots of a versioned dataset
    (r11): one row per key whose state changed — ``change`` ∈
    {'added', 'removed', 'changed'} — the review artifact a MERGE or
    DELETE ships with ("this publish touched exactly these keys").
    ``to_version`` defaults to the current pointer. Both versions must
    still be retained (see ``vacuum_dataset``'s keep_history).

    Scale shape: two pointer-resolved reads, one full-outer join on the
    key columns, a struct comparison on the non-key columns — the same
    single key-shuffle a MERGE pays; 'changed' detection compares
    typed structs (no hashing, no false positives). At partition
    granularity most of both sides is the SAME carried-by-reference
    files, which the scan dedupes at the FileScan level."""
    from pyspark.sql import functions as F

    old = read_versioned(spark, root_uri, version=from_version)
    new = read_versioned(spark, root_uri, version=to_version)
    if set(old.columns) != set(new.columns):
        raise ValueError(
            f"snapshot schemas differ: v{from_version} has "
            f"{sorted(old.columns)}, target has {sorted(new.columns)} — "
            "diff keys cannot align"
        )
    val_cols = [c for c in new.columns if c not in key_cols]
    o = old.select(
        *key_cols, F.struct(*val_cols).alias("_oval"), F.lit(True).alias("_in_old")
    )
    nw = new.select(
        *key_cols, F.struct(*val_cols).alias("_nval"), F.lit(True).alias("_in_new")
    )
    j = o.join(nw, key_cols, "full_outer")
    return (
        j.select(
            *key_cols,
            F.when(F.col("_in_old").isNull(), F.lit("added"))
            .when(F.col("_in_new").isNull(), F.lit("removed"))
            .when(~F.col("_oval").eqNullSafe(F.col("_nval")), F.lit("changed"))
            .alias("change"),
        )
        .filter(F.col("change").isNotNull())
        .orderBy(*key_cols)
    )


# ---------------------------------------------------------------------------
# managed-index generation pointers (r14): the ONE shared
# publish/resolve pair behind the managed IVF and managed BM25 index
# families — the crash-ordering invariant (history file lands BEFORE
# the pointer flips, so generation time travel never dangles) and the
# missing-pointer contract live here exactly once.


def managed_manifest_publish(
    root_uri: str, pointer_name: str, history_prefix: str, manifest: dict
) -> None:
    """Publish a managed-index generation manifest: the immutable
    ``{history_prefix}-<generation>.json`` history file first, then
    the ``pointer_name`` pointer rewritten atomically — the versioned
    layout's ordering, so a crash between the two writes leaves the
    pointer on the old generation while the history already knows the
    new one (harmless), never the reverse."""
    import json

    from pg_parquet_spark.sources import fs as pgfs

    root_uri = root_uri.rstrip("/")
    data = json.dumps(manifest, sort_keys=True).encode("utf-8")
    pgfs.write_bytes_atomic(
        f"{root_uri}/{history_prefix}-{manifest['generation']}.json", data
    )
    pgfs.write_bytes_atomic(root_uri + "/" + pointer_name, data)


def managed_manifest_exists(root_uri: str, pointer_name: str) -> bool:
    """True when the managed index's generation pointer exists — the
    bootstrap test the streaming drains use (an explicit existence
    probe, NOT except-ValueError around resolve, which would misroute
    a CORRUPT pointer's JSONDecodeError to the bootstrap path)."""
    from pg_parquet_spark.sources import fs as pgfs

    return pgfs.exists(root_uri.rstrip("/") + "/" + pointer_name)


def managed_manifest_resolve(
    root_uri: str, pointer_name: str, missing_msg: str
) -> dict:
    """Resolve the managed index's current generation manifest, or
    raise ``ValueError(missing_msg)`` when no pointer exists. A
    present-but-corrupt pointer raises ``json.JSONDecodeError`` —
    deliberately NOT folded into the missing case, so corruption
    surfaces instead of re-initializing over a damaged index."""
    import json

    from pg_parquet_spark.sources import fs as pgfs

    uri = root_uri.rstrip("/") + "/" + pointer_name
    if not pgfs.exists(uri):
        raise ValueError(missing_msg)
    return json.loads(pgfs.read_bytes(uri))
