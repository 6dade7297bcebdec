"""Partition pruning + shuffle-free bucketed joins — plan-level
assertions (the 100 TB layout story, SCALE.md)."""

from pyspark.sql import functions as F

from pg_parquet_spark.session import table
from pg_parquet_spark.sources.layout import write_bucketed, write_partitioned

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partition_pruning(spark, tmp_path):
    docs = table(spark, SF, "documents")
    out = str(tmp_path / "docs_partitioned")
    write_partitioned(docs, out, ["lang"])
    back = spark.read.parquet(out)
    pruned = back.filter(F.col("lang") == "en").select("doc_id")
    # partition filter prunes directories at planning time
    plan = pruned._jdf.queryExecution().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan or "lang#" in plan
    got = pruned.count()
    want = docs.filter(F.col("lang") == "en").count()
    assert got == want
    # physical layout: one directory per lang value
    import os

    langs = {d for d in os.listdir(out) if d.startswith("lang=")}
    assert len(langs) >= 2


def test_bucketed_join_is_shuffle_free(spark):
    li = table(spark, SF, "lineitem")
    orders = table(spark, SF, "orders")
    write_bucketed(li, "li_bucketed", ["l_orderkey"], 8, sort_by=["l_orderkey"])
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        "ord_bucketed",
        ["l_orderkey"],
        8,
        sort_by=["l_orderkey"],
    )
    a = spark.table("li_bucketed")
    b = spark.table("ord_bucketed")
    joined = a.join(b.hint("merge"), "l_orderkey").select("l_orderkey", "l_quantity", "o_totalprice")
    joined.write.format("noop").mode("overwrite").save()
    plan = _plan(joined)
    # co-located buckets: the join runs with ZERO shuffle exchanges
    assert "Exchange" not in plan, plan
    assert joined.count() == li.join(orders, li.l_orderkey == orders.o_orderkey).count()


def test_bucketed_aggregation_no_exchange_before_agg(spark):
    li = table(spark, SF, "lineitem")
    write_bucketed(li, "li_bucketed_agg", ["l_orderkey"], 8)
    agg = (
        spark.table("li_bucketed_agg")
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("q"))
    )
    plan = _plan(agg)
    assert "Exchange" not in plan, plan


def _row_group_spans(path: str, cols: list[str]):
    """Mean normalized (max-min)/global_range per row group, per column."""
    import glob
    import os

    import pyarrow.parquet as pq

    lo = {c: None for c in cols}
    hi = {c: None for c in cols}
    per = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            row = {}
            for c in cols:
                st = md.row_group(rg).column(idx[c]).statistics
                row[c] = (st.min, st.max)
                lo[c] = st.min if lo[c] is None else min(lo[c], st.min)
                hi[c] = st.max if hi[c] is None else max(hi[c], st.max)
            per.append(row)
    return {
        c: sum((r[c][1] - r[c][0]) / (hi[c] - lo[c]) for r in per) / len(per)
        for c in cols
    }


def test_zorder_tightens_stats_on_both_dims(spark, tmp_path):
    """Z-order write shrinks row-group min/max spans on BOTH interleaved
    columns (the multi-column data-skipping property); a plain write
    leaves them near the full range. Values round-trip unchanged."""
    from pg_parquet_spark.sources.layout import write_zordered

    li = table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    zdir = str(tmp_path / "li_zorder")
    pdir = str(tmp_path / "li_plain")
    write_zordered(li, zdir, ["l_partkey", "l_suppkey"], num_files=4)
    li.repartition(4).write.mode("overwrite").parquet(pdir)

    zspan = _row_group_spans(zdir, ["l_partkey", "l_suppkey"])
    pspan = _row_group_spans(pdir, ["l_partkey", "l_suppkey"])
    for c in ("l_partkey", "l_suppkey"):
        # measured at sf0.01: z ≈ 0.50-0.66, plain ≈ 1.0
        assert zspan[c] < 0.85, (c, zspan)
        assert pspan[c] > 0.9, (c, pspan)
        assert zspan[c] < pspan[c]
    # layout never changes values
    back = spark.read.parquet(zdir)
    assert back.count() == li.count()
    assert back.agg(F.sum("l_partkey")).first()[0] == li.agg(
        F.sum("l_partkey")
    ).first()[0]


def test_merge_upsert_rewrites_only_touched_partitions(spark, tmp_path):
    """Partition-scoped MERGE: updates confined to one lang partition
    leave every other partition's files physically untouched (same
    paths, same mtimes) — the copy-on-write granularity that keeps a
    100 TB upsert proportional to the touched data."""
    import os

    from pg_parquet_spark.sources.layout import merge_upsert, write_partitioned

    docs = table(spark, SF, "documents").select("doc_id", "text", "lang")
    base = str(tmp_path / "docs_base")
    write_partitioned(docs, base, ["lang"])

    def snapshot(skip_lang):
        out = {}
        for d in os.listdir(base):
            if d.startswith("lang=") and d != f"lang={skip_lang}":
                p = os.path.join(base, d)
                out[d] = {
                    f: os.stat(os.path.join(p, f)).st_mtime_ns
                    for f in os.listdir(p)
                    if f.endswith(".parquet")
                }
        return out

    before = snapshot("en")
    updates = (
        docs.filter(F.col("lang") == "en")
        .limit(5)
        .withColumn("text", F.lit("updated body"))
    )
    n_updates = updates.count()
    merge_upsert(spark, base, updates, ["doc_id"], partition_col="lang")
    assert snapshot("en") == before  # other partitions byte-untouched

    back = spark.read.parquet(base)
    assert back.count() == docs.count()  # pure update, no inserts
    assert back.filter(F.col("text") == "updated body").count() == n_updates

    # insert path: new key lands in its partition
    ins = spark.createDataFrame(
        [(999_999, "brand new doc", "en")], ["doc_id", "text", "lang"]
    )
    merge_upsert(spark, base, ins, ["doc_id"], partition_col="lang")
    assert spark.read.parquet(base).count() == docs.count() + 1

    # malformed updates are rejected before any write
    import pytest

    bad = spark.createDataFrame([(1, "x")], ["doc_id", "text"])  # no lang
    with pytest.raises(ValueError, match="schema must match"):
        merge_upsert(spark, base, bad, ["doc_id"], partition_col="lang")
    nokey = spark.createDataFrame([("x", "en", 1)], ["text", "lang", "other"])
    with pytest.raises(ValueError, match="missing key column"):
        merge_upsert(spark, base, nokey, ["doc_id"], partition_col="lang")


def test_compact_dataset_flat_and_partitioned(spark, tmp_path):
    """Compaction bin-packs a fragmented dataset to the target file
    count (flat and hive-partitioned), preserving every row."""
    import glob
    import os

    from pg_parquet_spark.sources.layout import compact_dataset

    docs = table(spark, SF, "documents")
    n_rows = docs.count()

    flat = str(tmp_path / "flat")
    docs.repartition(32).write.parquet(flat)
    assert len(glob.glob(os.path.join(flat, "*.parquet"))) == 32
    total = sum(
        os.path.getsize(f) for f in glob.glob(os.path.join(flat, "*.parquet"))
    )
    compact_dataset(spark, flat, target_file_bytes=total + 1)
    assert len(glob.glob(os.path.join(flat, "*.parquet"))) == 1
    assert spark.read.parquet(flat).count() == n_rows

    part = str(tmp_path / "part")
    # fragment deliberately with a raw partitioned write (r14:
    # write_partitioned now REBALANCEs to ~one file per partition
    # value, which would leave this compaction nothing to do — the
    # test's subject is compact_dataset over a fragmented layout)
    docs.repartition(16).write.partitionBy("lang").parquet(part)
    before_files = len(glob.glob(os.path.join(part, "lang=*", "*.parquet")))
    assert before_files > 5, "fixture must start fragmented"
    compact_dataset(
        spark, part, target_file_bytes=1 << 30, partition_by=["lang"]
    )
    after = glob.glob(os.path.join(part, "lang=*", "*.parquet"))
    assert len(after) < before_files
    langs = {os.path.basename(os.path.dirname(f)) for f in after}
    assert len(langs) >= 2  # hive layout preserved
    assert spark.read.parquet(part).count() == n_rows


def test_stream_partitioned_sink_lands_hive_layout(spark, tmp_path):
    """The foreachBatch partitioned sink lands event_type=… directories
    whose union equals the source."""
    import glob
    import os

    from pg_parquet_spark.streaming.stream import (
        drain_to_partitioned_parquet,
        read_events_stream,
    )

    path = str(tmp_path / "landing")
    events = read_events_stream(spark, SF).select("event_id", "event_type", "value")
    drain_to_partitioned_parquet(events, path, ["event_type"])
    dirs = {os.path.basename(d) for d in glob.glob(os.path.join(path, "event_type=*"))}
    assert len(dirs) == 5, dirs
    back = spark.read.parquet(path)
    assert back.count() == table(spark, SF, "events").count()


def test_zorder_interleave_is_morton(spark):
    """The interleave places bit b of dim i at position b*d+i: buckets
    (x=0b11, y=0b00) and (x=0b00, y=0b11) give z 0b0101 and 0b1010."""
    from pg_parquet_spark.sources.layout import zorder_expr

    df = spark.createDataFrame(
        [(0.5, 3.5), (2.5, 1.5)], ["x", "y"]
    )
    # boundaries at 1,2,3 → 4 buckets per dim (bits=2)
    import unittest.mock as mock

    with mock.patch.object(
        type(df),
        "approxQuantile",
        lambda self, c, p, e: [[1.0, 2.0, 3.0] for _ in c],
    ):
        z = zorder_expr(df, ["x", "y"], bits=2)
    rows = df.select(z.alias("z")).collect()
    # x=0.5→bucket0, y=3.5→bucket3 → z = y bits at odd positions = 0b1010
    # x=2.5→bucket2, y=1.5→bucket1 → z = 0b0110
    assert [r.z for r in rows] == [0b1010, 0b0110]


def test_bloom_filter_written_and_readable(spark, tmp_path):
    """write_with_bloom lands bloom filters in the footer for exactly
    the requested columns, and a point lookup round-trips."""
    import glob
    import os

    import pyarrow.parquet as pq

    from pg_parquet_spark.sources.layout import write_with_bloom

    li = table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    ).repartition(2)
    out = str(tmp_path / "li_bloom")
    plain = str(tmp_path / "li_plain")
    # the tiny fixture stays fully dictionary-encoded, and parquet-mr
    # (correctly) skips blooms for dict-encoded pages — force plain
    # encoding so the bitset is materialized for the assertion
    write_with_bloom(
        li, out, ["l_partkey"], expected_ndv=2000, disable_dictionary=True
    )
    (
        li.write.mode("overwrite")
        .option("compression", "snappy")
        .option("parquet.enable.dictionary", "false")
        .parquet(plain)
    )

    def _stats(d):
        files = glob.glob(os.path.join(d, "*.parquet"))
        total = sum(os.path.getsize(f) for f in files)
        payload = 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                payload += sum(
                    md.row_group(rg).column(i).total_compressed_size
                    for i in range(md.num_columns)
                )
        return total, payload

    bloom_total, bloom_payload = _stats(out)
    plain_total, plain_payload = _stats(plain)
    # same compressed column payload, but the bloom file carries extra
    # non-payload bytes — the serialized bitset (pyarrow 16 exposes no
    # bloom_filter_offset field; the footprint delta is the evidence)
    assert abs(bloom_payload - plain_payload) < 0.01 * plain_payload
    assert (bloom_total - bloom_payload) > (plain_total - plain_payload) + 1024

    key = li.select("l_partkey").first()[0]
    back = spark.read.parquet(out).filter(F.col("l_partkey") == key)
    assert back.count() == li.filter(F.col("l_partkey") == key).count()


def _xy2d_ref(n, x, y):
    """Python reference for the classic Hilbert xy2d loop."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_expr_matches_python_reference(spark):
    """The unrolled column expression equals the reference xy2d for a
    grid + random sample of the 8-bit bucket space."""
    import random

    from pg_parquet_spark.sources.layout import _hilbert_expr

    rng = random.Random(42)
    pts = [(x, y) for x in (0, 1, 127, 128, 255) for y in (0, 1, 127, 128, 255)]
    pts += [(rng.randrange(256), rng.randrange(256)) for _ in range(100)]
    df = spark.createDataFrame(pts, ["x", "y"])
    rows = df.select(
        "x", "y", _hilbert_expr(F.col("x"), F.col("y"), 8).alias("h")
    ).collect()
    for r in rows:
        assert r.h == _xy2d_ref(256, r.x, r.y), (r.x, r.y)
    # bijectivity on the sampled set (no two points share an index)
    hs = [r.h for r in rows]
    assert len(set(hs)) == len(set(pts))


def test_hilbert_layout_spans_at_most_morton(spark, tmp_path):
    """Hilbert clustering tightens row-group spans at least as well as
    Morton on the same data/file count, and far better than unsorted."""
    from pg_parquet_spark.sources.layout import write_hilbert, write_zordered

    li = table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    hdir, zdir = str(tmp_path / "hilbert"), str(tmp_path / "morton")
    write_hilbert(li, hdir, ["l_partkey", "l_suppkey"], num_files=4)
    write_zordered(li, zdir, ["l_partkey", "l_suppkey"], num_files=4)
    hspan = _row_group_spans(hdir, ["l_partkey", "l_suppkey"])
    zspan = _row_group_spans(zdir, ["l_partkey", "l_suppkey"])
    mean_h = sum(hspan.values()) / 2
    mean_z = sum(zspan.values()) / 2
    assert mean_h < 0.85
    assert mean_h <= mean_z + 0.05, (hspan, zspan)
    assert spark.read.parquet(hdir).count() == li.count()


# --- store-portable maintenance (VERDICT r6 #3): the staging+swap
# protocol must run against a non-local store. A SubTreeFileSystem
# mounted as mem:// (with a spark_uri translator for the JVM-side
# columnar I/O) stands in for s3a/abfss the way the reference tests run
# MinIO/Azurite (src/pgrx_tests/object_store.rs).


import pytest


@pytest.fixture()
def mem_store(tmp_path):
    from pyarrow import fs as pafs

    from pg_parquet_spark.sources import fs as pgfs

    root = str(tmp_path / "memroot")
    import os

    os.makedirs(root, exist_ok=True)
    pgfs.register_filesystem(
        "mem",
        lambda: pafs.SubTreeFileSystem(root, pafs.LocalFileSystem()),
        spark_uri_translator=lambda u: "file://" + root + "/" + u[len("mem://"):],
    )
    yield "mem://bucket"
    pgfs.unregister_filesystem("mem")


def test_merge_upsert_on_object_store(spark, mem_store):
    """Partitioned MERGE over mem:// — list/move/delete all go through
    the scheme dispatch, no local-path assumptions survive."""
    from pg_parquet_spark.sources import fs as pgfs
    from pg_parquet_spark.sources.layout import merge_upsert

    docs = table(spark, SF, "documents").select("doc_id", "text", "lang")
    base = mem_store + "/docs"
    docs.write.partitionBy("lang").parquet(pgfs.spark_uri(base))

    updates = (
        docs.filter(F.col("lang") == "en")
        .limit(3)
        .withColumn("text", F.lit("updated on store"))
    )
    merge_upsert(spark, base, updates, ["doc_id"], partition_col="lang")
    back = spark.read.parquet(pgfs.spark_uri(base))
    assert back.count() == docs.count()
    assert back.filter(F.col("text") == "updated on store").count() == 3
    # no staging residue on the store
    assert not pgfs.exists(base + "__staging")

    # flat (unpartitioned) path: full rename-swap protocol on the store
    flat = mem_store + "/docs_flat"
    docs.write.parquet(pgfs.spark_uri(flat))
    ins = spark.createDataFrame(
        [(888_888, "store insert", "en")], ["doc_id", "text", "lang"]
    )
    merge_upsert(spark, flat, ins, ["doc_id"])
    assert spark.read.parquet(pgfs.spark_uri(flat)).count() == docs.count() + 1
    assert not pgfs.exists(flat + "__old")


def test_compact_dataset_on_object_store(spark, mem_store):
    from pg_parquet_spark.sources import fs as pgfs
    from pg_parquet_spark.sources.layout import compact_dataset

    docs = table(spark, SF, "documents")
    uri = mem_store + "/frag"
    docs.repartition(16).write.parquet(pgfs.spark_uri(uri))
    assert len(pgfs.tree_files(uri, ".parquet")) == 16
    compact_dataset(spark, uri, target_file_bytes=1 << 30)
    assert len(pgfs.tree_files(uri, ".parquet")) == 1
    assert spark.read.parquet(pgfs.spark_uri(uri)).count() == docs.count()
    assert not pgfs.exists(uri + "__compact") and not pgfs.exists(uri + "__old")


def test_merge_upsert_rejects_duplicate_update_keys(spark, tmp_path):
    """Delta-MERGE parity (ADVICE r6): multiple update rows for one key
    fail fast instead of landing duplicate keys."""
    from pg_parquet_spark.sources.layout import merge_upsert

    docs = table(spark, SF, "documents").select("doc_id", "text", "lang")
    base = str(tmp_path / "dupbase")
    docs.write.partitionBy("lang").parquet(base)
    dup = spark.createDataFrame(
        [(1, "a", "en"), (1, "b", "en")], ["doc_id", "text", "lang"]
    )
    with pytest.raises(ValueError, match="multiple rows"):
        merge_upsert(spark, base, dup, ["doc_id"], partition_col="lang")
    # base untouched by the rejected merge
    assert spark.read.parquet(base).count() == docs.count()


def test_merge_upsert_detects_partition_moved_key(spark, tmp_path):
    """check_partition_stability: an update row whose key lives in a
    DIFFERENT base partition is detected (the silent-stale-row hazard,
    ADVICE r6)."""
    from pg_parquet_spark.sources.layout import merge_upsert

    docs = table(spark, SF, "documents").select("doc_id", "text", "lang")
    base = str(tmp_path / "movebase")
    docs.write.partitionBy("lang").parquet(base)
    victim = docs.filter(F.col("lang") != "en").limit(1).collect()[0]
    moved = spark.createDataFrame(
        [(victim.doc_id, "moved", "en")], ["doc_id", "text", "lang"]
    )
    with pytest.raises(ValueError, match="untouched partition"):
        merge_upsert(
            spark, base, moved, ["doc_id"], partition_col="lang",
            check_partition_stability=True,
        )
    # without the check the documented assumption applies (stale row
    # remains) — this is exactly why the flag exists
    merge_upsert(spark, base, moved, ["doc_id"], partition_col="lang")
    back = spark.read.parquet(base)
    assert back.filter(F.col("doc_id") == victim.doc_id).count() == 2


def test_zorder_overflow_guard(spark):
    from pg_parquet_spark.sources.layout import zorder_expr

    li = table(spark, SF, "lineitem").limit(10)
    cols = ["l_quantity", "l_extendedprice"] * 4  # 8 dims × 8 bits = 64
    with pytest.raises(ValueError, match="63"):
        zorder_expr(li, cols, bits=8)


def test_partitioned_batch_writer_replay_is_idempotent(spark, tmp_path):
    """Replaying a micro-batch id (retry after partial write / restart
    replay from the checkpoint) must not duplicate rows (VERDICT r6
    'What's wrong' #1)."""
    from pg_parquet_spark.streaming.stream import partitioned_batch_writer

    path = str(tmp_path / "sink")
    events = table(spark, SF, "events").select("event_id", "event_type", "value")
    write = partitioned_batch_writer(path, ["event_type"])

    b0 = events.filter(F.col("event_id") % 2 == 0)
    b1 = events.filter(F.col("event_id") % 2 == 1)
    write(b0, 0)
    write(b1, 1)
    n = spark.read.parquet(path).count()
    assert n == events.count()

    # replay batch 1 (same id, same data) — no duplication
    write(b1, 1)
    assert spark.read.parquet(path).count() == n

    # replay batch 1 with FEWER rows (simulates retry after the engine
    # re-planned the batch): old batch-1 files are superseded, not added to
    write(b1.limit(10), 1)
    assert spark.read.parquet(path).count() == b0.count() + 10

    # replay landing in FEWER partitions than the earlier publish
    # (ADVICE r7: the old cleanup was scoped to the new output's
    # partitions, so stale batch-1 files survived in the others —
    # and the limit(10) case above could mask that by accident when
    # the unordered limit happened to touch every partition)
    one_type = b1.filter(F.col("event_type") == "click").limit(3)
    assert one_type.count() == 3
    write(one_type, 1)
    back = spark.read.parquet(path)
    assert back.count() == b0.count() + 3
    # every surviving batch-1 row is from the replay's single partition
    assert (
        back.withColumn("_f", F.input_file_name())
        .filter(F.col("_f").contains("batch-1-"))
        .select("event_type")
        .distinct()
        .collect()[0][0]
        == "click"
    )


def test_bloom_filter_skips_row_groups_at_read(spark, tmp_path):
    """Read-side bloom proof (VERDICT r6 #5): on a hash-scrambled
    layout (min/max stats prune nothing, dictionary disabled) a
    point lookup for an in-range-but-absent key scans ZERO rows from
    the bloom-filtered file and the WHOLE file without it — measured
    from Spark's own scan metrics, i.e. the vectorized reader's
    parquet-mr row-group filter consulted the serialized bloom."""
    from pg_parquet_spark.sources.layout import write_with_bloom

    li = table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    scrambled = li.orderBy(F.hash("l_orderkey")).coalesce(1)
    b_uri = str(tmp_path / "bloom")
    n_uri = str(tmp_path / "nobloom")
    write_with_bloom(
        scrambled, b_uri, ["l_orderkey"], disable_dictionary=True
    )
    (
        scrambled.write.mode("overwrite")
        .option("parquet.enable.dictionary", "false")
        .parquet(n_uri)
    )

    keys = {r.l_orderkey for r in li.select("l_orderkey").distinct().collect()}
    gap = next(v for v in range(min(keys) + 1, max(keys)) if v not in keys)

    def rows_scanned(uri):
        df = spark.read.parquet(uri).filter(F.col("l_orderkey") == gap)
        assert df.count() == 0  # the key genuinely isn't there
        df.collect()
        leaf = df._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
        return leaf.metrics().apply("numOutputRows").value()

    assert rows_scanned(b_uri) == 0  # every row group bloom-skipped
    assert rows_scanned(n_uri) == li.count()  # nothing else could skip

    # and a present key still reads its rows (no false negatives)
    some = next(iter(keys))
    hit = spark.read.parquet(b_uri).filter(F.col("l_orderkey") == some)
    assert hit.count() == li.filter(F.col("l_orderkey") == some).count()


def test_compact_restores_clustering(spark, tmp_path):
    """Streaming appends decay a z-ordered layout; compact_dataset with
    cluster_by restores tight row-group spans while bin-packing —
    the maintenance composition a clustered 100 TB dataset lives on."""
    from pg_parquet_spark.sources.layout import compact_dataset, write_zordered

    li = table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    # fragmented, UNclustered landing (16 hash-scattered files)
    frag = str(tmp_path / "landing")
    li.repartition(16).write.parquet(frag)
    spans_before = _row_group_spans(frag, ["l_partkey", "l_suppkey"])

    total = sum(
        sz for _u, sz in __import__(
            "pg_parquet_spark.sources.fs", fromlist=["fs"]
        ).tree_files(frag, ".parquet")
    )
    # target 4 output files so the span measurement sees 4 row groups
    compact_dataset(
        spark,
        frag,
        target_file_bytes=max(1, total // 4),
        cluster_by=["l_partkey", "l_suppkey"],
    )
    spans_after = _row_group_spans(frag, ["l_partkey", "l_suppkey"])
    assert spark.read.parquet(frag).count() == li.count()
    # clustered rewrite tightens the per-row-group span on BOTH dims
    for c in ("l_partkey", "l_suppkey"):
        assert spans_after[c] < spans_before[c] * 0.8, (spans_before, spans_after)

    # and the zordered-write reference point: compaction's clustering
    # is the same layout write_zordered produces
    ref = str(tmp_path / "zref")
    write_zordered(li, ref, zorder_by=["l_partkey", "l_suppkey"], num_files=4)
    ref_spans = _row_group_spans(ref, ["l_partkey", "l_suppkey"])
    for c in ("l_partkey", "l_suppkey"):
        assert abs(spans_after[c] - ref_spans[c]) < 0.2


def test_compact_clustered_within_partitions(spark, tmp_path):
    """cluster_by + partition_by: hive dirs keep pruning, row groups
    inside each partition regain multi-dim stats."""
    from pg_parquet_spark.sources.layout import compact_dataset

    li = table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_returnflag"
    )
    part = str(tmp_path / "part")
    li.repartition(8).write.partitionBy("l_returnflag").parquet(part)
    n = li.count()
    compact_dataset(
        spark,
        part,
        target_file_bytes=1 << 30,
        partition_by=["l_returnflag"],
        cluster_by=["l_partkey", "l_suppkey"],
    )
    back = spark.read.parquet(part)
    assert back.count() == n
    import glob
    import os

    dirs = {os.path.basename(os.path.dirname(f)) for f in glob.glob(os.path.join(part, "l_returnflag=*", "*.parquet"))}
    assert len(dirs) >= 2  # hive layout preserved


def test_merge_upsert_rejects_null_partition_values(spark, tmp_path):
    """NULL partition values would escape the isin() scoping (SQL NULL
    semantics) and bypass the anti-join — rejected up front."""
    from pg_parquet_spark.sources.layout import merge_upsert

    docs = table(spark, SF, "documents").select("doc_id", "text", "lang")
    base = str(tmp_path / "nullbase")
    docs.write.partitionBy("lang").parquet(base)
    bad = spark.createDataFrame(
        [(1, "x", None)], "doc_id BIGINT, text STRING, lang STRING"
    )
    with pytest.raises(ValueError, match="NULL 'lang'"):
        merge_upsert(spark, base, bad, ["doc_id"], partition_col="lang")


def test_zorder_skips_rows_at_read_time(spark, tmp_path):
    """Runtime complement to the footer-span assertions: on the
    z-ordered layout a conjunctive 2-D range filter SCANS a fraction of
    the rows (row groups outside the predicate's box are skipped by
    min/max stats), while the unsorted layout scans everything —
    measured from Spark's own scan metrics like the bloom proof."""
    from pg_parquet_spark.sources.layout import write_zordered

    li = table(spark, "/root/testdata/sf0.01", "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    n = li.count()
    zdir = str(tmp_path / "z")
    udir = str(tmp_path / "u")
    write_zordered(li, zdir, zorder_by=["l_partkey", "l_suppkey"], num_files=8)
    li.orderBy(F.hash("l_orderkey")).coalesce(8).write.parquet(udir)

    pred = (
        (F.col("l_partkey") >= 100)
        & (F.col("l_partkey") <= 300)
        & (F.col("l_suppkey") >= 10)
        & (F.col("l_suppkey") <= 40)
    )

    def rows_scanned(uri):
        df = spark.read.parquet(uri).filter(pred)
        df.collect()
        leaf = df._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
        return leaf.metrics().apply("numOutputRows").value()

    z_rows = rows_scanned(zdir)
    u_rows = rows_scanned(udir)
    # identical answers either way
    assert (
        spark.read.parquet(zdir).filter(pred).count()
        == spark.read.parquet(udir).filter(pred).count()
    )
    # the clustered layout skips most of the file; the scrambled one
    # reads essentially everything
    assert z_rows < n * 0.45, (z_rows, n)
    assert u_rows > n * 0.9, (u_rows, n)
    assert z_rows < u_rows / 2


# --- versioned (manifest-pointer) publish: r8, VERDICT r7 #3/#4 -----------


def _mk_base(spark, root, partitioned=True):
    df = spark.range(40).selectExpr(
        "id AS k",
        "id * 10 AS val",
        "CASE WHEN id < 20 THEN 'a' ELSE 'b' END AS p",
    )
    if partitioned:
        df.write.partitionBy("p").parquet(root)
    else:
        df.write.parquet(root)
    return df


def test_versioned_merge_carries_untouched_partitions_by_reference(
    spark, tmp_path
):
    """First versioned merge migrates in place (untouched partitions stay
    as version-0 references — nothing rewritten); later merges move only
    touched partitions to new snapshot dirs; read_parquet resolves the
    pointer."""
    from pg_parquet_spark.sources import read_parquet
    from pg_parquet_spark.sources.layout import merge_upsert, read_manifest

    root = str(tmp_path / "vds")
    _mk_base(spark, root)

    upd = spark.createDataFrame(
        [(3, 999, "a"), (100, 5, "a")], "k long, val long, p string"
    )
    merge_upsert(spark, root, upd, ["k"], partition_col="p", versioned=True)
    man = read_manifest(root)
    assert man["partitions"]["a"].startswith("_v1/")
    assert man["partitions"]["b"] == "p=b"  # migrated by reference

    upd2 = spark.createDataFrame([(25, -1, "b")], "k long, val long, p string")
    merge_upsert(spark, root, upd2, ["k"], partition_col="p")  # auto-versioned
    man2 = read_manifest(root)
    assert man2["partitions"]["a"].startswith("_v1/")
    assert man2["partitions"]["b"].startswith("_v2/")

    back = read_parquet(spark, root)
    assert back.count() == 41
    assert back.filter("k = 3").select("val").collect()[0][0] == 999
    assert back.filter("k = 25").select("val").collect()[0][0] == -1
    # partition column type survives the manifest round-trip
    assert dict(back.dtypes)["p"] == "string"


def test_versioned_read_prunes_partitions(spark, tmp_path):
    """A filter on the partition column constant-folds every non-matching
    branch of the manifest union away — one file scan survives."""
    from pg_parquet_spark.sources import read_parquet
    from pg_parquet_spark.sources.layout import merge_upsert

    root = str(tmp_path / "vprune")
    _mk_base(spark, root)
    upd = spark.createDataFrame([(3, 1, "a")], "k long, val long, p string")
    merge_upsert(spark, root, upd, ["k"], partition_col="p", versioned=True)

    pruned = read_parquet(spark, root).filter(F.col("p") == "b")
    plan = _plan(pruned)
    assert plan.count("Scan parquet") == 1, plan
    assert pruned.count() == 20


def test_versioned_publish_is_crash_atomic(spark, tmp_path, monkeypatch):
    """Kill the merge at the worst moment — snapshot fully written, pointer
    not yet swapped: a reader resolves the OLD snapshot completely (never
    a mix); re-running the merge converges; after the swap, the NEW one."""
    from pg_parquet_spark.sources import layout, read_parquet

    root = str(tmp_path / "vcrash")
    _mk_base(spark, root)
    upd0 = spark.createDataFrame([(3, 999, "a")], "k long, val long, p string")
    layout.merge_upsert(spark, root, upd0, ["k"], partition_col="p", versioned=True)
    before = {(r.k, r.val) for r in read_parquet(spark, root).collect()}

    real_publish = layout._publish_manifest

    def crash(*a, **kw):
        raise RuntimeError("simulated crash before pointer swap")

    monkeypatch.setattr(layout, "_publish_manifest", crash)
    upd = spark.createDataFrame(
        [(5, -5, "a"), (25, -25, "b")], "k long, val long, p string"
    )
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="simulated crash"):
        layout.merge_upsert(spark, root, upd, ["k"], partition_col="p")
    # reader sees the old snapshot, completely
    after_crash = {(r.k, r.val) for r in read_parquet(spark, root).collect()}
    assert after_crash == before

    # re-run converges: same inputs, now with the pointer swap
    monkeypatch.setattr(layout, "_publish_manifest", real_publish)
    layout.merge_upsert(spark, root, upd, ["k"], partition_col="p")
    final = read_parquet(spark, root)
    assert final.filter("k = 5").select("val").collect()[0][0] == -5
    assert final.filter("k = 25").select("val").collect()[0][0] == -25
    assert final.count() == 40  # updates only — no inserts in upd


def test_versioned_vacuum_reclaims_unreferenced_snapshots(spark, tmp_path):
    """The next maintenance op garbage-collects snapshot dirs the current
    pointer no longer references (grace period for in-flight readers)."""
    from pg_parquet_spark.sources import fs as pgfs
    from pg_parquet_spark.sources import layout, read_parquet

    root = str(tmp_path / "vgc")
    _mk_base(spark, root)
    for i in range(3):
        upd = spark.createDataFrame(
            [(3, i, "a")], "k long, val long, p string"
        )
        layout.merge_upsert(
            spark, root, upd, ["k"], partition_col="p", versioned=True
        )
    layout.vacuum_dataset(root, keep_history=1)
    names = {
        c.rstrip("/").rsplit("/", 1)[1] for c, d in pgfs.list_dir(root) if d
    }
    man = layout.read_manifest(root)
    referenced_tops = {v.split("/")[0] for v in man["partitions"].values()}
    assert names == referenced_tops  # nothing unreferenced survives
    assert read_parquet(spark, root).filter("k = 3").collect()[0].val == 2


def test_versioned_merge_and_compact_on_object_store(spark, mem_store):
    """Manifest publish end-to-end over mem:// — pointer read/write and
    snapshot layout all go through the scheme dispatch."""
    from pg_parquet_spark.sources import fs as pgfs
    from pg_parquet_spark.sources import read_parquet
    from pg_parquet_spark.sources.layout import (
        compact_dataset,
        merge_upsert,
        read_manifest,
    )

    base = mem_store + "/vdocs"
    docs = table(spark, SF, "documents").select("doc_id", "text", "lang")
    docs.write.partitionBy("lang").parquet(pgfs.spark_uri(base))

    updates = (
        docs.filter(F.col("lang") == "en")
        .limit(3)
        .withColumn("text", F.lit("updated on store"))
    )
    merge_upsert(
        spark, base, updates, ["doc_id"], partition_col="lang", versioned=True
    )
    assert read_manifest(base)["version"] == 1
    back = read_parquet(spark, base)
    assert back.count() == docs.count()
    assert back.filter(F.col("text") == "updated on store").count() == 3

    n = compact_dataset(spark, base, partition_by=["lang"])
    assert read_manifest(base)["version"] == 2
    assert read_parquet(spark, base).count() == docs.count()
    assert n >= 1


def test_inplace_partitioned_publish_never_loses_base_rows(spark, tmp_path):
    """ADVICE r7 (medium): the legacy in-place publish now parks the live
    partition aside before moving the staged one in, and entry recovery
    rolls a half-done swap forward — a crash can no longer truncate a
    partition to updates-only."""
    from pg_parquet_spark.sources import fs as pgfs
    from pg_parquet_spark.sources import layout

    root = str(tmp_path / "inplace")
    _mk_base(spark, root)

    # Simulate the worst crash state of the OLD protocol's window, as the
    # NEW protocol produces it: partition a parked aside, nothing moved in
    # yet (crash between move-aside and move-in).
    pgfs.move_dir(root + "/p=a", root + "__old/p=a")
    assert not pgfs.exists(root + "/p=a")

    # Entry recovery restores the parked partition before merging.
    upd = spark.createDataFrame([(3, 999, "a")], "k long, val long, p string")
    layout.merge_upsert(spark, root, upd, ["k"], partition_col="p")
    back = spark.read.parquet(root)
    assert back.count() == 40  # every base row survived
    assert back.filter("k = 3").select("val").collect()[0][0] == 999
    assert not pgfs.exists(root + "__old")

    # And the crash-after-move-in state: in the marker protocol that
    # point carries BOTH per-partition markers (aside complete, staged
    # move-in complete, only the cleanup crashed) — recovery rolls
    # forward, dropping the stale aside and keeping the new data.
    spark.range(1).selectExpr(
        "CAST(99 AS LONG) AS k", "CAST(1 AS LONG) AS val"
    ).write.mode("overwrite").parquet(root + "__old/p=b")
    pgfs.write_bytes_atomic(root + "__old/p=b.aside_done", b"1")
    pgfs.write_bytes_atomic(root + "__old/p=b.committed", b"1")
    layout._recover_inplace(root)
    assert not pgfs.exists(root + "__old")
    assert spark.read.parquet(root).count() == 40

    # Whereas the SAME aside content with NO markers means the aside
    # move itself crashed partway — its files are the only copy and
    # recovery merges them back instead of deleting them.
    spark.range(1).selectExpr(
        "CAST(777 AS LONG) AS k", "CAST(7 AS LONG) AS val"
    ).write.parquet(root + "__old/p=a")
    layout._recover_inplace(root)
    assert not pgfs.exists(root + "__old")
    assert spark.read.parquet(root).filter("k = 777").count() == 1


def test_versioned_time_travel_and_retention(spark, tmp_path):
    """r8: every publish retains its manifest in the history; a retained
    version reads back exactly as published (snapshots are immutable),
    and vacuum's keep_history window governs both time travel and the
    in-flight-reader grace period."""
    import pytest as _pytest

    from pg_parquet_spark.sources import layout

    root = str(tmp_path / "vtt")
    _mk_base(spark, root)
    for i in range(3):
        upd = spark.createDataFrame(
            [(3, 100 + i, "a")], "k long, val long, p string"
        )
        layout.merge_upsert(
            spark, root, upd, ["k"], partition_col="p", versioned=True
        )
    cur = layout.read_manifest(root)["version"]
    # entry vacuums only trim what aged out BEFORE each op, so all three
    # manifests still exist; an explicit keep_history=2 trims to the
    # newest two and time travel one version back reads the
    # PRE-latest-merge value
    layout.vacuum_dataset(root, keep_history=2)
    prev = layout.read_versioned(spark, root, version=cur - 1)
    assert prev.filter("k = 3").select("val").collect()[0][0] == 101
    assert (
        layout.read_versioned(spark, root).filter("k = 3").collect()[0].val
        == 102
    )
    # beyond the retention window → loud error listing what's available
    with _pytest.raises(ValueError, match="not retained"):
        layout.read_versioned(spark, root, version=cur - 2)
    # explicit vacuum with keep_history=1 collapses the window
    layout.vacuum_dataset(root, keep_history=1)
    with _pytest.raises(ValueError, match="not retained"):
        layout.read_versioned(spark, root, version=cur - 1)
    assert (
        layout.read_versioned(spark, root).filter("k = 3").collect()[0].val
        == 102
    )


def test_versioned_publish_detects_concurrent_writer(spark, tmp_path):
    """r8 optimistic-concurrency check: a second writer publishing
    between this merge's base read and its pointer flip is detected and
    the merge raises instead of silently overwriting (lost update)."""
    import pytest as _pytest

    from pg_parquet_spark.sources import layout

    root = str(tmp_path / "vocc")
    _mk_base(spark, root)
    upd0 = spark.createDataFrame([(3, 1, "a")], "k long, val long, p string")
    layout.merge_upsert(spark, root, upd0, ["k"], partition_col="p", versioned=True)

    real_check = layout._check_not_concurrently_modified
    raced = {"done": False}

    def race_then_check(root_uri, expected):
        if not raced["done"]:
            raced["done"] = True
            # a competing writer lands a publish first
            other = spark.createDataFrame(
                [(4, -4, "a")], "k long, val long, p string"
            )
            layout.merge_upsert(
                spark, root, other, ["k"], partition_col="p"
            )
        return real_check(root_uri, expected)

    import pytest as _p

    try:
        layout._check_not_concurrently_modified = race_then_check
        upd = spark.createDataFrame([(5, -5, "a")], "k long, val long, p string")
        with _pytest.raises(RuntimeError, match="concurrent modification"):
            layout.merge_upsert(spark, root, upd, ["k"], partition_col="p")
    finally:
        layout._check_not_concurrently_modified = real_check
    # the competing writer's publish is intact, ours never landed:
    # k=5 still carries its base value, not our -5
    back = layout.read_versioned(spark, root)
    assert back.filter("k = 4").collect()[0].val == -4
    assert back.filter("k = 5").collect()[0].val == 50


# --- versioned streaming sink (r8): manifest-published micro-batches -------


def test_versioned_sink_exactly_once_visibility(spark, tmp_path, monkeypatch):
    """Each micro-batch becomes visible only via the atomic pointer
    flip: a crash between batch-dir write and publish leaves readers
    exactly the prior batches; a checkpoint replay of a published id is
    a manifest no-op (exactly-once visibility, no file sweep)."""
    import pytest as _pytest

    from pg_parquet_spark.sources import layout, read_parquet
    from pg_parquet_spark.streaming.stream import versioned_batch_writer

    path = str(tmp_path / "vsink")
    events = table(spark, SF, "events").select("event_id", "event_type", "value")
    write = versioned_batch_writer(path, ["event_type"])

    b0 = events.filter(F.col("event_id") % 2 == 0)
    b1 = events.filter(F.col("event_id") % 2 == 1)
    write(b0, 0)
    n0 = read_parquet(spark, path).count()
    assert n0 == b0.count()

    # crash AFTER the batch dir lands but BEFORE the pointer flip:
    # readers still see exactly batch 0
    real_publish = layout._publish_manifest
    monkeypatch.setattr(
        layout,
        "_publish_manifest",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("crash")),
    )
    with _pytest.raises(RuntimeError, match="crash"):
        write(b1, 1)
    assert read_parquet(spark, path).count() == n0
    monkeypatch.setattr(layout, "_publish_manifest", real_publish)

    # the replayed batch publishes; a SECOND replay of the same id is a
    # manifest no-op — version does not advance, rows do not change
    write(b1, 1)
    total = read_parquet(spark, path).count()
    assert total == events.count()
    v = layout.read_manifest(path)["version"]
    write(b1, 1)
    assert layout.read_manifest(path)["version"] == v
    assert read_parquet(spark, path).count() == total

    # partition columns survive hive discovery below the batch dirs
    assert set(dict(read_parquet(spark, path).dtypes)) == {
        "event_id", "event_type", "value",
    }


def test_versioned_sink_compacts_to_snapshot_form(spark, tmp_path):
    """compact_dataset collapses a batches-form sink into a
    per-partition snapshot (the manifest flips form) with every row
    preserved; vacuum then reclaims the orphaned batch dirs; a
    partitioned MERGE before compaction is refused with guidance."""
    import pytest as _pytest

    from pg_parquet_spark.sources import fs as pgfs
    from pg_parquet_spark.sources import layout, read_parquet
    from pg_parquet_spark.streaming.stream import versioned_batch_writer

    path = str(tmp_path / "vsink2")
    events = table(spark, SF, "events").select("event_id", "event_type", "value")
    write = versioned_batch_writer(path, ["event_type"])
    for i in range(3):
        write(events.filter(F.col("event_id") % 3 == i), i)
    assert read_parquet(spark, path).count() == events.count()

    upd = events.limit(1)
    with _pytest.raises(ValueError, match="compact_dataset first"):
        layout.merge_upsert(
            spark, path, upd, ["event_id"], partition_col="event_type"
        )

    layout.compact_dataset(spark, path, partition_by=["event_type"])
    man = layout.read_manifest(path)
    assert man.get("format") != "batches" and man["partitions"]
    assert read_parquet(spark, path).count() == events.count()
    # aged-out batch dirs reclaimed once past the retention window
    layout.vacuum_dataset(path, keep_history=1)
    names = {
        c.rstrip("/").rsplit("/", 1)[1]
        for c, is_dir in pgfs.list_dir(path)
        if is_dir
    }
    assert not any(n.startswith("_b") for n in names), names
    assert read_parquet(spark, path).count() == events.count()
    # and the snapshot now accepts partitioned MERGE
    upd2 = events.filter(F.col("event_id") == 2).withColumn(
        "value", F.lit(123.0)
    )
    layout.merge_upsert(
        spark, path, upd2, ["event_id"], partition_col="event_type"
    )
    assert read_parquet(spark, path).filter("event_id = 2").collect()[0].value == 123.0


def test_versioned_sink_streaming_drain(spark, tmp_path):
    """End-to-end: a real AvailableNow drain through the versioned sink
    equals the batch dataset, through the pointer-resolving reader."""
    from pg_parquet_spark.sources import read_parquet
    from pg_parquet_spark.streaming.stream import (
        drain_to_versioned_parquet,
        read_events_stream,
    )

    path = str(tmp_path / "vsink3")
    events = read_events_stream(spark, SF).select("event_id", "event_type", "value")
    drain_to_versioned_parquet(events, path, ["event_type"])
    back = read_parquet(spark, path)
    assert back.count() == table(spark, SF, "events").count()
    assert back.groupBy().sum("event_id").collect() == table(
        spark, SF, "events"
    ).groupBy().sum("event_id").collect()


def test_versioned_sink_skips_empty_batches_and_rolls_history(spark, tmp_path):
    """An empty micro-batch publishes nothing (a dir with no parquet
    files would break the manifest union); the per-batch manifest
    history rolls at 2 so a long-running sink doesn't accumulate one
    tiny file per batch."""
    from pg_parquet_spark.sources import fs as pgfs
    from pg_parquet_spark.sources import layout, read_parquet
    from pg_parquet_spark.streaming.stream import versioned_batch_writer

    path = str(tmp_path / "vsink4")
    events = table(spark, SF, "events").select("event_id", "event_type", "value")
    write = versioned_batch_writer(path, ["event_type"])

    write(events.filter("event_id % 2 = 0"), 0)
    write(events.filter("event_id < 0"), 1)  # empty
    man = layout.read_manifest(path)
    assert "1" not in man["batches"] and man["version"] == 1
    assert read_parquet(spark, path).count() == events.filter("event_id % 2 = 0").count()

    for i in range(2, 6):
        write(events.filter(F.col("event_id") % 7 == i), i)
    manifests = sorted(
        n
        for c, d in pgfs.list_dir(path)
        for n in [c.rstrip("/").rsplit("/", 1)[1]]
        if not d and n.startswith("_manifest-")
    )
    assert len(manifests) == 2, manifests  # rolling window
    # every published batch dir still referenced and readable
    assert read_parquet(spark, path).count() == (
        events.filter("event_id % 2 = 0").count()
        + sum(events.filter(F.col("event_id") % 7 == i).count() for i in range(2, 6))
    )


# --- review r8 regression tests --------------------------------------------


def test_recovery_is_layout_agnostic(spark, tmp_path):
    """A crashed PARTITIONED merge (partition parked aside, base root
    still present) must be recovered by ANY later entry — a compaction
    or flat merge included. The old recovery trusted the caller's
    partition_col and a flat-path entry deleted the parked partition's
    only copy (code review r8)."""
    from pg_parquet_spark.sources import fs as pgfs
    from pg_parquet_spark.sources import layout

    root = str(tmp_path / "agn")
    _mk_base(spark, root)
    # crashed partitioned-merge state: p=a parked, base root present
    pgfs.move_dir(root + "/p=a", root + "__old/p=a")

    # a COMPACTION entry (no partition_col knowledge) must restore it
    layout.compact_dataset(spark, root, target_file_bytes=1 << 30)
    assert not pgfs.exists(root + "__old")
    back = spark.read.parquet(root)
    assert back.count() == 40  # every base row survived
    assert back.filter("p = 'a'").count() == 20

    # and a versioned MIGRATION on the same crash state must not
    # publish a manifest missing the parked partition
    root2 = str(tmp_path / "agn2")
    _mk_base(spark, root2)
    pgfs.move_dir(root2 + "/p=b", root2 + "__old/p=b")
    upd = spark.createDataFrame([(3, 9, "a")], "k long, val long, p string")
    layout.merge_upsert(spark, root2, upd, ["k"], partition_col="p", versioned=True)
    man = layout.read_manifest(root2)
    assert "b" in man["partitions"]
    from pg_parquet_spark.sources import read_parquet

    assert read_parquet(spark, root2).count() == 40


def test_versioned_sink_refuses_preexisting_data(spark, tmp_path):
    """Pointing the versioned sink at a root already holding plain
    parquet would shadow (then vacuum away) those rows — refused."""
    import pytest as _pytest

    from pg_parquet_spark.streaming.stream import versioned_batch_writer

    root = str(tmp_path / "occupied")
    events = table(spark, SF, "events").select("event_id", "event_type")
    events.write.parquet(root)
    write = versioned_batch_writer(root, ["event_type"])
    with _pytest.raises(ValueError, match="already holds unversioned data"):
        write(events.limit(5), 0)
    # the pre-existing rows are untouched
    assert spark.read.parquet(root).count() == events.count()


def test_partitioned_merge_refuses_mismatched_snapshot(spark, tmp_path):
    """A partitioned MERGE against an unpartitioned snapshot, or against
    a snapshot partitioned on a DIFFERENT column, is refused with
    guidance (the flat form used to crash with dict(None) after the
    snapshot write; a column mismatch would corrupt the carry-forward
    refs)."""
    import pytest as _pytest

    from pg_parquet_spark.sources import layout

    root = str(tmp_path / "flatsnap")
    df = spark.range(10).selectExpr("id AS k", "id*2 AS val", "'x' AS p")
    df.write.parquet(root)
    ins = spark.createDataFrame([(99, 0, "x")], "k long, val long, p string")
    layout.merge_upsert(spark, root, ins, ["k"], versioned=True)  # flat snapshot
    with _pytest.raises(ValueError, match="unpartitioned snapshot"):
        layout.merge_upsert(
            spark, root, ins, ["k"], partition_col="p"
        )

    root2 = str(tmp_path / "colsnap")
    _mk_base(spark, root2)
    upd = spark.createDataFrame([(3, 9, "a")], "k long, val long, p string")
    layout.merge_upsert(spark, root2, upd, ["k"], partition_col="p", versioned=True)
    upd2 = upd.withColumnRenamed("p", "p")  # same frame, wrong claimed column
    with _pytest.raises(ValueError, match="partitioned on"):
        layout.merge_upsert(spark, root2, upd, ["k"], partition_col="val")


def test_versioned_protocol_randomized_crash_invariant(spark, tmp_path):
    """Seeded randomized protocol soak: a sequence of merges/compactions
    with crashes injected before the pointer flip must ALWAYS leave a
    reader on the last PUBLISHED logical state (never a mix, never a
    loss), and re-running the crashed op must converge to its intended
    state."""
    import random

    from pg_parquet_spark.sources import layout, read_parquet

    rng = random.Random(20260814)
    root = str(tmp_path / "proto")
    _mk_base(spark, root)

    # expected logical state: k -> (val, p)
    state = {k: (k * 10, "a" if k < 20 else "b") for k in range(40)}
    published = dict(state)
    layout.merge_upsert(
        spark,
        root,
        spark.createDataFrame([(0, 0, "a")], "k long, val long, p string"),
        ["k"],
        partition_col="p",
        versioned=True,
    )
    state[0] = (0, "a")
    published = dict(state)

    real_publish = layout._publish_manifest

    def read_state():
        return {
            r.k: (r.val, r.p) for r in read_parquet(spark, root).collect()
        }

    for step in range(8):
        crash = rng.random() < 0.5
        op = rng.choice(["merge", "compact"])
        if op == "merge":
            n_upd = rng.randint(1, 4)
            upd = []
            intended = dict(state)
            for _ in range(n_upd):
                k = rng.randrange(50)
                p = "a" if k < 20 else "b"
                v = rng.randrange(1000)
                upd.append((k, v, p))
                intended[k] = (v, p)
            # dedupe update keys (MERGE requires unique keys)
            seen = {}
            for k, v, p in upd:
                seen[k] = (k, v, p)
            updf = spark.createDataFrame(
                list(seen.values()), "k long, val long, p string"
            )

            def run():
                layout.merge_upsert(
                    spark, root, updf, ["k"], partition_col="p"
                )
        else:
            intended = dict(state)

            def run():
                layout.compact_dataset(
                    spark, root, partition_by=["p"], target_file_bytes=1 << 30
                )

        if crash:
            layout._publish_manifest = lambda *a, **kw: (_ for _ in ()).throw(
                RuntimeError("injected crash")
            )
            try:
                import pytest as _pytest

                with _pytest.raises(RuntimeError, match="injected crash"):
                    run()
            finally:
                layout._publish_manifest = real_publish
            # invariant: reader still on the last published state
            assert read_state() == published, f"step {step}: mixed state after crash"
            run()  # converges on retry
        else:
            run()
        state = intended
        published = dict(state)
        assert read_state() == published, f"step {step}: wrong state after publish"


def test_compact_partitions_rewrites_only_drifted(spark, tmp_path):
    """r8 incremental compaction: only the fragmented partition is
    rewritten; cold partitions carry by reference (their files are
    byte-untouched); one pointer flip; a second pass is a no-op."""
    import os

    from pg_parquet_spark.sources import fs as pgfs
    from pg_parquet_spark.sources import layout, read_parquet

    root = str(tmp_path / "inc")
    df = spark.range(40).selectExpr(
        "id AS k", "id*10 AS val", "CASE WHEN id<20 THEN 'a' ELSE 'b' END AS p"
    )
    # hot partition a: 16 fragments; cold partition b: 1 file
    df.filter("p = 'a'").drop("p").repartition(16).write.parquet(root + "/p=a")
    df.filter("p = 'b'").drop("p").coalesce(1).write.parquet(root + "/p=b")
    layout._publish_manifest(
        root,
        {
            "version": 1,
            "partition_col": "p",
            "partition_dtype": "string",
            "partitions": {"a": "p=a", "b": "p=b"},
        },
    )
    before = read_parquet(spark, root).groupBy("p").count().collect()
    b_files = {
        u: os.stat(u).st_mtime_ns
        for u, _sz in pgfs.tree_files(root + "/p=b", ".parquet")
    }

    compacted = layout.compact_partitions(spark, root, max_files=8)
    assert compacted == ["a"]
    man = layout.read_manifest(root)
    assert man["partitions"]["a"].startswith("_v2/")
    assert man["partitions"]["b"] == "p=b"  # carried by reference
    # cold partition files byte-untouched
    assert {
        u: os.stat(u).st_mtime_ns
        for u, _sz in pgfs.tree_files(root + "/p=b", ".parquet")
    } == b_files
    # hot partition now 1 file, data identical
    assert len(pgfs.tree_files(root + "/" + man["partitions"]["a"], ".parquet")) == 1
    assert read_parquet(spark, root).groupBy("p").count().collect() == before

    # nothing drifted anymore → no-op, no publish
    assert layout.compact_partitions(spark, root, max_files=8) == []
    assert layout.read_manifest(root)["version"] == man["version"]

    # non-partitioned snapshots are refused with guidance
    import pytest as _pytest

    flat = str(tmp_path / "flat")
    spark.range(5).write.parquet(flat)
    ins = spark.createDataFrame([(99,)], "id long")
    layout.merge_upsert(spark, flat, ins, ["id"], versioned=True)
    with _pytest.raises(ValueError, match="not a partitioned versioned"):
        layout.compact_partitions(spark, flat)


def test_read_parquet_time_travel_and_describe(spark, tmp_path):
    """r8: read_parquet(version=) time-travels through the public API;
    describe_versioned summarizes the pointer state; version= on plain
    parquet errors loudly."""
    import pytest as _pytest

    from pg_parquet_spark.sources import layout, read_parquet

    root = str(tmp_path / "ttapi")
    _mk_base(spark, root)
    for i in range(2):
        upd = spark.createDataFrame(
            [(3, 1000 + i, "a")], "k long, val long, p string"
        )
        layout.merge_upsert(
            spark, root, upd, ["k"], partition_col="p", versioned=True
        )
    cur = layout.read_manifest(root)["version"]
    assert read_parquet(spark, root).filter("k=3").collect()[0].val == 1001
    assert (
        read_parquet(spark, root, version=cur - 1).filter("k=3").collect()[0].val
        == 1000
    )
    # projection/filter clauses compose with time travel
    assert (
        read_parquet(
            spark, root, version=cur - 1, columns=["k", "val"], where="k = 3"
        ).collect()[0].val
        == 1000
    )

    d = layout.describe_versioned(root)
    assert d["version"] == cur and d["form"] == "partitioned"
    assert set(d["partitions"]) == {"a", "b"}
    assert cur in d["retained_versions"] and cur - 1 in d["retained_versions"]
    assert all(v["files"] >= 1 for v in d["refs"].values())

    plain = str(tmp_path / "plain")
    spark.range(5).write.parquet(plain)
    with _pytest.raises(ValueError, match="no _CURRENT pointer"):
        read_parquet(spark, plain, version=1)


def test_versioned_sink_continues_after_compaction(spark, tmp_path):
    """r8 review: compaction flips the sink to snapshot form and
    ingestion CONTINUES in a new batches epoch on top of it; the
    replay horizon (max_batch_id) survives the form flip, so a
    checkpoint replay of an already-collapsed batch is a no-op."""
    from pg_parquet_spark.sources import layout, read_parquet
    from pg_parquet_spark.streaming.stream import versioned_batch_writer

    path = str(tmp_path / "vsink5")
    events = table(spark, SF, "events").select("event_id", "event_type", "value")
    write = versioned_batch_writer(path, ["event_type"])
    write(events.filter("event_id % 3 = 0"), 0)
    write(events.filter("event_id % 3 = 1"), 1)
    n_before = read_parquet(spark, path).count()

    layout.compact_dataset(spark, path, partition_by=["event_type"])
    assert layout.read_manifest(path).get("max_batch_id") == 1
    assert read_parquet(spark, path).count() == n_before

    # ingestion continues: a new epoch whose base is the snapshot
    write(events.filter("event_id % 3 = 2"), 2)
    man = layout.read_manifest(path)
    assert man["format"] == "batches" and man["base_manifest"] is not None
    assert read_parquet(spark, path).count() == events.count()

    # replays across the epoch boundary are no-ops
    v = layout.read_manifest(path)["version"]
    write(events.filter("event_id % 3 = 0"), 0)  # collapsed into the base
    write(events.filter("event_id % 3 = 2"), 2)  # in the current epoch
    assert layout.read_manifest(path)["version"] == v
    assert read_parquet(spark, path).count() == events.count()

    # and a SECOND compaction collapses the epoch again
    layout.compact_dataset(spark, path, partition_by=["event_type"])
    man2 = layout.read_manifest(path)
    assert man2.get("format") != "batches"
    assert man2.get("max_batch_id") == 2
    assert read_parquet(spark, path).count() == events.count()


def test_compact_validates_before_snapshot_write(spark, tmp_path):
    """ADVICE r9: compact_dataset's versioned-partitioned validation runs
    BEFORE the snapshot write — multi-column partition_by and NULL
    partition values both refuse without orphaning a _v dir (the
    discard-minutes-of-work pattern merge_upsert already hoisted)."""
    import pytest as _pytest

    from pg_parquet_spark.sources import fs as pgfs
    from pg_parquet_spark.sources import layout

    root = str(tmp_path / "cvb")
    df = spark.range(20).selectExpr(
        "id AS k",
        "id * 2 AS val",
        "CASE WHEN id % 5 = 0 THEN NULL ELSE concat('g', id % 3) END AS p",
    )
    df.write.parquet(root)

    with _pytest.raises(ValueError, match="single partition"):
        layout.compact_dataset(
            spark, root, partition_by=["p", "val"], versioned=True
        )
    with _pytest.raises(ValueError, match="NULL 'p' values"):
        layout.compact_dataset(spark, root, partition_by=["p"], versioned=True)
    # neither refusal left a snapshot dir or a pointer behind
    names = {
        c.rstrip("/").rsplit("/", 1)[1] for c, _d in pgfs.list_dir(root)
    }
    assert not any(n.startswith("_v") for n in names), names
    assert layout.read_manifest(root) is None


def test_versioned_migration_refuses_non_hive_layout(spark, tmp_path):
    """ADVICE r9: partitioned versioned MIGRATION builds the version-0
    map from hive 'col=' dirs only — a dataset storing the partition
    column in-file (or loose root files) would silently lose every
    unaffected row at the next vacuum, so it must refuse with the
    compact_dataset remediation."""
    import pytest as _pytest

    from pg_parquet_spark.sources import layout, read_parquet

    root = str(tmp_path / "mig")
    df = _mk_base(spark, root, partitioned=False)  # p stored IN-FILE
    upd = spark.createDataFrame([(3, 999, "a")], "k long, val long, p string")
    with _pytest.raises(ValueError, match="not hive-partitioned"):
        layout.merge_upsert(
            spark, root, upd, ["k"], partition_col="p", versioned=True
        )
    # the documented remediation works end-to-end: compact first (which
    # rewrites INTO hive layout + manifest), then partitioned merges flow
    layout.compact_dataset(spark, root, partition_by=["p"], versioned=True)
    layout.merge_upsert(spark, root, upd, ["k"], partition_col="p", versioned=True)
    got = read_parquet(spark, root)
    assert got.filter("k = 3").collect()[0].val == 999
    assert got.count() == df.count()


def test_sink_writer_epoch_guard(spark, tmp_path):
    """ADVICE r9: a batch arriving under a different writer epoch
    (checkpoint) raises instead of being silently discarded as a
    replay; a None writer_id (direct writer use) keeps the recorded
    epoch and the old semantics."""
    import pytest as _pytest

    from pg_parquet_spark.sources import layout, read_parquet
    from pg_parquet_spark.streaming.stream import versioned_batch_writer

    path = str(tmp_path / "epoch")
    events = table(spark, SF, "events").select("event_id", "event_type")
    b0 = events.filter(F.col("event_id") % 2 == 0)
    b1 = events.filter(F.col("event_id") % 2 == 1)

    versioned_batch_writer(path, writer_id="ck-a")(b0, 0)
    assert layout.read_manifest(path)["writer_id"] == "ck-a"

    # fresh checkpoint => ids restart at 0: must raise, not no-op
    with _pytest.raises(ValueError, match="epoch mismatch"):
        versioned_batch_writer(path, writer_id="ck-b")(b1, 0)
    # same epoch continues; guard-less writer (None) also continues and
    # PRESERVES the recorded epoch
    versioned_batch_writer(path, writer_id="ck-a")(b1, 1)
    versioned_batch_writer(path)(b0.limit(0), 2)  # empty => skipped
    assert layout.read_manifest(path)["writer_id"] == "ck-a"
    assert read_parquet(spark, path).count() == events.count()


def test_sink_repeated_default_checkpoint_drains_append(spark, tmp_path):
    """ADVICE r9: the default checkpoint derives from the sink path, so
    a SECOND drain to the same sink resumes the same id space — new
    source files land as new batches instead of being discarded as
    batch-0 replays (the silent-data-drop the uuid-tempdir default
    had)."""
    from pg_parquet_spark.sources import read_parquet
    from pg_parquet_spark.streaming.stream import drain_to_versioned_parquet

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    events = table(spark, SF, "events").select("event_id", "event_type", "value")
    a = events.filter(F.col("event_id") % 2 == 0)
    b = events.filter(F.col("event_id") % 2 == 1)

    a.coalesce(1).write.mode("append").parquet(src)
    sdf = spark.readStream.schema(events.schema).parquet(src)
    drain_to_versioned_parquet(sdf, sink)
    assert read_parquet(spark, sink).count() == a.count()

    b.coalesce(1).write.mode("append").parquet(src)
    sdf2 = spark.readStream.schema(events.schema).parquet(src)
    drain_to_versioned_parquet(sdf2, sink)
    assert read_parquet(spark, sink).count() == events.count()


def test_keep_history_engine_setting(spark, tmp_path):
    """VERDICT r8 #6: keep_history is an engine setting — session-level
    default with per-op override; a keep_history=3 dataset retains 3
    time-travel versions across maintenance entry vacuums."""
    import pytest as _pytest

    from pg_parquet_spark import session as psession
    from pg_parquet_spark.sources import layout

    root = str(tmp_path / "kh")
    _mk_base(spark, root)
    psession.set_snapshot_keep_history(3)
    try:
        for i in range(4):
            upd = spark.createDataFrame(
                [(3, 100 + i, "a")], "k long, val long, p string"
            )
            layout.merge_upsert(
                spark, root, upd, ["k"], partition_col="p", versioned=True
            )
        layout.vacuum_dataset(root)  # resolves the session default (3)
        cur = layout.read_manifest(root)["version"]
        assert layout._retained_manifest_versions(root) == [
            cur - 2, cur - 1, cur,
        ]
        for back, want in ((0, 103), (1, 102), (2, 101)):
            got = layout.read_versioned(spark, root, version=cur - back)
            assert got.filter("k = 3").collect()[0].val == want
        with _pytest.raises(ValueError, match="not retained"):
            layout.read_versioned(spark, root, version=cur - 3)
        # per-op override narrows the window regardless of the session
        layout.vacuum_dataset(root, keep_history=1)
        assert layout._retained_manifest_versions(root) == [cur]
    finally:
        psession.set_snapshot_keep_history(2)
    with _pytest.raises(ValueError):
        psession.set_snapshot_keep_history(0)


def test_streaming_ingest_with_inline_dedup(spark, tmp_path):
    """r9 composition: stream → dedup_incremental → versioned corpus →
    fingerprint commit. Two tranches with cross- and within-tranche
    duplicate texts land exactly the distinct texts (first id wins);
    a replayed drain adds nothing; the index equals the corpus."""
    from pg_parquet_spark.sources import layout, read_parquet
    from pg_parquet_spark.streaming.stream import drain_with_incremental_dedup

    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")

    t1 = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha"), (4, "gamma")],
        "doc_id long, text string",
    )
    t2 = spark.createDataFrame(
        [(5, "beta"), (6, "delta"), (7, "delta"), (8, "epsilon")],
        "doc_id long, text string",
    )
    schema = "doc_id long, text string"

    t1.coalesce(1).write.mode("append").parquet(src)
    sdf = spark.readStream.schema(schema).parquet(src)
    drain_with_incremental_dedup(sdf, corpus, index, checkpoint=ckpt)
    got1 = {r.doc_id: r.text for r in read_parquet(spark, corpus).collect()}
    assert got1 == {1: "alpha", 2: "beta", 4: "gamma"}  # 3 is a within-batch dup

    t2.coalesce(1).write.mode("append").parquet(src)
    sdf2 = spark.readStream.schema(schema).parquet(src)
    drain_with_incremental_dedup(sdf2, corpus, index, checkpoint=ckpt)
    got2 = {r.doc_id: r.text for r in read_parquet(spark, corpus).collect()}
    # 5 (beta) known from tranche 1; 7 a within-batch dup of 6
    assert got2 == {1: "alpha", 2: "beta", 4: "gamma", 6: "delta", 8: "epsilon"}

    # the index mirrors the corpus exactly (fingerprint per distinct text)
    idx = layout.read_versioned(spark, index)
    assert idx.count() == 5
    assert set(r.owner_id for r in idx.collect()) == {1, 2, 4, 6, 8}

    # replay: same checkpoint, no new files => no-op end to end
    v_corpus = layout.read_manifest(corpus)["version"]
    v_index = layout.read_manifest(index)["version"]
    sdf3 = spark.readStream.schema(schema).parquet(src)
    drain_with_incremental_dedup(sdf3, corpus, index, checkpoint=ckpt)
    assert layout.read_manifest(corpus)["version"] == v_corpus
    assert layout.read_manifest(index)["version"] == v_index
    assert read_parquet(spark, corpus).count() == 5


def test_dedup_ingest_replay_converges_after_partial_commit(spark, tmp_path):
    """Crash between corpus publish and fingerprint commit: the replayed
    batch no-ops the sink (already in the manifest) and lands the
    missing fingerprints — the at-least-once direction converges."""
    from pg_parquet_spark.operators import dedup as dedup_ops
    from pg_parquet_spark.sources import layout, read_parquet
    from pg_parquet_spark.streaming.stream import versioned_dedup_ingest_writer

    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "idx")
    batch = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id long, text string"
    )
    # simulate the crash: publish the corpus batch, skip the commit
    from pg_parquet_spark.streaming.stream import versioned_batch_writer

    flagged = dedup_ops.dedup_incremental(spark, batch, index)
    versioned_batch_writer(corpus, writer_id="w1")(
        flagged.filter("keep").select("doc_id", "text"), 0
    )
    flagged.unpersist()
    assert layout.read_manifest(index) is None  # commit never happened

    # replay the same batch id through the full writer
    versioned_dedup_ingest_writer(corpus, index, writer_id="w1")(batch, 0)
    assert read_parquet(spark, corpus).count() == 2  # no duplicate rows
    assert layout.read_versioned(spark, index).count() == 2  # commit landed

    # second replay after both landed: fully known => nothing changes
    v_c = layout.read_manifest(corpus)["version"]
    v_i = layout.read_manifest(index)["version"]
    versioned_dedup_ingest_writer(corpus, index, writer_id="w1")(batch, 0)
    assert layout.read_manifest(corpus)["version"] == v_c
    assert layout.read_manifest(index)["version"] == v_i


def test_streaming_rollup_refresh_materialized_view(spark, tmp_path):
    """r9 composition: stream → versioned event corpus + continuously
    refreshed rollup. Two tranches drain; after each, the rollup equals
    a full recompute over the corpus; a replayed drain changes neither
    pointer."""
    from pg_parquet_spark.operators.timeseries import rollup_time_buckets
    from pg_parquet_spark.sources import layout, read_parquet
    from pg_parquet_spark.streaming.stream import drain_with_rollup_refresh

    src = str(tmp_path / "src")
    corpus = str(tmp_path / "events_corpus")
    rollup = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")

    events = table(spark, SF, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    t1 = events.filter("event_id % 2 = 0")
    t2 = events.filter("event_id % 2 = 1")

    def check_consistent():
        got = (
            read_parquet(spark, rollup)
            .orderBy("event_type", "bucket_epoch")
            .toPandas()
        )
        want = (
            rollup_time_buckets(read_parquet(spark, corpus), 3600)
            .orderBy("event_type", "bucket_epoch")
            .toPandas()
        )
        assert len(got) == len(want) > 0
        for col in want.columns:
            assert list(got[col]) == list(want[col]), col

    t1.coalesce(1).write.mode("append").parquet(src)
    sdf = spark.readStream.schema(events.schema).parquet(src)
    drain_with_rollup_refresh(sdf, corpus, rollup, width_sec=3600, checkpoint=ckpt)
    check_consistent()

    t2.coalesce(1).write.mode("append").parquet(src)
    sdf2 = spark.readStream.schema(events.schema).parquet(src)
    drain_with_rollup_refresh(sdf2, corpus, rollup, width_sec=3600, checkpoint=ckpt)
    check_consistent()
    assert read_parquet(spark, corpus).count() == events.count()

    vc = layout.read_manifest(corpus)["version"]
    vr = layout.read_manifest(rollup)["version"]
    sdf3 = spark.readStream.schema(events.schema).parquet(src)
    drain_with_rollup_refresh(sdf3, corpus, rollup, width_sec=3600, checkpoint=ckpt)
    assert layout.read_manifest(corpus)["version"] == vc
    assert layout.read_manifest(rollup)["version"] == vr


def test_streaming_compositions_survive_empty_source(spark, tmp_path):
    """r9 review: a drain over an EMPTY source fires one no-data batch —
    both composed sinks must no-op (the rollup refresh used to read a
    corpus that didn't exist yet) and a later real drain proceeds."""
    from pg_parquet_spark.sources import layout, read_parquet
    from pg_parquet_spark.streaming.stream import (
        drain_with_incremental_dedup,
        drain_with_rollup_refresh,
    )

    src = str(tmp_path / "src")
    schema = "event_id long, ts timestamp_ntz, event_type string, value double"
    spark.createDataFrame([], schema).write.parquet(src)  # zero-row source

    corpus = str(tmp_path / "corpus")
    rollup = str(tmp_path / "rollup")
    sdf = spark.readStream.schema(schema).parquet(src)
    drain_with_rollup_refresh(
        sdf, corpus, rollup, checkpoint=str(tmp_path / "ck1")
    )
    assert layout.read_manifest(corpus) is None  # nothing published

    dsrc = str(tmp_path / "dsrc")
    dschema = "doc_id long, text string"
    spark.createDataFrame([], dschema).write.parquet(dsrc)
    drain_with_incremental_dedup(
        spark.readStream.schema(dschema).parquet(dsrc),
        str(tmp_path / "dcorpus"),
        str(tmp_path / "didx"),
        checkpoint=str(tmp_path / "ck2"),
    )
    assert layout.read_manifest(str(tmp_path / "dcorpus")) is None

    # data arrives later: the same checkpoints pick it up end-to-end
    events = table(spark, SF, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    events.limit(200).coalesce(1).write.mode("append").parquet(src)
    sdf2 = spark.readStream.schema(schema).parquet(src)
    drain_with_rollup_refresh(
        sdf2, corpus, rollup, checkpoint=str(tmp_path / "ck1")
    )
    assert read_parquet(spark, corpus).count() == 200
    assert read_parquet(spark, rollup).count() > 0


def test_delete_where_unpartitioned_versioned(spark, tmp_path):
    """r11 DELETE: rows matching the predicate leave every subsequent
    read atomically; NULL predicates keep rows (SQL DELETE semantics);
    time travel still sees the pre-delete snapshot; a zero-match
    delete publishes nothing."""
    import pytest as _pytest

    from pg_parquet_spark.sources import read_parquet
    from pg_parquet_spark.sources.layout import (
        delete_where,
        publish_snapshot,
        read_manifest,
        read_versioned,
    )

    root = str(tmp_path / "flat")
    df = spark.range(30).selectExpr(
        "id AS k", "CASE WHEN id % 3 = 0 THEN NULL ELSE id * 2 END AS val"
    )
    publish_snapshot(spark, root, df)

    n = delete_where(spark, root, "val > 40")
    assert n == df.filter("val > 40").count() > 0
    back = read_parquet(spark, root)
    assert back.count() == 30 - n
    # NULL-val rows (predicate NULL) are all still there
    assert back.filter("val IS NULL").count() == 10

    v1 = read_versioned(spark, root, version=1)
    assert v1.count() == 30  # time travel: pre-delete snapshot intact

    v = read_manifest(root)["version"]
    assert delete_where(spark, root, "k < 0") == 0
    assert read_manifest(root)["version"] == v  # nothing published

    with _pytest.raises(ValueError, match="not a versioned"):
        flat2 = str(tmp_path / "plain")
        df.write.parquet(flat2)
        delete_where(spark, flat2, "val > 40")


def test_delete_where_partitioned_touches_only_matching(spark, tmp_path):
    """Partitioned DELETE is copy-on-write at partition granularity:
    untouched partitions carry by REFERENCE (manifest path unchanged),
    a fully-emptied partition leaves the manifest, and a crash before
    the pointer flip leaves readers on the old version."""
    import pytest as _pytest

    from pg_parquet_spark.sources import layout, read_parquet
    from pg_parquet_spark.sources.layout import (
        delete_where,
        merge_upsert,
        read_manifest,
    )

    root = str(tmp_path / "pds")
    _mk_base(spark, root)
    # migrate to versioned via a no-op-ish merge
    upd = spark.createDataFrame([(0, 0, "a")], "k long, val long, p string")
    merge_upsert(spark, root, upd, ["k"], partition_col="p", versioned=True)
    man0 = read_manifest(root)
    b_ref = man0["partitions"]["b"]

    # delete some of partition a; b untouched
    n = delete_where(spark, root, "p = 'a' AND k >= 10", partition_col="p")
    assert n == 10
    man1 = read_manifest(root)
    assert man1["partitions"]["b"] == b_ref  # carried by reference
    assert man1["partitions"]["a"] != man0["partitions"]["a"]
    back = read_parquet(spark, root)
    assert back.count() == 30
    assert back.filter("p = 'a'").count() == 10

    # empty partition a entirely: it must leave the manifest
    n2 = delete_where(spark, root, "p = 'a'", partition_col="p")
    assert n2 == 10
    man2 = read_manifest(root)
    assert "a" not in man2["partitions"]
    assert read_parquet(spark, root).select("p").distinct().collect() == [
        ("b",)
    ]

    # crash before the pointer flip: readers stay on the old version
    real_pub = layout._publish_manifest

    def crashing(root_, manifest, **kw):
        raise RuntimeError("simulated crash before pointer flip")

    import unittest.mock as _mock

    with _mock.patch.object(layout, "_publish_manifest", crashing):
        with _pytest.raises(RuntimeError, match="simulated crash"):
            delete_where(spark, root, "p = 'b' AND k < 25", partition_col="p")
    assert read_parquet(spark, root).count() == 20  # unchanged
    layout._publish_manifest = real_pub

    # and the delete then succeeds cleanly on retry
    n3 = delete_where(spark, root, "p = 'b' AND k < 25", partition_col="p")
    assert n3 == 5
    assert read_parquet(spark, root).count() == 15


def test_snapshot_diff_audits_merge_and_delete(spark, tmp_path):
    """r11: the publish audit — after a MERGE (update + insert) and a
    DELETE, snapshot_diff reports exactly the touched keys with the
    right change kind, across any retained version pair."""
    from pg_parquet_spark.sources.layout import (
        delete_where,
        merge_upsert,
        publish_snapshot,
        snapshot_diff,
    )

    root = str(tmp_path / "audit")
    df = spark.range(10).selectExpr("id AS k", "id * 10 AS val")
    publish_snapshot(spark, root, df)  # v1

    upd = spark.createDataFrame([(3, 999), (100, 5)], "k long, val long")
    merge_upsert(spark, root, upd, ["k"])  # v2: k=3 changed, k=100 added
    d = {r.k: r.change for r in snapshot_diff(spark, root, ["k"], 1).collect()}
    assert d == {3: "changed", 100: "added"}

    delete_where(spark, root, "k >= 8 AND k <= 9")  # v3: 8, 9 removed
    d2 = {r.k: r.change for r in snapshot_diff(spark, root, ["k"], 2).collect()}
    assert d2 == {8: "removed", 9: "removed"}
    # cumulative diff v1 -> v3
    d3 = {r.k: r.change for r in snapshot_diff(spark, root, ["k"], 1, 3).collect()}
    assert d3 == {3: "changed", 100: "added", 8: "removed", 9: "removed"}
