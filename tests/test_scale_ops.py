"""Skew utilities, stateful streaming, distributed metadata, UUID
columns — the scale-path additions."""

import pytest
from pyspark.sql import functions as F

from pg_parquet_spark.operators.skew import salted_aggregate, salted_join
from pg_parquet_spark.session import table

SF = "/root/testdata/sf0.001"


def test_salted_aggregate_equals_plain(spark):
    li = table(spark, SF, "lineitem")
    plain = {
        (r.l_returnflag,): (r.cnt, r.qty_sum, r.qty_max)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count("l_quantity").alias("cnt"),
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("qty_sum"),
            F.max("l_quantity").alias("qty_max"),
        )
        .collect()
    }
    salted = {
        (r.l_returnflag,): (r.cnt, r.qty_sum, r.qty_max)
        for r in salted_aggregate(
            li.withColumn("qty_dec", F.col("l_quantity").cast("decimal(12,2)")),
            ["l_returnflag"],
            {
                "cnt": ("l_quantity", "count"),
                "qty_sum": ("qty_dec", "sum"),
                "qty_max": ("l_quantity", "max"),
            },
            salt_buckets=8,
        ).collect()
    }
    assert plain == salted


def test_salted_aggregate_rejects_nondecomposable(spark):
    li = table(spark, SF, "lineitem")
    with pytest.raises(ValueError, match="unsupported"):
        salted_aggregate(li, ["l_returnflag"], {"a": ("l_quantity", "avg")})


def test_salted_join_equals_plain(spark):
    orders = table(spark, SF, "orders").withColumnRenamed("o_custkey", "c_custkey")
    customer = table(spark, SF, "customer")
    plain = (
        orders.join(customer, "c_custkey")
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    salted = (
        salted_join(orders, customer, "c_custkey", salt_buckets=8)
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))


def test_stateful_running_user_stats(spark):
    from pg_parquet_spark.streaming.stateful import (
        run_stateful_available_now,
        running_user_stats,
    )
    from pg_parquet_spark.streaming.stream import read_events_stream

    events = read_events_stream(spark, SF)
    out = run_stateful_available_now(running_user_stats(events))
    got = {r.user_id: (r.event_count, r.last_event_id) for r in out.collect()}

    ev = table(spark, SF, "events")
    want = {
        r.user_id: (r.cnt, r.last_id)
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"), F.max("event_id").alias("last_id"))
        .collect()
    }
    assert got == want


def test_parquet_metadata_many_matches_single(spark):
    from pg_parquet_spark.functions.metadata import (
        parquet_metadata,
        parquet_metadata_many,
    )

    single = parquet_metadata(spark, f"{SF}/orders.parquet").collect()
    many = [
        r
        for r in parquet_metadata_many(spark, f"{SF}/*.parquet").collect()
        if r.uri.endswith("orders.parquet")
    ]
    assert len(many) == len(single)
    s = {(r.column_id, r.stats_min, r.stats_max, r.num_values) for r in single}
    m = {(r.column_id, r.stats_min, r.stats_max, r.num_values) for r in many}
    assert s == m


def test_uuid_columns_written_as_flba16(spark, tmp_path):
    import pyarrow.parquet as pq

    from pg_parquet_spark.sources import write_parquet

    df = spark.createDataFrame(
        [("550e8400-e29b-41d4-a716-446655440000",), (None,)], "u STRING"
    )
    path = str(tmp_path / "uuid.parquet")
    write_parquet(df, path, uuid_columns=["u"])
    pf = pq.ParquetFile(path)
    assert "FIXED_LEN_BYTE_ARRAY" in str(pf.schema.column(0).physical_type)
    assert pf.schema.column(0).length == 16
    vals = pf.read().column(0).to_pylist()
    assert vals[0] == bytes.fromhex("550e8400e29b41d4a716446655440000")
    assert vals[1] is None
    # r3: the UUID LOGICAL annotation too — footer-patched on pyarrow<18
    # (uuid_annotation.py; schema_parser.rs:360-365 / udfs.rs golden)
    assert str(pf.schema.column(0).logical_type) == "UUID"


def test_uuid_file_reads_back_as_canonical_text(spark, tmp_path):
    """Reference-written uuid files (UUID-annotated FLBA) are rejected by
    Spark's schema converter; read_parquet's fallback reads them with an
    explicit schema and renders canonical 8-4-4-4-12 text (PG uuid
    output parity)."""
    from pg_parquet_spark.sources import read_parquet, write_parquet

    u1 = "550e8400-e29b-41d4-a716-446655440000"
    df = spark.createDataFrame([(1, u1), (2, None)], "id INT, u STRING")
    path = str(tmp_path / "uuid_rt.parquet")
    write_parquet(df, path, uuid_columns=["u"])
    back = {r.id: r.u for r in read_parquet(spark, path).collect()}
    assert back == {1: u1, 2: None}


def test_json_columns_logical_and_converted_type(spark, tmp_path):
    """PG json/jsonb → UTF8 byte array stamped with the JSON logical AND
    converted types (schema_parser.rs:409-410; parquet_udfs/schema.rs:130,
    160 report both); values stay readable by Spark and DuckDB."""
    import duckdb
    import pyarrow.parquet as pq

    from pg_parquet_spark.sources import read_parquet, write_parquet

    df = spark.createDataFrame(
        [(1, '{"a": 1}'), (2, '{"b": [2,3]}'), (3, None)],
        "id INT, payload STRING",
    )
    path = str(tmp_path / "json.parquet")
    write_parquet(df, path, json_columns=["payload"])
    col = pq.ParquetFile(path).schema.column(1)
    assert str(col.logical_type) == "JSON"
    assert str(col.converted_type) == "JSON"
    back = {r.id: r.payload for r in read_parquet(spark, path).collect()}
    assert back == {1: '{"a": 1}', 2: '{"b": [2,3]}', 3: None}
    dd = dict(
        duckdb.sql(
            f"select id, payload from read_parquet('{path}')"
        ).fetchall()
    )
    assert dd == back


def test_stateful_ttl_evicts_idle_users(spark, tmp_path):
    """ProcessingTimeTimeout eviction: users present only in the first
    micro-batch are evicted (final row, state removed) once a later batch
    arrives after the TTL. Two files + maxFilesPerTrigger=1 force two
    micro-batches; wall-clock between batches >> the 1 ms TTL."""
    import os
    import tempfile
    import uuid as _uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pg_parquet_spark.streaming.stateful import running_user_stats_with_ttl

    src = tmp_path / "ttl_events"
    src.mkdir()
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array([1, 2], pa.int64()),
                "event_id": pa.array([10, 20], pa.int64()),
                "value": pa.array([1.0, 2.0]),
            }
        ),
        str(src / "batch1.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array([2, 3], pa.int64()),
                "event_id": pa.array([21, 30], pa.int64()),
                "value": pa.array([3.0, 4.0]),
            }
        ),
        str(src / "batch2.parquet"),
    )
    stream = (
        spark.readStream.schema("user_id BIGINT, event_id BIGINT, value DOUBLE")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    out = running_user_stats_with_ttl(stream, ttl_ms=1)
    name = f"pgpq_ttl_{_uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option(
            "checkpointLocation",
            os.path.join(tempfile.gettempdir(), f"pgpq_ckpt_{name}"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table(name).collect()
    evicted = {r.user_id for r in rows if r.evicted}
    live = {r.user_id: r for r in rows if not r.evicted}
    # user 1 saw no data in batch 2 → timed out and evicted with its
    # final state intact; users 2/3 were updated in the last batch
    assert 1 in evicted
    ev1 = [r for r in rows if r.evicted and r.user_id == 1][0]
    assert ev1.event_count == 1 and ev1.last_event_id == 10
    assert live[2].event_count == 2 and live[2].last_event_id == 21
    assert live[3].event_count == 1 and live[3].last_event_id == 30


def test_stream_window_matches_batch_and_fixture_dates(spark):
    """Value-pinning for the tumbling-window stream (VERDICT r4 #2): the
    drained stream result must equal the batch groupBy(window(...)) on the
    same fixture, and every window_start must fall inside the fixture's
    actual event date range — a timestamp-unit regression (e.g. the r4
    nanos-vs-micros fixture change) shifts every window to 1970 and fails
    here directly instead of via an indirect session count."""
    import datetime

    from pg_parquet_spark.streaming.stream import (
        read_events_stream,
        run_available_now,
        windowed_event_counts,
    )

    got = run_available_now(
        windowed_event_counts(read_events_stream(spark, SF))
    ).collect()

    ev = table(spark, SF, "events")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    assert lo.year >= 2000, "fixture itself corrupt?"

    for r in got:
        assert lo - datetime.timedelta(hours=1) <= r.window_start <= hi

    want = {
        (r.window_start, r.event_type): (r.event_count, r.total_value)
        for r in ev.groupBy(
            F.window(F.col("ts").cast("timestamp"), "1 hour").alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.sum(F.col("value").cast("decimal(12,2)")).alias("total_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "event_count",
            "total_value",
        )
        .collect()
    }
    assert {
        (r.window_start, r.event_type): (r.event_count, r.total_value) for r in got
    } == want


@pytest.mark.parametrize("unit", ["ns", "us", "ms"])
def test_timestamp_unit_invariance(spark, tmp_path, unit):
    """Property test (VERDICT r4 #8): both the batch loader and the stream
    source must return identical wall-clock rows for ns-, µs- and ms-unit
    copies of the same events frame — the fixture's physical unit is a
    driver choice the engine must absorb via footer probing."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pg_parquet_spark.streaming.stream import read_events_stream, run_available_now

    base = datetime.datetime(2024, 3, 1, 12, 0, 0)
    ts = [base + datetime.timedelta(minutes=7 * i) for i in range(6)]
    tbl = pa.table(
        {
            "event_id": pa.array(range(6), pa.int64()),
            "ts": pa.array(ts, pa.timestamp(unit)),
            "user_id": pa.array([1, 1, 2, 2, 3, 3], pa.int64()),
            "event_type": pa.array(["a", "b"] * 3),
            "value": pa.array([float(i) for i in range(6)]),
            "props": pa.array(["{}"] * 6),
        }
    )
    d = tmp_path / f"unit_{unit}"
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))

    batch = table(spark, str(d), "events").orderBy("event_id").collect()
    assert [r.ts for r in batch] == ts

    # complete-mode drain needs an aggregation; event_id is unique so
    # min(ts) per event_id is the identity projection
    drained = run_available_now(
        read_events_stream(spark, str(d))
        .groupBy("event_id")
        .agg(F.min(F.col("ts").cast("timestamp_ntz")).alias("ts"))
    )
    stream = drained.orderBy("event_id").collect()
    assert [r.ts for r in stream] == ts


def test_rewrite_arrow_type_nested_and_extension():
    """ADVICE r4: the uuid-fallback schema rewrite must recurse into
    struct/list/map children and unwrap extension types to their storage
    (binary only when the storage is binary-like)."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import from_arrow_schema
    from pyspark.sql.types import BinaryType

    from pg_parquet_spark.sources.reader import _rewrite_arrow_type

    nested = pa.schema(
        [
            pa.field("top", pa.binary(16)),
            pa.field(
                "s",
                pa.struct(
                    [
                        pa.field("u", pa.binary(16)),
                        pa.field("n", pa.int64()),
                    ]
                ),
            ),
            pa.field("l", pa.list_(pa.binary(16))),
            pa.field("m", pa.map_(pa.string(), pa.binary(16))),
        ]
    )
    rewritten = pa.schema(
        [pa.field(f.name, _rewrite_arrow_type(f.type), f.nullable) for f in nested]
    )
    spark_schema = from_arrow_schema(rewritten)  # must not raise
    assert isinstance(spark_schema["top"].dataType, BinaryType)
    assert isinstance(spark_schema["s"].dataType["u"].dataType, BinaryType)
    assert spark_schema["s"].dataType["n"].dataType.typeName() == "long"
    assert isinstance(spark_schema["l"].dataType.elementType, BinaryType)
    assert isinstance(spark_schema["m"].dataType.valueType, BinaryType)

    # extension type with NON-binary storage unwraps to the storage type,
    # not to binary
    class _MonthType(pa.ExtensionType):
        def __init__(self):
            super().__init__(pa.int32(), "test.month")

        def __arrow_ext_serialize__(self):
            return b""

        @classmethod
        def __arrow_ext_deserialize__(cls, storage_type, serialized):
            return cls()

    assert _rewrite_arrow_type(_MonthType()) == pa.int32()


def test_stream_dedup_within_watermark_bounds_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark is the bounded-state tier of the
    streaming-dedup trade (stream.deduped_user_event_counts docstring):
    once the watermark passes a key's eviction horizon (first ts +
    delay) its state is dropped — eviction is applied from the NEXT
    micro-batch — so a later duplicate is re-emitted; exact global
    dedup only holds within the horizon. Three files with pinned mtimes
    + maxFilesPerTrigger=1 force three ordered micro-batches; batches
    1-2 advance the watermark past the key's eviction time."""
    import datetime
    import os as _os
    import time as _time
    import uuid as _uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "wm_events"
    src.mkdir()
    t = lambda h, m: datetime.datetime(2024, 6, 1, h, m)  # noqa: E731

    def write(name, uids, types, tss, age):
        pq.write_table(
            pa.table(
                {
                    "user_id": pa.array(uids, pa.int64()),
                    "event_type": pa.array(types),
                    "ts": pa.array(tss, pa.timestamp("us")),
                }
            ),
            str(src / name),
        )
        now = _time.time()
        # FileStreamSource orders by modification time — pin batch order
        _os.utime(src / name, (now - age, now - age))

    write("b1.parquet", [1, 9], ["k", "advance"], [t(10, 0), t(12, 0)], 300)
    write("b2.parquet", [9], ["advance2"], [t(12, 30)], 150)
    # batch 3: duplicate of (1, k) at 12:15 — newer than the watermark
    # (12:00), but the original state (eviction horizon 10:30) was
    # evicted at the start of batch 2 -> re-emitted
    write("b3.parquet", [1], ["k"], [t(12, 15)], 0)

    def drain(dedup_within: bool) -> list:
        stream = (
            spark.readStream.schema(
                "user_id BIGINT, event_type STRING, ts TIMESTAMP_NTZ"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "30 minutes")
        )
        out = (
            stream.dropDuplicatesWithinWatermark(["user_id", "event_type"])
            if dedup_within
            else stream.dropDuplicates(["user_id", "event_type"])
        )
        name = f"pgpq_wm_{_uuid.uuid4().hex[:8]}"
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return [
            (r.user_id, r.event_type)
            for r in spark.table(name).collect()
            if r.event_type == "k"
        ]

    assert sorted(drain(dedup_within=True)) == [(1, "k"), (1, "k")]
    assert sorted(drain(dedup_within=False)) == [(1, "k")]


def test_stream_parquet_sink_roundtrip(spark, tmp_path):
    """readStream → transform → writeStream parquet sink (the
    streaming-ETL shape: at scale this is the continuous-ingest path,
    one file per trigger per partition): drained output read back
    equals the batch equivalent."""
    import uuid as _uuid

    from pg_parquet_spark.streaming.stream import read_events_stream

    sf = "/root/testdata/sf0.001"
    out_dir = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    events = read_events_stream(spark, sf).select(
        "event_id", "user_id", F.col("value").cast("decimal(12,2)").alias("v")
    )
    q = (
        events.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .queryName(f"pgpq_sink_{_uuid.uuid4().hex[:8]}")
        .start()
    )
    q.awaitTermination(120)

    got = {
        r.event_id: (r.user_id, r.v)
        for r in spark.read.parquet(out_dir).collect()
    }
    want = {
        r.event_id: (r.user_id, r.v)
        for r in table(spark, sf, "events")
        .select(
            "event_id", "user_id", F.col("value").cast("decimal(12,2)").alias("v")
        )
        .collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# r6: physical-plan shape assertions for the dedup/ANN tier — the
# properties the 10× soak (tools/scale_soak.py) relies on, pinned at
# small scale so a regression shows up in CI before the soak.


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_winnow_join_is_hash_not_sort_merge(spark):
    from pg_parquet_spark.operators import dedup

    docs = table(spark, SF, "documents")
    pairs = dedup.winnow_shared_pairs(docs, "doc_id")
    plan = _plan(pairs)
    # r14 bucket-fold rewrite: pairs enumerate INSIDE each capped fp
    # bucket (window cap -> bounded collect_list -> in-bucket pair
    # transform), so the plan has NO join at all — a reappearing
    # SMJ/SHJ means the fold regressed to the pre-r14 self-join
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "collect_list" in plan


def test_minhash_plan_has_no_cartesian(spark):
    from pg_parquet_spark.operators import dedup

    docs = table(spark, SF, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, "doc_id")
    plan = _plan(pairs)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_winnow_fp_cap_bounds_boilerplate_buckets(spark):
    """A fingerprint shared by more docs than max_docs_per_fp is
    boilerplate by definition and must be DROPPED before pairing —
    the bound that keeps worst-case join fan-out at max_docs_per_fp²
    regardless of corpus size."""
    from pg_parquet_spark.operators import dedup

    text = "spark line column order small sort fast value scan batch part"
    clones = spark.createDataFrame(
        [(i, text) for i in range(60)], "doc_id LONG, text STRING"
    )
    # 60 identical docs, cap 50: every fingerprint occurs 60× → all
    # capped out → zero pairs despite maximal similarity
    assert dedup.winnow_shared_pairs(clones, "doc_id", max_docs_per_fp=50).count() == 0
    # cap raised above the clone count → the pairs come back
    assert dedup.winnow_shared_pairs(clones, "doc_id", max_docs_per_fp=64).count() > 0


def test_pq_topk_broadcasts_query_side(spark):
    from pyspark.sql import functions as F

    from pg_parquet_spark.operators import similarity

    emb = table(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select("embedding")
    top = similarity.pq_topk(emb, q, k=5)
    plan = _plan(top)
    # r8: the query vector and its ADC tables are plan literals — no
    # query-side join survives at all (r7 paid a BroadcastNestedLoopJoin
    # against the whole corpus); the winning cells broadcast-hash-join
    # back onto the coded corpus, which never shuffles, and the global
    # top-k compiles to per-partition heaps + driver merge
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_profile_approx_bounds_error_vs_exact(spark):
    """Sketch profile agrees with the exact profile: identical
    rows/nulls, HLL distinct within 10% (5% rsd default), median
    between exact min and max."""
    from pg_parquet_spark.operators.sampling import profile, profile_approx

    li = table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_returnflag"
    )
    exact = {r.column_name: r for r in profile(li).collect()}
    approx = {r.column_name: r for r in profile_approx(li).collect()}
    assert set(exact) == set(approx)
    for c, a in approx.items():
        e = exact[c]
        assert a.n_rows == e.n_rows and a.n_nulls == e.n_nulls
        assert abs(a.approx_distinct - e.n_distinct) <= max(2, 0.1 * e.n_distinct)
        if a.approx_median is not None:
            assert float(e.min_value) <= a.approx_median <= float(e.max_value)
    assert approx["l_returnflag"].approx_median is None  # non-numeric: no median


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    """Dynamic Partition Pruning: a selective dim-side filter prunes
    fact partitions at RUNTIME (the filter value is only known after
    the dim scan). The 100 TB pattern: facts hive-partitioned on the
    join key's FK, dims filtered by attributes — without DPP the fact
    scan reads every partition."""
    orders = table(spark, SF, "orders")
    cust = table(spark, SF, "customer")
    fact = str(tmp_path / "orders_by_status")
    orders.write.partitionBy("o_orderstatus").parquet(fact)

    f = spark.read.parquet(fact)
    # dim side: the filter is on a NON-key attribute, so only a runtime
    # subquery (DPP) can prune the fact's partitions
    dim_path = str(tmp_path / "status_dim")
    spark.createDataFrame(
        [("F", "done"), ("O", "open"), ("P", "pending")], ["st", "label"]
    ).write.parquet(dim_path)
    dim = spark.read.parquet(dim_path).filter(F.col("label") == "pending")
    j = f.join(dim, f.o_orderstatus == dim.st).select("o_orderkey")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    want = orders.filter(F.col("o_orderstatus") == "P").count()
    assert j.count() == want


def test_aqe_skew_join_splits_hot_partition(spark):
    """AQE skew-join: a 90%-hot key join re-plans at runtime with the
    hot partition split (SortMergeJoin(skew=true)) — the built-in
    complement to the explicit salted_join tier. Two requirements this
    test pins because they bite at any scale: (a) thresholds lowered so
    the local fixture trips the same code path a 100 TB hot key would;
    (b) the map stage must have MULTIPLE mappers — AQE splits a skewed
    reducer partition by mapper ranges, so a single-split source
    (1 parquet file) can never be skew-split (found empirically; the
    repartition(16) below is what makes the rule applicable)."""
    conf = spark.conf
    keys = (
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.autoBroadcastJoinThreshold",
    )
    saved = {}
    for k in keys:
        try:
            saved[k] = conf.get(k)
        except Exception:  # noqa: BLE001
            saved[k] = None
    try:
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB"
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ

        li = table(spark, "/root/testdata/sf0.01", "lineitem").repartition(16)
        # 90% of left rows collapse onto one join key; right is uniform
        left = li.select(
            F.when(F.col("l_orderkey") % 10 < 9, F.lit(0))
            .otherwise(F.col("l_orderkey"))
            .alias("k"),
            "l_quantity",
        )
        right = (
            table(spark, "/root/testdata/sf0.01", "lineitem")
            .repartition(16)
            .select(F.col("l_orderkey").alias("k"), "l_extendedprice")
        )
        j = left.join(right, "k")
        j.collect()  # the FINAL adaptive plan exists only after execution
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_dsir_select_matches_duckdb_oracle(spark):
    """DSIR importance resampling (r9): hashed-unigram importance
    weights + content-hash Gumbel-top-k — the full selected set
    (ids, weights, selection keys) replicates in DuckDB from the same
    literals. Weights must be target-sensitive: target-domain docs
    score higher on average than the corpus median."""
    import duckdb

    from pg_parquet_spark.operators import sampling
    from pg_parquet_spark.session import table

    sf = "/root/testdata/sf0.001"
    docs = table(spark, sf, "documents")
    target = docs.filter("source = 'src13'")
    got = sampling.dsir_select(docs, target, frac=0.2).toPandas()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(
        sampling.dsir_oracle_sql(frac=0.2, target_where="source = 'src13'")
    ).df()
    assert len(got) == len(want) > 0
    for col in ("doc_id", "n_words", "logw_micro", "sel_key_micro"):
        assert list(got[col]) == list(want[col]), col

    # sanity: the selector prefers the target domain (mean weight of
    # target docs above the corpus mean weight)
    w = sampling.dsir_weights(docs, target).toPandas()
    ids = set(
        r.doc_id for r in target.select("doc_id").collect()
    )
    tgt_mean = w[w.doc_id.isin(ids)].logw_micro.mean()
    all_mean = w.logw_micro.mean()
    assert tgt_mean > all_mean


def test_dsir_bigram_features_match_oracle(spark):
    """r9: ngram=2 hashes adjacent token pairs (the paper's feature
    set); the full selected set still replicates bit-exactly, and
    bigram weights rank the target domain above the corpus mean."""
    import duckdb

    from pg_parquet_spark.operators import sampling
    from pg_parquet_spark.session import table

    sf = "/root/testdata/sf0.001"
    docs = table(spark, sf, "documents")
    target = docs.filter("source = 'src13'")
    got = sampling.dsir_select(docs, target, frac=0.2, ngram=2).toPandas()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(
        sampling.dsir_oracle_sql(frac=0.2, target_where="source = 'src13'", ngram=2)
    ).df()
    assert len(got) == len(want) > 0
    for col in ("doc_id", "n_words", "logw_micro", "sel_key_micro"):
        assert list(got[col]) == list(want[col]), col

    w = sampling.dsir_weights(docs, target, ngram=2).toPandas()
    ids = {r.doc_id for r in target.select("doc_id").collect()}
    assert w[w.doc_id.isin(ids)].logw_micro.mean() > w.logw_micro.mean()
