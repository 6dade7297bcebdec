"""SparkSession factory with reference-equivalent defaults.

pg_parquet's performance/semantics-relevant constants (BASELINE.md §1):

- strict casts — reads cast file→table types with ``safe: false`` so a
  failed cast errors instead of producing NULL
  (reference: src/arrow_parquet/parquet_reader.rs:151-155). Spark
  equivalent: ``spark.sql.ansi.enabled=true``.
- default compression snappy (src/arrow_parquet/compression.rs:8-11).
- default writer version v1 (src/arrow_parquet/parquet_version.rs:8-10).
- default row-group bytes 125,829,120 (parquet_writer.rs:37-38) →
  ``parquet.block.size`` ≈ 128 MiB (Spark's default).
- field-id write support for the ``field_ids`` option
  (src/arrow_parquet/field_ids.rs).

Scale posture (100 TB target): AQE on (runtime re-plan, skew-join
splitting, partition coalescing), parquet filter pushdown + nested schema
pruning on, session timezone pinned UTC so timestamp semantics are
deterministic across driver/executors.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Tables the driver materializes under /root/testdata/sf*/ (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: GUC-equivalent kill switch (reference: pg_parquet.enable_copy_hooks,
#: src/lib.rs:40-61). When false, read_parquet/write_parquet refuse the
#: parquet fast path, mirroring the hook being disabled.
#: snapshot_keep_history: engine-level retention window for versioned
#: datasets (layout.py) — the newest N manifests + their snapshots
#: survive every maintenance vacuum. It is BOTH the time-travel depth
#: and the in-flight-reader grace period ("readers must finish within N
#: maintenance cycles"); raise it session-wide for long-running readers,
#: or per-op via the maintenance functions' keep_history= override.
_ENGINE_FLAGS = {"enable_copy_hooks": True, "snapshot_keep_history": 2}


def set_copy_hooks_enabled(enabled: bool) -> None:
    _ENGINE_FLAGS["enable_copy_hooks"] = bool(enabled)


def copy_hooks_enabled() -> bool:
    return _ENGINE_FLAGS["enable_copy_hooks"]


def set_snapshot_keep_history(n: int) -> None:
    """Session-level default retention for versioned-dataset maintenance
    (vacuum at entry of merge_upsert / compact_dataset /
    compact_partitions and standalone vacuum_dataset). Minimum 1 (the
    current version is always retained)."""
    if int(n) < 1:
        raise ValueError("snapshot_keep_history must be >= 1")
    _ENGINE_FLAGS["snapshot_keep_history"] = int(n)


def snapshot_keep_history() -> int:
    return _ENGINE_FLAGS["snapshot_keep_history"]


def session_builder(app_name: str = "pg_parquet_spark") -> SparkSession.Builder:
    """Builder with the engine defaults; callers may override before build."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        # strict-cast parity with CastOptions{safe:false}
        .config("spark.sql.ansi.enabled", "true")
        # deterministic timestamp semantics
        .config("spark.sql.session.timeZone", "UTC")
        # reference defaults: snappy + writer v1 + ~128MiB row groups
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.hadoop.parquet.writer.version", "PARQUET_1_0")
        .config("spark.hadoop.parquet.block.size", str(122880 * 1024))
        # reference writes TIMESTAMP(MICROS) annotations, never INT96
        # (schema_parser.rs maps PG timestamps to Timestamp(Microsecond));
        # Spark's INT96 default also breaks the pyarrow parity writer,
        # which reads its stage files back as nanos (ADVICE r3 #1)
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # field_ids option support (SURVEY.md A13)
        .config("spark.sql.parquet.fieldId.write.enabled", "true")
        .config("spark.sql.parquet.fieldId.read.enabled", "true")
        # scale posture: AQE re-plans at runtime (skew join, coalesce)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # pushdown / pruning are on by default — pinned explicitly because
        # the engine's read path depends on them (SURVEY.md §4)
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
        # parquet TIMESTAMP(NANOS) (pandas-written) is otherwise illegal in
        # Spark; read as int64 ns and convert in table() below
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    # local small-SF ergonomics ONLY: fewer initial shuffle partitions cut
    # task-scheduling overhead ~25% (measured, SCALE.md); CPU-heavy
    # operators set their own explicit repartition counts. Guarded on the
    # master actually being local (VERDICT #8): a deployment that points
    # SPARK_GRAFT_MASTER at a cluster keeps Spark's default / AQE
    # initial-partition heuristics instead of a single-node constant.
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    builder = builder.master(master)
    if master.startswith("local"):
        builder = builder.config(
            "spark.sql.shuffle.partitions",
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8"),
        )
    builder = (
        builder
        # Arrow for any pandas interchange (vectorized UDF boundary)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    return builder


def get_spark(app_name: str = "pg_parquet_spark") -> SparkSession:
    return session_builder(app_name).getOrCreate()


#: SQL confs that are runtime-settable and that the engine's semantics
#: depend on — re-asserted on every externally-provided session (the
#: driver harness builds its own SparkSession without our builder).
_RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # micros annotation on every write path (ADVICE r3 #1): without it the
    # parity writer's stage read yields TIMESTAMP(NANOS) footers that our
    # own nanosAsLong read then surfaces as raw longs
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.adaptive.enabled": "true",
    # strict-cast parity with the reference's CastOptions{safe:false}
    # (ADVICE r1): without this a driver-provided session silently
    # degrades read coercions to NULL-on-overflow
    "spark.sql.ansi.enabled": "true",
    # field_ids option support must also survive external sessions
    "spark.sql.parquet.fieldId.write.enabled": "true",
    "spark.sql.parquet.fieldId.read.enabled": "true",
}


def ensure_session_defaults(spark: SparkSession) -> SparkSession:
    """Idempotently pin the runtime-settable engine confs on a session we
    didn't build (driver-provided sessions lack the builder configs;
    without nanosAsLong the events table is unreadable, without UTC the
    timestamp wall-clock semantics drift)."""
    for k, v in _RUNTIME_CONFS.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:  # pragma: no cover - conf not recognized
            pass
    return spark


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load the driver star schema and register temp views.

    Equivalent of the reference's "the query surface is whatever SQL can
    see" — pg_parquet delegates the inner query to the PG executor over
    its catalog (SURVEY.md §2.B); here the catalog is temp views over the
    sf parquet tables.
    """
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


#: DataFrame memo per (application, sf_dir, table): table() is called by
#: every gate query, and each call pays ~100 ms of footer-read + plan
#: resolution; the frames are immutable lineage objects, safe to share.
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def timestamp_units(path: str) -> dict[str, str]:
    """Map of column → parquet timestamp unit ('s'/'ms'/'us'/'ns') read
    from the file footer. Shared by the batch loader (``table``) and the
    streaming source (``streaming.stream.read_events_stream``) so the two
    paths can never disagree about a fixture's physical unit: Spark reads
    ms/µs natively as timestamp types but surfaces NANOS columns as int64
    (nanosAsLong), which both paths must repair identically."""
    import pyarrow.parquet as pq

    try:
        schema = pq.ParquetFile(path).schema_arrow
    except Exception:  # pragma: no cover - directories/remote stores
        return {}
    import pyarrow as pa

    out: dict[str, str] = {}
    for i in range(len(schema)):
        f = schema.field(i)
        if pa.types.is_timestamp(f.type):
            out[f.name] = f.type.unit
    return out


def _ns_timestamp_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark reads them as
    int64 ns (nanosAsLong) and we restore timestamp semantics."""
    return [c for c, unit in timestamp_units(path).items() if unit == "ns"]


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one star-schema table (no view registration); memoized per
    session+path (the testdata is read-only, frames are immutable
    lineage objects — each uncached call pays ~100 ms of footer-read +
    plan resolution)."""
    try:
        app_id = spark.sparkContext.applicationId
    except Exception:  # pragma: no cover - stopped context
        app_id = ""
    key = (app_id, sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    ensure_session_defaults(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    for col in _ns_timestamp_columns(path):
        # ns → µs (floor) → wall-clock TIMESTAMP_NTZ (session tz is UTC)
        # integer `div` — float division would lose precision on ~1e18 ns
        df = df.withColumn(
            col,
            F.timestamp_micros(F.expr(f"`{col}` div 1000")).cast("timestamp_ntz"),
        )
    _TABLE_CACHE[key] = df
    return df
