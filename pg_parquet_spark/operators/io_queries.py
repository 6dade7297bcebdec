"""I/O-surface operators (SURVEY.md §2.A) exposed as correctness-gate
queries: each routes through the engine's own read_parquet / metadata
functions and is checked against a plain-SQL DuckDB oracle over the same
data, proving the wrapper layer preserves semantics.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from pg_parquet_spark.functions.metadata import (
    parquet_column_stats,
    parquet_file_metadata,
    parquet_list,
    parquet_schema,
)
from pg_parquet_spark.sources.reader import read_parquet


# http(s) scan (A24; reference src/object_store/http.rs:11-38): the
# gate serves the sf dir over a loopback HTTP server and reads through
# the engine's range-request path — footer driver-side, row groups
# decoded executor-side.

#: one daemon server per served directory, alive for the session (the
#: returned DataFrame is lazy; executors fetch when the driver runs it)
_HTTP_SERVERS: dict[str, object] = {}


def _http_base_url(directory: str) -> str:
    # loopback test server is plain http — opt in the way the reference
    # tests do for their WebDAV emulator (object_store/http.rs:16 gates
    # non-TLS http on the ALLOW_HTTP env var being set)
    os.environ.setdefault("ALLOW_HTTP", "1")
    srv = _HTTP_SERVERS.get(directory)
    if srv is None:
        import functools
        import http.server
        import threading

        handler = functools.partial(
            http.server.SimpleHTTPRequestHandler, directory=directory
        )
        srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        _HTTP_SERVERS[directory] = srv
    return f"http://127.0.0.1:{srv.server_address[1]}"


def q_io_http_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    url = f"{_http_base_url(os.path.abspath(sf_dir))}/customer.parquet"
    df = read_parquet(spark, url)
    return (
        df.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("c_acctbal").cast("decimal(12,2)"))
            .cast("double")
            .alias("sum_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


Q_IO_HTTP_ORACLE = """
SELECT c_mktsegment, COUNT(*) AS cnt,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal
FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


# glob/multi-file scan (A7): pattern fan-out within the engine reader

def q_io_glob_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = read_parquet(spark, os.path.join(sf_dir, "lineitem*.parquet"))
    return (
        df.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("l_returnflag")
    )


Q_IO_GLOB_ORACLE = """
SELECT l_returnflag, COUNT(*) AS cnt FROM lineitem
GROUP BY l_returnflag ORDER BY l_returnflag
"""


# match_by=position (A14): ordinal mapping with renamed target columns

def q_io_match_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    target = StructType.fromDDL(
        "orderkey BIGINT, partkey BIGINT, suppkey BIGINT, linenumber INT, "
        "quantity DOUBLE, extendedprice DOUBLE, discount DOUBLE, tax DOUBLE, "
        "returnflag STRING, linestatus STRING, shipdate TIMESTAMP_NTZ"
    )
    df = read_parquet(
        spark, os.path.join(sf_dir, "lineitem.parquet"), target, match_by="position"
    )
    return (
        df.groupBy("returnflag")
        .agg(F.sum(F.col("quantity").cast("decimal(12,2)")).cast("double").alias("sum_qty"))
        .orderBy("returnflag")
    )


Q_IO_MATCH_POSITION_ORACLE = """
SELECT l_returnflag AS returnflag,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY l_returnflag ORDER BY returnflag
"""


# match_by=name + read-time coercion (A15): int32→smallint-range cast,
# timestamp→date, int64→int

def q_io_coercion_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    target = StructType.fromDDL(
        "l_shipdate DATE, l_linenumber BIGINT, l_orderkey INT"
    )
    df = read_parquet(
        spark, os.path.join(sf_dir, "lineitem.parquet"), target, match_by="name"
    )
    return (
        df.groupBy("l_shipdate")
        .agg(
            F.sum("l_linenumber").alias("sum_linenumber"),
            F.max("l_orderkey").alias("max_orderkey"),
        )
        .orderBy("l_shipdate")
        .limit(100)
    )


Q_IO_COERCION_ORACLE = """
SELECT CAST(l_shipdate AS DATE) AS l_shipdate,
       CAST(SUM(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS sum_linenumber,
       MAX(CAST(l_orderkey AS INT)) AS max_orderkey
FROM lineitem GROUP BY 1 ORDER BY l_shipdate LIMIT 100
"""


# WHERE-on-load (A6) + column projection (A5)

def q_io_where_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = read_parquet(
        spark,
        os.path.join(sf_dir, "orders.parquet"),
        where="o_totalprice > 250000",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )
    return df.orderBy("o_orderkey")


Q_IO_WHERE_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
WHERE o_totalprice > 250000 ORDER BY o_orderkey
"""


# parquet.file_metadata (A18): num_rows cross-checked against SQL count

def q_io_file_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    md = parquet_file_metadata(spark, os.path.join(sf_dir, "lineitem.parquet"))
    return md.select("num_rows", "num_row_groups")


Q_IO_FILE_METADATA_ORACLE = """
SELECT COUNT(*) AS num_rows, CAST(1 AS BIGINT) AS num_row_groups FROM lineitem
"""


# parquet.column_stats (A20): footer min/max/null fold == SQL aggregates

def q_io_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    stats = parquet_column_stats(spark, os.path.join(sf_dir, "orders.parquet"))
    # o_totalprice is leaf column 3 (o_orderkey, o_custkey, o_orderstatus,
    # o_totalprice, ...)
    return stats.filter(F.col("column_id") == 3).select(
        F.col("stats_min").cast("double").alias("min_price"),
        F.col("stats_max").cast("double").alias("max_price"),
        F.col("stats_null_count").alias("null_count"),
    )


Q_IO_COLUMN_STATS_ORACLE = """
SELECT MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
       COUNT(*) - COUNT(o_totalprice) AS null_count
FROM orders
"""


# parquet.schema (A16): leaf physical types — stable across scale factors

def q_io_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    sch = parquet_schema(spark, os.path.join(sf_dir, "orders.parquet"))
    return (
        sch.filter(F.col("type_name").isNotNull())
        .select("name", "type_name")
        .orderBy("name")
    )


Q_IO_SCHEMA_ORACLE = """
SELECT * FROM (VALUES
  ('o_custkey', 'INT64'),
  ('o_orderdate', 'INT64'),
  ('o_orderkey', 'INT64'),
  ('o_orderpriority', 'BYTE_ARRAY'),
  ('o_orderstatus', 'BYTE_ARRAY'),
  ('o_totalprice', 'DOUBLE')) AS t(name, type_name)
ORDER BY name
"""


# parquet.list (A21): file inventory of the sf directory

def q_io_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    lst = parquet_list(spark, os.path.join(sf_dir, "*.parquet"))
    return (
        lst.select(
            F.element_at(F.split(F.col("uri"), "/"), -1).alias("file_name")
        )
        .orderBy("file_name")
    )


Q_IO_LIST_ORACLE = """
SELECT * FROM (VALUES
  ('customer.parquet'), ('documents.parquet'), ('embeddings.parquet'),
  ('events.parquet'), ('lineitem.parquet'), ('nation.parquet'),
  ('orders.parquet'), ('part.parquet'), ('region.parquet'),
  ('supplier.parquet')) AS t(file_name)
ORDER BY file_name
"""


# csv / json sources (§2.B scans row: spark.read.csv/json built-ins) —
# round-trip the orders table through each format inside the query, then
# aggregate; the oracle reads the same rows from parquet.

def q_io_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pg_parquet_spark.session import table

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = os.path.join(tempfile.gettempdir(), "pgpq_orders_csv")
    orders.write.mode("overwrite").option("header", "true").csv(path)
    back = (
        spark.read.option("header", "true")
        .schema("o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE")
        .csv(path)
    )
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double").alias("total"),
        )
        .orderBy("o_orderstatus")
    )


Q_IO_CSV_ORACLE = """
SELECT o_orderstatus, COUNT(*) AS cnt,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def q_io_partitioned_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned dataset write + pruned read-back (engine
    extension — SURVEY §2.C notes the reference has no partitioned
    dataset semantics; this is the Spark-native scale layout). Writes
    lineitem partitioned by l_returnflag, reads the dataset back, and
    aggregates ONE partition — the filter on the partition column must
    prune to a single ``l_returnflag=R/`` directory (asserted via
    PartitionFilters in tests/test_writer.py)."""
    import tempfile

    from pg_parquet_spark.session import table
    from pg_parquet_spark.sources import read_parquet, write_parquet

    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_linestatus", "l_returnflag"
    )
    path = os.path.join(tempfile.gettempdir(), "pgpq_li_partitioned")
    write_parquet(li, path, partition_by=["l_returnflag"])
    back = read_parquet(spark, path)
    return (
        back.filter(F.col("l_returnflag") == "R")
        .groupBy("l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("l_quantity").cast("decimal(12,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
        .orderBy("l_linestatus")
    )


Q_IO_PARTITIONED_ORACLE = """
SELECT l_linestatus, COUNT(*) AS cnt,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
FROM lineitem WHERE l_returnflag = 'R'
GROUP BY l_linestatus ORDER BY l_linestatus
"""


def q_io_zorder_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustered write + 2-D range-filtered read-back (engine
    extension — multi-column data skipping, the layout single-column
    sort can't give). Writes lineitem Morton-interleaved on
    (l_partkey, l_suppkey), reads it back and answers a conjunctive
    range filter on both columns; row-group stats tightness vs the
    unsorted layout is asserted in tests/test_layout.py. The values are
    layout-invariant, so the oracle is the plain filter on lineitem."""
    import tempfile

    from pg_parquet_spark.session import table
    from pg_parquet_spark.sources import read_parquet
    from pg_parquet_spark.sources.layout import write_zordered

    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    path = os.path.join(tempfile.gettempdir(), "pgpq_li_zorder")
    write_zordered(li, path, zorder_by=["l_partkey", "l_suppkey"], num_files=4)
    back = read_parquet(spark, path)
    return (
        back.filter(
            (F.col("l_partkey") >= 100)
            & (F.col("l_partkey") <= 300)
            & (F.col("l_suppkey") >= 10)
            & (F.col("l_suppkey") <= 40)
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("l_quantity").cast("decimal(12,2)"))
            .cast("double")
            .alias("sum_qty"),
            F.min("l_orderkey").alias("min_orderkey"),
            F.max("l_orderkey").alias("max_orderkey"),
        )
    )


Q_IO_ZORDER_ORACLE = """
SELECT COUNT(*) AS cnt,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       MIN(l_orderkey) AS min_orderkey,
       MAX(l_orderkey) AS max_orderkey
FROM lineitem
WHERE l_partkey BETWEEN 100 AND 300 AND l_suppkey BETWEEN 10 AND 40
"""


def q_io_bloom_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filtered point lookup (engine extension): orders written
    hash-SCRAMBLED (every row group spans the whole key range, so
    min/max stats prune nothing) with a bloom filter on o_custkey,
    read back with a point-lookup filter. parquet-mr consults the
    bloom per row group — the read-side skip is proven in
    tests/test_layout.py via Spark scan metrics (0 rows scanned for an
    absent key vs a full-file scan without the bloom). Values are
    layout-invariant, so the oracle is the plain filter on orders."""
    import tempfile

    from pg_parquet_spark.session import table
    from pg_parquet_spark.sources import read_parquet
    from pg_parquet_spark.sources.layout import write_with_bloom

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    path = os.path.join(tempfile.gettempdir(), "pgpq_orders_bloom")
    write_with_bloom(
        orders.orderBy(F.hash("o_orderkey")).coalesce(2),
        path,
        bloom_cols=["o_custkey"],
        disable_dictionary=True,
    )
    back = read_parquet(spark, path)
    return back.filter(F.col("o_custkey").isin(7, 13, 42)).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
        .cast("double")
        .alias("sum_price"),
        F.min("o_orderkey").alias("min_orderkey"),
        F.max("o_orderkey").alias("max_orderkey"),
    )


Q_IO_BLOOM_ORACLE = """
SELECT COUNT(*) AS cnt,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_price,
       MIN(o_orderkey) AS min_orderkey,
       MAX(o_orderkey) AS max_orderkey
FROM orders
WHERE o_custkey IN (7, 13, 42)
"""


def q_io_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read (engine extension): a dataset written in
    two schema versions — v2 adds a column — reads back as ONE table
    with ``mergeSchema``, old files NULL-filling the new column. The
    lifecycle every long-lived 100 TB dataset goes through; the
    reference's strict match_by surface has no equivalent (COPY FROM
    reads one file's schema), so this is the Spark-native answer."""
    import shutil
    import tempfile

    from pg_parquet_spark.session import table

    orders = table(spark, sf_dir, "orders")
    path = os.path.join(tempfile.gettempdir(), "pgpq_orders_evolving")
    shutil.rmtree(path, ignore_errors=True)
    v1 = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice"
    )
    v2 = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        "o_totalprice",
        F.col("o_orderpriority").alias("priority"),  # added in v2
    )
    v1.write.mode("overwrite").parquet(os.path.join(path, "batch=v1"))
    v2.write.mode("overwrite").parquet(os.path.join(path, "batch=v2"))
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(path, "batch=v1"), os.path.join(path, "batch=v2")
    )
    return (
        merged.groupBy(F.coalesce(F.col("priority"), F.lit("<pre-v2>")).alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .orderBy("priority")
    )


Q_IO_SCHEMA_EVOLUTION_ORACLE = """
WITH merged AS (
  SELECT o_orderkey, o_totalprice, NULL AS priority
  FROM orders WHERE o_orderkey % 2 = 0
  UNION ALL
  SELECT o_orderkey, o_totalprice, o_orderpriority
  FROM orders WHERE o_orderkey % 2 = 1
)
SELECT COALESCE(priority, '<pre-v2>') AS priority, COUNT(*) AS cnt,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM merged GROUP BY 1 ORDER BY priority
"""


def q_io_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-scoped MERGE upsert into a plain-parquet dataset
    (engine extension — the Delta MERGE primitive via anti-join + union
    + touched-partition rewrite): writes orders hive-partitioned, then
    upserts doubled prices for keys %10==0 and inserts new keys for
    %100==7, rewriting only partitions present in the update set
    (physical untouched-partition evidence in tests/test_layout.py)."""
    import tempfile

    from pg_parquet_spark.session import table
    from pg_parquet_spark.sources import read_parquet
    from pg_parquet_spark.sources.layout import merge_upsert, write_partitioned

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    path = os.path.join(tempfile.gettempdir(), "pgpq_orders_merge")
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    write_partitioned(orders, path, ["o_orderpriority"])

    updates = (
        orders.filter(F.col("o_orderkey") % 10 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .unionByName(
            orders.filter(F.col("o_orderkey") % 100 == 7).select(
                (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
                (F.col("o_totalprice") + 1000).alias("o_totalprice"),
                "o_orderpriority",
            )
        )
    )
    # versioned=True: the merge publishes a manifest-pointer snapshot and
    # read_parquet resolves it (r8 — the oracle now covers the resolver)
    merge_upsert(
        spark,
        path,
        updates,
        ["o_orderkey"],
        partition_col="o_orderpriority",
        versioned=True,
    )
    back = read_parquet(spark, path)
    return (
        back.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
            F.max("o_orderkey").alias("max_key"),
        )
        .orderBy("o_orderpriority")
    )


Q_IO_MERGE_UPSERT_ORACLE = """
WITH base AS (
  SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
), upd AS (
  SELECT o_orderkey, o_totalprice * 2 AS o_totalprice, o_orderpriority
  FROM orders WHERE o_orderkey % 10 = 0
  UNION ALL
  SELECT o_orderkey + 10000000, o_totalprice + 1000, o_orderpriority
  FROM orders WHERE o_orderkey % 100 = 7
), merged AS (
  SELECT * FROM base WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
  UNION ALL SELECT * FROM upd
)
SELECT o_orderpriority, COUNT(*) AS cnt,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       MAX(o_orderkey) AS max_key
FROM merged GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q_io_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot TIME TRAVEL through the manifest history (r8 protocol,
    r9 gate): two versioned MERGEs publish two snapshots, then the read
    addresses version n-1 via ``read_parquet(..., version=)`` — the
    oracle is the state after the FIRST merge only, so the gate fails
    if retention drops the manifest, if the resolver serves the wrong
    snapshot, or if the second merge leaks into the past."""
    import shutil
    import tempfile

    from pg_parquet_spark.session import table
    from pg_parquet_spark.sources import read_parquet, write_parquet
    from pg_parquet_spark.sources.layout import merge_upsert, read_manifest

    sup = table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_acctbal", "s_nationkey"
    )
    path = os.path.join(tempfile.gettempdir(), "pgpq_supp_travel")
    shutil.rmtree(path, ignore_errors=True)
    write_parquet(sup, path)

    first = sup.filter(F.col("s_suppkey") % 5 == 0).withColumn(
        "s_acctbal", F.col("s_acctbal") * 2
    )
    merge_upsert(spark, path, first, ["s_suppkey"], versioned=True)
    second = sup.filter(F.col("s_suppkey") % 3 == 0).withColumn(
        "s_acctbal", F.col("s_acctbal") + 1000
    )
    merge_upsert(spark, path, second, ["s_suppkey"], versioned=True)

    v = read_manifest(path)["version"]
    past = read_parquet(spark, path, version=v - 1)
    return (
        past.groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("s_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_bal"),
        )
        .orderBy("s_nationkey")
    )


Q_IO_TIME_TRAVEL_ORACLE = """
WITH merged AS (
  SELECT s_suppkey, s_acctbal, s_nationkey FROM supplier
  WHERE s_suppkey % 5 <> 0
  UNION ALL
  SELECT s_suppkey, s_acctbal * 2, s_nationkey FROM supplier
  WHERE s_suppkey % 5 = 0
)
SELECT s_nationkey, COUNT(*) AS cnt,
       CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
FROM merged GROUP BY s_nationkey ORDER BY s_nationkey
"""


def q_io_compact_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental PER-PARTITION compaction (r8 op, r9 gate — the 100 TB
    maintenance shape: cost proportional to drifted partitions, one
    atomic pointer flip for the whole pass): hive-write orders, MERGE
    doubled prices for keys %10==0 (fragmenting the touched partitions
    across snapshot versions), force-compact every partition
    (max_files=0), and read back through the pointer — compaction must
    be a logical no-op over the merge semantics. Only-drifted-rewritten
    evidence is pytest-asserted (tests/test_layout.py)."""
    import shutil
    import tempfile

    from pg_parquet_spark.session import table
    from pg_parquet_spark.sources import read_parquet
    from pg_parquet_spark.sources.layout import (
        compact_partitions,
        merge_upsert,
        write_partitioned,
    )

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    path = os.path.join(tempfile.gettempdir(), "pgpq_orders_cpart")
    shutil.rmtree(path, ignore_errors=True)
    write_partitioned(orders, path, ["o_orderpriority"])

    updates = orders.filter(F.col("o_orderkey") % 10 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    merge_upsert(
        spark,
        path,
        updates,
        ["o_orderkey"],
        partition_col="o_orderpriority",
        versioned=True,
    )
    compact_partitions(spark, path, max_files=0)
    back = read_parquet(spark, path)
    return (
        back.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .orderBy("o_orderpriority")
    )


Q_IO_COMPACT_PARTITIONS_ORACLE = """
WITH merged AS (
  SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
  WHERE o_orderkey % 10 <> 0
  UNION ALL
  SELECT o_orderkey, o_totalprice * 2, o_orderpriority FROM orders
  WHERE o_orderkey % 10 = 0
)
SELECT o_orderpriority, COUNT(*) AS cnt,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM merged GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q_io_copy_from_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COPY <table> FROM end-to-end (A2 + copy_pg_rules parity): create a
    3-column target table, load orders.parquet into it by name with
    NOT-NULL enforcement on the key, and aggregate the TABLE contents."""
    import shutil
    import tempfile

    from pg_parquet_spark.sources.reader import copy_from_into

    # fixed location, cleared up-front: DROP TABLE keeps external files,
    # so a stale directory would otherwise double-count on re-runs
    loc = os.path.join(tempfile.gettempdir(), "pgpq_copy_tbl")
    spark.sql("DROP TABLE IF EXISTS pgpq_orders_loaded")
    shutil.rmtree(loc, ignore_errors=True)
    spark.sql(
        "CREATE TABLE pgpq_orders_loaded "
        "(o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE) "
        f"USING parquet LOCATION '{loc}'"
    )
    loaded = copy_from_into(
        spark,
        os.path.join(sf_dir, "orders.parquet"),
        "pgpq_orders_loaded",
        match_by="name",
        not_null=["o_orderkey"],
    )
    return loaded.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_orderkey").alias("key_sum"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double").alias(
            "price_sum"
        ),
    )


Q_IO_COPY_FROM_TABLE_ORACLE = """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS price_sum
FROM orders
"""


#: fixture points for the A29 gate — WKB bytes computed once via the
#: struct helper; the oracle states the same bytes independently
_GEO_POINTS = [(i, float(i) * 1.5, float(i) - 2.25) for i in range(5)]


def q_io_geo_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GeoParquet (A29) e2e: fixture WKB points written through
    write_geoparquet (WKB binary + `geo` 1.1 footer), read back through
    the engine; the output carries the blob hex plus footer facts
    (geo key present, version string). The oracle asserts the expected
    WKB bytes and metadata values independently."""
    import json
    import tempfile

    from pg_parquet_spark.functions.geo import wkb_point, write_geoparquet
    from pg_parquet_spark.functions.metadata import parquet_kv_metadata

    rows = [(i, bytearray(wkb_point(x, y))) for i, x, y in _GEO_POINTS]
    geo = spark.createDataFrame(rows, "pt_id INT, geom BINARY")
    path = os.path.join(tempfile.gettempdir(), "pgpq_geo_gate.parquet")
    write_geoparquet(geo, path, {"geom": ["Point"]})
    back = read_parquet(spark, path)
    kv = parquet_kv_metadata(spark, path).collect()
    geo_md = {bytes(r.key).decode(): bytes(r.value).decode() for r in kv}
    version = json.loads(geo_md.get("geo", "{}")).get("version", "")
    return (
        back.select(
            "pt_id",
            F.hex(F.col("geom")).alias("wkb_hex"),
            F.lit(version).alias("geo_version"),
        )
        .orderBy("pt_id")
    )


def _geo_oracle() -> str:
    from pg_parquet_spark.functions.geo import GEOPARQUET_VERSION, wkb_point

    values = ",\n  ".join(
        f"({i}, '{wkb_point(x, y).hex().upper()}', '{GEOPARQUET_VERSION}')"
        for i, x, y in _GEO_POINTS
    )
    return (
        "SELECT * FROM (VALUES\n  "
        + values
        + ") AS t(pt_id, wkb_hex, geo_version)\nORDER BY pt_id"
    )


def q_io_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pg_parquet_spark.session import table

    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    path = os.path.join(tempfile.gettempdir(), "pgpq_part_json")
    part.write.mode("overwrite").json(path)
    back = spark.read.schema("p_partkey BIGINT, p_brand STRING, p_size INT").json(path)
    return (
        back.groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("cnt"), F.max("p_size").alias("max_size"))
        .orderBy("p_brand")
    )


Q_IO_JSON_ORACLE = """
SELECT p_brand, COUNT(*) AS cnt, MAX(p_size) AS max_size
FROM part GROUP BY p_brand ORDER BY p_brand
"""


def q_io_versioned_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full versioned-maintenance lifecycle through the manifest-pointer
    protocol (r8, engine extension — the crash-atomic publish plain
    parquet lacks; see layout.py's versioned-publish note): write
    customers hive-partitioned, MERGE doubled balances for keys %7==0
    plus inserts for %50==3 (versioned — the untouched market segments
    are carried by REFERENCE, only touched ones land in the new
    snapshot), then compact the whole dataset into a fresh snapshot, and
    read back through read_parquet's pointer resolution. The oracle is
    the pure-SQL merge semantics — compaction must be a logical no-op
    and the resolver must surface exactly the published snapshot."""
    import tempfile

    from pg_parquet_spark.session import table
    from pg_parquet_spark.sources import read_parquet
    from pg_parquet_spark.sources.layout import (
        compact_dataset,
        merge_upsert,
        write_partitioned,
    )

    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    path = os.path.join(tempfile.gettempdir(), "pgpq_cust_versioned")
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    write_partitioned(cust, path, ["c_mktsegment"])

    updates = (
        cust.filter(F.col("c_custkey") % 7 == 0)
        .withColumn("c_acctbal", F.col("c_acctbal") * 2)
        .unionByName(
            cust.filter(F.col("c_custkey") % 50 == 3).select(
                (F.col("c_custkey") + 5_000_000).alias("c_custkey"),
                (F.col("c_acctbal") + 100).alias("c_acctbal"),
                "c_mktsegment",
            )
        )
    )
    merge_upsert(
        spark,
        path,
        updates,
        ["c_custkey"],
        partition_col="c_mktsegment",
        versioned=True,
    )
    compact_dataset(spark, path, partition_by=["c_mktsegment"])
    back = read_parquet(spark, path)
    return (
        back.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_bal"),
            F.max("c_custkey").alias("max_key"),
        )
        .orderBy("c_mktsegment")
    )


Q_IO_VERSIONED_MAINTENANCE_ORACLE = """
WITH base AS (
  SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
), upd AS (
  SELECT c_custkey, c_acctbal * 2 AS c_acctbal, c_mktsegment
  FROM customer WHERE c_custkey % 7 = 0
  UNION ALL
  SELECT c_custkey + 5000000, c_acctbal + 100, c_mktsegment
  FROM customer WHERE c_custkey % 50 = 3
), merged AS (
  SELECT * FROM base WHERE c_custkey NOT IN (SELECT c_custkey FROM upd)
  UNION ALL SELECT * FROM upd
)
SELECT c_mktsegment, COUNT(*) AS cnt,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
       MAX(c_custkey) AS max_key
FROM merged GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def q_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 history-keeping MERGE (r9 family, r10 gate): a three-batch
    dimension evolution — full load, attr changes + new keys, a segment
    move — applied through merge_scd2's versioned crash-atomic publish,
    then the COMPLETE interval table read back through the pointer. The
    oracle replays the same batches as unrolled CTEs with IS DISTINCT
    FROM change detection, so closed intervals, carried rows, no-op
    replays, and insert boundaries must all line up row-for-row.
    Covers read_scd2_asof's substrate too (the as-of read is an
    interval filter over exactly this table; filter semantics pinned in
    tests/test_scd.py)."""
    import shutil
    import tempfile

    from pg_parquet_spark.session import table
    from pg_parquet_spark.sources import layout, scd

    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    b0 = cust.withColumn("eff", F.lit(1))
    b1 = (
        cust.filter("c_custkey % 3 IN (0, 1)")
        .withColumn(
            "c_acctbal",
            F.when(
                F.col("c_custkey") % 3 == 0, F.col("c_acctbal") + 100
            ).otherwise(F.col("c_acctbal")),
        )
        .unionByName(
            cust.filter("c_custkey < 3").select(
                (F.col("c_custkey") + 100000).alias("c_custkey"),
                F.lit(1.0).alias("c_acctbal"),
                F.lit("NEW").alias("c_mktsegment"),
            )
        )
        .withColumn("eff", F.lit(2))
    )
    b2 = (
        cust.filter("c_custkey % 5 = 0 AND c_custkey % 3 <> 0")
        .withColumn("c_mktsegment", F.lit("MOVED"))
        .withColumn("eff", F.lit(3))
    )
    root = os.path.join(tempfile.gettempdir(), "pgpq_scd2_dim")
    shutil.rmtree(root, ignore_errors=True)
    for b in (b0, b1, b2):
        scd.merge_scd2(spark, root, b, ["c_custkey"], "eff")
    return layout.read_versioned(spark, root).orderBy(
        "c_custkey", "_valid_from"
    )


def _scd2_oracle() -> str:
    from pg_parquet_spark.sources import scd

    b0 = "SELECT c_custkey, c_acctbal, c_mktsegment FROM customer"
    b1 = """
      SELECT c_custkey,
             CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 100 ELSE c_acctbal END AS c_acctbal,
             c_mktsegment
      FROM customer WHERE c_custkey % 3 IN (0, 1)
      UNION ALL
      SELECT c_custkey + 100000, 1.0, 'NEW' FROM customer WHERE c_custkey < 3
    """
    b2 = """
      SELECT c_custkey, c_acctbal, 'MOVED' AS c_mktsegment
      FROM customer WHERE c_custkey % 5 = 0 AND c_custkey % 3 <> 0
    """
    return scd.scd2_oracle_sql(
        [(b0, "1"), (b1, "2"), (b2, "3")],
        ["c_custkey"],
        ["c_acctbal", "c_mktsegment"],
    )


def q_io_delete_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Versioned DELETE lifecycle (r11 family, r12 gate — the
    right-to-be-forgotten primitive): publish customers as a versioned
    snapshot, DELETE every negative balance through the crash-atomic
    pointer flip, then audit the publish with snapshot_diff between
    the pre-delete snapshot (still retained — time travel) and the
    current pointer. The diff IS the proof artifact: exactly the
    deleted keys, each 'removed', nothing added or changed — which is
    what the pure-SQL oracle states directly."""
    import shutil
    import tempfile

    from pg_parquet_spark.session import table
    from pg_parquet_spark.sources.layout import (
        delete_where,
        publish_snapshot,
        snapshot_diff,
    )

    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    path = os.path.join(tempfile.gettempdir(), "pgpq_delete_lifecycle")
    shutil.rmtree(path, ignore_errors=True)
    publish_snapshot(spark, path, cust)  # v1
    delete_where(spark, path, "c_acctbal < 0")  # v2 via atomic flip
    return snapshot_diff(spark, path, ["c_custkey"], from_version=1)


Q_IO_DELETE_LIFECYCLE_ORACLE = """
SELECT c_custkey, 'removed' AS change
FROM customer WHERE c_acctbal < 0
ORDER BY c_custkey
"""


QUERIES = {
    "q_io_versioned_maintenance": q_io_versioned_maintenance,
    "q_io_delete_lifecycle": q_io_delete_lifecycle,
    "q_scd2_merge": q_scd2_merge,
    "q_io_http_read": q_io_http_read,
    "q_io_glob_read": q_io_glob_read,
    "q_io_csv_roundtrip": q_io_csv_roundtrip,
    "q_io_json_roundtrip": q_io_json_roundtrip,
    "q_io_partitioned_roundtrip": q_io_partitioned_roundtrip,
    "q_io_zorder_read": q_io_zorder_read,
    "q_io_bloom_read": q_io_bloom_read,
    "q_io_merge_upsert": q_io_merge_upsert,
    "q_io_time_travel": q_io_time_travel,
    "q_io_compact_partitions": q_io_compact_partitions,
    "q_io_schema_evolution": q_io_schema_evolution,
    "q_io_copy_from_table": q_io_copy_from_table,
    "q_io_geo_roundtrip": q_io_geo_roundtrip,
    "q_io_match_position": q_io_match_position,
    "q_io_coercion_read": q_io_coercion_read,
    "q_io_where_filter": q_io_where_filter,
    "q_io_file_metadata": q_io_file_metadata,
    "q_io_column_stats": q_io_column_stats,
    "q_io_schema": q_io_schema,
    "q_io_list": q_io_list,
}

ORACLES = {
    "q_io_versioned_maintenance": Q_IO_VERSIONED_MAINTENANCE_ORACLE,
    "q_io_delete_lifecycle": Q_IO_DELETE_LIFECYCLE_ORACLE,
    "q_scd2_merge": _scd2_oracle(),
    "q_io_http_read": Q_IO_HTTP_ORACLE,
    "q_io_glob_read": Q_IO_GLOB_ORACLE,
    "q_io_csv_roundtrip": Q_IO_CSV_ORACLE,
    "q_io_json_roundtrip": Q_IO_JSON_ORACLE,
    "q_io_partitioned_roundtrip": Q_IO_PARTITIONED_ORACLE,
    "q_io_zorder_read": Q_IO_ZORDER_ORACLE,
    "q_io_bloom_read": Q_IO_BLOOM_ORACLE,
    "q_io_merge_upsert": Q_IO_MERGE_UPSERT_ORACLE,
    "q_io_time_travel": Q_IO_TIME_TRAVEL_ORACLE,
    "q_io_compact_partitions": Q_IO_COMPACT_PARTITIONS_ORACLE,
    "q_io_schema_evolution": Q_IO_SCHEMA_EVOLUTION_ORACLE,
    "q_io_copy_from_table": Q_IO_COPY_FROM_TABLE_ORACLE,
    "q_io_geo_roundtrip": _geo_oracle(),
    "q_io_match_position": Q_IO_MATCH_POSITION_ORACLE,
    "q_io_coercion_read": Q_IO_COERCION_ORACLE,
    "q_io_where_filter": Q_IO_WHERE_ORACLE,
    "q_io_file_metadata": Q_IO_FILE_METADATA_ORACLE,
    "q_io_column_stats": Q_IO_COLUMN_STATS_ORACLE,
    "q_io_schema": Q_IO_SCHEMA_ORACLE,
    "q_io_list": Q_IO_LIST_ORACLE,
}
