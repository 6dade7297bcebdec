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
