"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query (smoke, sf0.001)
queries()      — every implemented operator from SURVEY.md §2
oracle_sql()   — matching DuckDB ANSI SQL per query (correctness gate)
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H-Q1-style pricing summary, routed through the
    engine's own Parquet sink+scan (SURVEY.md A1/A2) to exercise the full
    COPY TO → COPY FROM surface end-to-end."""
    from pg_parquet_spark.operators.queries import q1_pricing_summary
    from pg_parquet_spark.sources import read_parquet, write_parquet

    sf_dir = "/root/testdata/sf0.001"
    result = q1_pricing_summary(spark, sf_dir)

    out = os.path.join(tempfile.gettempdir(), "pgpq_flagship.parquet")
    write_parquet(result, out)
    return read_parquet(spark, out)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pg_parquet_spark.operators.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from pg_parquet_spark.operators.registry import all_oracles

    return all_oracles()


def queries_extended() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Second certification tier (VERDICT r9 #3): the FULL oracle-backed
    surface including retired gates — retirement leaves the driver's
    50-gate window, never the oracle contract. A driver that wants to
    certify beyond the window can iterate this; locally,
    tools/local_gate_sweep.py runs it at both SFs each round and emits
    CORRECTNESS_LOCAL_r{N}.json in the driver's row format."""
    from pg_parquet_spark.operators.registry import all_queries

    return all_queries(include_retired=True)


def oracle_sql_extended() -> dict[str, str]:
    from pg_parquet_spark.operators.registry import all_oracles

    return all_oracles(include_retired=True)
