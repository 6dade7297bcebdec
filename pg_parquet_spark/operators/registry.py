"""Central registry merging every query group the engine implements.

The driver's correctness gate iterates this (via __spark_entry__).
Groups register themselves here so adding an operator module doesn't
touch the entry file.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def all_queries() -> dict[str, QueryFn]:
    from pg_parquet_spark.operators import queries as core

    out: dict[str, QueryFn] = {}
    out.update(core.QUERIES)
    for loader in _OPTIONAL:
        try:
            q, _ = loader()
            out.update(q)
        except ImportError:
            continue
    return out


def all_oracles() -> dict[str, str]:
    from pg_parquet_spark.operators import queries as core

    out: dict[str, str] = {}
    out.update(core.ORACLES)
    for loader in _OPTIONAL:
        try:
            _, o = loader()
            out.update(o)
        except ImportError:
            continue
    return out


def _load_io():
    from pg_parquet_spark.operators import io_queries

    return io_queries.QUERIES, io_queries.ORACLES


def _load_pipeline():
    from pg_parquet_spark.operators import pipeline_queries

    return pipeline_queries.QUERIES, pipeline_queries.ORACLES


def _load_advanced():
    from pg_parquet_spark.operators import advanced_queries

    return advanced_queries.QUERIES, advanced_queries.ORACLES


_OPTIONAL = [_load_io, _load_pipeline, _load_advanced]
