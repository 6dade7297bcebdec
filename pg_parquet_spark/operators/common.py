"""Shared operator helpers (r15 — ADVICE r14: one spread guard, not
four inline copies)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_if_narrow(df: DataFrame, key: str) -> DataFrame:
    """Hash-spread a CPU-dense projection's input over the cluster when
    (and only when) the scan is narrower than the cluster (guide §2.2):
    the local one-row-group fixtures scan as 1 task, so a heavy per-row
    projection would run on 1 of 32 cores; a many-file 100 TB input is
    already parallel and takes no extra exchange. Hash on the key,
    never round-robin (SPARK-23207: keyless repartition(n) pays a local
    input sort). Only worth it where the per-row work dominates the
    exchange — measured per call site."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par, key)
    return df


def bq(name: str) -> str:
    """Backtick-quote an identifier for interpolation into parsed SQL,
    escaping embedded backticks per Spark's own quoting rule
    (ADVICE r14)."""
    return "`" + name.replace("`", "``") + "`"
