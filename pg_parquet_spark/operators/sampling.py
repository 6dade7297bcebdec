"""Deterministic data-selection operators for training pipelines
(beyond-reference surface): hash-based sampling, per-domain mixture
weighting, and column profiling.

All selection is content-hash-driven (md5), never RNG — so samples are
reproducible across runs, engines, and cluster sizes (the property that
makes a 100 TB data recipe auditable), and every operator here is
DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: md5-prefix bucket space: first 6 hex chars → uniform int in [0, 2^24)
_BUCKETS = 1 << 24


def hash_fraction(col: Column) -> Column:
    """Deterministic uniform fraction in [0,1) from a key column."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 6), 16, 10).cast("long")
        / F.lit(float(_BUCKETS))
    )


def sample_deterministic(df: DataFrame, key_col: str, rate: float) -> DataFrame:
    """Keep ~``rate`` of rows, chosen by content hash of ``key_col`` —
    stable under reruns/repartitioning (unlike ``df.sample``)."""
    return df.filter(hash_fraction(F.col(key_col)) < rate)


def domain_mixture(
    df: DataFrame, domain_col: str, key_col: str, rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-domain sampling rates (the "data mixing" step of corpus
    construction): e.g. keep 100% of src0, 25% of src1. Deterministic via
    content hash; domains absent from ``rates`` get ``default_rate``."""
    rate_expr: Column = F.lit(default_rate)
    for domain, rate in sorted(rates.items()):
        rate_expr = F.when(F.col(domain_col) == domain, F.lit(rate)).otherwise(rate_expr)
    return df.filter(hash_fraction(F.col(key_col)) < rate_expr)


def profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column data-quality profile: rows, nulls, distincts, min/max
    (rendered as strings for a uniform schema). One aggregation pass per
    column batched into a single job via a stacked select + union."""
    columns = columns or df.columns
    parts = []
    for c in columns:
        parts.append(
            df.agg(
                F.lit(c).alias("column_name"),
                F.count(F.lit(1)).alias("n_rows"),
                (F.count(F.lit(1)) - F.count(c)).alias("n_nulls"),
                F.countDistinct(c).alias("n_distinct"),
                F.min(c).cast("string").alias("min_value"),
                F.max(c).cast("string").alias("max_value"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
