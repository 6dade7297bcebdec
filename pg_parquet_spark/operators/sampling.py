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


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 512,
    buckets: int = 32,
) -> DataFrame:
    """Assign documents to fixed-token-budget packs (greedy cumulative
    packing) — the sequence-packing step that turns a deduped corpus
    into dense training batches. Documents are first spread over
    ``buckets`` by content hash (each bucket packs independently and in
    parallel — at 100 TB buckets ≈ executor count × k), then packed in
    doc-id order by a running token cumsum: a document's pack is
    ``floor(tokens_before / max_tokens)``.

    Fully deterministic (content-hash bucketing + id ordering + window
    cumsum — no RNG, no partition dependence) and pure window SQL, so it
    replicates in the DuckDB oracle. Over-length documents simply span
    a pack boundary (truncation is the tokenizer's job downstream).
    Returns (id, bucket, pack_id, n_tokens).
    """
    from pyspark.sql import Window

    n_tokens = F.size(F.split(F.lower(F.col(text_col)), " ")).cast("long")
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 6), 16, 10)
        .cast("long")
        % buckets
    ).cast("int")
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.select(
            F.col(id_col), bucket.alias("bucket"), n_tokens.alias("n_tokens")
        )
        .withColumn("_cum", F.sum("n_tokens").over(w))
        .select(
            id_col,
            "bucket",
            F.floor((F.col("_cum") - F.col("n_tokens")) / max_tokens).alias(
                "pack_id"
            ),
            "n_tokens",
        )
    )


def pack_sequences_oracle_sql(
    max_tokens: int = 512,
    buckets: int = 32,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB replica: identical md5 bucketing, id-ordered running sum,
    identical floor((cum - n) / max_tokens) pack assignment."""
    return f"""
WITH t AS (
  SELECT {id_col},
    CAST(CAST(CONCAT('0x', substr(md5(CAST({id_col} AS VARCHAR)), 1, 6)) AS BIGINT)
      % {buckets} AS INT) AS bucket,
    CAST(len(string_split(lower({text_col}), ' ')) AS BIGINT) AS n_tokens
  FROM {table}
)
SELECT {id_col}, bucket,
  CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY {id_col}
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
    / {max_tokens}) AS BIGINT) AS pack_id,
  n_tokens
FROM t ORDER BY {id_col}
"""


def profile_approx(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Sketch-based column profile — the 100 TB variant of ``profile``:
    ``approx_count_distinct`` (HyperLogLog++, default 5% rsd) instead
    of an exact distinct (whose shuffle is proportional to cardinality),
    and ``percentile_approx`` medians for numeric columns. One
    aggregation pass; every sketch is mergeable, so partial aggregates
    combine map-side and the shuffle is O(sketch size × columns),
    independent of row count.

    Sketch outputs are engine-specific (no DuckDB oracle row —
    tests/test_scale_ops.py bounds the error against the exact profile
    instead)."""
    import pyspark.sql.types as T

    columns = columns or df.columns
    numeric = {
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, T.NumericType)
    }
    parts = []
    for c in columns:
        median = (
            F.percentile_approx(c, 0.5).cast("double")
            if c in numeric
            else F.lit(None).cast("double")
        )
        parts.append(
            df.agg(
                F.lit(c).alias("column_name"),
                F.count(F.lit(1)).alias("n_rows"),
                (F.count(F.lit(1)) - F.count(c)).alias("n_nulls"),
                F.approx_count_distinct(c).alias("approx_distinct"),
                median.alias("approx_median"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def cap_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    max_per_group: int,
) -> DataFrame:
    """Cap each group at ``max_per_group`` rows (downsample
    overrepresented sources/domains — the corpus-recipe step after
    mixture weighting). Selection order inside a group is the content
    hash of ``key_col`` (ties broken by the key), so the kept set is
    deterministic across runs, engines, and cluster sizes — never
    "first N encountered", which is partition-order-dependent.

    One window shuffle on the group column; at 100 TB a skewed group is
    the classic hot key — pre-filter with ``sample_deterministic`` to
    approach the cap before the exact window pass."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        hash_fraction(F.col(key_col)), F.col(key_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_per_group)
        .drop("_rn")
    )


def cap_per_group_oracle_sql(
    group_col: str, key_col: str, max_per_group: int, table: str = "documents"
) -> str:
    """DuckDB replica: identical md5-prefix hash order and tie-break."""
    frac = (
        f"CAST(CAST(CONCAT('0x', substr(md5(CAST({key_col} AS VARCHAR)), 1, 6)) "
        f"AS BIGINT) AS DOUBLE) / {float(_BUCKETS)}"
    )
    return f"""
SELECT * EXCLUDE (_rn) FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY {group_col} ORDER BY {frac}, {key_col}) AS _rn
  FROM {table}
) WHERE _rn <= {max_per_group}
"""
