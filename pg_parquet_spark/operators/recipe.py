"""Composed corpus-curation recipe (r10): the end-to-end pass a
training-data team actually runs, assembled from this package's proven
pieces — extraction → length bounds → near-dup grouping → leakage-safe
split — with ONE DuckDB oracle chaining the same stages, so the
COMPOSITION is oracle-certified, not just the parts.

Scale shape is the sum of its parts, all previously measured: the
extraction and token count are codegen projections over one scan; the
fingerprint groupBy shuffles 16-byte keys; the split is a projection.
Raw text is read once and never shuffles. At 100 TB each stage's
evidence is in SCALE.md under its own operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pg_parquet_spark.operators.text import strip_html, strip_html_sql


def curate_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    valid_ppm: int = 100_000,
) -> DataFrame:
    """Curate a raw (possibly HTML) corpus into a training table:

    1. **extract** — :func:`text.strip_html` (markup → clean text);
    2. **bound** — drop documents outside [min_tokens, max_tokens]
       (the cheap C4/Gopher length gate);
    3. **group** — normalized-fingerprint near-dup groups with the
       smallest id as canonical (the dedup_normalized equivalence);
    4. **split** — group-granular train/valid assignment (the
       leakage_safe_split hash), so near-dups never straddle.

    Returns (id, n_tokens, group_id, is_canonical, split), ordered by
    id — one row per surviving document. Downstream: train set =
    ``is_canonical AND split = 'train'``; the non-canonical rows are
    retained so the drop decisions stay auditable (the SemDeDup
    keep-column convention)."""
    from pg_parquet_spark.operators.sampling import split_by_group
    from pg_parquet_spark.operators.text import normalized_fingerprint

    clean = df.select(
        F.col(id_col), strip_html(F.col(text_col)).alias("_ctext")
    )
    tok = clean.select(
        id_col,
        "_ctext",
        F.size(F.split(F.lower(F.col("_ctext")), " ")).cast("long").alias(
            "n_tokens"
        ),
    ).filter(
        (F.col("n_tokens") >= min_tokens) & (F.col("n_tokens") <= max_tokens)
    )
    fp = tok.select(
        id_col,
        "n_tokens",
        normalized_fingerprint(F.col("_ctext")).alias("_fp"),
    )
    canon = fp.groupBy("_fp").agg(F.min(id_col).alias("group_id"))
    joined = fp.join(canon, "_fp").select(
        id_col,
        "n_tokens",
        "group_id",
        (F.col(id_col) == F.col("group_id")).alias("is_canonical"),
    )
    return (
        split_by_group(joined, "group_id", valid_ppm)
        .select(id_col, "n_tokens", "group_id", "is_canonical", "split")
        .orderBy(id_col)
    )


def curate_oracle_sql(
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    valid_ppm: int = 100_000,
    table: str = "documents",
) -> str:
    """DuckDB replica chaining the same four stages: the shared
    strip_html pattern chain, the same token bound, the
    q_dedup_normalized fingerprint, the md5-prefix group split."""
    clean = strip_html_sql(text_col)
    fp = (
        "md5(array_to_string(list_sort(list_distinct("
        "string_split(lower(_ctext), ' '))), ' '))"
    )
    return f"""
WITH clean AS (
  SELECT {id_col}, {clean} AS _ctext FROM {table}
), tok AS (
  SELECT {id_col}, _ctext,
         CAST(len(string_split(lower(_ctext), ' ')) AS BIGINT) AS n_tokens
  FROM clean
  WHERE len(string_split(lower(_ctext), ' ')) BETWEEN {min_tokens} AND {max_tokens}
), fp AS (
  SELECT {id_col}, n_tokens, {fp} AS _fp FROM tok
), canon AS (
  SELECT _fp, MIN({id_col}) AS group_id FROM fp GROUP BY 1
)
SELECT fp.{id_col}, fp.n_tokens, canon.group_id,
       fp.{id_col} = canon.group_id AS is_canonical,
       CASE WHEN (CAST(CONCAT('0x', substr(md5(CAST(canon.group_id AS VARCHAR)), 1, 6))
                 AS BIGINT) * 1000000) >> 24 < {valid_ppm}
            THEN 'valid' ELSE 'train' END AS split
FROM fp JOIN canon USING (_fp)
ORDER BY fp.{id_col}
"""


def corpus_datacard(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """One-row corpus DATA CARD — the summary table a dataset release
    ships (Gebru et al. 2021 datasheets): document and exact token
    counts, source diversity, and the normalized near-duplicate rate,
    in one pass plus one 16-byte-key aggregate. All cross-row math is
    exact integers (counts and integer token sums), so the card
    replicates bit-for-bit in the oracle and is stable across
    partitionings — an auditable artifact, not a sample estimate.

    dup_ratio_ppm = 10⁶ · (n_docs − n_normalized_groups) / n_docs,
    integer division — the fraction of documents that are a normalized
    near-duplicate of an earlier one."""
    from pg_parquet_spark.operators.text import (
        normalized_fingerprint,
        token_count,
    )

    base = df.select(
        F.col(id_col),
        F.col(source_col),
        token_count(F.col(text_col)).alias("_nt"),
        normalized_fingerprint(F.col(text_col)).alias("_fp"),
    )
    return base.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_nt").cast("long").alias("total_tokens"),
        F.min("_nt").cast("long").alias("min_tokens"),
        F.max("_nt").cast("long").alias("max_tokens"),
        F.countDistinct(source_col).cast("long").alias("n_sources"),
        F.countDistinct("_fp").cast("long").alias("n_unique_normalized"),
    ).select(
        "n_docs",
        "total_tokens",
        F.expr("total_tokens div n_docs").cast("long").alias("mean_tokens"),
        "min_tokens",
        "max_tokens",
        "n_sources",
        "n_unique_normalized",
        F.expr("(n_docs - n_unique_normalized) * 1000000 div n_docs")
        .cast("long")
        .alias("dup_ratio_ppm"),
    )


def datacard_oracle_sql(
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    table: str = "documents",
) -> str:
    """DuckDB replica: identical token/fingerprint staging, identical
    integer derivations."""
    fp = (
        f"md5(array_to_string(list_sort(list_distinct("
        f"string_split(lower({text_col}), ' '))), ' '))"
    )
    return f"""
WITH base AS (
  SELECT {id_col}, {source_col},
         CAST(len(string_split(lower({text_col}), ' ')) AS BIGINT) AS _nt,
         {fp} AS _fp
  FROM {table}
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(_nt) AS BIGINT) AS total_tokens,
         CAST(MIN(_nt) AS BIGINT) AS min_tokens,
         CAST(MAX(_nt) AS BIGINT) AS max_tokens,
         CAST(COUNT(DISTINCT {source_col}) AS BIGINT) AS n_sources,
         CAST(COUNT(DISTINCT _fp) AS BIGINT) AS n_unique_normalized
  FROM base
)
SELECT n_docs, total_tokens,
       CAST(total_tokens // n_docs AS BIGINT) AS mean_tokens,
       min_tokens, max_tokens, n_sources, n_unique_normalized,
       CAST((n_docs - n_unique_normalized) * 1000000 // n_docs AS BIGINT)
         AS dup_ratio_ppm
FROM agg
"""
