"""Distribution-drift monitoring between two dataset snapshots:
Population Stability Index (PSI), the standard production check that a
new data batch still looks like the reference the model/filters were
tuned on — per-category contributions plus the folded index.

PSI = Σ_buckets (p_b − q_b)·ln(p_b / q_b), p = new, q = reference,
with add-one smoothing over the union of observed categories so a
category present on only one side contributes a finite, loud term
(rule of thumb: PSI < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted).

Determinism contract (the unigram-LM / DSIR lesson): the ln ratio is
quantized to integer micro-nats PER BUCKET (one float expression, then
floor·1e6+0.5), the probabilities are exact ppm integers via positive-
integer division, and the PSI fold is a plain integer sum of
(p_ppm − q_ppm)·lr_micro products — so the per-bucket table AND the
folded index replicate in DuckDB bit-for-bit at any partitioning.
Units: term ≈ contribution · 10¹² ("pico-PSI"); psi ≈ Σterm / 10¹².

Scale shape: two category-keyed counts with map-side combine (shuffle =
category cardinality), one category-keyed join of two count tables,
totals collected as exact-int scalars. Numeric columns route through
``bucketize`` — a comparison-only literal edge chain (no float
arithmetic), so the same machinery covers continuous features.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PPM = 1_000_000


def bucketize(col: Column, edges: list[float]) -> Column:
    """Label a numeric column into len(edges)+1 buckets by literal
    edges — comparisons only, so doubles never enter arithmetic and
    both engines label identically. Bucket i = value in
    (edges[i-1], edges[i]]; label strings sort in bucket order."""
    out = F.when(col <= F.lit(edges[0]), F.lit("b00"))
    for i in range(1, len(edges)):
        out = out.when(col <= F.lit(edges[i]), F.lit(f"b{i:02d}"))
    return out.otherwise(F.lit(f"b{len(edges):02d}"))


def bucketize_sql(expr: str, edges: list[float]) -> str:
    parts = [f"WHEN {expr} <= {edges[0]!r} THEN 'b00'"]
    parts += [
        f"WHEN {expr} <= {edges[i]!r} THEN 'b{i:02d}'"
        for i in range(1, len(edges))
    ]
    return (
        "CASE " + " ".join(parts) + f" ELSE 'b{len(edges):02d}' END"
    )


def psi_table(
    ref: DataFrame, new: DataFrame, cat: Column, alias: str = "category"
) -> DataFrame:
    """Per-category drift table over the union of observed categories:
    (category, c_ref, c_new, q_ppm, p_ppm, lr_micro, term), ordered.
    ``cat`` is any categorical expression (a column, or ``bucketize``
    over a numeric one) evaluated against BOTH frames."""
    rc = ref.select(cat.alias(alias)).groupBy(alias).agg(
        F.count("*").cast("long").alias("c_ref")
    )
    nc = new.select(cat.alias(alias)).groupBy(alias).agg(
        F.count("*").cast("long").alias("c_new")
    )
    cats = rc.select(alias).unionByName(nc.select(alias)).distinct()
    n_ref = ref.count()
    n_new = new.count()
    n_cats = cats.count()
    dr = n_ref + n_cats
    dn = n_new + n_cats
    j = (
        cats.join(rc, alias, "left")
        .join(nc, alias, "left")
        .select(
            alias,
            F.coalesce("c_ref", F.lit(0)).cast("long").alias("c_ref"),
            F.coalesce("c_new", F.lit(0)).cast("long").alias("c_new"),
        )
    )
    lr = (
        F.log(F.col("c_new") + 1)
        - F.log(F.lit(float(dn)))
        - F.log(F.col("c_ref") + 1)
        + F.log(F.lit(float(dr)))
    )
    return (
        j.withColumn("q_ppm", F.expr(f"((c_ref + 1) * {_PPM}) div {dr}"))
        .withColumn("p_ppm", F.expr(f"((c_new + 1) * {_PPM}) div {dn}"))
        .withColumn(
            "lr_micro", F.floor(lr * _PPM + F.lit(0.5)).cast("long")
        )
        .withColumn(
            "term", (F.col("p_ppm") - F.col("q_ppm")) * F.col("lr_micro")
        )
        .orderBy(alias)
    )


def psi_total(table: DataFrame) -> int:
    """Fold the drift table to the index in pico-PSI units (divide by
    1e12 for the classic scale)."""
    return table.agg(F.sum("term")).first()[0]


def psi_oracle_sql(
    ref_sql: str, new_sql: str, cat_expr: str, alias: str = "category"
) -> str:
    """DuckDB replica of psi_table: identical smoothing, identical
    single-float-expression ln ratio, identical integer quantization."""
    return f"""
WITH refq AS ({ref_sql}), newq AS ({new_sql}),
rc AS (SELECT {cat_expr} AS {alias}, COUNT(*) AS c_ref FROM refq GROUP BY 1),
nc AS (SELECT {cat_expr} AS {alias}, COUNT(*) AS c_new FROM newq GROUP BY 1),
cats AS (SELECT {alias} FROM rc UNION SELECT {alias} FROM nc),
tot AS (
  SELECT (SELECT COUNT(*) FROM refq) + (SELECT COUNT(*) FROM cats) AS dr,
         (SELECT COUNT(*) FROM newq) + (SELECT COUNT(*) FROM cats) AS dn
),
j AS (
  SELECT c.{alias},
         COALESCE(rc.c_ref, 0) AS c_ref,
         COALESCE(nc.c_new, 0) AS c_new
  FROM cats c LEFT JOIN rc USING ({alias}) LEFT JOIN nc USING ({alias})
)
SELECT {alias}, CAST(c_ref AS BIGINT) AS c_ref, CAST(c_new AS BIGINT) AS c_new,
  CAST(((c_ref + 1) * {_PPM}) // dr AS BIGINT) AS q_ppm,
  CAST(((c_new + 1) * {_PPM}) // dn AS BIGINT) AS p_ppm,
  CAST(FLOOR((ln(c_new + 1) - ln(CAST(dn AS DOUBLE)) - ln(c_ref + 1)
              + ln(CAST(dr AS DOUBLE))) * {_PPM} + 0.5) AS BIGINT) AS lr_micro,
  CAST((((c_new + 1) * {_PPM}) // dn - ((c_ref + 1) * {_PPM}) // dr)
       * CAST(FLOOR((ln(c_new + 1) - ln(CAST(dn AS DOUBLE))
                     - ln(c_ref + 1) + ln(CAST(dr AS DOUBLE))) * {_PPM} + 0.5)
              AS BIGINT) AS BIGINT) AS term
FROM j CROSS JOIN tot
ORDER BY {alias}
"""
