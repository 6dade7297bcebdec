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

#: self-cleaning cache registry (the dedup module's convention): the
#: tiny count frames psi_from_counts persists for its single-pass
#: contract live here. Trimmed FIFO past _CACHE_KEEP handles (ADVICE
#: r11: a report composing several monitors BEFORE collecting any of
#: them must not have monitor k+1 unpersist monitor k's still-lazy
#: count frames — an entry-time release-all did exactly that, silently
#: re-running each corpus-sized upstream at collect time; results were
#: correct, the single-pass contract wasn't). Each psi call registers
#: ≤3 frames of ≤n_cats rows, so the bound keeps the last ~8 monitors'
#: results cache-backed while still guaranteeing no unbounded leak.
#: release_cached() still frees everything eagerly — call it after the
#: report is materialized.
_CACHED_FRAMES: list[DataFrame] = []
_CACHE_KEEP = 24


def release_cached() -> None:
    while _CACHED_FRAMES:
        _CACHED_FRAMES.pop().unpersist()


def _trim_cache() -> None:
    while len(_CACHED_FRAMES) > _CACHE_KEEP:
        _CACHED_FRAMES.pop(0).unpersist()


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


def category_counts(
    df: DataFrame, cat: Column, alias: str = "category"
) -> DataFrame:
    """(category, n): the mergeable drift state — PSI needs nothing
    else, and counts merge by SUM, so a STREAM can maintain them via
    ``stream.drain_with_count_refresh`` and drift is then computable
    against any frozen reference without rescanning either side."""
    return df.select(cat.alias(alias)).groupBy(alias).agg(
        F.count("*").cast("long").alias("n")
    )


def psi_from_counts(
    ref_counts: DataFrame, new_counts: DataFrame, alias: str = "category"
) -> DataFrame:
    """The PSI table computed from two (category, n) count tables
    (:func:`category_counts` output — e.g. one frozen reference and one
    continuously stream-maintained). Same smoothing/quantization as
    :func:`psi_table`; row totals derive from the counts (Σn ≡ the raw
    row count, since every row lands in exactly one category).

    NULL is a REAL category (ADVICE r9): the category spine joins
    null-safely (eqNullSafe / IS NOT DISTINCT FROM in the oracle), so a
    NULL-bearing categorical column contributes its own row instead of
    silently reading as 0 on both sides while still inflating the
    totals — which skewed every other category's q/p and was oracle-
    invisible because the old oracle shared the null-unsafe join.

    SINGLE-PASS (VERDICT r10 "What's wrong" #2): the two count frames
    are persisted before any scalar action, so each corpus-sized
    upstream (text_psi's token explode, embedding_psi's cell
    assignment) evaluates exactly ONCE — previously the three driver
    actions (Σc_ref, Σc_new, n_cats) re-ran it three times. The tiny
    (≤ n_cats-row) caches stay registered in the module's
    self-cleaning list (the dedup convention), trimmed FIFO past
    _CACHE_KEEP handles — NOT released wholesale at entry, so a
    report can compose several monitors and collect afterwards
    without monitor k+1 evicting monitor k's still-uncollected
    frames (ADVICE r11); :func:`release_cached` frees everything
    eagerly once the report is materialized."""
    _trim_cache()
    rc = ref_counts.select(
        F.col(alias).alias("_cat_r"), F.col("n").cast("long").alias("c_ref")
    ).persist()
    nc = new_counts.select(
        F.col(alias).alias("_cat_n"), F.col("n").cast("long").alias("c_new")
    ).persist()
    _CACHED_FRAMES.extend([rc, nc])
    cats = (
        rc.select(F.col("_cat_r").alias(alias))
        .unionByName(nc.select(F.col("_cat_n").alias(alias)))
        .distinct()
    )
    n_ref = rc.agg(F.sum("c_ref")).first()[0] or 0  # materializes rc
    n_new = nc.agg(F.sum("c_new")).first()[0] or 0  # materializes nc
    n_cats = cats.count()  # reads both caches
    dr = n_ref + n_cats
    dn = n_new + n_cats
    j = (
        cats.join(rc, F.col(alias).eqNullSafe(F.col("_cat_r")), "left")
        .join(nc, F.col(alias).eqNullSafe(F.col("_cat_n")), "left")
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


def _psi_from_tagged(tagged: DataFrame, alias: str = "category") -> DataFrame:
    """PSI from one side-tagged category stream (columns: _side ∈
    {'r','n'}, *alias*): a single (side, category) count job evaluates
    both corpora in ONE pass — the composed monitors' upstream
    (token explode, cell assignment) is in the plan exactly once. The
    tiny tagged-count frame is persisted so psi_from_counts' scalar
    actions read it instead of re-running the job; it is freed by the
    registry's FIFO trim (or an explicit release_cached()) along with
    the per-side count caches."""
    counts = (
        tagged.groupBy("_side", alias)
        .agg(F.count("*").cast("long").alias("n"))
        .persist()
    )
    out = psi_from_counts(
        counts.filter(F.col("_side") == "r").select(alias, "n"),
        counts.filter(F.col("_side") == "n").select(alias, "n"),
        alias,
    )
    _CACHED_FRAMES.append(counts)
    return out


def psi_table(
    ref: DataFrame, new: DataFrame, cat: Column, alias: str = "category"
) -> DataFrame:
    """Per-category drift table over the union of observed categories:
    (category, c_ref, c_new, q_ppm, p_ppm, lr_micro, term), ordered.
    ``cat`` is any categorical expression (a column, or ``bucketize``
    over a numeric one) evaluated against BOTH frames."""
    return psi_from_counts(
        category_counts(ref, cat, alias),
        category_counts(new, cat, alias),
        alias,
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
  FROM cats c
  LEFT JOIN rc ON c.{alias} IS NOT DISTINCT FROM rc.{alias}
  LEFT JOIN nc ON c.{alias} IS NOT DISTINCT FROM nc.{alias}
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


# --------------------------------------------------------------------------
# Robust (median/MAD) outlier detection
# --------------------------------------------------------------------------


def robust_outlier_stats(
    df: DataFrame,
    group_col: str | Column = "event_type",
    value_col: str = "value",
    c_x10000: int = 44478,
    unit: int = 1000,
) -> DataFrame:
    """Per-group robust outlier summary via median/MAD — the
    heavy-tail-safe complement to the moment-based z-score
    (q_outlier_zscore): one extreme value shifts a mean/stddev fence
    arbitrarily but moves the median/MAD fence at most one rank step,
    so contaminated groups still get a usable fence.

    Flag: |v − median| > (c_x10000/10⁴)·MAD, default c = 3·1.4826
    (the normal-consistency constant, so "3 robust sigmas").

    Determinism contract: v is integer 1/``unit`` units; medians come
    from ``percentile`` on integers, whose results land on exact
    .0/.5/.25 binary fractions (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont`` bit-identical — the winsorize-proven pairing),
    carried as med×2 / MAD×4 INTEGERS; the flag compare is pure int64
    ((4·dev)·10⁴ > c·(4·MAD)). A constant group has MAD 0 and flags
    every deviating row — the textbook degeneracy, deterministic on
    both engines (no division, unlike the z-score's var==0 guard).

    Output: (grp, n, med_milli_x2, mad_milli_x4, n_outliers). Scale
    shape: two group-keyed exact percentiles + one broadcast of the
    group-stats table back onto the rows; shuffle is group-keyed,
    stats are sketch-sized."""
    gcol = group_col if isinstance(group_col, Column) else F.col(group_col)
    base = df.select(
        gcol.cast("string").alias("grp"),
        F.floor(F.col(value_col).cast("double") * unit + F.lit(0.5))
        .cast("long")
        .alias("v"),
    ).filter(F.col("v").isNotNull())  # NULLs ignored like the medians
    med = base.groupBy("grp").agg(
        (F.percentile("v", F.lit(0.5)) * 2).cast("long").alias("med2"),
        F.count("*").cast("long").alias("n"),
    )
    dev = base.join(F.broadcast(med), "grp").withColumn(
        "dev2", F.abs(F.col("v") * 2 - F.col("med2"))
    )
    mad = dev.groupBy("grp").agg(
        (F.percentile("dev2", F.lit(0.5)) * 2).cast("long").alias("mad4")
    )
    flagged = (
        dev.join(F.broadcast(mad), "grp")
        .withColumn(
            "is_out",
            (F.col("dev2") * 2 * 10000 > F.lit(int(c_x10000)) * F.col("mad4")).cast(
                "long"
            ),
        )
        .groupBy("grp")
        .agg(F.sum("is_out").cast("long").alias("n_outliers"))
    )
    return (
        med.join(mad, "grp")
        .join(flagged, "grp")
        .select("grp", "n", F.col("med2").alias("med_milli_x2"),
                F.col("mad4").alias("mad_milli_x4"), "n_outliers")
        .orderBy("grp")
    )


def robust_outliers(
    df: DataFrame,
    id_col: str = "event_id",
    group_col: str | Column = "event_type",
    value_col: str = "value",
    c_x10000: int = 44478,
    unit: int = 1000,
) -> DataFrame:
    """The flagged ROWS (id, grp, v_milli, dev_milli_x2): same fence as
    :func:`robust_outlier_stats`, returned per offending record for
    quarantine/inspection pipelines."""
    gcol = group_col if isinstance(group_col, Column) else F.col(group_col)
    base = df.select(
        F.col(id_col).alias("id"),
        gcol.cast("string").alias("grp"),
        F.floor(F.col(value_col).cast("double") * unit + F.lit(0.5))
        .cast("long")
        .alias("v_milli"),
    ).filter(F.col("v_milli").isNotNull())
    med = base.groupBy("grp").agg(
        (F.percentile("v_milli", F.lit(0.5)) * 2).cast("long").alias("med2")
    )
    dev = base.join(F.broadcast(med), "grp").withColumn(
        "dev_milli_x2", F.abs(F.col("v_milli") * 2 - F.col("med2"))
    )
    mad = dev.groupBy("grp").agg(
        (F.percentile("dev_milli_x2", F.lit(0.5)) * 2).cast("long").alias("mad4")
    )
    return (
        dev.join(F.broadcast(mad), "grp")
        .filter(F.col("dev_milli_x2") * 2 * 10000 > F.lit(int(c_x10000)) * F.col("mad4"))
        .select("id", "grp", "v_milli", "dev_milli_x2")
        .orderBy("grp", "id")
    )


def robust_outlier_oracle_sql(
    group_col: str = "event_type",
    value_col: str = "value",
    c_x10000: int = 44478,
    unit: int = 1000,
    table: str = "events",
) -> str:
    """DuckDB replica of robust_outlier_stats (quantile_cont ≡ Spark
    percentile on integer inputs; all carried terms integer)."""
    return f"""
WITH base AS (
  SELECT CAST({group_col} AS VARCHAR) AS grp,
         CAST(floor(CAST({value_col} AS DOUBLE) * {unit} + 0.5) AS BIGINT) AS v
  FROM {table}
), med AS (
  SELECT grp, CAST(quantile_cont(v, 0.5) * 2 AS BIGINT) AS med2,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM base WHERE v IS NOT NULL GROUP BY grp
), dev AS (
  SELECT base.grp, abs(v * 2 - med2) AS dev2, med2, n
  FROM base JOIN med USING (grp) WHERE v IS NOT NULL
), mad AS (
  SELECT grp, CAST(quantile_cont(dev2, 0.5) * 2 AS BIGINT) AS mad4
  FROM dev GROUP BY grp
), flags AS (
  SELECT dev.grp,
         CAST(SUM(CASE WHEN dev2 * 2 * 10000 > {int(c_x10000)} * mad4
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
  FROM dev JOIN mad USING (grp) GROUP BY dev.grp
)
SELECT med.grp, n, med2 AS med_milli_x2, mad4 AS mad_milli_x4, n_outliers
FROM med JOIN mad USING (grp) JOIN flags USING (grp)
ORDER BY med.grp
"""


# --------------------------------------------------------------------------
# Chi-square association screening
# --------------------------------------------------------------------------


def chi2_cells(
    df: DataFrame, x: Column, y: Column
) -> DataFrame:
    """Per-cell contingency contributions for the chi-square statistic
    between two categorical expressions (feature↔label dependence
    screening — the "is this feature leaking / informative at all"
    data-quality pass).

    Uses the grid-free identity  χ² = N·Σ_observed O²/(r·c) − N : empty
    cells contribute exactly their expectation, which the −N term
    absorbs, so only OBSERVED cells are ever materialized — no
    |x|×|y| cross join, no Expand. Per-cell O²/(r·c) is quantized to
    integer micro-units BEFORE any fold (the PSI/BM25 rule), so sums
    replicate bit-for-bit in DuckDB under any partitioning.

    Returns (x, y, o, term_micro) — term = O²/(r_x·c_y) in micro-units.
    Scale shape: three map-side-combinable counts ((x,y), x, y) and two
    margin joins; margins are category-sized (broadcastable), facts
    shuffle once on the pair key."""
    base = df.select(x.cast("string").alias("x"), y.cast("string").alias("y"))
    cells = base.groupBy("x", "y").agg(F.count("*").cast("long").alias("o"))
    rx = base.groupBy("x").agg(F.count("*").cast("long").alias("r"))
    cy = base.groupBy("y").agg(F.count("*").cast("long").alias("c"))
    return (
        cells.join(F.broadcast(rx), "x")
        .join(F.broadcast(cy), "y")
        .withColumn(
            "term_micro",
            F.floor(
                (F.col("o").cast("double") * F.col("o") /
                 (F.col("r").cast("double") * F.col("c"))) * 1_000_000
                + F.lit(0.5)
            ).cast("long"),
        )
        .select("x", "y", "o", "term_micro")
        .orderBy("x", "y")
    )


def chi2_stat(df: DataFrame, x: Column, y: Column) -> DataFrame:
    """One-row summary: (n, n_x, n_y, dof, chi2_micro) with
    χ²·10⁶ = n·Σ term_micro − n·10⁶ — exact integers end to end after
    the per-cell quantization."""
    cells = chi2_cells(df, x, y)
    agg = cells.agg(
        F.sum("term_micro").cast("long").alias("_t"),
        F.sum("o").cast("long").alias("n"),
        F.countDistinct("x").cast("long").alias("n_x"),
        F.countDistinct("y").cast("long").alias("n_y"),
    )
    return agg.select(
        "n",
        "n_x",
        "n_y",
        ((F.col("n_x") - 1) * (F.col("n_y") - 1)).cast("long").alias("dof"),
        (F.col("n") * F.col("_t") - F.col("n") * F.lit(1_000_000))
        .cast("long")
        .alias("chi2_micro"),
    )


def chi2_oracle_sql(
    x_expr: str, y_expr: str, table: str = "events"
) -> str:
    """DuckDB replica of chi2_stat (identical per-cell micro
    quantization before the integer fold)."""
    return f"""
WITH base AS (
  SELECT CAST({x_expr} AS VARCHAR) AS x, CAST({y_expr} AS VARCHAR) AS y
  FROM {table}
), cells AS (
  SELECT x, y, COUNT(*) AS o FROM base GROUP BY x, y
), rx AS (
  SELECT x, COUNT(*) AS r FROM base GROUP BY x
), cy AS (
  SELECT y, COUNT(*) AS c FROM base GROUP BY y
), terms AS (
  SELECT cells.x, cells.y, o,
         CAST(floor((CAST(o AS DOUBLE) * o /
              (CAST(r AS DOUBLE) * c)) * 1000000 + 0.5) AS BIGINT)
           AS term_micro
  FROM cells JOIN rx USING (x) JOIN cy USING (y)
), agg AS (
  SELECT CAST(SUM(term_micro) AS BIGINT) AS _t,
         CAST(SUM(o) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT x) AS BIGINT) AS n_x,
         CAST(COUNT(DISTINCT y) AS BIGINT) AS n_y
  FROM terms
)
SELECT n, n_x, n_y,
       CAST((n_x - 1) * (n_y - 1) AS BIGINT) AS dof,
       CAST(n * _t - n * 1000000 AS BIGINT) AS chi2_micro
FROM agg
"""


def text_psi(
    ref: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    n_buckets: int = 256,
) -> DataFrame:
    """Corpus-level TEXT drift: PSI over the hashed-unigram bucket
    distribution (the DSIR feature space) — answers "does this week's
    crawl still look like the reference corpus?" with one number, the
    way the categorical PSI answers it for a label column. Pure
    composition: the two sides UNION under a tag before the token
    explode, so one (side, bucket)-keyed count job evaluates both
    corpora in a single pass (VERDICT r10 #2 — the composed monitors
    must not re-run their corpus-sized upstream per driver action);
    the ≤ 2·n_buckets count rows then ride :func:`psi_from_counts`
    unchanged. The text itself never shuffles."""
    from pg_parquet_spark.operators.sampling import _feature_bucket

    def bucketed(df, side):
        toks = F.split(F.lower(F.col(text_col)), " ")
        return (
            df.select(F.explode(toks).alias("_w"))
            .select(
                _feature_bucket(F.col("_w"), n_buckets)
                .cast("string")
                .alias("category")
            )
            .withColumn("_side", F.lit(side))
        )

    return _psi_from_tagged(bucketed(ref, "r").unionByName(bucketed(new, "n")))


def text_psi_oracle_sql(
    ref_where: str,
    new_where: str,
    text_col: str = "text",
    n_buckets: int = 256,
    table: str = "documents",
) -> str:
    """DuckDB replica: the same bucketed-token staging fed to the
    categorical PSI oracle."""
    stage = (
        "SELECT CAST(CAST(CONCAT('0x', substr(md5(w), 1, 6)) AS BIGINT) "
        f"% {n_buckets} AS VARCHAR) AS _b FROM "
        f"(SELECT unnest(string_split(lower({text_col}), ' ')) AS w "
        f"FROM {table} WHERE {{w}})"
    )
    return psi_oracle_sql(
        stage.format(w=ref_where), stage.format(w=new_where), "_b"
    )


def embedding_psi(
    ref: DataFrame,
    new: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """EMBEDDING drift — the third member of the drift triad
    (categorical :func:`psi_table`, text :func:`text_psi`, and this):
    PSI over the frozen-quantizer CELL distribution. The k-means cells
    partition the embedding space, so a shift in where new vectors land
    (new topics, a changed encoder, corrupted embeddings) moves the
    cell histogram even when no single coordinate looks anomalous —
    the cheap monitor that the ANN index's own quantizer gives for
    free. Assignment is the literal-matrix projection (``ivf_assign``)
    over the tag-UNION of both sides, so the unrolled n_cells×dims
    expression is planned, compiled, and evaluated exactly ONCE for the
    whole check (VERDICT r10 #2; at sf0.1 the codegen of that
    expression — not data — dominated the old per-side cost): one
    (side, cell)-keyed count job, then the ≤ 2·n_cells-row PSI join;
    vectors never shuffle."""
    from pg_parquet_spark.operators.similarity import ivf_assign

    combined = (
        ref.select(F.col(vec_col)).withColumn("_side", F.lit("r"))
        .unionByName(new.select(F.col(vec_col)).withColumn("_side", F.lit("n")))
    )
    tagged = ivf_assign(combined, centroids, vec_col).select(
        "_side", F.col("_cell").cast("string").alias("category")
    )
    return _psi_from_tagged(tagged)


def embedding_psi_oracle_sql(
    ref_where: str,
    new_where: str,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    dims: int = 64,
    table: str = "embeddings",
) -> str:
    """DuckDB replica: the same literal-quantizer assignment (unrolled
    sq-dist sums, first-match argmin) fed to the categorical PSI
    oracle."""
    from pg_parquet_spark.operators.similarity import _sq_dist_sql_unrolled

    cdists = "[" + ", ".join(
        _sq_dist_sql_unrolled("e." + vec_col, c, dims) for c in centroids
    ) + "]"
    stage = (
        f"SELECT CAST(CAST(list_position(cds, list_min(cds)) - 1 AS INT) AS VARCHAR) AS _c "
        f"FROM (SELECT {cdists} AS cds FROM {table} e WHERE {{w}})"
    )
    return psi_oracle_sql(
        stage.format(w=ref_where), stage.format(w=new_where), "_c"
    )


# ---------------------------------------------------------------------------
# embedding-space health (r13)

def embedding_health(
    df: DataFrame,
    vec_col: str = "embedding",
    max_dims: int = 1024,
) -> DataFrame:
    """One-row embedding-space health report (r13 — the degenerate-
    encoder detector read before any similarity/dedup pass trusts the
    vectors): corpus size, dimension consistency, zero-norm count,
    mean vector norm, and the *mean resultant ratio*
    ``‖Σv‖ / Σ‖v‖`` — the concentration statistic (→1 when every
    vector points the same way, the anisotropy collapse that makes
    cosine retrieval useless; →0 for isotropic spread).

    Returns (n_vectors, min_dims, max_dims, zero_norm_count,
    avg_norm_micro, resultant_ratio_ppm).

    Determinism contract (the pca_train pattern): components quantize
    to integer micro-units per row, so every cross-row reduction is an
    exact integer sum — partitioning-independent; the only float math
    is per-row sqrt and one driver-side final expression mirrored
    verbatim in the oracle. Budget enforced in-pass: |component| <= 67
    and dims <= ``max_dims`` (1024) keep the per-row Σq² inside int64.

    Scale shape: one projection + one count-sized aggregate over the
    corpus, one dims-sized aggregate (explode to (dim, q) — the narrow
    n·dims shuffle pca_train already pays), driver fold over <= dims
    rows (KB-scale, the bounded-model exemption)."""
    import math

    q = F.transform(
        F.col(vec_col),
        lambda x: F.when(
            F.abs(x.cast("double")) <= F.lit(67.0),
            F.floor(x.cast("double") * 1e6 + F.lit(0.5)).cast("long"),
        ).otherwise(
            F.raise_error(
                F.lit(
                    "embedding_health: |component| > 67 breaks the "
                    "int64 micro-unit budget"
                )
            )
        ),
    )
    dims = F.when(
        F.size(F.col(vec_col)) <= F.lit(max_dims), F.size(F.col(vec_col))
    ).otherwise(
        F.raise_error(
            F.lit(f"embedding_health: dims > {max_dims} budget")
        )
    )
    rows = df.select(dims.alias("_dims"), q.alias("_q")).withColumn(
        "_nsq",
        F.aggregate(
            "_q", F.lit(0).cast("long"), lambda a, v: a + v * v
        ),
    )
    stats = rows.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("_dims").cast("long").alias("mind"),
        F.max("_dims").cast("long").alias("maxd"),
        F.sum(F.when(F.col("_nsq") == 0, 1).otherwise(0))
        .cast("long")
        .alias("zeroes"),
        F.sum(
            F.floor(F.sqrt(F.col("_nsq").cast("double")) + F.lit(0.5))
            .cast("long")
            .cast("decimal(38,0)")
        ).alias("snm"),
    ).collect()[0]
    if stats["n"] == 0:
        raise ValueError("embedding_health on an empty corpus")
    dim_sums = (
        rows.select(F.posexplode("_q").alias("d", "v"))
        .groupBy("d")
        .agg(F.sum(F.col("v").cast("decimal(38,0)")).alias("sd"))
        .collect()
    )
    n, snm = int(stats["n"]), int(stats["snm"])
    ssq = sum(int(r.sd) * int(r.sd) for r in dim_sums)
    ratio_ppm = (
        0
        if snm == 0
        else int(
            math.floor((1000000.0 * math.sqrt(float(ssq))) / float(snm))
        )
    )
    out = [
        (
            n,
            int(stats["mind"]),
            int(stats["maxd"]),
            int(stats["zeroes"]),
            snm // n,
            ratio_ppm,
        )
    ]
    return df.sparkSession.createDataFrame(
        out,
        "n_vectors long, min_dims long, max_dims long, "
        "zero_norm_count long, avg_norm_micro long, "
        "resultant_ratio_ppm long",
    )


def embedding_health_oracle_sql(
    table: str = "embeddings",
    vec_col: str = "embedding",
) -> str:
    """DuckDB replica: identical micro-unit quantization, integer
    norm/zero counts, HUGEINT Σ(Σ_d q)² resultant numerator, and the
    same final double expression."""
    return f"""
WITH qv AS (
  SELECT list_transform({vec_col},
           x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT))
         AS q,
         CAST(len({vec_col}) AS BIGINT) AS dims
  FROM {table}
), rws AS (
  SELECT dims, q,
         list_reduce(list_transform(q, v -> v * v), (a, b) -> a + b)
           AS nsq
  FROM qv
), stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(MIN(dims) AS BIGINT) AS mind,
         CAST(MAX(dims) AS BIGINT) AS maxd,
         CAST(SUM(CASE WHEN nsq = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS zeroes,
         SUM(CAST(floor(sqrt(CAST(nsq AS DOUBLE)) + 0.5) AS BIGINT))
           AS snm
  FROM rws
), ex AS (
  SELECT unnest(q) AS v, generate_subscripts(q, 1) AS d FROM rws
), ds AS (
  SELECT d, SUM(v) AS sd FROM ex GROUP BY d
), s2 AS (
  SELECT SUM(CAST(sd AS HUGEINT) * CAST(sd AS HUGEINT)) AS ssq FROM ds
)
SELECT stats.n AS n_vectors, stats.mind AS min_dims,
       stats.maxd AS max_dims, stats.zeroes AS zero_norm_count,
       CAST(stats.snm // stats.n AS BIGINT) AS avg_norm_micro,
       CAST(CASE WHEN stats.snm = 0 THEN 0
            ELSE floor((1000000.0 * sqrt(CAST(s2.ssq AS DOUBLE)))
                       / CAST(stats.snm AS DOUBLE)) END AS BIGINT)
         AS resultant_ratio_ppm
FROM stats, s2
"""


def woe_iv(
    df: DataFrame,
    feature_col: str = "value",
    label_col: str = "label",
    n_bins: int = 10,
    unit: int = 1000,
) -> DataFrame:
    """Weight-of-Evidence / Information-Value feature screening (r14 —
    the supervised twin of :func:`psi_from_counts`: "does this feature
    separate the binary label?"). The feature folds to integer millis
    and equal-width integer bins from the global (min, max); per bin,
    WOE contrasts the good (label=1) and bad (label=0) shares and the
    IV term weighs the contrast by the share gap. Returns one row per
    OBSERVED bin: (bin, n_good, n_bad, g_ppm, b_ppm, woe_micro,
    iv_term), ordered — Σ iv_term / 1e12 is the feature's IV in nats
    (rule of thumb: < 0.02 useless, > 0.3 strong).

    Determinism is the PSI recipe verbatim: +1 Laplace smoothing with
    the CONFIGURED ``n_bins`` as the smoothing mass (a plan literal —
    no driver action needed, unlike PSI's observed-category count),
    integer ppm shares, the single float log-ratio quantized to
    integer micro-nats per bin, then exact (g_ppm − b_ppm) ×
    woe_micro products. Labels outside {0, 1} FAIL FAST in-pass (the
    okey-guard stance); NULL feature/label rows are dropped in BOTH
    engines.

    Scale shape: one 1-row bounds frame (crossJoin broadcast — the
    bounds-frame house pattern), one (bin)-keyed counts aggregate with
    map-side partials (shuffle volume = bin count), and window totals
    over that ≤ n_bins-row frame. Two data scans total (bounds +
    counts), both pushed projections."""
    from pyspark.sql import Window

    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    lab = F.when(F.col(label_col).isin(0, 1), F.col(label_col).cast("long")).otherwise(
        F.raise_error(
            F.lit(
                f"woe_iv: {label_col} must be a binary 0/1 label — "
                "map or filter other classes upstream"
            )
        ).cast("long")
    )
    base = df.filter(
        F.col(feature_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.floor(F.col(feature_col).cast("double") * unit + F.lit(0.5))
        .cast("long")
        .alias("_v"),
        lab.alias("_l"),
    )
    bounds = base.agg(
        F.min("_v").alias("_lo"), F.max("_v").alias("_hi")
    )
    counts = (
        base.crossJoin(F.broadcast(bounds))
        .select(
            F.least(
                F.lit(n_bins - 1),
                F.expr(f"((_v - _lo) * {int(n_bins)}) div (_hi - _lo + 1)"),
            ).alias("bin"),
            "_l",
        )
        .groupBy("bin")
        .agg(
            F.sum("_l").alias("n_good"),
            (F.count(F.lit(1)) - F.sum("_l")).alias("n_bad"),
        )
    )
    w = Window.partitionBy()
    k = int(n_bins)
    tot = counts.withColumn("_g", F.sum("n_good").over(w)).withColumn(
        "_b", F.sum("n_bad").over(w)
    )
    lr = (
        F.log(F.col("n_good") + 1)
        - F.log(F.col("_g") + k)
        - F.log(F.col("n_bad") + 1)
        + F.log(F.col("_b") + k)
    )
    return (
        tot.withColumn(
            "g_ppm", F.expr(f"((n_good + 1) * {_PPM}) div (_g + {k})")
        )
        .withColumn("b_ppm", F.expr(f"((n_bad + 1) * {_PPM}) div (_b + {k})"))
        .withColumn("woe_micro", F.floor(lr * _PPM + F.lit(0.5)).cast("long"))
        .withColumn(
            "iv_term", (F.col("g_ppm") - F.col("b_ppm")) * F.col("woe_micro")
        )
        .select(
            "bin", "n_good", "n_bad", "g_ppm", "b_ppm", "woe_micro", "iv_term"
        )
        .orderBy("bin")
    )


def woe_iv_oracle_sql(
    feature_expr: str = "value",
    label_expr: str = "label",
    n_bins: int = 10,
    unit: int = 1000,
    table: str = "events",
) -> str:
    """DuckDB replica: same integer-milli fold, equal-width integer
    bins, +n_bins Laplace mass, micro-nat WOE quantization and exact
    integer IV terms."""
    k = int(n_bins)
    return f"""
WITH base AS (
  SELECT CAST(FLOOR(({feature_expr}) * {unit} + 0.5) AS BIGINT) AS v,
         CAST(({label_expr}) AS BIGINT) AS l
  FROM {table}
  WHERE ({feature_expr}) IS NOT NULL AND ({label_expr}) IS NOT NULL
), bounds AS (
  SELECT MIN(v) AS lo, MAX(v) AS hi FROM base
), counts AS (
  SELECT LEAST({k} - 1, ((v - lo) * {k}) // (hi - lo + 1)) AS bin,
         CAST(SUM(l) AS BIGINT) AS n_good,
         CAST(COUNT(*) - SUM(l) AS BIGINT) AS n_bad
  FROM base, bounds GROUP BY 1
), tot AS (
  SELECT bin, n_good, n_bad,
         CAST(SUM(n_good) OVER () AS BIGINT) AS g,
         CAST(SUM(n_bad) OVER () AS BIGINT) AS b
  FROM counts
)
SELECT bin, n_good, n_bad,
  CAST(((n_good + 1) * {_PPM}) // (g + {k}) AS BIGINT) AS g_ppm,
  CAST(((n_bad + 1) * {_PPM}) // (b + {k}) AS BIGINT) AS b_ppm,
  CAST(FLOOR((ln(n_good + 1) - ln(g + {k}) - ln(n_bad + 1) + ln(b + {k}))
             * {_PPM} + 0.5) AS BIGINT) AS woe_micro,
  CAST((((n_good + 1) * {_PPM}) // (g + {k})
        - ((n_bad + 1) * {_PPM}) // (b + {k}))
       * FLOOR((ln(n_good + 1) - ln(g + {k}) - ln(n_bad + 1) + ln(b + {k}))
               * {_PPM} + 0.5) AS BIGINT) AS iv_term
FROM tot ORDER BY bin
"""


def ab_test_report(
    df: DataFrame,
    treat_expr: str = "user_id % 2 = 0",
    value_col: str = "value",
) -> DataFrame:
    """Two-sample A/B experiment readout (r14 — the experimentation
    staple next to the drift monitors): Welch's z over the treatment
    flag, from EXACT decimal moments (the q_outlier_zscore contract —
    cross-row double summation is partitioning-order-dependent, so
    Σv/Σv² fold in DECIMAL and the handful of derived float ops are
    mirrored op-for-op in the oracle). Returns ONE row:
    (n_treat, n_ctrl, mean_treat_micro, mean_ctrl_micro, diff_micro,
    z_micro) — micro values floor-quantized (never ROUND — the
    half-even boundary rule), z NULL when either arm has n < 2 or a
    degenerate variance.

    Scale shape: a single map-side-combinable aggregate over one
    pushed scan — six conditional folds, one output row. Rows with a
    NULL flag or value drop in BOTH engines."""
    flag = F.expr(treat_expr)
    v = F.col(value_col).cast("decimal(18,6)")
    base = df.filter(flag.isNotNull() & F.col(value_col).isNotNull())
    agg = base.agg(
        F.sum(F.when(flag, 1).otherwise(0)).alias("n_t"),
        F.sum(F.when(~flag, 1).otherwise(0)).alias("n_c"),
        F.sum(F.when(flag, v)).alias("s1_t"),
        F.sum(F.when(~flag, v)).alias("s1_c"),
        F.sum(F.when(flag, v * v)).alias("s2_t"),
        F.sum(F.when(~flag, v * v)).alias("s2_c"),
    )
    # NULL-guarded denominators (the cuped_report CSE lesson — codegen
    # may hoist shared subexpressions above their when() guards)
    pos = lambda c: F.when(c > 0, c)  # noqa: E731
    ntd, ncd = F.col("n_t").cast("double"), F.col("n_c").cast("double")
    s1td, s1cd = F.col("s1_t").cast("double"), F.col("s1_c").cast("double")
    s2td, s2cd = F.col("s2_t").cast("double"), F.col("s2_c").cast("double")
    mean_t, mean_c = s1td / pos(ntd), s1cd / pos(ncd)
    var_t = (s2td - s1td * s1td / pos(ntd)) / pos(ntd - F.lit(1.0))
    var_c = (s2cd - s1cd * s1cd / pos(ncd)) / pos(ncd - F.lit(1.0))
    se2 = var_t / pos(ntd) + var_c / pos(ncd)
    z = F.when(
        (F.col("n_t") >= 2) & (F.col("n_c") >= 2) & (se2 > 0),
        (mean_t - mean_c) / F.sqrt(pos(se2)),
    )
    micro = lambda c: F.floor(c * _PPM + F.lit(0.5)).cast("long")  # noqa: E731
    return agg.select(
        F.col("n_t").cast("long").alias("n_treat"),
        F.col("n_c").cast("long").alias("n_ctrl"),
        micro(mean_t).alias("mean_treat_micro"),
        micro(mean_c).alias("mean_ctrl_micro"),
        micro(mean_t - mean_c).alias("diff_micro"),
        micro(z).alias("z_micro"),
    )


def ab_test_oracle_sql(
    treat_expr: str = "user_id % 2 = 0",
    value_col: str = "value",
    table: str = "events",
) -> str:
    """DuckDB replica: same conditional DECIMAL moments, the same
    derived float ops in the same order, same floor quantization."""
    return f"""
WITH base AS (
  SELECT ({treat_expr}) AS f, CAST({value_col} AS DECIMAL(18,6)) AS v
  FROM {table}
  WHERE ({treat_expr}) IS NOT NULL AND {value_col} IS NOT NULL
), m AS (
  SELECT CAST(SUM(CASE WHEN f THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
         CAST(SUM(CASE WHEN NOT f THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
         CAST(SUM(CASE WHEN f THEN v END) AS DOUBLE) AS s1_t,
         CAST(SUM(CASE WHEN NOT f THEN v END) AS DOUBLE) AS s1_c,
         CAST(SUM(CASE WHEN f THEN v * v END) AS DOUBLE) AS s2_t,
         CAST(SUM(CASE WHEN NOT f THEN v * v END) AS DOUBLE) AS s2_c
  FROM base
), d AS (
  SELECT n_t, n_c,
         s1_t / n_t AS mean_t, s1_c / n_c AS mean_c,
         (s2_t - s1_t * s1_t / n_t) / (n_t - 1.0) AS var_t,
         (s2_c - s1_c * s1_c / n_c) / (n_c - 1.0) AS var_c
  FROM m
)
SELECT n_t AS n_treat, n_c AS n_ctrl,
  CAST(FLOOR(mean_t * {_PPM} + 0.5) AS BIGINT) AS mean_treat_micro,
  CAST(FLOOR(mean_c * {_PPM} + 0.5) AS BIGINT) AS mean_ctrl_micro,
  CAST(FLOOR((mean_t - mean_c) * {_PPM} + 0.5) AS BIGINT) AS diff_micro,
  CAST(CASE WHEN n_t >= 2 AND n_c >= 2 AND var_t / n_t + var_c / n_c > 0
       THEN FLOOR((mean_t - mean_c) / sqrt(var_t / n_t + var_c / n_c)
                  * {_PPM} + 0.5)
       END AS BIGINT) AS z_micro
FROM d
"""


def srm_check(
    df: DataFrame,
    treat_expr: str = "user_id % 2 = 0",
    expected_treat_ppm: int = 500_000,
    unit_col: str | None = "user_id",
    threshold_chi2_micro: int = 3_841_459,
) -> DataFrame:
    """Sample-ratio-mismatch guard (r14 — the assignment-integrity
    check every A/B readout should gate on: if the realized traffic
    split doesn't match the configured ratio, the experiment is broken
    upstream and :func:`ab_test_report`'s z is meaningless). One-dof
    χ² against the expected treatment share, over assignment UNITS
    (distinct ``unit_col``, default users — events per user must not
    multiply-count an assignment; pass ``unit_col=None`` for row-level
    assignment). Returns ONE row: (n_treat, n_ctrl,
    expected_treat_ppm, chi2_micro, mismatch).

    Determinism: the counts are exact integers; χ² evaluates in
    doubles mirrored op-for-op (the q_outlier_zscore contract) from
    those exact inputs — ``d = n_t·10⁶ − N·p_ppm`` stays
    float-exact below 2⁵³ (N < ~9·10⁹ assignment units; beyond that
    the ±1-micro boundary caveat applies), then floor-quantized to
    integer micro-units. ``mismatch`` fires above the 1-dof χ² 95th
    percentile by default (3.841459).

    Scale shape: one distinct on the unit column (the only
    data-volume shuffle, one narrow column) + a 1-row conditional
    aggregate."""
    if not (0 < expected_treat_ppm < 1_000_000):
        raise ValueError(
            "expected_treat_ppm must be in (0, 1000000) exclusive, got "
            f"{expected_treat_ppm}"
        )
    flag = F.expr(treat_expr)
    base = df.filter(flag.isNotNull())
    if unit_col is not None:
        base = (
            base.filter(F.col(unit_col).isNotNull())
            .select(F.col(unit_col).alias("_unit"), flag.alias("_f"))
            .distinct()
        )
    else:
        base = base.select(flag.alias("_f"))
    p, q = int(expected_treat_ppm), 1_000_000 - int(expected_treat_ppm)
    agg = base.agg(
        F.sum(F.when(F.col("_f"), 1).otherwise(0)).cast("long").alias("n_t"),
        F.sum(F.when(~F.col("_f"), 1).otherwise(0)).cast("long").alias("n_c"),
    )
    n = (F.col("n_t") + F.col("n_c")).cast("double")
    nz = F.when(n > 0, n)  # NULL-guarded denominator (the CSE lesson)
    d = F.col("n_t").cast("double") * 1_000_000.0 - n * float(p)
    chi2 = d * d / (nz * float(p)) + d * d / (nz * float(q))
    chi2_micro = F.when(
        F.col("n_t") + F.col("n_c") > 0,
        F.floor(chi2 + F.lit(0.5)).cast("long"),
    )
    return agg.select(
        F.col("n_t").alias("n_treat"),
        F.col("n_c").alias("n_ctrl"),
        F.lit(p).cast("long").alias("expected_treat_ppm"),
        chi2_micro.alias("chi2_micro"),
        F.coalesce(
            chi2_micro > F.lit(int(threshold_chi2_micro)), F.lit(False)
        ).alias("mismatch"),
    )


def srm_oracle_sql(
    treat_expr: str = "user_id % 2 = 0",
    expected_treat_ppm: int = 500_000,
    unit_col: str | None = "user_id",
    threshold_chi2_micro: int = 3_841_459,
    table: str = "events",
) -> str:
    """DuckDB replica: same distinct-unit counts, the same mirrored
    double expression and floor quantization."""
    p, q = int(expected_treat_ppm), 1_000_000 - int(expected_treat_ppm)
    if unit_col is not None:
        units = (
            f"SELECT DISTINCT {unit_col} AS u, ({treat_expr}) AS f "
            f"FROM {table} WHERE ({treat_expr}) IS NOT NULL "
            f"AND {unit_col} IS NOT NULL"
        )
    else:
        units = (
            f"SELECT ({treat_expr}) AS f FROM {table} "
            f"WHERE ({treat_expr}) IS NOT NULL"
        )
    return f"""
WITH units AS ({units}), m AS (
  SELECT CAST(SUM(CASE WHEN f THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
         CAST(SUM(CASE WHEN NOT f THEN 1 ELSE 0 END) AS BIGINT) AS n_c
  FROM units
), s AS (
  SELECT n_t, n_c,
         CAST(n_t AS DOUBLE) * 1000000.0
           - CAST(n_t + n_c AS DOUBLE) * {float(p)} AS d,
         CAST(n_t + n_c AS DOUBLE) AS n
  FROM m
)
SELECT n_t AS n_treat, n_c AS n_ctrl,
  CAST({p} AS BIGINT) AS expected_treat_ppm,
  CAST(CASE WHEN n_t + n_c > 0
       THEN FLOOR(d * d / (n * {float(p)}) + d * d / (n * {float(q)}) + 0.5)
       END AS BIGINT) AS chi2_micro,
  COALESCE(CASE WHEN n_t + n_c > 0
           THEN FLOOR(d * d / (n * {float(p)}) + d * d / (n * {float(q)})
                      + 0.5) > {int(threshold_chi2_micro)}
           END, FALSE) AS mismatch
FROM s
"""


def cuped_report(
    events: DataFrame,
    cutover_ts: str,
    treat_expr: str = "user_id % 2 = 0",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    unit: int = 1000,
) -> DataFrame:
    """CUPED-adjusted experiment readout (r14 — the variance-reduction
    technique production A/B platforms run: regress the outcome on the
    user's PRE-experiment activity and test the residual). Per user:
    covariate x = exact milli spend strictly BEFORE ``cutover_ts``,
    outcome y = milli spend at/after it; θ = cov(x, y)/var(x) is
    estimated POOLED across both arms (the standard, assignment-
    independent estimator), y_adj = y − θ·(x − x̄), and Welch's z runs
    on y_adj per arm. Returns ONE row: (n_treat, n_ctrl, theta_micro,
    var_reduction_ppm, z_plain_micro, z_cuped_micro) — the variance
    reduction is 1 − var(y_adj)/var(y) pooled, the number the
    technique is bought for.

    Determinism: per-user sums are exact integers; ALL moment folds
    (Σx, Σy, Σxy, Σx², Σy², per arm and pooled) are exact
    DECIMAL/BIGINT aggregates of those integers; θ, the adjusted
    moments and both z's evaluate in doubles mirrored op-for-op (the
    q_outlier_zscore contract) and quantize floor-to-micro. Degenerate
    cases (var(x) = 0, an arm with n < 2) yield NULL for the affected
    stats on BOTH engines. Note var(y_adj) uses the identity
    var(y) − 2θ·cov(x,y) + θ²·var(x) over the SAME exact moments —
    no second data pass.

    Scale shape: one user-keyed conditional aggregate (map-side
    partials) over one pushed scan, then a 1-row moment fold over the
    users frame. Users with no pre-period activity carry x = 0 (the
    standard imputation — they form their own covariate mass)."""
    flag = F.expr(treat_expr)
    vm = F.floor(F.col(value_col).cast("double") * unit + F.lit(0.5)).cast(
        "long"
    )
    pre = F.when(F.col(ts_col) < F.lit(cutover_ts).cast("timestamp"), vm)
    post = F.when(F.col(ts_col) >= F.lit(cutover_ts).cast("timestamp"), vm)
    per = (
        events.filter(
            flag.isNotNull()
            & F.col(user_col).isNotNull()
            & F.col(ts_col).isNotNull()
            & F.col(value_col).isNotNull()
        )
        .groupBy(F.col(user_col).alias("_u"))
        .agg(
            F.max(flag).alias("_f"),
            F.coalesce(F.sum(pre), F.lit(0)).alias("_x"),
            F.coalesce(F.sum(post), F.lit(0)).alias("_y"),
        )
    )
    x, y = F.col("_x").cast("decimal(38,0)"), F.col("_y").cast("decimal(38,0)")
    m = per.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("_f"), 1).otherwise(0)).alias("n_t"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(F.when(F.col("_f"), y)).alias("sy_t"),
        F.sum(F.when(~F.col("_f"), y)).alias("sy_c"),
        F.sum(F.when(F.col("_f"), x)).alias("sx_t"),
        F.sum(F.when(~F.col("_f"), x)).alias("sx_c"),
        F.sum(F.when(F.col("_f"), y * y)).alias("syy_t"),
        F.sum(F.when(~F.col("_f"), y * y)).alias("syy_c"),
        F.sum(F.when(F.col("_f"), x * y)).alias("sxy_t"),
        F.sum(F.when(~F.col("_f"), x * y)).alias("sxy_c"),
        F.sum(F.when(F.col("_f"), x * x)).alias("sxx_t"),
        F.sum(F.when(~F.col("_f"), x * x)).alias("sxx_c"),
    )
    D = lambda c: F.col(c).cast("double")  # noqa: E731
    # every potentially-zero denominator is NULL-guarded AT THE DIVISION
    # (late-r14): when() around the whole expression is NOT enough —
    # whole-stage codegen's common-subexpression elimination hoists a
    # shared subexpression (theta here) above its CaseWhen guards, so a
    # degenerate denominator raised DIVIDE_BY_ZERO under ANSI even
    # though every OUTPUT was guarded. A NULL divisor yields NULL on
    # both engines instead, and the output-level guards still decide
    # what the caller sees.
    pos = lambda c: F.when(c > 0, c)  # noqa: E731
    n, nt = D("n"), D("n_t")
    nc = n - nt
    varx = D("sxx") - D("sx") * D("sx") / pos(n)
    covxy = D("sxy") - D("sx") * D("sy") / pos(n)
    vary = D("syy") - D("sy") * D("sy") / pos(n)
    theta = covxy / pos(varx)
    xbar = D("sx") / pos(n)
    # per-arm mean/var of y and of y_adj = y - theta*(x - xbar), all
    # from the same exact sums (no second pass)
    mean_y_t, mean_y_c = D("sy_t") / pos(nt), D("sy_c") / pos(nc)
    var_y_t = (D("syy_t") - D("sy_t") * D("sy_t") / pos(nt)) / pos(
        nt - F.lit(1.0)
    )
    var_y_c = (D("syy_c") - D("sy_c") * D("sy_c") / pos(nc)) / pos(
        nc - F.lit(1.0)
    )
    mean_a_t = mean_y_t - theta * (D("sx_t") / pos(nt) - xbar)
    mean_a_c = mean_y_c - theta * (D("sx_c") / pos(nc) - xbar)
    ssa_t = (
        D("syy_t")
        - 2.0 * theta * D("sxy_t")
        + theta * theta * D("sxx_t")
        + 2.0 * theta * xbar * D("sy_t")
        - 2.0 * theta * theta * xbar * D("sx_t")
        + nt * theta * theta * xbar * xbar
    )
    ssa_c = (
        D("syy_c")
        - 2.0 * theta * D("sxy_c")
        + theta * theta * D("sxx_c")
        + 2.0 * theta * xbar * D("sy_c")
        - 2.0 * theta * theta * xbar * D("sx_c")
        + nc * theta * theta * xbar * xbar
    )
    var_a_t = (ssa_t - nt * mean_a_t * mean_a_t) / pos(nt - F.lit(1.0))
    var_a_c = (ssa_c - nc * mean_a_c * mean_a_c) / pos(nc - F.lit(1.0))
    var_adj_pooled = vary - 2.0 * theta * covxy + theta * theta * varx
    micro = lambda c: F.floor(c * _PPM + F.lit(0.5)).cast("long")  # noqa: E731
    ok_var = varx > 0
    ok_arms = (F.col("n_t") >= 2) & (F.col("n") - F.col("n_t") >= 2)
    se2_p = var_y_t / pos(nt) + var_y_c / pos(nc)
    se2_a = var_a_t / pos(nt) + var_a_c / pos(nc)
    z_plain = F.when(
        ok_arms & (se2_p > 0), (mean_y_t - mean_y_c) / F.sqrt(pos(se2_p))
    )
    z_cuped = F.when(
        ok_arms & ok_var & (se2_a > 0),
        (mean_a_t - mean_a_c) / F.sqrt(pos(se2_a)),
    )
    return m.select(
        F.col("n_t").cast("long").alias("n_treat"),
        (F.col("n") - F.col("n_t")).cast("long").alias("n_ctrl"),
        F.when(ok_var, micro(theta)).alias("theta_micro"),
        F.when(
            ok_var & (vary > 0),
            F.floor(
                (F.lit(1.0) - var_adj_pooled / pos(vary)) * _PPM + F.lit(0.5)
            ).cast("long"),
        ).alias("var_reduction_ppm"),
        micro(z_plain).alias("z_plain_micro"),
        micro(z_cuped).alias("z_cuped_micro"),
    )


def cuped_oracle_sql(
    cutover_ts: str,
    treat_expr: str = "user_id % 2 = 0",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    unit: int = 1000,
    table: str = "events",
) -> str:
    """DuckDB replica: identical per-user integer sums, identical
    exact moment folds, the same mirrored double expressions."""
    return f"""
WITH per AS (
  SELECT {user_col} AS u, MAX({treat_expr}) AS f,
    COALESCE(SUM(CASE WHEN {ts_col} < TIMESTAMP '{cutover_ts}'
      THEN CAST(FLOOR({value_col} * {unit} + 0.5) AS BIGINT) END), 0) AS x,
    COALESCE(SUM(CASE WHEN {ts_col} >= TIMESTAMP '{cutover_ts}'
      THEN CAST(FLOOR({value_col} * {unit} + 0.5) AS BIGINT) END), 0) AS y
  FROM {table}
  WHERE ({treat_expr}) IS NOT NULL AND {user_col} IS NOT NULL
    AND {ts_col} IS NOT NULL AND {value_col} IS NOT NULL
  GROUP BY u
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(CASE WHEN f THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
    CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
    CAST(SUM(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
    CAST(SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS DOUBLE) AS sxy,
    CAST(SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS DOUBLE) AS sxx,
    CAST(SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS DOUBLE) AS syy,
    CAST(SUM(CASE WHEN f THEN CAST(y AS HUGEINT) END) AS DOUBLE) AS sy_t,
    CAST(SUM(CASE WHEN NOT f THEN CAST(y AS HUGEINT) END) AS DOUBLE) AS sy_c,
    CAST(SUM(CASE WHEN f THEN CAST(x AS HUGEINT) END) AS DOUBLE) AS sx_t,
    CAST(SUM(CASE WHEN NOT f THEN CAST(x AS HUGEINT) END) AS DOUBLE) AS sx_c,
    CAST(SUM(CASE WHEN f THEN CAST(y AS HUGEINT) * CAST(y AS HUGEINT) END)
      AS DOUBLE) AS syy_t,
    CAST(SUM(CASE WHEN NOT f THEN CAST(y AS HUGEINT) * CAST(y AS HUGEINT) END)
      AS DOUBLE) AS syy_c,
    CAST(SUM(CASE WHEN f THEN CAST(x AS HUGEINT) * CAST(y AS HUGEINT) END)
      AS DOUBLE) AS sxy_t,
    CAST(SUM(CASE WHEN NOT f THEN CAST(x AS HUGEINT) * CAST(y AS HUGEINT) END)
      AS DOUBLE) AS sxy_c,
    CAST(SUM(CASE WHEN f THEN CAST(x AS HUGEINT) * CAST(x AS HUGEINT) END)
      AS DOUBLE) AS sxx_t,
    CAST(SUM(CASE WHEN NOT f THEN CAST(x AS HUGEINT) * CAST(x AS HUGEINT) END)
      AS DOUBLE) AS sxx_c
  FROM per
), d AS (
  SELECT *,
    CAST(n AS DOUBLE) AS nd, CAST(n_t AS DOUBLE) AS ntd,
    CAST(n AS DOUBLE) - CAST(n_t AS DOUBLE) AS ncd,
    sxx - sx * sx / CAST(n AS DOUBLE) AS varx,
    sxy - sx * sy / CAST(n AS DOUBLE) AS covxy,
    syy - sy * sy / CAST(n AS DOUBLE) AS vary,
    (sxy - sx * sy / CAST(n AS DOUBLE))
      / (sxx - sx * sx / CAST(n AS DOUBLE)) AS theta,
    sx / CAST(n AS DOUBLE) AS xbar
  FROM m
), e AS (
  SELECT *,
    sy_t / ntd AS mean_y_t, sy_c / ncd AS mean_y_c,
    (syy_t - sy_t * sy_t / ntd) / (ntd - 1.0) AS var_y_t,
    (syy_c - sy_c * sy_c / ncd) / (ncd - 1.0) AS var_y_c,
    sy_t / ntd - theta * (sx_t / ntd - xbar) AS mean_a_t,
    sy_c / ncd - theta * (sx_c / ncd - xbar) AS mean_a_c,
    (syy_t - 2.0 * theta * sxy_t + theta * theta * sxx_t
     + 2.0 * theta * xbar * sy_t - 2.0 * theta * theta * xbar * sx_t
     + ntd * theta * theta * xbar * xbar) AS ssa_t,
    (syy_c - 2.0 * theta * sxy_c + theta * theta * sxx_c
     + 2.0 * theta * xbar * sy_c - 2.0 * theta * theta * xbar * sx_c
     + ncd * theta * theta * xbar * xbar) AS ssa_c
  FROM d
), g AS (
  SELECT *,
    (ssa_t - ntd * mean_a_t * mean_a_t) / (ntd - 1.0) AS var_a_t,
    (ssa_c - ncd * mean_a_c * mean_a_c) / (ncd - 1.0) AS var_a_c,
    vary - 2.0 * theta * covxy + theta * theta * varx AS var_adj
  FROM e
)
SELECT n_t AS n_treat, CAST(n - n_t AS BIGINT) AS n_ctrl,
  CAST(CASE WHEN varx > 0 THEN FLOOR(theta * {_PPM} + 0.5) END AS BIGINT)
    AS theta_micro,
  CAST(CASE WHEN varx > 0 AND vary > 0
       THEN FLOOR((1.0 - var_adj / vary) * {_PPM} + 0.5) END AS BIGINT)
    AS var_reduction_ppm,
  CAST(CASE WHEN n_t >= 2 AND n - n_t >= 2
            AND var_y_t / ntd + var_y_c / ncd > 0
       THEN FLOOR((mean_y_t - mean_y_c)
                  / sqrt(var_y_t / ntd + var_y_c / ncd) * {_PPM} + 0.5)
       END AS BIGINT) AS z_plain_micro,
  CAST(CASE WHEN n_t >= 2 AND n - n_t >= 2 AND varx > 0
            AND var_a_t / ntd + var_a_c / ncd > 0
       THEN FLOOR((mean_a_t - mean_a_c)
                  / sqrt(var_a_t / ntd + var_a_c / ncd) * {_PPM} + 0.5)
       END AS BIGINT) AS z_cuped_micro
FROM g
"""


def k_anonymity_report(
    df: DataFrame,
    qi_cols: list,
    sensitive_col: str,
    k: int = 5,
    l_diversity: int = 2,
) -> DataFrame:
    """Privacy risk report (r14 — the governance gate next to
    :func:`text.pii_scrub`'s redaction): every quasi-identifier
    equivalence class that violates k-anonymity (fewer than ``k``
    rows share the QI combination — an attacker joining on those
    attributes singles members out) or l-diversity (fewer than
    ``l_diversity`` DISTINCT sensitive values inside the class — the
    class may be large yet still reveal everyone's sensitive value).

    Returns one row per RISKY class: (*qi_cols, group_n, n_sensitive,
    k_risky, l_risky), ordered by the QI columns. NULL is a QI VALUE
    (an attacker observes "missing" like any other value — both
    engines group NULLs together); a NULL sensitive value contributes
    no diversity (COUNT DISTINCT skips it in both engines).

    Scale shape: one exact two-key aggregate — Spark expands
    count_distinct into a (QI, sensitive) pre-aggregate then a QI
    fold, both map-side-partial hash shuffles on keys, never rows.
    The output is bounded by the number of risky CLASSES, not data
    size."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if l_diversity < 1:
        raise ValueError(f"l_diversity must be >= 1, got {l_diversity}")
    if not qi_cols:
        raise ValueError("qi_cols must name at least one column")
    for c in list(qi_cols) + [sensitive_col]:
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in frame")
    grouped = df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).alias("group_n"),
        F.countDistinct(F.col(sensitive_col)).alias("n_sensitive"),
    )
    return (
        grouped.select(
            *qi_cols,
            "group_n",
            "n_sensitive",
            (F.col("group_n") < k).alias("k_risky"),
            (F.col("n_sensitive") < l_diversity).alias("l_risky"),
        )
        .filter(F.col("k_risky") | F.col("l_risky"))
        .orderBy(*qi_cols)
    )


def k_anonymity_summary(
    df: DataFrame,
    qi_cols: list,
    sensitive_col: str,
    k: int = 5,
    l_diversity: int = 2,
) -> DataFrame:
    """One-row rollup of :func:`k_anonymity_report`: (n_rows,
    n_groups, n_risky_groups, n_risky_rows, suppression_ppm) —
    suppression_ppm is the integer-ppm share of rows that would have
    to be suppressed (or generalized upward) to publish the table at
    the requested (k, l): the single number a release review asks
    for."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if l_diversity < 1:
        raise ValueError(f"l_diversity must be >= 1, got {l_diversity}")
    if not qi_cols:
        raise ValueError("qi_cols must name at least one column")
    for c in list(qi_cols) + [sensitive_col]:
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in frame")
    grouped = df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).alias("_n"),
        F.countDistinct(F.col(sensitive_col)).alias("_s"),
    )
    risky = (F.col("_n") < k) | (F.col("_s") < l_diversity)
    return grouped.agg(
        F.sum("_n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(risky.cast("long")).alias("n_risky_groups"),
        F.sum(F.when(risky, F.col("_n")).otherwise(0)).alias("n_risky_rows"),
    ).select(
        "n_rows",
        "n_groups",
        "n_risky_groups",
        "n_risky_rows",
        F.expr(
            "CASE WHEN n_rows = 0 THEN NULL "
            "ELSE n_risky_rows * 1000000 div n_rows END"
        ).alias("suppression_ppm"),
    )


def k_anonymity_oracle_sql(
    qi_sql: list,
    sensitive_col: str,
    k: int = 5,
    l_diversity: int = 2,
    table: str = "orders",
) -> str:
    """DuckDB replica of the risky-class listing. ``qi_sql`` is a list
    of (expr, alias) pairs so the caller buckets exactly like the
    Spark side."""
    sel = ", ".join(f"{e} AS {a}" for e, a in qi_sql)
    names = ", ".join(a for _, a in qi_sql)
    # Spark orderBy puts NULLs first; DuckDB defaults them last — the
    # documented NULL-QI case must sort identically (review, r14)
    nulls_first = ", ".join(f"{a} NULLS FIRST" for _, a in qi_sql)
    return f"""
WITH base AS (
  SELECT {sel}, {sensitive_col} AS s FROM {table}
), grouped AS (
  SELECT {names}, CAST(COUNT(*) AS BIGINT) AS group_n,
         CAST(COUNT(DISTINCT s) AS BIGINT) AS n_sensitive
  FROM base GROUP BY {names}
)
SELECT {names}, group_n, n_sensitive,
       group_n < {int(k)} AS k_risky,
       n_sensitive < {int(l_diversity)} AS l_risky
FROM grouped
WHERE group_n < {int(k)} OR n_sensitive < {int(l_diversity)}
ORDER BY {nulls_first}
"""


def k_anonymity_summary_oracle_sql(
    qi_sql: list,
    sensitive_col: str,
    k: int = 5,
    l_diversity: int = 2,
    table: str = "orders",
) -> str:
    sel = ", ".join(f"{e} AS {a}" for e, a in qi_sql)
    names = ", ".join(a for _, a in qi_sql)
    return f"""
WITH base AS (
  SELECT {sel}, {sensitive_col} AS s FROM {table}
), grouped AS (
  SELECT {names}, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT s) AS BIGINT) AS sd
  FROM base GROUP BY {names}
)
SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN n < {int(k)} OR sd < {int(l_diversity)}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_risky_groups,
       CAST(SUM(CASE WHEN n < {int(k)} OR sd < {int(l_diversity)}
                THEN n ELSE 0 END) AS BIGINT) AS n_risky_rows,
       CAST(CASE WHEN SUM(n) = 0 THEN NULL
            ELSE SUM(CASE WHEN n < {int(k)} OR sd < {int(l_diversity)}
                     THEN n ELSE 0 END) * 1000000 // SUM(n)
            END AS BIGINT) AS suppression_ppm
FROM grouped
"""


def ks_test(
    a: DataFrame,
    b: DataFrame,
    value_col: str = "value",
    unit: int = 1_000_000,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic (r14 — the
    distribution-free drift test next to :func:`psi_table` (binned)
    and :func:`chi2_stat` (categorical): KS needs NO binning choice,
    so it catches shape drift PSI's ten quantile bins smear out).
    Values are quantized to ``unit`` micro-steps first (exactness
    contract: D is then a ratio of integers, identical on every
    engine — and two samples differing only below the quantum
    honestly report D = 0).

    D = max over values v of |F_a(v) − F_b(v)| evaluated at distinct
    quantized values with inclusive CDFs; reported as
    (n_a, n_b, d_ppm, at_value_micro) — one row; d_ppm =
    (max |cum_a·n_b − cum_b·n_a| · 10⁶) div (n_a·n_b) in
    DECIMAL(38,0), and at_value_micro is the SMALLEST value attaining
    the max (a deterministic tie rule, not an arbitrary argmax).
    Empty inputs yield NULL d_ppm. NULL values drop.

    Scale shape: per-value counts (one hash shuffle on the quantized
    value), then :func:`distrank.distributed_running_sum` for BOTH
    inclusive CDFs (range exchange + per-partition windows + broadcast
    offsets — no single-task window over the distinct-values frame),
    a 1-row max fold, and one broadcast-back filter for the argmin
    value. The DuckDB oracle keeps the textbook single-window SQL:
    equality IS the decomposition proof."""
    if unit <= 0:
        raise ValueError(f"unit must be positive, got {unit}")
    from pg_parquet_spark.operators import distrank

    def q(df, side):
        return df.filter(F.col(value_col).isNotNull()).select(
            F.floor(F.col(value_col).cast("double") * unit + F.lit(0.5))
            .cast("long")
            .alias("v"),
            F.lit(side).alias("_side"),
        )

    pooled = q(a, 1).unionByName(q(b, 0))
    per_v = pooled.groupBy("v").agg(
        F.sum("_side").alias("_ca"),
        F.sum(1 - F.col("_side")).alias("_cb"),
    )
    cum = distrank.distributed_running_sums(
        per_v, ["v"], {"_cuma": "_ca", "_cumb": "_cb"}
    )
    totals = per_v.agg(
        F.sum("_ca").cast("decimal(38,0)").alias("_na"),
        F.sum("_cb").cast("decimal(38,0)").alias("_nb"),
    )
    scored = cum.crossJoin(F.broadcast(totals)).select(
        "v",
        "_na",
        "_nb",
        F.abs(
            F.col("_cuma").cast("decimal(38,0)") * F.col("_nb")
            - F.col("_cumb").cast("decimal(38,0)") * F.col("_na")
        ).alias("_score"),
    )
    best = scored.agg(F.max("_score").alias("_ms"))
    return (
        scored.crossJoin(F.broadcast(best))
        .filter(F.col("_score") == F.col("_ms"))
        .agg(
            F.first("_na").alias("_na"),
            F.first("_nb").alias("_nb"),
            F.first("_ms").alias("_ms"),
            F.min("v").alias("at_value_micro"),
        )
        .select(
            F.col("_na").cast("long").alias("n_a"),
            F.col("_nb").cast("long").alias("n_b"),
            F.expr(
                "CASE WHEN _na = 0 OR _nb = 0 THEN NULL "
                "ELSE CAST((_ms * 1000000) div (_na * _nb) AS BIGINT) END"
            ).alias("d_ppm"),
            "at_value_micro",
        )
    )


def ks_test_oracle_sql(
    a_sql: str,
    b_sql: str,
    value_col: str = "value",
    unit: int = 1_000_000,
) -> str:
    """DuckDB replica: single-window cumulative counts over the
    distinct quantized values, identical integer score and tie rule.
    ``a_sql``/``b_sql`` are SELECTs producing ``value_col``."""
    return f"""
WITH pooled AS (
  SELECT CAST(FLOOR({value_col} * {unit} + 0.5) AS BIGINT) AS v,
         1 AS side
  FROM ({a_sql}) WHERE {value_col} IS NOT NULL
  UNION ALL
  SELECT CAST(FLOOR({value_col} * {unit} + 0.5) AS BIGINT) AS v,
         0 AS side
  FROM ({b_sql}) WHERE {value_col} IS NOT NULL
), per_v AS (
  SELECT v, CAST(SUM(side) AS BIGINT) AS ca,
         CAST(SUM(1 - side) AS BIGINT) AS cb
  FROM pooled GROUP BY v
), cum AS (
  SELECT v,
         CAST(SUM(ca) OVER w AS HUGEINT) AS cuma,
         CAST(SUM(cb) OVER w AS HUGEINT) AS cumb
  FROM per_v
  WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING)
), totals AS (
  SELECT CAST(SUM(ca) AS HUGEINT) AS na, CAST(SUM(cb) AS HUGEINT) AS nb
  FROM per_v
), scored AS (
  SELECT v, na, nb, ABS(cuma * nb - cumb * na) AS score
  FROM cum, totals
), best AS (
  SELECT MAX(score) AS ms FROM scored
)
SELECT CAST(MIN(na) AS BIGINT) AS n_a,
       CAST(MIN(nb) AS BIGINT) AS n_b,
       CAST(CASE WHEN MIN(na) = 0 OR MIN(nb) = 0 THEN NULL
            ELSE (MIN(ms) * 1000000) // (MIN(na) * MIN(nb)) END
            AS BIGINT) AS d_ppm,
       CAST(MIN(v) AS BIGINT) AS at_value_micro
FROM scored, best
WHERE score = ms
"""


def auc_report(
    df: DataFrame,
    score_col: str,
    label_expr: str,
    unit: int = 1_000_000,
) -> DataFrame:
    """Exact ROC-AUC via the Mann-Whitney U rank identity (r14 — the
    classifier-eval companion of :func:`ks_test`, sharing its
    quantization contract and its distributed prefix-sum CDF): with
    midranks for ties, 2·Σ(positive midranks) is the pure integer
    Σ_s p_s·(2·cum_before_s + c_s + 1) over per-score counts, so
    auc_ppm = (S₂ − n₊(n₊+1))·10⁶ div (2·n₊·n₋) — no float anywhere.
    Scores quantize to ``unit`` micro-steps first (ties below the
    quantum honestly become ties). Returns one row
    (n_pos, n_neg, auc_ppm); degenerate label sets (no positives or
    no negatives) report NULL auc_ppm. NULL scores/labels drop.

    Scale shape: one hash shuffle into per-score (count, positives),
    ONE :func:`distrank.distributed_running_sum` pass for the
    cumulative, and a 1-row DECIMAL fold."""
    if unit <= 0:
        raise ValueError(f"unit must be positive, got {unit}")
    from pg_parquet_spark.operators import distrank

    base = df.select(
        F.floor(F.col(score_col).cast("double") * unit + F.lit(0.5))
        .cast("long")
        .alias("v"),
        F.expr(label_expr).cast("boolean").alias("_y"),
    ).filter(F.col("v").isNotNull() & F.col("_y").isNotNull())
    per = base.groupBy("v").agg(
        F.count(F.lit(1)).alias("_c"),
        F.sum(F.col("_y").cast("long")).alias("_p"),
    )
    cum = distrank.distributed_running_sum(per, ["v"], "_c", "_cum")
    return cum.agg(
        F.sum("_p").cast("decimal(38,0)").alias("_np"),
        F.sum(F.col("_c") - F.col("_p")).cast("decimal(38,0)").alias("_nn"),
        F.sum(
            F.col("_p").cast("decimal(38,0)")
            * (2 * (F.col("_cum") - F.col("_c")) + F.col("_c") + 1)
        ).alias("_s2"),
    ).select(
        F.col("_np").cast("long").alias("n_pos"),
        F.col("_nn").cast("long").alias("n_neg"),
        F.expr(
            "CASE WHEN _np = 0 OR _nn = 0 THEN NULL "
            "ELSE CAST(((_s2 - _np * (_np + 1)) * 1000000) "
            "div (2 * _np * _nn) AS BIGINT) END"
        ).alias("auc_ppm"),
    )


def auc_oracle_sql(
    source_sql: str,
    score_col: str,
    label_sql: str,
    unit: int = 1_000_000,
) -> str:
    """DuckDB replica: identical per-score counts, single-window
    cumulative, identical integer U identity. ``label_sql`` is a
    boolean expression over ``source_sql``'s columns."""
    return f"""
WITH base AS (
  SELECT CAST(FLOOR({score_col} * {unit} + 0.5) AS BIGINT) AS v,
         CAST(({label_sql}) AS BOOLEAN) AS y
  FROM ({source_sql})
  WHERE {score_col} IS NOT NULL AND ({label_sql}) IS NOT NULL
), per AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS c,
         CAST(SUM(CAST(y AS BIGINT)) AS BIGINT) AS p
  FROM base GROUP BY v
), cum AS (
  SELECT v, c, p,
         CAST(SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
              AS HUGEINT) AS cum
  FROM per
), m AS (
  SELECT CAST(SUM(p) AS HUGEINT) AS np,
         CAST(SUM(c - p) AS HUGEINT) AS nn,
         CAST(SUM(CAST(p AS HUGEINT) * (2 * (cum - c) + c + 1))
              AS HUGEINT) AS s2
  FROM cum
)
SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
       CAST(CASE WHEN np = 0 OR nn = 0 THEN NULL
            ELSE ((s2 - np * (np + 1)) * 1000000) // (2 * np * nn) END
            AS BIGINT) AS auc_ppm
FROM m
"""


def mutual_information(df: DataFrame, x: Column, y: Column) -> DataFrame:
    """Mutual information + normalized MI between two categorical
    expressions (r14 — the effect-SIZE companion of
    :func:`chi2_stat`: χ² tells you dependence is nonzero, MI tells
    you how many nats of label you get per feature read, comparable
    across features like :func:`woe_iv`'s IV but symmetric and
    multi-class).

    Per OBSERVED cell, (o/n)·ln(o·n/(r·c)) quantizes to integer
    micro-nats BEFORE the fold (the PSI/PMI rule — in-engine ln on
    both sides at this quantization is the house float discipline);
    empty cells contribute exactly 0 and are never materialized — no
    |x|×|y| grid. Marginal entropies quantize the same way, and
    nmi_ppm = (2·mi·10⁶) div (h_x + h_y) (NULL when both entropies
    are zero — a constant feature against a constant label has no
    normalizable dependence).

    Returns ONE row: (n, n_x, n_y, mi_micro, h_x_micro, h_y_micro,
    nmi_ppm). NULL categories are categories (cast to string, like
    chi2). Scale shape: three map-side-combinable counts, two
    broadcast margin joins, a 1-row fold."""
    base = df.select(x.cast("string").alias("x"), y.cast("string").alias("y"))
    cells = base.groupBy("x", "y").agg(F.count("*").cast("long").alias("o"))
    rx = base.groupBy("x").agg(F.count("*").cast("long").alias("r"))
    cy = base.groupBy("y").agg(F.count("*").cast("long").alias("c"))
    n1 = base.agg(F.count("*").cast("long").alias("n"))
    # NULL-safe margin joins (review, r14): a plain equi-join drops
    # NULL-category cells from the MI sum while n and the marginal
    # entropies still count them — "NULL is a category" must hold in
    # the JOINS too, in both engines
    terms = (
        cells.join(
            F.broadcast(rx.withColumnRenamed("x", "_rx")),
            cells["x"].eqNullSafe(F.col("_rx")),
        )
        .drop("_rx")
        .join(
            F.broadcast(cy.withColumnRenamed("y", "_cy")),
            cells["y"].eqNullSafe(F.col("_cy")),
        )
        .drop("_cy")
        .crossJoin(F.broadcast(n1))
        .withColumn(
            "term_micro",
            F.floor(
                (F.col("o").cast("double") / F.col("n"))
                * F.log(
                    F.col("o").cast("double") * F.col("n")
                    / (F.col("r").cast("double") * F.col("c"))
                )
                * 1_000_000
                + F.lit(0.5)
            ).cast("long"),
        )
    )
    hx = rx.crossJoin(F.broadcast(n1)).select(
        F.floor(
            -(F.col("r").cast("double") / F.col("n"))
            * F.log(F.col("r").cast("double") / F.col("n"))
            * 1_000_000
            + F.lit(0.5)
        ).cast("long").alias("_h")
    ).agg(F.sum("_h").cast("long").alias("h_x_micro"))
    hy = cy.crossJoin(F.broadcast(n1)).select(
        F.floor(
            -(F.col("c").cast("double") / F.col("n"))
            * F.log(F.col("c").cast("double") / F.col("n"))
            * 1_000_000
            + F.lit(0.5)
        ).cast("long").alias("_h")
    ).agg(F.sum("_h").cast("long").alias("h_y_micro"))
    agg = terms.agg(
        F.first("n").alias("n"),
        F.countDistinct("x").cast("long").alias("n_x"),
        F.countDistinct("y").cast("long").alias("n_y"),
        F.sum("term_micro").cast("long").alias("mi_micro"),
    )
    return (
        agg.crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .select(
            "n",
            "n_x",
            "n_y",
            "mi_micro",
            "h_x_micro",
            "h_y_micro",
            F.expr(
                "CASE WHEN h_x_micro + h_y_micro = 0 THEN NULL "
                "ELSE (2 * mi_micro * 1000000) div (h_x_micro + h_y_micro) "
                "END"
            ).cast("long").alias("nmi_ppm"),
        )
    )


def mutual_information_oracle_sql(
    x_expr: str, y_expr: str, table: str = "events"
) -> str:
    """DuckDB replica: identical per-cell/per-margin micro-nat
    quantization before every fold."""
    return f"""
WITH base AS (
  SELECT CAST({x_expr} AS VARCHAR) AS x, CAST({y_expr} AS VARCHAR) AS y
  FROM {table}
), n1 AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base
), cells AS (
  SELECT x, y, CAST(COUNT(*) AS BIGINT) AS o FROM base GROUP BY x, y
), rx AS (
  SELECT x, CAST(COUNT(*) AS BIGINT) AS r FROM base GROUP BY x
), cy AS (
  SELECT y, CAST(COUNT(*) AS BIGINT) AS c FROM base GROUP BY y
), terms AS (
  SELECT CAST(FLOOR((CAST(o AS DOUBLE) / n) *
           ln(CAST(o AS DOUBLE) * n / (CAST(r AS DOUBLE) * c)) * 1000000
           + 0.5) AS BIGINT) AS term_micro,
         o, cells.x, cells.y
  FROM cells
  JOIN rx ON cells.x IS NOT DISTINCT FROM rx.x
  JOIN cy ON cells.y IS NOT DISTINCT FROM cy.y, n1
), hx AS (
  SELECT CAST(SUM(CAST(FLOOR(-(CAST(r AS DOUBLE) / n) *
           ln(CAST(r AS DOUBLE) / n) * 1000000 + 0.5) AS BIGINT))
         AS BIGINT) AS h_x_micro
  FROM rx, n1
), hy AS (
  SELECT CAST(SUM(CAST(FLOOR(-(CAST(c AS DOUBLE) / n) *
           ln(CAST(c AS DOUBLE) / n) * 1000000 + 0.5) AS BIGINT))
         AS BIGINT) AS h_y_micro
  FROM cy, n1
), agg AS (
  SELECT (SELECT n FROM n1) AS n,
         CAST(COUNT(DISTINCT x) AS BIGINT) AS n_x,
         CAST(COUNT(DISTINCT y) AS BIGINT) AS n_y,
         CAST(SUM(term_micro) AS BIGINT) AS mi_micro
  FROM terms
)
SELECT n, n_x, n_y, mi_micro, h_x_micro, h_y_micro,
       CAST(CASE WHEN h_x_micro + h_y_micro = 0 THEN NULL
            ELSE (2 * mi_micro * 1000000) // (h_x_micro + h_y_micro) END
            AS BIGINT) AS nmi_ppm
FROM agg, hx, hy
"""
