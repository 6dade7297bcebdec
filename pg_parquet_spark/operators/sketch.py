"""Mergeable data sketches (beyond-reference surface): KMV distinct-count
and count-min frequency — the bounded-size summaries a 100 TB profiling
pass ships back to the driver instead of exact groupBys.

Scale design:

- **KMV (k-minimum-values) cardinality** (Bar-Yossef et al. 2002, the
  theta-sketch family): keep the k smallest 40-bit content hashes per
  group; estimate distinct = (k-1)/v_k where v_k is the k-th minimum as
  a fraction of hash space. The sketch is k rows per group NO MATTER the
  data size, and two sketches MERGE by unioning their value sets and
  re-taking the k smallest — the property that lets per-partition /
  per-day sketches roll up without a re-scan.
- **Count-min frequency** (Cormode & Muthukrishnan 2005): depth×width
  integer counters; point estimate = min over rows of the keyed bucket.
  The sketch is depth·width rows regardless of key cardinality, merges
  by elementwise SUM, and never undercounts (est ≥ true, asserted in
  tests). Candidate keys for heavy-hitter queries come from a bounded
  candidate set (domain values, a sample, or a prior round's sketch) —
  the classic deployment; the sketch itself never enumerates keys.
- Both build with ONE map-side-combinable aggregation: partial
  HashAggregate collapses each task's contribution to ≤ sketch-size
  rows before the shuffle, so shuffle volume is O(sketch), not O(data).

Determinism contract (the DSIR lesson — sampling.py): "randomness" is
content hashing (md5-prefix integers, both engines bit-identical), and
the estimate arithmetic is pure positive-integer division — Spark
``div`` ≡ DuckDB ``//`` — so the full sketch AND the estimates replicate
in the DuckDB oracle exactly:  (k-1)/((v_k+0.5)/2^40) milli-units
 ≡ ((k-1)·2^41·1000) // (2·v_k+1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: 40-bit hash space (10 hex chars of md5) — wide enough that collision
#: odds at realistic group cardinalities are negligible, narrow enough
#: that the integer estimate arithmetic stays far inside int64.
_HASH_HEX = 10
_HASH_SPACE = 1 << (4 * _HASH_HEX)

_ALL = "__ALL__"


def _hash40(col) -> F.Column:
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, _HASH_HEX), 16, 10
    ).cast("long")


def _hash40_sql(expr: str) -> str:
    return (
        f"CAST(CONCAT('0x', substr(md5(CAST({expr} AS VARCHAR)), 1, "
        f"{_HASH_HEX})) AS BIGINT)"
    )


# --------------------------------------------------------------------------
# KMV distinct-count
# --------------------------------------------------------------------------


def kmv_sketch(
    df: DataFrame, group_col: str, value_col: str, k: int = 64
) -> DataFrame:
    """The per-group sketch itself: the k smallest distinct hash values.

    (grp, h) rows, ≤ k per group — this is the mergeable artifact you
    persist or ship; ``kmv_estimate`` turns it into numbers."""
    hashes = (
        df.select(
            F.col(group_col).cast("string").alias("grp"),
            _hash40(F.col(value_col)).alias("h"),
        )
        .distinct()
    )
    rn = F.row_number().over(Window.partitionBy("grp").orderBy("h"))
    return hashes.withColumn("rn", rn).filter(F.col("rn") <= k).drop("rn")


def kmv_merge(sketch_a: DataFrame, sketch_b: DataFrame, k: int = 64) -> DataFrame:
    """Union two sketches and re-take the k smallest per group — the
    closure property (sketch(A ∪ B) ≡ merge(sketch(A), sketch(B)),
    asserted in tests/test_sketch.py)."""
    both = sketch_a.unionByName(sketch_b).distinct()
    rn = F.row_number().over(Window.partitionBy("grp").orderBy("h"))
    return both.withColumn("rn", rn).filter(F.col("rn") <= k).drop("rn")


def _estimate_milli(k: int):
    exact = F.col("n_kept") * F.lit(1000)
    est = F.expr(
        f"({k - 1} * {2 * _HASH_SPACE * 1000}) div (2 * kth_min + 1)"
    )
    return F.when(F.col("n_kept") < k, exact).otherwise(est).cast("long")


def kmv_estimate(sketch: DataFrame, k: int = 64) -> DataFrame:
    """(grp, n_kept, kth_min, est_milli) per group PLUS a '__ALL__' row
    estimated from the MERGED sketch — distinct-of-union via union-of-
    sketches, no second data pass. Groups with < k distinct values are
    exact by construction (the sketch holds every value)."""
    per = sketch.groupBy("grp").agg(
        F.count("*").cast("long").alias("n_kept"),
        F.max("h").alias("kth_min"),
    )
    g_rn = F.row_number().over(Window.partitionBy().orderBy("h"))
    merged = (
        sketch.select("h")
        .distinct()
        .withColumn("rn", g_rn)
        .filter(F.col("rn") <= k)
        .groupBy()
        .agg(
            F.count("*").cast("long").alias("n_kept"),
            F.max("h").alias("kth_min"),
        )
        .select(F.lit(_ALL).alias("grp"), "n_kept", "kth_min")
    )
    return (
        per.unionByName(merged)
        .withColumn("est_milli", _estimate_milli(k))
        .orderBy("grp")
    )


def kmv_distinct(
    df: DataFrame, group_col: str, value_col: str, k: int = 64
) -> DataFrame:
    """End-to-end: sketch then estimate (the gate-shaped entry point)."""
    return kmv_estimate(kmv_sketch(df, group_col, value_col, k), k)


def kmv_oracle_sql(
    group_col: str,
    value_col: str,
    k: int = 64,
    table: str = "events",
) -> str:
    """DuckDB replica of kmv_distinct — identical hashes, identical
    positive-integer estimate arithmetic."""
    h = _hash40_sql(value_col)
    num = (k - 1) * 2 * _HASH_SPACE * 1000
    return f"""
WITH hashes AS (
  SELECT DISTINCT CAST({group_col} AS VARCHAR) AS grp, {h} AS h FROM {table}
), ranked AS (
  SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
  FROM hashes
), sk AS (
  SELECT grp, h FROM ranked WHERE rn <= {k}
), per AS (
  SELECT grp, COUNT(*) AS n_kept, MAX(h) AS kth_min FROM sk GROUP BY grp
), gdedup AS (
  SELECT DISTINCT h FROM sk
), granked AS (
  SELECT h, row_number() OVER (ORDER BY h) AS rn FROM gdedup
), gper AS (
  SELECT '{_ALL}' AS grp, COUNT(*) AS n_kept, MAX(h) AS kth_min
  FROM granked WHERE rn <= {k}
), allrows AS (
  SELECT * FROM per UNION ALL SELECT * FROM gper
)
SELECT grp, CAST(n_kept AS BIGINT) AS n_kept, CAST(kth_min AS BIGINT) AS kth_min,
       CAST(CASE WHEN n_kept < {k} THEN n_kept * 1000
                 ELSE CAST({num} // (2 * kth_min + 1) AS BIGINT)
            END AS BIGINT) AS est_milli
FROM allrows
ORDER BY grp
"""


# --------------------------------------------------------------------------
# Count-min frequency
# --------------------------------------------------------------------------


def _bucket(row_col, key_col, width: int) -> F.Column:
    tagged = F.concat(row_col.cast("string"), F.lit(":"), key_col)
    return (
        F.conv(F.substring(F.md5(tagged), 1, 8), 16, 10).cast("long")
        % F.lit(width)
    )


def _bucket_sql(row_expr: str, key_expr: str, width: int) -> str:
    tagged = f"CONCAT(CAST({row_expr} AS VARCHAR), ':', {key_expr})"
    return (
        f"(CAST(CONCAT('0x', substr(md5({tagged}), 1, 8)) AS BIGINT)"
        f" % {width})"
    )


def cms_sketch(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 128
) -> DataFrame:
    """(d, bucket, cnt): depth×width counters. One exploded projection +
    a map-side-combinable count — each task emits ≤ depth·width partial
    rows, so the shuffle is sketch-sized, not data-sized."""
    rows = df.select(F.col(key_col).cast("string").alias("k")).select(
        "k",
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("d"),
    )
    return (
        rows.select("d", _bucket(F.col("d"), F.col("k"), width).alias("bucket"))
        .groupBy("d", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cms_merge(sketch_a: DataFrame, sketch_b: DataFrame) -> DataFrame:
    """Elementwise counter sum — the merge property (asserted in tests)."""
    return (
        sketch_a.unionByName(sketch_b)
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 128,
) -> DataFrame:
    """Point estimates for a bounded candidate set: min over the depth
    rows of each candidate's bucket counter. The candidate frame is the
    small side (broadcast); the sketch is depth·width rows."""
    keys = candidates.select(
        F.col(key_col).cast("string").alias("key")
    ).distinct()
    probes = keys.select(
        "key",
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("d"),
    ).select("key", "d", _bucket(F.col("d"), F.col("key"), width).alias("bucket"))
    return (
        probes.join(sketch, ["d", "bucket"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    top_k: int = 15,
    depth: int = 4,
    width: int = 128,
) -> DataFrame:
    """Build the sketch over ``df`` and rank the candidate keys by
    estimated frequency (desc, then key asc for determinism). Candidates
    here are the column's distinct values — in a 100 TB deployment pass
    a bounded candidate frame to ``cms_estimate`` instead (sample /
    domain list / previous sketch round); this wrapper is the
    gate-shaped bounded-cardinality case."""
    sketch = cms_sketch(df, key_col, depth, width)
    est = cms_estimate(sketch, df, key_col, depth, width)
    return est.orderBy(F.col("est").desc(), F.col("key")).limit(top_k)


def cms_oracle_sql(
    key_col: str,
    top_k: int = 15,
    depth: int = 4,
    width: int = 128,
    table: str = "events",
) -> str:
    """DuckDB replica of cms_heavy_hitters (identical buckets, min-over-
    rows, integer counts)."""
    b_build = _bucket_sql("d", "k", width)
    return f"""
WITH rows_tagged AS (
  SELECT CAST({key_col} AS VARCHAR) AS k, unnest(range(0, {depth})) AS d
  FROM {table}
), sk AS (
  SELECT d, {b_build} AS bucket, COUNT(*) AS cnt
  FROM rows_tagged GROUP BY 1, 2
), cand AS (
  SELECT DISTINCT CAST({key_col} AS VARCHAR) AS key FROM {table}
), probes AS (
  SELECT key, unnest(range(0, {depth})) AS d FROM cand
), probe_buckets AS (
  SELECT key, d, {_bucket_sql("d", "key", width)} AS bucket FROM probes
), est AS (
  SELECT p.key, MIN(COALESCE(s.cnt, 0)) AS est
  FROM probe_buckets p LEFT JOIN sk s USING (d, bucket)
  GROUP BY p.key
)
SELECT key, CAST(est AS BIGINT) AS est
FROM est
ORDER BY est DESC, key
LIMIT {top_k}
"""


# --------------------------------------------------------------------------
# HDR-histogram quantile sketch
# --------------------------------------------------------------------------
#
# The third mergeable summary (KMV = cardinality, CMS = frequency, this
# = QUANTILES): an HdrHistogram-style fixed-layout log-linear histogram
# (Tene's HdrHistogram; same family as DDSketch, Masson 2019) over
# non-negative integer units. Layout for sub_bits = s:
#
#   v < 2^(s+1)            ->  bucket = v                      (exact)
#   v >= 2^(s+1), e=floor(log2 v), d=e-s
#                          ->  bucket = d*2^s + (v >> d)
#
# Every octave keeps 2^s linear sub-buckets, so a bucket's width over
# its lower bound is <= 2^-s (3.1% at s=5) and small values are EXACT.
# Why this layout and not t-digest/GK: the bucket index is PURE INTEGER
# arithmetic on the binary length of v -- deterministic on any engine,
# any partitioning, any merge order -- so the full sketch AND the
# quantile estimates replicate bit-for-bit in the DuckDB oracle
# (t-digest centroids are float-accumulation-order-dependent; that is
# exactly why profile_approx stays tests-only).
#
# Scale shape: ONE map-side-combinable count per (group, bucket) -- the
# shuffle is sketch-sized (<= groups x buckets rows), never data-sized;
# merge = groupBy SUM (closure asserted in tests); quantile extraction
# is a window over the SKETCH, not the data. The 100 TB deployment
# ships per-day / per-partition sketches and folds them by merge
# without ever re-scanning.


def _hdr_bucket_expr(v_expr: str, sub_bits: int) -> str:
    """Spark-SQL HDR bucket index of the non-negative long `{v}`.

    floor(log2 v) via the binary-string length (exact integers, never a
    float log); the variable shift uses SQL shiftright, which accepts a
    column shift amount (the python F.shiftright wrapper does not)."""
    s = sub_bits
    direct = 2 ** (s + 1)
    e = f"(length(conv(cast(({v_expr}) as string), 10, 2)) - 1)"
    d = f"({e} - {s})"
    return (
        f"(CASE WHEN ({v_expr}) < {direct} THEN ({v_expr}) "
        f"ELSE cast({d} as bigint) * {2 ** s} "
        f"+ shiftright(({v_expr}), cast({d} as int)) END)"
    )


def _hdr_bucket_sql(v_expr: str, sub_bits: int) -> str:
    """DuckDB replica of :func:`_hdr_bucket_expr` (bin() is the binary
    string; >> takes a column shift amount natively)."""
    s = sub_bits
    direct = 2 ** (s + 1)
    e = f"(length(bin(CAST(({v_expr}) AS BIGINT))) - 1)"
    d = f"({e} - {s})"
    return (
        f"(CASE WHEN ({v_expr}) < {direct} THEN ({v_expr}) "
        f"ELSE CAST({d} AS BIGINT) * {2 ** s} "
        f"+ (CAST(({v_expr}) AS BIGINT) >> CAST({d} AS INTEGER)) END)"
    )


def _hdr_lower_expr(idx_expr: str, sub_bits: int) -> str:
    """Spark-SQL lower bound of bucket ``idx`` (its smallest member):
    the exact inverse of the index map, still pure integers."""
    s = sub_bits
    direct = 2 ** (s + 1)
    d = f"(shiftright(({idx_expr}), {s}) - 1)"
    sub = f"(({idx_expr}) - cast({d} as bigint) * {2 ** s})"
    return (
        f"(CASE WHEN ({idx_expr}) < {direct} THEN ({idx_expr}) "
        f"ELSE shiftleft({sub}, cast({d} as int)) END)"
    )


def _hdr_lower_sql(idx_expr: str, sub_bits: int) -> str:
    s = sub_bits
    direct = 2 ** (s + 1)
    d = f"((({idx_expr}) >> {s}) - 1)"
    sub = f"(({idx_expr}) - CAST({d} AS BIGINT) * {2 ** s})"
    return (
        f"(CASE WHEN ({idx_expr}) < {direct} THEN ({idx_expr}) "
        f"ELSE ({sub} << CAST({d} AS INTEGER)) END)"
    )


def _to_units(value_col: str, unit: int) -> F.Column:
    """value -> non-negative integer units, loud on negative input: the
    assert is folded into the RESULT branch so the optimizer cannot
    prune it, and it raises executor-side with the offending value."""
    raw = F.col(value_col).cast("double")
    v = F.floor(raw * unit + F.lit(0.5)).cast("long")
    return F.when(
        v < 0,
        F.assert_true(
            v >= 0,
            F.concat(
                F.lit(f"hdr sketch requires non-negative {value_col}, got "),
                raw.cast("string"),
            ),
        ).cast("long"),
    ).otherwise(v)


def hdr_sketch(
    df: DataFrame,
    group_col,
    value_col: str,
    sub_bits: int = 5,
    unit: int = 1000,
) -> DataFrame:
    """(grp, bucket, cnt): the mergeable quantile sketch -- one
    map-side-combinable count per (group, HDR bucket of value in
    1/``unit`` units). ``group_col`` may be a name or a Column
    expression (e.g. a (type, hour-bucket) composite for latency
    percentile TIME SERIES)."""
    gcol = group_col if not isinstance(group_col, str) else F.col(group_col)
    v = _to_units(value_col, unit)
    return (
        df.select(
            gcol.cast("string").alias("grp"),
            v.alias("_v"),
        )
        # NULL values are IGNORED (the SQL-aggregate convention) —
        # explicitly, because a NULL bucket would order differently in
        # the two engines' windows (Spark NULLS FIRST, DuckDB NULLS
        # LAST) and silently skew the rank selection
        .filter(F.col("_v").isNotNull())
        .withColumn("bucket", F.expr(_hdr_bucket_expr("_v", sub_bits)))
        .groupBy("grp", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def hdr_merge(sketch_a: DataFrame, sketch_b: DataFrame) -> DataFrame:
    """Elementwise SUM -- sketch(A U B) == merge(sketch(A), sketch(B))
    exactly (integer counts; closure asserted in tests)."""
    return (
        sketch_a.unionByName(sketch_b)
        .groupBy("grp", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def hdr_quantiles(
    sketch: DataFrame,
    qs_ppm: tuple[int, ...] = (500_000, 900_000, 990_000),
    sub_bits: int = 5,
) -> DataFrame:
    """(grp, q_ppm, est_milli): for each requested quantile, the lower
    bound of the bucket holding the ceil(q*N)-th smallest value --
    integer rank selection over the cumulated sketch, so the estimate
    is a real data-adjacent value with relative error <= 2^-sub_bits.

    Includes a merged ``__ALL__`` row per quantile (union-of-groups via
    sum-of-sketches -- no second data pass)."""
    merged = (
        sketch.groupBy("bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
        .select(F.lit(_ALL).alias("grp"), "bucket", "cnt")
    )
    sk = sketch.select("grp", "bucket", "cnt").unionByName(merged)
    w = Window.partitionBy("grp").orderBy("bucket")
    cum = sk.select(
        "grp",
        "bucket",
        "cnt",
        F.sum("cnt").over(w).cast("long").alias("cum"),
        F.sum("cnt").over(Window.partitionBy("grp")).cast("long").alias("n"),
    )
    qlits = F.array(*[F.lit(int(q)) for q in qs_ppm])
    hit = (
        cum.withColumn("q_ppm", F.explode(qlits))
        .withColumn(
            "rank", F.expr("(q_ppm * n + 999999) div 1000000").cast("long")
        )
        .filter((F.col("cum") >= F.col("rank")) & (F.col("cum") - F.col("cnt") < F.col("rank")))
    )
    return hit.select(
        "grp",
        F.col("q_ppm").cast("long").alias("q_ppm"),
        F.expr(_hdr_lower_expr("bucket", sub_bits)).cast("long").alias("est_milli"),
    ).orderBy("grp", "q_ppm")


def hdr_quantile_table(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs_ppm: tuple[int, ...] = (500_000, 900_000, 990_000),
    sub_bits: int = 5,
    unit: int = 1000,
) -> DataFrame:
    """End-to-end: sketch then quantiles (the gate-shaped entry)."""
    return hdr_quantiles(
        hdr_sketch(df, group_col, value_col, sub_bits, unit), qs_ppm, sub_bits
    )


def hdr_oracle_sql(
    group_col: str,
    value_col: str,
    qs_ppm: tuple[int, ...] = (500_000, 900_000, 990_000),
    sub_bits: int = 5,
    unit: int = 1000,
    table: str = "events",
) -> str:
    """DuckDB replica of hdr_quantile_table -- identical bucket map,
    identical integer rank selection, identical lower-bound inverse."""
    v = f"CAST(floor(CAST({value_col} AS DOUBLE) * {unit} + 0.5) AS BIGINT)"
    bucket = _hdr_bucket_sql("_v", sub_bits)
    lower = _hdr_lower_sql("bucket", sub_bits)
    qlist = ", ".join(str(int(q)) for q in qs_ppm)
    return f"""
WITH units AS (
  SELECT CAST({group_col} AS VARCHAR) AS grp, {v} AS _v FROM {table}
  WHERE {value_col} IS NOT NULL
), sk AS (
  SELECT grp, {bucket} AS bucket, COUNT(*) AS cnt FROM units GROUP BY 1, 2
), merged AS (
  SELECT '{_ALL}' AS grp, bucket, SUM(cnt) AS cnt FROM sk GROUP BY bucket
), unioned AS (
  SELECT * FROM sk UNION ALL SELECT * FROM merged
), cum AS (
  SELECT grp, bucket, cnt,
         SUM(cnt) OVER (PARTITION BY grp ORDER BY bucket) AS cum,
         SUM(cnt) OVER (PARTITION BY grp) AS n
  FROM unioned
), hits AS (
  SELECT grp, q_ppm, bucket, cnt, cum,
         (q_ppm * n + 999999) // 1000000 AS rank
  FROM cum, (SELECT unnest([{qlist}]) AS q_ppm) qs
)
SELECT grp, CAST(q_ppm AS BIGINT) AS q_ppm,
       CAST({lower} AS BIGINT) AS est_milli
FROM hits
WHERE cum >= rank AND cum - cnt < rank
ORDER BY grp, q_ppm
"""


def hdr_bin_edges(
    sketch: DataFrame, n_bins: int = 4, sub_bits: int = 5
) -> DataFrame:
    """Per-group equi-depth bin edges from the HDR sketch: the
    (n_bins−1) interior quantile lower bounds, as a SORTED array —
    the 100 TB feature-binning recipe (a global sort computes exact
    edges at a full-shuffle cost; the sketch gives ≤2⁻ˢ-relative edges
    from a sketch-sized aggregate). Returns (grp, edges_milli)."""
    qs = tuple(i * 1_000_000 // n_bins for i in range(1, n_bins))
    q = hdr_quantiles(sketch, qs, sub_bits)
    return (
        q.filter(F.col("grp") != _ALL)
        .groupBy("grp")
        .agg(F.array_sort(F.collect_list("est_milli")).alias("edges_milli"))
    )


def assign_quantile_bins(
    df: DataFrame,
    group_col: str,
    value_col: str,
    n_bins: int = 4,
    sub_bits: int = 5,
    unit: int = 1000,
) -> DataFrame:
    """Equi-depth bin id per row: bin = #edges strictly below the value
    (0..n_bins−1), edges from the group's own HDR sketch. The edges
    table is group-sized and BROADCAST; assignment is a codegen'd
    array filter — the data shuffles only for the sketch build.
    Integer-exact end to end, so the full assignment replicates in
    DuckDB (:func:`binning_oracle_sql`)."""
    sk = hdr_sketch(df, group_col, value_col, sub_bits, unit)
    edges = hdr_bin_edges(sk, n_bins, sub_bits)
    v = _to_units(value_col, unit)
    return (
        df.select(
            F.col(group_col).cast("string").alias("grp"), v.alias("v_milli")
        )
        .join(F.broadcast(edges), "grp")
        .withColumn(
            "bin",
            F.size(
                F.filter(
                    F.col("edges_milli"), lambda e: F.col("v_milli") > e
                )
            ).cast("long"),
        )
        .select("grp", "v_milli", "bin")
        .orderBy("grp", "v_milli", "bin")
    )


def binning_oracle_sql(
    group_col: str,
    value_col: str,
    n_bins: int = 4,
    sub_bits: int = 5,
    unit: int = 1000,
    table: str = "events",
) -> str:
    """DuckDB replica of assign_quantile_bins: the same sketch, the
    same interior-quantile edges, the same strictly-below count."""
    qs = tuple(i * 1_000_000 // n_bins for i in range(1, n_bins))
    inner = hdr_oracle_sql(group_col, value_col, qs, sub_bits, unit, table)
    v = f"CAST(floor(CAST({value_col} AS DOUBLE) * {unit} + 0.5) AS BIGINT)"
    return f"""
WITH qt AS ({inner}), edges AS (
  SELECT grp, list_sort(list(est_milli)) AS edges_milli
  FROM qt WHERE grp <> '{_ALL}' GROUP BY grp
), rows_v AS (
  SELECT CAST({group_col} AS VARCHAR) AS grp, {v} AS v_milli FROM {table}
)
SELECT rows_v.grp, v_milli,
       CAST(len(list_filter(edges_milli, e -> v_milli > e)) AS BIGINT) AS bin
FROM rows_v JOIN edges USING (grp)
ORDER BY grp, v_milli, bin
"""


def kmv_overlap(
    df_a: DataFrame,
    df_b: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Join/overlap cardinality estimation from KMV sketches (Beyer et
    al. 2007 set-operation estimators) — the optimizer-statistics
    question "how many distinct keys do these two datasets share?"
    answered from two sketch-sized summaries, never a join of the data:

    - union estimate from merge(A, B) (the closure property);
    - Jaccard ρ = |U ∩ A ∩ B| / |U| over the union sketch's value set;
    - intersection ≈ ρ · est(|A ∪ B|).

    Everything after the hashes is positive-integer arithmetic
    (matches·10⁶ div |U|, then ppm·milli div 10⁶), so the whole
    estimate table replicates bit-for-bit in DuckDB. Per group:
    (grp, n_union_kept, matches, jacc_ppm, union_est_milli,
    inter_est_milli)."""
    sk_a = kmv_sketch(df_a, group_col, value_col, k)
    sk_b = kmv_sketch(df_b, group_col, value_col, k)
    u = kmv_merge(sk_a, sk_b, k)
    in_both = (
        u.join(sk_a, ["grp", "h"], "semi")
        .join(sk_b, ["grp", "h"], "semi")
        .groupBy("grp")
        .agg(F.count("*").cast("long").alias("matches"))
    )
    est = (
        u.groupBy("grp")
        .agg(
            F.count("*").cast("long").alias("n_kept"),
            F.max("h").alias("kth_min"),
        )
        .withColumn("union_est_milli", _estimate_milli(k))
    )
    return (
        est.join(in_both, "grp", "left")
        .withColumn("matches", F.coalesce(F.col("matches"), F.lit(0)).cast("long"))
        .withColumn(
            "jacc_ppm",
            F.expr("(matches * 1000000) div n_kept").cast("long"),
        )
        .withColumn(
            "inter_est_milli",
            F.expr("(jacc_ppm * union_est_milli) div 1000000").cast("long"),
        )
        .select(
            "grp",
            F.col("n_kept").alias("n_union_kept"),
            "matches",
            "jacc_ppm",
            "union_est_milli",
            "inter_est_milli",
        )
        .orderBy("grp")
    )


def kmv_overlap_oracle_sql(
    select_a: str,
    select_b: str,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> str:
    """DuckDB replica of kmv_overlap over two sub-SELECTs."""
    h = _hash40_sql(value_col)
    num = (k - 1) * 2 * _HASH_SPACE * 1000

    def sk(src, name):
        return f"""{name}_h AS (
  SELECT DISTINCT CAST({group_col} AS VARCHAR) AS grp, {h} AS h
  FROM ({src})
), {name} AS (
  SELECT grp, h FROM (
    SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
    FROM {name}_h
  ) WHERE rn <= {k}
)"""

    return f"""
WITH {sk(select_a, "ska")}, {sk(select_b, "skb")}, u AS (
  SELECT grp, h FROM (
    SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
    FROM (SELECT * FROM ska UNION SELECT * FROM skb)
  ) WHERE rn <= {k}
), matches AS (
  SELECT grp, COUNT(*) AS matches FROM u
  WHERE EXISTS (SELECT 1 FROM ska WHERE ska.grp = u.grp AND ska.h = u.h)
    AND EXISTS (SELECT 1 FROM skb WHERE skb.grp = u.grp AND skb.h = u.h)
  GROUP BY grp
), est AS (
  SELECT grp, COUNT(*) AS n_kept, MAX(h) AS kth_min FROM u GROUP BY grp
)
SELECT est.grp,
       CAST(n_kept AS BIGINT) AS n_union_kept,
       CAST(COALESCE(matches, 0) AS BIGINT) AS matches,
       CAST((COALESCE(matches, 0) * 1000000) // n_kept AS BIGINT) AS jacc_ppm,
       CAST(CASE WHEN n_kept < {k} THEN n_kept * 1000
                 ELSE CAST({num} // (2 * kth_min + 1) AS BIGINT)
            END AS BIGINT) AS union_est_milli,
       CAST(((COALESCE(matches, 0) * 1000000) // n_kept)
            * (CASE WHEN n_kept < {k} THEN n_kept * 1000
                    ELSE CAST({num} // (2 * kth_min + 1) AS BIGINT) END)
            // 1000000 AS BIGINT) AS inter_est_milli
FROM est LEFT JOIN matches USING (grp)
ORDER BY est.grp
"""
