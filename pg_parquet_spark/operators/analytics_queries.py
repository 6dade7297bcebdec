"""Round-7 operator additions: relational analytics surface (PIVOT /
UNPIVOT / lateral explode / range join / per-group top-k / mode /
distribution windows / bitwise / null-ordering / greatest-least) and
pipeline operators (unigram LM scoring, cohort retention, stratified
sampling, segment-level dedup).

Every gate is paired with a DuckDB oracle; all float paths are
integer-quantized or rounded per the project's determinism contract
(ln() may differ by 1-2 ULP across engines — quantize to 1e-6 BEFORE
any cross-row fold, keep integer arithmetic after).

Scale notes are inline per operator; the common rules: aggregates are
partial+final (map-side combine), joins carry an equi key so the range
predicate rides a hash/sort-merge join rather than a BNLJ, and
per-document text work is a single JVM projection (explode + groupBy
shuffles only the narrow derived columns, never the text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg_parquet_spark.session import table


# --- PIVOT / UNPIVOT -------------------------------------------------------


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT with an EXPLICIT value list (reference surface: delegated
    SQL tier; PostgreSQL expresses this as crosstab/FILTER aggregates).
    Explicit values matter at scale: without them Spark first runs a
    distinct-values job over the pivot column — a full extra scan."""
    orders = table(spark, sf_dir, "orders")
    wide = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return (
        wide.select(
            "o_orderpriority",
            F.coalesce(F.col("F"), F.lit(0)).alias("cnt_f"),
            F.coalesce(F.col("O"), F.lit(0)).alias("cnt_o"),
            F.coalesce(F.col("P"), F.lit(0)).alias("cnt_p"),
        )
        .orderBy("o_orderpriority")
    )


Q_PIVOT_ORACLE = """
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS cnt_f,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS cnt_o,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS cnt_p
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide→long melt): the inverse reshaping — three status
    count columns melt into (status, cnt) rows. A pure projection after
    the aggregate: one shuffle total, the melt itself is row-local."""
    orders = table(spark, sf_dir, "orders")
    wide = orders.groupBy("o_orderpriority").agg(
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("F"),
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("O"),
        F.count(F.when(F.col("o_orderstatus") == "P", 1)).alias("P"),
    )
    return (
        wide.unpivot(
            ["o_orderpriority"], ["F", "O", "P"], "status", "cnt"
        )
        .filter(F.col("cnt") > 0)
        .orderBy("o_orderpriority", "status")
    )


Q_UNPIVOT_ORACLE = """
WITH wide AS (
  SELECT o_orderpriority,
         COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS f,
         COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS o,
         COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS p
  FROM orders GROUP BY o_orderpriority
), long AS (
  SELECT o_orderpriority, 'F' AS status, f AS cnt FROM wide
  UNION ALL SELECT o_orderpriority, 'O', o FROM wide
  UNION ALL SELECT o_orderpriority, 'P', p FROM wide
)
SELECT * FROM long WHERE cnt > 0 ORDER BY o_orderpriority, status
"""


# --- lateral explode with position ----------------------------------------


def q_explode_pos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW posexplode (array fan-out WITH ordinal) — the
    tokenize-and-keep-position primitive sequence-labeling pipelines
    need. Row-local fan-out: no shuffle at all until the ORDER BY."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 25)
    words = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    )
    return words.orderBy("doc_id", "pos")


Q_EXPLODE_POS_ORACLE = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
  WHERE doc_id < 25
), e AS (
  SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS i FROM w
)
SELECT doc_id, CAST(i - 1 AS INT) AS pos, ws[i] AS word
FROM e ORDER BY doc_id, pos
"""


# --- range join ------------------------------------------------------------


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) self-join with an equi anchor: every order
    pairs with the SAME customer's follow-up orders placed within the
    next 30 days (repeat-purchase latency). The equi key (custkey)
    makes this a hash/sort-merge join with the range as a residual
    predicate — never a broadcast nested loop. At 100 TB: bucket both
    sides on the key; a pure range join (no equi key) would instead
    need range partitioning on time. Gap stats stay in integer days."""
    orders = table(spark, sf_dir, "orders")
    a = orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("first_key"),
        F.col("o_orderdate").alias("first_date"),
        F.col("o_orderstatus").alias("first_status"),
    )
    b = orders.select(
        F.col("o_custkey").alias("next_custkey"),
        F.col("o_orderkey").alias("next_key"),
        F.col("o_orderdate").alias("next_date"),
    )
    j = a.join(
        b,
        (F.col("custkey") == F.col("next_custkey"))
        & (F.col("next_date") > F.col("first_date"))
        & (F.col("next_date") <= F.col("first_date") + F.expr("INTERVAL 30 DAYS")),
    )
    return (
        j.groupBy("first_status")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("custkey").alias("n_customers"),
            F.sum(F.expr("datediff(next_date, first_date)")).alias("sum_gap_days"),
        )
        .orderBy("first_status")
    )


Q_RANGE_JOIN_ORACLE = """
SELECT a.o_orderstatus AS first_status,
       COUNT(*) AS n_pairs,
       COUNT(DISTINCT a.o_custkey) AS n_customers,
       CAST(SUM(date_diff('day', a.o_orderdate, b.o_orderdate)) AS BIGINT) AS sum_gap_days
FROM orders a
JOIN orders b
  ON a.o_custkey = b.o_custkey
 AND b.o_orderdate > a.o_orderdate
 AND b.o_orderdate <= a.o_orderdate + INTERVAL 30 DAY
GROUP BY a.o_orderstatus ORDER BY first_status
"""


# --- per-group top-k -------------------------------------------------------


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price per priority class (row_number window with
    a deterministic orderkey tie-break) — the grouped variant of the
    global TakeOrderedAndProject. One shuffle on the partition key;
    at scale the window's per-group sort is the cost, so k-per-group
    over a high-cardinality key should pre-aggregate or use
    monotonic pruning; for low-cardinality groups this shape is
    optimal."""
    from pyspark.sql import Window

    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_orderpriority", "rn")
    )


Q_TOPK_PER_GROUP_ORACLE = """
SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3 ORDER BY o_orderpriority, rn
"""


# --- mode (most frequent value) -------------------------------------------


def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modal value per group with an explicit deterministic tie-break
    (smallest value among the most frequent) — spelled out as
    count + max_by instead of the engines' mode() builtins, whose tie
    behavior is unspecified and engine-dependent. Two narrow shuffles
    on (flag, mode) then (flag)."""
    orders = table(spark, sf_dir, "orders")
    counts = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # min_by on (-cnt, priority) == most frequent, ties to the
    # alphabetically smallest priority
    return (
        counts.groupBy("o_orderstatus")
        .agg(
            F.expr(
                "min_by(o_orderpriority, struct(-cnt, o_orderpriority))"
            ).alias("modal_priority"),
            F.max("cnt").alias("modal_cnt"),
        )
        .orderBy("o_orderstatus")
    )


Q_AGG_MODE_ORACLE = """
WITH c AS (
  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
  FROM orders GROUP BY 1, 2
), r AS (
  SELECT o_orderstatus, o_orderpriority, cnt,
         ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                            ORDER BY cnt DESC, o_orderpriority) AS rn
  FROM c
)
SELECT o_orderstatus, o_orderpriority AS modal_priority, cnt AS modal_cnt
FROM r WHERE rn = 1 ORDER BY o_orderstatus
"""


# --- distribution windows --------------------------------------------------


def q_window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist per market segment over account
    balance (the remaining distribution window functions; rank/ntile/
    frames are separate gates). Both are exact rationals of rank and
    count, quantized via floor(x*1e6 + 0.5) rather than ROUND: an
    integer ratio CAN terminate exactly at a half (1/640 = .0015625),
    where ROUND on a double is engine-divergent (the q_scalar_math
    lesson, r8) — the floor form is a fixed IEEE sequence both engines
    compute identically at every input, ties included. Tie-broken on
    the key column."""
    from pyspark.sql import Window

    cust = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal"), F.col("c_custkey")
    )
    return (
        cust.select(
            "c_mktsegment",
            "c_custkey",
            (F.floor(F.percent_rank().over(w) * 1e6 + F.lit(0.5)) / 1e6)
            .alias("pct_rank"),
            (F.floor(F.cume_dist().over(w) * 1e6 + F.lit(0.5)) / 1e6)
            .alias("cume"),
        )
        .filter(F.col("c_custkey") < 300)
        .orderBy("c_mktsegment", "c_custkey")
    )


Q_WINDOW_PERCENT_RANK_ORACLE = """
SELECT c_mktsegment, c_custkey,
       FLOOR(PERCENT_RANK() OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal, c_custkey) * 1e6 + 0.5)
         / 1e6 AS pct_rank,
       FLOOR(CUME_DIST() OVER (PARTITION BY c_mktsegment
                               ORDER BY c_acctbal, c_custkey) * 1e6 + 0.5)
         / 1e6 AS cume
FROM customer QUALIFY c_custkey < 300 ORDER BY c_mktsegment, c_custkey
"""


# --- bitwise scalar surface ------------------------------------------------


def q_scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise AND/OR/XOR/shift scalar functions (PostgreSQL operator
    parity) — pure codegen projection."""
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    return orders.select(
        "o_orderkey",
        F.expr("o_orderkey & 255").alias("band"),
        F.expr("o_orderkey | 4096").alias("bor"),
        F.expr("o_orderkey ^ o_custkey").alias("bxor"),
        F.shiftleft(F.col("o_custkey"), 3).alias("shl"),
        F.shiftright(F.col("o_orderkey"), 2).alias("shr"),
    ).orderBy("o_orderkey")


Q_SCALAR_BITWISE_ORACLE = """
SELECT o_orderkey,
       o_orderkey & 255 AS band,
       o_orderkey | 4096 AS bor,
       xor(o_orderkey, o_custkey) AS bxor,
       o_custkey << 3 AS shl,
       o_orderkey >> 2 AS shr
FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey
"""


# --- null-ordering sort ----------------------------------------------------


def q_sort_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULLS FIRST / NULLS LAST ordering parity: with a LIMIT the null
    placement decides the result SET, not just its order (the driver's
    hash is order-insensitive, so limit is what makes this a real
    gate). Unique event_id tie-break gives a total order."""
    ev = table(spark, sf_dir, "events")
    keyed = ev.select(
        "event_id",
        F.nullif(F.col("event_type"), F.lit("click")).alias("k"),
        "value",
    )
    return (
        keyed.orderBy(
            F.col("k").asc_nulls_first(),
            F.col("value").desc(),
            F.col("event_id"),
        )
        .limit(50)
        .select("event_id", "k", F.round("value", 2).alias("value"))
    )


Q_SORT_NULLS_ORACLE = """
SELECT event_id, NULLIF(event_type, 'click') AS k, ROUND(value, 2) AS value
FROM events
ORDER BY NULLIF(event_type, 'click') ASC NULLS FIRST, value DESC, event_id
LIMIT 50
"""


# --- greatest / least ------------------------------------------------------


def q_greatest_least(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GREATEST / LEAST with NULL-skipping semantics (PostgreSQL
    behavior: NULL only if ALL arguments are NULL; both Spark and
    DuckDB match) — row-local projection."""
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    price = F.col("o_totalprice").cast("decimal(14,2)")
    return orders.select(
        "o_orderkey",
        F.greatest(
            price, F.lit(200000).cast("decimal(14,2)"),
            F.nullif(price, price),  # always NULL — must be skipped
        ).cast("double").alias("hi"),
        F.least(price, F.lit(200000).cast("decimal(14,2)"))
        .cast("double")
        .alias("lo"),
    ).orderBy("o_orderkey")


Q_GREATEST_LEAST_ORACLE = """
SELECT o_orderkey,
       CAST(GREATEST(CAST(o_totalprice AS DECIMAL(14,2)),
                     CAST(200000 AS DECIMAL(14,2)), NULL) AS DOUBLE) AS hi,
       CAST(LEAST(CAST(o_totalprice AS DECIMAL(14,2)),
                  CAST(200000 AS DECIMAL(14,2))) AS DOUBLE) AS lo
FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey
"""


# --- unigram LM scoring ----------------------------------------------------


def q_text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model scoring (the cheapest member of the
    KenLM-style perplexity-filter family): fit corpus unigram
    probabilities, score every document by its mean negative log
    probability. High scores = improbable/rare-word documents — a
    quality-filter signal complementary to the Gopher rules.

    Determinism: each word's -ln p is quantized to 1e-6 (integer
    micro-nats) BEFORE the per-document fold, so the cross-row sum is
    exact integer arithmetic — ln() ULP drift between engines cannot
    accumulate. Scale: the corpus explodes ONCE into per-document term
    counts (doc_id, w, c) — everything downstream (vocabulary,
    corpus total, scoring join) works off that compact table, so the
    raw text is read a single time and never shuffles; the shuffles
    that remain are token-keyed over counts."""
    docs = table(spark, sf_dir, "documents")
    # single explode → per-doc term counts; |tf| ≤ Σ distinct terms
    # per doc, far smaller than the raw word stream
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    vocab = tf.groupBy("w").agg(F.sum("c").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    scored = (
        tf.join(vocab, "w")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "c",
            F.floor(
                -F.log(F.col("cnt") / F.col("total")) * 1e6 + F.lit(0.5)
            ).alias("nll_micro"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_words"),
            F.expr("sum(nll_micro * c) div sum(c)").alias("mean_nll_micro"),
        )
        .orderBy("doc_id")
    )


Q_TEXT_UNIGRAM_ORACLE = """
WITH tf AS (
  SELECT doc_id, w, COUNT(*) AS c FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
  ) GROUP BY doc_id, w
), vocab AS (
  SELECT w, SUM(c) AS cnt FROM tf GROUP BY w
), tot AS (
  SELECT SUM(cnt) AS total FROM vocab
), scored AS (
  SELECT doc_id, c,
         CAST(FLOOR(-LN(CAST(cnt AS DOUBLE) / total) * 1e6 + 0.5) AS BIGINT)
           AS nll_micro
  FROM tf JOIN vocab USING (w) CROSS JOIN tot
)
SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
       CAST(SUM(nll_micro * c) // SUM(c) AS BIGINT) AS mean_nll_micro
FROM scored GROUP BY doc_id ORDER BY doc_id
"""


# --- cohort retention ------------------------------------------------------


def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-activity week,
    distinct actives per week offset — the engagement matrix every
    product-analytics stack computes. Two shuffles (per-user min, then
    cohort×offset distinct-count); the user-keyed first-week table
    would be broadcast at dimension scale."""
    ev = table(spark, sf_dir, "events").select("user_id", "ts")
    wk = ev.select("user_id", F.date_trunc("week", "ts").alias("wk"))
    first = wk.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    return (
        wk.join(first, "user_id")
        .select(
            F.col("cohort").cast("date").alias("cohort_week"),
            F.expr("datediff(wk, cohort) div 7").alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


Q_EVENTS_RETENTION_ORACLE = """
WITH wk AS (
  SELECT user_id, date_trunc('week', ts) AS wk FROM events
), first AS (
  SELECT user_id, MIN(wk) AS cohort FROM wk GROUP BY user_id
)
SELECT CAST(cohort AS DATE) AS cohort_week,
       CAST(date_diff('day', cohort, wk) / 7 AS BIGINT) AS week_offset,
       COUNT(DISTINCT wk.user_id) AS n_users
FROM wk JOIN first ON wk.user_id = first.user_id
GROUP BY 1, 2 ORDER BY cohort_week, week_offset
"""


# --- stratified sampling ---------------------------------------------------

#: per-language sampling rates; unlisted languages fall to the default.
#: Content-hash thresholds (not Bernoulli draws) — reproducible across
#: runs, engines, and cluster sizes, like sample_deterministic.
STRATA_RATES = {"en": 0.5, "de": 0.25, "fr": 0.2}
STRATA_DEFAULT = 0.1


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: each language stratum keeps
    its own hash-threshold fraction — the data-mixture rebalancing
    primitive (upweight head languages, cap the tail) expressed as a
    pure filter. No shuffle at all: the md5 threshold is row-local,
    so this composes with any downstream plan for free."""
    docs = table(spark, sf_dir, "documents")
    u = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10).cast(
        "bigint"
    ) / F.lit(16777216.0)
    rate = F.lit(STRATA_DEFAULT)
    for lang, r in STRATA_RATES.items():
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    kept = docs.filter(u < rate)
    return (
        kept.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_kept"), F.min("doc_id").alias("first_doc"))
        .orderBy("lang")
    )


Q_SAMPLE_STRATIFIED_ORACLE = f"""
WITH u AS (
  SELECT doc_id, lang,
         CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT)
           / 16777216.0 AS unif,
         CASE lang WHEN 'en' THEN {STRATA_RATES["en"]}
                   WHEN 'de' THEN {STRATA_RATES["de"]}
                   WHEN 'fr' THEN {STRATA_RATES["fr"]}
                   ELSE {STRATA_DEFAULT} END AS rate
  FROM documents
)
SELECT lang, COUNT(*) AS n_kept, MIN(doc_id) AS first_doc
FROM u WHERE unif < rate GROUP BY lang ORDER BY lang
"""


# --- segment-level exact dedup --------------------------------------------


def q_dedup_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph/segment-level exact dedup (the Dolma recipe's
    paragraph pass, adapted to 16-word segments since the corpus has no
    newlines): hash every segment, count global occurrences, report
    per-document duplicated-segment fractions. Complements whole-doc
    exact dedup (q_dedup_exact) and winnowing substring dup
    (q_dedup_winnow): this one removes repeated boilerplate blocks.

    Scale: only (doc_id, 16-byte segment hash) shuffles — the text
    stays columnar at rest. Occurrence counts are a partial+final agg
    on the hash key; the fraction math is integer (ppm) arithmetic."""
    docs = table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    n_seg = F.ceil(F.size(words) / F.lit(16.0)).cast("int")
    segs = docs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_seg - 1),
                lambda s: F.md5(
                    F.array_join(F.slice(words, s * 16 + 1, 16), " ")
                ),
            )
        ).alias("seg", "h"),
    )
    occ = segs.groupBy("h").agg(F.count(F.lit(1)).alias("occ"))
    per_doc = (
        segs.join(occ, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum(F.when(F.col("occ") > 1, 1).otherwise(0)).alias("n_dup"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_segments",
        "n_dup",
        F.expr("(n_dup * 1000000) div n_segments").alias("dup_ppm"),
    ).orderBy("doc_id")


Q_DEDUP_SEGMENTS_ORACLE = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), seg AS (
  SELECT doc_id,
         unnest(range(0, CAST(ceil(len(ws) / 16.0) AS BIGINT))) AS s, ws
  FROM w
), hashed AS (
  SELECT doc_id, s,
         md5(array_to_string(list_slice(ws, s * 16 + 1, s * 16 + 16), ' ')) AS h
  FROM seg
), occ AS (
  SELECT h, COUNT(*) AS occ FROM hashed GROUP BY h
), per_doc AS (
  SELECT doc_id, COUNT(*) AS n_segments,
         SUM(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS n_dup
  FROM hashed JOIN occ USING (h) GROUP BY doc_id
)
SELECT doc_id, n_segments, CAST(n_dup AS BIGINT) AS n_dup,
       CAST((n_dup * 1000000) // n_segments AS BIGINT) AS dup_ppm
FROM per_doc ORDER BY doc_id
"""


# --- boolean aggregates ------------------------------------------------------


def q_agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bool_and / bool_or aggregates (PostgreSQL every()/bool_or()
    catalog parity) per group — partial+final like any hash agg."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
            F.bool_or(F.col("o_totalprice") > 400000).alias("any_over_400k"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy("o_orderpriority")
    )


Q_AGG_BOOL_ORACLE = """
SELECT o_orderpriority,
       BOOL_AND(o_totalprice > 1000) AS all_over_1k,
       BOOL_OR(o_totalprice > 400000) AS any_over_400k,
       COUNT(*) AS cnt
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# --- trigonometric / transcendental scalars ---------------------------------


def q_scalar_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sin/cos/atan2/radians/degrees scalar functions (PG math catalog
    parity) — quantized to 6 decimals via floor(x*1e6 + 0.5) (NOT
    ROUND, which is engine-divergent at exact decimal halves; ADVICE
    r10) to absorb libm ULP differences between engines, per the
    project determinism contract."""
    cust = table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    x = F.col("c_acctbal")
    return cust.select(
        "c_custkey",
        (F.floor(F.sin(F.radians(x)) * 1e6 + F.lit(0.5)) / 1e6).alias("sin_r"),
        (F.floor(F.cos(F.radians(x)) * 1e6 + F.lit(0.5)) / 1e6).alias("cos_r"),
        (F.floor(F.atan2(x, F.lit(100.0)) * 1e6 + F.lit(0.5)) / 1e6).alias("at2"),
        (F.floor(F.degrees(F.atan(x / F.lit(1000.0))) * 1e6 + F.lit(0.5)) / 1e6)
        .alias("deg_at"),
    ).orderBy("c_custkey")


Q_SCALAR_TRIG_ORACLE = """
SELECT c_custkey,
       FLOOR(SIN(RADIANS(c_acctbal)) * 1e6 + 0.5) / 1e6 AS sin_r,
       FLOOR(COS(RADIANS(c_acctbal)) * 1e6 + 0.5) / 1e6 AS cos_r,
       FLOOR(ATAN2(c_acctbal, 100.0) * 1e6 + 0.5) / 1e6 AS at2,
       FLOOR(DEGREES(ATAN(c_acctbal / 1000.0)) * 1e6 + 0.5) / 1e6 AS deg_at
FROM customer WHERE c_custkey < 200 ORDER BY c_custkey
"""


# --- ordered string aggregation ---------------------------------------------


def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (PostgreSQL string_agg(x, ',' ORDER
    BY x)): collect_list is partition-order-dependent, so the
    deterministic Spark spelling sorts the collected array before
    joining — the only ordering contract that survives distributed
    execution."""
    nation = table(spark, sf_dir, "nation")
    return (
        nation.groupBy("n_regionkey")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list("n_name")), ","
            ).alias("nations"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("n_regionkey")
    )


Q_STRING_AGG_ORACLE = """
SELECT n_regionkey,
       STRING_AGG(n_name, ',' ORDER BY n_name) AS nations,
       COUNT(*) AS n
FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
"""


# --- r8 additions: time-series gap-fill, exact-moment outliers, -----------
# --- Markov transition matrix ----------------------------------------------


def q_timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-fill (LOCF): daily per-type totals joined onto a
    generated date spine, missing days carried forward — the resampling
    primitive behind every dashboard and feature-store daily series
    (PostgreSQL generate_series + window; TimescaleDB's
    time_bucket_gapfill/locf). A sparse event sample (id % 37) forces
    real gaps in the fixture.

    Scale shape: the spine is generated MAP-SIDE from each key's
    min/max aggregate (sequence + explode — no driver collect, no
    cross-join against a calendar table). The raw events shuffle
    exactly once (into the daily aggregate); every later exchange
    moves only aggregated rows bounded by keys × days — the daily
    totals broadcast into the spine join (plan-asserted in
    tests/test_analytics_ops.py) and the LOCF window partitions on
    the series key. Day totals fold through DECIMAL so the carried
    values are engine-exact."""
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events").filter(F.col("event_id") % 37 == 0)
    daily = (
        ev.select(
            "event_type",
            F.to_date("ts").alias("day"),
            F.col("value").cast("decimal(18,6)").alias("v"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("v").alias("day_total"))
    )
    spine = (
        daily.groupBy("event_type")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "event_type",
            F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(daily, ["event_type", "day"], "left")
        .select(
            "event_type",
            F.col("day").cast("date").alias("day"),
            F.last("day_total", ignorenulls=True)
            .over(w)
            .cast("double")
            .alias("filled_total"),
            F.col("day_total").isNull().alias("is_gap"),
        )
        .orderBy("event_type", "day")
    )


Q_TIMESERIES_GAPFILL_ORACLE = """
WITH ev AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(value AS DECIMAL(18,6)) AS v
  FROM events WHERE event_id % 37 = 0
), daily AS (
  SELECT event_type, day, SUM(v) AS day_total FROM ev GROUP BY 1, 2
), bounds AS (
  SELECT event_type, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1
), spine AS (
  SELECT event_type,
         CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                     CAST(d1 AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
)
SELECT s.event_type, s.day,
       CAST(last_value(d.day_total IGNORE NULLS) OVER (
         PARTITION BY s.event_type ORDER BY s.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS filled_total,
       d.day_total IS NULL AS is_gap
FROM spine s LEFT JOIN daily d
  ON s.event_type = d.event_type AND s.day = d.day
ORDER BY s.event_type, s.day
"""


def q_outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier flagging — the data-quality screen run
    before any metric lands in a training mix or a dashboard. Mean and
    variance come from EXACT decimal sums (Σv, Σv²) rather than
    float aggregates: cross-row double summation is
    partitioning-order-dependent, so stddev_samp would drift between
    engines and between cluster layouts — the one-pass moment identity
    over DECIMAL is both deterministic and still a single map-side
    combinable aggregate. The per-group moments broadcast back onto the
    events, so the only shuffle is the 5-group aggregate."""
    ev = table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    v = F.col("value").cast("decimal(18,6)")
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).alias("s1"),
        F.sum(v * v).alias("s2"),
    )
    j = ev.join(F.broadcast(stats), "event_type")
    nd = F.col("n").cast("double")
    s1d = F.col("s1").cast("double")
    s2d = F.col("s2").cast("double")
    mean = s1d / nd
    var = (s2d - s1d * s1d / nd) / (nd - F.lit(1.0))
    # degenerate groups (constant value or n=1) have var <= 0 (or NULL
    # from the n-1 zero divisor): Spark's Divide NULLs on a zero divisor
    # while DuckDB's IEEE doubles yield inf/nan, so gate on var > 0 —
    # the SAME double on both engines — and emit NULL (ADVICE r8)
    z = F.when(var > 0, (F.col("value") - mean) / F.sqrt(var))
    return (
        j.select(
            "event_id",
            "event_type",
            "value",
            F.round(z, 6).alias("zscore"),
        )
        .filter(F.abs(F.col("zscore")) > 3)
        .orderBy("event_id")
    )


Q_OUTLIER_ZSCORE_ORACLE = """
WITH stats AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(CAST(value AS DECIMAL(18,6))) AS s1,
         SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)))
           AS s2
  FROM events GROUP BY event_type
), moments AS (
  SELECT event_type,
         CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
         (CAST(s2 AS DOUBLE)
          - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
         / (CAST(n AS DOUBLE) - 1.0) AS var
  FROM stats
), scored AS (
  -- var > 0 gates degenerate groups identically to the engine: the var
  -- double is the same IEEE sequence both sides, and NULL/inf/nan paths
  -- never reach the sqrt (ADVICE r8)
  SELECT e.event_id, e.event_type, e.value,
         CASE WHEN var > 0
              THEN ROUND((e.value - mean) / sqrt(var), 6) END AS zscore
  FROM events e JOIN moments USING (event_type)
)
SELECT event_id, event_type, value, zscore
FROM scored WHERE abs(zscore) > 3 ORDER BY event_id
"""


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: lead() within (user, time) order, then count + row
    probability per from-state — behavioral-model estimation (and the
    next-token analogue for event streams). Ties on ts break on
    event_id so the sequence is total-ordered on any engine.

    Scale shape: one shuffle to sequence per user (window), one 25-row
    aggregate; the probability normalization is a window over the
    5-row from-state margin, not a second scan."""
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = ev.select(
        "event_type", F.lead("event_type").over(seq).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    counts = nxt.groupBy("event_type", "next_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    margin = Window.partitionBy("event_type")
    return counts.select(
        "event_type",
        "next_type",
        "cnt",
        # floor-quantized, not ROUND: an integer count ratio can land
        # exactly on a half (1/640), where double ROUND diverges between
        # engines — floor(x*1e6+0.5) is engine-exact at every input
        (F.floor(F.col("cnt") / F.sum("cnt").over(margin) * 1e6 + F.lit(0.5)) / 1e6)
        .alias("prob"),
    ).orderBy("event_type", "next_type")


Q_EVENT_TRANSITIONS_ORACLE = """
WITH seq AS (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
), counts AS (
  SELECT event_type, next_type, COUNT(*) AS cnt
  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
)
SELECT event_type, next_type, cnt,
       FLOOR(cnt / SUM(cnt) OVER (PARTITION BY event_type) * 1e6 + 0.5)
         / 1e6 AS prob
FROM counts ORDER BY event_type, next_type
"""


# --- r10 merged scalar surface + OHLC rollup gate ---------------------------


def q_scalar_misc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged scalar-catalog gate (r10, the q_scalar_collections merge
    pattern): bitwise AND/OR/XOR/shifts, GREATEST/LEAST with
    NULL-skipping, and sin/cos/atan2/radians/degrees — the surfaces of
    retired q_scalar_bitwise + q_greatest_least + q_scalar_trig (all
    three stay oracle-checked in tests/test_retired_gates.py) in ONE
    scan and one codegen projection. Trig quantizes to 6 decimals via
    the floor(x*1e6 + 0.5) micro-unit idiom (NOT ROUND — double ROUND
    is engine-divergent at exact decimal halves; ADVICE r10) to absorb
    libm ULP drift, per the determinism contract."""
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    price = F.col("o_totalprice").cast("decimal(14,2)")
    x = F.col("o_totalprice")
    return orders.select(
        "o_orderkey",
        F.expr("o_orderkey & 255").alias("band"),
        F.expr("o_orderkey | 4096").alias("bor"),
        F.expr("o_orderkey ^ o_custkey").alias("bxor"),
        F.shiftleft(F.col("o_custkey"), 3).alias("shl"),
        F.shiftright(F.col("o_orderkey"), 2).alias("shr"),
        F.greatest(
            price, F.lit(200000).cast("decimal(14,2)"),
            F.nullif(price, price),  # always NULL — must be skipped
        ).cast("double").alias("hi"),
        F.least(price, F.lit(200000).cast("decimal(14,2)"))
        .cast("double")
        .alias("lo"),
        (F.floor(F.sin(F.radians(x)) * 1e6 + F.lit(0.5)) / 1e6).alias("sin_r"),
        (F.floor(F.cos(F.radians(x)) * 1e6 + F.lit(0.5)) / 1e6).alias("cos_r"),
        (F.floor(F.atan2(x, F.lit(100.0)) * 1e6 + F.lit(0.5)) / 1e6).alias("at2"),
        (F.floor(F.degrees(F.atan(x / F.lit(1000.0))) * 1e6 + F.lit(0.5)) / 1e6)
        .alias("deg_at"),
    ).orderBy("o_orderkey")


Q_SCALAR_MISC_ORACLE = """
SELECT o_orderkey,
       o_orderkey & 255 AS band,
       o_orderkey | 4096 AS bor,
       xor(o_orderkey, o_custkey) AS bxor,
       o_custkey << 3 AS shl,
       o_orderkey >> 2 AS shr,
       CAST(GREATEST(CAST(o_totalprice AS DECIMAL(14,2)),
                     CAST(200000 AS DECIMAL(14,2)), NULL) AS DOUBLE) AS hi,
       CAST(LEAST(CAST(o_totalprice AS DECIMAL(14,2)),
                  CAST(200000 AS DECIMAL(14,2))) AS DOUBLE) AS lo,
       FLOOR(SIN(RADIANS(o_totalprice)) * 1e6 + 0.5) / 1e6 AS sin_r,
       FLOOR(COS(RADIANS(o_totalprice)) * 1e6 + 0.5) / 1e6 AS cos_r,
       FLOOR(ATAN2(o_totalprice, 100.0) * 1e6 + 0.5) / 1e6 AS at2,
       FLOOR(DEGREES(ATAN(o_totalprice / 1000.0)) * 1e6 + 0.5) / 1e6 AS deg_at
FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey
"""


def q_rollup_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate (r9 family, r10 gate):
    per-(event_type, hour-bucket) OHLC — count, exact DECIMAL sum,
    min/max, and first/last value by event time on the guarded packed
    order key. One (key, bucket)-keyed shuffle with full map-side
    partial aggregation; shuffle volume is the bucket count."""
    from pg_parquet_spark.operators import timeseries

    events = table(spark, sf_dir, "events")
    return timeseries.rollup_time_buckets(events, width_sec=3600)


def _rollup_ohlc_oracle() -> str:
    from pg_parquet_spark.operators import timeseries

    return timeseries.rollup_oracle_sql(width_sec=3600)


QUERIES = {
    "q_timeseries_gapfill": q_timeseries_gapfill,
    "q_scalar_misc": q_scalar_misc,
    "q_rollup_ohlc": q_rollup_ohlc,
    "q_outlier_zscore": q_outlier_zscore,
    "q_event_transitions": q_event_transitions,
    "q_pivot": q_pivot,
    "q_unpivot": q_unpivot,
    "q_explode_pos": q_explode_pos,
    "q_range_join": q_range_join,
    "q_topk_per_group": q_topk_per_group,
    "q_agg_mode": q_agg_mode,
    "q_window_percent_rank": q_window_percent_rank,
    "q_scalar_bitwise": q_scalar_bitwise,
    "q_sort_nulls": q_sort_nulls,
    "q_greatest_least": q_greatest_least,
    "q_text_unigram_logprob": q_text_unigram_logprob,
    "q_events_retention": q_events_retention,
    "q_sample_stratified": q_sample_stratified,
    "q_dedup_segments": q_dedup_segments,
    "q_agg_bool": q_agg_bool,
    "q_scalar_trig": q_scalar_trig,
    "q_string_agg": q_string_agg,
}

ORACLES = {
    "q_timeseries_gapfill": Q_TIMESERIES_GAPFILL_ORACLE,
    "q_scalar_misc": Q_SCALAR_MISC_ORACLE,
    "q_rollup_ohlc": _rollup_ohlc_oracle(),
    "q_outlier_zscore": Q_OUTLIER_ZSCORE_ORACLE,
    "q_event_transitions": Q_EVENT_TRANSITIONS_ORACLE,
    "q_pivot": Q_PIVOT_ORACLE,
    "q_unpivot": Q_UNPIVOT_ORACLE,
    "q_explode_pos": Q_EXPLODE_POS_ORACLE,
    "q_range_join": Q_RANGE_JOIN_ORACLE,
    "q_topk_per_group": Q_TOPK_PER_GROUP_ORACLE,
    "q_agg_mode": Q_AGG_MODE_ORACLE,
    "q_window_percent_rank": Q_WINDOW_PERCENT_RANK_ORACLE,
    "q_scalar_bitwise": Q_SCALAR_BITWISE_ORACLE,
    "q_sort_nulls": Q_SORT_NULLS_ORACLE,
    "q_greatest_least": Q_GREATEST_LEAST_ORACLE,
    "q_text_unigram_logprob": Q_TEXT_UNIGRAM_ORACLE,
    "q_events_retention": Q_EVENTS_RETENTION_ORACLE,
    "q_sample_stratified": Q_SAMPLE_STRATIFIED_ORACLE,
    "q_dedup_segments": Q_DEDUP_SEGMENTS_ORACLE,
    "q_agg_bool": Q_AGG_BOOL_ORACLE,
    "q_scalar_trig": Q_SCALAR_TRIG_ORACLE,
    "q_string_agg": Q_STRING_AGG_ORACLE,
}
