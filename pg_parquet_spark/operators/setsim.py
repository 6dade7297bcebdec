"""Exact set-similarity self-join by PREFIX FILTERING (Chaudhuri 2006
SSJoin / Xiao 2008 PPJoin): enumerate ALL document pairs with token-set
Jaccard ≥ θ — no probabilistic recall bound — without all-pairs cost.

This is the third, exact tier of the near-dup family and the one with a
completeness guarantee:

- ``q_dedup_minhash_lsh`` — banded LSH, tunable recall, cheapest;
- ``q_dedup_ngram_jaccard`` — min-shingle pre-filter, recall ≥ J;
- **this** — every qualifying pair, exactly (oracle equality against
  the all-pairs join IS the recall proof, tests at both SFs).

How the quadratic collapses: order the vocabulary by ascending document
frequency (rarest first, ties on the token). A set of size n with
Jaccard threshold θ keeps only its first  p = n − ⌈θ·n⌉ + 1  tokens in
that order (its PREFIX): two sets whose prefixes are disjoint provably
cannot reach θ, so candidates are generated ONLY by equi-joining prefix
tokens — and because prefixes are the RAREST tokens, the posting lists
being joined are the shortest ones. A symmetric length filter
(θ·max(n_a,n_b) ≤ min(n_a,n_b), in exact ppm integers) prunes further
before verification.

Scale shape: documents shuffle as integer rank arrays (tokens never
move as strings past the ranking join); the verify step touches
candidate pairs only, computing the exact intersection with
array_intersect on sorted distinct int arrays — or, when the corpus
vocabulary fits 64 ranked tokens (read as one scalar off the persisted
array table), as ``bit_count`` over 64-bit membership masks: the same
set arithmetic with an 8-byte verify payload (``_MASK_VOCAB_MAX``). The frequency rank is
:func:`distrank.distributed_row_number` over (_df, tok) — a range
exchange plus per-partition windows, NEVER a single-task global
window, so a web-scale vocabulary (billions of distinct tokens) ranks
in parallel; and the rank table joins back as an ordinary hash join
(no broadcast hint — AQE broadcasts it only when its runtime size
actually fits, so a billions-row vocabulary shuffles instead of
dying in a broadcast). All similarity arithmetic is ppm integers
(inter·10⁶ vs θ·union — Spark ``div`` ≡ DuckDB ``//``), so the pair
list replicates in the oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pg_parquet_spark.operators.distrank import distributed_row_number

_PPM = 1_000_000

#: self-cleaning cache registry (the dedup-module convention): the
#: ranked-array frame each join persists is read by THREE+ consumers
#: (prefix explode, both verify sides, the containment probe) —
#: without the cache the corpus explode + vocab rank pipeline runs
#: once per consumer (measured: zero ReusedExchange in the executed
#: plan). Trimmed FIFO past _CACHE_KEEP handles (ADVICE r12: an
#: entry-time release-all unpersisted the PREVIOUS call's still-lazy
#: frames, so composing two setsim joins before collecting either
#: silently re-ran the first join's explode+rank pipeline — the exact
#: composed-consumers pitfall drift.py fixed in r11). The frames here
#: are data-sized (per-doc rank arrays), so the bound stays small:
#: three composed joins' worth. release_cached() still frees
#: everything eagerly — call it after results are materialized. At
#: cluster scale this materialization point is a checkpoint to storage.
_CACHED_FRAMES: list = []
_CACHE_KEEP = 6


def release_cached() -> None:
    while _CACHED_FRAMES:
        df = _CACHED_FRAMES.pop()
        try:
            df.unpersist()
        except Exception:  # pragma: no cover - session already stopped
            pass


def _trim_cache() -> None:
    while len(_CACHED_FRAMES) > _CACHE_KEEP:
        df = _CACHED_FRAMES.pop(0)
        try:
            df.unpersist()
        except Exception:  # pragma: no cover - session already stopped
            pass


#: Verify-representation cutoff (r14, guide §2.3 "narrower types"):
#: when the corpus vocabulary has ≤ 64 distinct ranked tokens, a
#: document's token-rank SET is exactly one 64-bit mask and the verify
#: stage's |A∩B| is ``bit_count(mask_a & mask_b)`` — identical set
#: arithmetic, but the verify joins carry 8 bytes/doc instead of the
#: full rank array (~8·|tokens| B), and the final range-sort's
#: sampling pass no longer re-executes a hash-set intersect per pair.
#: Beyond 64 the array path runs unchanged (the 100 TB shape — a web
#: vocabulary never fits a mask). The branch reads ONE scalar
#: (max rank) off the already-persisted per-doc array table — the
#: same bounded 1-row driver fold the module's bounds frames use.
_MASK_VOCAB_MAX = 64

_MASK_EXPR = (
    "aggregate(rks, 0L, (acc, r) -> acc | shiftleft(1L, cast(r - 1 as int)))"
)


def _max_rank(arrs: DataFrame):
    """Max token rank over the persisted rank-array table (1-row fold)."""
    return arrs.agg(F.max(F.array_max("rks"))).first()[0]


def jaccard_join(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold_ppm: int = 500_000,
) -> DataFrame:
    """All (id_a < id_b) pairs with distinct-token Jaccard ≥ threshold.

    Output: (id_a, id_b, inter_n, union_n, jacc_ppm), ordered."""
    dt = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(F.split(F.lower(F.col(text_col)), " "))
        ).alias("tok"),
    )
    rank = distributed_row_number(
        dt.groupBy("tok").agg(F.count("*").alias("_df")), ["_df", "tok"]
    ).select("tok", "rk")
    arrs = (
        dt.join(rank, "tok")
        .groupBy("id")
        .agg(F.sort_array(F.collect_list("rk")).alias("rks"))
        .withColumn("n", F.size("rks").cast("long"))
        .persist()
    )
    _CACHED_FRAMES.append(arrs)
    _trim_cache()
    # prefix length p = n − ⌈θ·n⌉ + 1, integer ceil
    p = F.col("n") - F.expr(
        f"(n * {threshold_ppm} + {_PPM - 1}) div {_PPM}"
    ) + F.lit(1)
    # r14 optimization (guide §2.5): spread the probe side over the
    # cluster BY DOC ID before exploding prefixes. Candidate-pair
    # duplicates (one per shared prefix token) all originate from the
    # same probe doc, so keying the candidate stage by id makes the
    # partial (map-side) distinct actually remove them before the
    # exchange — and the pair-generation + partial-distinct stage runs
    # at defaultParallelism instead of inheriting the narrow scan/agg
    # partitioning. The repartition itself moves only the per-doc rank
    # arrays (~|tokens| ints/doc), never raw text.
    par = df.sparkSession.sparkContext.defaultParallelism
    pref = arrs.repartition(par, "id").select(
        "id", "n", F.explode(F.slice("rks", F.lit(1), p)).alias("prk")
    )
    cand = (
        pref.alias("a")
        .join(
            pref.select(
                F.col("id").alias("id_b"), F.col("n").alias("n_b"), "prk"
            ).alias("b"),
            "prk",
        )
        .filter(F.col("a.id") < F.col("id_b"))
        .filter(
            F.greatest("a.n", "n_b") * threshold_ppm
            <= F.least("a.n", "n_b") * _PPM
        )
        .select(F.col("a.id").alias("id_a"), "id_b")
        .distinct()
        # r14 second pass (guide §2.4 "remove shuffles outright"): the
        # contract's final ORDER BY otherwise plans its own range
        # exchange + sort over the full verified pair stream — a second
        # full-stream shuffle. RANGE-partitioning the candidate stream
        # on the output sort key here (plus an in-partition sort) means
        # the verify projections/joins preserve both the distribution
        # and the ordering, so the trailing orderBy's exchange AND sort
        # are elided by the planner (EnsureRequirements: the
        # RangePartitioning satisfies OrderedDistribution). Interleaved
        # A/B at sf0.1 (4 trials, idle host): 4.344 → 3.947 s min.
        # (A plain round-robin/hash repartition was A/B'd in the first
        # pass and REJECTED — it adds an exchange without paying for
        # the sort it could have replaced.)
        .repartitionByRange(par, "id_a", "id_b")
        .sortWithinPartitions("id_a", "id_b")
    )
    vmax = _max_rank(arrs)
    if vmax is not None and vmax <= _MASK_VOCAB_MAX:
        sets = arrs.select("id", F.expr(_MASK_EXPR).alias("_mask"), "n")
        va = sets.select(
            F.col("id").alias("id_a"), F.col("_mask").alias("_ma"), F.col("n").alias("na")
        )
        vb = sets.select(
            F.col("id").alias("id_b"), F.col("_mask").alias("_mb"), F.col("n").alias("nb")
        )
        inter = F.expr("bit_count(_ma & _mb)").cast("long")
    else:
        va = arrs.select(
            F.col("id").alias("id_a"), F.col("rks").alias("rks_a"), F.col("n").alias("na")
        )
        vb = arrs.select(
            F.col("id").alias("id_b"), F.col("rks").alias("rks_b"), F.col("n").alias("nb")
        )
        inter = F.size(F.array_intersect("rks_a", "rks_b")).cast("long")
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("inter_n", inter)
        .withColumn("union_n", F.col("na") + F.col("nb") - F.col("inter_n"))
        .filter(F.col("inter_n") * _PPM >= F.col("union_n") * threshold_ppm)
        .select(
            "id_a",
            "id_b",
            "inter_n",
            "union_n",
            F.expr(f"(inter_n * {_PPM}) div union_n").alias("jacc_ppm"),
        )
        .orderBy("id_a", "id_b")
    )


def jaccard_join_oracle_sql(
    threshold_ppm: int = 500_000,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """The ALL-PAIRS exact join (quadratic — which is why it is the
    small-SF oracle): equality against it proves the prefix filter
    dropped no qualifying pair."""
    return f"""
WITH dt AS (
  SELECT {id_col} AS id,
         unnest(list_distinct(string_split(lower({text_col}), ' '))) AS tok
  FROM {table}
), sizes AS (
  SELECT id, COUNT(*) AS n FROM dt GROUP BY id
), ov AS (
  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS inter
  FROM dt a JOIN dt b ON a.tok = b.tok AND a.id < b.id
  GROUP BY 1, 2
)
SELECT id_a, id_b, CAST(inter AS BIGINT) AS inter_n,
       CAST(sa.n + sb.n - inter AS BIGINT) AS union_n,
       CAST((inter * {_PPM}) // (sa.n + sb.n - inter) AS BIGINT) AS jacc_ppm
FROM ov
JOIN sizes sa ON sa.id = ov.id_a
JOIN sizes sb ON sb.id = ov.id_b
WHERE inter * {_PPM} >= (sa.n + sb.n - inter) * {threshold_ppm}
ORDER BY id_a, id_b
"""


def containment_join(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold_ppm: int = 800_000,
) -> DataFrame:
    """Exact set-CONTAINMENT self-join (r11): all (id_a < id_b) pairs
    with |A∩B| / min(|A|, |B|) ≥ θ — the asymmetric tier Jaccard
    misses by construction: a 20-token doc quoted verbatim inside a
    500-token doc has containment 1.0 but Jaccard ≈ 0.04. This is the
    quote/subset detector (news wire inside aggregator pages, licence
    headers, embedded abstracts).

    Prefix-filter correctness for containment: if the SMALLER set A
    reaches overlap t = ⌈θ·|A|⌉ with B, then A's first
    |A| − t + 1 rarest tokens cannot all miss B — so candidates are
    the SMALLER side's own-θ prefix probed against the other side's
    FULL posting list (r14: probing only from the canonical smaller
    side — lexicographic (n, id), so |A| = min(|A|,|B|) and ties
    break deterministically — generates every qualifying pair exactly
    per the theorem and halves the candidate stream the old
    both-sides probe paid). Prefix tokens are the corpus-rarest by
    construction, so the probed postings are the short ones — hot
    boilerplate tokens never enter a prefix.

    Output: (id_a, id_b, inter_n, min_n, containment_ppm), ordered;
    ppm via positive integer division (engine-exact)."""
    dt = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(F.split(F.lower(F.col(text_col)), " "))
        ).alias("tok"),
    )
    rank = distributed_row_number(
        dt.groupBy("tok").agg(F.count("*").alias("_df")), ["_df", "tok"]
    ).select("tok", "rk")
    arrs = (
        dt.join(rank, "tok")
        .groupBy("id")
        .agg(F.sort_array(F.collect_list("rk")).alias("rks"))
        .withColumn("n", F.size("rks").cast("long"))
        .persist()
    )
    _CACHED_FRAMES.append(arrs)
    _trim_cache()
    p = F.col("n") - F.expr(
        f"(n * {threshold_ppm} + {_PPM - 1}) div {_PPM}"
    ) + F.lit(1)
    # r14 (guide §2.5, same rationale as jaccard_join): key the probe
    # side by doc id at defaultParallelism so pair-generation + the
    # partial distinct parallelize and dedup map-side; the probed full
    # posting list now derives from the SAME persisted array table
    # (explode), dropping the separate persisted postings frame.
    par = df.sparkSession.sparkContext.defaultParallelism
    pref = arrs.repartition(par, "id").select(
        "id", "n", F.explode(F.slice("rks", F.lit(1), p)).alias("rk")
    )
    full = arrs.select(
        F.col("id").alias("id2"),
        F.col("n").alias("n2"),
        F.explode("rks").alias("rk"),
    )
    cand = (
        pref.join(full, "rk")
        # canonical smaller-side probe: keep only probes from the
        # lexicographically-smaller (n, id) side — the theorem's A
        .filter(
            (F.col("n") < F.col("n2"))
            | ((F.col("n") == F.col("n2")) & (F.col("id") < F.col("id2")))
        )
        .select(
            F.least("id", "id2").alias("id_a"),
            F.greatest("id", "id2").alias("id_b"),
        )
        .distinct()
        # r14 second pass (guide §2.4): RANGE-partition + in-partition
        # sort on the output key instead of the first pass's round-robin
        # repartition — same verify-stage parallelism, but the trailing
        # ORDER BY's range exchange and sort are now elided (the verify
        # joins preserve the streamed side's partitioning and ordering).
        # Round-robin additionally paid a sort-before-repartition pass
        # of its input (SPARK-23207). Interleaved A/B at sf0.1 (4
        # trials, idle host): 8.228 → 5.247 s min (−36%).
        .repartitionByRange(par, "id_a", "id_b")
        .sortWithinPartitions("id_a", "id_b")
    )
    vmax = _max_rank(arrs)
    if vmax is not None and vmax <= _MASK_VOCAB_MAX:
        sets = arrs.select("id", F.expr(_MASK_EXPR).alias("_mask"), "n")
        va = sets.select(
            F.col("id").alias("id_a"), F.col("_mask").alias("_ma"), F.col("n").alias("na")
        )
        vb = sets.select(
            F.col("id").alias("id_b"), F.col("_mask").alias("_mb"), F.col("n").alias("nb")
        )
        inter = F.expr("bit_count(_ma & _mb)").cast("long")
    else:
        va = arrs.select(
            F.col("id").alias("id_a"), F.col("rks").alias("rks_a"), F.col("n").alias("na")
        )
        vb = arrs.select(
            F.col("id").alias("id_b"), F.col("rks").alias("rks_b"), F.col("n").alias("nb")
        )
        inter = F.size(F.array_intersect("rks_a", "rks_b")).cast("long")
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("inter_n", inter)
        .withColumn("min_n", F.least("na", "nb"))
        .filter(F.col("inter_n") * _PPM >= F.col("min_n") * threshold_ppm)
        .select(
            "id_a",
            "id_b",
            "inter_n",
            "min_n",
            F.expr(f"(inter_n * {_PPM}) div min_n").alias("containment_ppm"),
        )
        .orderBy("id_a", "id_b")
    )


def containment_join_oracle_sql(
    threshold_ppm: int = 800_000,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """The ALL-PAIRS exact containment join (quadratic small-SF oracle
    — equality against it proves the prefix probe dropped no
    qualifying pair)."""
    return f"""
WITH dt AS (
  SELECT {id_col} AS id,
         unnest(list_distinct(string_split(lower({text_col}), ' '))) AS tok
  FROM {table}
), sizes AS (
  SELECT id, COUNT(*) AS n FROM dt GROUP BY id
), ov AS (
  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS inter
  FROM dt a JOIN dt b ON a.tok = b.tok AND a.id < b.id
  GROUP BY 1, 2
)
SELECT id_a, id_b, CAST(inter AS BIGINT) AS inter_n,
       CAST(LEAST(sa.n, sb.n) AS BIGINT) AS min_n,
       CAST((inter * {_PPM}) // LEAST(sa.n, sb.n) AS BIGINT)
         AS containment_ppm
FROM ov
JOIN sizes sa ON sa.id = ov.id_a
JOIN sizes sb ON sb.id = ov.id_b
WHERE inter * {_PPM} >= LEAST(sa.n, sb.n) * {threshold_ppm}
ORDER BY id_a, id_b
"""
